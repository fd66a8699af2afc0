"""Cardinality operators (ops/sketches.py): exact grouped distinct-count
vs pandas, and the HyperLogLog estimate's error bound + merge
invariance."""

import numpy as np
import pandas as pd
import pytest


def _frame(n=50_000, groups=4, card=3000, seed=17):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, groups, n).astype("int64"),
            # zipf-ish repetition so dedup combiners actually combine
            "v": (rng.zipf(1.3, n) % card).astype("int64"),
        }
    )


def test_grouped_distinct_count_exact(ray_session):
    import ray.data

    from cartography_ray.ops.sketches import grouped_distinct_count

    df = _frame()
    got = (
        grouped_distinct_count(
            ray.data.from_pandas(df).repartition(4), "g", "v", out_col="nd",
            num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = df.groupby("g")["v"].nunique()
    for _, row in got.iterrows():
        assert row["nd"] == want[row["g"]]


def test_grouped_hll_error_bound(ray_session):
    import ray.data

    from cartography_ray.ops.sketches import grouped_hll

    df = _frame()
    p = 12
    est = (
        grouped_hll(ray.data.from_pandas(df).repartition(4), "g", "v", p=p, out_col="nd")
        .to_pandas()
        .set_index("g")["nd"]
    )
    want = df.groupby("g")["v"].nunique()
    rse = 1.04 / np.sqrt(1 << p)
    for g, exact in want.items():
        rel = abs(est[g] - exact) / exact
        assert rel < 5 * rse, (g, est[g], exact, rel)


def test_grouped_hll_block_order_invariant(ray_session):
    """Registers merge by max, so the estimate must not depend on how
    rows are split into blocks."""
    import ray.data

    from cartography_ray.ops.sketches import grouped_hll

    df = _frame(n=8000, groups=2, card=500)
    a = grouped_hll(ray.data.from_pandas(df).repartition(2), "g", "v", p=10).to_pandas()
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    b = grouped_hll(ray.data.from_pandas(shuffled).repartition(7), "g", "v", p=10).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("g").reset_index(drop=True),
        b.sort_values("g").reset_index(drop=True),
    )


def test_heavy_hitters_mg_bounds(ray_session):
    """Misra-Gries guarantees in the genuinely-approximate regime
    (distinct values >> k_track): every reported count_lo lower-bounds
    the true count, count_lo + err upper-bounds it, the total undercount
    respects N/(k+1), and every value with true count > err is present."""
    import pandas as pd
    import ray.data

    from cartography_ray.ops.sketches import heavy_hitters

    rng = np.random.default_rng(17)
    n = 120_000
    # zipf-ish skew over ~20k distinct values, k_track far below that
    vals = np.minimum((rng.pareto(1.1, n) * 50).astype("int64"), 20_000)
    df = pd.DataFrame({"v": pd.Series(vals).map(lambda x: f"tok{x}")})
    k = 256
    out = heavy_hitters(
        ray.data.from_pandas(df).repartition(8), "v", k_track=k, top_n=100
    ).to_pandas()
    assert len(out) > 0
    true = df["v"].value_counts()
    err = int(out["err"].iloc[0])
    assert (out["err"] == err).all()  # summary-constant bound
    assert 0 <= err <= n // (k + 1) + 1, f"err {err} exceeds MG bound"
    for _, r in out.iterrows():
        t = int(true[r["value"]])
        assert r["count_lo"] <= t <= r["count_lo"] + err, (r["value"], t, r["count_lo"], err)
    # guarantee: anything with true count > err must have survived —
    # check against the full summary (top_n may cut it, so use a large n)
    full = heavy_hitters(
        ray.data.from_pandas(df).repartition(8), "v", k_track=k, top_n=k
    ).to_pandas()
    reported = set(full["value"])
    err_full = int(full["err"].iloc[0])
    for val, t in true.items():
        if t > err_full:
            assert val in reported, f"{val} (true {t} > err {err_full}) missing"


def test_cms_overestimates_only_and_bounded(ray_session):
    import ray.data

    from cartography_ray.ops.sketches import cms_build, cms_query

    rng = np.random.default_rng(89)
    # zipf-ish stream: heavy head + long tail, forced collisions (width 64)
    vals = rng.zipf(1.5, 8000)
    vals = vals[vals < 5000].astype("int64")
    df = pd.DataFrame({"v": vals})
    width, depth = 64, 4
    sk = cms_build(ray.data.from_pandas(df).repartition(5), "v",
                   width=width, depth=depth)
    uniq = pd.Series(sorted(set(vals.tolist())))
    true = df["v"].value_counts()
    est = cms_query(sk, uniq)
    truth = true.loc[uniq].to_numpy()
    # CMS never underestimates
    assert (est >= truth).all()
    # ... and overestimates stay within the classic eps=2N/width bound for
    # all but a 2^-depth-ish tail (fixed seed: assert the observed rate)
    n = len(vals)
    viol = (est - truth) > (2 * n / width)
    assert viol.mean() <= 0.08, f"violation rate {viol.mean():.3f}"


def test_cms_merge_is_exact(ray_session):
    import ray.data

    from cartography_ray.ops.sketches import cms_build, cms_partial

    rng = np.random.default_rng(97)
    df = pd.DataFrame({"v": rng.integers(0, 300, 4000).astype("int64")})
    width, depth = 128, 3
    # distributed build (per-block partials + driver fold) must be
    # BIT-EQUAL to one single-pass local sketch: merge is addition
    sk_ray = cms_build(ray.data.from_pandas(df).repartition(7), "v",
                       width=width, depth=depth)
    sk_one = cms_partial(df["v"], width, depth)
    assert (sk_ray == sk_one).all()
    # and to any other split of the same stream
    sk_two = cms_partial(df["v"][:1000], width, depth) + cms_partial(
        df["v"][1000:].reset_index(drop=True), width, depth
    )
    assert (sk_two == sk_one).all()
