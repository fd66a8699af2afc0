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
