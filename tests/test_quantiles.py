"""Grouped quantiles (ops/quantiles.py): exact vs numpy, and the
mergeable histogram sketch's error bound vs the exact values."""

import numpy as np
import pandas as pd
import pytest


def _frame(n=8000, groups=5, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, groups, n).astype("int64"),
            # mixed-scale heavy-tail values so bins actually matter
            "v": np.round(rng.lognormal(3.0, 1.2, n), 2),
        }
    )


def test_grouped_quantiles_matches_numpy(ray_session):
    import ray.data

    from cartography_ray.ops.quantiles import grouped_quantiles

    df = _frame()
    got = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(4), "g", "v", [0.25, 0.5, 0.75],
            num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        v = df[df["g"] == row["g"]]["v"].to_numpy()
        assert row["n"] == len(v)
        want = np.quantile(v, [0.25, 0.5, 0.75], method="linear")
        assert np.allclose([row["p25"], row["p50"], row["p75"]], want, rtol=0, atol=0)


def test_quantile_sketch_error_bound(ray_session):
    import ray.data

    from cartography_ray.ops.quantiles import (
        grouped_quantile_sketch,
        grouped_quantiles,
    )

    df = _frame()
    num_bins = 512
    qs = [0.25, 0.5, 0.75]
    ds = ray.data.from_pandas(df).repartition(4)
    exact = grouped_quantiles(ds, "g", "v", qs, num_buckets=8).to_pandas()
    sketch = grouped_quantile_sketch(ds, "g", "v", qs, num_bins=num_bins).to_pandas()
    merged = exact.merge(sketch, on="g", suffixes=("", "_s"))
    assert (merged["n"] == merged["n_s"]).all()
    for _, row in merged.iterrows():
        v = df[df["g"] == row["g"]]["v"].to_numpy()
        bin_width = (v.max() - v.min()) / num_bins
        for c in ("p25", "p50", "p75"):
            assert abs(row[c] - row[f"{c}_s"]) <= bin_width + 1e-9, (
                row["g"], c, row[c], row[f"{c}_s"], bin_width,
            )


def test_quantile_sketch_deterministic(ray_session):
    import ray.data

    from cartography_ray.ops.quantiles import grouped_quantile_sketch

    df = _frame(n=2000)
    outs = []
    for _ in range(2):
        outs.append(
            grouped_quantile_sketch(
                ray.data.from_pandas(df).repartition(3), "g", "v", [0.5], num_bins=256
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pivot_groupby_sum_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.agg import pivot_groupby_sum

    rng = np.random.default_rng(21)
    n = 4000
    cats = ["a", "b", "c"]
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n).astype("int64"),
            "cat": rng.choice(cats + ["other"], n),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    got = (
        pivot_groupby_sum(
            ray.data.from_pandas(df).repartition(4), "k", "cat", cats, "v",
            suffix="_sum", num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({"k": sorted(df["k"].unique())})
    for c in cats:
        s = df[df["cat"] == c].groupby("k")["v"].sum()
        want[f"{c}_sum"] = want["k"].map(s).fillna(0).astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_mode_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.agg import grouped_mode

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 60, n).astype("int64"),
            "v": rng.choice(list("pqrst"), n),
        }
    )
    got = (
        grouped_mode(
            ray.data.from_pandas(df).repartition(5), "k", "v",
            out_col="mode_v", count_col="n", num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    counts = df.groupby(["k", "v"]).size().rename("n").reset_index()
    ordered = counts.sort_values(["k", "n", "v"], ascending=[True, False, True])
    want = (
        ordered.groupby("k").head(1).rename(columns={"v": "mode_v"})
        .sort_values("k").reset_index(drop=True)[["k", "mode_v", "n"]]
    )
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got[["k", "mode_v", "n"]], want)


def test_events_outliers_plans_agree(ray_session):
    """The size-guarded broadcast plan and the forced hash_join plan must
    produce identical outlier sets (the resolve_keys twin-plan idiom)."""
    from cartography_ray.pipelines.queries import q_events_outliers

    def run(**kw):
        return (
            q_events_outliers("/root/testdata/sf0.001", **kw)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "user_id", "value_cents"]]
        )

    a = run()
    b = run(broadcast_limit=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_grouped_quantiles_disc_matches_numpy(ray_session):
    import ray.data

    from cartography_ray.ops.quantiles import grouped_quantiles

    rng = np.random.default_rng(101)
    n = 6000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, n).astype("int64"),
            "v": rng.integers(-500, 500, n).astype("int64"),
        }
    )
    qs = [0.1, 0.5, 0.9]
    got = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(5), "g", "v", qs,
            num_buckets=8, num_partitions=4, method="disc",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # disc returns actual elements with the input dtype
    assert got["p50"].dtype == np.dtype("int64")
    for _, row in got.iterrows():
        v = df[df["g"] == row["g"]]["v"].to_numpy()
        want = np.quantile(v, qs, method="inverted_cdf")
        assert [row["p10"], row["p50"], row["p90"]] == want.tolist()
        assert set([row["p10"], row["p50"], row["p90"]]) <= set(v.tolist())


def test_q5_bloom_plans_agree(ray_session):
    """The size-guarded bloom prefilter and the plain join plan must
    produce identical Q5 results (bloom negatives cannot match)."""
    from cartography_ray.pipelines.queries import q_regional_supplier_revenue

    def run(**kw):
        t = q_regional_supplier_revenue("/root/testdata/sf0.001", **kw)
        return (
            t.to_pandas()
            .sort_values("n_name")
            .reset_index(drop=True)[["n_name", "revenue_cents", "n_items"]]
        )

    a = run(use_bloom=False)
    b = run(use_bloom=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_grouped_mad_matches_reference(ray_session):
    import ray.data

    from cartography_ray.ops.quantiles import grouped_mad

    rng = np.random.default_rng(11)
    # odd and even group sizes, negatives, duplicates
    ks, vs = [], []
    for k, n in (("a", 7), ("b", 8), ("c", 1), ("d", 2)):
        ks += [k] * n
        vs += list(rng.integers(-500, 500, n))
    pdf = pd.DataFrame({"k": ks, "v": np.array(vs, dtype="int64")})

    got = (
        grouped_mad(ray.data.from_pandas(pdf).repartition(3), "k", "v",
                    num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )

    def med2(v):
        v = np.sort(v)
        n = len(v)
        return int(2 * v[n // 2]) if n % 2 else int(v[n // 2 - 1] + v[n // 2])

    for _, row in got.iterrows():
        v = pdf.loc[pdf["k"] == row["k"], "v"].to_numpy()
        m2 = med2(v)
        assert row["n"] == len(v)
        assert row["med2"] == m2
        assert row["mad4"] == med2(np.abs(2 * v - m2))
        # cross-check against float medians (exact for these magnitudes)
        assert row["med2"] == 2 * np.median(v)
        assert row["mad4"] == 4 * np.median(np.abs(v - np.median(v)))
    assert set(got["k"]) == {"a", "b", "c", "d"}
