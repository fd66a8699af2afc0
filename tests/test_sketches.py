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
