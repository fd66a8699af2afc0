"""Windowed operators (ops/window.py): gap sessionization and per-group
top-k — checked against a pure-pandas window reference, plus a property
test across randomized streams."""

import numpy as np
import pandas as pd
import pytest


def _pd_sessions(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Pandas window reference (LAG + cumulative SUM per partition)."""
    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
    ts_us = s["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    s["__ts_us"] = ts_us
    prev = s.groupby("user_id")["__ts_us"].shift()
    s["session_seq"] = (
        (prev.isna() | ((s["__ts_us"] - prev) > gap_us))
        .astype("int64")
        .groupby(s["user_id"].to_numpy())
        .cumsum()
    )
    g = s.groupby(["user_id", "session_seq"], sort=False)
    return (
        pd.DataFrame(
            {
                "n_events": g["__ts_us"].size(),
                "session_start_us": g["__ts_us"].min(),
                "session_end_us": g["__ts_us"].max(),
            }
        )
        .reset_index()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )


def test_sessionize_matches_pandas_window(ray_session):
    import ray.data

    from cartography_ray.ops.window import sessionize

    rng = np.random.default_rng(7)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(
                base + rng.integers(0, 86_400_000_000 * 10, n), unit="us"
            ),
            "event_id": np.arange(n, dtype="int64"),
        }
    )
    gap = 30 * 60 * 1_000_000
    got = (
        sessionize(
            ray.data.from_pandas(df), key="user_id", ts_col="ts", gap_us=gap,
            order_cols=["event_id"], num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    want = _pd_sessions(df, gap)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_sessionize_gap_boundary(ray_session):
    """Events exactly gap_us apart stay in ONE session (> not >=)."""
    import ray.data

    from cartography_ray.ops.window import sessionize

    t0 = pd.Timestamp("2024-06-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [t0, t0 + pd.Timedelta(minutes=30), t0 + pd.Timedelta(minutes=61)],
            "event_id": [1, 2, 3],
        }
    )
    out = (
        sessionize(
            ray.data.from_pandas(df), key="user_id", ts_col="ts",
            gap_us=30 * 60 * 1_000_000, order_cols=["event_id"], num_buckets=2,
        )
        .to_pandas()
        .sort_values("session_seq")
        .reset_index(drop=True)
    )
    assert list(out["session_seq"]) == [1, 2]
    assert list(out["n_events"]) == [2, 1]


def test_sessionize_chunked_hot_key_matches_single_pass(ray_session):
    """VERDICT r03 item 3: the hot-key fallback (chunk_us time-salting +
    session-level boundary merge) must be byte-identical to the
    single-reducer path — exercised with ONE key holding the bulk of the
    corpus spread across many input blocks, sessions spanning chunk
    boundaries, and empty middle chunks."""
    import ray.data

    from cartography_ray.ops.window import sessionize

    rng = np.random.default_rng(23)
    n = 6000
    base = pd.Timestamp("2024-01-01").value // 1000
    hour = 3_600_000_000
    # hot key 0: 90% of rows, gaps drawn so many sessions straddle the
    # chunk boundary (chunk_us = 6h, gap 45min, jumps up to 2h) and some
    # whole chunks are empty (occasional 30h jumps)
    gaps = rng.integers(0, 2 * hour, n)
    gaps[rng.random(n) < 0.01] = 30 * hour
    ts = base + np.cumsum(gaps)
    user = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 12, n))
    df = pd.DataFrame(
        {
            "user_id": user.astype("int64"),
            "ts": pd.to_datetime(ts, unit="us"),
            "event_id": np.arange(n, dtype="int64"),
        }
    )
    gap = 45 * 60 * 1_000_000
    kw = dict(key="user_id", ts_col="ts", gap_us=gap, order_cols=["event_id"],
              num_buckets=8, num_partitions=4)

    def run(**extra):
        return (
            sessionize(ray.data.from_pandas(df).repartition(16), **kw, **extra)
            .to_pandas()
            .sort_values(["user_id", "session_seq"])
            .reset_index(drop=True)
        )

    single = run()
    chunked = run(chunk_us=6 * hour)
    pd.testing.assert_frame_equal(chunked[single.columns], single)
    # also equals the pure-pandas window reference
    pd.testing.assert_frame_equal(chunked[_pd_sessions(df, gap).columns], _pd_sessions(df, gap))
    # the hot key genuinely spans many chunks (the salting did something)
    span = df[df.user_id == 0]["ts"].astype("int64") // 1000 // (6 * hour)
    assert span.nunique() > 10


def test_grouped_topk_matches_pandas_rank(ray_session):
    import ray.data

    from cartography_ray.ops.window import grouped_topk

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 50, n),
            "v": rng.normal(size=n).round(3),
            "id": np.arange(n, dtype="int64"),
        }
    )
    got = (
        grouped_topk(
            # two blocks so the per-batch combiner actually runs pre-shuffle
            ray.data.from_pandas(df).repartition(4),
            "g", "v", k=3, descending=True, tiebreak=["id"],
            num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    s = df.sort_values(["g", "v", "id"], ascending=[True, False, True], kind="mergesort")
    want = s.groupby("g", sort=False).head(3).copy()
    want["rn"] = want.groupby("g", sort=False).cumcount() + 1
    want = want.sort_values(["g", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "id", "rn"]], want[["g", "v", "id", "rn"]])


def test_grouped_topk_small_groups(ray_session):
    """Groups smaller than k emit all their rows with dense ranks."""
    import ray.data

    from cartography_ray.ops.window import grouped_topk

    df = pd.DataFrame({"g": [1, 1, 2], "v": [5.0, 7.0, 3.0], "id": [1, 2, 3]})
    out = (
        grouped_topk(
            ray.data.from_pandas(df), "g", "v", k=10, tiebreak=["id"], num_buckets=2
        )
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    assert list(out["id"]) == [2, 1, 3]
    assert list(out["rn"]) == [1, 2, 1]


def test_asof_join_matches_pandas_merge_asof(ray_session):
    import ray.data

    from cartography_ray.ops.joins import asof_join

    rng = np.random.default_rng(3)
    n, m = 2000, 500
    left = pd.DataFrame(
        {
            "u": rng.integers(0, 30, n),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s").astype("datetime64[us]"),
            "eid": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "u": rng.integers(0, 30, m),
            "ts": pd.to_datetime(rng.integers(0, 10**9, m), unit="s").astype("datetime64[us]"),
            "rid": np.arange(m, dtype="int64"),
        }
    )
    for how in ("inner", "left"):
        got = (
            asof_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                by="u", on="ts", how=how, num_buckets=8, num_partitions=4,
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("ts", kind="mergesort").rename(
                columns={"ts": "r_ts", "rid": "r_rid"}
            ),
            left_on="ts", right_on="r_ts", by="u", direction="backward",
        )
        if how == "inner":
            want = want.dropna(subset=["r_ts"])
            want["r_rid"] = want["r_rid"].astype("int64")
        want = want.sort_values("eid").reset_index(drop=True)[got.columns]
        pd.testing.assert_frame_equal(
            got.drop(columns="r_rid"), want.drop(columns="r_rid")
        )
        assert (
            got["r_rid"].fillna(-1).to_numpy() == want["r_rid"].fillna(-1).to_numpy()
        ).all()


def test_asof_join_forward_matches_pandas(ray_session):
    """direction='forward' (next-event attribution) vs the pandas
    reference, plus the guard rails: forward rejects chunk_us, and
    forward ties resolve to the FIRST row in full-column sort order."""
    import pytest
    import ray.data

    from cartography_ray.ops.joins import asof_join

    rng = np.random.default_rng(11)
    n, m = 1500, 400
    left = pd.DataFrame(
        {
            "u": rng.integers(0, 25, n),
            "ts": rng.integers(0, 10**6, n).astype("int64"),
            "eid": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "u": rng.integers(0, 25, m),
            "ts": rng.integers(0, 10**6, m).astype("int64"),
            "rid": np.arange(m, dtype="int64"),
        }
    )
    for how in ("inner", "left"):
        got = (
            asof_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                by="u", on="ts", how=how, direction="forward",
                num_buckets=8, num_partitions=4,
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values(["ts", "rid"], kind="mergesort").rename(
                columns={"ts": "r_ts", "rid": "r_rid"}
            ),
            left_on="ts", right_on="r_ts", by="u", direction="forward",
        )
        if how == "inner":
            want = want.dropna(subset=["r_ts"])
            want = want.astype({"r_ts": "int64", "r_rid": "int64"})
        want = want.sort_values("eid").reset_index(drop=True)[got.columns]
        a = got.fillna(-1).reset_index(drop=True)
        b = want.fillna(-1).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    with pytest.raises(ValueError, match="unchunked-only"):
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="u", on="ts", direction="forward", chunk_us=1000,
        )

    # duplicate (u, ts) right rows: forward must pick the smallest
    # full-sort-order row regardless of block layout
    dleft = pd.DataFrame({"u": [1], "ts": [3], "eid": [0]})
    dright = pd.DataFrame({"u": [1, 1, 1], "ts": [5, 5, 5], "rid": [30, 10, 20]})
    for seed in (0, 1, 2):
        shuf = dright.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        out = asof_join(
            ray.data.from_pandas(dleft), ray.data.from_pandas(shuf).repartition(3),
            by="u", on="ts", how="inner", direction="forward", num_buckets=4,
        ).to_pandas()
        assert out["r_rid"].tolist() == [10]


def test_asof_join_duplicate_right_ts_deterministic(ray_session):
    """ADVICE r03: duplicate (by, on) pairs on the right must resolve
    identically across block layouts — ties go to the lexicographically-
    largest right row, never to whichever block arrived last."""
    import ray.data

    from cartography_ray.ops.joins import asof_join

    left = pd.DataFrame({"u": [1, 1, 2], "ts": [10, 20, 10], "eid": [0, 1, 2]})
    # three right rows share (u=1, ts=5); expect rid=30 (largest) always
    right = pd.DataFrame(
        {"u": [1, 1, 1, 2], "ts": [5, 5, 5, 4], "rid": [30, 10, 20, 7]}
    )
    outs = []
    for seed in (0, 1, 2):
        shuffled = right.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        out = (
            asof_join(
                ray.data.from_pandas(left).repartition(2),
                ray.data.from_pandas(shuffled).repartition(3),
                by="u", on="ts", how="inner", num_buckets=4, num_partitions=2,
            )
            .to_pandas()
            .sort_values("eid")
            .reset_index(drop=True)
        )
        outs.append(out)
    assert (outs[0]["r_rid"] == [30, 30, 7]).all()
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o[outs[0].columns.tolist()])


def test_asof_join_chunked_matches_unchunked(ray_session):
    """Hot-key fallback (VERDICT r03 missing item 1): chunked plans —
    one-pass replication with tolerance, two-pass carry-in without —
    must equal the single-shuffle plan exactly, for inner and left."""
    import ray.data

    from cartography_ray.ops.joins import asof_join

    rng = np.random.default_rng(11)
    n, m = 3000, 400
    # key 0 is "hot": half the rows; timestamps cluster so many chunks
    # are empty on one side (exercises carry-in across empty chunks)
    left = pd.DataFrame(
        {
            "u": np.where(rng.random(n) < 0.5, 0, rng.integers(1, 20, n)),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "eid": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "u": np.where(rng.random(m) < 0.5, 0, rng.integers(1, 20, m)),
            # sparse right side → many unmatched-in-chunk lefts
            "ts": rng.integers(0, 3_000, m).astype("int64"),
            "rid": np.arange(m, dtype="int64"),
        }
    )
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)

    def run(**kw):
        out = asof_join(lds, rds, by="u", on="ts", num_buckets=8,
                        num_partitions=4, **kw).to_pandas()
        return out.sort_values("eid").reset_index(drop=True)[
            ["u", "ts", "eid", "r_ts", "r_rid"]
        ]

    for how in ("inner", "left"):
        for tol in (None, 500):
            base = run(how=how, tolerance_us=tol)
            chunked = run(how=how, tolerance_us=tol, chunk_us=700)
            pd.testing.assert_frame_equal(base, chunked)
            assert len(base) > 0
            if tol is None:
                # carry-in resolution: broadcast (default limit) above;
                # force the join fan-back plan and demand equality too
                joined_plan = run(
                    how=how, tolerance_us=tol, chunk_us=700,
                    carry_broadcast_limit=0,
                )
                pd.testing.assert_frame_equal(base, joined_plan)


def test_asof_join_tolerance_and_empty_right(ray_session):
    import ray.data

    from cartography_ray.ops.joins import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "u": [1, 1],
            "ts": pd.Series([t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=5)]).astype("datetime64[us]"),
            "eid": [1, 2],
        }
    )
    right = pd.DataFrame(
        {"u": [1], "ts": pd.Series([t0]).astype("datetime64[us]"), "rid": [10]}
    )
    # 2h lookback: only the first left row still sees the right row
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by="u", on="ts", how="inner", tolerance_us=2 * 3600 * 1_000_000, num_buckets=2,
    ).to_pandas()
    assert list(out["eid"]) == [1]
    # empty right side: inner drops everything but keeps the schema
    from cartography_ray.runtime import to_pandas_typed

    empty = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right.iloc[0:0]),
        by="u", on="ts", how="inner", num_buckets=2,
    )
    pdf = to_pandas_typed(empty)
    assert len(pdf) == 0 and "r_rid" in pdf.columns


def test_asof_join_both_sides_empty(ray_session):
    import ray.data

    from cartography_ray.ops.joins import asof_join
    from cartography_ray.runtime import to_pandas_typed

    empty_l = pd.DataFrame(
        {
            "u": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "eid": pd.Series([], dtype="int64"),
        }
    )
    empty_r = empty_l.rename(columns={"eid": "rid"})
    for how in ("inner", "left"):
        out = asof_join(
            ray.data.from_pandas(empty_l), ray.data.from_pandas(empty_r),
            by="u", on="ts", how=how, num_buckets=2,
        )
        pdf = to_pandas_typed(out)
        assert len(pdf) == 0
        assert list(pdf.columns) == ["u", "ts", "eid", "r_ts", "r_rid"]


def test_asof_join_empty_left_nonempty_right(ray_session):
    import ray.data

    from cartography_ray.ops.joins import asof_join
    from cartography_ray.runtime import to_pandas_typed

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "u": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "eid": pd.Series([], dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {"u": [1], "ts": pd.Series([t0]).astype("datetime64[us]"), "rid": [10]}
    )
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by="u", on="ts", how="left", num_buckets=2,
    )
    assert len(to_pandas_typed(out)) == 0


def test_with_lag_matches_pandas_shift(ray_session):
    import ray.data

    from cartography_ray.ops.window import with_lag

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n),
            "o": rng.permutation(n).astype("int64"),
            "v": rng.normal(size=n).round(4),
        }
    )
    got = (
        with_lag(
            ray.data.from_pandas(df).repartition(4), key="k", order_cols=["o"],
            cols=["v", "o"], num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "o"], kind="mergesort").reset_index(drop=True)
    want["prev_v"] = want.groupby("k")["v"].shift(1)
    want["prev_o"] = want.groupby("k")["o"].shift(1)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_with_lag_lag2(ray_session):
    import ray.data

    from cartography_ray.ops.window import with_lag

    df = pd.DataFrame({"k": [1, 1, 1, 2], "o": [1, 2, 3, 1], "v": [10.0, 20.0, 30.0, 40.0]})
    out = (
        with_lag(ray.data.from_pandas(df), key="k", order_cols=["o"], cols=["v"], lag=2, num_buckets=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert out["prev_v"].fillna(-1).tolist() == [-1.0, -1.0, 10.0, -1.0]


def test_range_join_matches_pandas_filter(ray_session):
    """Point-in-interval join: matches the merge+mask reference including
    OVERLAPPING intervals (a point pairs with every covering interval)
    and unmatched points dropping (inner)."""
    import ray.data

    from cartography_ray.ops.joins import range_join

    rng = np.random.default_rng(31)
    n, m = 1500, 120
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n).astype("int64"),
            "x": rng.integers(0, 1000, n).astype("int64"),
            "lid": np.arange(n, dtype="int64"),
        }
    )
    lo = rng.integers(0, 900, m).astype("int64")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 20, m).astype("int64"),
            "lo": lo,
            "hi": lo + rng.integers(10, 300, m),   # overlapping by construction
            "rid": np.arange(m, dtype="int64"),
        }
    )
    got = (
        range_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            by="k", point_col="x", lo_col="lo", hi_col="hi",
            num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    want = left.merge(right.rename(columns={c: f"r_{c}" for c in ("lo", "hi", "rid")}), on="k")
    want = (
        want[(want["x"] >= want["r_lo"]) & (want["x"] <= want["r_hi"])]
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # overlaps really produced multi-matches (some point in >1 interval)
    assert got["lid"].duplicated().any()

    # hot-key fallback: interval replication across (key, chunk) cells
    # must yield the identical pair set — each pair meets exactly once,
    # in the point's own chunk (no duplicates from replicas)
    chunked = (
        range_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            by="k", point_col="x", lo_col="lo", hi_col="hi",
            num_buckets=8, num_partitions=4, chunk_us=128,
        )
        .to_pandas()
        .sort_values(["lid", "r_rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(chunked[want.columns], want)

    # runaway-replication guard fails loudly, not silently
    import pytest as _pytest

    with _pytest.raises(Exception, match="coarser chunk_us"):
        range_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="k", point_col="x", lo_col="lo", hi_col="hi",
            chunk_us=1, max_chunks_per_interval=5,
        ).to_pandas()


def test_range_join_empty_right(ray_session):
    import ray.data

    from cartography_ray.ops.joins import range_join
    from cartography_ray.runtime import to_pandas_typed

    left = pd.DataFrame({"k": [1], "x": [5], "lid": [1]})
    right = pd.DataFrame(
        {"k": pd.Series([], dtype="int64"), "lo": pd.Series([], dtype="int64"),
         "hi": pd.Series([], dtype="int64"), "rid": pd.Series([], dtype="int64")}
    )
    out = to_pandas_typed(
        range_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="k", point_col="x", lo_col="lo", hi_col="hi", num_buckets=2,
        )
    )
    assert len(out) == 0 and "r_rid" in out.columns


def test_asof_join_property_vs_pandas(ray_session):
    """Property test: asof_join equals pandas merge_asof per key on
    randomized small frames (dup timestamps across keys, keys missing
    from either side, single-row sides)."""
    import ray.data
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cartography_ray.ops.joins import asof_join
    from cartography_ray.runtime import to_pandas_typed

    rows = st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=10
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(lrows=rows, rrows=rows, how=st.sampled_from(["inner", "left"]))
    def check(lrows, rrows, how):
        left = pd.DataFrame(
            {
                "u": pd.Series([r[0] for r in lrows], dtype="int64"),
                "ts": pd.Series([r[1] for r in lrows], dtype="int64"),
                "lid": pd.Series(range(len(lrows)), dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "u": pd.Series([r[0] for r in rrows], dtype="int64"),
                "ts": pd.Series([r[1] for r in rrows], dtype="int64"),
                "rid": pd.Series(range(len(rrows)), dtype="int64"),
            }
        )
        # merge_asof demands unique (key, ts) ordering determinism: drop
        # exact (u, ts) duplicates on the right so "latest" is unique
        right = right.drop_duplicates(["u", "ts"], keep="last").reset_index(drop=True)
        got = to_pandas_typed(
            asof_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                by="u", on="ts", how=how, num_buckets=4, num_partitions=4,
            )
        ).sort_values("lid").reset_index(drop=True)
        want = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("ts", kind="mergesort").rename(
                columns={"ts": "r_ts", "rid": "r_rid"}
            ),
            left_on="ts", right_on="r_ts", by="u", direction="backward",
        )
        if how == "inner":
            want = want.dropna(subset=["r_ts"])
        want = want.sort_values("lid").reset_index(drop=True)
        assert list(got["lid"]) == list(want["lid"])
        assert got["r_rid"].fillna(-1).astype("int64").tolist() == \
            want["r_rid"].fillna(-1).astype("int64").tolist()

    check()


def test_deterministic_sample_and_stratified(ray_session):
    import ray.data

    from cartography_ray.ops.window import (
        deterministic_sample,
        sample_hash,
        stratified_sample,
    )

    rng = np.random.default_rng(41)
    n = 20_000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "g": rng.integers(0, 5, n).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = deterministic_sample(ds, "id", 0.2).to_pandas()
    # exact membership: rows whose score < 0.2 * 2^32, nothing else
    want_ids = df["id"][sample_hash(df["id"].to_numpy()) < int(0.2 * (1 << 32))]
    assert sorted(out["id"]) == sorted(want_ids)
    assert abs(len(out) / n - 0.2) < 0.02  # multiplier actually mixes
    # rerun → identical rows (no RNG state)
    out2 = deterministic_sample(ray.data.from_pandas(df).repartition(7), "id", 0.2).to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])

    strat = stratified_sample(ds, "g", "id", k=10, num_buckets=4).to_pandas()
    assert len(strat) == 50 and strat.groupby("g").size().eq(10).all()
    # deterministic across block layouts
    strat2 = stratified_sample(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(3),
        "g", "id", k=10, num_buckets=4,
    ).to_pandas()
    a = strat.sort_values(["g", "id"]).reset_index(drop=True)
    b = strat2.sort_values(["g", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["g", "id", "rn"]], b[["g", "id", "rn"]])


def test_sample_hash_large_ids_match_sql_twin():
    """ADVICE r03: ids above ~3.46e9 used to overflow int64 in numpy while
    the naive BIGINT SQL twin raised in DuckDB. Both engines must now
    agree across the full non-negative int64 id domain."""
    import duckdb

    from cartography_ray.ops.window import sample_hash

    ids = np.array(
        [0, 1, 3_460_000_000, 2**32 - 1, 2**32, 2**40 + 7, 2**62 + 123],
        dtype="int64",
    )
    got = sample_hash(ids)
    want = duckdb.sql(
        "SELECT (CAST(id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296 AS h "
        "FROM (SELECT UNNEST(?::BIGINT[]) AS id)",
        params=[ids.tolist()],
    ).fetchnumpy()["h"].astype("int64")
    np.testing.assert_array_equal(got, want)


def test_hopping_window_agg_matches_reference(ray_session):
    """Each event lands in every [w*hop, w*hop+window) covering it;
    counts/sums match a brute-force pandas reference, incl. boundary
    events (t exactly at a window start/end)."""
    import ray.data

    from cartography_ray.ops.window import hopping_window_agg

    rng = np.random.default_rng(7)
    n = 4000
    base = 1_700_000_000_000_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, n).astype("int64"),
            # includes exact multiples of hop (window-boundary events)
            "t": base + rng.integers(0, 50, n).astype("int64") * 500_000,
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    W, H = 4_000_000, 1_000_000
    got = (
        hopping_window_agg(
            ray.data.from_pandas(df).repartition(5), "t", W, H, keys="g",
            aggs={"n_events": (None, "count"), "sv": ("v", "sum")},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "window_start_us"])
        .reset_index(drop=True)
    )
    rows = []
    for _, r in df.iterrows():
        w_min = (r["t"] - W) // H + 1
        w_max = r["t"] // H
        for w in range(int(w_min), int(w_max) + 1):
            rows.append((r["g"], w * H, r["v"]))
    ref = (
        pd.DataFrame(rows, columns=["g", "window_start_us", "v"])
        .groupby(["g", "window_start_us"], as_index=False)
        .agg(n_events=("v", "size"), sv=("v", "sum"))
        .sort_values(["g", "window_start_us"])
        .reset_index(drop=True)
    )
    got["n_events"] = got["n_events"].astype("int64")
    pd.testing.assert_frame_equal(got[ref.columns], ref)
    # every event is in exactly window/hop windows
    assert got["n_events"].sum() == n * (W // H)


def test_asof_join_chunked_datetime_tolerance(ray_session):
    """Chunked replication path with datetime64 'on' + tolerance: equal
    to the single-shuffle plan (tolerance spans multiple chunks)."""
    import ray.data

    from cartography_ray.ops.joins import asof_join

    rng = np.random.default_rng(5)
    n, m = 1500, 300
    hour = 3_600_000_000
    base = pd.Timestamp("2024-03-01").value // 1000
    left = pd.DataFrame(
        {
            "u": rng.integers(0, 8, n).astype("int64"),
            "ts": pd.to_datetime(base + rng.integers(0, 100 * hour, n), unit="us"),
            "eid": np.arange(n, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "u": rng.integers(0, 8, m).astype("int64"),
            "ts": pd.to_datetime(base + rng.integers(0, 100 * hour, m), unit="us"),
            "rid": np.arange(m, dtype="int64"),
        }
    )

    def run(**kw):
        out = asof_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            by="u", on="ts", how="left", tolerance_us=5 * hour,
            num_buckets=8, num_partitions=4, **kw,
        ).to_pandas()
        return out.sort_values("eid").reset_index(drop=True)[
            ["u", "ts", "eid", "r_ts", "r_rid"]
        ]

    base_out = run()
    # tolerance (5h) > chunk (2h) → multi-chunk replication (n_rep=3)
    chunked = run(chunk_us=2 * hour)
    pd.testing.assert_frame_equal(base_out, chunked)
    assert base_out["r_rid"].notna().any() and base_out["r_rid"].isna().any()


def test_mix_sources_deterministic_and_rate(ray_session):
    """Weighted mixing: per-source rates hold, output is tagged, and the
    mix is byte-identical across reruns and block layouts (RNG-free)."""
    import ray.data

    from cartography_ray.ops.window import mix_sources

    n = 20_000
    a = pd.DataFrame({"id": np.arange(n, dtype="int64")})
    b = pd.DataFrame({"id": np.arange(n, 2 * n, dtype="int64")})

    def run(parts_a, parts_b):
        out = mix_sources(
            [
                ("a", ray.data.from_pandas(a).repartition(parts_a), 0.5),
                ("b", ray.data.from_pandas(b).repartition(parts_b), 0.1),
            ],
            "id",
        ).to_pandas()
        return out.sort_values(["source", "id"]).reset_index(drop=True)

    one = run(4, 3)
    two = run(7, 2)
    pd.testing.assert_frame_equal(one, two)
    by = one.groupby("source").size()
    assert abs(by["a"] / n - 0.5) < 0.02
    assert abs(by["b"] / n - 0.1) < 0.02
    # distinct salts: the same id value is sampled independently per source
    overlap_ids = set(one[one.source == "a"]["id"]) & set(one[one.source == "b"]["id"])
    assert not overlap_ids  # disjoint id ranges here by construction


def test_running_sum_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.window import running_sum

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "ts": rng.integers(0, 10_000_000, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(-50, 100, n).astype("int64"),
        }
    )
    out = (
        running_sum(
            ray.data.from_pandas(df), key="k", order_cols=["ts", "id"],
            value_col="v", out_col="run", num_partitions=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
    ref = ref.assign(run=ref.groupby("k")["v"].cumsum()).sort_values("id").reset_index(drop=True)
    assert (out["run"].to_numpy() == ref["run"].to_numpy()).all()


def test_running_sum_chunked_plans_agree(ray_session):
    import ray.data

    from cartography_ray.ops.window import running_sum

    rng = np.random.default_rng(12)
    n = 3000
    # one corpus-scale hot key (0) spanning many time chunks + normal keys
    df = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.6, 0, rng.integers(1, 5, n)),
            "ts": rng.integers(0, 50_000, n).astype("int64"),  # µs-scale ints
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    kw = dict(key="k", order_cols=["ts", "id"], value_col="v", out_col="run",
              num_partitions=4)
    base = (
        running_sum(ray.data.from_pandas(df), **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # chunk of 1000 "µs" → ~50 chunks; broadcast fan-back
    bcast = (
        running_sum(ray.data.from_pandas(df), chunk_us=1000, **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # forced reduce-side hash_join fan-back
    joined = (
        running_sum(ray.data.from_pandas(df), chunk_us=1000,
                    prefix_broadcast_limit=0, **kw)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert (bcast["run"].to_numpy() == base["run"].to_numpy()).all()
    assert (joined["run"].to_numpy() == base["run"].to_numpy()).all()


def test_rollup_groupby_agg_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.agg import rollup_groupby_agg

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    out = (
        rollup_groupby_agg(
            ray.data.from_pandas(df), ["a", "b"],
            {"s": ("v", "sum"), "n": (None, "count")}, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["a", "b"]).agg(s=("v", "sum"), n=("v", "size")).reset_index()
    mid = df.groupby("a").agg(s=("v", "sum"), n=("v", "size")).reset_index().assign(b="ALL")
    top = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "s": [df["v"].sum()], "n": [n]})
    ref = (
        pd.concat([fine, mid, top], ignore_index=True)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) == 3 * 2 + 3 + 1
    assert (out["s"].to_numpy() == ref["s"].to_numpy()).all()
    assert (out["n"].to_numpy() == ref["n"].to_numpy()).all()


def test_cube_groupby_agg_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.agg import cube_groupby_agg

    rng = np.random.default_rng(14)
    n = 1500
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], n),
            "b": rng.choice(["p", "q", "r"], n),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    out = (
        cube_groupby_agg(
            ray.data.from_pandas(df), ["a", "b"], {"s": ("v", "sum")},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["a", "b"]).agg(s=("v", "sum")).reset_index()
    by_a = df.groupby("a").agg(s=("v", "sum")).reset_index().assign(b="ALL")
    by_b = df.groupby("b").agg(s=("v", "sum")).reset_index().assign(a="ALL")
    top = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "s": [df["v"].sum()]})
    ref = (
        pd.concat([fine, by_a, by_b, top], ignore_index=True)[["a", "b", "s"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) == 2 * 3 + 2 + 3 + 1
    assert (out["s"].to_numpy() == ref["s"].to_numpy()).all()


def test_with_ntile_matches_sql_semantics(ray_session):
    import ray.data

    from cartography_ray.ops.window import with_ntile

    def ref_ntile(size, n):
        # SQL NTILE: sizes differ by ≤1, larger buckets first
        q, r = divmod(size, n)
        tiles = []
        for b in range(1, n + 1):
            tiles.extend([b] * (q + (1 if b <= r else 0)))
        return tiles

    # group sizes below, at, and above n=4 (incl. exact multiple)
    sizes = {1: 2, 2: 4, 3: 7, 4: 8, 5: 13}
    rows = []
    i = 0
    for k, sz in sizes.items():
        for _ in range(sz):
            rows.append((k, i))
            i += 1
    df = pd.DataFrame(rows, columns=["k", "id"])
    out = (
        with_ntile(ray.data.from_pandas(df), key="k", order_cols=["id"], n=4,
                   num_partitions=2)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    expect = []
    for k, sz in sizes.items():
        expect.extend(ref_ntile(sz, 4))
    assert list(out["tile"]) == expect


def test_hash_split_key_cohesion(ray_session):
    """All rows of one key land in the same split, labels cover the
    fraction bands, and malformed fractions raise."""
    import pandas as pd
    import pytest
    import ray.data

    from cartography_ray.ops.window import hash_split

    n = 4000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype="int64"),
            "key": (np.arange(n, dtype="int64") * 7) % 200,  # 20 rows/key
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = hash_split(ds, "key", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    assert len(out) == n
    per_key = out.groupby("key")["split"].nunique()
    assert (per_key == 1).all()  # leakage-safe: one split per key
    shares = out["split"].value_counts(normalize=True)
    assert shares["train"] > 0.6 and shares["train"] < 0.95
    assert set(out["split"]) <= {"train", "val", "test"}
    # determinism across a second invocation
    again = hash_split(ds, "key", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("rid").reset_index(drop=True),
        again.sort_values("rid").reset_index(drop=True),
    )
    with pytest.raises(ValueError):
        hash_split(ds, "key", {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        hash_split(ds, "key", {"all": 1.0})


def test_interp_fill_reference_and_edges(ray_session):
    """ops/window.interp_fill: interior gaps interpolate linearly,
    trailing gaps carry forward, leading gaps stay NaN, observed rows
    pass through exactly."""
    import ray.data

    from cartography_ray.ops.window import interp_fill

    df = pd.DataFrame(
        {
            "k": ["a"] * 7 + ["b"] * 4,
            "slot": [0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3],
            "v":    [0, 10, 0, 0, 40, 0, 0, 0, 8, 0, 0],
            "obs":  [0, 1, 0, 0, 1, 0, 0, 0, 1, 1, 0],
        }
    )
    df["slot"] = df["slot"].astype("int64")
    df["v"] = df["v"].astype("int64")
    out = (
        interp_fill(
            ray.data.from_pandas(df), key="k", order_col="slot",
            value_col="v", observed_col="obs", out_col="f", num_partitions=2,
        )
        .to_pandas()
        .sort_values(["k", "slot"])
        .reset_index(drop=True)
    )
    a = out[out.k == "a"]["f"].to_numpy()
    # leading gap NaN; observed 10 at slot1; interp 20, 30; observed 40;
    # trailing LOCF 40, 40
    assert np.isnan(a[0])
    assert a[1] == 10.0 and a[4] == 40.0
    assert a[2] == 20.0 and a[3] == 30.0
    assert a[5] == 40.0 and a[6] == 40.0
    b = out[out.k == "b"]["f"].to_numpy()
    assert np.isnan(b[0]) and b[1] == 8.0 and b[2] == 0.0 and b[3] == 0.0


def test_running_distinct_matches_python_reference(ray_session):
    """ops/window.running_distinct equals a literal per-row set-size
    evaluation, including interleaved keys across buckets."""
    import ray.data

    from cartography_ray.ops.window import running_distinct

    rng = np.random.default_rng(55)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n),
            "ts": rng.integers(0, 1_000_000, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "t": rng.integers(0, 9, n).astype("int64"),
        }
    )
    out = (
        running_distinct(
            ray.data.from_pandas(df), key="k", order_cols=["ts", "id"],
            distinct_col="t", out_col="nd", num_partitions=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    seen: dict[int, set] = {}
    want = np.empty(n, dtype="int64")
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
    for row_id, k, t in zip(ref["id"], ref["k"], ref["t"]):
        s = seen.setdefault(k, set())
        s.add(t)
        want[row_id] = len(s)
    assert (out["nd"].to_numpy() == want).all()
    # monotone per key, starts at 1
    g = out.set_index("id").loc[ref["id"]]["nd"].to_numpy()
    firsts = ~ref.duplicated("k").to_numpy()
    assert (g[firsts] == 1).all()


def test_locf_matches_pandas_ffill(ray_session):
    """ops/window.locf: carry-forward equals grouped pandas ffill;
    leading unobserved rows get the sentinel (int path) / NaN (float
    path)."""
    import ray.data

    from cartography_ray.ops.window import locf

    rng = np.random.default_rng(44)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "slot": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 1000, n).astype("int64"),
            "obs": (rng.random(n) < 0.3).astype("int64"),
        }
    )
    # force a leading gap: key 0's earliest rows unobserved
    df.loc[df.sort_values(["k", "slot"]).groupby("k").head(3).index, "obs"] = 0
    out = (
        locf(
            ray.data.from_pandas(df), key="k", order_cols=["slot"],
            value_col="v", observed_col="obs", out_col="f", num_partitions=4,
        )
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "slot"], kind="mergesort")
    ref = ref.assign(
        f=ref["v"].astype("float64").where(ref["obs"] != 0)
        .groupby(ref["k"]).ffill().fillna(-1).astype("int64")
    ).sort_values("slot").reset_index(drop=True)
    assert (out["f"].to_numpy() == ref["f"].to_numpy()).all()
    assert (out["f"] == -1).any()  # the forced leading gap hit the sentinel
    # float input stays float, gaps before first observation stay NaN
    dff = df.assign(v=df["v"].astype("float64"))
    outf = (
        locf(
            ray.data.from_pandas(dff), key="k", order_cols=["slot"],
            value_col="v", observed_col="obs", out_col="f", num_partitions=4,
        )
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    assert outf["f"].dtype == np.float64 and outf["f"].isna().any()


def test_ewma_matches_pandas(ray_session):
    """ops/window.ewma must equal pandas groupby-ewm(adjust=False)
    bit-for-bit — dyadic AND non-dyadic α (the distributed shuffle must
    not perturb the per-key C kernel)."""
    import ray.data

    from cartography_ray.ops.window import ewma

    rng = np.random.default_rng(33)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "ts": rng.integers(0, 10_000_000, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 500_000, n).astype("int64"),
        }
    )
    for alpha in (0.5, 0.3):
        out = (
            ewma(
                ray.data.from_pandas(df), key="k", order_cols=["ts", "id"],
                value_col="v", alpha=alpha, num_partitions=4,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
        ref = ref.assign(
            ewma=ref.groupby("k")["v"]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
        ).sort_values("id").reset_index(drop=True)
        assert (out["ewma"].to_numpy() == ref["ewma"].to_numpy()).all(), alpha
    # seed semantics: each key's first (ts, id)-ordered row equals its raw value
    first = (
        ref.sort_values(["k", "ts", "id"], kind="mergesort").groupby("k").head(1)
    )
    assert (first["ewma"].to_numpy() == first["v"].to_numpy().astype("float64")).all()


def test_rolling_sum_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.window import rolling_sum

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "ts": rng.integers(0, 10_000_000, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(-50, 100, n).astype("int64"),
        }
    )
    out = (
        rolling_sum(
            ray.data.from_pandas(df), key="k", order_cols=["ts", "id"],
            value_col="v", window_rows=5, out_col="roll", num_partitions=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort")
    ref = ref.assign(
        roll=ref.groupby("k")["v"].rolling(5, min_periods=1).sum().droplevel(0)
    ).sort_values("id").reset_index(drop=True)
    assert (out["roll"].to_numpy() == ref["roll"].to_numpy().astype("int64")).all()
    # window_rows=1 degenerates to the value itself
    out1 = (
        rolling_sum(
            ray.data.from_pandas(df), key="k", order_cols=["ts", "id"],
            value_col="v", window_rows=1, out_col="roll",
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert (out1["roll"].to_numpy() == df["v"].to_numpy()).all()


def test_cohort_retention_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.window import cohort_retention

    rng = np.random.default_rng(22)
    n = 5000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 120, n),
            "day": rng.integers(100, 130, n).astype("int64"),
        }
    )
    out = (
        cohort_retention(ray.data.from_pandas(df), key="u", day_col="day")
        .to_pandas()
        .sort_values(["cohort_day", "age_days"])
        .reset_index(drop=True)
    )
    ud = df.drop_duplicates(["u", "day"]).copy()
    ud["cohort_day"] = ud.groupby("u")["day"].transform("min")
    ud["age_days"] = ud["day"] - ud["cohort_day"]
    ref = (
        ud.groupby(["cohort_day", "age_days"]).size().rename("users").reset_index()
        .sort_values(["cohort_day", "age_days"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["cohort_day", "age_days", "users"]].astype("int64"),
        ref.astype("int64"),
    )
    # every cohort's age-0 cell counts each of its users exactly once
    firsts = ud.groupby("u")["cohort_day"].first().value_counts()
    got0 = out[out.age_days == 0].set_index("cohort_day")["users"]
    assert (got0.sort_index() == firsts.sort_index()).all()


def test_funnel_counts_matches_bruteforce(ray_session):
    import ray.data

    from cartography_ray.ops.window import funnel_counts

    rng = np.random.default_rng(23)
    n = 6000
    steps = ["a", "b", "c"]
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 200, n),
            "ts": rng.integers(0, 1000, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "typ": rng.choice(["a", "b", "c", "x"], n, p=[0.2, 0.2, 0.1, 0.5]),
        }
    )
    out = (
        funnel_counts(
            ray.data.from_pandas(df), key="u", step_col="typ", steps=steps,
            order_cols=["ts", "id"],
        )
        .to_pandas().sort_values("step").reset_index(drop=True)
    )
    # brute force: greedy first-qualifying chain per user
    reached = np.zeros(len(steps), dtype="int64")
    for _, g in df.sort_values(["ts", "id"], kind="mergesort").groupby("u"):
        anchor = -1
        typs = g["typ"].to_numpy()
        for i, st in enumerate(steps):
            idx = np.nonzero((typs == st) & (np.arange(len(g)) > anchor))[0]
            if i == 0:
                idx = np.nonzero(typs == st)[0]
            if len(idx) == 0:
                break
            anchor = idx[0]
            reached[i] += 1
    assert (out["users"].to_numpy() == reached).all()
    assert list(out["step_name"]) == steps
    # funnel counts are monotone non-increasing by construction
    assert (np.diff(out["users"].to_numpy()) <= 0).all()


def test_with_rank_matches_pandas(ray_session):
    import ray.data

    from cartography_ray.ops.window import with_rank

    rng = np.random.default_rng(24)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n),
            "v": rng.integers(0, 40, n).astype("int64"),  # heavy ties
            "id": np.arange(n, dtype="int64"),
        }
    )
    out = (
        with_rank(
            ray.data.from_pandas(df), key="k", order_cols=["v"],
            rank_col="rnk", dense_col="drnk", rownum_col="rn",
            num_partitions=4,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    g = df.sort_values("id").groupby("k")["v"]
    assert (out["rnk"].to_numpy() == g.rank(method="min").to_numpy().astype("int64")).all()
    assert (out["drnk"].to_numpy() == g.rank(method="dense").to_numpy().astype("int64")).all()
    # row_number is a permutation of 1..group_size and consistent with rnk
    sizes = df.groupby("k").size()
    got_max = out.groupby("k")["rn"].max()
    assert (got_max.sort_index() == sizes.sort_index()).all()
    assert (out["rnk"] <= out["rn"]).all() and (out["drnk"] <= out["rnk"]).all()


def test_epoch_shuffle_global_order_and_epochs(ray_session):
    """epoch_shuffle must be globally sorted ACROSS blocks, reproduce
    identically on a second run, and permute differently per epoch."""
    import pandas as pd
    import ray.data

    from cartography_ray.ops.window import epoch_shuffle, sample_hash

    ids = np.arange(5000, dtype="int64")
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(8)

    def run(epoch):
        out = epoch_shuffle(ds, "doc_id", epoch=epoch)
        pos = []
        for b in out.iter_batches(batch_format="pandas", batch_size=512):
            pos.append(b)
        pdf = pd.concat(pos, ignore_index=True)
        return pdf

    a = run(1)
    # global non-decreasing order across every block boundary
    assert (np.diff(a["shuffle_pos"].to_numpy()) >= 0).all()
    # positions are the sample_hash scores (the SQL-twin arithmetic)
    assert (
        a.sort_values("doc_id")["shuffle_pos"].to_numpy() == sample_hash(ids, 1)
    ).all()
    # deterministic: a second run yields the identical permutation
    b = run(1)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    # a different epoch is a different permutation of the same rows
    c = run(2)
    assert sorted(c["doc_id"]) == sorted(a["doc_id"])
    assert (c["doc_id"].to_numpy() != a["doc_id"].to_numpy()).any()


def test_interval_union_matches_reference(ray_session):
    import ray.data

    from cartography_ray.ops.window import interval_union

    rng = np.random.default_rng(41)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n).astype("int64"),
            "s": rng.integers(0, 100_000, n).astype("int64"),
        }
    )
    df["e"] = df["s"] + rng.integers(1, 3000, n).astype("int64")
    # seed exact duplicates and touching intervals (s == prev island end)
    df.loc[:50, ["k", "s", "e"]] = df.loc[51:101, ["k", "s", "e"]].to_numpy()

    got = (
        interval_union(
            ray.data.from_pandas(df).repartition(5), key="k",
            start_col="s", end_col="e", num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "island_start"])
        .reset_index(drop=True)
    )

    # per-key python sweep reference
    rows = []
    for k, grp in df.sort_values(["k", "s", "e"]).groupby("k"):
        cur_s = cur_e = None
        n_iv = 0
        for s, e in zip(grp["s"], grp["e"]):
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    rows.append((k, cur_s, cur_e, n_iv))
                cur_s, cur_e, n_iv = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n_iv += 1
        if cur_s is not None:
            rows.append((k, cur_s, cur_e, n_iv))
    want = pd.DataFrame(rows, columns=["k", "island_start", "island_end", "n_iv"])
    want["n_iv"] = want["n_iv"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["k", "island_start", "island_end", "n_iv"]], want
    )


def test_sequence_paths_matches_reference(ray_session):
    import ray.data

    from cartography_ray.ops.window import sequence_paths

    rng = np.random.default_rng(53)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n).astype("int64"),
            "o": rng.permutation(n).astype("int64"),
            "v": rng.choice(list("abcde"), n),
        }
    )
    got = (
        sequence_paths(
            ray.data.from_pandas(df).repartition(6), key="k",
            order_cols=["o"], value_col="v", max_len=7, sep="-",
            num_buckets=8, num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    s = df.sort_values(["k", "o"]).groupby("k").head(7)
    g = s.groupby("k")["v"]
    want = pd.DataFrame(
        {"path": g.agg("-".join), "n": g.size().astype("int64")}
    ).reset_index()
    pd.testing.assert_frame_equal(got[["k", "path", "n"]], want)


def test_gap_fill_matches_reference(ray_session):
    import ray.data

    from cartography_ray.ops.window import gap_fill

    # keys with interior gaps, a single-slot key, and a dense key
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c", "c"],
            "slot": [3, 7, 5, 10, 0, 1],
            "n": [2, 1, 4, 9, 5, 6],
        }
    ).astype({"slot": "int64", "n": "int64"})
    got = (
        gap_fill(
            ray.data.from_pandas(pdf).repartition(3),
            key="k",
            bucket_col="slot",
            value_cols=["n"],
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["k", "slot"])
        .reset_index(drop=True)
    )
    want = []
    for k, sub in pdf.groupby("k"):
        m = dict(zip(sub["slot"], sub["n"]))
        for s in range(sub["slot"].min(), sub["slot"].max() + 1):
            want.append({"k": k, "slot": s, "n": m.get(s, 0)})
    want = pd.DataFrame(want).astype({"slot": "int64", "n": "int64"})
    pd.testing.assert_frame_equal(got, want)
    # per-key density invariant: rows == max-min+1, gaps are exact zeros
    assert len(got) == 5 + 1 + 2
    assert got.loc[(got["k"] == "a") & (got["slot"] == 4), "n"].item() == 0


def test_keyed_rate_sample_matches_hash_contract(ray_session):
    import ray.data

    from cartography_ray.ops.window import (
        SAMPLE_MOD,
        keyed_rate_sample,
        sample_hash,
    )

    n = 4000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "k": np.tile(["x", "y", "z", "unmapped"], n // 4),
        }
    )
    rates = {"x": 0.9, "y": 0.3, "z": 0.0}
    got = (
        keyed_rate_sample(
            ray.data.from_pandas(pdf).repartition(4), "id", "k", rates,
            default_rate=0.1,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    h = sample_hash(pdf["id"].to_numpy())
    cut = pdf["k"].map({k: int(r * SAMPLE_MOD) for k, r in rates.items()}) \
        .fillna(int(0.1 * SAMPLE_MOD)).to_numpy(dtype="int64")
    want = pdf[h < cut].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["k"] == "z").sum() == 0            # rate 0 drops everything
    assert (got["k"] == "unmapped").sum() > 0      # default path engaged
    # realized per-key rates near the nominal ones
    gx = (got["k"] == "x").sum() / (n / 4)
    assert 0.8 < gx < 1.0


def test_ordered_budget_select_matches_reference(ray_session):
    """Prefix-cut semantics: SUM(sz) OVER (ORDER BY score DESC, id) <=
    budget — boundary bin cut by id, zero-size rows at the boundary kept
    while the cumsum holds, whole-corpus and empty edge cases."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.window import ordered_budget_select
    from cartography_ray.runtime import to_pandas_typed

    rng_ids = np.arange(200, dtype=np.int64)
    # few distinct scores → a fat boundary bin; some zero sizes
    score = (rng_ids * 7919 % 5).astype(np.int64)
    sz = (rng_ids * 104729 % 9).astype(np.int64)  # 0..8, zeros included
    df = pd.DataFrame({"doc_id": rng_ids, "score": score, "sz": sz})

    def reference(budget):
        o = df.sort_values(["score", "doc_id"], ascending=[False, True])
        keep = o[o["sz"].cumsum() <= budget]
        return set(keep["doc_id"])

    ds = ray.data.from_pandas(df).repartition(5)
    for budget in (0, 37, 150, 400, 10_000):
        got = to_pandas_typed(
            ordered_budget_select(ds, "score", "sz", "doc_id", budget)
        )
        assert set(got["doc_id"]) == reference(budget), f"budget={budget}"

    # empty input passes through
    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "sz": pa.array([], pa.int64()),
            }
        )
    )
    assert ordered_budget_select(empty, "score", "sz", "doc_id", 10).count() == 0


def test_ordered_budget_select_property_vs_pandas(ray_session):
    """Property test: ordered_budget_select equals the pandas window
    cumsum (ORDER BY score DESC, id) <= budget on randomized frames —
    skewed score distributions, zero sizes, tiny and over-large budgets."""
    import numpy as np
    import pandas as pd
    import ray.data
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cartography_ray.ops.window import ordered_budget_select
    from cartography_ray.runtime import to_pandas_typed

    rows = st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 7)),
        min_size=0, max_size=24,
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(data=rows, budget=st.integers(0, 60))
    def check(data, budget):
        df = pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(data)), dtype="int64"),
                "score": pd.Series([d[0] for d in data], dtype="int64"),
                "sz": pd.Series([d[1] for d in data], dtype="int64"),
            }
        )
        got = to_pandas_typed(
            ordered_budget_select(
                ray.data.from_pandas(df).repartition(3),
                "score", "sz", "doc_id", budget,
            )
        )
        o = df.sort_values(["score", "doc_id"], ascending=[False, True])
        want = set(o[o["sz"].cumsum() <= budget]["doc_id"])
        # an empty from_pandas→repartition input carries no schema at
        # all (Ray 2.49) — the empty result is then column-less too
        got_ids = set(got["doc_id"]) if "doc_id" in got.columns else set()
        assert got_ids == want, (data, budget)

    check()


def test_table_profile_property_vs_pandas(ray_session):
    """Property test: table_profile equals pandas count/nunique (nulls
    excluded from distinct) on randomized int/string frames with nulls."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cartography_ray.ops.agg import table_profile

    vals = st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-3, 3)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1, max_size=20,
    )

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(data=vals)
    def check(data):
        tbl = pa.table(
            {
                "i": pa.array([d[0] for d in data], pa.int64()),
                "s": pa.array([d[1] for d in data], pa.string()),
            }
        )
        out = (
            table_profile(ray.data.from_arrow(tbl).repartition(2), ["i", "s"])
            .to_pandas()
            .set_index("col_name")
        )
        df = tbl.to_pandas()
        for c in ("i", "s"):
            assert out.loc[c, "n"] == len(df)
            assert out.loc[c, "n_null"] == int(df[c].isna().sum())
            assert out.loc[c, "n_distinct"] == int(df[c].nunique(dropna=True))

    check()
