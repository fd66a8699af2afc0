"""Resumable partitioned sink (state/sink.py): roundtrip, resume-skip,
stale-partition rewrite, and fingerprint invalidation."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest


def _df(n=5000, seed=71):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 500, n).astype("int64"),
            "v": rng.integers(0, 10_000, n).astype("int64"),
        }
    )


def _read_all(root):
    from cartography_ray.state.sink import read_partitioned

    return (
        read_partitioned(root)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )


def test_write_partitioned_roundtrip_and_resume(ray_session, tmp_path):
    import ray.data

    from cartography_ray.state.sink import write_partitioned

    root = str(tmp_path / "out")
    df = _df()
    ds = ray.data.from_pandas(df).repartition(6)

    r1 = write_partitioned(ds, root, "k", num_parts=16, fingerprint="fp1",
                           num_partitions=4)
    assert r1["skipped"] == 0 and r1["rows"] == len(df) and r1["written"] > 0
    got = _read_all(root)
    pd.testing.assert_frame_equal(
        got, df.sort_values(["k", "v"]).reset_index(drop=True)
    )

    # full resume: everything sealed, nothing rewritten, data unchanged
    before = {
        p: os.path.getmtime(os.path.join(root, p, "data.parquet"))
        for p in os.listdir(root) if p.startswith("part=")
    }
    r2 = write_partitioned(ds, root, "k", num_parts=16, fingerprint="fp1",
                           num_partitions=4)
    assert r2 == {"written": 0, "skipped": 16, "rows": 0}
    after = {
        p: os.path.getmtime(os.path.join(root, p, "data.parquet"))
        for p in os.listdir(root) if p.startswith("part=")
    }
    assert before == after
    pd.testing.assert_frame_equal(_read_all(root), got)


def test_write_partitioned_rewrites_unsealed_only(ray_session, tmp_path):
    import ray.data

    from cartography_ray.state.sink import write_partitioned

    root = str(tmp_path / "out")
    df = _df(seed=73)
    ds = ray.data.from_pandas(df).repartition(5)
    write_partitioned(ds, root, "k", num_parts=8, fingerprint="fp",
                      num_partitions=4)

    # simulate a crash: one partition lost its marker, another was left
    # as a half-written tmp dir
    victim = sorted(p for p in os.listdir(root) if p.startswith("part="))[0]
    os.remove(os.path.join(root, victim, "_SUCCESS"))
    os.makedirs(os.path.join(root, ".tmp-9999-dead"), exist_ok=True)

    r = write_partitioned(ds, root, "k", num_parts=8, fingerprint="fp",
                          num_partitions=4)
    assert r["skipped"] == 7 and r["written"] == 1
    assert not any(p.startswith(".tmp-") for p in os.listdir(root))
    pd.testing.assert_frame_equal(
        _read_all(root), df.sort_values(["k", "v"]).reset_index(drop=True)
    )


def test_write_partitioned_fingerprint_invalidates(ray_session, tmp_path):
    import ray.data

    from cartography_ray.state.sink import write_partitioned

    root = str(tmp_path / "out")
    df1, df2 = _df(seed=79), _df(n=3000, seed=83)
    write_partitioned(ray.data.from_pandas(df1), root, "k", num_parts=8,
                      fingerprint="a", num_partitions=4)
    r = write_partitioned(ray.data.from_pandas(df2), root, "k", num_parts=8,
                          fingerprint="b", num_partitions=4)
    assert r["skipped"] == 0 and r["rows"] == len(df2)
    pd.testing.assert_frame_equal(
        _read_all(root), df2.sort_values(["k", "v"]).reset_index(drop=True)
    )
    markers = [
        json.load(open(os.path.join(root, p, "_SUCCESS")))
        for p in os.listdir(root) if p.startswith("part=")
    ]
    assert all(m["fingerprint"] == "b" for m in markers)


def test_write_partitioned_stale_partitions_removed(ray_session, tmp_path):
    """Review repro: a new fingerprint must invalidate ALL old
    partitions — including ones the new dataset sends zero rows to —
    and read_partitioned on an empty/unsealed root returns empty."""
    import ray.data

    from cartography_ray.state.sink import read_partitioned, write_partitioned

    root = str(tmp_path / "out")
    # fresh (nothing sealed) root reads as empty, not a read_parquet([]) error
    fresh = str(tmp_path / "fresh")
    os.makedirs(fresh, exist_ok=True)
    assert read_partitioned(fresh).count() == 0

    df1 = _df(n=4000, seed=91)  # 500 keys -> all 16 partitions
    write_partitioned(ray.data.from_pandas(df1), root, "k", num_parts=16,
                      fingerprint="a", num_partitions=4)
    # new dataset: ONE key only -> rows land in a single partition
    df2 = pd.DataFrame({"k": np.zeros(7, dtype="int64"),
                        "v": np.arange(7, dtype="int64")})
    write_partitioned(ray.data.from_pandas(df2), root, "k", num_parts=16,
                      fingerprint="b", num_partitions=4)
    got = read_partitioned(root).to_pandas()
    assert len(got) == 7, f"stale rows leaked: {len(got)}"
    assert set(got["k"]) == {0}
