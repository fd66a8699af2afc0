"""Tests for the training-data operator family (dedup / ANN / text /
multimodal) including recall of the approximate paths vs exact baselines."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(sf="/root/testdata/sf0.001"):
    import ray.data

    return ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])


def test_exact_dedup_with_real_duplicates(ray_session):
    import ray.data

    from cartography_ray.functions.dedup import exact_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": ["hello  world", "Hello world", "other", "hello world", "OTHER"],
        }
    )
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    # normalization: case + whitespace collapse ⇒ {1,2,4} merge → keep 1;
    # {3,5} merge → keep 3
    assert sorted(out["doc_id"]) == [1, 3]


def test_minhash_recall_vs_exact(ray_session):
    """LSH candidates must recover ≥90% of true pairs at the threshold."""
    from cartography_ray.functions.dedup import jaccard_pairs_smallside, minhash_lsh_pairs

    ds = _docs_ds()
    exact = jaccard_pairs_smallside(ds, subset_ids=list(range(500)), threshold=0.25).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    # r=1 banding (bands == num_perm): candidate probability at j=0.25 is
    # 1-(1-j)^32 ≈ 1.0 — the right operating point for a low threshold
    approx = minhash_lsh_pairs(_docs_ds(), threshold=0.25, num_perm=32, bands=32).to_pandas()
    approx_pairs = set(zip(approx["id_a"], approx["id_b"]))
    # verification step means precision is exact
    assert approx_pairs <= exact_pairs
    if exact_pairs:
        recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"minhash recall too low: {recall}"


def test_minhash_skinny_path_equals_carry(ray_session):
    """The band-skinny + candidate-text-join path (the 100-TB shuffle
    posture, VERDICT r02 item 5) must produce the exact same verified
    pairs as the carry-text path: same banding → same candidates → same
    exact-Jaccard verification."""
    from cartography_ray.functions.dedup import minhash_lsh_pairs

    kw = dict(threshold=0.25, num_perm=32, bands=32)
    carry = minhash_lsh_pairs(_docs_ds(), payload="text", **kw).to_pandas()
    skinny = minhash_lsh_pairs(_docs_ds(), payload="none", **kw).to_pandas()
    cp = sorted(zip(carry["id_a"], carry["id_b"], carry["jaccard"].round(9)))
    sp = sorted(zip(skinny["id_a"], skinny["id_b"], skinny["jaccard"].round(9)))
    assert cp == sp and len(cp) > 0

    # the sig-prefilter path yields a subset (borderline-miss prob only),
    # and every surviving pair carries the same exact jaccard
    sig = minhash_lsh_pairs(_docs_ds(), payload="sig", **kw).to_pandas()
    gp = sorted(zip(sig["id_a"], sig["id_b"], sig["jaccard"].round(9)))
    assert set(gp) <= set(cp)
    assert len(gp) >= 0.8 * len(cp)


def test_simhash_identical_docs(ray_session):
    import ray.data

    from cartography_ray.functions.dedup import simhash_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["the quick brown fox jumps over the lazy dog"] * 2 + ["completely different words here"],
        }
    )
    out = simhash_pairs(ray.data.from_arrow(tbl), max_hamming=3).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_knn_lsh_recall(ray_session):
    """LSH ANN must agree with brute force on most neighbors."""
    import ray.data

    from cartography_ray.functions.ann import knn_brute, knn_lsh

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    queries = {
        v: np.asarray(e, dtype=np.float64)
        for v, e in zip(t.column("vec_id").to_pylist()[:5], t.column("embedding").to_pylist()[:5])
    }
    brute = knn_brute(ds, queries, k=5).to_pandas()
    approx = knn_lsh(
        ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        queries,
        k=5,
        planes=3,
    ).to_pandas()
    b = {(q, n) for q, n in zip(brute["query_id"], brute["neighbor_id"])}
    a = {(q, n) for q, n in zip(approx["query_id"], approx["neighbor_id"])}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, f"lsh knn recall too low: {recall}"


def test_source_temperature_weights_semantics(ray_session):
    """α=1 → proportional weights, α=0 → uniform, α∈(0,1) compresses the
    ratio between large and small sources while keeping order."""
    import ray.data

    from cartography_ray.functions.text import source_temperature_weights

    tbl = pa.table(
        {
            "source": pa.array(["a"] * 8 + ["b"] * 2 + ["c"] * 1),
            "n_chars": pa.array([100] * 8 + [100] * 2 + [100] * 1, pa.int64()),
        }
    )

    def w(alpha):
        out = source_temperature_weights(
            ray.data.from_arrow(tbl), "source", "n_chars", alpha=alpha
        ).to_pandas().set_index("source")
        return out["weight6"]

    prop = w(1.0)
    assert abs(prop["a"] - 8 / 11) < 1e-5 and abs(prop["c"] - 1 / 11) < 1e-5
    uni = w(0.0)
    assert abs(uni["a"] - uni["c"]) < 1e-5
    mid = w(0.5)
    assert prop["a"] / prop["c"] > mid["a"] / mid["c"] > 1.0  # compressed, ordered
    assert abs(mid.sum() - 1.0) < 1e-4


def _mmr_reference(vecs, ids, q, k, lam):
    """Textbook greedy MMR over the FULL corpus (independent numpy
    implementation — mirrors the operator's rounding/tie contract)."""
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    v = norm(vecs.astype(np.float64))
    qn = q.astype(np.float64) / max(np.linalg.norm(q), 1e-300)
    simq = np.round(v @ qn, 6)
    n = len(ids)
    active = np.ones(n, bool)
    max_div = np.full(n, -np.inf)
    out = []
    for r in range(1, min(k, n) + 1):
        div = np.where(np.isneginf(max_div), 0.0, max_div)
        obj = np.round(lam * simq - (1 - lam) * div, 6)
        obj = np.where(active, obj, -np.inf)
        best = int(np.lexsort((ids, -obj))[0])
        out.append((r, int(ids[best]), float(simq[best]), float(obj[best])))
        active[best] = False
        max_div = np.maximum(max_div, np.round(v @ v[best], 6))
    return out


def test_mmr_topk_matches_reference_and_diversifies(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from cartography_ray.functions.ann import mmr_topk

    src = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(src)
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = vecs[0]

    # pool ≥ corpus: distributed result must equal textbook MMR exactly
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"]).repartition(4)
    got = mmr_topk(ds, q, k=8, lam=0.7, pool=len(ids)).to_pandas()
    want = _mmr_reference(vecs, ids, q, k=8, lam=0.7)
    assert list(zip(got["rank"], got["vec_id"])) == [(r, i) for r, i, _, _ in want]
    np.testing.assert_allclose(got["sim6"], [s for _, _, s, _ in want], atol=1e-12)
    np.testing.assert_allclose(got["mmr6"], [m for _, _, _, m in want], atol=1e-12)
    # rank 1 is the plain nearest neighbor (the query row itself here)
    assert got["vec_id"].iloc[0] == 0

    # diversity: six exact copies of the query plus six off-axis vectors
    # d_i = 0.6·q + 0.8·e_i (simq 0.6, mutual sim 0.36). After the first
    # copy is picked, a second copy scores λ−(1−λ) = −0.10 at λ=0.45
    # while each d_i scores 0.6·(2λ−1) = −0.06 — so MMR must take ONE
    # copy then only off-axis vectors; plain top-k would take all copies.
    dim = 16
    e = np.eye(dim)
    copies = np.stack([e[0]] * 6)
    distinct = np.stack([0.6 * e[0] + 0.8 * e[i + 1] for i in range(6)])
    corpus = np.vstack([copies, distinct])
    cids = np.arange(len(corpus), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(cids, pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in corpus],
                pa.list_(pa.float32()),
            ),
        }
    )
    sel = mmr_topk(
        ray.data.from_arrow(tbl), e[0], k=4, lam=0.45, pool=len(cids)
    ).to_pandas()
    n_copies = int((sel["vec_id"] < 6).sum())
    assert n_copies == 1, f"MMR selected {n_copies} query copies: {sel}"

    # pool pruning: pool < corpus still returns k rows from the pool
    small = mmr_topk(ds, q, k=5, lam=0.7, pool=16).to_pandas()
    assert len(small) == 5 and small["rank"].tolist() == [1, 2, 3, 4, 5]


def test_mmr_ride_along_preserves_float64(ray_session):
    """The pool ride-along must keep a float64 corpus's precision: a
    float32 cast perturbs the driver's mutual-similarity (diversity)
    terms by ~1e-7, which flips 6-decimal roundings right at a boundary
    and breaks the textbook-MMR equality contract."""
    import ray.data

    from cartography_ray.functions.ann import mmr_topk

    # deterministically find a similarity whose 6-decimal rounding
    # flips under a float32 round-trip
    x = None
    for step in range(1, 5000):
        c = np.float64(0.123456) + step * 1e-9
        if np.round(c, 6) != np.round(np.float64(np.float32(c)), 6):
            x = c
            break
    assert x is not None
    c1 = [1.0, 0.0]
    c2 = [float(x), float(np.sqrt(1.0 - x * x))]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([c1, c2], pa.list_(pa.float64())),
        }
    )
    # lam=0 → step-1 objs tie at 0 (empty-set diversity), id tie-break
    # picks c1; step-2 mmr6 = −round6(c2·c1) = −round6(x), which only
    # comes out right if the ride-along kept float64.
    got = mmr_topk(
        ray.data.from_arrow(tbl), np.array(c1), k=2, lam=0.0, pool=4
    ).to_pandas()
    row2 = got[got["rank"] == 2].iloc[0]
    assert row2["vec_id"] == 2
    assert row2["mmr6"] == np.round(-np.round(x, 6), 6)


def test_multimodal_stub_pipeline(ray_session):
    import ray.data

    from cartography_ray.functions.multimodal import (
        FrameSampler,
        ImageDecoder,
        decode_pipeline,
        synth_media_table,
    )

    media = ray.data.from_arrow(synth_media_table(32))
    decoded = decode_pipeline(media, concurrency=2, batch_size=8, fake=True).to_pandas()
    assert len(decoded) == 32
    assert set(decoded.columns) == {
        "media_id", "pixel_mean", "pixel_std", "decoded_w", "decoded_h", "content_digest",
    }
    # deterministic digests across two runs
    decoded2 = decode_pipeline(
        ray.data.from_arrow(synth_media_table(32)), concurrency=2, batch_size=8, fake=True
    ).to_pandas()
    assert decoded.sort_values("media_id")["content_digest"].tolist() == \
        decoded2.sort_values("media_id")["content_digest"].tolist()

    frames = ray.data.from_arrow(synth_media_table(8)).map_batches(
        FrameSampler, fn_constructor_kwargs={"fake": True, "every_n": 2},
        batch_format="pyarrow", concurrency=2, batch_size=4,
    ).to_pandas()
    assert len(frames) > 0

    # non-fake decode raises the documented NotImplementedError
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)(synth_media_table(1))


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data

    from cartography_ray.ops.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 3], "x": list("abcd")})
    right = pd.DataFrame({"k": [2, 3, 4], "y": list("xyz")})
    out = (
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), left_on="k", num_buckets=4
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    expected = left.merge(right, on="k").sort_values(["k", "x"]).reset_index(drop=True)
    assert out.equals(expected)


def test_hash_join_property_vs_pandas(ray_session):
    """Property test: every join mode matches the pandas reference on
    randomized small frames (dup keys, nulls, disjoint keys, empties)."""
    import pandas as pd
    import ray.data
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks, to_pandas_typed

    keys = st.lists(st.one_of(st.integers(0, 5).map(float), st.none()), min_size=0, max_size=8)

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(lk=keys, rk=keys, how=st.sampled_from(["inner", "left", "semi", "anti"]))
    def check(lk, rk, how):
        left = pd.DataFrame({"k": pd.Series(lk, dtype="float64"),
                             "x": [f"l{i}" for i in range(len(lk))]})
        right = pd.DataFrame({"k": pd.Series(rk, dtype="float64"),
                              "y": [f"r{i}" for i in range(len(rk))]})
        got = to_pandas_typed(drop_empty_blocks(
            hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                      left_on="k", how=how, num_buckets=4, num_partitions=4)
        ))
        if how in ("semi", "anti"):
            nn = left.dropna(subset=["k"])
            hit = nn["k"].isin(right["k"].dropna())
            want = nn[hit] if how == "semi" else pd.concat(
                [nn[~hit], left[left["k"].isna()]]
            )
            assert sorted(got["x"]) == sorted(want["x"])
            assert list(got.columns) == ["k", "x"]
        else:
            # SQL null semantics (hash_join's contract): null keys never
            # match — unlike pandas merge, which pairs NaN with NaN
            rnn = right.dropna(subset=["k"])
            if how == "inner":
                want = left.dropna(subset=["k"]).merge(rnn, on="k", how="inner")
            else:  # left: null-key left rows survive unmatched
                lnn = left.dropna(subset=["k"])
                want = pd.concat(
                    [lnn.merge(rnn, on="k", how="left"), left[left["k"].isna()]]
                )
            a = got.fillna("~").sort_values(list(got.columns)).reset_index(drop=True)
            b = want.fillna("~").sort_values(list(got.columns)).reset_index(drop=True)
            assert a.equals(b[a.columns]), f"{how}\n{a}\nvs\n{b}"

    check()


def test_local_merge_elision_identity(ray_session, monkeypatch):
    """The AQE-style local fast path (measured-small union → ONE task, no
    hash shuffle) must be byte-identical to the forced-shuffle plan for
    every join family, and must actually engage on small inputs."""
    import pandas as pd
    import ray.data

    from cartography_ray.ops import joins
    from cartography_ray.runtime import drop_empty_blocks, to_pandas_typed

    rng = np.random.RandomState(7)
    n = 4000
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 50, n).astype(float),
            "t": rng.randint(0, 10_000, n).astype("int64"),
            "x": [f"l{i}" for i in range(n)],
        }
    )
    left.loc[::97, "k"] = None
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 60, 500).astype(float),
            "t": rng.randint(0, 10_000, 500).astype("int64"),
            "y": [f"r{i}" for i in range(500)],
        }
    )

    def norm(df):
        return (
            df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)
        )

    def run_all():
        out = {}
        for how in ("inner", "left", "outer", "semi", "anti"):
            out[f"hash_{how}"] = to_pandas_typed(
                drop_empty_blocks(
                    joins.hash_join(
                        ray.data.from_pandas(left),
                        ray.data.from_pandas(right),
                        left_on="k",
                        how=how,
                        num_buckets=8,
                        right_prefix="r_",
                    )
                )
            )
        out["asof"] = to_pandas_typed(
            joins.asof_join(
                ray.data.from_pandas(left.dropna(subset=["k"])),
                ray.data.from_pandas(right),
                by="k",
                on="t",
                how="left",
            )
        )
        ivals = right.assign(lo=right["t"], hi=right["t"] + 500)[
            ["k", "lo", "hi", "y"]
        ]
        out["range"] = to_pandas_typed(
            joins.range_join(
                ray.data.from_pandas(left.dropna(subset=["k"])),
                ray.data.from_pandas(ivals),
                by="k",
                point_col="t",
                lo_col="lo",
                hi_col="hi",
            )
        )
        return {k: norm(v) for k, v in out.items()}

    # local path (default limits engage at this size) — prove it ran by
    # watching the lazily-bound merge task get created
    monkeypatch.setattr(joins, "_merge_union_task", None)
    local = run_all()
    assert joins._merge_union_task is not None  # fast path engaged
    # forced-shuffle plan
    monkeypatch.setattr(joins, "LOCAL_MERGE_ROW_LIMIT", 0)
    shuffled = run_all()
    for name, frame in local.items():
        assert list(frame.columns) == list(shuffled[name].columns), name
        assert frame.equals(shuffled[name]), name


def test_hash_join_semi_anti(ray_session):
    """Distributed semi/anti (VERDICT r02 item 3): left-only output
    columns, null left keys kept by anti / dropped by semi, duplicate
    right keys collapse."""
    import pandas as pd
    import ray.data

    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    left = pd.DataFrame({"k": [1.0, 2.0, 2.0, 3.0, None], "x": list("abcde")})
    right = pd.DataFrame({"k": [2.0, 2.0, 4.0, None], "y": list("wxyz")})

    def run(how):
        out = drop_empty_blocks(
            hash_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                left_on="k", how=how, num_buckets=4,
            )
        ).to_pandas()
        assert list(out.columns) == ["k", "x"]
        return sorted(out["x"])

    assert run("semi") == ["b", "c"]
    assert run("anti") == ["a", "d", "e"]  # null left key survives anti


def test_topk_and_partial_agg(ray_session):
    import pandas as pd
    import ray.data

    from cartography_ray.ops.agg import partial_groupby_agg, topk

    df = pd.DataFrame({"g": ["a", "a", "b", "b", "b"], "v": [1, 5, 2, 2, 9]})
    ds = ray.data.from_pandas(df)
    agg = partial_groupby_agg(ds, "g", {"s": ("v", "sum"), "n": (None, "count")}).to_pandas()
    agg = agg.sort_values("g").reset_index(drop=True)
    assert agg["s"].tolist() == [6, 13]
    assert agg["n"].tolist() == [2, 3]

    top = topk(ray.data.from_pandas(df), by="v", k=2).to_pandas()
    assert top["v"].tolist() == [9, 5]


def test_incremental_minhash_dedup_epochs(ray_session, tmp_path):
    """Epoch 2's near-copies of epoch-1 docs are dropped against the
    persisted band index; novel docs survive; reruns are idempotent."""
    import ray.data

    from cartography_ray.functions.dedup import incremental_minhash_dedup

    state = str(tmp_path / "mh_index")
    base = [
        f"document number {i} talks about topic {i % 7} in some detail "
        f"with several shared phrases and a unique marker {i * 31}"
        for i in range(40)
    ]
    e1 = pa.table(
        {
            "doc_id": pa.array(np.arange(40, dtype=np.int64), pa.int64()),
            "text": base,
        }
    )
    novel = [
        f"a completely different subject line {i} — nothing shared with "
        f"the first corpus, token salad {i * 97} qwertzuiop"
        for i in range(20)
    ]
    copies = base[:10]  # exact text copies under new ids
    e2 = pa.table(
        {
            "doc_id": pa.array(
                np.concatenate(
                    [np.arange(100, 120), np.arange(1000, 1010)]
                ).astype(np.int64),
                pa.int64(),
            ),
            "text": novel + copies,
        }
    )
    s1 = incremental_minhash_dedup(
        ray.data.from_arrow(e1), state, epoch=1, threshold=0.5
    ).to_pandas()
    assert sorted(s1["doc_id"]) == list(range(40))  # empty history

    s2 = incremental_minhash_dedup(
        ray.data.from_arrow(e2), state, epoch=2, threshold=0.5
    ).to_pandas()
    assert sorted(s2["doc_id"]) == list(range(100, 120))  # copies dropped

    # idempotent rerun of epoch 2 (readers exclude the current epoch)
    s2b = incremental_minhash_dedup(
        ray.data.from_arrow(e2), state, epoch=2, threshold=0.5
    ).to_pandas()
    assert sorted(s2b["doc_id"]) == sorted(s2["doc_id"])

    # all-dropped epoch: every doc is a copy of history — the empty
    # survivor set must not crash the index-write groupby
    from cartography_ray.runtime import to_pandas_typed

    e3 = pa.table(
        {
            "doc_id": pa.array(np.arange(2000, 2040, dtype=np.int64), pa.int64()),
            "text": base,
        }
    )
    s3 = to_pandas_typed(
        incremental_minhash_dedup(
            ray.data.from_arrow(e3), state, epoch=3, threshold=0.5
        )
    )
    assert len(s3) == 0

    # proven-empty input short-circuits to a typed empty result
    s4 = to_pandas_typed(
        incremental_minhash_dedup(
            ray.data.from_arrow(e3).filter(lambda r: False).materialize(),
            state, epoch=4, threshold=0.5,
        )
    )
    assert len(s4) == 0 and list(s4.columns) == ["doc_id"]


def test_compact_dedup_index_crash_window(ray_session, tmp_path):
    """The documented crash window — base file renamed, merged inputs
    not yet deleted — leaves duplicate rows that consumers treat
    idempotently, and re-running compaction converges to one file."""
    import glob
    import shutil

    import ray.data

    from cartography_ray.functions.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
    )

    state = str(tmp_path / "crash")
    texts = [f"body {i} marker {i * 7}" for i in range(12)]
    t1 = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64), pa.int64()),
            "text": texts[:6],
        }
    )
    t2 = pa.table(
        {
            "doc_id": pa.array(np.arange(6, 12, dtype=np.int64), pa.int64()),
            "text": texts[6:],
        }
    )
    incremental_exact_dedup(ray.data.from_arrow(t1), state, epoch=1,
                            num_buckets=2).materialize()
    incremental_exact_dedup(ray.data.from_arrow(t2), state, epoch=2,
                            num_buckets=2).materialize()
    # snapshot an epoch file, compact, then restore it — simulating a
    # crash after the base rename but before the deletes
    bdir = sorted(glob.glob(f"{state}/bucket=*"))[0]
    victim = sorted(glob.glob(f"{bdir}/epoch=*.parquet"))[0]
    saved = str(tmp_path / "saved.parquet")
    shutil.copy(victim, saved)
    compact_dedup_index(state)
    shutil.copy(saved, victim)  # the crash left this behind
    assert len(glob.glob(f"{bdir}/epoch=*.parquet")) == 2

    # consumers are unaffected by the duplicate rows (set membership):
    # an epoch-3 rerun of epoch-1 copies drops them all
    e3 = pa.table(
        {
            "doc_id": pa.array(np.arange(100, 106, dtype=np.int64), pa.int64()),
            "text": texts[:6],
        }
    )
    out = incremental_exact_dedup(
        ray.data.from_arrow(e3), state, epoch=3, num_buckets=2
    ).to_pandas()
    assert len(out) == 0
    # re-running compaction converges back to one file per bucket
    compact_dedup_index(state, exclude_epochs=(3,))
    for b in glob.glob(f"{state}/bucket=*"):
        files = [
            f for f in glob.glob(f"{b}/epoch=*.parquet")
            if not f.endswith("epoch=3.parquet")
        ]
        assert len(files) == 1


def test_pq_recall_and_fidelity(ray_session):
    """Product quantization: ADC top-10 must recover most of the exact
    brute-force top-10 (recall ≥ 0.6 at 256 codewords / 8 subspaces on
    500 vecs ≈ 2 vecs per codeword), the ADC self-similarity of the
    query's own row must be ≈1 within quantization error, and encoding
    must be deterministic given fixed codebooks."""
    import ray.data

    from cartography_ray.functions.ann import (
        knn_brute,
        knn_pq,
        pq_encode,
        train_pq_codebooks,
    )
    from cartography_ray.runtime import to_pandas_typed

    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    books = train_pq_codebooks(ds, m=8, k=256, iters=3)
    assert books.shape[0] == 8 and books.shape[2] == 8  # dim 64 / m 8
    codes = pq_encode(ds, books).materialize()

    import pyarrow.parquet as pq_
    t = pq_.read_table(src)
    qvec = np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)

    got = knn_pq(codes, books, qvec, k=10).to_pandas()
    assert list(got["rank"]) == list(range(1, 11))
    # self row: ADC sim of the query's own code ≈ 1 (quantization only)
    self_sim = float(got.loc[got["vec_id"] == 0, "sim6"].iloc[0]) \
        if (got["vec_id"] == 0).any() else 0.0
    assert self_sim > 0.9

    exact = to_pandas_typed(knn_brute(ds, {0: qvec}, k=10))
    exact_ids = set(exact["neighbor_id"]) | {0}
    overlap = len(set(got["vec_id"]) & exact_ids)
    assert overlap >= 6, f"PQ recall too low: {overlap}/10"

    # deterministic encoding under fixed codebooks
    c1 = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    c2 = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert all(
        np.array_equal(a, b) for a, b in zip(c1["code"], c2["code"])
    )


def test_compact_dedup_index_preserves_semantics(ray_session, tmp_path):
    """Compacting per-epoch index files into one base file changes
    nothing the readers can observe: epoch-3 survivors equal an
    uncompacted twin's, for BOTH incremental layouts; file counts drop
    to one per touched bucket."""
    import glob

    import ray.data

    from cartography_ray.functions.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
        incremental_minhash_dedup,
    )

    # texts must be mutually DISSIMILAR (shared templates near-dup-match
    # under minhash and the whole epoch gets dropped): random-ish token
    # salad per doc, deterministic
    rng = np.random.default_rng(5)
    vocab = [f"w{k}" for k in range(400)]
    texts = [
        " ".join(rng.choice(vocab, size=30, replace=False)) for _ in range(30)
    ]

    def tbl(ids, txts):
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64), pa.int64()),
                "text": txts,
            }
        )

    for op, state_name in (
        (incremental_exact_dedup, "ex"),
        (incremental_minhash_dedup, "mh"),
    ):
        twin = {}
        for variant in ("plain", "compacted"):
            state = str(tmp_path / f"{state_name}_{variant}")
            op(ray.data.from_arrow(tbl(range(10), texts[:10])), state, epoch=1,
               num_buckets=4).materialize()
            op(ray.data.from_arrow(tbl(range(10, 20), texts[10:20])), state, epoch=2,
               num_buckets=4).materialize()
            if variant == "compacted":
                stats = compact_dedup_index(state)
                assert stats["files_merged"] > 0
                for bdir in glob.glob(f"{state}/bucket=*"):
                    assert len(glob.glob(f"{bdir}/epoch=*.parquet")) == 1
            # epoch 3: 5 copies of epoch-1 docs + 5 novel
            e3 = tbl(
                list(range(100, 105)) + list(range(200, 205)),
                texts[:5] + texts[25:30],
            )
            out = op(ray.data.from_arrow(e3), state, epoch=3, num_buckets=4).to_pandas()
            twin[variant] = sorted(out["doc_id"])
            if variant == "compacted":
                # rerun-idempotency survives compaction of the rerun
                # epoch itself: merge epoch 3 into the base, rerun
                # epoch 3 — the base's epoch-tagged rows are excluded,
                # so survivors are unchanged (not dropped against
                # themselves)
                compact_dedup_index(state)
                rerun = op(
                    ray.data.from_arrow(e3), state, epoch=3, num_buckets=4
                ).to_pandas()
                assert sorted(rerun["doc_id"]) == twin[variant]
        assert twin["plain"] == twin["compacted"] == list(range(200, 205))


def test_minhash_fold_too_hot_falls_back(ray_session):
    """A dup-heavy corpus under the row/byte guards but over the in-task
    pair-workload guard (Σ per-bucket n² > 4e6) must fall back to the
    distributed plan and still produce the full correct pair set."""
    import ray.data

    from cartography_ray.functions.dedup import minhash_lsh_pairs

    n = 800  # identical docs: 8 bands × 800² = 5.1e6 > 4e6 trips the guard
    text = "the quick brown fox jumps over the lazy dog again and again"
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "text": [text] * n,
        }
    )
    out = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.9, num_perm=16, bands=8,
        payload="text",
    ).to_pandas()
    assert len(out) == n * (n - 1) // 2
    assert (out["jaccard"] == 1.0).all()


def test_table_profile_counts_and_nulls(ray_session):
    """n = rows, n_null counted per column, n_distinct excludes nulls
    (SQL COUNT(DISTINCT) semantics) — across int, string and float."""
    import ray.data

    from cartography_ray.ops.agg import table_profile

    tbl = pa.table(
        {
            "i": pa.array([1, 1, 2, None, None], pa.int64()),
            "s": pa.array(["x", "y", "y", "y", None], pa.string()),
            "f": pa.array([1.5, 1.5, None, 2.5, 3.5], pa.float64()),
        }
    )
    out = (
        table_profile(ray.data.from_arrow(tbl).repartition(3), ["i", "s", "f"])
        .to_pandas()
        .set_index("col_name")
    )
    assert out.loc["i"].tolist() == [5, 2, 2]
    assert out.loc["s"].tolist() == [5, 1, 2]
    assert out.loc["f"].tolist() == [5, 1, 3]

    # signed zero: -0.0 and 0.0 are ONE distinct value (SQL semantics)
    z = pa.table({"f": pa.array([0.0, -0.0, 1.0], pa.float64())})
    zp = table_profile(ray.data.from_arrow(z), ["f"]).to_pandas()
    assert zp["n_distinct"].tolist() == [2]

    # fully-empty input: zero-count rows, no finalize crash
    ep = table_profile(
        ray.data.from_arrow(tbl).filter(lambda r: False), ["i", "s"]
    ).to_pandas()
    assert ep["n"].tolist() == [0, 0] and ep["n_distinct"].tolist() == [0, 0]


def test_empty_measured_inputs_short_circuit(ray_session):
    """A PROVEN-empty measured input must return a typed empty result —
    not fall through to the legacy streaming groupby, which re-executes
    the just-materialized map stage and hits Ray 2.49's fully-empty
    hash-aggregate finalize crash (CLAUDE.md sharp edge)."""
    import ray.data

    from cartography_ray.functions.dedup import exact_dedup
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import to_pandas_typed

    # exact_dedup: materialized-but-empty corpus (everything filtered)
    docs = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"]}
    )
    empty_docs = (
        ray.data.from_arrow(docs)
        .filter(lambda r: False)
        .materialize()
    )
    out = to_pandas_typed(exact_dedup(empty_docs))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "fingerprint"]

    # partial_groupby_agg(elide_small=True) with no empty_schema: the
    # output schema is derived by folding a typed empty frame through
    # partial→final using the input schema.
    empty_in = ray.data.from_arrow(
        pa.schema([("g", pa.string()), ("v", pa.int64())]).empty_table()
    )
    out_ds = partial_groupby_agg(
        empty_in, "g", {"s": ("v", "sum"), "n": (None, "count")},
        elide_small=True,
    )
    agg = to_pandas_typed(out_ds)
    assert len(agg) == 0
    assert set(agg.columns) == {"g", "s", "n"}
    # dtypes must survive the degenerate path (string key, not null)
    sch = {f.name: f.type for b in [out_ds.schema()] for f in
           (pa.schema(list(zip(b.names, b.types))) if b else pa.schema([]))}
    assert str(sch["g"]) == "string" and str(sch["s"]) == "int64"


def test_knn_lsh_indexed_partition_pruning(ray_session, tmp_path):
    """Partition-bucketed ANN (write-once LSH index): identical results to
    the scan-all knn_lsh, while READING fewer rows than the corpus."""
    import ray.data

    from cartography_ray.functions.ann import build_lsh_index, knn_lsh, knn_lsh_indexed

    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    total = t.num_rows
    queries = {
        v: np.asarray(e, dtype=np.float64)
        for v, e in zip(t.column("vec_id").to_pylist()[:3], t.column("embedding").to_pylist()[:3])
    }
    idx = build_lsh_index(ds, str(tmp_path / "lsh_idx"), planes=4)
    out, stats = knn_lsh_indexed(idx, queries, k=5, probe_hamming=1)
    indexed = out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    full = (
        knn_lsh(
            ray.data.read_parquet(src, columns=["vec_id", "embedding"]),
            queries, k=5, planes=4, probe_hamming=1,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert indexed.equals(full)                       # same candidates/ranks
    assert 0 < stats["rows_scanned"] < total          # pruning is real
    assert stats["partitions_read"] < stats["partitions_total"]


def test_cosine_neardup_exact_vs_bruteforce(ray_session):
    """Triangle block-pair join must equal the O(n²) numpy baseline —
    every pair above threshold, exact sims, no dupes across block pairs."""
    import ray.data

    from cartography_ray.functions.ann import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    n, d = 200, 16
    base = rng.standard_normal((n // 2, d))
    # half the corpus = jittered copies → guaranteed near-dups
    mat = np.vstack([base, base + rng.standard_normal((n // 2, d)) * 0.05])
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype("float64").ravel()), d
            ),
        }
    )
    tau = 0.9
    got = (
        cosine_neardup_pairs(
            ray.data.from_arrow(tbl).repartition(5), tau, num_blocks=4
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 6)
    ia, ib = np.nonzero(np.triu(sims >= tau, k=1))
    assert len(got) == len(ia) > 0
    assert (got["id_a"].to_numpy() == ia).all()
    assert (got["id_b"].to_numpy() == ib).all()
    assert np.allclose(got["sim6"].to_numpy(), sims[ia, ib])


def test_knn_ivf_indexed_recall_and_pruning(ray_session, tmp_path):
    """IVF (k-means-partitioned) ANN: reads fewer rows than the corpus
    and recovers most of the exact brute-force neighbor set."""
    import ray.data

    from cartography_ray.functions.ann import build_ivf_index, knn_brute, knn_ivf_indexed

    src = "/root/testdata/sf0.001/embeddings.parquet"
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    total = t.num_rows
    queries = {
        v: np.asarray(e, dtype=np.float64)
        for v, e in zip(
            t.column("vec_id").to_pylist()[:5], t.column("embedding").to_pylist()[:5]
        )
    }
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    idx = build_ivf_index(ds, str(tmp_path / "ivf_idx"), n_centroids=8, iters=3)
    out, stats = knn_ivf_indexed(idx, queries, k=5, nprobe=3)
    approx = out.to_pandas()
    assert 0 < stats["rows_scanned"] < total
    assert stats["partitions_read"] < stats["partitions_total"]
    exact = knn_brute(
        ray.data.read_parquet(src, columns=["vec_id", "embedding"]), queries, k=5
    ).to_pandas()
    exact_set = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_set = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # sims reported by the IVF path are exact cosines (knn_brute kernel):
    # any (query, neighbor) it shares with brute force has the same sim6
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (merged["sim6_a"] == merged["sim6_e"]).all()


def test_ivf_index_empty_corpus(ray_session, tmp_path):
    import pyarrow as pa_
    import ray.data

    from cartography_ray.functions.ann import build_ivf_index, knn_ivf_indexed

    empty = pa_.table(
        {
            "vec_id": pa_.array([], pa_.int64()),
            "embedding": pa_.array([], pa_.list_(pa_.float64())),
        }
    )
    idx = build_ivf_index(ray.data.from_arrow(empty), str(tmp_path / "ivf_empty"))
    out, stats = knn_ivf_indexed(idx, {1: np.ones(4)}, k=3)
    assert out.count() == 0 and stats["partitions_total"] == 0


def test_ppm_decode_roundtrip_and_features(ray_session):
    """REAL netpbm decode: encode→decode roundtrip is exact, and the
    actor-pool decode stage reports true pixel stats and dimensions."""
    import ray.data

    from cartography_ray.functions.multimodal import (
        PPM_MIME,
        decode_pipeline,
        decode_ppm,
        encode_ppm,
        resize_nearest,
        synth_media_table,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header with comment + multi-whitespace still parses
    weird = b"P6 # comment\n # another\n 23\t17\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(weird), img)

    media = ray.data.from_arrow(synth_media_table(16, real=True))
    feats = (
        decode_pipeline(media, concurrency=2, batch_size=4, fake=False)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    src = synth_media_table(16, real=True)
    for i in range(16):
        img = decode_ppm(src.column("payload")[i].as_py())
        assert feats.loc[i, "pixel_mean"] == img.mean()
        assert feats.loc[i, "decoded_h"] == img.shape[0]
        assert feats.loc[i, "decoded_w"] == img.shape[1]

    # real nearest-neighbor resize: exact on a 2x downscale of a gradient
    grad = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    small = resize_nearest(grad, 8, 8)
    assert small.shape == (8, 8, 3)
    assert np.array_equal(small, grad[::2, ::2])


def test_image_resizer_stage(ray_session):
    import ray.data

    from cartography_ray.functions.multimodal import (
        ImageResizer,
        decode_ppm,
        synth_media_table,
    )

    media = ray.data.from_arrow(synth_media_table(8, real=True))
    out = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    assert len(out) == 8
    for p in out["payload"]:
        assert decode_ppm(p).shape == (8, 8, 3)


def test_gif_codec_roundtrip_byte_exact():
    """The REAL compressed codec (GIF87a/LZW): encode→decode is
    byte-exact on the index plane across palette sizes, including the
    4096-entry LZW table overflow (mid-stream CLEAR) and the KwKwK
    self-referencing code path."""
    from cartography_ray.functions.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(21)
    for ncol in (2, 5, 16, 97, 256):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        got_idx, got_pal = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(got_idx, idx), ncol
        assert np.array_equal(got_pal[:ncol], pal), ncol
    # 96×96 at 256 colors exceeds 4096 LZW entries → exercises the
    # table-full CLEAR reset on both sides
    idx = rng.integers(0, 256, (96, 96), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal))[0], idx)
    # KwKwK: aaa... emits the just-added code immediately
    idx = np.zeros((1, 64), np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal[:2]))[0], idx)


def test_gif_decode_foreign_and_interlaced():
    """The decoder handles GIFs our encoder never produces: a real-world
    89a file (extension blocks) and an interlaced image."""
    import base64
    import struct

    from cartography_ray.functions.multimodal import (
        _GIF_INTERLACE_PASSES,
        decode_gif,
        encode_gif,
    )

    # the canonical 1×1 transparent-pixel GIF89a (external encoder:
    # exercises the extension-block skip + a foreign LZW stream)
    one_px = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    idx, pal = decode_gif(one_px)
    assert idx.shape == (1, 1) and pal.shape[0] >= 2

    # interlace: store rows in pass order + set the interlace bit; the
    # decoder must un-interlace back to the original
    rng = np.random.default_rng(3)
    h, w, ncol = 13, 9, 8
    pal8 = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx0 = rng.integers(0, ncol, (h, w), dtype=np.uint8)
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in _GIF_INTERLACE_PASSES]
    )
    enc = bytearray(encode_gif(idx0[order], pal8))
    pal_bits = max(1, int(ncol - 1).bit_length())
    ipacked_at = 13 + 3 * (1 << pal_bits) + 9  # image-descriptor packed byte
    assert enc[ipacked_at - 9] == 0x2C and enc[ipacked_at] == 0
    (sw, sh) = struct.unpack("<HH", bytes(enc[ipacked_at - 4 : ipacked_at]))
    assert (sw, sh) == (w, h)
    enc[ipacked_at] = 0x40
    got, _ = decode_gif(bytes(enc))
    assert np.array_equal(got, idx0)


def test_gif_actor_stages(ray_session):
    """GIF payloads flow through the SAME actor-pool stages as netpbm
    with fake=False — the compressed-codec row of the multimodal family
    is real end-to-end (decode features + decompress→resize→recompress)."""
    import ray.data

    from cartography_ray.functions.multimodal import (
        ImageResizer,
        decode_gif,
        decode_pipeline,
        gif_to_rgb,
        synth_gif_table,
    )

    src = synth_gif_table(12)
    media = ray.data.from_arrow(src)
    feats = (
        decode_pipeline(media, concurrency=2, batch_size=4, fake=False)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(12):
        rgb = gif_to_rgb(src.column("payload")[i].as_py())
        assert feats.loc[i, "pixel_mean"] == rgb.mean()
        assert feats.loc[i, "decoded_h"] == rgb.shape[0]
        assert feats.loc[i, "decoded_w"] == rgb.shape[1]

    out = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(12):
        idx, pal = decode_gif(out.loc[i, "payload"])
        assert idx.shape == (8, 8)
        src_idx, src_pal = decode_gif(src.column("payload")[i].as_py())
        assert np.array_equal(pal[: src_pal.shape[0]], src_pal)
        # nearest-neighbor on the index plane matches the numpy reference
        from cartography_ray.functions.multimodal import resize_nearest

        assert np.array_equal(idx, resize_nearest(src_idx, 8, 8))


def test_png_codec_roundtrip_byte_exact():
    """The REAL PNG codec (DEFLATE + scanline filters): encode→decode is
    byte-exact on pixels for gray/RGB/RGBA across ALL five filter types
    (each forced) plus the per-row heuristic."""
    from cartography_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(17)
    for ch in (0, 3, 4):
        for ft in (0, 1, 2, 3, 4, "heuristic"):
            h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
            shape = (h, w) if ch == 0 else (h, w, ch)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            got = decode_png(encode_png(img, filter_type=ft))
            assert np.array_equal(got, img), (ch, ft)
    # wide row: the Sub-filter cumsum lane must not overflow
    img = rng.integers(0, 256, (3, 2000, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=1)), img)


def test_png_decode_foreign_palette_and_crc():
    """Decoder paths our encoder never produces: a real-world external
    PNG, an indexed-color (PLTE) image, and CRC verification."""
    import base64
    import struct
    import zlib

    from cartography_ray.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        png_to_rgb,
    )

    # canonical 1×1 transparent PNG from an external encoder
    one_px = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    img = decode_png(one_px)
    assert img.shape[0] == 1 and img.shape[1] == 1
    assert png_to_rgb(one_px).shape == (1, 1, 3)

    # hand-built indexed-color image: IHDR(color type 3) + PLTE + IDAT
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    body = b"".join(b"\x00" + row.tobytes() for row in idx)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), pal[idx])

    # corrupt one IDAT byte → CRC check must fire
    bad = bytearray(payload)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_actor_stages(ray_session):
    """PNG payloads flow through the SAME actor-pool stages as netpbm
    and GIF with fake=False — including a full inflate→unfilter→resize→
    refilter→deflate cycle in ImageResizer."""
    import ray.data

    from cartography_ray.functions.multimodal import (
        ImageResizer,
        decode_pipeline,
        decode_png,
        png_to_rgb,
        resize_nearest,
        synth_png_table,
    )

    src = synth_png_table(12)
    media = ray.data.from_arrow(src)
    feats = (
        decode_pipeline(media, concurrency=2, batch_size=4, fake=False)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(12):
        rgb = png_to_rgb(src.column("payload")[i].as_py())
        assert feats.loc[i, "pixel_mean"] == rgb.mean()
        assert feats.loc[i, "decoded_h"] == rgb.shape[0]
        assert feats.loc[i, "decoded_w"] == rgb.shape[1]

    out = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(12):
        resized = decode_png(out.loc[i, "payload"])
        assert resized.shape[0] == 8 and resized.shape[1] == 8
        orig = decode_png(src.column("payload")[i].as_py())
        assert np.array_equal(resized, resize_nearest(orig, 8, 8))


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_jpeg_codec_roundtrip_psnr():
    """The REAL baseline JPEG codec (DCT + Annex-K Huffman): encode→
    decode reconstructs smooth images above 35 dB PSNR at q90 for
    gray and RGB, including non-multiple-of-8 dimensions, and pure
    noise above 30 dB at q95 (lossy codec — PSNR-bounded, the
    analogue of the PNG/GIF byte-exact gates)."""
    from cartography_ray.functions.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(23)
    for h, w in ((37, 53), (8, 8), (9, 17), (64, 48)):
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.clip(96 + 64 * np.sin(yy / 9.0) + 48 * np.cos(xx / 7.0), 0, 255)
        gray = base.astype(np.uint8)
        got = decode_jpeg(encode_jpeg(gray, 90))
        assert got.shape == (h, w) and _psnr(gray, got) > 35, (h, w)
        rgb = np.stack([gray, np.roll(gray, 3, 0), np.roll(gray, 5, 1)], axis=2)
        got3 = decode_jpeg(encode_jpeg(rgb, 90))
        assert got3.shape == (h, w, 3) and _psnr(rgb, got3) > 35, (h, w)
    noisy = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    assert _psnr(noisy, decode_jpeg(encode_jpeg(noisy, 95))) > 30
    # flat image: every AC coefficient is zero → DC-only stream
    flat = np.full((16, 16), 128, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)
    # determinism: same input → same bytes
    assert encode_jpeg(rgb, 85) == encode_jpeg(rgb, 85)


def test_jpeg_decode_foreign_420_and_16bit_dqt():
    """Decoder paths our encoder never produces: a real-world external
    4:2:0 JPEG (libjpeg output, chroma subsampled 2×2) and a 16-bit-
    precision DQT segment."""
    import base64

    from cartography_ray.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_to_rgb,
    )

    # 16×16 4:2:0 JPEG from an external encoder (CPython test corpus)
    foreign = base64.b64decode(
        "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUG"
        "CQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgE"
        "BAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ"
        "EBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QA"
        "JBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAA"
        "AAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEA"
        "AhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZds"
        "kzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0"
        "rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo"
        "5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmIT"
        "jbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwetf//Z"
    )
    # SOF sampling factors really are 4:2:0 (decoder exercises upsampling)
    pos, samp = 2, None
    while pos < len(foreign) - 1:
        marker = foreign[pos + 1]
        ln = int.from_bytes(foreign[pos + 2 : pos + 4], "big")
        if marker in (0xC0, 0xC1):
            samp = (foreign[pos + 11] >> 4, foreign[pos + 11] & 15)
            break
        pos += 2 + ln
    assert samp == (2, 2)
    img = decode_jpeg(foreign)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert decode_jpeg(foreign).tobytes() == img.tobytes()  # deterministic
    assert jpeg_to_rgb(foreign).shape == (16, 16, 3)

    # rewrite our own encoder's 8-bit DQT segments as 16-bit precision
    # (pq=1) — pixel output must be identical
    gray = (np.arange(24 * 24, dtype=np.int64) % 251).astype(np.uint8).reshape(24, 24)
    enc = encode_jpeg(gray, 80)
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos] == 0xFF and enc[pos + 1] == 0xDB:
            ln = int.from_bytes(enc[pos + 2 : pos + 4], "big")
            body = enc[pos + 4 : pos + 2 + ln]
            tbl = np.frombuffer(body[1:65], dtype=np.uint8).astype(">u2")
            new_body = bytes([0x10 | (body[0] & 0x0F)]) + tbl.tobytes()
            out += b"\xff\xdb" + (len(new_body) + 2).to_bytes(2, "big") + new_body
            pos += 2 + ln
        else:
            out.append(enc[pos])
            pos += 1
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(enc))


def test_jpeg_actor_stages(ray_session):
    """JPEG payloads flow through the SAME actor-pool stages as the
    other codecs with fake=False — including a full Huffman+IDCT →
    resize → DCT+Huffman recompress cycle in ImageResizer."""
    import ray.data

    from cartography_ray.functions.multimodal import (
        ImageResizer,
        decode_jpeg,
        decode_pipeline,
        jpeg_to_rgb,
        resize_nearest,
        synth_jpeg_table,
    )

    src = synth_jpeg_table(10)
    media = ray.data.from_arrow(src)
    feats = (
        decode_pipeline(media, concurrency=2, batch_size=4, fake=False)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(10):
        rgb = jpeg_to_rgb(src.column("payload")[i].as_py())
        assert feats.loc[i, "pixel_mean"] == rgb.mean()
        assert feats.loc[i, "decoded_h"] == rgb.shape[0]
        assert feats.loc[i, "decoded_w"] == rgb.shape[1]

    out = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_h": 16, "out_w": 16},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(10):
        resized = decode_jpeg(out.loc[i, "payload"])
        assert resized.shape[0] == 16 and resized.shape[1] == 16
        want = resize_nearest(decode_jpeg(src.column("payload")[i].as_py()), 16, 16)
        assert _psnr(want, resized) > 28  # lossy recompress, bounded loss


def test_wav_decode_features(ray_session):
    """REAL PCM WAV decode: a pure sine's RMS is amp/sqrt(2) and its
    zero-crossing rate tracks 2f/sr."""
    import ray.data

    from cartography_ray.functions.multimodal import (
        audio_pipeline,
        decode_wav,
        encode_wav,
    )

    sr, f, amp, dur = 8000, 440.0, 0.5, 0.5
    t = np.arange(int(sr * dur)) / sr
    sig = amp * np.sin(2 * np.pi * f * t)
    wav = encode_wav(sig, sr)
    samples, got_sr = decode_wav(wav)
    assert got_sr == sr and samples.shape == (len(t), 1)
    assert abs(samples[:, 0] - sig).max() < 1e-3  # 16-bit quantization

    tbl = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([wav], pa.binary()),
            "mime": pa.array(["audio/wav"], pa.string()),
        }
    )
    feats = audio_pipeline(ray.data.from_arrow(tbl), concurrency=1, batch_size=1).to_pandas()
    assert abs(feats.loc[0, "duration_s"] - dur) < 1e-6
    assert abs(feats.loc[0, "rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(feats.loc[0, "zero_cross_rate"] - 2 * f / sr) < 0.01


def test_synth_audio_corpus(ray_session):
    import ray.data

    from cartography_ray.functions.multimodal import audio_pipeline, synth_audio_table

    feats = audio_pipeline(
        ray.data.from_arrow(synth_audio_table(24)), concurrency=2, batch_size=8
    ).to_pandas()
    assert len(feats) == 24
    assert (feats["duration_s"] > 0).all() and (feats["rms"] > 0).all()
    # deterministic corpus → deterministic features
    feats2 = audio_pipeline(
        ray.data.from_arrow(synth_audio_table(24)), concurrency=2, batch_size=8
    ).to_pandas()
    assert feats.sort_values("media_id")["rms"].tolist() == feats2.sort_values("media_id")["rms"].tolist()


def test_jaccard_pairs_exact_vs_reference(ray_session):
    """Inverted-index set-similarity join equals the direct O(n²) true-
    substring-shingle reference, including the df cap semantics."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import jaccard_pairs_exact

    base = [
        "the quick brown fox jumps over the lazy dog in the yard today",
        "a completely different document about distributed data processing",
        "numpy arrays make vectorized computation fast and predictable",
    ]
    texts = []
    for b in base:
        texts.append(b)
        texts.append(b + " extra tail words appended")   # near-dup of b
        texts.append(" ".join(reversed(b.split())))       # same words, other order
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"), "text": texts})

    def ref_pairs(df, tau, k=5, max_df=None):
        sh = {
            r.doc_id: {r.text.lower()[i : i + k] for i in range(len(r.text) - k + 1)}
            for r in df.itertuples()
        }
        if max_df is not None:
            from collections import Counter

            dfreq = Counter(g for s in sh.values() for g in s)
            sh = {d: {g for g in s if dfreq[g] <= max_df} for d, s in sh.items()}
        out = []
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sh[a] & sh[b])
                union = max(1, len(sh[a]) + len(sh[b]) - inter)
                if inter / union >= tau:
                    out.append((a, b, round(inter / union, 9)))
        return sorted(out)

    for max_df in (None, 4):
        for prefix in (False, True):
            got = (
                jaccard_pairs_exact(
                    ray.data.from_pandas(df).repartition(3), threshold=0.3, max_df=max_df,
                    num_partitions=4, prefix_filter=prefix,
                )
                .to_pandas()
            )
            got_pairs = sorted(zip(got["id_a"], got["id_b"], got["jaccard"].round(9)))
            assert got_pairs == ref_pairs(df, 0.3, max_df=max_df), f"max_df={max_df} prefix={prefix}"
    # the uncapped run must find each (b, b+tail) near-dup pair
    assert any(a == 0 and b == 1 for a, b, _ in ref_pairs(df, 0.3))


def test_jaccard_auto_workload_guard(ray_session):
    """prefix_filter="auto" (the default): the in-task workload guard —
    benign corpora stay on the one-exchange plan, a corpus whose posting
    buckets measure too hot falls back to the prefix plan, and BOTH guard
    arms return the identical pair set (the _FoldTooHot sentinel pattern,
    here auto-routing to the AllPairs plan instead of a caller flag)."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import jaccard_pairs_exact

    rng = np.random.default_rng(11)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    texts = []
    for i in range(80):
        words = list(rng.choice(vocab, size=rng.integers(8, 14)))
        texts.append(" ".join(words) + " shared boilerplate tail common to every doc")
    for i in range(0, 16, 2):
        texts[i + 1] = texts[i] + " tiny tail"
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"), "text": texts})

    def run(**kw):
        got = jaccard_pairs_exact(
            ray.data.from_pandas(df).repartition(3), threshold=0.5,
            max_df=64, num_partitions=4, **kw,
        ).to_pandas()
        return sorted(zip(got["id_a"], got["id_b"], got["jaccard"].round(12)))

    benign = run()                      # auto, generous default limit
    hot = run(workload_limit=10)        # auto, forced onto the fallback arm
    forced_default = run(prefix_filter=False)
    forced_prefix = run(prefix_filter=True)
    assert benign == forced_default, "benign auto must match the default plan"
    assert hot == forced_prefix == benign, "guard fallback must be pair-identical"
    assert benign, "vacuous test (no pairs found)"


def test_jaccard_prefix_filter_identity_and_reduction(ray_session):
    """VERDICT r03 item 5: prefix filtering must (a) return the IDENTICAL
    pair set to the one-exchange path on a skewed corpus at several
    thresholds, and (b) actually shrink the candidate-generating posting
    volume (the point of the AllPairs prefix)."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import _make_shingle_explode, jaccard_pairs_exact

    rng = np.random.default_rng(5)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
    texts = []
    for i in range(120):
        words = list(rng.choice(vocab, size=rng.integers(8, 16)))
        texts.append(" ".join(words) + " shared boilerplate footer common to all docs")
    # seed exact-threshold near-dups
    for i in range(0, 20, 2):
        texts[i + 1] = texts[i] + " tiny tail"
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"), "text": texts})

    for tau in (0.5, 0.7):
        runs = {}
        for prefix in (False, True):
            got = jaccard_pairs_exact(
                ray.data.from_pandas(df).repartition(4), threshold=tau,
                max_df=64, num_partitions=4, prefix_filter=prefix,
            ).to_pandas()
            runs[prefix] = sorted(
                zip(got["id_a"], got["id_b"], got["jaccard"].round(12))
            )
        assert runs[True] == runs[False], f"tau={tau}"
        assert runs[True], f"tau={tau}: vacuous test (no pairs found)"

    # posting-volume reduction: prefix size ⌊(1−τ)n⌋+1 ≪ n at τ=0.8
    explode = _make_shingle_explode(5, "doc_id", "text")
    full = explode(__import__("pyarrow").Table.from_pandas(df)).num_rows
    sizes = (
        explode(__import__("pyarrow").Table.from_pandas(df))
        .to_pandas().groupby("id").size()
    )
    prefix_rows = int((np.floor(0.2 * sizes) + 1).sum())
    assert prefix_rows < 0.3 * full


def test_token_frequency_and_chunking(ray_session):
    """Vocabulary top-n (tie-break: count desc, token asc) and fixed-
    window chunking (ragged tail, empty docs drop, single-space joins)."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import chunk_documents, token_frequency

    df = pd.DataFrame(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "Apple banana apple CHERRY",
                "banana cherry\tdate  date",
                "   ",                       # whitespace-only → no chunks
                "apple! banana? (cherry)",   # punctuation splits vocab tokens
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)

    top = token_frequency(ds, top_n=3).to_pandas()
    # counts: apple 3, banana 3, cherry 3, date 2 → top-3 excludes date;
    # ties order token asc
    assert list(top["token"]) == ["apple", "banana", "cherry"]
    assert list(top["n"]) == [3, 3, 3]
    top2 = token_frequency(ds, top_n=100).to_pandas()
    assert dict(zip(top2["token"], top2["n"]))["date"] == 2

    chunks = chunk_documents(ds, max_tokens=3).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]
    ).reset_index(drop=True)
    assert list(chunks["doc_id"]) == [0, 0, 1, 1, 3]
    assert list(chunks["chunk_idx"]) == [0, 1, 0, 1, 0]
    assert list(chunks["n_tokens"]) == [3, 1, 3, 1, 3]
    # mixed whitespace collapses to single spaces; text preserved raw
    assert chunks.loc[2, "chunk_text"] == "banana cherry date"
    assert chunks.loc[3, "chunk_text"] == "date"
    assert chunks.loc[4, "chunk_text"] == "apple! banana? (cherry)"


def test_revenue_by_nation_join_strategy_matches_broadcast(ray_session):
    """The customer side of revenue_by_nation auto-switches on footer row
    count (broadcast below the limit, hash_join above); both plans must
    produce identical results."""
    from cartography_ray.pipelines.queries import q_revenue_by_nation

    sf = "/root/testdata/sf0.001"
    a = (
        q_revenue_by_nation(sf)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    b = (
        q_revenue_by_nation(sf, cust_broadcast_limit=0)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) > 0


def test_returned_item_revenue_join_strategy_matches_broadcast(ray_session):
    """Q10's customer attach auto-switches broadcast↔hash_join on footer
    row count; both plans must produce identical top-20 rows (and the
    bloom-prefiltered lineitem⋈orders join must not drop matches)."""
    import pandas as pd

    from cartography_ray.pipelines.queries import q_returned_item_revenue

    sf = "/root/testdata/sf0.001"
    a = q_returned_item_revenue(sf).to_pandas().reset_index(drop=True)
    b = (
        q_returned_item_revenue(sf, cust_broadcast_limit=0)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert 0 < len(a) <= 20
    # top-k ordering invariant: revenue desc, custkey asc on ties
    rc = a["revenue_cents"].to_numpy()
    assert (rc[:-1] >= rc[1:]).all()


def test_urgent_lines_by_status_join_strategy_matches_broadcast(ray_session):
    """Q12's order side auto-switches between the searchsorted broadcast
    (zero shuffles) and the bloom-prefiltered hash join; both arms must
    produce the identical 2-row census."""
    import pandas as pd

    from cartography_ray.pipelines.queries import q_urgent_lines_by_status

    sf = "/root/testdata/sf0.001"
    a = q_urgent_lines_by_status(sf).to_pandas().reset_index(drop=True)
    b = (
        q_urgent_lines_by_status(sf, ord_broadcast_limit=0)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) > 0 and (a["high_line_count"] + a["low_line_count"] > 0).all()


def test_priority_late_orders_pandas_reference(ray_session):
    """The Q4-shape EXISTS is computed as max(l_shipdate) per order (with
    a ship-floor pre-drop) — verify the reduction against a literal
    per-pair EXISTS evaluated in pandas."""
    import pandas as pd
    import pyarrow.parquet as pq

    from cartography_ray.pipelines.queries import (
        Q4_DATE_HI,
        Q4_DATE_LO,
        Q4_LATE_DAYS,
        q_priority_late_orders,
    )

    sf = "/root/testdata/sf0.001"
    got = q_priority_late_orders(sf).to_pandas()

    orders = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).to_pandas()
    li = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    w = orders[
        (orders.o_orderdate >= pd.Timestamp(Q4_DATE_LO))
        & (orders.o_orderdate < pd.Timestamp(Q4_DATE_HI))
    ]
    pairs = w.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = pairs[
        pairs.l_shipdate > pairs.o_orderdate + pd.Timedelta(days=Q4_LATE_DAYS)
    ]
    want = (
        late.drop_duplicates("o_orderkey")
        .groupby("o_orderpriority")
        .size()
        .rename("order_count")
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype({"order_count": "int64"})
    )
    assert len(got) > 0


def test_promo_revenue_share_join_strategy_matches_broadcast(ray_session):
    """Q14's part side auto-switches searchsorted-broadcast ↔ hash join;
    both arms must produce the identical single-row numerator and
    denominator, and promo ≤ total always."""
    import pandas as pd

    from cartography_ray.pipelines.queries import q_promo_revenue_share

    sf = "/root/testdata/sf0.001"
    a = q_promo_revenue_share(sf).to_pandas().reset_index(drop=True)
    b = (
        q_promo_revenue_share(sf, part_broadcast_limit=0)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) == 1
    assert 0 <= a.promo_revenue_cents[0] <= a.total_revenue_cents[0]


def test_discounted_revenue_pandas_reference(ray_session):
    """The Q6-shape zero-shuffle scan aggregate (read-level row-group
    filter + per-batch residual + driver fold of int64 partials) must
    equal a literal pandas evaluation of the same predicate."""
    import pandas as pd
    import pyarrow.parquet as pq

    from cartography_ray.pipelines.queries import (
        Q6_DATE_HI,
        Q6_DATE_LO,
        Q6_DISC_HI,
        Q6_DISC_LO,
        Q6_QTY_MAX,
        q_discounted_revenue,
    )

    sf = "/root/testdata/sf0.001"
    got = q_discounted_revenue(sf).to_pandas()

    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    w = li[
        (li.l_shipdate >= pd.Timestamp(Q6_DATE_LO))
        & (li.l_shipdate < pd.Timestamp(Q6_DATE_HI))
        & (li.l_discount >= Q6_DISC_LO)
        & (li.l_discount <= Q6_DISC_HI)
        & (li.l_quantity < Q6_QTY_MAX)
    ]
    import numpy as np

    prod = (w.l_extendedprice * w.l_discount).to_numpy() * 100.0
    # half-away-from-zero, the repo rounding convention (_cents)
    want = int(np.sign(prod) @ np.floor(np.abs(prod) + 0.5))
    assert got.revenue_cents[0] == want
    assert want > 0


def test_token_frequency_empty_corpus_guard(ray_session):
    """A whitespace-only corpus (realistic after an upstream quality
    filter empties a shard) must return a typed empty result, not crash
    Ray's all-empty hash-shuffle finalize."""
    import ray.data

    from cartography_ray.functions.text import token_frequency
    from cartography_ray.runtime import to_pandas_typed

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["   ", "\t\n"]})
    )
    out = token_frequency(docs, top_n=5)
    pdf = to_pandas_typed(out)
    assert len(pdf) == 0 and list(pdf.columns) == ["token", "n"]


def test_incremental_exact_dedup_epochs(ray_session, tmp_path):
    """Cross-run dedup against the persisted fingerprint index: epoch 2
    drops docs whose content epoch 1 already saw; re-running an epoch is
    idempotent (same survivors, same index state)."""
    import glob

    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import incremental_exact_dedup

    state = str(tmp_path / "fp_index")

    def run(rows, epoch):
        ids, texts = zip(*rows)
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": list(texts)})
        )
        out = incremental_exact_dedup(ds, state, epoch=epoch, num_buckets=4)
        pdf = out.to_pandas()  # all-empty loses schema (known Ray quirk)
        return sorted(pdf["doc_id"]) if "doc_id" in pdf.columns else []

    e1 = [(1, "alpha text"), (2, "beta text"), (3, "Alpha  TEXT")]  # 3 dups 1
    assert run(e1, 1) == [1, 2]

    # epoch 2: one true novelty, one cross-epoch dup, one within-batch dup
    e2 = [(10, "gamma text"), (11, "beta   text"), (12, "GAMMA text")]
    assert run(e2, 2) == [10]

    # idempotent rerun of epoch 2 (crash-recovery semantics)
    assert run(e2, 2) == [10]
    # index state: one file per touched (bucket, epoch); fingerprints of
    # the rerun replace, not duplicate
    files = glob.glob(f"{state}/bucket=*/epoch=*.parquet")
    import pyarrow.parquet as pq

    all_fps = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )["fingerprint"]
    assert all_fps.is_unique
    assert len(all_fps) == 3  # alpha, beta, gamma

    # epoch 3 sees everything as known
    assert run([(20, "alpha text"), (21, "gamma  TEXT")], 3) == []


def test_tfidf_topk_strategies_and_semantics(ray_session):
    """TF-IDF: rare terms outrank ubiquitous ones (idf(ln 1)=0); the
    broadcast and hash-join idf paths produce identical output."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import tfidf_topk

    docs = pd.DataFrame(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "common common rare1",
                "common rare2 rare2",
                "common other",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)

    def run(**kw):
        out = tfidf_topk(ds, n_docs=3, k=2, **kw).to_pandas()
        return out.sort_values(["doc_id", "rn"]).reset_index(drop=True)

    a = run()
    b = run(vocab_broadcast_limit=0)  # force the hash_join idf path
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    # 'common' is in every doc → idf 0 → score 0; rare terms rank first
    top1 = a[a["rn"] == 1].set_index("doc_id")["token"]
    assert top1[1] == "rare1" and top1[2] == "rare2" and top1[3] == "other"
    assert (a[a["token"] == "common"]["score"] == 0).all()
    # tf weighting: doc 2's rare2 (tf=2) outscores doc 1's rare1 (tf=1)
    s = a.set_index(["doc_id", "token"])["score"]
    assert s[(2, "rare2")] == 2 * s[(1, "rare1")]


def test_semantic_dedup_transitive_clusters(ray_session):
    """Semantic dedup keeps ONE doc per transitive near-dup cluster:
    a~b and b~c (but a≁c directly) must still collapse to min(a,b,c)."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.ann import cosine_neardup_pairs
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.stages.canonicalize import connected_components

    # unit vectors on a fan: 0 and 1 close, 1 and 2 close, 0 and 2 less
    # so (with tau between) the chain is transitive-only; 3 is far away
    import numpy as np

    def unit(theta):
        return [float(np.cos(theta)), float(np.sin(theta))]

    emb = pd.DataFrame(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": [unit(0.0), unit(0.5), unit(1.0), unit(3.0)],
        }
    )
    ds = ray.data.from_pandas(emb)
    tau = 0.9  # cos(0.5)≈0.878 < 0.9? no — use 0.85: cos(0.5)=0.878>0.85, cos(1.0)=0.540<0.85
    tau = 0.85
    pairs = cosine_neardup_pairs(ds, threshold=tau, num_blocks=2).to_pandas()
    got_pairs = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got_pairs == {(0, 1), (1, 2)}  # chain, no direct (0,2)

    edges = ray.data.from_pandas(
        pairs.assign(
            a=pairs["id_a"].map("{:012d}".format), b=pairs["id_b"].map("{:012d}".format)
        )[["a", "b"]]
    )
    labels = connected_components(edges).to_pandas()
    dropped = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": labels[labels["node"] != labels["label"]]["node"].astype("int64")}
        )
    )
    keep = (
        hash_join(
            ray.data.from_pandas(emb[["vec_id"]]), dropped,
            left_on="vec_id", how="anti",
        )
        .to_pandas()["vec_id"]
        .tolist()
    )
    assert sorted(keep) == [0, 3]  # one keeper for {0,1,2}, singleton 3


def test_repetition_stats_vs_bruteforce(ray_session):
    import re
    from collections import Counter

    import ray.data

    from cartography_ray.functions.text import repetition_stats

    texts = [
        "a a a b c",            # top token a×3, top bigram "a a"×2
        "x y x y x",            # bigrams: "x y"×2, "y x"×2
        "",                     # empty doc
        "solo",                 # 1 token → no bigram
        "T.T, t.t! q",          # punctuation splits; case folds
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (
        repetition_stats(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        uni = Counter(toks)
        bigs = Counter(zip(toks, toks[1:]))
        row = out.iloc[i]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(uni)
        assert row["top_tok_n"] == (max(uni.values()) if uni else 0)
        assert row["top_bigram_n"] == (max(bigs.values()) if bigs else 0)


def test_gopher_quality_rules():
    """Each Gopher rule fires on a crafted violator and passes on a
    clean doc (integer cross-multiplied semantics, no float ratios)."""
    from cartography_ray.functions.text import GopherQuality

    good = "the quick brown fox is happy and jumps over a lazy dog " * 3
    cases = {
        # 5 words < GOPHER_MIN_WORDS=20
        "r_wordcount": "the cat is in a",
        # 40 single-char words → mean word length 1 < 3 (has 2 stopwords)
        "r_meanlen": "a " * 38 + "is a",
        # >10% symbol hits among words
        "r_symbol": "# # # # # " + good,
        # every line starts with a bullet
        "r_bullet": "\n".join("- the item is here and fine" for _ in range(30)),
        # every line ends with an ellipsis
        "r_ellipsis": "\n".join("the story trails of to..." for _ in range(30)),
        # >20% pure-number words
        "r_alpha": "1 2 3 4 5 6 7 8 9 10 " + "the of " * 10,
        # only one distinct stopword present
        "r_stop": "the " + "word " * 30,
    }
    texts = [good] + list(cases.values())
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = GopherQuality()(tbl).to_pandas()
    assert out.loc[0, "gopher_pass"] == 1, out.iloc[0].to_dict()
    for i, rule in enumerate(cases, start=1):
        assert out.loc[i, rule] == 0, (rule, out.iloc[i].to_dict())
        assert out.loc[i, "gopher_pass"] == 0, rule


def test_token_entropy_vs_bruteforce(ray_session):
    """entropy_scaled equals the Counter brute-force of the same floor-
    scaled-ln construction; single-token spam → 0; uniform doc → the
    maximum over its token multiset."""
    import math
    import re
    from collections import Counter

    import ray.data

    from cartography_ray.functions.text import ENTROPY_SCALE, token_entropy

    texts = [
        "spam spam spam spam",          # one distinct token → entropy 0
        "a b c d e f",                  # uniform → maximal
        "the the the rare",             # skewed
        "",                             # empty
        "T.T! t,t? q",                  # splitting + case folding
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (
        token_entropy(ray.data.from_arrow(tbl))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def fln(x: int) -> int:
        return math.floor(ENTROPY_SCALE * math.log(x))

    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        cnt = Counter(toks)
        total = sum(cnt.values())
        want = sum(c * (fln(total) - fln(c)) for c in cnt.values()) if total else 0
        assert out.loc[i, "n_tokens"] == total
        assert out.loc[i, "entropy_scaled"] == want, (i, t)
    assert out.loc[0, "entropy_scaled"] == 0
    # uniform doc dominates the skewed one of equal length
    assert out.loc[1, "entropy_scaled"] > out.loc[2, "entropy_scaled"]


def test_prune_frequent_tokens(ray_session):
    import ray.data

    from cartography_ray.functions.text import prune_frequent_tokens

    # "common" is in 4/4 docs, "mid" in 2, the rest unique
    texts = [
        "common mid alpha common",
        "common mid beta",
        "common gamma",
        "common",  # nothing survives → row dropped
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (
        prune_frequent_tokens(ray.data.from_arrow(tbl), n_docs=4, df_limit=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # df_limit=3 prunes only "common" (df=4); "mid" (df=2) survives
    assert list(out["doc_id"]) == [0, 1, 2]
    assert list(out["clean_text"]) == ["mid alpha", "mid beta", "gamma"]
    assert list(out["n_kept"]) == [2, 2, 1]


def test_decontaminate_plans_agree(ray_session):
    import ray.data

    from cartography_ray.functions.dedup import decontaminate

    bench_txt = "the quick brown fox jumps over the lazy dog tonight"
    corpus_texts = [
        bench_txt,                                  # full copy → contaminated
        "prefix " + bench_txt[:30] + " suffix",     # shares a 24-gram
        "completely unrelated content here with no overlap at all",
        "short",                                    # < ngram chars → clean
    ]
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array([bench_txt], pa.string()),
    }))
    kw = dict(ngram=24, num_partitions=4)
    bcast = decontaminate(corpus, bench, **kw).to_pandas()
    joined = decontaminate(corpus, bench, broadcast_limit=0, **kw).to_pandas()
    assert sorted(bcast["doc_id"]) == [2, 3]
    assert sorted(joined["doc_id"]) == sorted(bcast["doc_id"])


def test_hash_join_bloom_prefilter_identity(ray_session):
    import pandas as pd
    import ray.data

    from cartography_ray.ops.joins import (
        bloom_probe_mask,
        build_key_bloom,
        hash_join,
    )

    rng = np.random.default_rng(21)
    # selective join: only ~5% of left keys exist on the right
    left = pa.table({
        "k": pa.array(rng.integers(0, 10_000, 5000), pa.int64()),
        "lv": pa.array(np.arange(5000), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.choice(500, 300, replace=False).astype("int64"), pa.int64()),
        "rv": pa.array(np.arange(300), pa.int64()),
    })
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    plain = hash_join(lds, rds, left_on="k", num_partitions=4).to_pandas()
    bloomed = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), left_on="k",
        num_partitions=4, bloom_prefilter_bits=1 << 14,
    ).to_pandas()
    key_sorted = lambda df: df.sort_values(["k", "lv"]).reset_index(drop=True)
    pd_plain, pd_bloom = key_sorted(plain), key_sorted(bloomed)
    assert len(pd_plain) == len(pd_bloom)
    assert (pd_plain[["k", "lv", "rv"]].to_numpy() == pd_bloom[["k", "lv", "rv"]].to_numpy()).all()

    # semi mode too
    s_plain = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        left_on="k", how="semi", num_partitions=4).to_pandas()
    s_bloom = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        left_on="k", how="semi", num_partitions=4,
                        bloom_prefilter_bits=1 << 14).to_pandas()
    assert sorted(s_plain["lv"]) == sorted(s_bloom["lv"])

    # the filter genuinely drops most non-matching rows (no match → bloom
    # negative except false positives, bounded by (1-e^{-2n/m})^2)
    bloom, m = build_key_bloom(ray.data.from_arrow(right), ["k"], 1 << 14)
    mask = bloom_probe_mask(left, ["k"], bloom, m)
    true_hits = pd.Series(left.column("k").to_numpy()).isin(right.column("k").to_numpy()).to_numpy()
    assert mask[true_hits].all()                      # no false negatives
    fp = mask[~true_hits].mean()
    assert fp < 0.05                                   # selective enough

    # anti/left must refuse the bloom (they keep unmatched left rows)
    with pytest.raises(ValueError):
        hash_join(lds, rds, left_on="k", how="anti", bloom_prefilter_bits=64)


def test_pack_sequences_offset_binning(ray_session):
    """Sequence packing: per-group exclusive-prefix // budget bins in id
    order, zero-token docs inherit the running prefix, and the chunk_us
    hot-key plan emits identical rows."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import pack_sequences

    df = pd.DataFrame(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "lang": ["en", "en", "en", "en", "de", "de", "en", "de"],
            "text": [
                "a b c d",        # en prefix 0  → bin 0
                "e f g",          # en prefix 4  → bin 0
                "",               # en prefix 7  → bin 1 (zero tokens)
                "h i",            # en prefix 7  → bin 1
                "x",              # de prefix 0  → bin 0
                "y z w v u",      # de prefix 1  → bin 0
                "j k l m n o",    # en prefix 9  → bin 1 (straddles 12)
                "t",              # de prefix 6  → bin 1
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        pack_sequences(ds, budget=6, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tokens"]) == [4, 3, 0, 2, 1, 5, 6, 1]
    assert list(out["bin"]) == [0, 0, 1, 1, 0, 0, 1, 1]

    # hot-key fallback (chunk the id axis) must agree row-for-row
    salted = (
        pack_sequences(ds, budget=6, num_buckets=8, chunk_us=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, salted[out.columns])


def test_span_dedup_keep_first_semantics(ray_session):
    """Duplicate spans survive only at the globally-first (doc_id,
    chunk_idx); later occurrences vanish even within the SAME doc; docs
    losing every span come back as empty strings."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import span_dedup

    df = pd.DataFrame(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "a b c d a b",     # spans: "a b", "c d", "a b"(dup of own idx0)
                "c d x y",         # "c d" dup of doc1 → keeps only "x y"
                "a b",             # fully duplicated → ""
                "  p  q ",         # whitespace normalizes to "p q"
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        span_dedup(ds, span_tokens=2, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert list(out["text"]) == ["a b c d", "x y", "", "p q"]

    # the skinny hash-payload plan (128-bit dedup key + bloom-semi-join
    # text fetch) must emit identical rows
    import pandas as _pd

    hashed = (
        span_dedup(ds, span_tokens=2, num_buckets=8, payload="hash")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _pd.testing.assert_frame_equal(out, hashed[out.columns])


def test_redact_pii_stagewise_counts(ray_session):
    """Families apply in order (url → email → handle → ipv4): an email's
    @domain tail never double-counts as a handle, urls swallow their
    own @s/digits first, and counts reflect the stage they ran at."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import redact_pii

    df = pd.DataFrame(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "ping bob@example.com or @bob via https://x.io/@bob?u=1",
                "host 10.0.0.1 and 256.1.2.3 (still matches: no range check)",
                "no pii here",
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = redact_pii(ds, id_cols=["rid"]).to_pandas().sort_values("rid").reset_index(drop=True)
    assert out.loc[0, "text"] == "ping <EMAIL> or <HANDLE> via <URL>"
    assert (
        out.loc[0, ["n_url", "n_email", "n_handle", "n_ipv4"]].tolist() == [1, 1, 1, 0]
    )
    assert out.loc[1, "text"] == "host <IP> and <IP> (still matches: no range check)"
    assert out.loc[1, "n_ipv4"] == 2
    assert out.loc[2, "text"] == "no pii here"
    assert out.loc[2, ["n_url", "n_email", "n_handle", "n_ipv4"]].sum() == 0


def test_lm_score_vs_bruteforce_and_strategies(ray_session):
    """Unigram-LM NLL sums equal a numpy brute force, and the broadcast
    and join vocab strategies emit identical rows."""
    import math

    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import lm_score

    df = pd.DataFrame(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["a b a", "b c", "a a a a", "???"],  # doc 3: no tokens
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = lm_score(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # corpus: a=6, b=2, c=1, T=9
    def nll(c):
        return math.floor(1_000_000 * math.log(9.0 / c))

    want = {
        0: (3, 2 * nll(6) + nll(2)),
        1: (2, nll(2) + nll(1)),
        2: (4, 4 * nll(6)),
    }
    assert list(out["doc_id"]) == [0, 1, 2]  # zero-token doc emits nothing
    for _, row in out.iterrows():
        assert (row["n_tokens"], row["nll"]) == want[row["doc_id"]]

    joined = (
        lm_score(ds, vocab_broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, joined[out.columns])


def test_domain_frequency_topn(ray_session):
    """URL-host extraction + corpus counts: multiple urls per row, hosts
    lowercased, port/path stripped, ties order domain asc, top_n cuts."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import domain_frequency

    df = pd.DataFrame(
        {
            "text": [
                "see https://A.com/x and http://b.org/y?z=1",
                "again https://a.com:8080/p plus https://c.net",
                "no urls here",
                "https://b.org",
            ]
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = domain_frequency(ds, top_n=2).to_pandas()
    assert list(out["domain"]) == ["a.com", "b.org"]  # 2, 2 → tie, asc
    assert list(out["n"]) == [2, 2]
    full = domain_frequency(ds, top_n=10).to_pandas()
    assert dict(zip(full["domain"], full["n"])) == {"a.com": 2, "b.org": 2, "c.net": 1}


def test_bpe_token_count_pretokens(ray_session):
    """GPT-2-style pre-token counts: contractions split, punctuation
    runs separate, space prefixes absorbed, whitespace skipped."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.text import bpe_token_count

    df = pd.DataFrame(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "it's done, v2.0 works!",   # it|'s| done|,| v|2|.|0| works|!
                "  spaced   out  ",
                "",
                "a=1;b=2 // comment",       # a|=|1|;|b|=|2| //| comment
            ],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = bpe_token_count(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_bpe_tokens"]) == [10, 2, 0, 9]
    assert list(out["n_ws_tokens"]) == [4, 2, 0, 3]


def test_pca_matches_numpy_reference(ray_session):
    """Distributed moment-partial PCA equals a single-machine numpy
    reference (same sign convention) to float tolerance; components are
    orthonormal, variances descend, and full-rank projection preserves
    pairwise distances."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.ann import pca_fit, pca_project

    rng = np.random.default_rng(5)
    n, d = 400, 12
    # anisotropic cloud so the spectrum is distinct
    x = rng.normal(size=(n, d)) * np.linspace(5, 0.2, d)
    df = pd.DataFrame(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64"), pa.int64()),
            "embedding": [row.astype(np.float32).tolist() for row in x],
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    k = 4
    mean, comps = pca_fit(ds, k=k)

    xf = x.astype(np.float32).astype(np.float64)  # what the engine saw
    mu = xf.mean(axis=0)
    cov = (xf - mu).T @ (xf - mu) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    ref = evecs[:, order]
    flip = np.sign(ref[np.abs(ref).argmax(axis=0), np.arange(k)])
    ref = ref * flip

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-6)
    assert np.allclose(comps.T @ comps, np.eye(k), atol=1e-9)  # orthonormal
    var = ((xf - mu) @ comps).var(axis=0)
    assert (np.diff(var) <= 1e-9).all()  # variance descends

    proj = (
        pca_project(ds, mean, comps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = np.stack([np.asarray(v) for v in proj["pca"]])
    assert np.allclose(got, (xf - mu) @ comps, atol=1e-9)


def test_bigram_frequency_matches_reference(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.functions.text import bigram_frequency

    docs = [
        "the cat sat on the mat",
        "the cat ran. The cat sat!",
        "on the mat, on the mat",
        "single",
        "",
    ]
    ds = ray.data.from_arrow(pa.table({"text": docs}))
    out = bigram_frequency(ds, top_n=5).to_pandas()

    # reference: adjacent pairs of [a-z0-9]+ runs, never across docs
    import re
    from collections import Counter

    c: Counter = Counter()
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d.lower()) if t]
        c.update(" ".join(p) for p in zip(toks, toks[1:]))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(out["bigram"], out["n"])) == ref
    # non-vacuous: counts aggregate across documents ("the cat" spans
    # docs 0+1; "on the" gets 2 from doc 2 and 1 from doc 0)
    assert dict(ref)["the cat"] == 3 and dict(ref)["on the"] == 3


def test_kmeans_assign_invariants(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.functions.ann import (
        _matrix_of,
        _normalize,
        kmeans_assign,
        train_kmeans_ivf,
    )

    rng = np.random.default_rng(31)
    n, d, k = 400, 8, 5
    vecs = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cent = train_kmeans_ivf(ds, n_centroids=k, iters=3)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    # every vector labeled exactly once, labels within [0, k)
    assert len(out) == n and out["vec_id"].is_unique
    assert out["cluster_id"].between(0, len(cent) - 1).all()
    # self-consistency: the label IS the cosine argmax against the centroids
    ref = np.argmax(_normalize(vecs) @ _normalize(np.asarray(cent)).T, axis=1)
    assert (out["cluster_id"].to_numpy() == ref).all()


def test_semantic_dedup_drop_paths_equal(ray_session):
    """The broadcast key-set drop filter and the distributed anti
    hash_join must keep exactly the same vec_ids (forced-limit twin,
    the revenue_by_nation precedent)."""
    from cartography_ray.pipelines.queries import q_emb_semantic_dedup

    sf = "/root/testdata/sf0.001"
    bc = sorted(q_emb_semantic_dedup(sf).to_pandas()["vec_id"])
    hj = sorted(
        q_emb_semantic_dedup(sf, drop_broadcast_limit=0).to_pandas()["vec_id"]
    )
    assert bc == hj and len(bc) > 0


def test_hash_join_skew_salt_equals_unsalted(ray_session):
    """The skew_salt plan must emit exactly the unsalted row multiset
    for every mode it supports, on a pathologically skewed left side
    (90% one key) with dup right keys and null left keys."""
    import pandas as pd
    import ray.data

    from cartography_ray.ops.joins import hash_join

    rng = np.random.default_rng(33)
    n = 2000
    k = np.where(rng.random(n) < 0.9, 7.0, rng.integers(0, 20, n).astype("float64"))
    k[:5] = np.nan  # null join keys
    left = pd.DataFrame({"k": k, "x": [f"l{i}" for i in range(n)]})
    right = pd.DataFrame(
        {"k": [7.0, 7.0, 3.0, 99.0], "y": ["a", "b", "c", "d"]}
    )

    def run(how, salt):
        out = hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_on="k", how=how, num_buckets=16, skew_salt=salt,
        ).to_pandas()
        cols = [c for c in ["k", "x", "y"] if c in out.columns]
        return sorted(map(tuple, out[cols].astype(str).to_numpy()))

    for how in ["inner", "left", "semi", "anti"]:
        assert run(how, 8) == run(how, None), how

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_on="k", how="outer", skew_salt=4,
        )


def test_bm25_topk_matches_bruteforce(ray_session):
    import math

    import ray.data

    from cartography_ray.functions.text import bm25_topk

    docs = {
        1: "apple banana apple cherry",
        2: "banana banana banana",
        3: "cherry apple",
        4: "durian fig grape",          # no query term → never ranked
        5: "apple apple apple apple apple banana",
    }
    terms = ["apple", "banana"]
    k1, b = 1.2, 0.75
    n_docs = len(docs)
    tokens = {d: t.split() for d, t in docs.items()}
    avgdl = sum(len(v) for v in tokens.values()) / float(n_docs)
    df = {t: sum(1 for v in tokens.values() if t in v) for t in terms}
    idf6 = {
        t: math.floor(1_000_000 * math.log(1.0 + (float(n_docs) - df[t] + 0.5) / (df[t] + 0.5)))
        for t in terms
    }
    want = {}
    for d, toks in tokens.items():
        s = 0
        for t in terms:
            tf = toks.count(t)
            if tf:
                s += int(math.floor(
                    float(idf6[t]) * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(toks) / avgdl)))
                ))
        if s:
            want[d] = s

    import pandas as pd

    pdf = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = bm25_topk(
        ray.data.from_pandas(pdf).repartition(3), terms, n_docs=n_docs, k=3
    ).to_pandas()
    # top-3 by (score desc, doc_id asc), rn 1-based, doc 4 never appears
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(got["doc_id"]) == [d for d, _ in ranked]
    assert list(got["score_micro"]) == [s for _, s in ranked]
    assert list(got["rn"]) == [1, 2, 3]
    assert 4 not in set(got["doc_id"])


def test_near_decontaminate_recall_and_plan_identity(ray_session):
    """MinHash-LSH cross-corpus scrub: seeded near-dups of benchmark docs
    are dropped (recall), unrelated docs overwhelmingly survive
    (precision), and the broadcast and join plans return the identical
    surviving set (the decontaminate plan-identity contract)."""
    import pandas as pd
    import ray.data

    from cartography_ray.functions.dedup import near_decontaminate

    rng = np.random.default_rng(31)
    vocab = [f"w{i:03d}" for i in range(400)]

    def doc(n):
        return " ".join(rng.choice(vocab, n))

    bench_texts = [doc(60) for _ in range(10)]
    bench = pd.DataFrame(
        {"doc_id": np.arange(10, dtype="int64"), "text": bench_texts}
    )
    near = [t + " tiny appended tail" for t in bench_texts]        # ≈0.9 jaccard
    clean = [doc(60) for _ in range(40)]                            # unrelated
    corpus = pd.DataFrame(
        {
            "doc_id": np.arange(100, 100 + len(near) + len(clean), dtype="int64"),
            "text": near + clean,
        }
    )
    near_ids = set(range(100, 110))

    def run(**kw):
        out = near_decontaminate(
            ray.data.from_pandas(corpus).repartition(3),
            ray.data.from_pandas(bench).repartition(2),
            num_perm=64, bands=16, shingle_k=5, num_partitions=4, **kw,
        ).to_pandas()
        return set(out["doc_id"].astype(int))

    kept = run()
    assert kept.isdisjoint(near_ids), "a seeded near-dup survived the scrub"
    n_clean_kept = len(kept & set(corpus["doc_id"][len(near):].astype(int)))
    assert n_clean_kept >= 36, f"too many unrelated docs dropped ({n_clean_kept}/40 kept)"
    kept_join = run(broadcast_limit=0)
    assert kept_join == kept, "broadcast and join plans diverged"
