"""Fuzzy string self-join (functions/fuzzy.py): the banded-DP verifier
against a pure-python Levenshtein reference, and the blocked distributed
join against a brute-force O(n²) reference on a seeded-typo corpus."""

import numpy as np
import pandas as pd
import pytest


def _lev_ref(a: str, b: str) -> int:
    """Textbook full-matrix Levenshtein (reference only)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _rand_strings(rng, n, alphabet="abcd", max_len=12):
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, max_len + 1))
        out.append("".join(rng.choice(list(alphabet), ln)))
    return out


@pytest.mark.parametrize("max_dist", [1, 2])
def test_levenshtein_banded_matches_reference(max_dist):
    from cartography_ray.functions.fuzzy import levenshtein_banded

    rng = np.random.default_rng(13 + max_dist)
    a = _rand_strings(rng, 500)
    b = _rand_strings(rng, 500)
    got = levenshtein_banded(a, b, max_dist)
    want = np.array(
        [min(_lev_ref(x, y), max_dist + 1) for x, y in zip(a, b)], dtype="int64"
    )
    assert (got == want).all()


def test_levenshtein_banded_unicode_and_edges():
    from cartography_ray.functions.fuzzy import levenshtein_banded

    a = ["", "a", "héllo", "héllo", "naïve", "日本語", ""]
    b = ["", "", "héllo", "hèllo", "naive", "日本言吾", "ab"]
    got = levenshtein_banded(a, b, 2)
    want = np.array(
        [min(_lev_ref(x, y), 3) for x, y in zip(a, b)], dtype="int64"
    )
    assert (got == want).all()


def _typo_corpus(rng, n_base=120):
    """Base words + seeded 1- and 2-edit typos (plus exact unrelated
    words) so the true pair set is rich at both distances."""
    alphabet = list("abcdefgh")
    words = []
    base = ["".join(rng.choice(alphabet, int(rng.integers(4, 10)))) for _ in range(n_base)]
    for w in base:
        words.append(w)
        if rng.random() < 0.5:  # substitution typo
            i = int(rng.integers(0, len(w)))
            words.append(w[:i] + str(rng.choice(alphabet)) + w[i + 1 :])
        if rng.random() < 0.3:  # deletion typo
            i = int(rng.integers(0, len(w)))
            words.append(w[:i] + w[i + 1 :])
        if rng.random() < 0.3:  # insertion typo
            i = int(rng.integers(0, len(w) + 1))
            words.append(w[:i] + str(rng.choice(alphabet)) + w[i:])
    # unique strings with stable ids (duplicates would be dist-0 pairs —
    # legal, but dedup keeps the reference simple)
    uniq = sorted(set(words))
    return pd.DataFrame({"sid": np.arange(len(uniq), dtype="int64"), "s": uniq})


@pytest.mark.parametrize("max_dist", [1, 2])
def test_edit_distance_pairs_matches_bruteforce(ray_session, max_dist):
    import ray.data

    from cartography_ray.functions.fuzzy import edit_distance_pairs

    rng = np.random.default_rng(29)
    df = _typo_corpus(rng)
    want = set()
    rows = list(df.itertuples(index=False))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _lev_ref(rows[i].s, rows[j].s)
            if d <= max_dist:
                want.add((rows[i].sid, rows[j].sid, d))
    assert len(want) > 50  # non-vacuous corpus

    ds = ray.data.from_pandas(df).repartition(6)
    got_df = edit_distance_pairs(
        ds, id_col="sid", str_col="s", max_dist=max_dist,
        num_buckets=16, num_partitions=4,
    ).to_pandas()
    got = set(
        zip(got_df["a_id"].astype(int), got_df["b_id"].astype(int), got_df["dist"].astype(int))
    )
    assert got == want


def test_edit_distance_pairs_df_cap_only_drops(ray_session):
    """df_cap trades completeness for bounded buckets — the capped result
    must be a SUBSET of the uncapped one (never a false pair)."""
    import ray.data

    from cartography_ray.functions.fuzzy import edit_distance_pairs

    rng = np.random.default_rng(31)
    df = _typo_corpus(rng, n_base=60)
    ds = ray.data.from_pandas(df).repartition(4)
    full = edit_distance_pairs(
        ds, id_col="sid", str_col="s", max_dist=1, num_buckets=8
    ).to_pandas()
    capped = edit_distance_pairs(
        ds, id_col="sid", str_col="s", max_dist=1, num_buckets=8, df_cap=3
    ).to_pandas()
    fset = set(zip(full["a_id"], full["b_id"]))
    cset = set(zip(capped["a_id"], capped["b_id"]))
    assert cset <= fset


def test_edit_distance_pairs_null_strings_dropped(ray_session):
    """Null strings never pair (SQL NULL semantics) and must not crash
    the verify stage (review finding: blocking used astype(str) while
    the payload carried the raw None)."""
    import ray.data

    from cartography_ray.functions.fuzzy import edit_distance_pairs

    df = pd.DataFrame(
        {"sid": np.arange(6, dtype="int64"),
         "s": ["abc", None, "abd", None, "xyz", "abc"]}
    )
    got = edit_distance_pairs(
        ray.data.from_pandas(df).repartition(3), "sid", "s", max_dist=1,
        num_buckets=4,
    ).to_pandas()
    pairs = set(zip(got["a_id"], got["b_id"]))
    assert pairs == {(0, 2), (0, 5), (2, 5)}
