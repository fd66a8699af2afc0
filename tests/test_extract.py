"""Unit tests for mention extraction / linking (pure batch functions)."""

import pyarrow as pa

from cartography_ray.stages.extract import MentionDetector, extract_mentions_one
from cartography_ray.stages.link import LinkScorer, alias_edges_batch, entity_key_array


def test_extract_kinds():
    got = extract_mentions_one(
        "hi @bob see TICK-12 and https://example.com/p/3 mail bob@example.com"
    )
    assert ("handle", "@bob") in got
    assert ("ticket", "TICK-12") in got
    assert ("url", "https://example.com/p/3") in got
    assert ("email", "bob@example.com") in got
    # the email's @example must NOT register as a handle
    assert ("handle", "@example") not in got


def test_alias_declaration():
    got = extract_mentions_one("fyi Username5 (aka @user5) said hi")
    kinds = [k for k, _ in got]
    assert "alias" in kinds
    assert ("name", "Username5") in got
    assert ("handle", "@user5") in got


def test_consecutive_handles():
    got = extract_mentions_one("@a @b @c")
    handles = [f for k, f in got if k == "handle"]
    assert handles == ["@a", "@b", "@c"]


def _mention_batch(texts):
    det = MentionDetector()
    return det(
        pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "conv_id": pa.array(["c"] * len(texts), pa.string()),
                "turn_idx": pa.array(list(range(len(texts))), pa.int32()),
            }
        )
    )


def test_link_keys():
    batch = _mention_batch(["@bob and Bob2 and bob@x.com and TICK-1"])
    linked = LinkScorer()(batch)
    keys = dict(zip(linked.column("form").to_pylist(), linked.column("entity_key").to_pylist()))
    assert keys["@bob"] == "user:bob"
    assert keys["bob@x.com"] == "user:bob"
    assert keys["Bob2"] == "name:bob2"
    assert keys["TICK-1"] == "ticket:TICK-1"


def test_alias_edges():
    batch = _mention_batch(["Username5 (aka @user5)", "@user5 (aka @alt5)"])
    edges = alias_edges_batch(batch)
    pairs = set(zip(edges.column("a").to_pylist(), edges.column("b").to_pylist()))
    assert ("name:username5", "user:user5") in pairs
    assert ("user:user5", "user:alt5") in pairs


def test_entity_key_empty_batch():
    out = entity_key_array(pa.array([], pa.string()), pa.array([], pa.string()))
    assert len(out) == 0


def _reference_detect(batch: pa.Table) -> pa.Table:
    """Straightforward per-row finditer reference (the pre-megastring
    implementation) used to pin the vectorized detector's semantics."""
    import re

    from cartography_ray.stages.extract import (
        ALIAS_HANDLE_PATTERN,
        ALIAS_NAME_PATTERN,
        MENTION_PATTERNS,
        turn_uid_array,
    )

    texts = batch.column("text").to_pylist()
    conv = batch.column("conv_id").to_pylist()
    tidx = batch.column("turn_idx").to_pylist()
    rows = []
    for kind, (pat, grp) in MENTION_PATTERNS.items():
        cp = re.compile(pat)
        for i, text in enumerate(texts):
            for m in cp.finditer(text or ""):
                rows.append((conv[i], tidx[i], kind, m.group(grp), None, None))
    for pat, ag, bg in ((ALIAS_NAME_PATTERN, 2, 3), (ALIAS_HANDLE_PATTERN, 2, 3)):
        cp = re.compile(pat)
        for i, text in enumerate(texts):
            for m in cp.finditer(text or ""):
                rows.append((conv[i], tidx[i], "alias", m.group(ag), m.group(ag), m.group(bg)))
    conv_arr = pa.array([r[0] for r in rows], pa.string())
    tidx_arr = pa.array([r[1] for r in rows], pa.int32())
    return pa.table(
        {
            "conv_id": conv_arr,
            "turn_idx": tidx_arr,
            "turn_uid": turn_uid_array(conv_arr, tidx_arr)
            if rows
            else pa.array([], pa.string()),
            "kind": pa.array([r[2] for r in rows], pa.string()),
            "form": pa.array([r[3] for r in rows], pa.string()),
            "alias_a": pa.array([r[4] for r in rows], pa.string()),
            "alias_b": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def test_megastring_detector_matches_reference():
    """The megastring scan must be byte-identical (rows AND order) to the
    per-row finditer reference, including adversarial boundary cases."""
    adversarial = [
        "x@a@b.com plain @h1 a@b.co",
        "https://a.com/https://b x https://c.io y",
        " (aka @orphan)",
        "Alice1 (aka @bob) (aka @carol)",
        "@aa (aka @bb) tail",
        "e.mail_9@sub.domain.org",
        "@Upper no",
        "noat",
        "",
        None,
        "JIRA-123 and AB-9 ABCDEF-1 A-1",
        "Bob7 Carol22",
        "tab\tsep@x.io",
        "end with at@",
        "@",
        "https://",
        "a@b",
        "@a@b",
        "x (aka @y) z@w.com",
        "handle@end-of-row",
        "@rowstart mid @mid",
    ]
    tbl = pa.table(
        {
            "text": pa.array(adversarial, pa.string()),
            "conv_id": pa.array([f"c{i}" for i in range(len(adversarial))], pa.string()),
            "turn_idx": pa.array(list(range(len(adversarial))), pa.int32()),
        }
    )
    got = MentionDetector()(tbl)
    want = _reference_detect(tbl)
    assert got.equals(want), f"\ngot:\n{got.to_pandas()}\nwant:\n{want.to_pandas()}"

    from cartography_ray.sources.transcripts import synth_transcripts_table

    corpus = synth_transcripts_table(2000)
    assert MentionDetector()(corpus).equals(_reference_detect(corpus))
