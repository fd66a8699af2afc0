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
