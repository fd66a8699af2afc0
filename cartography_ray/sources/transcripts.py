"""Deterministic synthetic multi-turn transcript corpus.

The north-rule input table (BASELINE.json ``input_hint``) is a Parquet table
of multi-turn conversation / agent transcripts:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

No such table ships in /root/testdata, so we synthesize it deterministically
(seeded, pure function of the conversation index) at a scale proportional to
the TPC-H-ish scale factors, cache it under /tmp, and run both the Ray
pipeline and the DuckDB oracle SQL against the SAME cached file.

Design notes for the embedded mentions (these drive the KG extraction):

- handles     ``@user<k>`` / ``@alt<k>``      (whitespace-preceded)
- emails      ``user<k>@example.com``
- names       ``Username<k>``                  (capitalized single token)
- alias decls ``Username<k> (aka @user<k>)`` and ``@user<k> (aka @alt<k>)``
  — at most ONE alias declaration per turn (keeps the SQL oracle to a
  single ``regexp_extract`` with groups). Alias declarations give the
  union-find canonicalizer real work: name→user→alt chains of length 3.
- tickets     ``TICK-<n>`` / ``BUG-<n>``
- urls        ``https://example.com/p/<n>``
- tool turns  role='tool' with the ``tool`` column set.

Hot-key skew is built in: user 0 participates in ~35% of conversations and
is mention-weighted inside them, so ``user:user0`` is a hot entity that the
canonicalization / aggregation stages must survive (salting / partial agg).

Everything is generated per-conversation from ``np.random.default_rng``
seeded by a stable 64-bit hash of (seed, conv_index), so generation is
order-independent and shardable across Ray tasks.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Bump when the generator changes so stale caches are never reused.
GENERATOR_VERSION = "v1"
DEFAULT_SEED = 42
CACHE_ROOT = "/tmp/graft_kg"

TOOLS = ["search", "bash", "browser", "calc", "editor"]

WORDS = (
    "the quick brown fox jumps over lazy dog while system processes request "
    "and returns result after checking cache then writing output to table "
    "please review this change before merge because tests cover new logic "
    "we should measure latency under load with larger batch size tomorrow"
).split()

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_TS0 = int(datetime(2026, 1, 1).timestamp())  # naive UTC epoch seconds


def _conv_seed(seed: int, conv: int) -> int:
    h = hashlib.md5(f"{seed}:{conv}".encode()).digest()
    return int.from_bytes(h[:8], "little")


def turns_for_sf(sf: float) -> int:
    """Target turn count per scale factor (sf0.01 → 20k turns)."""
    return max(200, int(sf * 2_000_000))


def num_convs_for_turns(n_turns: int) -> int:
    # conversations average ~8 turns
    return max(25, n_turns // 8)


def _gen_conversation(seed: int, conv: int, num_users: int, num_tickets: int):
    """Generate one conversation's rows. Pure function of (seed, conv)."""
    rng = np.random.default_rng(_conv_seed(seed, conv))
    conv_id = f"conv{conv:07d}"
    n_turns = int(4 + rng.integers(0, 9))

    n_part = int(rng.integers(2, 5))
    participants = rng.choice(np.arange(1, num_users), size=n_part, replace=False)
    if rng.random() < 0.35:
        participants = np.concatenate([[0], participants])  # hot user 0
    # mention weights: first participant dominates (skew inside the conv too)
    w = np.ones(len(participants))
    w[0] = 4.0
    w = w / w.sum()

    rows = []
    base_ts = _TS0 + (conv % 100_000) * 3600
    role_user = True
    for t in range(n_turns):
        if not role_user and rng.random() < 0.25:
            role = "tool"
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))]
            nwords = int(rng.integers(3, 8))
            words = list(rng.choice(WORDS, size=nwords))
            text = f"ran {tool} ok " + " ".join(words)
        else:
            role = "user" if role_user else "assistant"
            role_user = not role_user
            tool = None
            nwords = int(rng.integers(3, 11))
            parts = list(rng.choice(WORDS, size=nwords))
            p = int(rng.choice(participants, p=w))
            r = rng.random()
            # at most one alias declaration per turn (oracle-SQL friendly)
            if r < 0.06:
                parts.append(f"Username{p} (aka @user{p})")
            elif r < 0.11:
                parts.append(f"@user{p} (aka @alt{p})")
            else:
                if rng.random() < 0.50:
                    parts.append(f"@user{p}")
                if rng.random() < 0.15:
                    parts.append(f"user{int(rng.choice(participants, p=w))}@example.com")
                if rng.random() < 0.12:
                    parts.append(f"Username{int(rng.choice(participants, p=w))}")
                if rng.random() < 0.08:
                    parts.append(f"@alt{int(rng.choice(participants, p=w))}")
            if rng.random() < 0.25:
                prefix = "TICK" if rng.random() < 0.7 else "BUG"
                parts.append(f"{prefix}-{int(rng.integers(1, num_tickets))}")
            if rng.random() < 0.20:
                parts.append(f"https://example.com/p/{int(rng.integers(1, num_tickets))}")
            rng.shuffle(parts)  # mentions can appear anywhere in the turn
            text = " ".join(parts)
        rows.append(
            (
                conv_id,
                t,
                role,
                text,
                tool,
                (base_ts + t * 60) * 1_000_000,  # us
            )
        )
    return rows


def synth_transcripts_table(
    n_turns: int, seed: int = DEFAULT_SEED, conv_offset: int = 0, n_convs: int | None = None
) -> pa.Table:
    """Build a transcript table with ~n_turns turns (driver-side).

    ``conv_offset``/``n_convs`` allow sharded generation (each shard is a
    pure function of its conversation indices) for parallel generation of
    large corpora via Ray tasks.
    """
    if n_convs is None:
        n_convs = num_convs_for_turns(n_turns)
    num_users = max(50, n_convs // 5)
    num_tickets = max(50, n_convs // 2)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for c in range(conv_offset, conv_offset + n_convs):
        for row in _gen_conversation(seed, c, num_users, num_tickets):
            conv_ids.append(row[0])
            turn_idxs.append(row[1])
            roles.append(row[2])
            texts.append(row[3])
            tools.append(row[4])
            tss.append(row[5])
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"


def sf_from_dir(sf_dir: str) -> float:
    name = _sf_name(sf_dir)
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


def transcripts_path(sf_dir: str) -> str:
    """Canonical cached parquet path for a given sf dir (stable for oracles)."""
    return f"{CACHE_ROOT}/{GENERATOR_VERSION}/{_sf_name(sf_dir)}/transcripts.parquet"


def ensure_transcripts(sf_dir: str, seed: int = DEFAULT_SEED) -> str:
    """Generate-once: write the transcript parquet for sf_dir if absent.

    Written atomically (tmp file + rename) so concurrent callers and killed
    runs can never observe a partial file.
    """
    path = transcripts_path(sf_dir)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = synth_transcripts_table(turns_for_sf(sf_from_dir(sf_dir)), seed=seed)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def read_transcripts(sf_dir: str, **read_kwargs):
    """ray.data source for the transcript table of a given sf dir."""
    import ray.data

    return ray.data.read_parquet(ensure_transcripts(sf_dir), **read_kwargs)


def ensure_transcripts_turns(n_turns: int, seed: int = DEFAULT_SEED) -> str:
    """Generate-once a corpus of ~n_turns turns, sharded in parallel.

    Each shard is a pure function of its conversation-index range, so the
    directory's contents are deterministic regardless of task scheduling.
    Returns the directory path (read with ``ray.data.read_parquet``).
    """
    import ray

    out_dir = f"{CACHE_ROOT}/{GENERATOR_VERSION}/turns-{n_turns}-seed{seed}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_convs = num_convs_for_turns(n_turns)
    shards = max(8, min(256, n_convs // 200))
    per = (n_convs + shards - 1) // shards

    @ray.remote(num_cpus=1)
    def gen_shard(i: int) -> str:
        off = i * per
        cnt = min(per, n_convs - off)
        if cnt <= 0:
            return ""
        tbl = synth_transcripts_table(0, seed=seed, conv_offset=off, n_convs=cnt)
        path = os.path.join(out_dir, f"shard-{i:04d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return path

    ray.get([gen_shard.remote(i) for i in range(shards)])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
