"""Drift detection — snapshot-diff of query results between two states.

Re-expresses the reference's driftdetect flow (cartography/driftdetect/
get_states.py:24-142 + detect_deviations.py:19-116): capture a query's
result rows as a state snapshot, then diff two snapshots in BOTH
directions by tuple-set difference (anti-join semantics).
"""

from __future__ import annotations

import json
import os

import pandas as pd


def capture_state(df: pd.DataFrame, path: str, name: str, properties: list[str]) -> str:
    """Serialize a result frame to a JSON state file (sorted, stable)."""
    rows = df[properties].astype(str).values.tolist()
    rows.sort()
    state = {"name": name, "properties": properties, "results": rows}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)
    return path


def detect_drift(start_path: str, end_path: str) -> dict:
    """Both-direction set difference between two state files.

    Returns {"new": [...rows in end not in start], "missing": [...rows in
    start not in end]} — the reference's new/missing drift report.
    """
    start = json.load(open(start_path))
    end = json.load(open(end_path))
    if start["properties"] != end["properties"]:
        raise ValueError("drift states have different schemas")
    s = {tuple(r) for r in start["results"]}
    e = {tuple(r) for r in end["results"]}
    return {
        "properties": start["properties"],
        "new": sorted(e - s),
        "missing": sorted(s - e),
    }
