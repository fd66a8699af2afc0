"""Drift detection — snapshot-diff of query results between two states.

Re-expresses the reference's driftdetect flow (cartography/driftdetect/
get_states.py:24-142 + detect_deviations.py:19-116): capture a query's
result rows as a state snapshot, then diff two snapshots in BOTH
directions by tuple-set difference (anti-join semantics).

``DriftRegistry`` adds the multi-state directory lifecycle (reference
get_states.py walk + add_shortcut.py + cli.py:15-231): one directory
per registered query holding a ``template.json`` (name + properties),
timestamped state snapshots, alias shortcuts (``most-recent`` etc.) in
``shortcuts.json``, and an ``archive/`` subdirectory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

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


class DriftRegistry:
    """Multi-state drift directory lifecycle.

    Layout (one directory per registered query under ``root``)::

        <root>/<query>/template.json    {"name", "properties"}
        <root>/<query>/<timestamp>.json captured states
        <root>/<query>/shortcuts.json   {"alias": "<filename>"}
        <root>/<query>/archive/         archived states

    ``capture_all`` walks every query directory, runs the caller's
    ``runner(template) -> DataFrame`` and captures one timestamped state
    per query, updating the ``most-recent`` shortcut — the analogue of
    the reference's ``run_get_states`` + ``add_shortcut`` flow. States
    are addressed by filename OR shortcut alias everywhere.
    """

    SHORTCUTS = "shortcuts.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _qdir(self, query: str) -> str:
        d = os.path.join(self.root, query)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"drift query not registered: {query}")
        return d

    def queries(self) -> list[str]:
        return sorted(
            q
            for q in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, q, "template.json"))
        )

    def states(self, query: str) -> list[str]:
        """Captured (non-archived) state filenames, oldest first."""
        d = self._qdir(query)
        return sorted(
            f
            for f in os.listdir(d)
            if f.endswith(".json") and f not in ("template.json", self.SHORTCUTS)
        )

    # ---------------------------------------------------------- register
    def register_query(self, name: str, properties: list[str]) -> str:
        d = os.path.join(self.root, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "template.json"), "w") as f:
            json.dump({"name": name, "properties": list(properties)}, f)
        return d

    def template(self, query: str) -> dict:
        return json.load(open(os.path.join(self._qdir(query), "template.json")))

    # ----------------------------------------------------------- capture
    def capture(self, query: str, df: pd.DataFrame, filename: str | None = None) -> str:
        """Capture one state for one query; updates ``most-recent``."""
        tpl = self.template(query)
        if filename is None:
            # reference get_states.py: gmtime-component filename
            filename = ".".join([str(i) for i in time.gmtime()] + ["json"])
        path = os.path.join(self._qdir(query), filename)
        capture_state(df, path, tpl["name"], tpl["properties"])
        self.add_shortcut(query, "most-recent", filename)
        return filename

    def capture_all(
        self, runner: Callable[[dict], pd.DataFrame], filename: str | None = None
    ) -> dict[str, str]:
        """Run ``runner(template)`` for every registered query and capture
        the results under ONE shared timestamped filename (the reference
        walks all query directories with a single gmtime filename)."""
        if filename is None:
            filename = ".".join([str(i) for i in time.gmtime()] + ["json"])
        out = {}
        for q in self.queries():
            df = runner(self.template(q))
            if hasattr(df, "to_pandas"):
                df = df.to_pandas()
            out[q] = self.capture(q, df, filename)
        return out

    # --------------------------------------------------------- shortcuts
    def _shortcuts(self, query: str) -> dict:
        p = os.path.join(self._qdir(query), self.SHORTCUTS)
        return json.load(open(p)) if os.path.exists(p) else {}

    def add_shortcut(self, query: str, alias: str, filename: str) -> None:
        """Alias → filename (replaces an existing alias, reference
        add_shortcut.py:40+). The target may itself be an alias."""
        sc = self._shortcuts(query)
        sc[alias] = sc.get(filename, filename)  # resolve one level
        with open(os.path.join(self._qdir(query), self.SHORTCUTS), "w") as f:
            json.dump(sc, f)

    def resolve(self, query: str, name: str) -> str:
        """Alias or literal filename → absolute state path."""
        sc = self._shortcuts(query)
        filename = sc.get(name, name)
        path = os.path.join(self._qdir(query), filename)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no state '{name}' for query '{query}'")
        return path

    # ------------------------------------------------------------ detect
    def detect(self, query: str, start: str, end: str = "most-recent") -> dict:
        """Drift report between two states addressed by name/alias."""
        return detect_drift(self.resolve(query, start), self.resolve(query, end))

    # ----------------------------------------------------------- archive
    def archive(self, query: str, name: str) -> str:
        """Move a state to the archive/ subdirectory; drops any aliases
        pointing at it."""
        path = self.resolve(query, name)
        filename = os.path.basename(path)
        adir = os.path.join(self._qdir(query), "archive")
        os.makedirs(adir, exist_ok=True)
        dest = os.path.join(adir, filename)
        shutil.move(path, dest)
        sc = {a: f for a, f in self._shortcuts(query).items() if f != filename}
        with open(os.path.join(self._qdir(query), self.SHORTCUTS), "w") as f:
            json.dump(sc, f)
        return dest
