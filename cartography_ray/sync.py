"""Sync orchestration — stage registry, dependency gating, JSON jobs.

Re-expresses the reference's sync composition surface:

- ``Sync.add_stage`` / ``add_stages`` / ``run`` (reference
  ``cartography/sync.py:198-297``): an ordered registry of named stage
  callables executed sequentially; insertion order = execution order;
  re-registering a name replaces it; unhandled exceptions abort the run.
  Stage signature here is ``func(store, ctx, config) -> Any`` (the
  GraphStore replaces the Neo4j session).
- ``build_sync("kg,analysis")`` (reference ``sync.py:588-632``): compose
  a Sync from the module registry by name; unknown names raise.
- ``run_analysis_and_ensure_deps`` (reference ``util.py:145-236``):
  skip an analysis job unless every resource dependency was part of the
  requested syncs.
- Drop-in JSON analysis-job directory (reference
  ``intel/analysis.py:12-45``; packaged jobs under
  ``cartography/data/jobs/``): every ``**/*.json`` under
  ``config["analysis_job_directory"]`` parses into a typed
  ``AnalysisJob`` and runs. The reference ships raw Cypher statements;
  our declarative JSON encodes the typed effect DSL instead (match
  predicates + effects), since there is no Cypher engine here.
"""

from __future__ import annotations

import glob as _glob
import json
import logging
import os
from typing import Any, Callable

import pandas as pd

from cartography_ray.core.context import IngestContext
from cartography_ray.stages.analysis import (
    AddRelationship,
    AddToSet,
    AddValuesToSet,
    AnalysisJob,
    AnalysisStatement,
    ScopeById,
    SetProperties,
    SetProperty,
    SetRelationshipProperty,
    run_analysis_job,
)
from cartography_ray.state.store import GraphStore

logger = logging.getLogger(__name__)


class Sync:
    """Ordered stage registry (reference sync.py:198-297)."""

    def __init__(self, name: str = "sync") -> None:
        self.name = name
        self._stages: dict[str, Callable] = {}

    def add_stage(self, name: str, func: Callable) -> None:
        self._stages[name] = func

    def add_stages(self, stages: list[tuple[str, Callable]]) -> None:
        for name, func in stages:
            self.add_stage(name, func)

    def stage_names(self) -> list[str]:
        return list(self._stages)

    def run(self, store: GraphStore, ctx: IngestContext, config: dict | None = None) -> dict:
        """Execute all stages in registration order; any unhandled
        exception aborts the sync (reference sync.py:282-295)."""
        from cartography_ray.stats import get_stats_client

        config = config or {}
        results: dict[str, Any] = {}
        stats = get_stats_client("sync").get_stats_client(self.name)
        logger.info("starting sync '%s' with update tag %d", self.name, ctx.update_tag)
        for stage_name, stage_func in self._stages.items():
            logger.info("starting sync stage '%s'", stage_name)
            with stats.timer(stage_name):
                results[stage_name] = stage_func(store, ctx, config)
            stats.incr(f"{stage_name}.runs")
            logger.info("finishing sync stage '%s'", stage_name)
        return results


# ---------------------------------------------------------------- registry

STAGE_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    """Decorator registering a stage factory under ``name`` for
    ``build_sync`` composition. The naming-convention analogue is
    ``discover_modules`` below (reference sync.py:299-386); both feed
    the same ``Sync``."""

    def deco(func: Callable) -> Callable:
        STAGE_REGISTRY[name] = func
        return func

    return deco


def discover_modules(package: str = "cartography_ray.modules") -> dict[str, Callable]:
    """Module auto-discovery by naming convention (reference
    cartography/sync.py:299-386 ``list_intel_modules``): every module in
    ``package`` exporting a callable named ``start_<name>_ingestion``
    becomes a stage keyed by the MODULE name; a callable whose embedded
    name mismatches its module is still bound (debug-logged, as in the
    reference); modules that fail to import are error-logged and skipped
    so one broken module never blocks the others; ``analysis`` is pinned
    last regardless of iteration order. Returned dict preserves that
    ordering (insertion-ordered)."""
    import importlib
    import re as _re
    from pkgutil import iter_modules

    pkg = importlib.import_module(package)
    rx = _re.compile(r"^start_(.+)_ingestion$")
    found: dict[str, Callable] = {}
    for info in iter_modules(pkg.__path__):
        if info.name == "analysis":
            continue
        try:
            mod = importlib.import_module(f"{package}.{info.name}")
        except ImportError:
            logger.error("failed to import module '%s'; skipping", info.name, exc_info=True)
            continue
        for attr, val in vars(mod).items():
            m = rx.match(attr)
            if not callable(val) or not m:
                continue
            if m.group(1) != info.name:
                logger.debug(
                    "callable '%s' does not match module name '%s'", attr, info.name
                )
            found[info.name] = val
    try:
        found["analysis"] = importlib.import_module(
            f"{package}.analysis"
        ).start_analysis_ingestion
    except (ImportError, AttributeError):
        pass
    return found


def build_sync_discovered(package: str = "cartography_ray.modules") -> Sync:
    """Compose a Sync from every auto-discovered module, analysis last
    (the reference's default full-sync composition)."""
    sync = Sync(name="discovered")
    for name, func in discover_modules(package).items():
        sync.add_stage(name, func)
    return sync


def build_sync(selected: str | list[str]) -> Sync:
    """Compose a Sync from registry names (reference sync.py:588-632)."""
    names = (
        [s.strip() for s in selected.split(",") if s.strip()]
        if isinstance(selected, str)
        else list(selected)
    )
    sync = Sync(name="+".join(names))
    for n in names:
        if n not in STAGE_REGISTRY:
            raise ValueError(f"unknown sync stage '{n}'; registered: {sorted(STAGE_REGISTRY)}")
        sync.add_stage(n, STAGE_REGISTRY[n])
    return sync


# ------------------------------------------------------- dependency gating


def run_analysis_and_ensure_deps(
    job: AnalysisJob,
    resource_dependencies: set[str],
    requested_syncs: set[str],
    store: GraphStore,
    ctx: IngestContext,
) -> dict | None:
    """Run the job only if every dependency was a requested sync
    (reference util.py:145-236); returns None when skipped."""
    if not set(resource_dependencies) <= set(requested_syncs):
        logger.info(
            "did not run %s: needs %s but requested syncs are %s",
            job.name,
            sorted(resource_dependencies),
            sorted(requested_syncs),
        )
        return None
    return run_analysis_job(job, store, ctx)


# ------------------------------------------------------- JSON job directory

_MATCH_OPS: dict[str, Callable[[pd.Series, Any], pd.Series]] = {
    "eq": lambda s, v: s == v,
    "ne": lambda s, v: s != v,
    "lt": lambda s, v: s < v,
    "le": lambda s, v: s <= v,
    "gt": lambda s, v: s > v,
    "ge": lambda s, v: s >= v,
    "in": lambda s, v: s.isin(v),
    "contains": lambda s, v: s.astype("string").str.contains(str(v), regex=False).fillna(False),
    "startswith": lambda s, v: s.astype("string").str.startswith(str(v)).fillna(False),
    "endswith": lambda s, v: s.astype("string").str.endswith(str(v)).fillna(False),
    "is_null": lambda s, v: s.isna(),
    "not_null": lambda s, v: s.notna(),
}


def _compile_match(spec: dict | None) -> Callable[[pd.DataFrame], pd.Series] | None:
    """JSON predicate → pandas mask fn. Combinators: {"all": [...]} /
    {"any": [...]}; leaves: {"column", "op", "value"}."""
    if spec is None:
        return None

    def ev(node: dict, df: pd.DataFrame) -> pd.Series:
        if "all" in node:
            masks = [ev(c, df) for c in node["all"]]
            out = masks[0]
            for m in masks[1:]:
                out = out & m
            return out
        if "any" in node:
            masks = [ev(c, df) for c in node["any"]]
            out = masks[0]
            for m in masks[1:]:
                out = out | m
            return out
        col, op = node["column"], node.get("op", "eq")
        if op not in _MATCH_OPS:
            raise ValueError(f"unknown match op '{op}'")
        if col not in df.columns:
            return pd.Series(False, index=df.index)
        return _MATCH_OPS[op](df[col], node.get("value"))

    return lambda df: ev(spec, df)


def _parse_effect(e: dict):
    t = e["type"]
    if t == "set_property":
        return SetProperty(e["prop"], value=e.get("value"), from_prop=e.get("from_prop"))
    if t == "set_properties":
        return SetProperties(props=tuple(sorted(e["props"].items())))
    if t == "add_to_set":
        return AddToSet(e["prop"], value=e.get("value"), from_prop=e.get("from_prop"))
    if t == "add_values_to_set":
        return AddValuesToSet(e["prop"], from_props=tuple(e.get("from_props", ())))
    if t == "add_relationship":
        return AddRelationship(e["rel_label"], e["target_label"], e["source_key"], e["target_key"])
    if t == "set_relationship_property":
        return SetRelationshipProperty(
            e["rel_label"], e["prop"], value=e.get("value"), if_missing=bool(e.get("if_missing"))
        )
    raise ValueError(f"unknown effect type '{t}'")


def job_from_json(spec: dict) -> AnalysisJob:
    """Declarative JSON → typed AnalysisJob."""
    statements = []
    for s in spec.get("statements", []):
        scope = s.get("scope")
        statements.append(
            AnalysisStatement(
                node_label=s["node_label"],
                match=_compile_match(s.get("match")),
                effects=tuple(_parse_effect(e) for e in s.get("effects", [])),
                scope=ScopeById(scope["value"], scope.get("column", "_sub_id")) if scope else None,
            )
        )
    return AnalysisJob(name=spec.get("name", "json-job"), statements=tuple(statements))


def run_analysis_job_directory(store: GraphStore, ctx: IngestContext, directory: str) -> dict:
    """Run every ``**/*.json`` job under ``directory`` (reference
    intel/analysis.py:12-45). Missing/non-dir paths skip with a warning;
    per-job exceptions are logged and the remaining jobs still run."""
    results: dict[str, Any] = {}
    if not directory:
        logger.info("skipping analysis: no job directory provided")
        return results
    if not os.path.isdir(directory):
        logger.warning("skipping analysis: job path '%s' is not a directory", directory)
        return results
    for path in sorted(_glob.glob(os.path.join(directory, "**", "*.json"), recursive=True)):
        try:
            spec = json.load(open(path))
            job = job_from_json(spec)
            results[os.path.relpath(path, directory)] = run_analysis_job(job, store, ctx)
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception:
            logger.exception("analysis job failed: %s", path)
            results[os.path.relpath(path, directory)] = None
    return results


# ----------------------------------------------------- default composition


@register_stage("kg")
def _stage_kg(store: GraphStore, ctx: IngestContext, config: dict):
    """The flagship transcript→KG sync as a composable stage."""
    from cartography_ray.pipelines.kg import run_kg_pipeline

    transcripts = config["transcripts"]
    return run_kg_pipeline(
        transcripts,
        store,
        ctx,
        work_dir=config.get("work_dir"),
        detector_concurrency=config.get("detector_concurrency"),
        cleanup=config.get("cleanup", True),
    )


@register_stage("docs")
def _stage_docs(store: GraphStore, ctx: IngestContext, config: dict):
    """Documents → dedup-graph module (Document nodes + DUPLICATE_OF
    edges) — the second intel module, composable with 'kg'."""
    from cartography_ray.pipelines.docs import run_docs_pipeline

    return run_docs_pipeline(
        config["documents"], store, ctx, cleanup=config.get("cleanup", True)
    )


@register_stage("analysis")
def _stage_analysis(store: GraphStore, ctx: IngestContext, config: dict):
    """Drop-in JSON analysis-job directory stage (runs LAST by
    convention, as in the reference's default sync ordering)."""
    return run_analysis_job_directory(store, ctx, config.get("analysis_job_directory", ""))
