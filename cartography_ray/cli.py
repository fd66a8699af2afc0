"""Command-line entry points — the three reference CLIs, Ray-Data-first.

Mirrors SURVEY §3's traced entry points (reference cartography/cli.py
sync app; driftdetect/cli.py:15-231; rules/cli.py):

- ``sync``   — full transcript→KG sync into a GraphStore (plus the
  optional documents module), update-tag lineage and cleanup included.
- ``drift``  — state-directory lifecycle: register queries, capture
  states (``get-states``), detect drift between two states, manage
  shortcuts and archives.
- ``rules``  — execute the rules catalogue (framework-filterable) and
  format results as JSON or a table.

The CLI owns its Ray session (``ray job submit -- python -m
cartography_ray sync …`` works as-is); library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    from cartography_ray.runtime import configure

    configure()


def cmd_sync(args) -> int:
    import time

    import ray.data

    from cartography_ray.core.context import IngestContext
    from cartography_ray.pipelines.docs import run_docs_pipeline
    from cartography_ray.pipelines.kg import run_kg_pipeline
    from cartography_ray.state.store import GraphStore

    _ray_session(args.num_cpus)
    # reference sync.py defaults update_tag to int(time.time())
    tag = args.update_tag or int(time.time())
    ctx = IngestContext.make(update_tag=tag)
    store = GraphStore(args.store, num_buckets=args.num_buckets)
    modules = [m.strip() for m in args.modules.split(",") if m.strip()]
    out: dict = {"update_tag": tag, "store": args.store, "modules": {}}
    if "kg" in modules:
        ds = ray.data.read_parquet(args.input)
        metrics = run_kg_pipeline(ds, store, ctx, work_dir=args.work_dir)
        out["modules"]["kg"] = {
            "nodes": metrics["nodes"],
            "edges": metrics["edges"],
            "timings": metrics["timings"],
        }
    if "docs" in modules:
        if not args.documents:
            print("sync: --documents is required for the docs module", file=sys.stderr)
            return 2
        docs = ray.data.read_parquet(args.documents, columns=["doc_id", "text"])
        out["modules"]["docs"] = run_docs_pipeline(docs, store, ctx)
    print(json.dumps(out, default=str))
    return 0


def _drift_registry(args):
    from cartography_ray.functions.drift import DriftRegistry

    return DriftRegistry(args.dir)


def cmd_drift(args) -> int:
    reg = _drift_registry(args)
    if args.drift_cmd == "register":
        reg.register_query(args.query, args.properties.split(","))
        print(json.dumps({"registered": args.query}))
        return 0
    if args.drift_cmd == "get-states":
        from cartography_ray.pipelines.queries import QUERIES

        _ray_session(args.num_cpus)

        def runner(tpl):
            name = tpl["name"]
            if name not in QUERIES:
                raise KeyError(f"no catalogue query named {name!r}")
            return QUERIES[name](args.sf_dir)

        captured = reg.capture_all(runner)
        print(json.dumps({"captured": captured}))
        return 0
    if args.drift_cmd == "detect":
        report = reg.detect(args.query, args.start, args.end)
        print(json.dumps(report))
        return 0
    if args.drift_cmd == "add-shortcut":
        reg.add_shortcut(args.query, args.alias, args.file)
        print(json.dumps({"query": args.query, "alias": args.alias}))
        return 0
    if args.drift_cmd == "archive":
        dest = reg.archive(args.query, args.state)
        print(json.dumps({"archived": dest}))
        return 0
    return 2


def cmd_rules(args) -> int:
    from cartography_ray.rules import format_json, format_table, run_rules
    from cartography_ray.rules_catalog import ALL_RULES

    _ray_session(args.num_cpus)
    results = run_rules(
        list(ALL_RULES),
        args.sf_dir,
        framework=args.framework,
        scope=args.scope,
        with_findings=args.findings,
    )
    print(format_json(results) if args.format == "json" else format_table(results))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cartography_ray")
    p.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sync", help="transcript→KG sync into a GraphStore")
    s.add_argument("--input", required=True, help="transcript parquet file/dir")
    s.add_argument("--store", required=True, help="GraphStore root directory")
    s.add_argument("--documents", help="documents parquet (docs module)")
    s.add_argument("--modules", default="kg", help="comma list: kg,docs")
    s.add_argument("--update-tag", type=int, default=None)
    s.add_argument("--num-buckets", type=int, default=32)
    s.add_argument("--work-dir", default=None)
    s.set_defaults(fn=cmd_sync)

    d = sub.add_parser("drift", help="drift state-directory lifecycle")
    d.add_argument("--dir", required=True, help="drift registry root")
    dsub = d.add_subparsers(dest="drift_cmd", required=True)
    dr = dsub.add_parser("register")
    dr.add_argument("--query", required=True, help="catalogue query name")
    dr.add_argument("--properties", required=True, help="comma list of columns")
    dg = dsub.add_parser("get-states")
    dg.add_argument("--sf-dir", required=True, help="parquet table directory")
    dd = dsub.add_parser("detect")
    dd.add_argument("--query", required=True)
    dd.add_argument("--start", required=True, help="state filename or alias")
    dd.add_argument("--end", default="most-recent")
    da = dsub.add_parser("add-shortcut")
    da.add_argument("--query", required=True)
    da.add_argument("--alias", required=True)
    da.add_argument("--file", required=True)
    dx = dsub.add_parser("archive")
    dx.add_argument("--query", required=True)
    dx.add_argument("--state", required=True)
    d.set_defaults(fn=cmd_drift)

    r = sub.add_parser("rules", help="run the rules catalogue")
    r.add_argument("--sf-dir", required=True, help="parquet table directory")
    r.add_argument("--framework", default=None, help="framework short name filter")
    r.add_argument("--scope", default=None)
    r.add_argument("--format", choices=("json", "table"), default="table")
    r.add_argument("--findings", action="store_true")
    r.set_defaults(fn=cmd_rules)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
