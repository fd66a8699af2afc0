"""Benchmark harness (driver contract).

Default: runs the headline transcript→KG pipeline over the synthetic
transcript corpus scaled to ``$GRAFT_SF_DIR`` (default sf0.1 ≈ 200k
turns) plus a set of representative operator queries, and prints ONE
JSON line:

    {"metric": "kg_pipeline_sec", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the headline pipeline in two fresh processes at
num_cpus=$GRAFT_SCALE_LO (4) and $GRAFT_SCALE_HI (16) over the SAME
input and reports both throughputs + scaling efficiency. The default
pair sits below this box's memory-bandwidth knee (~16 cores saturate
~100k turns/s regardless of extra cores), so CPU count is the actual
variable — the sandbox stand-in for N vs 4N nodes, where per-node
bandwidth scales with the cluster. The 8/32 pair is reported in
BASELINE.md too (the sandbox evidence for the
north rule's two-cluster-size criterion — see BASELINE.md).

Each timed run uses a FRESH store/work dir (no checkpoint reuse), so
both scaling levels do identical work. Transcript generation and an
untimed warm read happen before the clock starts.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _warmup() -> None:
    """Spin up the Ray worker pool + imports before the clock starts, so
    the measured window is steady-state compute, not process startup."""
    import ray.data as rdata

    rdata.range(NUM_CPUS * 1000, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()


def run_headline(sf_dir: str) -> dict:
    import ray
    import ray.data

    from cartography_ray.core.context import IngestContext
    from cartography_ray.pipelines.kg import run_kg_pipeline
    from cartography_ray.sources.transcripts import (
        ensure_transcripts,
        ensure_transcripts_turns,
    )
    from cartography_ray.state.store import GraphStore

    bench_turns = os.environ.get("GRAFT_BENCH_TURNS")
    if bench_turns:
        path = ensure_transcripts_turns(int(bench_turns))
    else:
        path = ensure_transcripts(sf_dir)
    _warmup()

    run_id = f"bench-{os.getpid()}"
    # RAM-backed scratch: keeps the measured window about compute+shuffle,
    # not /tmp disk contention (the corpus itself stays on disk, warmed)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    work = f"{scratch}/graft_kg_bench/{run_id}/work"
    store_root = f"{scratch}/graft_kg_bench/{run_id}/store"
    for p in (work, store_root):
        shutil.rmtree(p, ignore_errors=True)

    ds = ray.data.read_parquet(path)
    n_turns = ds.count()

    t0 = time.time()
    store = GraphStore(store_root, num_buckets=32)
    ctx = IngestContext.make(update_tag=20260101)
    metrics = run_kg_pipeline(ds, store, ctx, work_dir=work)
    sec = time.time() - t0
    shutil.rmtree(f"{scratch}/graft_kg_bench/{run_id}", ignore_errors=True)
    return {
        "sec": sec,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / sec, 1),
        "nodes": metrics["nodes"],
        "edges": metrics["edges"],
        "timings": metrics["timings"],
    }


def run_queries(sf_dir: str) -> dict:
    from cartography_ray.pipelines import queries as Q

    names = [
        "pricing_summary",
        "revenue_by_nation",
        "revenue_by_nation_salted",
        "filter_project",
        "customers_without_orders",
        "events_hourly",
        "events_sessions",
        "events_sessions_salted",
        "events_attribution",
        "events_quantiles",
        "events_quantiles_disc",
        "top_orders_per_cust",
        "docs_stats",
        "docs_token_freq",
        "docs_chunks",
        "docs_tfidf",
        "docs_mix",
        "docs_exact_dedup",
        "docs_incremental_dedup",
        "docs_minhash_pairs",
        "docs_simhash_pairs",
        "emb_knn",
        "emb_knn_ivf",
        "emb_neardup",
        "emb_semantic_dedup",
        "events_hopping",
        "events_running_sum",
        "events_ntile",
        "lineitem_rollup",
        "docs_decontam",
        "docs_pruned",
        "docs_repetition",
        "docs_packed",
        "docs_span_dedup",
        "docs_lm_score",
        "docs_bpe_tokens",
        "events_attribution_salted",
        "kg_pii_redacted",
        "kg_domains",
        "events_rolling",
        "events_retention",
        "events_funnel",
        "events_rank",
        "docs_bigrams",
        "docs_shuffled",
        "kg_triangles",
        "emb_clusters",
        "events_user_mode",
        "events_coverage",
        "customers_fuzzy_names",
        "kg_kcore",
        "events_user_path",
        "docs_bpe_merges",
        "events_outliers",
        "regional_supplier_revenue",
        "kg_top_partners",
        "docs_token_freq_cms",
        "customers_fuzzy_clusters",
        "docs_dup_clusters",
        "docs_lang_routed",
        "events_corr",
        "events_histogram",
        "events_cume_dist",
        "events_trend",
        "kg_reach",
        "events_gapfill",
        "cust_orders_events_outer",
        "shipping_priority",
        "docs_bm25",
        "events_mad",
        "events_weighted_sample",
        "events_next_purchase",
        "emb_mmr",
        "docs_source_weights",
        "events_profile",
        "docs_budget_select",
        "docs_incremental_minhash",
        "emb_knn_pq",
        "docs_gopher",
        "docs_entropy",
        "events_zscore",
        "docs_near_decontam",
        "docs_bpe_encoded",
        "returned_item_revenue",
        "priority_late_orders",
        "urgent_lines_by_status",
        "discounted_revenue",
        "promo_revenue_share",
        "events_ewma",
        "events_gapfill_locf",
        "events_running_distinct",
        "events_gapfill_interp",
    ]
    out = {}
    # The graph family (kg_triangles/kg_kcore/kg_reach/kg_top_partners)
    # shares one sorted→mentions→co_pairs checkpoint chain; build it ONCE
    # as its own timed entry so whichever graph query runs first doesn't
    # absorb the shared cost (cold /tmp vs warm /tmp made kg_triangles
    # swing 0.7 s ↔ 17 s between rounds).
    t0 = time.time()
    Q.QUERIES["kg_co_mentions"](sf_dir).count()
    out["kg_pair_checkpoint_build"] = round(time.time() - t0, 3)
    for name in names:
        t0 = time.time()
        res = Q.QUERIES[name](sf_dir)
        # force execution
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # don't forward worker logs: the hash-shuffle aggregators emit a
        # benign "Failed to hash the schemas" warning per shuffle batch
        # (pandas-block schema metadata is unhashable in Ray 2.49) that
        # floods the bench log tail; exceptions still propagate normally
        log_to_driver=False,
    )
    from cartography_ray.runtime import configure

    configure()
    if os.environ.get("GRAFT_BENCH_MODE") == "headline":
        # scaling mode: one big (16M-turn) run per CPU level
        headline = run_headline(SF_DIR)
        qtimes = {}
    else:
        # best-of-2 at bench scale: host contention on this box swings
        # run-to-run wall time up to 2-3× (BASELINE.md); two runs damp it
        runs = [run_headline(SF_DIR), run_headline(SF_DIR)]
        headline = min(runs, key=lambda r: r["sec"])
        headline["runs_sec"] = [round(r["sec"], 3) for r in runs]
        qtimes = run_queries(SF_DIR)
    try:
        sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", ""))
    except ValueError:
        sf = None
    # The driver captures only the last ~2000 chars of stdout; the 70+-entry
    # per-query map blew past that in round 4 ("parsed": null). Print a
    # compact line and write the full per-query detail to a sidecar file.
    compact = {
        "metric": "kg_pipeline_sec",
        "value": round(headline["sec"], 3),
        "unit": "sec",
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "turns": headline["turns"],
        "turns_per_sec": headline["turns_per_sec"],
        "timings": {k: round(v, 2) for k, v in headline["timings"].items()},
        **(
            {"headline_runs_sec": headline["runs_sec"]}
            if "runs_sec" in headline
            else {}
        ),
    }
    if qtimes:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as f:
            json.dump({**compact, "queries": qtimes}, f, indent=1, sort_keys=True)
        compact["queries_detail"] = detail_path
        compact["queries_n"] = len(qtimes)
        compact["queries_total_sec"] = round(sum(qtimes.values()), 1)
    line = json.dumps(compact)
    assert len(line) < 1500, f"bench line too long for driver tail: {len(line)}"
    print(line)
    ray.shutdown()


def scaling() -> None:
    """Two fresh processes at 8 and 32 CPUs over the same input."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_MODE="headline",
            GRAFT_BENCH_TURNS=os.environ.get("GRAFT_SCALING_TURNS", "16000000"),
            PYTHONPATH=os.path.dirname(os.path.abspath(__file__)),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    n_hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    lo, hi = run(n_lo), run(n_hi)
    thr_lo = lo["turns_per_sec"]
    thr_hi = hi["turns_per_sec"]
    eff = (thr_hi / thr_lo) / (n_hi / n_lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "num_cpus_lo": n_lo,
                "num_cpus_hi": n_hi,
                "sec_lo": lo["value"],
                "sec_hi": hi["value"],
                "turns_per_sec_lo": thr_lo,
                "turns_per_sec_hi": thr_hi,
                "turns": hi["turns"],
                "sf": hi["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
