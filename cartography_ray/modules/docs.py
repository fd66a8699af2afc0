"""Documents→dedup-graph intel module (``start_docs_ingestion``)."""

from __future__ import annotations


def start_docs_ingestion(store, ctx, config: dict):
    from cartography_ray.pipelines.docs import run_docs_pipeline

    return run_docs_pipeline(
        config["documents"], store, ctx, cleanup=config.get("cleanup", True)
    )
