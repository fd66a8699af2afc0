"""Transcript→KG intel module (discovered via ``start_kg_ingestion``)."""

from __future__ import annotations


def start_kg_ingestion(store, ctx, config: dict):
    """Run the flagship transcript→KG sync (reference naming convention
    ``start_<module>_ingestion``, cartography/sync.py:343)."""
    from cartography_ray.pipelines.kg import run_kg_pipeline

    return run_kg_pipeline(
        config["transcripts"],
        store,
        ctx,
        work_dir=config.get("work_dir"),
        detector_concurrency=config.get("detector_concurrency"),
        cleanup=config.get("cleanup", True),
    )
