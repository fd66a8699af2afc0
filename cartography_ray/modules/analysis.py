"""Analysis-job-directory intel module (``start_analysis_ingestion``).

Pinned last by ``discover_modules`` regardless of iteration order, like
the reference's 'analysis' special case (cartography/sync.py:383-386).
"""

from __future__ import annotations


def start_analysis_ingestion(store, ctx, config: dict):
    from cartography_ray.sync import run_analysis_job_directory

    return run_analysis_job_directory(
        store, ctx, config.get("analysis_job_directory", "")
    )
