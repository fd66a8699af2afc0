"""Auto-discoverable intel modules (reference cartography/sync.py:299-386).

The reference discovers its sync stages by naming convention: every
module under ``cartography.intel`` exporting a callable named
``start_<module>_ingestion`` becomes a stage, with ``analysis`` pinned
last. This package is the analogue: ``cartography_ray.sync.
discover_modules()`` iterates it with the same convention and the same
import-failure tolerance. Each module here is a thin adapter over the
corresponding pipeline — the explicit ``@register_stage`` registry in
``sync.py`` remains the primary composition surface; discovery exists
for reference-parity drop-in composition (``build_sync_discovered``).
"""
