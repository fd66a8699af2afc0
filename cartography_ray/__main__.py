"""``python -m cartography_ray`` → CLI (reference cartography/__main__.py)."""

from cartography_ray.cli import main

raise SystemExit(main())
