from cartography_ray.pipelines.kg import build_graph, run_kg_pipeline  # noqa: F401
