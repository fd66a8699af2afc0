from cartography_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    ensure_transcripts,
    read_transcripts,
    synth_transcripts_table,
    transcripts_path,
    turns_for_sf,
)
