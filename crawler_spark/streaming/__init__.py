from .rounds import (  # noqa: F401
    serve_mm_ingest_gate,
    stream_decontaminate,
    stream_first_seen,
    stream_first_seen_rocksdb,
    stream_gopher_gate,
    stream_link_extract,
    stream_nbq_gate,
    stream_quality_gate,
    stream_recrawl_schedule,
    stream_rollup,
    stream_sessionize,
    stream_windowed_lineage,
)
