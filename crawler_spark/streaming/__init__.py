from .rounds import (  # noqa: F401
    stream_first_seen,
    stream_link_extract,
    stream_windowed_lineage,
)
