from .rounds import stream_link_extract, stream_windowed_lineage  # noqa: F401
