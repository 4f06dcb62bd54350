from .audit import (  # noqa: F401
    assert_no_cartesian,
    assert_pushed_filters,
    explain_str,
    has_broadcast_join,
    scan_read_schema,
    wholestage_codegen_spans,
)
