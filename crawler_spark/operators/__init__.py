"""Operator catalog: each submodule exposes QUERIES = {name: (builder, sql)}
where builder is (spark, sf_dir) -> DataFrame and sql is the DuckDB oracle
twin (None for non-SQL-expressible ops — driver then does a rows-only check).
"""

from __future__ import annotations

from . import dedup, multimodal, relational, rk_interface, si_interface, similarity, strings, text

ALL_QUERIES = {}
for _mod in (relational, dedup, similarity, text, multimodal, si_interface, rk_interface, strings):
    for _name, _pair in _mod.QUERIES.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        ALL_QUERIES[_name] = _pair
