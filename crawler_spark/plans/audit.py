"""Physical-plan auditing: assert that the plans Catalyst produces are the
plans we want at 100 TB — filters pushed into the parquet scan, columns
pruned, small dims broadcast, no cartesian products, wide codegen spans.

The reference has no optimizer (SURVEY §4) — hand-written Rust IS its plan.
Here the plan is derived, so the engine's scale guarantees live in these
assertions (used by tests/test_plans.py) rather than in code shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, needles: list[str]) -> None:
    """Every needle must appear inside a PushedFilters: [...] clause of the
    formatted plan (predicate reached the parquet reader)."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    missing = [n for n in needles if n not in pushed]
    assert not missing, f"filters not pushed down: {missing}\n{pushed}"


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema) — the
    column-pruning audit."""
    plan = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer == more of the plan is
    fused JVM codegen)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
