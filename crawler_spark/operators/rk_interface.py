"""RebaseDL and KernelFaRer match extraction — the reference's other two
pluggable interfaces (`crawler_rebasedl/src/interface.rs:12-84`,
`crawler_kernel_farer/src/interface.rs:12-81`) re-expressed Spark-first.

The `compile` hook is modeled as log SYNTHESIS + log PARSE, both JVM-side:
a detector-matched token emits the reference pass's textual log block, and
the parser recovers matches with the reference's LITERAL regexes
(`crawler_rebasedl/src/output_parser.rs:5-34` for the RebaseDL
PackingCandidate fields, `crawler_kernel_farer/src/compile.rs:15-20` for the
X14 "Kernel rewritable" line). The DuckDB oracles compute the expected
matches directly from the tokens and never see the log, so any bug in the
synthesis or the regex parse breaks cross-engine parity — X14 finally has a
dedicated correctness gate.

Match-table schemas follow the reference's `init` DDL exactly:
  rebasedl matches(match_id, file_id, line, col, maf, cu, cb)
    (`crawler_rebasedl/src/interface.rs:25-36`; floats are the
     min-access-frequency / cache-utilization / cost-benefit candidates of
     `data.rs:4-12`)
  kernel_farer matches(match_id, file_id, line, type)
    (`crawler_kernel_farer/src/interface.rs:25-33`; `data.rs:4-8`)

All float fields are 3-decimal values derived from the shared 32-bit token
hash, so the %.3f log round-trip is exact in float64 in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import duck_h32, duck_tokens, load, spark_h32, spark_tokens

RB_DETECTOR = "^m"  # merge-ish tokens play packing candidates
KF_DETECTOR = "^j"  # join-ish tokens play rewritable kernels

# reference log grammar (output_parser.rs:5-34, compile.rs:15-20)
DATA_START = "[RebaseDLPass] RegionPackingCandidate ==========="
DATA_END = "[RebaseDLPass] =================================="
LOC_RE = r"!DILocation\(line: (\d+), column: (\d+)\)"
MAF_RE = r"Minimum access frequency: ([.0-9]+)"
CU_RE = r"Cache utilization: ([.0-9]+)"
CB_RE = r"Cost benefit: ([.0-9]+)"
KF_RE = r"Kernel rewritable at line (\d+) with type (\d+)"

_NL = r"'\n'"  # newline literal inside a Spark SQL expression


def _f3(int_expr: str) -> str:
    """3-decimal float field rendered exactly as the pass would print it."""
    return f"format_string('%.3f', cast({int_expr} as double) / 1000.0)"


def rebasedl_log_expr(text_col: str, detector: str = RB_DETECTOR) -> str:
    """SQL expr: synthesize the RebaseDL pass log for one row's text —
    one DATA_START..DATA_END block per detector-matched token."""
    h = spark_h32("x")
    block = (
        f"concat('{DATA_START}', {_NL}, "
        f"'!DILocation(line: ', cast(i as string), ', column: ', cast(length(x) as string), ')', {_NL}, "
        f"'- depth: ', cast(length(x) % 5 as string), {_NL}, "
        f"'Minimum access frequency: ', {_f3(f'{h} % 1000')}, {_NL}, "
        f"'Cache utilization: ', {_f3(f'({h} div 7) % 1000')}, {_NL}, "
        f"'Cost benefit: ', {_f3(f'({h} div 49) % 1000')}, {_NL}, "
        f"'{DATA_END}')"
    )
    lam = f"(x, i) -> case when x rlike '{detector}' then {block} else null end"
    return f"array_join(filter(transform({spark_tokens(text_col)}, {lam}), b -> b is not null), {_NL})"


def rebasedl_parse(logs: DataFrame, id_cols: list[str], log_col: str = "log") -> DataFrame:
    """Recover PackingCandidate matches from the log with the reference
    regexes (output_parser.rs parse()); empty logs yield no rows."""
    lg = F.col(log_col)
    arrs = logs.select(
        *id_cols,
        F.regexp_extract_all(lg, F.lit(LOC_RE), 1).alias("_lines"),
        F.regexp_extract_all(lg, F.lit(LOC_RE), 2).alias("_cols"),
        F.regexp_extract_all(lg, F.lit(MAF_RE), 1).alias("_mafs"),
        F.regexp_extract_all(lg, F.lit(CU_RE), 1).alias("_cus"),
        F.regexp_extract_all(lg, F.lit(CB_RE), 1).alias("_cbs"),
    )
    m = arrs.select(
        *id_cols,
        F.explode(F.arrays_zip("_lines", "_cols", "_mafs", "_cus", "_cbs")).alias("m"),
    )
    return m.select(
        *id_cols,
        F.col("m._lines").cast("long").alias("line"),
        F.col("m._cols").cast("long").alias("col"),
        F.col("m._mafs").cast("double").alias("maf"),
        F.col("m._cus").cast("double").alias("cu"),
        F.col("m._cbs").cast("double").alias("cb"),
    )


def kernel_log_expr(text_col: str, detector: str = KF_DETECTOR) -> str:
    """SQL expr: synthesize the KernelFaRer replacer-pass log. The pass only
    reports rewritable kernels (type 1..3); type 0 tokens stay silent, so
    some rows legitimately produce an EMPTY result — the F8 skip input
    (`crawler_kernel_farer/src/intern.rs:16-19`)."""
    tok_pos = "concat(x, ':', cast(i as string))"
    t = f"({spark_h32(tok_pos)} % 4)"
    line = f"concat('Kernel rewritable at line ', cast(i as string), ' with type ', cast({t} as string))"
    lam = f"(x, i) -> case when x rlike '{detector}' and {t} != 0 then {line} else null end"
    return f"array_join(filter(transform({spark_tokens(text_col)}, {lam}), b -> b is not null), {_NL})"


def kernel_parse(logs: DataFrame, id_cols: list[str], log_col: str = "log") -> DataFrame:
    """X14: parse "Kernel rewritable at line L with type T" lines
    (compile.rs:15-20 MATCH regex)."""
    lg = F.col(log_col)
    arrs = logs.select(
        *id_cols,
        F.regexp_extract_all(lg, F.lit(KF_RE), 1).alias("_lines"),
        F.regexp_extract_all(lg, F.lit(KF_RE), 2).alias("_types"),
    )
    return arrs.select(
        *id_cols, F.explode(F.arrays_zip("_lines", "_types")).alias("m")
    ).select(
        *id_cols,
        F.col("m._lines").cast("long").alias("line"),
        F.col("m._types").cast("long").alias("type"),
    )


# -- gated standalone queries over documents --------------------------------
def rb_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RebaseDL candidate extraction: synthesize the pass log per document,
    parse it back with the reference regexes."""
    docs = load(spark, sf_dir, "documents")
    logs = docs.select("doc_id", F.expr(rebasedl_log_expr("text")).alias("log"))
    return rebasedl_parse(logs, ["doc_id"]).withColumnRenamed("doc_id", "repo_id")


RB_MATCHES_SQL = f"""
WITH e AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id, unnest({duck_tokens('text')}) AS tok,
           generate_subscripts({duck_tokens('text')}, 1) - 1 AS pos
    FROM documents) t
  WHERE regexp_matches(tok, '{RB_DETECTOR}')
)
SELECT doc_id AS repo_id, pos::bigint AS line, length(tok)::bigint AS col,
       ({duck_h32('tok')} % 1000) / 1000.0 AS maf,
       (({duck_h32('tok')} // 7) % 1000) / 1000.0 AS cu,
       (({duck_h32('tok')} // 49) % 1000) / 1000.0 AS cb
FROM e
"""


def kf_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KernelFaRer match extraction (X14 regex parse, type-0 silent)."""
    docs = load(spark, sf_dir, "documents")
    logs = docs.select("doc_id", F.expr(kernel_log_expr("text")).alias("log"))
    return kernel_parse(logs, ["doc_id"]).withColumnRenamed("doc_id", "repo_id")


KF_MATCHES_SQL = f"""
WITH e AS (
  SELECT doc_id, pos,
         {duck_h32("tok || ':' || pos::varchar")} % 4 AS t
  FROM (
    SELECT doc_id, unnest({duck_tokens('text')}) AS tok,
           generate_subscripts({duck_tokens('text')}, 1) - 1 AS pos
    FROM documents) t
  WHERE regexp_matches(tok, '{KF_DETECTOR}')
)
SELECT doc_id AS repo_id, pos::bigint AS line, t::bigint AS type
FROM e WHERE t != 0
"""


QUERIES = {
    "rb_matches": (rb_matches, RB_MATCHES_SQL),
    "kf_matches": (kf_matches, KF_MATCHES_SQL),
}
