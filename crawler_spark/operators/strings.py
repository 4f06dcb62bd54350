"""Remaining SURVEY §2 string/sort/set operator analogs (F1, G5, J3, O3/O4,
U2, X3, X7, X10, X13) over the testdata tables, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import DUCK_TOKENS, SPARK_TOKENS, load


# -- F1: extension filter + kind classification (miner/types.rs:24-39) ------
def f1_extension_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").isin("LARGE", "MEDIUM", "SMALL"))
        .withColumn(
            "kind",
            F.when(F.col("p_type") == "LARGE", "source").otherwise("header"),
        )
        .select("p_partkey", F.col("p_type").alias("ext"), "kind")
    )


F1_SQL = """
SELECT p_partkey, p_type AS ext,
       CASE WHEN p_type = 'LARGE' THEN 'source' ELSE 'header' END AS kind
FROM part
WHERE p_type IN ('LARGE','MEDIUM','SMALL')
"""


# -- G5: min-line pick per group (FindInnerLoops.cpp:49-62) -----------------
def g5_min_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_linenumber").alias("first_line"),
        F.max("l_linenumber").alias("last_line"),
    )


G5_SQL = """
SELECT l_orderkey, min(l_linenumber) AS first_line, max(l_linenumber) AS last_line
FROM lineitem GROUP BY l_orderkey
"""


# -- J3: suffix-resolution join (AbbrevTable, dep_graph.rs:64-113) ----------
def j3_suffix_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarations (last 2 words of a part name) resolved against the
    suffix table of all part names — multi-candidate matches kept, exactly
    the reference's include→file resolution with ambiguity."""
    part = load(spark, sf_dir, "part")
    suffixes = part.select(
        F.col("p_partkey").alias("file_key"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(p_name, ' '))),"
                " i -> array_join(slice(split(p_name, ' '), -i, i), '/'))"
            )
        ).alias("suffix"),
    )
    decls = part.filter(F.col("p_partkey") % 17 == 0).select(
        F.col("p_partkey").alias("decl_key"),
        F.expr("array_join(slice(split(p_name, ' '), -2, 2), '/')").alias("suffix"),
    )
    return (
        decls.join(suffixes, "suffix")
        .groupBy("decl_key", "suffix")
        .agg(F.count("*").alias("n_candidates"), F.min("file_key").alias("first_candidate"))
    )


J3_SQL = """
WITH suffixes AS (
  SELECT p_partkey AS file_key,
         unnest(list_transform(range(1, len(string_split(p_name,' ')) + 1),
                i -> array_to_string(string_split(p_name,' ')[-i:], '/'))) AS suffix
  FROM part
), decls AS (
  SELECT p_partkey AS decl_key,
         array_to_string(string_split(p_name,' ')[-2:], '/') AS suffix
  FROM part WHERE p_partkey % 17 = 0
)
SELECT d.decl_key, d.suffix, count(*)::bigint AS n_candidates,
       min(s.file_key)::bigint AS first_candidate
FROM decls d JOIN suffixes s USING (suffix)
GROUP BY d.decl_key, d.suffix
"""


# -- O3/O4 + U2: canonical sorted-set identity + dedup (compile.rs:79-87,166-168)
def u2_combo_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-distinct token combos as canonical identities; duplicate
    combos collapse — the tried-header-set dedup."""
    docs = load(spark, sf_dir, "documents")
    combo = F.array_join(
        F.array_sort(F.array_distinct(F.expr(f"slice({SPARK_TOKENS}, 1, 5)"))), "|"
    )
    return (
        docs.select(combo.alias("combo"))
        .groupBy("combo")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 1)
    )


U2_SQL = f"""
SELECT array_to_string(list_sort(list_distinct(({DUCK_TOKENS})[1:5])), '|') AS combo,
       count(*)::bigint AS n_docs
FROM documents GROUP BY 1
"""


# -- X3/X10: path relativize + name sanitize (types.rs:43-50; run.rs:123-126)
def x3_path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    path = F.concat(F.lit("corpus/"), F.col("source"), F.lit("/d"), F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.regexp_replace(path, "^corpus/", "").alias("rel_path"),
        F.translate(path, "/", "-").alias("log_name"),
    )


X3_SQL = """
SELECT doc_id,
       regexp_replace('corpus/' || source || '/d' || doc_id, '^corpus/', '') AS rel_path,
       replace('corpus/' || source || '/d' || doc_id, '/', '-') AS log_name
FROM documents
"""


# -- X7: region segmentation between sentinel headers (loops.rs:228-290) ----
def x7_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token stream split into regions between sentinel tokens ('scan'
    plays the 'LV: Checking a loop' header); per region: length + class."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(SPARK_TOKENS)).alias("pos", "tok")
    )
    heads = toks.filter(F.col("tok") == "scan")
    w = Window.partitionBy("doc_id").orderBy("pos")
    regions = heads.withColumn(
        "end_pos", F.coalesce(F.lead("pos").over(w), F.lit(1 << 30))
    ).select("doc_id", F.col("pos").alias("start_pos"), "end_pos")
    body = toks.join(regions, "doc_id").filter(
        (F.col("pos") > F.col("start_pos")) & (F.col("pos") < F.col("end_pos"))
    )
    return body.groupBy("doc_id", "start_pos").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("tok") == "fast", 1).otherwise(0)).alias("n_enabled"),
        F.sum(F.when(F.col("tok") == "slow", 1).otherwise(0)).alias("n_disabled"),
    )


X7_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS tok,
         generate_subscripts({DUCK_TOKENS}, 1) - 1 AS pos
  FROM documents
), regions AS (
  SELECT doc_id, pos AS start_pos,
         coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos), 1073741824) AS end_pos
  FROM toks WHERE tok = 'scan'
)
SELECT t.doc_id, r.start_pos, count(*)::bigint AS n_tokens,
       sum(CASE WHEN t.tok = 'fast' THEN 1 ELSE 0 END)::bigint AS n_enabled,
       sum(CASE WHEN t.tok = 'slow' THEN 1 ELSE 0 END)::bigint AS n_disabled
FROM toks t JOIN regions r
  ON t.doc_id = r.doc_id AND t.pos > r.start_pos AND t.pos < r.end_pos
GROUP BY t.doc_id, r.start_pos
"""


# -- X13: sentinel-window extraction (rebasedl output_parser.rs:5-42) -------
def x13_sentinel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows between the first 'table' (START) and the next 'query' (END)
    token per doc — the line-window extraction between sentinels."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(SPARK_TOKENS)).alias("pos", "tok")
    )
    bounds = toks.groupBy("doc_id").agg(
        F.min(F.when(F.col("tok") == "table", F.col("pos"))).alias("start_pos")
    )
    ends = (
        toks.join(bounds, "doc_id")
        .filter((F.col("tok") == "query") & (F.col("pos") > F.col("start_pos")))
        .groupBy("doc_id")
        .agg(F.min("pos").alias("end_pos"))
    )
    return (
        toks.join(bounds, "doc_id")
        .join(ends, "doc_id")
        .filter((F.col("pos") > F.col("start_pos")) & (F.col("pos") < F.col("end_pos")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_inside"),
            F.countDistinct("tok").alias("n_distinct_inside"),
        )
    )


X13_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS tok,
         generate_subscripts({DUCK_TOKENS}, 1) - 1 AS pos
  FROM documents
), starts AS (
  SELECT doc_id, min(CASE WHEN tok = 'table' THEN pos END) AS start_pos
  FROM toks GROUP BY doc_id
), ends AS (
  SELECT t.doc_id, min(t.pos) AS end_pos
  FROM toks t JOIN starts s ON t.doc_id = s.doc_id
  WHERE t.tok = 'query' AND t.pos > s.start_pos
  GROUP BY t.doc_id
)
SELECT t.doc_id, count(*)::bigint AS n_inside,
       count(DISTINCT t.tok)::bigint AS n_distinct_inside
FROM toks t
JOIN starts s ON t.doc_id = s.doc_id
JOIN ends e ON t.doc_id = e.doc_id
WHERE t.pos > s.start_pos AND t.pos < e.end_pos
GROUP BY t.doc_id
"""


# -- X7+X13 combined gate ---------------------------------------------------
# The driver's correctness gate checks at most 50 catalog entries (round 2 it
# silently skipped 2 of 52); both stderr-window parsers stay fully exercised
# through ONE gated query so nothing rotates out of the gate.
def x7_x13_stderr_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = x7_region_segment(spark, sf_dir).select(
        F.lit("x7_region").alias("parser"),
        "doc_id",
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_enabled").cast("long").alias("n_a"),
        F.col("n_disabled").cast("long").alias("n_b"),
    )
    b = x13_sentinel_window(spark, sf_dir).select(
        F.lit("x13_window").alias("parser"),
        "doc_id",
        F.lit(-1).cast("long").alias("start_pos"),
        F.col("n_inside").cast("long").alias("n_tokens"),
        F.col("n_distinct_inside").cast("long").alias("n_a"),
        F.lit(0).cast("long").alias("n_b"),
    )
    return a.unionByName(b)


X7_X13_SQL = f"""
SELECT 'x7_region' AS parser, doc_id, start_pos::bigint AS start_pos,
       n_tokens::bigint AS n_tokens, n_enabled::bigint AS n_a,
       n_disabled::bigint AS n_b
FROM ({X7_SQL}) x7
UNION ALL
SELECT 'x13_window', doc_id, (-1)::bigint, n_inside::bigint,
       n_distinct_inside::bigint, 0::bigint
FROM ({X13_SQL}) x13
"""


QUERIES = {
    "f1_extension_filter": (f1_extension_filter, F1_SQL),
    "g5_min_line": (g5_min_line, G5_SQL),
    "j3_suffix_resolution": (j3_suffix_resolution, J3_SQL),
    "u2_combo_dedup": (u2_combo_dedup, U2_SQL),
    "x3_path_ops": (x3_path_ops, X3_SQL),
    "x7_x13_stderr_windows": (x7_x13_stderr_windows, X7_X13_SQL),
}
