"""SURVEY §2 relational-operator analogs over the driver's testdata tables.

Each entry re-expresses a reference operator (cited per query) as an
idiomatic Spark DataFrame plan over the TPC-H-ish tables, with a DuckDB
oracle twin. Scale notes inline: anti-joins stay shuffle-side-pruned, small
dims broadcast, top-k is TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import load


# -- J1: the scheduler anti-join (frontier minus seen), run.rs:74-89 --------
def j1_scheduler_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    # "seen" = customers with a big fulfilled order; frontier keeps the rest.
    # left_anti == NOT EXISTS; Catalyst plans a shuffled hash anti-join and
    # at scale AQE converts to broadcast when the seen side is small
    seen = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
    )
    return customer.join(
        seen, customer.c_custkey == seen.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


J1_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F' AND o.o_totalprice > 150000)
"""


# -- J2: discovery dedup (new ids not already known), search.rs:113-141 -----
def j2_discovery_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    known = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        events.select(F.col("user_id").alias("new_id"))
        .distinct()
        .join(known.select(F.col("c_custkey").alias("new_id")), "new_id", "left_anti")
    )


J2_SQL = """
SELECT DISTINCT user_id AS new_id FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = e.user_id AND c.c_mktsegment = 'BUILDING')
"""


# -- O1/O2: priority-ordered page (top-k, stable tie-break), search.rs:208-218
def o1_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # orderBy+limit plans as TakeOrderedAndProject: per-partition heaps +
    # driver merge — no global sort even at 10^10 rows
    page = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
    # partition-less window is safe: input is the 100-row page, not orders
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return page.select(
        "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rank")
    )


O1_SQL = """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# -- P6: per-host politeness budget (budget-first rows per host), search.rs:170-190
def p6_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("hrank", F.row_number().over(w))
        .filter(F.col("hrank") <= 3)
        .select("o_custkey", "o_orderkey", "hrank")
    )


P6_SQL = """
SELECT o_custkey, o_orderkey, hrank FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS hrank
  FROM orders) t
WHERE hrank <= 3
"""


# -- F5: priority-range predicate (star window), search.rs:208-218 ----------
def f5_priority_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # both predicates push into the parquet scan (PushedFilters)
    return orders.filter(
        (F.col("o_totalprice") >= 50000) & (F.col("o_totalprice") < 150000)
        & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


F5_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
WHERE o_totalprice >= 50000 AND o_totalprice < 150000 AND o_orderstatus = 'O'
"""


# -- G1: scalar min/max probe steering pagination, search.rs:221-237 --------
def g1_min_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.min("o_totalprice"), 2).alias("min_priority"),
        F.round(F.max("o_totalprice"), 2).alias("max_priority"),
        F.count("*").alias("n_rows"),
    )


G1_SQL = """
SELECT round(min(o_totalprice),2) AS min_priority,
       round(max(o_totalprice),2) AS max_priority,
       count(*)::bigint AS n_rows
FROM orders
"""


# -- G3: lineage rollup (stats per group), run.rs:189-203 -------------------
def g3_lineage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.countDistinct("o_custkey").alias("n_hosts"),
    )


G3_SQL = """
SELECT o_orderpriority, count(*)::bigint AS n_orders,
       round(sum(o_totalprice),2) AS sum_price,
       count(DISTINCT o_custkey)::bigint AS n_hosts
FROM orders GROUP BY o_orderpriority
"""


# -- G6: conditional instruction-mix aggs, Information.cpp:139-173 ----------
def g6_conditional_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # map-side partial aggregation; one shuffle on the (tiny) group keys
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("l_quantity") < 10, 1).otherwise(0)).alias("n_small"),
        F.sum(F.when((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 30), 1).otherwise(0)).alias("n_mid"),
        F.sum(F.when(F.col("l_quantity") >= 30, 1).otherwise(0)).alias("n_large"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


G6_SQL = """
SELECT l_returnflag, l_linestatus, count(*)::bigint AS n_rows,
       sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END)::bigint AS n_small,
       sum(CASE WHEN l_quantity >= 10 AND l_quantity < 30 THEN 1 ELSE 0 END)::bigint AS n_mid,
       sum(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END)::bigint AS n_large,
       round(sum(l_extendedprice * (1 - l_discount)),2) AS revenue
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# -- G7: distinct location set per group, Information.cpp:121-136 -----------
def g7_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
        F.count("*").alias("n_nations"),
    )


G7_SQL = """
SELECT n_regionkey,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
       count(*)::bigint AS n_nations
FROM nation GROUP BY n_regionkey
"""


# -- U1: node union + dedup, dep_graph.rs:56-62 -----------------------------
def u1_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


U1_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# -- X1: link extraction via regex + explode, dep_graph.rs:122-145 ----------
def x1_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # regexp_extract_all -> explode is the Spark form of the reference's
    # per-line #include regex scan
    return (
        docs.select(
            "doc_id",
            F.explode(F.expr(r"regexp_extract_all(text, '(s[a-z]{3,})', 1)")).alias("link"),
        )
        .groupBy("doc_id", "link")
        .agg(F.count("*").alias("n_refs"))
    )


X1_SQL = """
SELECT doc_id, link, count(*)::bigint AS n_refs FROM (
  SELECT doc_id, unnest(regexp_extract_all(text, '(s[a-z]{3,})', 1)) AS link
  FROM documents) t
GROUP BY doc_id, link
"""


# -- X2: suffix expansion of path components, dep_graph.rs:73-93 ------------
def x2_suffix_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    # a/b/c -> {c, b/c, a/b/c}, exactly the reference's AbbrevTable build
    return part.select(
        "p_partkey",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(p_name, ' '))),"
                " i -> array_join(slice(split(p_name, ' '), -i, i), '/'))"
            )
        ).alias("suffix"),
    )


X2_SQL = """
SELECT p_partkey,
       unnest(list_transform(range(1, len(string_split(p_name,' ')) + 1),
              i -> array_to_string(string_split(p_name,' ')[-i:], '/'))) AS suffix
FROM part
"""


# -- X15: JSON field access, git.rs:22-35 -----------------------------------
def x15_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("sum_k"))
    )


X15_SQL = """
SELECT (json_extract_string(props, '$.k')::bigint) % 10 AS k_mod,
       count(*)::bigint AS n_events,
       sum(json_extract_string(props, '$.k')::bigint)::bigint AS sum_k
FROM events GROUP BY 1
"""


# -- W1: tumbling-window counts over the event stream (batch twin of the
#    Structured-Streaming path; reference is batch-iterative, SURVEY §2.10)
def w1_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


W1_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*)::bigint AS n_events, round(sum(value),4) AS sum_value
FROM events GROUP BY 1, 2
"""


# Event time in epoch ms. ONE definition for every events-table operator:
# the testdata parquet stores TIMESTAMP_NTZ, so the cast to session-TZ
# timestamp (UTC, pinned by session.py) must precede unix_millis for
# DuckDB epoch_ms parity — a change here reaches w2/asof/range/rollup at
# once instead of drifting per operator.
def _event_ms():
    return F.unix_millis(F.col("ts").cast("timestamp"))


# -- W2: sessionization (30-min gap), deferral/round semantics analog -------
def w2_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = _event_ms()
    with_gap = events.withColumn(
        "new_sess",
        F.when(ms - F.lag(ms).over(w) > 30 * 60 * 1000, 1).otherwise(0),
    )
    sess = with_gap.withColumn(
        "session_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


W2_SQL = """
SELECT user_id, session_no::bigint AS session_no, count(*)::bigint AS n_events, round(sum(value),4) AS sum_value
FROM (
  SELECT user_id, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     > 30*60*1000 THEN 1 ELSE 0 END AS new_sess
    FROM events) g) s
GROUP BY user_id, session_no
"""


# -- as-of join: latest prior view per purchase (attribution) ---------------
# The time-series primitive Spark lacks as a built-in (SURVEY custom-op
# archetype): for each 'purchase' event, the most recent 'view' by the same
# user at or before it. Expressed WITHOUT a non-equi join: tag both event
# kinds into one frame and carry the last view forward with an ordered
# per-user window (one shuffle keyed by user, rows frame — bounded state,
# no candidate explosion at any scale; the standard distributed as-of
# shape). Ties at the same millisecond order view-before-purchase so an
# exactly-simultaneous view matches (the <= semantics), event_id breaking
# residual ties identically in both engines. `tolerance_ms` is the
# standard as-of knob: a match older than the tolerance is discarded
# (null) — applied AFTER the carry-forward, so it stays one window pass.
def x_asof_join(spark: SparkSession, sf_dir: str,
                tolerance_ms: int | None = None) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return asof_frame(
        ev.filter(F.col("event_type").isin("view", "purchase")).select(
            "event_id", "user_id", F.col("event_type").alias("et"),
            _event_ms().alias("ms"),
        ),
        tolerance_ms,
    )


def asof_frame(tagged: DataFrame, tolerance_ms: int | None = None) -> DataFrame:
    """The as-of kernel over any (event_id, user_id, et in {view,purchase},
    ms) frame — split out so randomized tests drive it on synthetic event
    sets (tests/test_ungated_oracles.py checks it against a brute-force
    Python reference, simultaneous events and no-prior-view included)."""
    tagged = tagged.withColumn(
        "tr", F.when(F.col("et") == "view", 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "tr", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lv_id = F.last(
        F.when(F.col("et") == "view", F.col("event_id")), ignorenulls=True
    ).over(w)
    lv_ms = F.last(
        F.when(F.col("et") == "view", F.col("ms")), ignorenulls=True
    ).over(w)
    out = (
        tagged.withColumn("view_id", lv_id)
        .withColumn("view_ms", lv_ms)
        .filter(F.col("et") == "purchase")
    )
    if tolerance_ms is not None:
        stale = F.col("ms") - F.col("view_ms") > tolerance_ms
        out = out.withColumn(
            "view_id", F.when(stale, None).otherwise(F.col("view_id"))
        ).withColumn("view_ms", F.when(stale, None).otherwise(F.col("view_ms")))
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ms",
        "view_id",
        (F.col("ms") - F.col("view_ms")).alias("gap_ms"),
    )


ASOF_SQL = """
WITH tagged AS (
  SELECT event_id, user_id, event_type AS et, epoch_ms(ts) AS ms,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tr
  FROM events WHERE event_type IN ('view', 'purchase')
)
SELECT event_id::bigint AS purchase_id, user_id::bigint AS user_id,
       ms::bigint AS ms, view_id::bigint AS view_id,
       (ms - view_ms)::bigint AS gap_ms
FROM (
  SELECT *,
         last_value(CASE WHEN et = 'view' THEN event_id END IGNORE NULLS)
           OVER w AS view_id,
         last_value(CASE WHEN et = 'view' THEN ms END IGNORE NULLS)
           OVER w AS view_ms
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, tr, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
) t
WHERE et = 'purchase'
"""


# -- range join: events into overlapping time windows (bucketed) ------------
# The second custom-op archetype: point-in-interval join against an
# interval table. A declarative non-equi join plans as a broadcast nested
# loop; the scale path maps each point into its <= ceil(LEN/STEP) candidate
# interval ids arithmetically (the intervals are STEP-periodic — the
# bucketing parameter a real pipeline chooses), explodes, and EQUI-joins on
# the interval id; the joined interval's actual bounds then validate the
# range exactly as they would for a genuinely irregular interval table.
# Candidate derivation uses only the period/length, never the bounds.
RANGE_EPOCH0 = 1704067200000  # 2024-01-01 00:00:00 UTC in epoch ms
RANGE_STEP_MS = 3 * 86_400_000
RANGE_LEN_MS = 5 * 86_400_000  # overlapping: each point hits <= 2 windows
N_RANGE_WINDOWS = 10


def x_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    win = spark.range(N_RANGE_WINDOWS).select(
        F.col("id").cast("int").alias("w"),
        (F.lit(RANGE_EPOCH0) + F.col("id") * RANGE_STEP_MS).alias("start_ms"),
        (
            F.lit(RANGE_EPOCH0) + F.col("id") * RANGE_STEP_MS + RANGE_LEN_MS
        ).alias("end_ms"),
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id", _event_ms().alias("ms")
    )
    # w valid iff w*STEP <= ms-E0 < w*STEP + LEN, integer bounds below;
    # guard the empty case — Spark's sequence(hi, lo) DESCENDS, not empties
    cand = ev.selectExpr(
        "event_id",
        "ms",
        f"""explode(
          case when least(cast(floor((ms - {RANGE_EPOCH0}) / {RANGE_STEP_MS}) as int),
                          {N_RANGE_WINDOWS - 1})
                 >= greatest(cast(floor((ms - {RANGE_EPOCH0} - {RANGE_LEN_MS}) / {RANGE_STEP_MS}) as int) + 1, 0)
          then sequence(
                 greatest(cast(floor((ms - {RANGE_EPOCH0} - {RANGE_LEN_MS}) / {RANGE_STEP_MS}) as int) + 1, 0),
                 least(cast(floor((ms - {RANGE_EPOCH0}) / {RANGE_STEP_MS}) as int),
                       {N_RANGE_WINDOWS - 1}))
          else cast(array() as array<int>) end) as w""",
    )
    return (
        cand.join(F.broadcast(win), "w")
        .filter((F.col("ms") >= F.col("start_ms")) & (F.col("ms") < F.col("end_ms")))
        .select("event_id", "w")
    )


RANGE_SQL = f"""
WITH win AS (
  SELECT range::int AS w,
         {RANGE_EPOCH0} + range * {RANGE_STEP_MS} AS start_ms,
         {RANGE_EPOCH0} + range * {RANGE_STEP_MS} + {RANGE_LEN_MS} AS end_ms
  FROM range(0, {N_RANGE_WINDOWS})
),
ev AS (SELECT event_id, epoch_ms(ts) AS ms FROM events)
SELECT event_id::bigint AS event_id, w
FROM ev JOIN win ON ms >= start_ms AND ms < end_ms
"""


# -- hierarchical time rollup (hypertable continuous-aggregate pattern) -----
# Third custom-op archetype: multi-resolution aggregates where each COARSE
# level derives from the next finer level, not from raw — the raw table is
# scanned exactly once and the hour->day rollup re-aggregates the (tiny)
# hour frame. At 100 TB that is the difference between one raw pass and one
# per resolution; the hour frame is checkpointed so the union's level-1
# branch and the day rollup read one materialization. Counts are exact
# int64; value sums are rounded at EACH level in both engines so the
# float-summation-order noise a distributed sum accumulates never reaches
# the compared digits.
ROLLUP_HOUR_MS = 3_600_000


def x_rollup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", _event_ms().alias("ms"), "value"
    )
    hour = F.floor(F.col("ms") / ROLLUP_HOUR_MS).cast("long")
    l1 = (
        ev.groupBy("event_type", hour.alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )
    l2 = (
        l1.groupBy("event_type", F.floor(F.col("bucket") / 24).cast("long").alias("bucket"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
        )
    )
    return (
        l1.withColumn("level", F.lit("hour"))
        .unionByName(l2.withColumn("level", F.lit("day")))
        .select("level", "event_type", "bucket", "n_events", "sum_value")
    )


ROLLUP_SQL = f"""
WITH l1 AS (
  SELECT event_type, (epoch_ms(ts) // {ROLLUP_HOUR_MS})::bigint AS bucket,
         count(*)::bigint AS n_events,
         round(sum(value), 4) AS sum_value
  FROM events GROUP BY 1, 2
),
l2 AS (
  SELECT event_type, (bucket // 24)::bigint AS bucket,
         sum(n_events)::bigint AS n_events,
         round(sum(sum_value), 4) AS sum_value
  FROM l1 GROUP BY 1, 2
)
SELECT 'hour' AS level, event_type, bucket, n_events, sum_value FROM l1
UNION ALL
SELECT 'day' AS level, event_type, bucket, n_events, sum_value FROM l2
"""


# -- Q3-style join+agg+topk headline (S3+J+G+O composition) -----------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > "1998-01-01")
    )
    return (
        joined.groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


Q3_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)),2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 20
"""


# -- Q5-style multi-join with broadcast dims (J3 broadcast strategy) --------
def q5_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    # nation/region are broadcast (small dims) — same strategy the engine
    # uses for robots rules
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)),2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# -- Q1-style pricing summary (the canonical wide-agg scan: map-side partial
# aggregation over the fact table, no joins — G2/G3 at relational scale) ----
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*)::bigint AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- flagship: one crawl-round schedule composed of J1+O1+P6 over orders ----
def crawl_round_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier = open orders (priority = o_totalprice, host = o_custkey);
    seen = fulfilled orders' keys; page = top-200; per-host budget = 2.
    Exactly the engine's round steps 2-5 (engine/round.py) on testdata."""
    orders = load(spark, sf_dir, "orders")
    frontier = orders.select(
        F.col("o_orderkey").alias("url_id"),
        F.col("o_custkey").alias("host"),
        F.col("o_totalprice").alias("priority"),
        "o_orderstatus",
    )
    seen = frontier.filter(F.col("o_orderstatus") == "F").select("url_id")
    alive = frontier.filter(F.col("o_orderstatus") != "F").join(seen, "url_id", "left_anti")
    page = alive.orderBy(F.desc("priority"), F.asc("url_id")).limit(200)
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url_id"))
    sched = page.withColumn("hrank", F.row_number().over(w_host)).filter(F.col("hrank") <= 2)
    # partition-less window is safe: input is the 200-row page after the
    # per-host cap, and the global seq is the round's total attempt order
    w_all = Window.orderBy(F.desc("priority"), F.asc("url_id"))
    return sched.select(
        "url_id", "host", "priority", F.row_number().over(w_all).alias("seq")
    )


CRAWL_ROUND_SQL = """
WITH frontier AS (
  SELECT o_orderkey AS url_id, o_custkey AS host, o_totalprice AS priority
  FROM orders WHERE o_orderstatus <> 'F'
), page AS (
  SELECT * FROM frontier ORDER BY priority DESC, url_id ASC LIMIT 200
), sched AS (
  SELECT url_id, host, priority,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url_id ASC) AS hrank
  FROM page
)
SELECT url_id, host, priority,
       ROW_NUMBER() OVER (ORDER BY priority DESC, url_id ASC) AS seq
FROM sched WHERE hrank <= 2
"""


QUERIES = {
    "j1_scheduler_anti_join": (j1_scheduler_anti_join, J1_SQL),
    "j2_discovery_dedup": (j2_discovery_dedup, J2_SQL),
    "o1_priority_topk": (o1_priority_topk, O1_SQL),
    "p6_politeness_budget": (p6_politeness_budget, P6_SQL),
    # f5_priority_range / g1_min_probe: RETIRED from the 50-slot gated
    # catalog in round 5 (trivial filter / scalar agg, both subsumed by
    # o1's pushdown+TakeOrdered coverage) to gate the round-4 flagships
    # (ann_pq/ann_ivfpq/text_substring_dedup/text_dsir); still DuckDB-twin
    # verified in tests/test_ungated_oracles.py (the round-3 procedure).
    "g3_lineage_rollup": (g3_lineage_rollup, G3_SQL),
    "g6_conditional_mix": (g6_conditional_mix, G6_SQL),
    "g7_collect_set": (g7_collect_set, G7_SQL),
    "u1_union_dedup": (u1_union_dedup, U1_SQL),
    "x1_link_extract": (x1_link_extract, X1_SQL),
    "x2_suffix_expand": (x2_suffix_expand, X2_SQL),
    "x15_json_access": (x15_json_access, X15_SQL),
    "w1_events_tumbling": (w1_events_tumbling, W1_SQL),
    "w2_events_sessionize": (w2_events_sessionize, W2_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q5_join_chain": (q5_join_chain, Q5_SQL),
    "crawl_round_schedule": (crawl_round_schedule, CRAWL_ROUND_SQL),
}


# -- recrawl scheduling by estimated change rate (freshness policy) ---------
# The crawl engine decides WHAT to fetch next (frontier priority); a real
# crawler also decides WHEN to come BACK. Cho & Garcia-Molina (TOIT 2003)
# estimate a page's Poisson change rate from n revisit observations of
# which x saw a changed page — lambda ~ -ln((n - x + 1/2)/(n + 1/2)) per
# inter-visit interval, their bias-corrected estimator — and schedule the
# next fetch inversely to it. The events table plays the fetch-observation
# log (user_id = page, ts = visit, event_type = 'click' marks "content
# changed"; swap in the real verify-stage phash-diff verdict in
# production). Integer-exact twin math (the BM25/surprisal discipline, no
# float ln anywhere): the log ratio is the DIFFERENCE OF MILLI-BITS
#   rate_mb = mlog2(2n + 1) - mlog2(2n - 2x + 1)   [= log2(1/r), x0.5 -> x2]
# which is 0 exactly when x = 0 (never seen changing -> park the page) and
# grows with the change fraction; ln-vs-log2 is a constant factor absorbed
# into the interval scale. Mean inter-visit gap is span/(n-1) ~ span/n;
# the next-visit interval is
#   interval_ms = (span_ms * 1000) div (n * rate_mb + 1)
# (+1 parks never-changing pages at the span*1000 horizon instead of
# dividing by zero). Scale shape: ONE events scan, ONE page-keyed exchange
# whose map-side partial agg collapses each page's history before the
# shuffle — at 10^10 pages x 10^2 visits the shuffle carries one row per
# page, and the schedule joins back to the frontier exactly like
# host_rank's priority term. Overflow: span_ms * 1000 < 2^63 for any span
# under ~292 years; mlog2 args are >= 1 by construction.
def crawl_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crawl_recrawl_schedule_frame(load(spark, sf_dir, "events"))


def crawl_recrawl_schedule_frame(events: DataFrame) -> DataFrame:
    from .common import spark_mlog2

    obs = (
        events
        .select(
            F.col("user_id").alias("page_id"),
            _event_ms().alias("ms"),
            (F.col("event_type") == "click").cast("long").alias("chg"),
        )
        .groupBy("page_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("chg").cast("long").alias("n_changed"),
            (F.max("ms") - F.min("ms")).cast("long").alias("span_ms"),
        )
    )
    rate = (
        f"({spark_mlog2('2 * n_obs + 1')} "
        f"- {spark_mlog2('2 * n_obs - 2 * n_changed + 1')})"
    )
    return obs.withColumn("rate_mb", F.expr(rate).cast("long")).withColumn(
        "interval_ms",
        F.expr("(span_ms * 1000) div (n_obs * rate_mb + 1)").cast("long"),
    )


def _recrawl_sql() -> str:
    from .common import duck_mlog2

    rate = (
        f"({duck_mlog2('2 * n_obs + 1')} "
        f"- {duck_mlog2('2 * n_obs - 2 * n_changed + 1')})"
    )
    return f"""
WITH obs AS (
  SELECT user_id AS page_id, count(*)::bigint AS n_obs,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS n_changed,
         (max(epoch_ms(ts)) - min(epoch_ms(ts)))::bigint AS span_ms
  FROM events GROUP BY user_id
),
rated AS (SELECT *, ({rate})::bigint AS rate_mb FROM obs)
SELECT page_id, n_obs, n_changed, span_ms, rate_mb,
       ((span_ms * 1000) // (n_obs * rate_mb + 1))::bigint AS interval_ms
FROM rated
"""


RECRAWL_SQL = _recrawl_sql()
