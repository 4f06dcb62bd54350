"""Deduplication operators over `documents` (training-data pipeline ops):
exact hash dedup, MinHash+LSH banding, SimHash, and n-gram Jaccard
verification on LSH candidates. All computed with JVM built-ins (explode +
groupBy + joins); DuckDB oracle twins compute the identical integer
arithmetic (token hash = md5-prefix bigint, verified cross-engine in
operators/common.py).

Scale notes: shingling explodes to (doc, shingle-hash) rows — at 100 TB this
is the standard shuffle-heavy stage; minhash aggregation is a map-side
partial min per hash function, the band self-join is an equi-join on
(band_no, band_hash) which Spark hash-partitions, and only bucket
collisions (tiny fraction) reach the exact-Jaccard verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import DUCK_TOKENS, POLY_MOD, SPARK_TOKENS, duck_h32, load, spark_h32

# Default signature size / banding for the small test corpora (the DuckDB
# oracle SQL is generated from the SAME parameters, so both engines move
# together). Recall at threshold t for b bands of r rows is 1-(1-t^r)^b.
# Production sizing at 100 TB comes from `lsh_params_for(corpus_size)`
# below — the pipeline shape (band equi-join, no all-pairs) is unchanged,
# only the two numbers grow; every builder in this module takes
# (n_minhash, n_bands) arguments defaulted from these.
N_MINHASH = 12
N_BANDS = 6  # bands of 2 rows each


def lsh_params_for(corpus_size: int) -> tuple[int, int]:
    """(n_minhash, n_bands) sized to the corpus: bigger corpora need longer
    signatures to keep band-collision false positives (which all pay the
    exact-Jaccard verifier) sub-linear. r = rows/band fixed at 2 keeps the
    jaccard-0.5 recall high (1-(1-0.25)^b); b grows log-ish with size.
    Measured recall at the defaults is recorded in COVERAGE.md."""
    if corpus_size < 10_000:
        return N_MINHASH, N_BANDS  # the test-corpus/oracle defaults
    if corpus_size < 10_000_000:
        return 64, 32
    return 128, 64  # 100 TB tier: 128 hashes, 64 bands x 2 rows


def _ab(i: int) -> tuple[int, int]:
    """Universal-hash parameters for minhash i (small a keeps a*h < 2^38,
    safe for DuckDB's checked bigint arithmetic)."""
    return 2 * i + 1, (7919 * i * i + 104729) % POLY_MOD


# -- shared shingle builders ------------------------------------------------
# 3-token shingles, hashed to a 32-bit bigint
SPARK_SHINGLES = (
    f"case when size({SPARK_TOKENS}) >= 3 then "
    f"transform(sequence(1, size({SPARK_TOKENS}) - 2), "
    f"i -> concat_ws(' ', {SPARK_TOKENS}[i-1], {SPARK_TOKENS}[i], {SPARK_TOKENS}[i+1])) "
    f"else cast(array() as array<string>) end"
)
DUCK_SHINGLES = (
    f"list_transform(range(1, greatest(len({DUCK_TOKENS}) - 2, 0) + 1), "
    f"i -> {DUCK_TOKENS}[i] || ' ' || {DUCK_TOKENS}[i+1] || ' ' || {DUCK_TOKENS}[i+2])"
)


def _spark_shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h) rows, h = 32-bit hash of each DISTINCT shingle.

    Tokens materialize into a column FIRST: the shingle transform references
    them three times per element, and inlining the tokenizer would evaluate
    the regex split repeatedly per row."""
    docs = load(spark, sf_dir, "documents")
    return shingle_rows_from_toks(
        docs.select("doc_id", F.expr(SPARK_TOKENS).alias("toks"))
    )


def shingle_rows_from_toks(toks: DataFrame) -> DataFrame:
    """The shingle explode over a pre-tokenized (doc_id, toks) frame — lets
    pipeline_clean_corpus derive shingles from its shared tokenize
    checkpoint instead of re-scanning documents."""
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(toks) >= 3 then "
                "transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) "
                "else cast(array() as array<string>) end"
            )
        ).alias("shingle"),
    )
    return shingles.select("doc_id", F.expr(spark_h32("shingle")).alias("h")).distinct()


DUCK_SHINGLE_ROWS = f"""
  SELECT DISTINCT doc_id, {duck_h32('shingle')} AS h FROM (
    SELECT doc_id, unnest({DUCK_SHINGLES}) AS shingle FROM documents) raw_shingles
"""


# -- exact dedup (hash-groupBy), the K4 (repo_id,path) upsert analog --------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact_frame(load(spark, sf_dir, "documents"))


def dedup_exact_frame(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("rep_doc_id"))
    )


EXACT_SQL = """
SELECT md5(text) AS text_hash, count(*)::bigint AS n_copies,
       min(doc_id)::bigint AS rep_doc_id
FROM documents GROUP BY 1
"""


# -- MinHash signatures + LSH band buckets -> candidate pairs ---------------
def _minhash_df(sh: DataFrame, n_minhash: int = N_MINHASH) -> DataFrame:
    aggs = []
    for i in range(n_minhash):
        a, b = _ab(i)
        aggs.append(F.min((F.col("h") * a + b) % POLY_MOD).alias(f"mh{i}"))
    return sh.groupBy("doc_id").agg(*aggs)


def _bands_df(
    sh: DataFrame, n_minhash: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    mh = _minhash_df(sh, n_minhash)
    stack_args = ", ".join(
        f"{j}, (mh{2 * j} * 31 + mh{2 * j + 1}) % {POLY_MOD}" for j in range(n_bands)
    )
    return mh.select(
        "doc_id", F.expr(f"stack({n_bands}, {stack_args}) as (band_no, band_hash)")
    )


def _pairs_df(
    sh: DataFrame, n_minhash: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    bands = _bands_df(sh, n_minhash, n_bands)
    left = bands.select(
        F.col("doc_id").alias("doc_a"), "band_no", "band_hash"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), "band_no", "band_hash"
    )
    return (
        left.join(right, ["band_no", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_minhash_lsh(
    spark: SparkSession,
    sf_dir: str,
    n_minhash: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    return _pairs_df(_spark_shingle_rows(spark, sf_dir), n_minhash, n_bands)


def _duck_minhash_cte(n_minhash: int = N_MINHASH, n_bands: int = N_BANDS) -> str:
    mins = ", ".join(
        f"min((h * {_ab(i)[0]} + {_ab(i)[1]}) % {POLY_MOD}) AS mh{i}"
        for i in range(n_minhash)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_no, (mh{2 * j} * 31 + mh{2 * j + 1}) % {POLY_MOD}"
        f" AS band_hash FROM minhash"
        for j in range(n_bands)
    )
    return f"""
WITH shingles AS ({DUCK_SHINGLE_ROWS}),
minhash AS (SELECT doc_id, {mins} FROM shingles GROUP BY doc_id),
bands AS ({bands})
"""


MINHASH_LSH_SQL = (
    _duck_minhash_cte()
    + """
SELECT DISTINCT a.doc_id::bigint AS doc_a, b.doc_id::bigint AS doc_b
FROM bands a JOIN bands b
  ON a.band_no = b.band_no AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""
)


# -- n-gram Jaccard verification on the LSH candidates ----------------------
def _overlap_counts(cand: DataFrame, sh_a: DataFrame, sh_b: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) for the given candidate pairs,
    with doc_a shingles drawn from sh_a and doc_b shingles from sh_b — the
    ONE implementation of the intersection-count + size-join shape, shared
    by the whole-corpus verifier (_pair_overlap) and the incremental gate
    so the integer facts (and any future fix to them) cannot drift between
    callers."""
    n_a = sh_a.groupBy("doc_id").agg(F.count("*").alias("n_a"))
    n_b = sh_b.groupBy("doc_id").agg(F.count("*").alias("n_b"))
    inter = (
        cand.join(sh_a.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh_b.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(n_a.select(F.col("doc_id").alias("doc_a"), "n_a"), "doc_a")
        .join(n_b.select(F.col("doc_id").alias("doc_b"), "n_b"), "doc_b")
    )


def _pair_overlap(sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) for every LSH candidate pair — the
    integer facts both the Jaccard verifier and the group builder derive
    from (jaccard = n_inter / (n_a + n_b - n_inter))."""
    return _overlap_counts(_pairs_df(sh), sh, sh)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One tokenize+shingle scan feeds BOTH the minhash/band candidate path
    and the sizes/intersection verifier: the shingle rows are materialized
    once via localCheckpoint (eager) — unlike persist(), the blocks are
    released by the ContextCleaner when the plan is dropped, so no cache
    entry leaks across the query catalog."""
    sh = _spark_shingle_rows(spark, sf_dir).localCheckpoint(eager=True)
    return _pair_overlap(sh).select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
    )


_DUCK_PAIR_CTES = """
, pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.doc_a
  JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.h = sa.h
  GROUP BY p.doc_a, p.doc_b)
"""

NGRAM_JACCARD_SQL = (
    _duck_minhash_cte()
    + _DUCK_PAIR_CTES
    + """
SELECT i.doc_a::bigint AS doc_a, i.doc_b::bigint AS doc_b,
       round(i.n_inter / (za.n_sh + zb.n_sh - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
"""
)


# -- near-dup GROUPS: connected components over the verified pair graph -----
# In-core finish threshold: an edge list at or below this collects to the
# driver and resolves with union-find (the hierarchical-CC endgame every
# production pipeline uses once the contracted graph fits one machine —
# the same "small enough for one node" criterion as a broadcast join).
# 10^6 edges ~ 16 MB on the driver; the verified near-dup subgraph is a
# few percent of the corpus by construction, but at 100 TB it can exceed
# this, and then the distributed log-round loop below takes over.
LOCAL_CC_MAX_EDGES = 1_000_000


def _local_components(doc_a, doc_b) -> dict[int, int]:
    """Union-find (path-halving) over two parallel int arrays of directed
    edges -> {vertex: component-min-id}. Bit-exact twin of the distributed
    fixpoint: both emit the component's minimum vertex id. Takes arrays,
    not Rows — at the in-core threshold (2M directed edges) Row objects
    cost ~100-150 B each on the driver where the Arrow-transferred int64
    columns cost 16 B/edge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(doc_a.tolist(), doc_b.tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # roots are already the component min (unions always keep the smaller)
    return {v: find(v) for v in parent}


def min_label_components(
    edges: DataFrame,
    max_iters: int = 16,
    local_max_edges: int = LOCAL_CC_MAX_EDGES,
) -> DataFrame:
    """Connected components over an undirected edge list (columns doc_a,
    doc_b) by min-label propagation -> (doc_id, label), covering ONLY the
    edge-vertex set (callers coalesce singletons). The shared iterative
    kernel of the text near-dup groups and the image phash groups
    (multimodal.mm_phash_groups): one equi-join + one groupBy-min per
    round, labels localCheckpoint-ed to truncate iterative lineage, with
    an any-change early exit.

    Two-level execution: the edge plan is materialized ONCE (checkpoint);
    if the edge count is within `local_max_edges` the components resolve
    in-core via union-find — one collect instead of O(log d) iteration
    jobs (at sf0.1 this is the difference between ~4s of driver-loop
    rounds and ~0.3s). Beyond the threshold the distributed loop runs;
    pass local_max_edges=0 to force it (tests do).

    Round economy (two levers, VERDICT r3 item 6):
    * ONE driver job per iteration — the changed count rides the
      checkpoint job as an observed metric (CollectMetrics below the
      projection that drops _chg) instead of a second filter/limit/count
      job over the checkpointed frame.
    * O(log diameter) rounds, not O(diameter) — each round's join reads
      the adjacency AUGMENTED with the current label forest's edges
      (v <-> label(v)), so a vertex also pulls label(label(v)) (pointer
      jumping) and a root is pulled down by its children (the
      large-star/small-star contraction, Kiveris et al., expressed as
      edge augmentation over the SAME join+groupBy shape). Label edges
      stay within a component, so the fixpoint — and therefore the
      output — is identical to plain one-hop propagation: no-change means
      label(v) <= label(u) across every ORIGINAL edge in both directions,
      hence labels are component-constant = the component min. Measured
      on the sf0.1 phash graph (diameter ~15): 16 rounds -> 12 (the
      graph's minima still walk the chains; the forest edges shortcut
      the settled regions). The augmentation adds 2V rows to an E-row
      join input per round."""
    from pyspark.sql import Observation

    sym = edges.unionByName(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=True)
    if sym.count() <= 2 * local_max_edges:  # sym carries both directions
        import pandas as pd

        pdf = sym.toPandas()  # Arrow transfer: 16 B/edge, no Row boxing
        comp = _local_components(
            pdf["doc_a"].to_numpy(), pdf["doc_b"].to_numpy()
        )
        spark = sym.sparkSession
        if not comp:
            return spark.createDataFrame([], "doc_id long, label long")
        out = pd.DataFrame(sorted(comp.items()), columns=["doc_id", "label"])
        return spark.createDataFrame(out, "doc_id long, label long")
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # labels is a checkpoint leaf — the three references below read
        # cached blocks, no recompute
        adj = sym.unionByName(
            labels.select(F.col("label").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        ).unionByName(
            labels.select(F.col("doc_id").alias("doc_a"), F.col("label").alias("doc_b"))
        )
        nbr = (
            adj.join(labels.select(F.col("doc_id").alias("doc_a"), "label"), "doc_a")
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_label = F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label")))
        obs = Observation()
        labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("_chg"),
            )
            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("n_chg"))
            .drop("_chg")
            .localCheckpoint(eager=True)
        )
        # obs.get blocks only until the checkpoint job's metrics arrive —
        # no extra job; an all-null sum (empty frame) means no change
        if not (obs.get["n_chg"] or 0):
            break
    else:
        # max_iters exhausted with changes still pending: the labels are
        # NOT a fixpoint — emitting them would silently split components
        # (and diverge from the oracles' unbounded transitive closures).
        # Fail loudly; with the label-forest augmentation rounds grow
        # ~log(diameter), so 16 covers diameters far beyond any real
        # near-dup graph — hitting this means something is wrong.
        raise RuntimeError(
            f"min_label_components did not converge in {max_iters} "
            "iterations — component diameter exceeds the iteration budget"
        )
    return labels


def dedup_groups(spark: SparkSession, sf_dir: str, max_iters: int = 16) -> DataFrame:
    """Duplicate clusters + representative pick: the step that turns
    near-dup PAIRS into an actual dedup decision. Edges are the LSH
    candidates verified at jaccard >= 0.5 — compared in INTEGER form
    (3*n_inter >= n_a + n_b  <=>  n_inter/(n_a+n_b-n_inter) >= 1/2) so both
    engines agree bit-exactly with no float boundary. Components are found
    by min-label propagation: label(v) <- min(label(v), min of neighbor
    labels), iterated to fixpoint. Each iteration is one equi-join + one
    groupBy-min; the labels frame is localCheckpoint-ed per iteration to
    truncate the iterative lineage (the standard Spark iterative-algorithm
    requirement). Convergence takes O(component diameter) rounds — LSH
    near-dup clusters are near-cliques (each band links most members
    directly), so 2-3 rounds in practice; for adversarial long-chain graphs
    the large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce") bounds rounds at O(log^2 n) with the same
    join-shape per round. Every document gets a group (singletons are their
    own representative), so the output is a full dedup verdict over the
    corpus: keep rows where is_rep.

    Scale shape: the iteration runs ONLY over the edge-vertex set — a
    document with no near-dup edge is its own singleton group and can never
    change label, so it joins the result once at the end (coalesce to
    doc_id) instead of riding every round. At 100 TB the per-iteration
    state is proportional to the duplicate subgraph (typically a few percent
    of the corpus), not the corpus."""
    sh = _spark_shingle_rows(spark, sf_dir).localCheckpoint(eager=True)
    return dedup_groups_from_shingles(
        sh, load(spark, sf_dir, "documents").select("doc_id"), max_iters
    )


def dedup_groups_from_shingles(
    sh: DataFrame, all_docs: DataFrame, max_iters: int = 16
) -> DataFrame:
    """The group builder over a MATERIALIZED shingle frame plus the corpus
    doc_id universe — pipeline_clean_corpus feeds both from its shared
    tokenize checkpoint."""
    edges = (
        _pair_overlap(sh)
        .filter(3 * F.col("n_inter") >= F.col("n_a") + F.col("n_b"))
        .select("doc_a", "doc_b")
    )
    labels = min_label_components(edges, max_iters)
    # group sizes come from the SMALL labels frame (a singleton's size is 1
    # by construction) — no corpus-wide groupBy shuffle anywhere
    sized = labels.join(
        labels.groupBy("label").agg(F.count("*").alias("group_size")), "label"
    )
    return (
        all_docs.select("doc_id")
        .join(sized, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("group_id"),
            F.coalesce("group_size", F.lit(1)).alias("group_size"),
            (F.col("doc_id") == F.coalesce("label", F.col("doc_id"))).alias("is_rep"),
        )
    )


GROUPS_SQL = (
    _duck_minhash_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    + _DUCK_PAIR_CTES
    + """
, edges AS (
  SELECT i.doc_a AS a, i.doc_b AS b
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
  WHERE 3 * i.n_inter >= za.n_sh + zb.n_sh
), sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
reach(v, r) AS (
  SELECT doc_id AS v, doc_id AS r FROM documents
  UNION
  SELECT s.b AS v, reach.r FROM reach JOIN sym s ON s.a = reach.v
), grp AS (SELECT v AS doc_id, min(r) AS group_id FROM reach GROUP BY v),
gs AS (SELECT group_id, count(*) AS group_size FROM grp GROUP BY group_id)
SELECT g.doc_id::bigint AS doc_id, g.group_id::bigint AS group_id,
       gs.group_size::bigint AS group_size,
       (g.doc_id = g.group_id) AS is_rep
FROM grp g JOIN gs USING (group_id)
"""
)


# -- SimHash (32-bit, token-hash bit votes) ---------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("tok")).select(
        "doc_id", F.expr(spark_h32("tok")).alias("h")
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = " + ".join(f"(case when v{b} > 0 then cast({1 << b} as bigint) else 0 end)" for b in range(32))
    return agg.select("doc_id", F.expr(sim).alias("simhash"))


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(32)
    )
    sim = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b}::bigint ELSE 0 END)" for b in range(32))
    return f"""
WITH tok AS (
  SELECT doc_id, {duck_h32('t')} AS h FROM (
    SELECT doc_id, unnest({DUCK_TOKENS}) AS t FROM documents) raw_toks
), agg AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
SELECT doc_id, ({sim})::bigint AS simhash FROM agg
"""


# -- incremental near-dup gate over a persisted band index ------------------
def dedup_incremental_frames(
    batch_docs: DataFrame,
    batch_sh: DataFrame,
    index_bands: DataFrame,
    index_sh: DataFrame,
    n_minhash: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Admission-time near-dup verdict for an INCOMING BATCH against an
    already-indexed corpus, in O(batch) — the production shape where
    re-running LSH over the whole corpus per ingest (what dedup_groups
    does) is not an option.

    Inputs (production): `index_bands` (doc_id, band_no, band_hash) and
    `index_sh` (doc_id, h) are PERSISTED tables maintained by appending
    each admitted batch's bands/shingles — nothing here recomputes them.
    `batch_docs` is the batch's doc_id universe (docs with <3 tokens have
    no shingles and are trivially novel); `batch_sh` its shingle rows.

    Output, one row per batch doc: is_novel (no verified near-dup),
    dup_of = the MIN-doc_id verified neighbor among index docs and
    SMALLER-id batch docs (-1 when novel), jaccard of that neighbor
    (0.0 when novel). The greedy min-id rule is deterministic and
    SQL-expressible; full transitive grouping remains dedup_groups' job
    at compaction time — this operator is the admission decision.

    Scale shape: the batch is banded in O(batch); candidates come from
    TWO equi-joins — batch bands x index bands (persist the index
    bucketed by band_hash so only the batch side shuffles) and batch x
    batch for intra-batch dups. Verification's shuffles and compute are
    O(batch + matched): only matched neighbors' shingle rows survive the
    semi-join on index_sh — bucket the persisted shingle store by doc_id
    so that join also prunes its SCAN; without bucketing the scan of
    index_sh is the one corpus-sized IO (pruned to matched docs before
    any shuffle).

    Integrity contract: index_bands and index_sh must be appended in ONE
    transactional commit (the StateStore manifest pattern), and doc_ids
    are unique — a batch doc_id found in the index IS a prior append of
    this batch. A re-run of an already-appended batch cannot corrupt
    verdicts: the index's copies of the current batch (self-pairs and
    batch siblings alike) are excluded from cross candidates so replay
    verdicts equal the clean run's, and duplicated shingle rows collapse
    in the distinct. A neighbor that has band rows but NO shingle rows
    (torn store) fails the job loudly instead of admitting a true
    near-dup as novel."""
    bb = _bands_df(batch_sh, n_minhash, n_bands)
    cross = (
        bb.select(F.col("doc_id").alias("doc_a"), "band_no", "band_hash")
        .join(
            index_bands.select(F.col("doc_id").alias("doc_b"), "band_no", "band_hash"),
            ["band_no", "band_hash"],
        )
        .select("doc_a", "doc_b")
        # re-run of an already-appended batch: the index's copies of the
        # CURRENT batch (self-pairs AND batch siblings) must not count as
        # index neighbors — a sibling reached via the index copy would
        # shadow internal's smaller-id rule and flip the group's smallest
        # doc from novel to dup on replay. Batch-vs-batch pairs are
        # internal's job exclusively.
        .join(
            F.broadcast(batch_docs.select(F.col("doc_id").alias("doc_b"))),
            "doc_b",
            "left_anti",
        )
    )
    internal = (
        bb.select(F.col("doc_id").alias("doc_a"), "band_no", "band_hash")
        .join(bb.select(F.col("doc_id").alias("doc_b"), "band_no", "band_hash"),
              ["band_no", "band_hash"])
        .filter(F.col("doc_b") < F.col("doc_a"))
        .select("doc_a", "doc_b")
    )
    # one distinct over the union: if a doc is in BOTH sides (re-run), a
    # pair seen by cross and internal must still count its shingles once.
    # Materialized once — nbr_ids, the intersection join, and the guard
    # all consume it (and the band self-joins behind it are not free).
    cand = cross.unionByName(internal).distinct().localCheckpoint(eager=True)
    nbr_ids = cand.select(F.col("doc_b").alias("doc_id")).distinct()
    # semi-join each store BEFORE the union (lets a doc_id-bucketed
    # index_sh prune); distinct collapses rows duplicated by a re-run.
    # Materialized once for the same reason: n_b, the intersection join,
    # and the torn-store guard each read it.
    nbr_sh = (
        index_sh.join(nbr_ids, "doc_id")
        .unionByName(batch_sh.join(nbr_ids, "doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # torn-store guard, in-plan so it fires when the verdict executes: a
    # consistent store cannot have a banded doc without shingle rows
    # (bands derive from shingles), so any such neighbor is corruption
    n_missing = nbr_ids.join(
        nbr_sh.select("doc_id").distinct(), "doc_id", "left_anti"
    ).agg(F.count("*").alias("_n_missing"))
    verified = (
        _overlap_counts(cand, batch_sh, nbr_sh)
        .filter(3 * F.col("n_inter") >= F.col("n_a") + F.col("n_b"))
    )
    # min-doc_b neighbor per batch doc; doc_b is unique per pair, so the
    # struct min is deterministic and carries that neighbor's counts along
    best = verified.groupBy("doc_a").agg(
        F.min(F.struct("doc_b", "n_inter", "n_a", "n_b")).alias("m")
    )
    return (
        batch_docs.select("doc_id")
        .join(best.select(F.col("doc_a").alias("doc_id"), "m"), "doc_id", "left")
        .crossJoin(F.broadcast(n_missing))  # 1-row: carries the guard
        .filter(F.assert_true(
            F.col("_n_missing") == 0,
            F.lit("dedup_incremental: index_bands has docs with no shingle "
                  "rows in index_sh — the index store is torn; restore or "
                  "rebuild before admitting batches"),
        ).isNull())
        .select(
            "doc_id",
            F.col("m").isNull().alias("is_novel"),
            F.coalesce(F.col("m.doc_b"), F.lit(-1)).alias("dup_of"),
            F.coalesce(
                F.round(
                    F.col("m.n_inter")
                    / (F.col("m.n_a") + F.col("m.n_b") - F.col("m.n_inter")),
                    6,
                ),
                F.lit(0.0),
            ).alias("jaccard"),
        )
    )


def dedup_incremental(
    spark: SparkSession,
    sf_dir: str,
    n_minhash: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """In-corpus stand-in for the incremental gate (same trick as
    text.decontaminate): docs with doc_id % 4 == 0 play the incoming
    batch, the rest the indexed corpus. The stand-in derives the "index"
    bands/shingles from the corpus scan; production passes the persisted
    tables to dedup_incremental_frames. MinHash signatures are per-doc
    (corpus-independent), so a batch/index split computes EXACTLY the
    pairs the full-corpus LSH would emit for pairs touching the batch."""
    docs = load(spark, sf_dir, "documents")
    sh = _spark_shingle_rows(spark, sf_dir).localCheckpoint(eager=True)
    is_batch = F.col("doc_id") % 4 == 0
    batch_sh, index_sh = sh.filter(is_batch), sh.filter(~is_batch)
    return dedup_incremental_frames(
        docs.select("doc_id").filter(is_batch),
        batch_sh,
        _bands_df(index_sh, n_minhash, n_bands),
        index_sh,
        n_minhash,
        n_bands,
    )


INCREMENTAL_SQL = (
    _duck_minhash_cte()
    + """
, bb AS (SELECT * FROM bands WHERE doc_id % 4 = 0),
ib AS (SELECT * FROM bands WHERE doc_id % 4 <> 0),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN ib b ON a.band_no = b.band_no AND a.band_hash = b.band_hash
  UNION
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b
    ON a.band_no = b.band_no AND a.band_hash = b.band_hash
   AND b.doc_id < a.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_a, i.doc_b, i.n_inter, za.n_sh AS n_a, zb.n_sh AS n_b
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
  WHERE 3 * i.n_inter >= za.n_sh + zb.n_sh
),
best AS (
  SELECT doc_a, doc_b, n_inter, n_a, n_b,
         row_number() OVER (PARTITION BY doc_a ORDER BY doc_b) AS rn
  FROM verified
)
SELECT d.doc_id::bigint AS doc_id,
       (b.doc_a IS NULL) AS is_novel,
       coalesce(b.doc_b, -1)::bigint AS dup_of,
       coalesce(round(b.n_inter / (b.n_a + b.n_b - b.n_inter), 6), 0.0)::double AS jaccard
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_a = d.doc_id
WHERE d.doc_id % 4 = 0
"""
)


# -- LSH recall audit (not a gated query: a measurement) --------------------
def lsh_recall(
    spark: SparkSession,
    sf_dir: str,
    n_minhash: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = 0.5,
) -> dict:
    """Fraction of ground-truth near-dup pairs (exact jaccard >= threshold)
    the LSH candidate set catches, at the given signature sizing. Ground
    truth needs no all-pairs scan: a pair with jaccard > 0 shares a shingle,
    so the shingle inverted-index self-join enumerates every candidate and
    the exact intersection/sizes verify the threshold. Recorded per corpus
    in COVERAGE.md (the sizing table `lsh_params_for` is tuned from this)."""
    sh = _spark_shingle_rows(spark, sf_dir).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "h")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .filter(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")) >= threshold
        )
        .select("doc_a", "doc_b")
    ).localCheckpoint(eager=True)
    cands = _pairs_df(sh, n_minhash, n_bands)
    n_truth = truth.count()
    n_caught = truth.join(cands, ["doc_a", "doc_b"], "left_semi").count()
    return {
        "n_truth": n_truth,
        "n_caught": n_caught,
        "n_candidates": cands.count(),
        "recall": round(n_caught / n_truth, 4) if n_truth else 1.0,
    }


QUERIES = {
    "dedup_exact": (dedup_exact, EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, MINHASH_LSH_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_groups": (dedup_groups, GROUPS_SQL),
    "dedup_simhash": (dedup_simhash, _simhash_sql()),
}
