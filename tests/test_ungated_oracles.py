"""Oracle parity for builders that are deliberately NOT catalog slots.

The driver gates at most 50 queries, so folded/retired entries lose their
standalone slot (text_fingerprint's expressions ride text_metrics' scan;
mm_binary_stats' byte-stat semantics are gated through mm_frame_sample and
mm_sample_select) — but the standalone builders keep full DuckDB-twin
verification here, so a regression cannot hide in the fold.
"""

from __future__ import annotations

from crawler_spark.operators.multimodal import (
    AUDIO_FEATURES_SQL,
    BINARY_STATS_SQL,
    QUALITY_SQL,
    mm_audio_features,
    mm_binary_stats,
    mm_quality_filter,
)
from crawler_spark.operators.pipeline import PIPELINE_SQL, pipeline_clean_corpus
from crawler_spark.operators.similarity import ANN_MULTIPROBE_SQL, ann_multiprobe_topk
from crawler_spark.operators.text import (
    DECONTAM_SQL,
    FINGERPRINT_SQL,
    MIXTURE_SQL,
    PACK_SQL,
    PII_SQL,
    REPETITION_SQL,
    STRATIFIED_SQL,
    decontaminate,
    pack_sequences,
    sample_mixture,
    sample_stratified,
    text_fingerprint,
    text_pii_scrub,
    text_repetition,
)
from crawler_spark.oracle_check import compare_one, duck_connect

SF = "/root/testdata/sf0.001"


def test_ungated_builders_match_oracle(spark):
    con = duck_connect(SF)
    for name, fn, sql in [
        ("mm_binary_stats", mm_binary_stats, BINARY_STATS_SQL),
        ("text_fingerprint", text_fingerprint, FINGERPRINT_SQL),
        ("mm_audio_features", mm_audio_features, AUDIO_FEATURES_SQL),
        ("pipeline_clean_corpus", pipeline_clean_corpus, PIPELINE_SQL),
        ("decontaminate", decontaminate, DECONTAM_SQL),
        ("sample_mixture", sample_mixture, MIXTURE_SQL),
        ("pack_sequences", pack_sequences, PACK_SQL),
        ("ann_multiprobe_topk", ann_multiprobe_topk, ANN_MULTIPROBE_SQL),
        ("text_repetition", text_repetition, REPETITION_SQL),
        ("sample_stratified", sample_stratified, STRATIFIED_SQL),
        ("text_pii_scrub", text_pii_scrub, PII_SQL),
        ("mm_quality_filter", mm_quality_filter, QUALITY_SQL),
    ]:
        ok, msg = compare_one(spark, con, name, fn, sql, SF)
        assert ok, (name, msg)
