"""Text analysis for training-data pipelines (SURVEY §2C NS rows).

Language-ID, quality scoring, token counting and document
fingerprinting over the `documents` table — all pure
pyspark.sql.functions plans (JVM-side, whole-stage codegen; no Python
in the hot path), each with an exact DuckDB oracle.

Cross-engine hash parity trick: a token's 64-bit-ish hash is the
first 15 hex digits of md5 (identical in Spark and DuckDB), parsed as
an integer — Spark ``conv(hex,16,10)``, DuckDB ``CAST('0x'||hex AS
BIGINT)``. 15 hex digits = 60 bits, safely inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register

# tiny per-language function-word lists for the n-gram/stopword
# language-ID heuristic (public common-word lists)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

_MOD = 1_000_000_007


def _tok_hash_spark(col):
    """Deterministic 60-bit token hash (md5-prefix), Spark side."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def tok_hash_duck(expr: str) -> str:
    """Same hash, DuckDB side."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


@register(
    "text_stats_quality",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
           CAST(ROUND(CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS n_stopwords,
           CAST(ROUND(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                / len(string_split(text, ' ')), 6) AS DOUBLE) AS stopword_ratio,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                 AND CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) BETWEEN 3 AND 8
                THEN 1 ELSE 0 END AS quality_pass
    FROM documents
    ORDER BY doc_id
    """,
    group="text",
    doc="Quality scoring: length/token/stopword-ratio filters — the "
    "standard pre-training heuristic filter set.",
)
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"]))
    n_toks = F.size(toks).cast("bigint")
    chars = F.length("text").cast("bigint")
    avg_tok = (chars.cast("double") / n_toks).cast("double")
    return d.select(
        "doc_id",
        chars.alias("chars"),
        n_toks.alias("tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.size(stop).cast("bigint").alias("n_stopwords"),
        F.round(F.size(stop).cast("double") / n_toks, 6).alias("stopword_ratio"),
        F.when(n_toks.between(20, 80) & avg_tok.between(3, 8), 1).otherwise(0).alias(
            "quality_pass"
        ),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    """
    WITH scores AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to'))) AS s_en,
             len(list_filter(string_split(text, ' '), t -> t IN ('le','la','et','les','des'))) AS s_fr,
             len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los','que','de'))) AS s_es,
             len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und','das','ein'))) AS s_de
      FROM documents)
    SELECT doc_id,
           CASE GREATEST(s_en, s_fr, s_es, s_de)
                WHEN s_en THEN 'en' WHEN s_fr THEN 'fr'
                WHEN s_es THEN 'es' ELSE 'de' END AS pred_lang,
           CAST(GREATEST(s_en, s_fr, s_es, s_de) AS BIGINT) AS marker_hits
    FROM scores
    ORDER BY doc_id
    """,
    group="text",
    doc="Stopword-overlap language ID (n-gram heuristic family); "
    "ties resolve in fixed language order en>fr>es>de.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    def _marker_count(ws):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = d.select(
        "doc_id",
        *[
            _marker_count(ws).alias(f"s_{lang}")
            for lang, ws in LANG_MARKERS.items()
            if lang != "zh"
        ],
    )
    best = F.greatest("s_en", "s_fr", "s_es", "s_de")
    pred = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_es") == best, "es")
        .otherwise("de")
    )
    return scores.select(
        "doc_id", pred.alias("pred_lang"), best.cast("bigint").alias("marker_hits")
    ).orderBy("doc_id")


@register(
    "text_token_count_bpe",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vowel_runs
    FROM documents
    ORDER BY doc_id
    """,
    group="text",
    doc="Token counting: whitespace + BPE-ish regex segmentation "
    "(letters / digits / single punctuation).",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[aeiou]+', 0)"))
        .cast("bigint")
        .alias("vowel_runs"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> {tok_hash_duck('t')} % {_MOD})),
             (acc, h) -> (acc * 31 + h) % {_MOD}) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    group="text",
    doc="Order-sensitive document fingerprint: polynomial rolling hash "
    "over md5-derived token hashes mod 1e9+7 — exact integer "
    "arithmetic, bit-identical across engines.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # one fused exchange does double duty: RANGE-partitioning on doc_id
    # spreads the per-token md5 fold across every core (a small
    # compressed parquet file arrives as ONE input split — same fix as
    # dedup.shingled_docs), and because range partitions are ordered,
    # a partition-LOCAL sort after the fold yields the totally-ordered
    # result the determinism contract requires (FIXTURES.md) without a
    # second, global sort exchange of the folded rows
    par = spark.sparkContext.defaultParallelism
    d = d.repartitionByRange(par, "doc_id")
    tok_hashes = F.transform(F.split("text", " "), lambda t: _tok_hash_spark(t) % _MOD)
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % _MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint")).sortWithinPartitions("doc_id")
