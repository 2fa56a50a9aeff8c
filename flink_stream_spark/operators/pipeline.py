"""End-to-end corpus curation pipeline (SURVEY §2C NS composition).

The operators the NS rows provide individually — quality scoring,
exact dedup, MinHash-LSH near-dedup — composed in the order a
training-data pipeline runs them over a raw document corpus:

  1. quality gate: 20..80 whitespace tokens, mean token length 3..8
     (text.py::text_stats_quality's quality_pass predicate);
  2. exact dedup: keep the min doc_id per SHA-256 content hash;
  3. near-dedup: MinHash(K=32) → LSH(8×4) candidate pairs among the
     survivors, exact-Jaccard ≥ 0.5 verify, drop the higher doc_id of
     each pair (keep-first policy).

Scale shape: stage 1 is a scan-local filter (pushed to the source),
stage 2 shuffles 32-byte hashes (never document bodies), stage 3 is
the LSH bucket join — no O(n²) stage anywhere, so the composition
inherits the 100 TB posture of its parts. Stage boundaries reuse one
`survivors` frame; Catalyst collapses the shared lineage into a
single scan per consuming stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.dedup import (
    BANDS,
    K_PERM,
    P31,
    ROWS_PER_BAND,
    _SHINGLES_DUCK,
    lsh_candidate_pairs,
    minhash_wide,
    shingled_docs,
)
from flink_stream_spark.operators.registry import register
from flink_stream_spark.operators.text import tok_hash_duck


@register(
    "pipeline_corpus_curation",
    f"""
    WITH quality AS (
      SELECT doc_id, text FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80
        AND CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) BETWEEN 3 AND 8),
    exact_keep AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY sha256(text)),
    survivors AS (
      SELECT q.doc_id, q.text FROM quality q JOIN exact_keep k ON q.doc_id = k.doc_id),
    perms AS (
      SELECT j, 2*j + 1 AS a, (j * 40503) % {P31} AS b
      FROM (SELECT unnest(generate_series(1, {K_PERM})) AS j)),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM survivors),
    hashed AS (
      SELECT DISTINCT doc_id, {tok_hash_duck('shingle')} % {P31} AS h FROM shingled),
    sigs AS (
      SELECT doc_id, j, MIN((a * h + b) % {P31}) AS minhash
      FROM hashed CROSS JOIN perms
      GROUP BY doc_id, j),
    banded AS (
      SELECT doc_id, CAST(FLOOR((j - 1) / {ROWS_PER_BAND}) AS INTEGER) AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS sig
      FROM sigs GROUP BY doc_id, 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    pair_overlap AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
      FROM cand c
        JOIN shingled sa ON sa.doc_id = c.doc_a
        JOIN shingled sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
      GROUP BY c.doc_a, c.doc_b),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    near_rm AS (
      SELECT DISTINCT p.doc_b AS doc_id
      FROM pair_overlap p JOIN sizes za ON za.doc_id = p.doc_a
                          JOIN sizes zb ON zb.doc_id = p.doc_b
      WHERE CAST(p.shared AS DOUBLE) / (za.n + zb.n - p.shared) >= 0.5)
    SELECT s.doc_id,
           CAST(LENGTH(s.text) AS BIGINT) AS chars,
           CAST(len(string_split(s.text, ' ')) AS BIGINT) AS tokens
    FROM survivors s
    WHERE s.doc_id NOT IN (SELECT doc_id FROM near_rm)
    ORDER BY s.doc_id
    """,
    group="pipeline",
    doc="Composed curation pipeline: quality gate -> exact dedup -> "
    "MinHash-LSH near-dedup (keep-first). The end-to-end path a "
    "pre-training corpus build runs; every stage is the registry "
    "operator of the same name.",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    avg_tok = F.length("text").cast("double") / n_toks
    quality = d.filter(n_toks.between(20, 80) & avg_tok.between(3, 8)).select(
        "doc_id", "text"
    )
    exact_keep = (
        quality.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = quality.join(exact_keep, "doc_id", "left_semi")
    cand = lsh_candidate_pairs(minhash_wide(survivors))
    shingled = shingled_docs(survivors)
    sa = shingled.alias("sa")
    sb = shingled.alias("sb")
    shared = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    jac = shared.cast("double") / (
        F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles")) - shared
    )
    near_rm = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select(F.col("doc_b").alias("rm_id"))
        .distinct()
    )
    return (
        survivors.join(near_rm, survivors.doc_id == F.col("rm_id"), "left_anti")
        .select(
            "doc_id",
            F.length("text").cast("bigint").alias("chars"),
            F.size(F.split("text", " ")).cast("bigint").alias("tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_pretraining_batch",
    f"""
    WITH feats AS (
      SELECT doc_id, source, text,
             CAST(length(text) AS BIGINT) AS n_chars,
             (1000000 * CAST(length(text) - length(replace(text, ' ', ''))
                        AS BIGINT)) // greatest(CAST(length(text) AS BIGINT), 1)
               AS space_ppm,
             (1000000 * CAST((length(text) - length(replace(lower(text), ' the ', '')))
                             // 5 AS BIGINT))
               // greatest(CAST(length(text) AS BIGINT), 1) AS stop_ppm
      FROM documents),
    kept AS (
      SELECT doc_id, source, text FROM feats
      WHERE 2 * space_ppm + 40 * stop_ppm + least(n_chars, 2000) * 100
            - 400000 > 0),
    exact_keep AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY sha256(text)),
    surv AS (
      SELECT k.doc_id, k.source, k.text
      FROM kept k JOIN exact_keep e ON k.doc_id = e.doc_id),
    per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM surv GROUP BY source),
    m AS (SELECT MIN(n_docs) AS m_min FROM per_source),
    rates AS (
      SELECT source, CAST((1000000 * m_min) // n_docs AS BIGINT) AS rate_ppm
      FROM per_source CROSS JOIN m),
    mixed AS (
      SELECT s.doc_id, s.source, s.text
      FROM surv s JOIN rates r ON r.source = s.source
      WHERE {tok_hash_duck("CAST(s.doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm),
    toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM mixed),
    cum AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM toks)
    SELECT doc_id, source, n_tokens,
           CAST(off // 2048 AS BIGINT) AS pack_id,
           CAST(off % 2048 AS BIGINT) AS pack_offset
    FROM cum
    ORDER BY doc_id
    """,
    group="pipeline",
    doc="End-to-end pretraining data preparation: quality-classifier "
    "gate (scaled-logit threshold, scan-local) -> exact dedup "
    "(32-byte hash shuffle) -> mixture-equalizing downsample (hash-"
    "bernoulli at per-source ppm rates, map-side after a tiny rate "
    "broadcast) -> sequence packing (distributed global token cumsum). "
    "Every stage is one of the registry's audited scale shapes; the "
    "composition adds no new shuffle beyond its parts, and the output "
    "is the (doc -> pack, offset) map a tokenizer shard-writer "
    "consumes.",
)
def pipeline_pretraining_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flink_stream_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    feats = d.select(
        "doc_id",
        "source",
        "text",
        n_chars.alias("n_chars"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))))
        .cast("bigint")
        .alias("n_spaces"),
        F.expr(
            "CAST((length(text) - length(replace(lower(text), ' the ', ''))) div 5 AS BIGINT)"
        ).alias("n_stop"),
    )
    ppm = feats.select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        F.expr("(1000000 * n_spaces) div greatest(n_chars, 1)").alias("space_ppm"),
        F.expr("(1000000 * n_stop) div greatest(n_chars, 1)").alias("stop_ppm"),
    )
    logit = (
        2 * F.col("space_ppm")
        + 40 * F.col("stop_ppm")
        + F.least(F.col("n_chars"), F.lit(2000)) * 100
        - 400_000
    )
    kept = ppm.filter(logit > 0).select("doc_id", "source", "text")
    exact_keep = kept.groupBy(F.sha2("text", 256)).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    surv = kept.join(exact_keep, "doc_id")
    per_source = surv.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    m = per_source.agg(F.min("n_docs").alias("m_min"))
    rates = per_source.crossJoin(F.broadcast(m)).select(
        "source", F.expr("(1000000 * m_min) div n_docs").cast("bigint").alias("rate_ppm")
    )
    mixed = surv.join(F.broadcast(rates), "source").filter(
        hash_bucket(F.col("doc_id"), 1_000_000) < F.col("rate_ppm")
    )
    toks = mixed.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    n = spark.sparkContext.defaultParallelism
    parted = (
        toks.repartitionByRange(n, "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin one range partitioning
    )
    sizes = parted.groupBy("__pid").agg(F.sum("n_tokens").alias("__psum"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = sizes.select(
        "__pid", F.coalesce(F.sum("__psum").over(w_off), F.lit(0)).alias("__poff")
    )
    w_in = W.partitionBy("__pid").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = (
        parted.withColumn("__local", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
        .join(F.broadcast(offsets), "__pid")
        .withColumn("off", F.col("__local") + F.col("__poff"))
    )
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("off div 2048").cast("bigint").alias("pack_id"),
        (F.col("off") % 2048).cast("bigint").alias("pack_offset"),
    ).orderBy("doc_id")
