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
        # result-sized exchange before the sort (see operators/sortout.py)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


def _pretraining_cte() -> str:
    """The pretraining-batch oracle CTE chain (quality gate → exact
    dedup → mixture downsample → LEAKAGE-SAFE cluster-id split →
    per-split sequence packing), ending at ``cum`` — shared by the
    batch query and the leakage audit. Built on the recursive-closure
    cluster CTE so the split column matches
    sample_leakage_safe_split exactly."""
    from flink_stream_spark.operators.sampling import _leakage_split_duck

    return (
        _leakage_split_duck()
        + f"""
    , feats AS (
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
      SELECT s.doc_id, s.source, s.text, sp.split
      FROM surv s JOIN rates r ON r.source = s.source
        JOIN split_assign sp ON sp.doc_id = s.doc_id
      WHERE {tok_hash_duck("CAST(s.doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm),
    toks AS (
      SELECT doc_id, source, split,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM mixed),
    cum AS (
      SELECT doc_id, source, split, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM toks)
    """
    )


@register(
    "pipeline_pretraining_batch",
    _pretraining_cte()
    + """
    SELECT doc_id, source, split, n_tokens,
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
    "broadcast) -> LEAKAGE-SAFE train/val/test assignment (bucketed "
    "by the md5 of the doc's near-dup CLUSTER id — the "
    "sample_leakage_safe_split machinery, so paraphrases/re-crawls "
    "can never straddle a split boundary; round 6 proved doc-id-hash "
    "splitting leaks) -> PER-SPLIT sequence packing (distributed "
    "token cumsum partitioned by split, so eval packs never share a "
    "sequence with train). Every stage is one of the registry's "
    "audited scale shapes; the only addition over its parts is the "
    "doc-keyed split join (one shuffle on doc_id — co-partitionable "
    "with the exact-dedup stage at scale), and the output is the "
    "(doc -> split, pack, offset) map a tokenizer shard-writer "
    "consumes. pipeline_leakage_audit proves zero straddlers ON this "
    "output.",
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
    # leakage-safe split BEFORE packing: the cluster-id bucket of
    # sample_leakage_safe_split (near-dups can never straddle a
    # boundary), joined on doc_id — then the token cumsum PARTITIONS
    # BY split so an eval pack never shares a sequence with train
    from flink_stream_spark.operators.sampling import _cluster_split_frame

    splits = _cluster_split_frame(spark, sf_dir).select("doc_id", "split")
    toks = (
        mixed.join(splits, "doc_id")
        .select(
            "doc_id",
            "source",
            "split",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
    )
    n = spark.sparkContext.defaultParallelism
    parted = (
        toks.repartitionByRange(n, "split", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin one range partitioning
    )
    # per-(partition, split) sums -> per-split partition offsets: the
    # same two-level distributed-cumsum shape, reset at each split
    # (a range partition may hold the boundary between two splits)
    sizes = parted.groupBy("__pid", "split").agg(F.sum("n_tokens").alias("__psum"))
    w_off = W.partitionBy("split").orderBy("__pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "__pid",
        "split",
        F.coalesce(F.sum("__psum").over(w_off), F.lit(0)).alias("__poff"),
    )
    w_in = W.partitionBy("__pid", "split").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = (
        parted.withColumn("__local", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
        .join(F.broadcast(offsets), ["__pid", "split"])
        .withColumn("off", F.col("__local") + F.col("__poff"))
    )
    return cum.select(
        "doc_id",
        "source",
        "split",
        "n_tokens",
        F.expr("off div 2048").cast("bigint").alias("pack_id"),
        (F.col("off") % 2048).cast("bigint").alias("pack_offset"),
    ).orderBy("doc_id")


@register(
    "pipeline_leakage_audit",
    _pretraining_cte()
    + """
    , out_assign AS (
      SELECT c.doc_id, c.split, sa.cluster_id
      FROM cum c JOIN split_assign sa ON sa.doc_id = c.doc_id),
    per_split AS (
      SELECT split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM out_assign GROUP BY split),
    straddlers AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_clusters FROM (
        SELECT cluster_id FROM out_assign
        GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1))
    SELECT p.split, p.n_docs, p.n_clusters, s.n_leaky_clusters
    FROM per_split p CROSS JOIN straddlers s
    ORDER BY p.split
    """,
    group="pipeline",
    doc="Leakage audit ON the pretraining pipeline's OUTPUT (round-6 "
    "verdict #6's done-criterion): per-split doc/cluster counts over "
    "the packed batch plus the count of near-dup clusters whose "
    "surviving members straddle more than one split — ZERO by "
    "construction now that the pipeline splits on cluster_id, and "
    "this query PROVES it on the data the packer actually emits "
    "(the governance check a training launch runs after curation, "
    "not merely on the raw corpus). Scale: the pipeline frame plus "
    "two hash aggregations over (cluster_id, split); the cluster "
    "assignment subplan is shared with the pipeline itself.",
)
def pipeline_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_stream_spark.operators.dedup import dedup_cluster_assign

    out = pipeline_pretraining_batch(spark, sf_dir).select("doc_id", "split")
    assigned = dedup_cluster_assign(spark, sf_dir).select("doc_id", "cluster_id")
    joined = out.join(assigned, "doc_id")
    per_split = joined.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
    )
    straddlers = (
        joined.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaky_clusters"))
    )
    return (
        per_split.crossJoin(F.broadcast(straddlers))
        .select("split", "n_docs", "n_clusters", "n_leaky_clusters")
        .orderBy("split")
    )
