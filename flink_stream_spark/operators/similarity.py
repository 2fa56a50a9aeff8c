"""Similarity search over the embedding column (SURVEY §2C NS).

- brute-force cosine top-k: broadcast the query set, scan the corpus
  once, window top-k — the exact baseline. At 100 TB scale this is
  one corpus scan per query batch with no shuffle of the corpus
  (queries broadcast; the only shuffle is |queries|×k result rows).
- hyperplane-LSH bucketed ANN: corpus-adaptive plane count
  (``lsh_num_planes`` — max(12, ceil(log2(n/64))) from one scalar
  count) of fixed md5-derived hyperplanes → sign-bit bucket per
  vector; candidates = same-bucket pairs → exact cosine re-rank. The
  scale path: bucket join instead of cross join.

Both are exact-arithmetic reproducible: cosine is computed in float64
with left-to-right accumulation in both engines, and hyperplane
components are md5-derived integers (no RNG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.dedup import _dot_expr, _norm_expr
from flink_stream_spark.operators.registry import register

N_QUERIES = 5  # query set: vec_id < 5
TOP_K = 10
N_PLANES_MIN = 12  # floor on hyperplane signature bits (2^12 buckets)
LSH_TARGET_BUCKET = 64  # expected bucket population the plane count holds
# The plane count is CORPUS-ADAPTIVE: P = max(12, ceil(log2(n / 64)))
# keeps the expected bucket population ~LSH_TARGET_BUCKET as the
# corpus grows (same-bucket pair work stays Σ bucket² with bounded
# buckets, never n²) — the same one-scalar-count derivation as
# SemDeDup's K, the dHash band tiers, and IVF's NLIST/NPROBE. Both
# engines compute it from COUNT(*): n/64.0 is exact (power-of-two
# divisor), and ceil(log2(x)) boundaries occur only at exact powers
# of two where IEEE log2 is exact, so there is no float-divergence
# window. The adaptive branch first exceeds 12 past 2^18 vectors —
# below that (every fixture scale) it returns exactly the historical
# 12, so driver history is unchanged; the unit test exercises the
# boundary directly.
DIM = 64
NLIST_MIN = 16  # floor on the IVF inverted-list count
# NLIST is CORPUS-ADAPTIVE: max(16, floor(sqrt(n))) from one scalar
# count — the standard IVF sizing, keeping per-list population ~√n so
# a query's scan cost (NPROBE lists) grows ∝ √n, not ∝ n. Both
# engines derive the same value (FLOOR(SQRT(COUNT(*))) — IEEE double
# sqrt on both sides). The n×NLIST assignment runs as an Arrow-batched
# numpy matmul that is BIT-IDENTICAL to the oracle's float arithmetic:
# the scaled-integer embeddings make every dot product an exact
# integer < 2^53 (products ≤ 1e12, 64-term sums ≤ 6.4e13), so the
# matmul's summation order is irrelevant, and the final
# divide-by-norms is the same single float64 op both engines perform.
NPROBE_MIN = 2  # floor on IVF lists probed per query
# NPROBE is CORPUS-ADAPTIVE alongside NLIST: with NLIST = √n growing
# and a fixed probe count, recall@k can only fall as the corpus grows
# (each probe covers a shrinking 1/NLIST fraction). The policy is
# NPROBE = max(2, ceil(sqrt(NLIST) / 4)) — probes grow as n^(1/4), so
# per-query scanned rows are NPROBE·(n/NLIST) ∝ n^(3/4): still deeply
# sublinear, while the probed FRACTION decays as n^(-1/4) instead of
# n^(-1/2). MEASURED, not just argued (round 7): on the recall-
# discriminating clustered fixture (testing/ann_fixture.py — boundary
# queries whose true neighbors split across several near-equidistant
# lists; the standard fixture saturates at 1.000 under every policy
# because each query seeds its own list), pinned nprobe=2 recall@5
# DECAYS with corpus size (0.64 → 0.60 → 0.52 at n=4k/16k/64k) while
# this adaptive rule recovers it (0.64 → 0.84 → 1.00) — the curve is
# recorded in PLANS.md ("IVF recall probe") and reproducible via
# tools/ann_recall_probe.py; tests/test_ann_recall_fixture.py pins
# the discrimination. Both engines derive the value from the same
# COUNT(*): sqrt is exact IEEE on both sides, /4 is exact, and ceil
# boundaries only occur at perfect squares where sqrt is exact — no
# float-divergence window.
IVF_K = 5


def ivf_nlist(n_vecs: int) -> int:
    import math

    return max(NLIST_MIN, int(math.floor(math.sqrt(float(n_vecs)))))


def ivf_nprobe(nlist: int) -> int:
    import math

    return max(NPROBE_MIN, int(math.ceil(math.sqrt(float(nlist)) / 4.0)))


def lsh_num_planes(n_vecs: int) -> int:
    import math

    if n_vecs <= LSH_TARGET_BUCKET:
        return N_PLANES_MIN
    return max(
        N_PLANES_MIN, int(math.ceil(math.log2(n_vecs / float(LSH_TARGET_BUCKET))))
    )


_NPLANES_DUCK = (
    # the n <= 64 guard mirrors lsh_num_planes: LOG2(0) errors in
    # DuckDB (GREATEST does not short-circuit), so an empty/tiny
    # corpus must take the floor branch explicitly
    f"(SELECT CASE WHEN COUNT(*) <= {LSH_TARGET_BUCKET} THEN {N_PLANES_MIN} "
    f"ELSE GREATEST({N_PLANES_MIN}, CAST(CEIL(LOG2(COUNT(*) / "
    f"{LSH_TARGET_BUCKET}.0)) AS BIGINT)) END FROM embeddings)"
)


_NLC_DUCK = (
    f"(SELECT GREATEST({NLIST_MIN}, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) "
    "FROM embeddings)"
)

_NPROBE_DUCK = (
    f"GREATEST({NPROBE_MIN}, "
    f"CAST(CEIL(SQRT(CAST({_NLC_DUCK} AS DOUBLE)) / 4) AS BIGINT))"
)


def _ivf_centroids(n_df: DataFrame, nlist: int) -> list:
    """Collect the nlist centroid rows (vec_id < nlist), id-sorted.
    Driver state ≤ √n rows — the SemDeDup-K pattern. Shared by the
    assignment pass and the driver-side query-probe derivation so the
    corpus subplan is evaluated ONCE for centroid state."""
    return sorted(
        n_df.filter(F.col("vec_id") < nlist).select("vec_id", "s", "nrm").collect(),
        key=lambda r: r["vec_id"],
    )


def _ivf_assign(n_df: DataFrame, cent_rows: list) -> DataFrame:
    """(vec_id, s, nrm) -> + cent_id: every vector's argmax-cosine
    centroid via ONE Arrow-batched numpy pass against the collected
    centroid rows. Cosine values are bit-identical to the JVM/DuckDB
    arithmetic (exact integer dots, one float multiply + divide), and
    ties rank by ascending cent_id (stable argsort over id-sorted
    centroids) — the same (cos DESC, cent_id) rule as the oracle's
    ROW_NUMBER."""
    import numpy as np
    import pandas as pd

    cids = np.array([r["vec_id"] for r in cent_rows], dtype="int64")
    C = np.array([r["s"] for r in cent_rows], dtype="float64")
    cnrm = np.array([r["nrm"] for r in cent_rows], dtype="float64")

    def assign(it):
        for pdf in it:
            X = np.stack(pdf["s"].to_numpy()).astype("float64")
            nrm = pdf["nrm"].to_numpy()
            cos = (X @ C.T) / (nrm[:, None] * cnrm[None, :])
            order = np.argsort(-cos, axis=1, kind="stable")
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "s": pdf["s"],
                    "nrm": pdf["nrm"],
                    "cent_id": cids[order[:, 0]],
                }
            )

    return n_df.mapInPandas(
        assign, "vec_id long, s array<double>, nrm double, cent_id long"
    )


def _ivf_query_probes(spark: SparkSession, cent_rows: list, nprobe: int) -> DataFrame:
    """The query vectors' nprobe nearest centroids, computed ON THE
    DRIVER from the already-collected centroid rows (the query set
    vec_id < N_QUERIES is a subset of the centroids since NLIST ≥ 16 >
    N_QUERIES), exploded to (query_id, p_cent, qs, qnrm) rows for the
    broadcast probe join. This removes the second full corpus Python
    pass the previous shape paid: an unpersisted mapInPandas subplan
    re-evaluates per reference, and probes used to be the second
    reference. Same exact-integer cosine + stable-argsort tie rule as
    _ivf_assign, so the probe sets are unchanged."""
    import numpy as np

    cids = np.array([r["vec_id"] for r in cent_rows], dtype="int64")
    C = np.array([r["s"] for r in cent_rows], dtype="float64")
    cnrm = np.array([r["nrm"] for r in cent_rows], dtype="float64")
    rows = []
    for r in cent_rows:
        if r["vec_id"] >= N_QUERIES:
            continue
        q = np.array(r["s"], dtype="float64")
        cos = (C @ q) / (r["nrm"] * cnrm)
        order = np.argsort(-cos, kind="stable")
        for p in cids[order[:nprobe]]:
            rows.append(
                (int(r["vec_id"]), int(p), [float(x) for x in r["s"]], float(r["nrm"]))
            )
    return spark.createDataFrame(
        rows, "query_id long, p_cent long, qs array<double>, qnrm double"
    )


@register(
    "simsearch_bruteforce_topk",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cos
      FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, match_id) AS rn
      FROM scored)
    SELECT query_id, match_id, CAST(ROUND(cos, 6) AS DOUBLE) AS cosine,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY query_id, rank
    """,
    group="similarity",
    doc="Exact ANN baseline: broadcast query set × corpus scan × "
    "window top-k per query.",
)
def simsearch_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # norms precomputed once per row on each side — only the dot
    # product runs per (query, corpus) pair (same float64 values,
    # same left-to-right order, 3× less interpreted-lambda work)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm_expr(F.col("embedding")).alias("q_norm"),
    )
    # spread the corpus (single-split scan) before the per-row cosine work
    par = spark.sparkContext.defaultParallelism
    c = e.repartition(par, "vec_id").select(
        F.col("vec_id").alias("match_id"),
        F.col("embedding").alias("c_emb"),
        _norm_expr(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            (
                _dot_expr(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "match_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "match_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def _scaled_expr(v):
    """Embedding scaled ×1e6 and truncated to integers, carried as
    float64. Every pairwise product (≤1e12) and 64-term sum (≤6.4e13)
    stays under 2^53, so dot products and norms over these arrays are
    EXACT in float64 — bit-identical across engines regardless of
    accumulation order. This is what makes IVF assignment (an argmax
    over cosines, where a 1-ulp divergence flips the winner)
    reproducible against the DuckDB oracle."""
    return F.transform(
        v, lambda x: (x.cast("double") * 1e6).cast("bigint").cast("double")
    )


def _sdot(va, vb):
    """Exact dot product of two scaled arrays (see _scaled_expr)."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


# trunc() before the BIGINT cast: DuckDB's double->bigint cast rounds,
# Spark's truncates — trunc on both sides makes the scaled arrays equal
_SCALED_DUCK = "list_transform({c}, x -> CAST(CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE))"


_IVF_RANKED_DUCK = f"""
    WITH se AS (
      SELECT vec_id, {_SCALED_DUCK.format(c='embedding')} AS s FROM embeddings),
    n AS (SELECT vec_id, s, sqrt(list_dot_product(s, s)) AS nrm FROM se),
    cent AS (SELECT vec_id AS cent_id, s AS cs, nrm AS cnrm FROM n
             WHERE vec_id < {_NLC_DUCK}),
    ass AS (
      SELECT vec_id, cent_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_dot_product(s, cs) / (nrm * cnrm) DESC,
                                         cent_id) AS rn
      FROM n CROSS JOIN cent),
    assign AS (SELECT vec_id, cent_id FROM ass WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cent_id FROM ass
               WHERE vec_id < {N_QUERIES} AND rn <= {_NPROBE_DUCK}),
    scored AS (
      SELECT p.query_id, a.vec_id AS match_id,
             list_dot_product(q.s, m.s) / (q.nrm * m.nrm) AS cos
      FROM probes p
        JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
        JOIN n q ON q.vec_id = p.query_id
        JOIN n m ON m.vec_id = a.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, match_id) AS rn
      FROM scored)
"""


@register(
    "simsearch_ivf_topk",
    _IVF_RANKED_DUCK
    + f"""
    SELECT query_id, match_id,
           CAST(CAST(trunc(cos * 1000000) AS BIGINT) / 1000000 AS DOUBLE) AS cosine,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {IVF_K}
    ORDER BY query_id, rank
    """,
    group="similarity",
    doc=f"IVF ANN with CORPUS-ADAPTIVE list count: "
    f"NLIST = max({NLIST_MIN}, floor(sqrt(n))) from one scalar count "
    "(both engines derive the same value), every vector assigned to "
    "its argmax-cosine list by an Arrow-batched numpy pass whose "
    "cosines are bit-identical to the oracle's float arithmetic "
    "(exact-integer dots < 2^53, order-independent), queries probe "
    "their NPROBE = max(2, ceil(sqrt(NLIST)/4)) nearest lists "
    "(adaptive too — see NPROBE_MIN), candidates re-ranked by exact "
    "cosine. At scale the corpus shuffles once on cent_id, per-list "
    "population is ~sqrt(n), and each query touches NPROBE*sqrt(n) "
    "~ n^(3/4) rows — the partition-pruned ANN path, vs the LSH "
    "variant's bit-bucket join. Driver state is the NLIST centroid "
    "rows (<= sqrt(n) — the SemDeDup-K pattern); query probes derive "
    "on the driver from those same rows, so the corpus runs through "
    "Python exactly ONCE.",
)
def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk_frame(spark, sf_dir)


def ivf_topk_frame(
    spark: SparkSession, sf_dir: str, nprobe: "int | None" = None
) -> DataFrame:
    """The IVF top-k plan with an optional NPROBE override — the
    serving-policy measurement hook (tools/ann_recall_probe.py records
    adaptive-vs-pinned recall on the clustered fixture); ``None`` =
    the adaptive ivf_nprobe rule the registered query ships."""
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    n = (
        e.repartition(par, "vec_id")
        .select("vec_id", _scaled_expr(F.col("embedding")).alias("s"))
        .withColumn("nrm", F.sqrt(_sdot(F.col("s"), F.col("s"))))
    )
    # corpus-adaptive list count + Arrow-batched numpy assignment
    # (bit-identical cosines — see _ivf_assign); probes derived
    # driver-side from the same collected centroids (no 2nd pass)
    nlist = ivf_nlist(e.count())
    cent_rows = _ivf_centroids(n, nlist)
    assign = _ivf_assign(n, cent_rows)
    probes = _ivf_query_probes(
        spark, cent_rows, ivf_nprobe(nlist) if nprobe is None else nprobe
    )
    scored = (
        assign.join(
            F.broadcast(probes),
            (F.col("cent_id") == F.col("p_cent")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            (_sdot(F.col("qs"), F.col("s")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "match_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_K)
        .select(
            "query_id",
            "match_id",
            # trunc-to-micros, not ROUND: ROUND's decimal expansion
            # diverges between engines on .xx5 boundaries; truncating
            # the identical double is deterministic
            ((F.col("cos") * 1e6).cast("bigint") / F.lit(1e6)).cast("double").alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "simsearch_recall_at_k",
    _IVF_RANKED_DUCK
    + f"""
    , ivf AS (SELECT query_id, match_id FROM ranked WHERE rn <= {IVF_K}),
    exact0 AS (
      SELECT q.vec_id AS query_id, m.vec_id AS match_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY list_dot_product(q.s, m.s)
                                           / (q.nrm * m.nrm) DESC,
                                         m.vec_id) AS rn
      FROM n q JOIN n m ON m.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    exact AS (SELECT query_id, match_id FROM exact0 WHERE rn <= {IVF_K}),
    hits AS (
      SELECT e.query_id, COUNT(*) AS n_hits
      FROM exact e JOIN ivf i
        ON i.query_id = e.query_id AND i.match_id = e.match_id
      GROUP BY e.query_id)
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(ROUND(COALESCE(h.n_hits, 0) / {IVF_K}.0, 6) AS DOUBLE) AS recall
    FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
          WHERE vec_id < {N_QUERIES}) q
      LEFT JOIN hits h ON h.query_id = q.query_id
    ORDER BY q.query_id
    """,
    group="similarity",
    doc=f"ANN index-quality evaluation: recall@{IVF_K} of the IVF "
    "(adaptive nprobe of the sqrt(n)-adaptive lists) result against "
    f"the exact top-{IVF_K} "
    "— the measurement loop that tunes nlist/nprobe before committing "
    "a 100 TB index build. The exact side broadcasts only the query "
    "vectors over one corpus scan; both sides use the ×1e6 scaled-"
    "integer arithmetic, so the recall numbers are bit-deterministic "
    "across engines (a 1-ulp cosine divergence at the rank-k boundary "
    "would otherwise flip the metric).",
)
def simsearch_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_recall_frame(spark, sf_dir)


def ivf_recall_frame(
    spark: SparkSession, sf_dir: str, nprobe: "int | None" = None
) -> DataFrame:
    """recall@IVF_K of the IVF result under an optional NPROBE
    override against the exact top-k — the measurement loop behind
    the adaptive-nprobe policy (PLANS.md 'IVF recall' table records
    adaptive vs pinned on the clustered fixture; ``None`` = the
    registered adaptive rule)."""
    e = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_topk_frame(spark, sf_dir, nprobe=nprobe).select(
        "query_id", "match_id"
    )
    par = spark.sparkContext.defaultParallelism
    n = (
        e.repartition(par, "vec_id")
        .select("vec_id", _scaled_expr(F.col("embedding")).alias("s"))
        .withColumn("nrm", F.sqrt(_sdot(F.col("s"), F.col("s"))))
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("s").alias("qs"),
        F.col("nrm").alias("qnrm"),
    )
    exact = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            (_sdot(F.col("qs"), F.col("s")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("cos").desc(), "match_id")
            ),
        )
        .filter(F.col("rn") <= IVF_K)
        .select("query_id", "match_id")
    )
    hits = exact.join(ivf, ["query_id", "match_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / IVF_K, 6).alias("recall"),
        )
        .orderBy("query_id")
    )


def _plane_component_spark(j, d):
    """Deterministic pseudo-random hyperplane component in [-1000, 1000]:
    md5 of 'plane:j:d' → int — the fixed-seed replacement for RNG."""
    s = F.concat_ws(":", F.lit("plane"), j.cast("string"), d.cast("string"))
    return (F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint") % 2001) - 1000


_PLANE_DUCK = (
    "((CAST('0x' || substr(md5('plane:' || CAST(j AS VARCHAR) || ':' || "
    "CAST(d AS VARCHAR)), 1, 12) AS BIGINT) % 2001) - 1000)"
)


def lsh_bucket(
    vectors: DataFrame, id_col: str = "vec_id", n_planes: "int | None" = None
) -> DataFrame:
    """(id, bucket): sign-bit signature over fixed md5-derived
    hyperplanes; the plane count is corpus-adaptive (``lsh_num_planes``
    from one scalar count) unless pinned by the caller.

    The projection is an exact integer dot product (embedding values
    scaled ×1e6 and truncated) so bucket assignment is bit-identical
    across engines — no float threshold flakiness at the sign boundary.
    """
    spark = vectors.sparkSession
    if n_planes is None:
        n_planes = lsh_num_planes(vectors.count())
    planes = (
        spark.range(0, n_planes)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(0, DIM).select(F.col("id").alias("d")))
        .select("j", "d", _plane_component_spark(F.col("j"), F.col("d")).alias("w"))
    )
    comp = vectors.select(
        F.col(id_col),
        F.posexplode(F.col("embedding")).alias("d", "x"),
    ).select(
        id_col, "d", F.expr("CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)").alias("xi")
    )
    dots = (
        comp.join(F.broadcast(planes), "d")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("xi") * F.col("w")).alias("dot"))
    )
    return dots.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("CAST(1 AS BIGINT) << CAST(j AS INT)")).otherwise(0)
        )
        .cast("bigint")
        .alias("bucket")
    )


@register(
    "simsearch_lsh_buckets",
    f"""
    WITH planes AS (
      SELECT j, d, {_PLANE_DUCK} AS w
      FROM (SELECT unnest(generate_series(0, {_NPLANES_DUCK} - 1)) AS j)
      CROSS JOIN (SELECT unnest(generate_series(0, {DIM - 1})) AS d)),
    comp AS (
      SELECT vec_id, u.d,
             CAST(trunc(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM (SELECT vec_id,
                   unnest(embedding) AS x,
                   unnest(generate_series(0, {DIM - 1})) AS d
            FROM embeddings) u(vec_id, x, d)),
    dots AS (
      SELECT vec_id, j, SUM(xi * w) AS dot
      FROM comp JOIN planes ON comp.d = planes.d
      GROUP BY vec_id, j)
    SELECT vec_id,
           CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
    FROM dots
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    group="similarity",
    doc="Random-hyperplane LSH bucket assignment: a corpus-adaptive "
    "plane count (max(12, ceil(log2(n/64))) from one scalar COUNT(*), "
    "both engines derive it — 12 below 2^18 vectors, growing with the "
    "corpus to hold expected bucket population ~64) of fixed "
    "md5-derived planes, integer dot products — the blocking key for "
    "ANN at scale.",
)
def simsearch_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket(e).orderBy("vec_id")


@register(
    "simsearch_lsh_ann_topk",
    f"""
    WITH planes AS (
      SELECT j, d, {_PLANE_DUCK} AS w
      FROM (SELECT unnest(generate_series(0, {_NPLANES_DUCK} - 1)) AS j)
      CROSS JOIN (SELECT unnest(generate_series(0, {DIM - 1})) AS d)),
    comp AS (
      SELECT vec_id, u.d,
             CAST(trunc(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM (SELECT vec_id,
                   unnest(embedding) AS x,
                   unnest(generate_series(0, {DIM - 1})) AS d
            FROM embeddings) u(vec_id, x, d)),
    dots AS (
      SELECT vec_id, j, SUM(xi * w) AS dot
      FROM comp JOIN planes ON comp.d = planes.d
      GROUP BY vec_id, j),
    buckets AS (
      SELECT vec_id,
             SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                      ELSE 0 END) AS bucket
      FROM dots GROUP BY vec_id),
    eb AS (
      SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id)),
    scored AS (
      SELECT a.vec_id AS query_id, c.vec_id AS match_id,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cos
      FROM eb a JOIN eb c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, match_id) AS rn
      FROM scored)
    SELECT query_id, match_id, CAST(ROUND(cos, 6) AS DOUBLE) AS cosine,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= 3
    ORDER BY query_id, rank
    """,
    group="similarity",
    doc="Bucketed ANN: same-bucket candidates re-ranked by exact cosine, "
    "top-3 per query vector. Join is on the adaptive-width LSH bucket "
    "(lsh_num_planes bits — 12 at fixture scales, wider past 2^18 "
    "vectors so expected population stays ~64) — Σ bucket² work "
    "instead of n²; recall traded for the missing cross-bucket "
    "neighbors, the standard IVF/LSH trade.",
)
def simsearch_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    b = lsh_bucket(e)
    eb = e.withColumn("__norm", _norm_expr(F.col("embedding"))).join(b, "vec_id")
    a = eb.alias("a")
    c = eb.alias("c")
    scored = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("match_id"),
            (
                _dot_expr(F.col("a.embedding"), F.col("c.embedding"))
                / (F.col("a.__norm") * F.col("c.__norm"))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "match_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "query_id",
            "match_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_label_centroids",
    """
    WITH comps0 AS (
      SELECT label,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    comps AS (
      SELECT label, dim,
             CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM comps0),
    agg AS (
      SELECT label, dim, SUM(xi) AS sx, COUNT(*) AS n
      FROM comps GROUP BY label, dim)
    SELECT CAST(label AS INTEGER) AS label, CAST(dim AS INTEGER) AS dim,
           CAST(ROUND(CAST(sx AS DOUBLE) / (n * 1000000.0), 6) AS DOUBLE) AS centroid
    FROM agg
    ORDER BY label, dim
    """,
    group="similarity",
    doc="Per-label centroid vectors, emitted as (label, dim, value) "
    "rows: posexplode of the embedding column then one (label, dim) "
    "aggregate with map-side partial sums — at corpus scale the "
    "shuffle carries |labels|x|dims| partial sums, never vectors. "
    "Components are x1e6-truncated integers (the IVF oracle "
    "construction) so the unordered sum is exact and "
    "order-independent; the centroid table is the k-means/IVF "
    "coarse-quantizer update step.",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    par = e.sparkSession.sparkContext.defaultParallelism
    comps = (
        e.repartition(par, "vec_id")
        .select("label", F.posexplode("embedding").alias("dim0", "x"))
        .select(
            "label",
            (F.col("dim0") + 1).alias("dim"),
            (F.col("x").cast("double") * 1e6).cast("bigint").alias("xi"),
        )
    )
    return (
        comps.groupBy("label", "dim")
        .agg(
            F.sum(F.col("xi").cast("decimal(18,0)")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("dim").cast("int").alias("dim"),
            F.round(
                F.col("sx").cast("double") / (F.col("n") * F.lit(1000000.0)), 6
            )
            .cast("double")
            .alias("centroid"),
        )
        # result-sized exchange before the sort (see operators/sortout.py)
        .repartition("label", "dim")
        .orderBy("label", "dim")
    )


@register(
    "embedding_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    s AS (
      SELECT vec_id, e,
             list_min(e) AS vmin,
             (list_max(e) - list_min(e)) / 255 AS scale
      FROM v),
    q AS (
      SELECT vec_id, e, vmin, scale,
             list_transform(e, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(floor((x - vmin) / scale + 0.5) AS BIGINT) END) AS qv
      FROM s),
    err AS (
      SELECT vec_id, e, vmin, scale, qv,
             list_transform(generate_series(1, len(e)),
                            i -> abs(e[i] - (qv[i] * scale + vmin))) AS ae
      FROM q)
    SELECT vec_id,
           CAST(len(e) AS BIGINT) AS dim,
           CAST(vmin AS DOUBLE) AS vmin,
           CAST(vmin + scale * 255 AS DOUBLE) AS vmax,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qv),
                            (a, b) -> a + b) AS BIGINT) AS q_sum,
           CAST('0x' || substr(md5(array_to_string(qv, ',')), 1, 15) AS BIGINT)
             AS q_hash,
           CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), ae),
                            (a, b) -> a + b) / len(e) AS DOUBLE) AS mean_abs_err
    FROM err
    ORDER BY vec_id
    """,
    group="similarity",
    doc="Per-vector affine int8 quantization (the standard 4x memory "
    "reduction for ANN indexes at corpus scale): q_i = "
    "round((x_i - min) / scale) with scale = (max - min)/255, plus the "
    "reconstruction error audit. Purely per-row projection work — zero "
    "shuffles; at 100 TB this is a map-only pass. Cross-engine "
    "exactness: both engines widen the same float32 to the same "
    "double, apply the same fixed-order ops, and round via "
    "floor(x + 0.5) (explicit half-up; values are >= 0), so the "
    "quantized codes are bit-identical; the md5 code-hash proves it "
    "per row. Error sums fold sequentially (F.aggregate / "
    "list_reduce), keeping the accumulation order fixed.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", v.alias("e"))
    vmin = F.array_min("e")
    scale = (F.array_max("e") - vmin) / 255
    with_s = base.select("vec_id", "e", vmin.alias("vmin"), scale.alias("scale"))
    qv = F.transform(
        "e",
        lambda x: F.when(F.col("scale") == 0, F.lit(0).cast("bigint")).otherwise(
            F.floor((x - F.col("vmin")) / F.col("scale") + 0.5).cast("bigint")
        ),
    )
    with_q = with_s.select("vec_id", "e", "vmin", "scale", qv.alias("qv"))
    abs_err = F.zip_with(
        "e",
        "qv",
        lambda x, qi: F.abs(x - (qi * F.col("scale") + F.col("vmin"))),
    )
    with_err = with_q.select(
        "vec_id", "e", "vmin", "scale", "qv", abs_err.alias("ae")
    )
    fold_long = F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, b: a + b)
    fold_err = F.aggregate("ae", F.lit(0.0), lambda a, b: a + b)
    return with_err.select(
        "vec_id",
        F.size("e").cast("bigint").alias("dim"),
        F.col("vmin").alias("vmin"),
        (F.col("vmin") + F.col("scale") * 255).alias("vmax"),
        fold_long.alias("q_sum"),
        F.conv(
            F.substring(
                F.md5(
                    F.array_join(
                        F.transform("qv", lambda q: q.cast("string")), ","
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("q_hash"),
        (fold_err / F.size("e")).alias("mean_abs_err"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Product quantization (PQ): subspace codebooks + asymmetric distance
# ---------------------------------------------------------------------------

PQ_M = 4               # subspaces (DIM/PQ_M dims each)
PQ_SUB = DIM // PQ_M   # 16 dims per subspace
PQ_KS = 16             # codewords per subspace (codebook: vec_id < PQ_KS)
PQ_K = 5               # ADC top-k

_PQ_BASE_DUCK = f"""
    WITH se AS (
      SELECT vec_id, {_SCALED_DUCK.format(c='embedding')} AS s FROM embeddings),
    subs AS (
      SELECT vec_id, m.m AS m,
             list_slice(s, m.m*{PQ_SUB}+1, m.m*{PQ_SUB}+{PQ_SUB}) AS sub
      FROM se CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m),
    cb AS (
      SELECT m, vec_id AS code, sub AS cs FROM subs WHERE vec_id < {PQ_KS}),
    dists AS (
      SELECT v.vec_id, v.m, c.code,
             list_dot_product(v.sub, v.sub)
               - 2*list_dot_product(v.sub, c.cs)
               + list_dot_product(c.cs, c.cs) AS d
      FROM subs v JOIN cb c ON c.m = v.m),
    codes AS (
      SELECT vec_id, m, code, d FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                     ORDER BY d, code) AS rn
        FROM dists) t WHERE rn = 1)
"""


def _pq_subs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, sub): each embedding scaled to exact integers and cut
    into PQ_M subvectors (builtin slice — JVM-side, no Python)."""
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    se = e.repartition(par, "vec_id").select(
        "vec_id", _scaled_expr(F.col("embedding")).alias("s")
    )
    pieces = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("s", m * PQ_SUB + 1, PQ_SUB).alias("sub"),
            )
            for m in range(PQ_M)
        ]
    )
    return se.select("vec_id", F.explode(pieces).alias("x")).select(
        "vec_id", F.col("x.m").alias("m"), F.col("x.sub").alias("sub")
    )


def _pq_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code, d): exact scaled-integer L2 of every subvector
    against its subspace codebook (PQ_M×PQ_KS rows, broadcast). All
    products/sums are integers < 2^53 carried in float64, so d is
    bit-identical across engines and the argmin never flips."""
    subs = _pq_subs(spark, sf_dir)
    cb = subs.filter(F.col("vec_id") < PQ_KS).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cs")
    )
    d = (
        _sdot(F.col("sub"), F.col("sub"))
        - 2 * _sdot(F.col("sub"), F.col("cs"))
        + _sdot(F.col("cs"), F.col("cs"))
    )
    return subs.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", d.alias("d")
    )


@register(
    "embedding_pq_codes",
    _PQ_BASE_DUCK
    + """
    SELECT vec_id, CAST(m AS INTEGER) AS subspace, CAST(code AS INTEGER) AS code,
           CAST(d AS BIGINT) AS sq_err
    FROM codes
    ORDER BY vec_id, subspace
    """,
    group="similarity",
    doc=f"Product quantization: {PQ_M} subspaces × {PQ_KS} deterministic "
    f"codewords (first {PQ_KS} vectors' subvectors). Each vector "
    f"compresses to {PQ_M} codes via exact scaled-integer argmin-L2 "
    f"against the broadcast codebook ({PQ_M * PQ_KS} rows). One "
    f"broadcast join + a min_by aggregate with map-side combine — the "
    f"corpus never shuffles by anything but its own id; at 100 TB this "
    f"is the memory-bound compression pass before ANN serving "
    f"(64 floats → {PQ_M} bytes-ish).",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    dists = _pq_dists(spark, sf_dir)
    best = dists.groupBy("vec_id", "m").agg(
        F.min_by(F.struct("code", "d"), F.struct("d", "code")).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("m").cast("int").alias("subspace"),
        F.col("b.code").cast("int").alias("code"),
        F.col("b.d").cast("bigint").alias("sq_err"),
    ).orderBy("vec_id", "subspace")


@register(
    "simsearch_pq_adc_topk",
    _PQ_BASE_DUCK
    + f"""
    , qd AS (
      SELECT d.vec_id AS query_id, d.m, d.code, d.d
      FROM dists d WHERE d.vec_id < {N_QUERIES}),
    adist AS (
      SELECT qd.query_id, c.vec_id AS match_id, SUM(qd.d) AS adist
      FROM codes c JOIN qd ON qd.m = c.m AND qd.code = c.code
      WHERE c.vec_id <> qd.query_id
      GROUP BY qd.query_id, c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adist, match_id) AS rn
      FROM adist)
    SELECT query_id, match_id, CAST(adist AS BIGINT) AS adist,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {PQ_K}
    ORDER BY query_id, rank
    """,
    group="similarity",
    doc=f"PQ asymmetric-distance search: each query precomputes a "
    f"{PQ_M}×{PQ_KS} distance table to every codeword (broadcast, "
    f"{N_QUERIES * PQ_M * PQ_KS} rows); candidate distance is a "
    f"{PQ_M}-term table-lookup sum over the corpus CODES — the raw "
    f"embeddings are never touched after compression. Exact integer "
    f"arithmetic end-to-end, so ranks are bit-stable. The serving-side "
    f"complement of embedding_pq_codes: at 100 TB the scan reads "
    f"{PQ_M} small ints per vector instead of {DIM} floats.",
)
def simsearch_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    dists = _pq_dists(spark, sf_dir)
    codes = dists.groupBy("vec_id", "m").agg(
        F.min_by(F.struct("code", "d"), F.struct("d", "code")).alias("b")
    ).select("vec_id", "m", F.col("b.code").alias("code"))
    qd = dists.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code", "d"
    )
    adist = (
        codes.join(F.broadcast(qd), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adist"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("vec_id").asc())
    return (
        adist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_K)
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            F.col("adist").cast("bigint").alias("adist"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "simsearch_ivfpq_topk",
    _PQ_BASE_DUCK
    + f"""
    , n AS (SELECT vec_id, s, sqrt(list_dot_product(s, s)) AS nrm FROM se),
    cent AS (SELECT vec_id AS cent_id, s AS cs, nrm AS cnrm FROM n
             WHERE vec_id < {_NLC_DUCK}),
    ass AS (
      SELECT vec_id, cent_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY list_dot_product(s, cs) / (nrm * cnrm) DESC,
                                         cent_id) AS rn
      FROM n CROSS JOIN cent),
    assign AS (SELECT vec_id, cent_id FROM ass WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cent_id FROM ass
               WHERE vec_id < {N_QUERIES} AND rn <= {_NPROBE_DUCK}),
    qd AS (
      SELECT d.vec_id AS query_id, d.m, d.code, d.d
      FROM dists d WHERE d.vec_id < {N_QUERIES}),
    adist AS (
      SELECT qd.query_id, c.vec_id AS match_id, SUM(qd.d) AS adist
      FROM codes c
        JOIN assign a ON a.vec_id = c.vec_id
        JOIN probes p ON p.cent_id = a.cent_id
        JOIN qd ON qd.query_id = p.query_id AND qd.m = c.m AND qd.code = c.code
      WHERE c.vec_id <> qd.query_id
      GROUP BY qd.query_id, c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adist, match_id) AS rn
      FROM adist)
    SELECT query_id, match_id, CAST(adist AS BIGINT) AS adist,
           CAST(rn AS BIGINT) AS rank
    FROM ranked WHERE rn <= {PQ_K}
    ORDER BY query_id, rank
    """,
    group="similarity",
    doc=f"IVF+PQ — the production ANN shape: IVF (sqrt(n)-adaptive "
    "list count) prunes the corpus to each query's adaptive-NPROBE "
    "inverted lists, then PQ "
    f"ADC ranks ONLY those candidates from their {PQ_M} codes (raw "
    f"vectors never re-read at query time). At 100 TB: corpus "
    f"partitioned by list, each query reads NPROBE partitions of "
    f"{PQ_M}-int codes — I/O ∝ probed fraction × compressed width. "
    f"Exact integer ADC keeps ranks bit-stable across engines.",
)
def simsearch_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    n = (
        e.repartition(par, "vec_id")
        .select("vec_id", _scaled_expr(F.col("embedding")).alias("s"))
        .withColumn("nrm", F.sqrt(_sdot(F.col("s"), F.col("s"))))
    )
    nlist = ivf_nlist(e.count())
    cent_rows = _ivf_centroids(n, nlist)
    assign = _ivf_assign(n, cent_rows).select("vec_id", "cent_id")
    probes = _ivf_query_probes(spark, cent_rows, ivf_nprobe(nlist)).select(
        "query_id", "p_cent"
    )

    dists = _pq_dists(spark, sf_dir)
    codes = dists.groupBy("vec_id", "m").agg(
        F.min_by(F.struct("code", "d"), F.struct("d", "code")).alias("b")
    ).select("vec_id", "m", F.col("b.code").alias("code"))
    qd = dists.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q2"),
        F.col("m").alias("qm"),
        F.col("code").alias("qcode"),
        "d",
    )
    adist = (
        codes.join(assign, "vec_id")
        .join(F.broadcast(probes), F.col("cent_id") == F.col("p_cent"))
        .join(
            F.broadcast(qd),
            (F.col("q2") == F.col("query_id"))
            & (F.col("qm") == F.col("m"))
            & (F.col("qcode") == F.col("code")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adist"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("vec_id").asc())
    return (
        adist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_K)
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            F.col("adist").cast("bigint").alias("adist"),
            F.col("rn").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


KM_K = 8  # k-means clusters (deterministic init: vec_id < KM_K)


@register(
    "embedding_kmeans_assign",
    f"""
    WITH n AS (
      SELECT vec_id, {_SCALED_DUCK.format(c='embedding')} AS s FROM embeddings),
    c0 AS (SELECT vec_id AS cent_id, s AS cs FROM n WHERE vec_id < {KM_K}),
    a1 AS (
      SELECT vec_id, cent_id, s,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY list_dot_product(cs, cs) - 2 * list_dot_product(s, cs),
                        cent_id) AS rn
      FROM n CROSS JOIN c0),
    asg1 AS (SELECT vec_id, cent_id AS cl, s FROM a1 WHERE rn = 1),
    ex AS (
      SELECT cl, generate_subscripts(s, 1) AS dim, unnest(s) AS val FROM asg1),
    upd AS (
      SELECT cl, dim,
             CAST(SUM(CAST(val AS BIGINT)) // COUNT(*) AS DOUBLE) AS cval
      FROM ex GROUP BY cl, dim),
    c1 AS (
      SELECT cl AS cent_id, list(cval ORDER BY dim) AS cs
      FROM upd GROUP BY cl),
    a2 AS (
      SELECT n.vec_id, c1.cent_id,
             ROW_NUMBER() OVER (
               PARTITION BY n.vec_id
               ORDER BY list_dot_product(cs, cs) - 2 * list_dot_product(s, cs),
                        cent_id) AS rn
      FROM n CROSS JOIN c1)
    SELECT vec_id, CAST(cent_id AS BIGINT) AS cluster
    FROM a2 WHERE rn = 1
    ORDER BY vec_id
    """,
    group="similarity",
    doc=f"Distributed k-means (Lloyd) over the embedding column: "
    f"deterministic init ({KM_K} seed vectors), one centroid update, "
    "final assignment. Assignment minimizes ||c||^2 - 2<x,c> (the "
    "||x||^2 term cannot change the argmin) over broadcast centroids — "
    "one corpus scan per iteration, no corpus shuffle. The update "
    "explodes to (cluster, dim) partial sums whose key space is "
    "k x dim, so the map-side-combined shuffle is KBs at any corpus "
    "size; centroid components are exact integer means (sum div count "
    "of x1e6-scaled ints), so the argmin is bit-deterministic across "
    "engines. Real deployments loop this block driver-side until "
    "centroid movement converges — each iteration is this same plan.",
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    # spread on vec_id BEFORE the per-row K x dim dot products: the
    # assign stage's groupBy(vec_id) needs this hash distribution
    # anyway (the exchange moves earlier, it is not added), and a
    # single-split input (one parquet row group) would otherwise run
    # every dot product in ONE task — 3.3x at sf1
    n = e.repartition(par, "vec_id").select(
        "vec_id", _scaled_expr(F.col("embedding")).alias("s")
    )

    def assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        # score = ||c||^2 - 2<x,c>; exact f64 on x1e6-scaled ints.
        # argmin via min_by on (score, cent_id) — a map-side-combining
        # aggregate, so the shuffle carries N rows, not the N×K
        # crossJoin (a row_number window would sort-shuffle all N×K)
        score = _sdot(F.col("cs"), F.col("cs")) - 2 * _sdot(F.col("s"), F.col("cs"))
        return (
            vectors.crossJoin(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(
                F.min_by("cent_id", F.struct(score.alias("d"), F.col("cent_id"))).alias(
                    "cent_id"
                ),
                F.first("s").alias("s"),  # constant per vec_id
            )
        )

    c0 = n.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cent_id"), F.col("s").alias("cs")
    )
    asg1 = assign(n, c0).select(F.col("cent_id").alias("cl"), "s")
    upd = (
        asg1.select("cl", F.posexplode("s").alias("dim0", "val"))
        .groupBy("cl", (F.col("dim0") + 1).alias("dim"))
        .agg(F.expr("CAST(sum(CAST(val AS BIGINT)) div count(1) AS DOUBLE)").alias("cval"))
    )
    c1 = (
        upd.groupBy(F.col("cl").alias("cent_id"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cval"))), lambda x: x["cval"]
            ).alias("cs")
        )
    )
    return (
        assign(n, c1)
        .select("vec_id", F.col("cent_id").cast("bigint").alias("cluster"))
        # result-sized exchange before the sort (see operators/sortout.py)
        # (compound key — plain vec_id is elided, see text.py winnowing)
        .repartition("vec_id", "cluster")
        .orderBy("vec_id")
    )


# --- distributed exact covariance + PCA --------------------------------
#
# The scale-correct shape for second-moment statistics over an
# embedding column: Arrow-batched partial X^T X per batch (numpy,
# d x d = bounded), exact decimal(38,0) combination of the partials in
# Spark, and only the d x d moment matrix ever reaches the driver.
# Components are scaled to integers (trunc(x*1e6), the house rule) so
# every partial sum is an exact int64 (safe while batch_rows *
# 1e12 < 2^63, i.e. up to ~9M rows per Arrow batch; Spark's default
# batch is 10k rows) and the combined sums are exact decimals — the
# covariance matrix is bit-identical regardless of partitioning.
PCA_SCALE = 1_000_000
PCA_K = 8


def _moment_partials(df: DataFrame, dim: int) -> DataFrame:
    """One row per Arrow batch: n, per-dim sums, upper-triangle
    cross-product sums of the int-scaled embedding matrix."""
    import numpy as np
    import pandas as pd

    iu = None  # built lazily inside the worker

    def partials(it):
        nonlocal iu
        for pdf in it:
            x = np.trunc(
                np.stack(pdf["embedding"].to_numpy()).astype("float64")
                * PCA_SCALE
            ).astype("int64")
            if iu is None:
                iu = np.triu_indices(dim)
            sxy = (x.T @ x)[iu]  # int64 exact within a batch
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "sx": [x.sum(axis=0)],
                    "sxy": [sxy],
                }
            )

    return df.select("embedding").mapInPandas(
        partials, "n long, sx array<long>, sxy array<long>"
    )


def _exact_moments(spark: SparkSession, sf_dir: str):
    """(n_total, sums_x DF [i, sx], sums_xy DF [i, j, sxy]) — exact
    decimal combination of the per-batch partials."""
    e = load_table(spark, sf_dir, "embeddings")
    par = e.sparkSession.sparkContext.defaultParallelism
    p = _moment_partials(e.repartition(par, "vec_id"), DIM).cache()
    sums_x = (
        p.select(F.posexplode("sx").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("sx"))
    )
    # upper-triangle flat index pos -> (i, j): row starts at
    # C(i) = i*DIM - i*(i-1)/2; the inverse is exact in float64 because
    # (DIM+0.5)^2 - 2*C(i) = (DIM-i+0.5)^2 is a representable perfect
    # square at every row boundary, so sqrt returns it exactly.
    ij = F.expr(
        f"""
        CAST({DIM} + 0.5 - sqrt(({DIM} + 0.5) * ({DIM} + 0.5) - 2.0 * pos)
             AS INT)
        """
    )
    sums_xy = (
        p.select(F.posexplode("sxy").alias("pos", "v"))
        .withColumn("i", ij)
        .withColumn(
            "j",
            (
                F.col("pos")
                - F.col("i") * F.lit(DIM)
                + (F.col("i") * (F.col("i") - 1)) / 2
                + F.col("i")
            ).cast("int"),
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("sxy"))
    )
    n_total = p.agg(F.sum("n").alias("n"))
    return n_total, sums_x, sums_xy


@register(
    "embedding_covariance_exact",
    f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(trunc(CAST(x AS DOUBLE) * {PCA_SCALE})
                                      AS BIGINT)) AS v
      FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    crossed AS (
      SELECT a.i AS i, b.i AS j,
             SUM(s.v[a.i] * s.v[b.i]) AS sxy,
             COUNT(*) AS n
      FROM s, idx a, idx b
      WHERE a.i <= b.i
      GROUP BY a.i, b.i),
    sums AS (
      SELECT i, SUM(v[i]) AS sx FROM s, idx GROUP BY i)
    SELECT CAST(c.i - 1 AS INT) AS i, CAST(c.j - 1 AS INT) AS j,
           CAST(ROUND(CAST(c.n * c.sxy - sa.sx * sb.sx AS DOUBLE)
                      / (CAST(c.n AS DOUBLE) * c.n * {PCA_SCALE}.0 * {PCA_SCALE}),
                      6) AS DOUBLE) AS cov
    FROM crossed c JOIN sums sa ON sa.i = c.i JOIN sums sb ON sb.i = c.j
    ORDER BY i, j
    """,
    group="similarity",
    doc="Exact empirical covariance matrix (upper triangle, "
    f"{DIM}x{DIM}) of the int-scaled embedding column: per-Arrow-batch "
    "numpy X^T X partials (bounded d x d traffic per batch, never a "
    "row explode), combined as exact decimal(38,0) sums, so the result "
    "is bit-identical under any partitioning. The oracle recomputes "
    "the same integer moments by brute-force index crossing — "
    "quadratic-in-d explode the Spark side deliberately avoids. "
    "Scale: traffic after the scan is |batches| * (d + d(d+1)/2) "
    "int64s; the final agg is d(d+1)/2 rows. No stage depends on "
    "corpus size.",
)
def embedding_covariance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_total, sums_x, sums_xy = _exact_moments(spark, sf_dir)
    sa = sums_x.select(F.col("i").alias("i"), F.col("sx").alias("sx_i"))
    sb = sums_x.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    n = F.col("n").cast("decimal(38,0)")
    cov = (
        (n * F.col("sxy") - F.col("sx_i") * F.col("sx_j")).cast("double")
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * F.lit(float(PCA_SCALE) * PCA_SCALE)
        )
    )
    return (
        sums_xy.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.round(cov, 6).alias("cov"),
        )
        .orderBy("i", "j")
    )


@register(
    "embedding_pca_project",
    None,  # eigendecomposition is not SQL-expressible; rows-only check
    group="similarity",
    doc=f"PCA projection to the top {PCA_K} principal components: the "
    "exact distributed covariance (see embedding_covariance_exact) is "
    f"collected to the driver as the bounded {DIM}x{DIM} moment "
    "matrix, eigendecomposed with numpy (LAPACK on a 64x64 symmetric "
    "matrix — microseconds, deterministic because the input matrix is "
    "exact), components sign-fixed (largest-|loading| coordinate made "
    "positive), and the projection runs distributed as one "
    "Arrow-batched numpy matmul per batch. Scale: driver traffic is "
    "d(d+1)/2 + d rows once; the projection pass is narrow (no "
    "shuffle) and the component matrix ships to executors in the task "
    "closure (d x k floats).",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    n_total, sums_x, sums_xy = _exact_moments(spark, sf_dir)
    n = int(n_total.collect()[0]["n"])
    mean = np.zeros(DIM)
    for r in sums_x.collect():
        mean[r["i"]] = float(int(r["sx"])) / n / PCA_SCALE
    cov = np.zeros((DIM, DIM))
    for r in sums_xy.collect():
        i, j = r["i"], r["j"]
        # exact integers until the final float division
        c = float(n * int(r["sxy"])) / (float(n) * n * PCA_SCALE * PCA_SCALE)
        cov[i, j] = cov[j, i] = c
    cov -= np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:PCA_K]
    comps = vecs[:, order]  # (DIM, PCA_K)
    # deterministic sign: the largest-|loading| coordinate is positive
    for k in range(PCA_K):
        m = np.argmax(np.abs(comps[:, k]))
        if comps[m, k] < 0:
            comps[:, k] = -comps[:, k]

    def project(it):
        for pdf in it:
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64") - mean
            proj = x @ comps
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": list(np.round(proj, 6))}
            )

    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    return (
        e.repartitionByRange(par, "vec_id")
        .select("vec_id", "embedding")
        .mapInPandas(project, "vec_id long, proj array<double>")
        .sortWithinPartitions("vec_id")
    )


# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" — public paper): embed ->
# k-means cluster -> within-cluster cosine pairs above a threshold ->
# keep one representative per near-duplicate group. Clustering blocks
# the pair search (never corpus x corpus); the survivor policy here is
# greedy-by-id (a vector is dropped iff a LOWER-id vector in its
# cluster is tau-similar — the streaming "keep first occurrence" rule,
# deterministic and engine-mirrorable without iterative component
# propagation; the CC-based variant is dedup_cluster_assign).
SEMDEDUP_TAU = 0.4
SEMDEDUP_K_MIN = 64  # floor on the cluster count
SEMDEDUP_TARGET_CLUSTER = 256  # target per-cluster population: K is
# derived from ONE scalar corpus count as max(64, n // 256), so mean
# cluster size — and with it the Σ cluster² pair cost and the pair
# stage's working set — stays ~constant as the corpus grows (the
# paper's regime: K ∝ corpus). The oracle SQL computes the SAME K from
# COUNT(*), so engine and oracle stay in lockstep at every scale.
SEMDEDUP_PAIR_CHUNK = 2048  # rows per matmul block in the pair stage:
# per-task memory is O(chunk · m) doubles, never O(m²), so a skewed
# cluster degrades to more blocks, not an OOM.


@register(
    "dedup_semdedup_cluster",
    f"""
    WITH kk AS (
      SELECT GREATEST({SEMDEDUP_K_MIN},
                      COUNT(*) // {SEMDEDUP_TARGET_CLUSTER}) AS k
      FROM embeddings),
    n AS (
      SELECT vec_id,
             {_SCALED_DUCK.format(c='embedding')} AS s
      FROM embeddings),
    nn AS (SELECT vec_id, s, sqrt(list_dot_product(s, s)) AS nrm FROM n),
    c0 AS (SELECT vec_id AS cent_id, s AS cs FROM n
           WHERE vec_id < (SELECT k FROM kk)),
    a1 AS (
      SELECT vec_id, cent_id, s, nrm,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY list_dot_product(cs, cs) - 2 * list_dot_product(s, cs),
                        cent_id) AS rn
      FROM nn CROSS JOIN c0),
    asg AS (SELECT vec_id, cent_id AS cl, s, nrm FROM a1 WHERE rn = 1),
    p AS (
      SELECT b.vec_id AS vb
      FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.s, b.s) / (a.nrm * b.nrm) >= {SEMDEDUP_TAU}),
    rep AS (SELECT vb, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY vb)
    SELECT asg.vec_id,
           CAST(asg.cl AS BIGINT) AS cluster,
           COALESCE(rep.c, 0) AS n_dup_lower,
           COALESCE(rep.c, 0) = 0 AS keep
    FROM asg LEFT JOIN rep ON rep.vb = asg.vec_id
    ORDER BY asg.vec_id
    """,
    group="dedup",
    doc="SemDeDup (Abbas et al. 2023): vectors k-means-assigned to "
    f"K = max({SEMDEDUP_K_MIN}, n // {SEMDEDUP_TARGET_CLUSTER}) "
    "deterministic seed centroids — K derived from one scalar corpus "
    "count so mean cluster population stays ~constant as the corpus "
    "grows (exact scaled-integer argmin, broadcast centroids) — then "
    f"within-cluster cosine pairs >= {SEMDEDUP_TAU} mark later-id "
    "vectors as semantic duplicates (greedy keep-first survivor "
    "rule). Output: per vector, its cluster, the count of tau-similar "
    "lower-id cluster-mates, and the keep flag. Scale: adaptive K "
    "bounds Σ cluster² pair cost to ~n·target (never corpus²); the "
    f"pair matmul is blocked into {SEMDEDUP_PAIR_CHUNK}-row chunks so "
    "per-task memory is O(chunk·m), not O(m²); the pair join is "
    "cluster-keyed and parallelizes per cluster; driver state is the "
    "K centroid rows only (at extreme K, swap the broadcast for a "
    "hierarchical two-level assignment — same argmin contract).",
)
def dedup_semdedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    # norms precomputed ONCE per row: the pair loop then runs a single
    # interpreted HOF (the dot product). Scaled-integer arithmetic
    # keeps the cosine exact and threshold-stable across engines.
    n = (
        e.repartition(par, "vec_id")
        .select("vec_id", _scaled_expr(F.col("embedding")).alias("s"))
        .withColumn("nrm", F.sqrt(_sdot(F.col("s"), F.col("s"))))
    )
    # assignment is an Arrow-batched numpy matmul, NOT a JVM HOF pass:
    # the n x K score matrix costs n*K*d multiply-adds, which measured
    # 220 s interpreted at (60k x 1024) but is sub-second vectorized.
    # Exactness is preserved — scores are int64 (products <= 1e12,
    # 64-term sums <= 6.4e13) so c.c - 2<x,c> is the IDENTICAL integer
    # the oracle's float64 arithmetic produces, and np.argmin's
    # first-minimum rule equals the oracle's (score, cent_id) ordering
    # because centroid rows are sorted by cent_id.
    # K from ONE scalar count: per-cluster population ~TARGET_CLUSTER
    # at any corpus size (the paper's K ∝ corpus regime). Driver
    # traffic stays K centroid rows — bounded by n/256, not by n.
    k = max(SEMDEDUP_K_MIN, e.count() // SEMDEDUP_TARGET_CLUSTER)
    cent_rows = sorted(
        n.filter(F.col("vec_id") < k).select("vec_id", "s").collect(),
        key=lambda r: r["vec_id"],
    )
    cent_ids = np.array([r["vec_id"] for r in cent_rows], dtype="int64")
    C = np.array([r["s"] for r in cent_rows], dtype="int64")  # (K, d)
    cc = (C * C).sum(axis=1)  # (K,) exact int64

    def assign(it):
        for pdf in it:
            x = np.stack(pdf["s"].to_numpy()).astype("int64")
            score = cc[None, :] - 2 * (x @ C.T)  # exact int64
            cl = cent_ids[np.argmin(score, axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cl": cl, "s": pdf["s"], "nrm": pdf["nrm"]}
            )

    asg = n.mapInPandas(
        assign, "vec_id long, cl long, s array<double>, nrm double"
    )

    # the pair stage is ALSO a per-cluster numpy matmul (applyInPandas
    # over the cluster key): the dot matrix costs m^2*d vectorized
    # flops per cluster vs m^2 interpreted HOF evaluations — same exact
    # int64 dots, same float64 cosine as the oracle (products <= 1e12,
    # 64-term sums <= 6.4e13, then one division). The matmul is BLOCKED
    # into PAIR_CHUNK-row strips so per-task memory is O(chunk·m)
    # doubles, never O(m²): adaptive K keeps the MEAN m near TARGET,
    # and chunking keeps a skewed cluster from OOMing a task.
    def cluster_pairs(pdf):
        S = np.stack(pdf["s"].to_numpy()).astype("int64")
        ids = pdf["vec_id"].to_numpy()
        nrm = pdf["nrm"].to_numpy()
        m = len(ids)
        n_dup = np.zeros(m, dtype="int64")
        for lo in range(0, m, SEMDEDUP_PAIR_CHUNK):
            hi = min(lo + SEMDEDUP_PAIR_CHUNK, m)
            cos = (S[lo:hi] @ S.T).astype("float64") / np.outer(
                nrm[lo:hi], nrm
            )
            n_dup += (
                (cos >= SEMDEDUP_TAU) & (ids[lo:hi, None] < ids[None, :])
            ).sum(axis=0)
        return pd.DataFrame(
            {"vec_id": ids, "cluster": pdf["cl"], "n_dup_lower": n_dup}
        )

    scored = asg.groupBy("cl").applyInPandas(
        cluster_pairs, "vec_id long, cluster long, n_dup_lower long"
    )
    return (
        scored.select(
            "vec_id",
            "cluster",
            "n_dup_lower",
            (F.col("n_dup_lower") == 0).alias("keep"),
        )
        # result-sized exchange before the sort (see operators/sortout.py)
        .repartition("vec_id")
        .orderBy("vec_id")
    )


# --- Johnson-Lindenstrauss random projection ------------------------------
#
# Dimensionality reduction BEFORE the ANN/dedup stages: a hash-derived
# Rademacher (+/-1) projection matrix preserves pairwise distances
# within (1 +/- eps) at k = O(log n / eps^2) output dims (Achlioptas
# 2003 — database-friendly random projections: +/-1 entries, no
# Gaussians needed), cutting every downstream cosine/L2 pass from d to
# k multiplies. The matrix is never materialized: sign(i, j) is the
# parity of the 60-bit md5 hash of "jl-i-j", so both engines (and any
# executor, any partition layout) derive the identical matrix.
JL_K = 16  # output dims for the d=64 fixture; k scales O(log n) at 100 TB


def jl_sign(i: int, j: int) -> int:
    """+1/-1 from the md5-prefix parity of 'jl-{i}-{j}' — the same
    60-bit md5-prefix derivation as the SQL oracle, computed ONCE per
    matrix entry on the driver (d x k scalars, a bounded collect like
    the IVF centroids) instead of once per exploded row: the per-row
    md5 made the first implementation 205M hash evaluations at sf1
    (16.9 s); the broadcast-matrix form is pure codegen'd
    multiply-adds."""
    import hashlib

    h = int(hashlib.md5(f"jl-{i}-{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


@register(
    "embedding_jl_project",
    f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
      FROM embeddings),
    ex AS (
      SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) - 1 AS i
      FROM e),
    proj AS (
      SELECT vec_id, j.j,
             CAST(SUM(CASE WHEN CAST('0x' || substr(
                       md5('jl-' || i || '-' || j.j), 1, 15) AS BIGINT)
                       % 2 = 0 THEN x ELSE -x END) AS BIGINT) AS p
      FROM ex CROSS JOIN (
        SELECT unnest(generate_series(0, {JL_K - 1})) AS j) j
      GROUP BY vec_id, j.j)
    SELECT vec_id, list(p ORDER BY j) AS proj
    FROM proj GROUP BY vec_id ORDER BY vec_id
    """,
    group="similarity",
    doc=f"Johnson-Lindenstrauss projection to {JL_K} dims with a "
    "hash-derived Rademacher matrix (Achlioptas 2003): component j of "
    "the output is Σ_i sign(md5('jl-i-j')) · q_i over the micro-"
    "quantized embedding — exact integer sums, so the oracle matches "
    "bit-for-bit and the projection is identical on every executor "
    "with the d x k sign entries derived once driver-side and shipped "
    "as a broadcast d-row table (bounded, like the IVF centroid "
    f"collect). Plan: ONE narrow posexplode (d rows per vector), a "
    f"broadcast join on component index, {JL_K} sum(sign_j * x) "
    "aggregates grouped by vec_id — a single shuffle on vec_id, "
    "no second explode over output dims, no Python, no per-row "
    "hashing (the first cut re-derived the sign by md5 per row per "
    "dim: 205M hash evaluations at sf1, 16.9 s; this form is "
    "codegen'd multiply-adds). At 100 TB this "
    "runs ahead of ANN/SemDeDup so every downstream distance pays "
    f"k={JL_K} instead of d multiplies; k grows O(log n / eps^2), "
    "independent of d.",
)
def embedding_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = e.agg(F.max(F.size("embedding"))).first()[0]  # one scalar
    matrix = spark.createDataFrame(
        [(i, [jl_sign(i, j) for j in range(JL_K)]) for i in range(d)],
        "i int, signs array<bigint>",
    )
    q = F.transform(
        "embedding",
        lambda x: (x.cast("double") * F.lit(1000000.0))
        .cast("bigint")  # trunc-to-micros (Spark cast truncates)
        ,
    )
    ex = e.select("vec_id", F.posexplode(q).alias("i", "x"))
    sums = [
        F.sum(F.col("signs").getItem(j) * F.col("x"))
        .cast("bigint")
        .alias(f"p{j}")
        for j in range(JL_K)
    ]
    return (
        ex.join(F.broadcast(matrix), "i")
        .groupBy("vec_id")
        .agg(*sums)
        .select(
            "vec_id",
            F.array(*[f"p{j}" for j in range(JL_K)]).alias("proj"),
        )
        # result-sized exchange before the sort (see operators/sortout.py)
        .repartition("vec_id")
        .orderBy("vec_id")
    )
