"""Deduplication operators for training-data pipelines (SURVEY §2C NS).

Five dedup strategies over `documents` / `embeddings`:

- exact (content hash groupBy) — O(n), one shuffle on the hash;
- MinHash + LSH banding — the 100 TB-scale near-dup path: shingle →
  K minhashes → B bands → bucket join; candidate pairs are verified
  with exact Jaccard. No O(n²) stage: the only join is on band
  buckets.
- SimHash — 32-bit locality-sensitive signature per doc; identical
  signatures are near-dup candidates;
- n-gram Jaccard — shared-shingle blocking + exact Jaccard (the
  verify-stage semantics as a standalone operator);
- embedding cosine — label-blocked near-dup pairs over the vector
  column.

All hashes derive from md5 prefixes (identical in Spark and DuckDB),
so every operator has an exact SQL oracle with fixed "permutation"
parameters — deterministic across engines and runs (FIXTURES
determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.exactmath import round6_ratio, round6_ratio_sql
from flink_stream_spark.operators.registry import register
from flink_stream_spark.operators.text import tok_hash_duck, _tok_hash_spark

# MinHash parameters (fixed-seed permutations j=1..K over a Mersenne
# prime field; a_j/b_j are deterministic functions of j)
K_PERM = 32
BANDS = 8
ROWS_PER_BAND = K_PERM // BANDS
P31 = 2147483647  # 2^31 - 1


def _shingle_index_range(n):
    """[0 .. n-3] for n >= 3 else empty — matching the oracle's
    generate_series(1, greatest(n-2, 0)). Spark's sequence(0, -1)
    yields [0, -1] (descending step), so the n<3 case must be gated
    explicitly or short docs produce degenerate shingles the oracle
    doesn't have."""
    return F.when(n >= 3, F.sequence(F.lit(0), (n - 3).cast("int"))).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )


def _shingles_spark(text_col):
    """Distinct 3-word shingles of a document (0-based array indexing)."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            _shingle_index_range(n),
            lambda i: F.concat_ws(
                " ", F.get(toks, i), F.get(toks, i + 1), F.get(toks, i + 2)
            ),
        )
    )


def shingled_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingles) with the token array materialized ONCE.

    Two deliberate plan choices for CPU-heavy text derivation:
    - repartition after the scan: a small compressed parquet file
      arrives as one input split, which would serialize all the
      shingling work onto one core (at 100 TB inputs arrive
      many-splits, but per-file parallelism still caps per-row CPU
      work — an explicit spread is the standard fix either way);
    - tokenize into a materialized column first, then index it —
      otherwise split(text) re-evaluates per shingle inside the
      lambda (no common-subexpression elimination inside HOFs).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    toked = docs.repartition(par, "doc_id").withColumn("__toks", F.split(F.col(text_col), " "))
    n = F.size(F.col("__toks"))
    shingles = F.array_distinct(
        F.transform(
            _shingle_index_range(n),
            lambda i: F.concat_ws(
                " ",
                F.get(F.col("__toks"), i),
                F.get(F.col("__toks"), i + 1),
                F.get(F.col("__toks"), i + 2),
            ),
        )
    )
    return toked.select("doc_id", shingles.alias("shingles"))


_SHINGLES_DUCK = """
    list_distinct(list_transform(
        generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
        i -> string_split(text, ' ')[i] || ' ' ||
             string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2]))
"""

# blocking-shingle document-frequency cap for the exact pair-verify
# family (dedup_ngram_jaccard / dedup_shingle_containment): a shingle
# appearing in more than BLOCK_DF_CAP documents generates NO candidate
# pairs. Without the cap one stop-shingle present in k·N documents
# explodes (k·N)² candidate rows before the group-by — the classic
# hot-key quadratic on a web corpus where common 3-grams cover a large
# fraction of documents. Rare shingles carry the near-dup signal
# (standard MinHash/blocking practice); the SCORE stays exact — the
# capped join only nominates candidates, the verify stage recounts the
# FULL shingle overlap per candidate pair. Candidate cost is bounded by
# Σ_{df≤cap} df² ≤ cap · |shingle occurrences| = O(N·cap), never N².
#
# RECALL BOUND (explicit): a pair is nominated iff it shares at least
# one shingle with document frequency ≤ BLOCK_DF_CAP. A near-duplicate
# cluster of MORE than BLOCK_DF_CAP documents makes every shingle it
# shares hot, so its pairs are NOT scored by this family — by design:
# such mega-clusters are exact or boilerplate duplication, which
# dedup_exact_hash (byte-identical), text_line_dedup /
# dedup_prefix_boilerplate (shared boilerplate), and the
# MinHash-LSH family (banded signatures, no df cap) already cover.
# The oracle SQL mirrors the cap, so engine and oracle agree exactly
# on which pairs are scored.
BLOCK_DF_CAP = 64


def shared_shingle_candidates(sh: DataFrame, df_cap: int = BLOCK_DF_CAP) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs sharing ≥1 shingle whose
    document frequency is ≤ df_cap (doc_a < doc_b). ``sh`` is the
    exploded (doc_id, shingle) set, one row per distinct shingle per
    doc. See BLOCK_DF_CAP for why hot shingles are excluded from
    blocking."""
    rare_shingles = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= df_cap)
        .select("shingle")
    )
    rare = sh.join(rare_shingles, "shingle")
    sa = rare.alias("sa")
    sb = rare.alias("sb")
    return (
        sa.join(
            sb,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _exact_pair_overlap(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared): EXACT |A∩B| over the FULL shingle sets,
    computed only for nominated candidate pairs — two equi-joins
    (doc_a, then (doc_b, shingle)), each linear in
    |candidates| × |shingles per doc|."""
    a_side = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_side = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        cand.join(a_side, "doc_a")
        .join(b_side, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


_RARE_CAND_DUCK = f"""
    dfreq AS (
      SELECT shingle FROM doc_shingles
      GROUP BY shingle HAVING COUNT(*) <= {BLOCK_DF_CAP}),
    rare AS (
      SELECT s.doc_id, s.shingle
      FROM doc_shingles s JOIN dfreq USING (shingle)),
    cand AS (
      SELECT DISTINCT sa.doc_id AS doc_a, sb.doc_id AS doc_b
      FROM rare sa JOIN rare sb
        ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
    pair_overlap AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
      FROM cand c
      JOIN doc_shingles sa ON sa.doc_id = c.doc_a
      JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2)
"""


@register(
    "dedup_exact_hash",
    """
    WITH hashed AS (
      SELECT doc_id, sha256(text) AS content_hash FROM documents)
    SELECT content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM hashed
    GROUP BY content_hash
    ORDER BY keep_doc_id
    """,
    group="dedup",
    doc="Exact dedup by SHA-256 content hash: keep min doc_id per hash. "
    "One hash-groupBy shuffle; at 100 TB the hash (32 B) shuffles, "
    "never the document bodies.",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2("text", 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


def _perm_params(j: int) -> tuple[int, int]:
    return 2 * j + 1, (j * 40503) % P31


def minhash_wide(
    docs: DataFrame, text_col: str = "text", shingled: DataFrame | None = None
) -> DataFrame:
    """(doc_id, mh_1 .. mh_K) — MinHash signatures, one column per
    permutation (the codegen-friendly wide form; see
    minhash_signature_arrays for the array form).

    Plan shape: explode distinct shingles → one md5-derived hash per
    shingle row → groupBy(doc_id) with K codegen'd MIN aggregates.
    Each permutation is a plain arithmetic expression inside the
    hash-aggregate, so all K×|shingles| evaluations run in
    whole-stage codegen (higher-order array lambdas are interpreted
    per element and measured ~5× slower). Map-side partial
    aggregation means the shuffle carries |docs|×K integers no
    matter how long the documents are — the 100 TB posture.
    """
    # explode_outer: plain explode lets Catalyst infer a
    # size(shingles)>0 filter whose full shingle expression is pushed
    # below the repartition exchange — serializing all shingling into
    # the single-split scan task AND computing it twice. explode_outer
    # carries no such constraint; the null row is dropped after.
    sh = (
        (shingled if shingled is not None else shingled_docs(docs, text_col))
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    h = sh.select("doc_id", (_tok_hash_spark(F.col("shingle")) % P31).alias("h"))

    def _perm_min(j: int):
        a, b = _perm_params(j)
        return F.min((F.col("h") * a + b) % P31).alias(f"mh_{j}")

    return h.groupBy("doc_id").agg(*[_perm_min(j) for j in range(1, K_PERM + 1)])


def minhash_signature_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<bigint>[K_PERM]) — array form of the wide frame."""
    wide = minhash_wide(docs, text_col)
    sig = F.array(*[F.col(f"mh_{j}") for j in range(1, K_PERM + 1)])
    return wide.select("doc_id", sig.alias("sig"))


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, j, minhash) long format — explode of the array form."""
    arr = minhash_signature_arrays(docs, text_col)
    return arr.select(
        "doc_id",
        F.posexplode("sig").alias("j0", "minhash"),
    ).select("doc_id", (F.col("j0") + 1).alias("j"), "minhash")


_MINHASH_DUCK = f"""
    WITH perms AS (
      SELECT j, 2*j + 1 AS a, (j * 40503) % {P31} AS b
      FROM (SELECT unnest(generate_series(1, {K_PERM})) AS j)),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    hashed AS (
      SELECT DISTINCT doc_id, {tok_hash_duck('shingle')} % {P31} AS h FROM shingled),
    sigs AS (
      SELECT doc_id, j, MIN((a * h + b) % {P31}) AS minhash
      FROM hashed CROSS JOIN perms
      GROUP BY doc_id, j)
"""


@register(
    "dedup_minhash_signature",
    _MINHASH_DUCK
    + """
    SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(minhash AS BIGINT) AS minhash
    FROM sigs
    ORDER BY doc_id, j
    """,
    group="dedup",
    doc="MinHash signature matrix (K=32, fixed permutation params) — "
    "bit-identical across engines via the md5-prefix shingle hash.",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        minhash_signatures(d)
        .select("doc_id", F.col("j").cast("bigint").alias("j"), F.col("minhash").cast("bigint"))
        .orderBy("doc_id", "j")
    )


def banded_frame(sig_wide: DataFrame) -> DataFrame:
    """(doc_id, band, sig) — the LSH bucket keys of each document.

    Band signature = comma-joined concat of that band's ROWS_PER_BAND
    minhash columns — plain ``concat_ws`` over the wide columns, fully
    codegen'd (the array-form slice+transform alternative is an
    interpreted per-element lambda). One explode to BANDS rows per
    doc. The single source of the banding layout: both the batch pair
    pipeline and the streaming incremental index derive from this
    frame, so the (bands, rows-per-band, separator) contract cannot
    drift between them.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{b * ROWS_PER_BAND + r}")
                        for r in range(1, ROWS_PER_BAND + 1)
                    ],
                ).alias("sig_str"),
            )
            for b in range(BANDS)
        ]
    )
    return sig_wide.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig_str").alias("sig")
    )


def lsh_candidate_pairs(sig_wide: DataFrame) -> DataFrame:
    """Band the wide signature frame and self-join buckets → candidate
    pairs. The join key is (band, signature): only same-bucket docs
    pair up, so the cost is Σ bucket² — LSH's point — not n².
    """
    banded = banded_frame(sig_wide)
    # bucket-group instead of self-join: the signature pipeline is
    # evaluated ONCE, and pairs are expanded inside each bucket's
    # sorted doc_id array (buckets are small by construction — that is
    # LSH's contract; a hot bucket means the band config is wrong)
    buckets = (
        banded.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


@register(
    "dedup_minhash_lsh_pairs",
    _MINHASH_DUCK
    + f"""
    , banded AS (
      SELECT doc_id, CAST(FLOOR((j - 1) / {ROWS_PER_BAND}) AS INTEGER) AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS sig
      FROM sigs GROUP BY doc_id, 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    doc_shingles AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    pair_overlap AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
      FROM cand c
        JOIN doc_shingles sa ON sa.doc_id = c.doc_a
        JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
      GROUP BY c.doc_a, c.doc_b),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id)
    SELECT p.doc_a, p.doc_b,
           {round6_ratio_sql('p.shared', 'za.n + zb.n - p.shared')} AS jaccard
    FROM pair_overlap p JOIN sizes za ON za.doc_id = p.doc_a
                        JOIN sizes zb ON zb.doc_id = p.doc_b
    WHERE CAST(p.shared AS DOUBLE) / (za.n + zb.n - p.shared) >= 0.5
    ORDER BY p.doc_a, p.doc_b
    """,
    group="dedup",
    doc="Full MinHash-LSH near-dup pipeline: shingle → K=32 minhashes → "
    "8 bands × 4 rows → bucket self-join → exact-Jaccard verify ≥ 0.5. "
    "The scale path for near-dedup at 100 TB (no O(n²) stage).",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    shingled = shingled_docs(d)
    cand = lsh_candidate_pairs(minhash_wide(d))
    sa = shingled.alias("sa")
    sb = shingled.alias("sb")
    # verify: exact Jaccard via array_intersect on the two shingle sets —
    # two doc_id joins (broadcast-able doc→shingles side at any scale
    # where candidates << corpus), no shingle-level explode. sa/sb are
    # the SAME canonical subtree as the minhash input, so Spark's
    # ReuseExchange evaluates the shingling pass once for the whole
    # pipeline (verified: a candidate-semi-filtered variant that broke
    # the reuse measured ~1.6x slower end-to-end).
    shared = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    union = F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles")) - shared
    jac = shared.cast("double") / union
    return (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", round6_ratio(shared, union).alias("jaccard"))
        # no pre-sort exchange here: the verify join's output is already
        # hash-partitioned on (doc_a, doc_b)-compatible keys, so Catalyst
        # elides a repartition on those keys (round-9 after-plan showed
        # the inserted node missing — it was a documented no-op)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents),
    hashed AS (
      SELECT doc_id, {tok_hash_duck('tok')} % {P31} AS h FROM toks),
    bits AS (
      SELECT doc_id, b.b AS bit,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 30)) AS b) b
      GROUP BY doc_id, b.b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    group="dedup",
    doc="SimHash (31-bit) over distinct tokens: per-bit vote of "
    "md5-derived token hashes. Equal signatures → near-dup candidates.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one groupBy(doc_id) with 31 codegen'd per-bit vote aggregates —
    # the minhash_wide trick. The earlier crossJoin-with-bits form
    # materialized |tokens|×31 intermediate rows and a second shuffle;
    # this form's shuffle is |docs|×31 ints with map-side combine.
    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = (
        d.repartition(par, "doc_id")
        .select("doc_id", F.explode_outer(F.array_distinct(F.split("text", " "))).alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    h = toks.select("doc_id", (_tok_hash_spark(F.col("tok")) % P31).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(31)
    ]
    wide = h.groupBy("doc_id").agg(*votes)
    simhash = None
    for b in range(31):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash = term if simhash is None else simhash + term
    return (
        wide.select("doc_id", simhash.cast("bigint").alias("simhash"))
        .orderBy("doc_id")
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH doc_shingles AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    {_RARE_CAND_DUCK},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id)
    SELECT p.doc_a, p.doc_b,
           {round6_ratio_sql('p.shared', 'za.n + zb.n - p.shared')} AS jaccard
    FROM pair_overlap p JOIN sizes za ON za.doc_id = p.doc_a
                        JOIN sizes zb ON zb.doc_id = p.doc_b
    WHERE CAST(p.shared AS DOUBLE) / (za.n + zb.n - p.shared) >= 0.6
    ORDER BY p.doc_a, p.doc_b
    """,
    group="dedup",
    doc="n-gram Jaccard near-dup, two-phase: candidates from shingles "
    f"with document frequency ≤ {BLOCK_DF_CAP} (hot stop-shingles "
    "never block — kills the (k·N)² hot-key blowup), then EXACT "
    "Jaccard ≥ 0.6 over the full distinct-3-gram sets per candidate. "
    "Recall bound: pairs whose every shared shingle is hot (clusters "
    f"of > {BLOCK_DF_CAP} near-identical docs) are not scored — "
    "exact-hash and MinHash-LSH (no df cap) cover those; the oracle "
    "mirrors the cap.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = (
        shingled_docs(d)
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    overlap = _exact_pair_overlap(shared_shingle_candidates(sh), sh)
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    union = F.col("za.n") + F.col("zb.n") - F.col("shared")
    jac = F.col("shared").cast("double") / union
    return (
        overlap.join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", round6_ratio(F.col("shared"), union).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# Jaccard threshold for the prefix-filter join, kept as an integer
# ratio (3/5 = 0.6, matching dedup_ngram_jaccard) so BOTH the prefix
# length n - ceil(tau*n) + 1 and the final accept test
# 5*shared >= 3*union are exact integer arithmetic in both engines.
JPF_TAU_NUM, JPF_TAU_DEN = 3, 5


@register(
    "dedup_jaccard_prefix_filter",
    f"""
    WITH doc_shingles AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id),
    dfreq AS (SELECT shingle, COUNT(*) AS df
              FROM doc_shingles GROUP BY shingle),
    ranked AS (
      SELECT s.doc_id, s.shingle, z.n,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                ORDER BY d.df, s.shingle) AS rk
      FROM doc_shingles s JOIN dfreq d USING (shingle)
      JOIN sizes z ON z.doc_id = s.doc_id),
    prefix AS (
      SELECT doc_id, shingle FROM ranked
      WHERE rk <= n - ({JPF_TAU_NUM} * n + {JPF_TAU_DEN - 1})
                      // {JPF_TAU_DEN} + 1),
    cand AS (
      SELECT DISTINCT pa.doc_id AS doc_a, pb.doc_id AS doc_b
      FROM prefix pa JOIN prefix pb
        ON pa.shingle = pb.shingle AND pa.doc_id < pb.doc_id),
    sized AS (
      SELECT c.doc_a, c.doc_b, za.n AS na, zb.n AS nb
      FROM cand c JOIN sizes za ON za.doc_id = c.doc_a
                  JOIN sizes zb ON zb.doc_id = c.doc_b
      WHERE {JPF_TAU_DEN} * LEAST(za.n, zb.n)
            >= {JPF_TAU_NUM} * GREATEST(za.n, zb.n)),
    ov AS (
      SELECT s.doc_a, s.doc_b, s.na, s.nb, COUNT(*) AS shared
      FROM sized s
      JOIN doc_shingles sa ON sa.doc_id = s.doc_a
      JOIN doc_shingles sb ON sb.doc_id = s.doc_b
                          AND sb.shingle = sa.shingle
      GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b,
           CAST(shared AS BIGINT) AS shared,
           CAST(na + nb - shared AS BIGINT) AS union_n,
           {{jaccard}} AS jaccard
    FROM ov
    WHERE {JPF_TAU_DEN} * shared >= {JPF_TAU_NUM} * (na + nb - shared)
    ORDER BY doc_a, doc_b
    """.replace(
        "{jaccard}", round6_ratio_sql("shared", "na + nb - shared")
    ),
    group="dedup",
    doc="EXACT Jaccard >= 0.6 similarity join with COMPLETE recall via "
    "prefix filtering (SSJoin, Chaudhuri et al. ICDE'06; PPJoin, Xiao "
    "et al. WWW'08): rank each document's distinct 3-gram shingles by "
    "global (document-frequency, shingle) ascending — rarest first — "
    "and explode only the first n - ceil(tau*n) + 1 of them; any pair "
    "with Jaccard >= tau MUST share a prefix token under a consistent "
    "global order, so unlike dedup_ngram_jaccard's df-capped blocking "
    "(which documents a recall bound: pairs sharing only hot shingles "
    "are never scored) this join provably nominates EVERY qualifying "
    "pair. Hot stop-shingles sort LAST in the global order and so "
    "almost never enter a prefix — the hot-key quadratic is avoided "
    "by ordering, not by dropping recall. Scale (see the builder "
    "docstring for the measured sf1 numbers): exact-dup groups "
    "collapse to one representative before the join (J is a pure "
    "function of text, so rep verdicts expand losslessly to member "
    "pairs — candidate work scales with DISTINCT content), the "
    "length filter tau*|larger| <= |smaller| AND PPJoin's positional "
    "filter (remaining-overlap bound vs the tau floor, recall-safe "
    "via the first-shared-token argument) ride the join condition, "
    "and the verify is a JVM-side array_intersect over per-doc "
    "sorted shingle arrays. Accept is the integer test 5*shared >= "
    "3*union (no float threshold, engines agree bit-exactly). "
    "Completeness is property-tested against a brute-force all-pairs "
    "oracle incl. a replicated-corpus case "
    "(tests/test_jaccard_prefix.py).",
)
def dedup_jaccard_prefix_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Three scale levers beyond the naive prefix join (each measured
    at sf1 on the replicated probe corpus, where the naive shape
    produced 29.1M candidate pairs from 2.65M shingle rows):

    1. EXACT-DUP COLLAPSE first: group docs by content hash and run
       the entire similarity join on ONE representative per distinct
       text — J(a,b) is a pure function of the texts, so every
       rep-level verdict expands losslessly to all member pairs.
       Candidate work scales with DISTINCT content; the part that
       stays quadratic in cluster size is the output itself. This is
       what production crawls do (exact-dedup before near-dup mining).
    2. PPJoin POSITIONAL filter in the join condition (Xiao et al.
       WWW'08): a match on prefix positions (ra, rb) can reach overlap
       at most min(na-ra, nb-rb)+1, so require that to clear the
       tau-overlap floor ceil(tau/(1+tau)*(na+nb)) — recall-safe (for
       a qualifying pair, its FIRST shared token in the global order
       satisfies the bound), kills deep-prefix coincidences before
       the distinct. The length filter rides the same join condition.
    3. Verify by per-doc sorted shingle ARRAYS + array_intersect
       (JVM-side, exact distinct-set intersection) instead of a
       double explode-join — one row per candidate pair instead of
       ~|shingles| rows per pair.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    docs = d.repartition(par, "doc_id").select(
        "doc_id", F.md5(F.encode("text", "utf-8")).alias("gkey"), "text"
    )
    members = docs.select("gkey", "doc_id").persist()
    # one representative per distinct text: min doc_id carries the text
    reps = (
        docs.groupBy("gkey")
        .agg(F.min(F.struct("doc_id", "text")).alias("s"))
        .select(
            F.col("s.doc_id").alias("doc_id"), F.col("s.text").alias("text")
        )
    )
    sh = (
        shingled_docs(reps)
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .persist()
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # rank + set size in ONE window shuffle (count over the same
    # partition spec rides the row_number sort)
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    wn = Window.partitionBy("doc_id")
    prefix_len = (
        F.col("n")
        - F.expr(
            f"({JPF_TAU_NUM} * n + {JPF_TAU_DEN - 1}) div {JPF_TAU_DEN}"
        )
        + F.lit(1)
    )
    # The nomination join carries the 60-bit md5-prefix hash instead
    # of the raw 3-gram string (round-10): equal shingles always hash
    # equal, so no qualifying pair is ever lost, and a (vanishingly
    # unlikely) collision only NOMINATES an extra pair that the exact
    # verify below rejects — the result is provably identical under
    # ANY hash behavior, while the four nomination-join exchanges
    # shuffle 8-byte longs instead of ~25-byte strings (guide §2.3
    # narrower types). Ranking (df, shingle) stays on the raw string.
    from flink_stream_spark.operators.text import _tok_hash_spark

    prefix = (
        sh.join(dfreq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rk") <= prefix_len)
        .select(
            "doc_id", _tok_hash_spark(F.col("shingle")).alias("shingle"),
            "rk", "n",
        )
    )
    pa = prefix.select(
        F.col("doc_id").alias("rep_a"),
        F.col("shingle").alias("sh_a"),
        F.col("rk").alias("ra"),
        F.col("n").alias("na"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("rep_b"),
        F.col("shingle").alias("sh_b"),
        F.col("rk").alias("rb"),
        F.col("n").alias("nb"),
    )
    # overlap floor for J >= tau: ceil(tau/(1+tau) * (na+nb))
    alpha = F.expr(
        f"({JPF_TAU_NUM} * (na + nb) + {JPF_TAU_NUM + JPF_TAU_DEN - 1}) "
        f"div {JPF_TAU_NUM + JPF_TAU_DEN}"
    )
    cand = (
        pa.join(
            pb,
            (F.col("sh_a") == F.col("sh_b"))
            & (F.col("rep_a") < F.col("rep_b"))
            & (
                F.lit(JPF_TAU_DEN) * F.least("na", "nb")
                >= F.lit(JPF_TAU_NUM) * F.greatest("na", "nb")
            )
            & (
                F.least(
                    F.col("na") - F.col("ra"), F.col("nb") - F.col("rb")
                )
                + 1
                >= alpha
            ),
        )
        .select("rep_a", "rep_b")
        .distinct()
    )
    # Verify arrays carry the same 60-bit hash: the exact-intersect
    # count over hashed elements equals the string-set count under
    # the md5-collision-freedom assumption this file already relies
    # on for gkey exact-dup groups (md5(text) defines group identity
    # above). At sf1 the verify's pair-side shuffle was 1.5 GB of
    # string arrays (the round-10 stage profile's dominant stage,
    # 3628 s task time); 8-byte elements cut the bytes ~3-4x and turn
    # the per-pair array_intersect into long comparisons.
    docarr = sh.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(_tok_hash_spark(F.col("shingle")))
        ).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = docarr.select(
        F.col("doc_id").alias("rep_a"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    ab = docarr.select(
        F.col("doc_id").alias("rep_b"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("arr_a", "arr_b"))
    union = F.col("na") + F.col("nb") - F.col("shared")
    rep_pairs = (
        cand.join(aa, "rep_a")
        .join(ab, "rep_b")
        .withColumn("shared", shared)
        .filter(F.lit(JPF_TAU_DEN) * F.col("shared") >= F.lit(JPF_TAU_NUM) * union)
        .select("rep_a", "rep_b", "shared", union.alias("union_n"))
    )
    # expansion: rep verdicts -> all member pairs
    rep2g = docs.groupBy("gkey").agg(F.min("doc_id").alias("rep_id"))
    ga = rep2g.select(
        F.col("rep_id").alias("rep_a"), F.col("gkey").alias("gk_a")
    )
    gb = rep2g.select(
        F.col("rep_id").alias("rep_b"), F.col("gkey").alias("gk_b")
    )
    ma = members.select(F.col("gkey").alias("gk_a"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("gkey").alias("gk_b"), F.col("doc_id").alias("db"))
    cross = (
        rep_pairs.join(ga, "rep_a")
        .join(gb, "rep_b")
        .join(ma, "gk_a")
        .join(mb, "gk_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "shared",
            "union_n",
        )
    )
    # within-group pairs: identical texts, J = 1 (groups whose text
    # yields zero shingles are excluded — Jaccard is undefined there)
    gsize = docarr.select(
        F.col("doc_id").alias("rep_id"), F.col("n").alias("gn")
    ).join(rep2g, "rep_id")
    m1 = members.select("gkey", F.col("doc_id").alias("doc_a"))
    m2 = members.select("gkey", F.col("doc_id").alias("doc_b"))
    within = (
        gsize.join(m1, "gkey")
        .join(m2, "gkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("gn").alias("shared"),
            F.col("gn").alias("union_n"),
        )
    )
    return (
        cross.unionAll(within)
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("union_n").cast("bigint").alias("union_n"),
            round6_ratio(F.col("shared"), F.col("union_n")).alias("jaccard"),
        )
        # materialize the RESULT rows in a hash exchange before the
        # output sort (round-9 optimization): a global sort's range
        # partitioner runs a sampling job over its child, and here the
        # child is the whole verify+expansion pipeline — the two
        # heaviest stages of the profiled run were that pipeline
        # executed TWICE (sample pass then shuffle-write pass,
        # 29.2 s + 13.5 s task time at sf0.1). With the result-sized
        # exchange in between, the sample re-reads kilobytes of
        # shuffle files instead of re-running the verify. Output rows
        # are pair verdicts (tiny vs the work that produces them), so
        # the extra exchange is result-sized at every scale; AQE
        # coalesces it. Measured sf0.1: 3.75 -> 2.84 s min-of-5.
        .repartition("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, CAST(ROUND(cos, 6) AS DOUBLE) AS cosine
    FROM pairs
    WHERE cos >= 0.4
    ORDER BY vec_a, vec_b
    """,
    group="dedup",
    doc="Embedding-cosine near-dup with label blocking (cluster-local "
    "pairs only — the blocked variant of O(n²) similarity).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # spread the probe side (single-split scan), broadcast the build
    # side: pair generation AND the per-pair cosine run fully parallel
    # with no pair-level shuffle (a label-keyed shuffle would collapse
    # to ≤|labels| partitions and serialize the cosine work).
    # Norms are precomputed per row (not per pair): only the dot
    # product remains in the pair loop — same values, 3× less
    # interpreted-lambda work.
    par = spark.sparkContext.defaultParallelism
    en = e.withColumn("__norm", _norm_expr(F.col("embedding")))
    a = en.repartition(par, "vec_id").alias("a")
    b = en.alias("b")
    cos = _dot_expr(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.__norm") * F.col("b.__norm")
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Undirected connected components by iterative min-label
    propagation: every node starts labeled with itself; each round
    takes the min of its own and its neighbors' labels; fixpoint in
    ≤ diameter rounds (near-dup clusters are shallow by construction).

    ``edges`` is (doc_a, doc_b); returns (doc_id, label) for every
    node appearing in an edge, label = min doc_id of its component.

    Scale posture: each round is one shuffle-join + one min-aggregate
    (both on the node key, so AQE reuses the partitioning); labels are
    localCheckpoint-ed per round to truncate lineage — on a cluster
    use `spark.sparkContext.setCheckpointDir` + `.checkpoint()` for
    fault-tolerant truncation instead. Convergence is detected by the
    strictly-decreasing label sum (min-propagation is monotone), one
    scalar per round — no full-frame comparison.

    Each round ALSO applies pointer doubling (label <- label(label), a
    self-join on the label key): plain neighbor-min needs DIAMETER
    rounds, so a chain-shaped component — boilerplate docs forming a
    path in the pair graph, a real web-corpus shape — would need as
    many rounds as its length; with compression the label horizon
    doubles per round, so convergence is O(log diameter) (the
    path-halving half of classic parallel CC, cf. Shiloach-Vishkin).
    Pinned by a planted 400-node chain test that must converge within
    the fixed iteration budget.
    """
    bidir = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = (
        bidir.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            bidir.join(labels, bidir.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer doubling: label <- label(label). label(u) is always a
        # node of u's component with a label <= its own (min-propagation
        # invariant), so the substitution stays inside the component and
        # is monotone non-increasing — same fixpoint, O(log diameter)
        # rounds instead of O(diameter).
        via = stepped.select(
            F.col("doc_id").alias("label"), F.col("label").alias("label2")
        )
        labels = (
            stepped.join(via, "label", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("label2"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


_VERIFIED_PAIRS_DUCK = (
    _MINHASH_DUCK
    + f"""
    , banded AS (
      SELECT doc_id, CAST(FLOOR((j - 1) / {ROWS_PER_BAND}) AS INTEGER) AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS sig
      FROM sigs GROUP BY doc_id, 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    doc_shingles AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    pair_overlap AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
      FROM cand c
        JOIN doc_shingles sa ON sa.doc_id = c.doc_a
        JOIN doc_shingles sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
      GROUP BY c.doc_a, c.doc_b),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id),
    verified AS (
      SELECT p.doc_a, p.doc_b
      FROM pair_overlap p JOIN sizes za ON za.doc_id = p.doc_a
                          JOIN sizes zb ON zb.doc_id = p.doc_b
      WHERE CAST(p.shared AS DOUBLE) / (za.n + zb.n - p.shared) >= 0.5)
"""
)


# transitive closure over the verified pair graph — the single source
# for every cluster-based oracle (assignment, canonical doc, dup rate);
# callers prepend _VERIFIED_PAIRS_DUCK with the WITH RECURSIVE rewrite
_CLUSTERED_DUCK = """
    , cluster_edges AS (
      SELECT doc_a AS a, doc_b AS b FROM verified
      UNION ALL
      SELECT doc_b, doc_a FROM verified),
    reach AS (
      SELECT DISTINCT a AS doc, a AS other FROM cluster_edges
      UNION
      SELECT e.b, r.other FROM reach r JOIN cluster_edges e ON e.a = r.doc),
    clustered AS (
      SELECT doc, MIN(other) AS cluster_id FROM reach GROUP BY doc)
"""

_VERIFIED_CLUSTERED_DUCK = (
    _VERIFIED_PAIRS_DUCK.replace("WITH perms", "WITH RECURSIVE perms", 1)
    + _CLUSTERED_DUCK
)


@register(
    "dedup_cluster_assign",
    _VERIFIED_CLUSTERED_DUCK
    + """
    SELECT d.doc_id, CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN clustered c ON c.doc = d.doc_id
    ORDER BY d.doc_id
    """,
    group="dedup",
    doc="Near-dup cluster assignment: connected components over the "
    "Jaccard-verified MinHash-LSH pair graph (iterative min-label "
    "propagation; DuckDB oracle via recursive transitive closure). "
    "Every doc gets a cluster_id = min doc_id of its component; "
    "singletons keep their own id — the keep-one-per-cluster step of "
    "a corpus dedup pipeline follows as a trivial groupBy.",
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs)
    return (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )


def _norm_expr(v):
    """L2 norm of a float array in float64, left-to-right accumulation
    (matches DuckDB's evaluation order)."""
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _dot_expr(va, vb):
    """Float64 dot product, left-to-right accumulation."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine_expr(va, vb):
    """Cosine similarity of two float arrays, computed in float64 with
    left-to-right accumulation (matches DuckDB's list_cosine_similarity
    evaluation order).

    NOTE: higher-order array lambdas are interpreted per element; when
    one side appears in many pairs, precompute its `_norm_expr` ONCE
    per row before the join and divide `_dot_expr` by the norm product
    instead — identical values (same accumulation order), ~3× less
    lambda work per pair.
    """
    return _dot_expr(va, vb) / (_norm_expr(va) * _norm_expr(vb))


@register(
    "dedup_prefix_boilerplate",
    """
    WITH p AS (
      SELECT doc_id, md5(substr(text, 1, 80)) AS prefix_hash FROM documents)
    SELECT prefix_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM p
    GROUP BY prefix_hash
    HAVING COUNT(*) > 1
    ORDER BY keep_doc_id
    """,
    group="dedup",
    doc="Prefix-boilerplate detection: documents sharing an identical "
    "80-char prefix (templated headers, scraped navigation chrome) "
    "group by prefix md5 — keep min doc_id, flag the rest. One 16-byte "
    "hash shuffle with map-side combine; the document bodies never "
    "move. The cheap complement to MinHash for the exact-prefix "
    "duplication class that dominates web corpora.",
)
def dedup_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.substring("text", 1, 80)).alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("keep_doc_id")
    )


@register(
    "dedup_shingle_containment",
    f"""
    WITH doc_shingles AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents),
    {_RARE_CAND_DUCK},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM doc_shingles GROUP BY doc_id)
    SELECT p.doc_a, p.doc_b,
           {round6_ratio_sql('p.shared', 'LEAST(za.n, zb.n)')}
             AS containment
    FROM pair_overlap p JOIN sizes za ON za.doc_id = p.doc_a
                        JOIN sizes zb ON zb.doc_id = p.doc_b
    WHERE CAST(p.shared AS DOUBLE) / LEAST(za.n, zb.n) >= 0.8
    ORDER BY p.doc_a, p.doc_b
    """,
    group="dedup",
    doc="ASYMMETRIC containment dedup: |A∩B| / min(|A|,|B|) ≥ 0.8 over "
    "3-gram shingle sets — catches a short document embedded inside a "
    "longer one (quote farms, concatenated scrapes), which symmetric "
    "Jaccard misses because the union dilutes the score. Two-phase "
    f"like the Jaccard variant: df ≤ {BLOCK_DF_CAP} blocking, exact "
    "overlap recount per candidate (never n², even on hot shingles). "
    f"Same recall bound: clusters of > {BLOCK_DF_CAP} near-identical "
    "docs make all their shingles hot and are left to exact-hash / "
    "MinHash-LSH; the oracle mirrors the cap.",
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = (
        shingled_docs(d)
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    overlap = _exact_pair_overlap(shared_shingle_candidates(sh), sh)
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    mins = F.least(F.col("za.n"), F.col("zb.n"))
    cont = F.col("shared").cast("double") / mins
    return (
        overlap.join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .filter(cont >= 0.8)
        .select("doc_a", "doc_b", round6_ratio(F.col("shared"), mins).alias("containment"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_fuzzy_levenshtein",
    """
    WITH vocab AS (
      SELECT DISTINCT p_name AS t FROM part),
    named AS (
      SELECT t, string_split(t, ' ')[1] AS block FROM vocab)
    SELECT a.t AS name_a, b.t AS name_b,
           CAST(levenshtein(a.t, b.t) AS INTEGER) AS lev_dist
    FROM named a JOIN named b
      ON a.block = b.block AND a.t < b.t
    WHERE levenshtein(a.t, b.t) <= 3
    ORDER BY name_a, name_b
    """,
    group="dedup",
    doc="Fuzzy string matching for entity resolution (typo/variant "
    "unification): pairs of DISTINCT p_name vocabulary values within "
    "Levenshtein distance 3, candidate-blocked on the first token. "
    "Matching the distinct-value dictionary instead of raw rows is the "
    "scale pattern — the vocabulary is bounded (150 values at any SF) "
    "while the fact table grows, so the edit-distance kernel's cost is "
    "O(|vocab|^2/blocks), independent of table size; the resulting "
    "canonical-form mapping then broadcasts back onto the corpus. "
    "Levenshtein is the classic integer DP, bit-identical in both "
    "engines.",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("t"))
        .distinct()
        .withColumn("block", F.split("t", " ")[0])
    )
    a = vocab.select(F.col("t").alias("name_a"), "block")
    b = vocab.select(F.col("t").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("lev_dist"),
        )
        .filter(F.col("lev_dist") <= 3)
        .orderBy("name_a", "name_b")
    )


# ExactSubstr-style duplicate-span detection (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): a
# position is duplicated when its K_SPAN-token gram occurs >= 2 times
# corpus-wide; overlapping/adjacent duplicated positions merge into
# maximal spans. K_SPAN is small here because the fixture docs are
# short; the paper uses 50 tokens.
K_SPAN = 5


@register(
    "dedup_exact_substr_spans",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    stats AS (SELECT doc_id, len(ts) AS n_tokens FROM toks),
    pos AS (
      SELECT doc_id, i,
             {tok_hash_duck(f"array_to_string(ts[i:i+{K_SPAN}-1], ' ')")} AS g
      FROM toks,
           unnest(generate_series(1, greatest(len(ts) - {K_SPAN} + 1, 0))) AS t(i)),
    freq AS (SELECT g FROM pos GROUP BY g HAVING COUNT(*) >= 2),
    dup AS (SELECT p.doc_id, p.i FROM pos p JOIN freq USING (g)),
    marked AS (
      SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
      FROM dup),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS dup_positions,
             CAST(SUM(CASE WHEN pi IS NULL THEN {K_SPAN}
                           ELSE least({K_SPAN}, i - pi) END) AS BIGINT) AS dup_tokens,
             CAST(SUM(CASE WHEN pi IS NULL OR i - pi > {K_SPAN} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_spans
      FROM marked GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(s.n_tokens AS BIGINT) AS n_tokens,
           COALESCE(d.dup_positions, 0) AS dup_positions,
           COALESCE(d.dup_tokens, 0) AS dup_tokens,
           COALESCE(d.n_spans, 0) AS n_spans,
           {round6_ratio_sql('COALESCE(d.dup_tokens, 0)', 's.n_tokens')} AS dup_frac
    FROM stats s LEFT JOIN per_doc d USING (doc_id)
    ORDER BY doc_id
    """,
    group="dedup",
    doc=f"ExactSubstr duplicate-span detection (Lee et al. 2022): every "
    f"{K_SPAN}-token positional gram occurring >= 2 times corpus-wide "
    "marks its start position duplicated; per doc, duplicated positions "
    "merge into maximal covered spans (adjacent-or-overlapping "
    f"positions, gap > {K_SPAN} starts a new span) and the output "
    "reports position/token/span counts plus the duplicated-token "
    "fraction. Scale: the positional-gram explode is narrow; grams "
    "shuffle once as 60-bit hashes (never the strings) for the "
    "frequency count with map-side partial agg; the duplicate filter "
    "join back is 1:1 per position on the gram hash (AQE-skew-safe — a "
    "hot gram fans out only to its own positions, never pairs); span "
    "merging is a per-doc window (partitioned by doc_id, bounded by "
    "tokens-per-doc). No stage is quadratic in corpus size — this is "
    "the scan-based alternative to the paper's suffix-array build. "
    "FIDELITY vs Lee et al.'s suffix-array method (exact statement of "
    "what is and isn't detected): a duplicated run of >= K_SPAN tokens "
    "is always detected with its exact maximal extent (every window "
    "inside the run repeats); a duplicated run SHORTER than K_SPAN "
    f"tokens (< {K_SPAN}) is NOT detected — no {K_SPAN}-gram fits "
    "inside it, while the suffix array finds duplicates at every "
    "length. The paper itself thresholds at 50 tokens, so the k-gram "
    "pass computes the same answer as suffix arrays restricted to "
    "spans >= the threshold; only sub-threshold spans differ "
    "(suffix-array: reported; here: absent by construction). "
    "Semantics pinned by tests/test_corpus_curation_ops.py, including "
    "the negative sub-K_SPAN case.",
)
def dedup_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toked = d.repartition(par, "doc_id").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    n = F.size("ts")
    stats = toked.select("doc_id", n.cast("bigint").alias("n_tokens"))
    gram_starts = F.when(
        n >= K_SPAN, F.sequence(F.lit(1), (n - K_SPAN + 1).cast("int"))
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    pos = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                gram_starts,
                lambda i: F.struct(
                    i.alias("i"),
                    _tok_hash_spark(
                        F.array_join(F.slice(F.col("ts"), i, K_SPAN), " ")
                    ).alias("g"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.i").alias("i"), F.col("p.g").alias("g"))
    dup_grams = (
        pos.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("g")
    )
    dup = pos.join(dup_grams, "g").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    marked = dup.withColumn("pi", F.lag("i").over(w))
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_positions"),
        F.sum(
            F.when(F.col("pi").isNull(), F.lit(K_SPAN)).otherwise(
                F.least(F.lit(K_SPAN), F.col("i") - F.col("pi"))
            )
        )
        .cast("bigint")
        .alias("dup_tokens"),
        F.sum(
            (F.col("pi").isNull() | (F.col("i") - F.col("pi") > K_SPAN)).cast("int")
        )
        .cast("bigint")
        .alias("n_spans"),
    )
    return (
        stats.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_positions", F.lit(0)).cast("bigint").alias("dup_positions"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            round6_ratio(
                F.coalesce("dup_tokens", F.lit(0)), F.col("n_tokens")
            ).alias("dup_frac"),
        )
        # result-sized exchange before the sort (operators/sortout.py).
        # Round 9 reverted this site on sf0.1 noise; the round-10 sf1
        # stage profile shows the range-sort sampling re-running the
        # whole explode+hash+window final stage (31 s task time,
        # shuffleWrite=0) — the exchange carries one row per doc.
        # Two-column key on purpose: the pipeline is already
        # hash-partitioned on doc_id, so a plain repartition("doc_id")
        # is elided by Catalyst and nothing materializes (the
        # dedup_minhash_lsh_pairs round-9 lesson).
        .repartition("doc_id", "n_tokens")
        .orderBy("doc_id")
    )


# Suffix-array-EXACT within-doc duplicate spans (round-6; the
# round-5 verdict's stretch item). The k-gram query above is exact
# only for spans >= K_SPAN tokens; a suffix array finds repeats at
# EVERY length. Corpus-wide suffix arrays don't distribute, but the
# COMMON case — boilerplate repeated within one document — needs only
# a PER-DOC suffix array, which is embarrassingly parallel: each row
# carries its own token list, the pass is a narrow Arrow-batched
# mapInPandas, and per-doc work is bounded by tokens-per-doc (the
# k-gram query stays the cross-doc layer). For each position i the
# longest repeat elsewhere in the doc is max(LCP with the two
# SA-adjacent suffixes) — the standard suffix-array property the
# oracle reproduces by brute-force pairwise LCP.
SA_MIN_REP = 2  # a position is duplicated if >= this many tokens repeat


def _suffix_array(ts: list) -> list:
    """Rank-doubling suffix array: O(L log² L) time, O(L) MEMORY. The
    obvious ``sorted(range(n), key=lambda k: ts[k:])`` materializes
    every suffix slice simultaneously — O(L²) space, which OOMs the
    Arrow worker on one long document (50k tokens ≈ 2.5e9 list cells)
    even though per-doc work is otherwise safe.

    Each doubling round is numpy ``lexsort`` over the (rank,
    shifted-rank) pair plus a vectorized adjacent-diff cumsum for the
    new ranks — C-speed compares instead of a Python tuple key per
    element (a 50k-token doc pays ~17 rounds; the Python ``sorted``
    constant dominated the whole stage before this)."""
    import numpy as np

    n = len(ts)
    if n == 0:
        return []
    first = {t: i for i, t in enumerate(sorted(set(ts)))}
    r = np.fromiter((first[t] for t in ts), dtype=np.int64, count=n)
    k = 1
    while True:
        r2 = np.full(n, -1, dtype=np.int64)  # rank of i+k; -1 past end
        if k < n:
            r2[: n - k] = r[k:]
        sa = np.lexsort((r2, r))  # sort by (r[i], r[i+k])
        kr, kr2 = r[sa], r2[sa]
        bump = np.empty(n, dtype=np.int64)
        bump[0] = 0
        bump[1:] = (kr[1:] != kr[:-1]) | (kr2[1:] != kr2[:-1])
        ranks = np.cumsum(bump)
        if ranks[-1] == n - 1:
            return sa.tolist()
        nr = np.empty(n, dtype=np.int64)
        nr[sa] = ranks
        r = nr
        k *= 2


def _adjacent_lcp(ts: list, sa: list) -> list:
    """Kasai's algorithm: lcp[j] = LCP(suffix sa[j-1], suffix sa[j]),
    O(L) total (lcp[0] = 0)."""
    n = len(ts)
    rank = [0] * n
    for j, i in enumerate(sa):
        rank[i] = j
    lcp = [0] * n
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and ts[i + h] == ts[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def sa_span_stats_rows(ts: list) -> tuple[int, int, int, int]:
    """(n_tokens, lrs_len, dup_starts, dup_cover) for one token list.

    lrs_len: longest repeated substring (tokens, any length >= 1);
    dup_starts: positions whose max-repeat >= SA_MIN_REP;
    dup_cover: tokens covered by the union of [i, i + maxrep_i) spans.
    Rank-doubling suffix sort + Kasai LCP — O(L log² L) time and O(L)
    memory per DOC, so one pathologically long document can't OOM its
    Arrow worker (the naive suffix-slice sort is O(L²) in SPACE).
    maxrep_i = max(LCP with the two SA-adjacent suffixes) — the
    standard suffix-array property the oracle reproduces by
    brute-force pairwise LCP.
    """
    n = len(ts)
    if n == 0:
        return 0, 0, 0, 0
    order = _suffix_array(ts)
    lcp = _adjacent_lcp(ts, order)
    maxl = [0] * n
    for r in range(1, n):
        l = lcp[r]
        a, b = order[r - 1], order[r]
        if l > maxl[a]:
            maxl[a] = l
        if l > maxl[b]:
            maxl[b] = l
    lrs = max(maxl)
    starts = [i for i in range(n) if maxl[i] >= SA_MIN_REP]
    cover, end = 0, 0
    for i in starts:
        e = i + maxl[i]
        s = max(i, end)
        if e > s:
            cover += e - s
            end = e
    return n, lrs, len(starts), cover


def suffix_array_span_stats(toked: DataFrame) -> DataFrame:
    """(doc_id, ts array<string>) -> per-doc exact repeat statistics
    via an in-partition suffix-array pass (narrow, no shuffle)."""
    import pandas as pd

    def _sa(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "lrs_len": [], "dup_starts": [], "dup_cover": []}
            for doc_id, ts in zip(pdf["doc_id"], pdf["ts"]):
                n, lrs, ds, cov = sa_span_stats_rows(list(ts))
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["lrs_len"].append(lrs)
                out["dup_starts"].append(ds)
                out["dup_cover"].append(cov)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return toked.mapInPandas(
        _sa,
        "doc_id long, n_tokens long, lrs_len long, dup_starts long, dup_cover long",
    )


@register(
    "dedup_exact_substr_sa",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    tok AS (
      SELECT doc_id, ts, len(ts) AS n, i AS pos, ts[i] AS tok
      FROM toks, unnest(generate_series(1, len(ts))) AS t(i)),
    pairs AS (
      SELECT a.doc_id, a.ts, a.n, a.pos AS i, b.pos AS j
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND a.pos < b.pos AND a.tok = b.tok),
    lcps AS (
      SELECT doc_id, i, j,
             len(list_filter(generate_series(1, n - j + 1),
                             t -> ts[i:i+t-1] = ts[j:j+t-1])) AS lcp
      FROM pairs),
    ml AS (
      SELECT doc_id, pos, MAX(lcp) AS maxl FROM (
        SELECT doc_id, i AS pos, lcp FROM lcps
        UNION ALL
        SELECT doc_id, j AS pos, lcp FROM lcps) u
      GROUP BY doc_id, pos),
    cover AS (
      SELECT doc_id, COUNT(DISTINCT p) AS dup_cover
      FROM ml, unnest(generate_series(pos, pos + maxl - 1)) AS c(p)
      WHERE maxl >= 2
      GROUP BY doc_id),
    agg AS (
      SELECT doc_id, MAX(maxl) AS lrs_len,
             COUNT(*) FILTER (maxl >= 2) AS dup_starts
      FROM ml GROUP BY doc_id),
    stats AS (SELECT doc_id, len(ts) AS n_tokens FROM toks)
    SELECT s.doc_id,
           CAST(s.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.lrs_len, 0) AS BIGINT) AS lrs_len,
           CAST(COALESCE(a.dup_starts, 0) AS BIGINT) AS dup_starts,
           CAST(COALESCE(c.dup_cover, 0) AS BIGINT) AS dup_cover
    FROM stats s
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN cover c USING (doc_id)
    ORDER BY s.doc_id
    """,
    group="dedup",
    doc="Suffix-array-EXACT within-doc duplicate spans: per document, "
    "a suffix array over its tokens gives every position's longest "
    "repeat elsewhere in the SAME doc (max LCP with the two "
    "SA-adjacent suffixes — exact at EVERY length, including the "
    "sub-K_SPAN spans the k-gram query is blind to by construction). "
    "Reports longest-repeated-substring length, duplicated start "
    "positions (repeat >= 2 tokens), and the union coverage of their "
    "spans. The oracle recomputes by brute-force pairwise LCP. "
    "Scale: per-doc Arrow-batched pass, narrow, no shuffle — work is "
    "Σ O(L log² L) over tokens-per-doc L (rank-doubling sort + Kasai "
    "LCP), embarrassingly parallel; "
    "the k-gram query remains the linear cross-doc layer (corpus-wide "
    "suffix arrays don't distribute; within-doc is the common "
    "boilerplate case this closes exactly).",
)
def dedup_exact_substr_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toked = d.repartition(par, "doc_id").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    # result-sized exchange before the sort (see operators/sortout.py):
    # without it the range sampler re-ran the Arrow suffix-array stage
    return suffix_array_span_stats(toked).repartition("doc_id").orderBy("doc_id")


# Incremental new-batch dedup: the index/incoming split is by source
# id (sources src0..src9 are the already-ingested corpus; src10+ are
# the new batch). In production the index side is the persisted band
# index the streaming twin (streaming/dedup_stream.py) accumulates;
# here it is derived inline from the same banded_frame so batch and
# stream share one banding contract.
IDX_SOURCE_MAX = 10


@register(
    "dedup_incremental_new_batch",
    _MINHASH_DUCK
    + f"""
    , split AS (
      SELECT doc_id, CAST(substr(source, 4) AS INT) < {IDX_SOURCE_MAX} AS is_index
      FROM documents),
    banded AS (
      SELECT doc_id, CAST(FLOOR((j - 1) / {ROWS_PER_BAND}) AS INTEGER) AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY j) AS sig
      FROM sigs GROUP BY doc_id, 2),
    inc AS (SELECT doc_id FROM split WHERE NOT is_index),
    cand AS (
      SELECT DISTINCT bi.doc_id AS doc_id, bx.doc_id AS idx_doc
      FROM banded bi
        JOIN split si ON si.doc_id = bi.doc_id AND NOT si.is_index
        JOIN banded bx ON bx.band = bi.band AND bx.sig = bi.sig
        JOIN split sx ON sx.doc_id = bx.doc_id AND sx.is_index),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_index_candidates
      FROM cand GROUP BY doc_id),
    hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
    exact AS (
      SELECT hi.doc_id
      FROM hashes hi JOIN split si ON si.doc_id = hi.doc_id AND NOT si.is_index
      WHERE EXISTS (
        SELECT 1 FROM hashes hx JOIN split sx
          ON sx.doc_id = hx.doc_id AND sx.is_index
        WHERE hx.h = hi.h))
    SELECT i.doc_id,
           i.doc_id IN (SELECT doc_id FROM exact) AS exact_dup,
           COALESCE(p.n_index_candidates, 0) AS n_index_candidates,
           COALESCE(p.n_index_candidates, 0) > 0 AS near_dup
    FROM inc i LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
    group="dedup",
    doc="Incremental new-batch dedup against an existing corpus index: "
    f"sources src0..src{IDX_SOURCE_MAX - 1} form the ingested index, the "
    "rest are the incoming batch. Layer 1 flags exact duplicates by "
    "content hash against the distinct index hash set; layer 2 counts "
    "distinct index documents sharing >= 1 MinHash-LSH band bucket "
    "(near_dup when any). Scale: the incoming batch never self-joins — "
    "cost is |batch| x matched buckets; at 100 TB the index side is the "
    "persisted band index maintained by streaming/dedup_stream.py "
    "(identical banded_frame contract), and the index hash set / band "
    "join keys shuffle as fixed-width hashes. No stage touches index x "
    "index or batch x batch.",
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    idx = d.filter(src_num < IDX_SOURCE_MAX)
    inc = d.filter(src_num >= IDX_SOURCE_MAX)
    idx_hashes = (
        idx.select(F.md5("text").alias("h")).distinct().withColumn("__hit", F.lit(1))
    )
    exact_flag = (
        inc.select("doc_id", F.md5("text").alias("h"))
        .join(idx_hashes, "h", "left")
        .select("doc_id", F.col("__hit").isNotNull().alias("exact_dup"))
    )
    bi = banded_frame(minhash_wide(inc))
    bx = (
        banded_frame(minhash_wide(idx))
        .withColumnRenamed("doc_id", "idx_doc")
    )
    per_doc = (
        bi.join(bx, ["band", "sig"])
        .select("doc_id", "idx_doc")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_index_candidates"))
    )
    return (
        exact_flag.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce("n_index_candidates", F.lit(0))
            .cast("bigint")
            .alias("n_index_candidates"),
            (F.coalesce("n_index_candidates", F.lit(0)) > 0).alias("near_dup"),
        )
        # result-sized exchange before the sort (see operators/sortout.py)
        # (compound key — plain doc_id is elided, see text.py winnowing)
        .repartition("doc_id", "exact_dup")
        .orderBy("doc_id")
    )


# --- Bloom-prefiltered incremental exact dedup ----------------------------
#
# The 100 TB serving shape for "is this new document already in the
# corpus?": a Bloom filter over the index's content hashes is built
# ONCE (k bit positions per hash, OR-folded into 64-bit words — a
# tiny table of m/64 rows), shipped to every incoming batch, and the
# exact hash anti-join — the expensive, index-shuffling stage — runs
# only over the few batch docs the filter cannot rule out. False
# positives cost one extra lookup; false negatives are impossible, so
# the RESULT is exactly the plain anti-join's and the oracle never
# needs to model the filter.
BLOOM_K = 4  # hash functions; with m = 8n bits -> fpp ~ (1-e^-0.5)^4 ~ 2.4%
_BLOOM_MIN_BITS = 1 << 13
_BLOOM_BROADCAST_WORDS = 1 << 22  # 32 MiB of words; larger blooms co-partition


def bloom_num_bits(n_index: int) -> int:
    """Bloom size: the smallest power of two >= 8 bits per indexed
    hash (power of two so position = hash & (m-1), no modulo bias),
    floored at 2^13. Derived from ONE already-needed COUNT(*) —
    the same one-scalar adaptivity as NLIST/NPROBE/LSH planes."""
    m = _BLOOM_MIN_BITS
    while m < 8 * max(1, n_index):
        m <<= 1
    return m


def bloom_words(index_hashes: DataFrame, m_bits: int, col: str = "h") -> DataFrame:
    """(h) -> (word, bits): the Bloom filter as a table of 64-bit
    words. Each hash sets BLOOM_K positions xxhash64(h, seed) & (m-1);
    positions fold per 64-bit word with BIT_OR — one narrow explode
    (BLOOM_K rows per hash) and one aggregation into <= m/64 groups.
    Built once per index epoch in production and reused across every
    incoming batch (the plain anti-join re-shuffles the index per
    batch; this is the amortization that pays at 100 TB)."""
    pos = F.explode(
        F.array(
            *[
                F.xxhash64(F.col(col), F.lit(i)).bitwiseAND(F.lit(m_bits - 1))
                for i in range(BLOOM_K)
            ]
        )
    ).alias("pos")
    return (
        index_hashes.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            # shift amount is a column: SQL shiftleft (the Python
            # helper only takes int literals)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_prefilter(probe_hashes: DataFrame, words: DataFrame, m_bits: int, col: str = "h") -> DataFrame:
    """Filter ``probe_hashes`` to the rows whose BLOOM_K positions are
    ALL set in ``words`` — the Bloom "maybe" set (supersets the true
    member set; never drops a member). The bloom table broadcasts
    below _BLOOM_BROADCAST_WORDS (a map-side filter: the probe side
    never shuffles); above it, the k narrow (probe, word) rows
    shuffle-join on word — still fixed-width rows, never payloads."""
    k_pos = probe_hashes.select(
        col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.col(col), F.lit(i)).bitwiseAND(F.lit(m_bits - 1))
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("i", "pos"),
    ).select(
        col,
        F.shiftright("pos", 6).alias("word"),
        F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"),
    )
    w = F.broadcast(words) if m_bits // 64 <= _BLOOM_BROADCAST_WORDS else words
    hit = (
        k_pos.join(w, "word", "left")
        .select(
            col,
            (
                F.coalesce("bits", F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
                )
                != 0
            ).alias("set"),
        )
        .groupBy(col)
        .agg(F.min("set").alias("all_set"))
        .filter("all_set")
        .select(col)
    )
    return probe_hashes.join(hit, col, "left_semi")


@register(
    "dedup_incremental_bloom",
    f"""
    WITH split AS (
      SELECT doc_id, CAST(substr(source, 4) AS INT) < {IDX_SOURCE_MAX} AS is_index
      FROM documents),
    hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
    idx AS (
      SELECT DISTINCT h FROM hashes JOIN split USING (doc_id) WHERE is_index)
    SELECT hi.doc_id,
           EXISTS (SELECT 1 FROM idx WHERE idx.h = hi.h) AS exact_dup
    FROM hashes hi JOIN split si USING (doc_id)
    WHERE NOT si.is_index
    ORDER BY hi.doc_id
    """,
    group="dedup",
    doc="Bloom-prefiltered incremental exact dedup: the incoming batch "
    f"(sources src{IDX_SOURCE_MAX}+) is checked against the ingested "
    "corpus's content-hash set, but the exact join runs ONLY over "
    "batch docs the Bloom filter cannot rule out. The filter is a "
    "DataFrame of 64-bit words (k=4 xxhash64 positions per hash, "
    "BIT_OR-folded; m = next-pow2(8n) bits from the one COUNT(*) "
    "scalar -> fpp ~2.4%), broadcast when small, co-partitioned on "
    "word when not. False negatives are impossible, so the RESULT "
    "equals the plain anti-join's and the oracle is the plain exact "
    "SQL — the bloom is pure plan, zero semantics. Scale: built once "
    "per index epoch and reused across batches; each batch pays k "
    "narrow hash rows + an exact join over the ~fpp tail instead of "
    "re-shuffling the full index hash set per batch. No-false-negative "
    "and fpp-bound properties pinned by tests/test_bloom_dedup.py.",
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    idx_hashes = (
        d.filter(src_num < IDX_SOURCE_MAX).select(F.md5("text").alias("h")).distinct()
    )
    inc = d.filter(src_num >= IDX_SOURCE_MAX).select(
        "doc_id", F.md5("text").alias("h")
    )
    m_bits = bloom_num_bits(idx_hashes.count())
    words = bloom_words(idx_hashes, m_bits)
    maybe = bloom_prefilter(inc, words, m_bits)
    confirmed = (
        maybe.join(idx_hashes.withColumn("__hit", F.lit(1)), "h", "left")
        .filter(F.col("__hit").isNotNull())
        .select("doc_id")
        .withColumn("__dup", F.lit(True))
    )
    return (
        inc.join(confirmed, "doc_id", "left")
        .select("doc_id", F.coalesce("__dup", F.lit(False)).alias("exact_dup"))
        # result-sized exchange before the sort (see operators/sortout.py)
        # (compound key — plain doc_id is elided, see text.py winnowing)
        .repartition("doc_id", "exact_dup")
        .orderBy("doc_id")
    )
