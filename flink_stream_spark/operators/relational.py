"""Relational operator suite — the query surface the reference
delegates to Flink SQL / Trino (SURVEY §2 Part B/C).

Every query is declared as a DataFrame plan (Catalyst handles
pushdown/pruning/join selection/AQE) with a DuckDB oracle twin.

Determinism notes:
- money aggregates are computed on DECIMAL(18,2)-cast columns so the
  unordered partial aggregation Spark performs is exact, then cast to
  DOUBLE once at the end (same nearest-double on both engines);
- every result has a total ORDER BY (unique key) so LIMIT is stable;
- averages are computed as decimal-sum / count, cast to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.money import _cents, _rev4, _sum_scaled
from flink_stream_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(c, p=18, s=2):
    return F.col(c).cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Aggregation (pricing summary — flagship; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    group="aggregation",
    doc="Flagship scan→filter→agg→sort pipeline standing in for the "
    "query layer the reference defers to Trino (reference README.md:175-179).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price4 = _rev4()
    charge6 = disc_price4 * (F.lit(100) + _cents("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_scaled(_cents("l_quantity"), 2).alias("sum_qty"),
            _sum_scaled(_cents("l_extendedprice"), 2).alias("sum_base_price"),
            _sum_scaled(disc_price4, 4).alias("sum_disc_price"),
            _sum_scaled(charge6, 6).alias("sum_charge"),
            (_sum_scaled(_cents("l_quantity"), 2) / cnt).cast("double").alias("avg_qty"),
            (_sum_scaled(_cents("l_extendedprice"), 2) / cnt)
            .cast("double")
            .alias("avg_price"),
            (_sum_scaled(_cents("l_discount", 10000), 4) / cnt)
            .cast("double")
            .alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Multi-way joins (TPC-H Q3 / Q5 shapes) — the "query layer" capability
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS o_key,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_key
    LIMIT 10
    """,
    group="join",
    doc="3-way join + agg + top-k: the shape of the reference's Trino "
    "verification queries (reference README.md:177-178) generalized.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            l.l_orderkey.alias("o_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(_sum_scaled(_rev4(), 4).alias("revenue"))
        .select("o_key", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), "o_key")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    group="join",
    doc="6-way star join; broadcast-able dims (region/nation/supplier) "
    "stay broadcast under AQE, the fact tables shuffle on join keys.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(_sum_scaled(_rev4(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Join types
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    """
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    ORDER BY o.o_orderkey
    """,
    group="join",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
    group="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    """
    SELECT n.n_nationkey, n.n_name, s.s_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n.n_nationkey, s.s_name NULLS FIRST
    """,
    group="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .select("n_nationkey", "n_name", "s_name")
        .orderBy("n_nationkey", F.col("s_name").asc_nulls_first())
    )


@register(
    "join_full_outer",
    """
    WITH cn AS (SELECT DISTINCT c_nationkey FROM customer),
         sn AS (SELECT DISTINCT s_nationkey FROM supplier)
    SELECT cn.c_nationkey, sn.s_nationkey
    FROM cn FULL OUTER JOIN sn ON cn.c_nationkey = sn.s_nationkey
    ORDER BY cn.c_nationkey NULLS FIRST, sn.s_nationkey NULLS FIRST
    """,
    group="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select("c_nationkey").distinct()
    sn = _t(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full")
        .orderBy(
            F.col("c_nationkey").asc_nulls_first(), F.col("s_nationkey").asc_nulls_first()
        )
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    group="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    group="join",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_broadcast_dim",
    """
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    group="join",
    doc="Explicit broadcast of the 25-row dim — at 100 TB the fact side "
    "never shuffles for this join.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
        .orderBy("nation")
    )


@register(
    "join_theta_range",
    """
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    ORDER BY s.s_suppkey, c.c_custkey
    """,
    group="join",
    doc="Equi key + non-equi residual: Catalyst evaluates the range "
    "predicate as a post-join filter on the hash join.",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Filters / projection / cast
# ---------------------------------------------------------------------------


@register(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 150000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '1-%'
      AND o_orderdate IS NOT NULL
      AND (o_orderkey % 2 = 0 OR o_totalprice > 100000)
    ORDER BY o_orderkey
    """,
    group="filter",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(50000, 150000)
            & F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("1-%")
            & F.col("o_orderdate").isNotNull()
            & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 100000))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "project_cast",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS INTEGER) AS key_int,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_trunc,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts_str
    FROM orders
    ORDER BY o_orderkey
    """,
    group="project",
    doc="CAST matrix across int/decimal/string/date/timestamp "
    "(reference uses CAST str->INT, flink_json_to_iceberg.py:113,140).",
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("key_int"),
        _dec("o_totalprice").cast("double").alias("price_dec"),
        _dec("o_totalprice").cast("string").alias("price_str"),
        F.expr("CAST(o_totalprice AS BIGINT)").alias("price_trunc"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts_str"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_basic",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    group="aggregation",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
            (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    group="aggregation",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    group="aggregation",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _sum_scaled(_cents("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    group="aggregation",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(_sum_scaled(_cents("l_extendedprice"), 2).alias("sum_price"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    group="aggregation",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "agg_having",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
    group="aggregation",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@register(
    "agg_variance_exact",
    """
    SELECT l_returnflag,
           CAST(
             (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1) AS DOUBLE) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    group="aggregation",
    doc="Sample variance via exact decimal moments — deterministic under "
    "unordered partial aggregation, unlike stddev_samp on doubles.",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qc = _cents("l_quantity")
    n = F.count(F.lit(1))
    sum_sq = _sum_scaled(qc * qc, 4)
    s = _sum_scaled(qc, 2)
    return (
        li.groupBy("l_returnflag")
        .agg(((sum_sq - s * s / n) / (n - 1)).cast("double").alias("var_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    group="aggregation",
    doc="HLL++ sketch — at 100 TB this replaces exact COUNT(DISTINCT) "
    "where a 2% error is acceptable; no shuffle of the full key set. "
    "The gate form emits the relative-error CONTRACT as a hashable "
    "boolean: the sketch estimate must land within 5×rsd of the exact "
    "count (the exact count rides along only to make the check "
    "deterministic; production use is the bare sketch).",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    rel_err = (
        F.abs(F.col("approx_orders") - F.col("exact_orders"))
        / F.col("exact_orders").cast("double")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (rel_err <= 0.10).alias("within_tol"),
    ).orderBy("l_returnflag")


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    group="aggregation",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_sum_scaled(_cents("l_quantity"), 2))
        .orderBy("l_returnflag")
    )


@register(
    "agg_collect_sorted",
    """
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    group="aggregation",
    doc="List aggregation with deterministic order: collect_list is "
    "partition-order-dependent, so results sort before joining.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@register(
    "agg_percentile_exact",
    """
    SELECT l_returnflag,
           CAST(ROUND(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS median_qty,
           CAST(quantile_disc(l_extendedprice, 0.95) AS DOUBLE) AS p95_price_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    group="aggregation",
    doc="Exact quantiles: continuous (interpolated) median + discrete "
    "p95 (an actual data value, so bit-exact across engines).",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6)
            .cast("double")
            .alias("median_qty"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)")
            .cast("double")
            .alias("p95_price_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_corr_exact",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(ROUND(
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS DOUBLE) AS corr_qty_price
    FROM m
    ORDER BY l_returnflag
    """,
    group="aggregation",
    doc="Pearson correlation via exact decimal moments — deterministic "
    "under unordered partial aggregation, unlike corr() on doubles.",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    xc = _cents("l_quantity")
    yc = _cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _sum_scaled(xc, 2).alias("sx"),
        _sum_scaled(yc, 2).alias("sy"),
        _sum_scaled(xc * xc, 4).alias("sxx"),
        _sum_scaled(yc * yc, 4).alias("syy"),
        _sum_scaled(xc * yc, 4).alias("sxy"),
    )
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag", F.round(corr, 6).cast("double").alias("corr_qty_price")
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_row_number_topk",
    """
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    ORDER BY c_nationkey, c_custkey
    """,
    group="window",
    doc="Top-k per group: the QUALIFY-style helper from SURVEY §4.3.",
)
def window_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "c_custkey")
    )


@register(
    "window_rank_dense",
    """
    SELECT o_orderkey, o_orderstatus,
           RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk
    FROM orders
    ORDER BY o_orderkey
    """,
    group="window",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w1 = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w2 = W.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            # bigint to match DuckDB's window-function result type
            F.rank().over(w1).cast("bigint").alias("rnk"),
            F.dense_rank().over(w2).cast("bigint").alias("drnk"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price,
           CAST(FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    group="window",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
            F.first("o_totalprice").over(wfull).cast("double").alias("first_price"),
            F.last("o_totalprice").over(wfull).cast("double").alias("last_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_running_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    group="window",
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(_dec("o_totalprice"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_total"),
            F.sum(_dec("o_totalprice"))
            .over(w.rowsBetween(-2, W.currentRow))
            .cast("double")
            .alias("moving_3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_ntile_pct",
    """
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER (ORDER BY c_acctbal DESC, c_custkey) AS DOUBLE) AS cume
    FROM customer
    ORDER BY c_custkey
    """,
    group="window",
    doc="Global NTILE/PERCENT_RANK/CUME_DIST — computed WITHOUT the "
    "single-task global window (the 'No Partition Defined' scale "
    "hazard): ranks come from plans.scale.with_global_rank (range "
    "partition → parallel per-partition row_number → broadcast "
    "offsets), then ntile/pct/cume are closed-form expressions of "
    "(rank, n). The order is total (acctbal desc, custkey), so every "
    "row is its own peer group and the closed forms equal the SQL "
    "window semantics exactly.",
)
def window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_stream_spark.plans.scale import with_global_rank

    c = _t(spark, sf_dir, "customer")
    ranked = with_global_rank(
        c.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        rank_col="__r",
    )
    n_row = c.agg(F.count(F.lit(1)).alias("__n"))
    r, n = F.col("__r"), F.col("__n")
    # NTILE(4): the first (n mod 4) tiles take ceil(n/4) rows. Pure
    # integer arithmetic (ceil(a/b) = (a+b-1) div b) so a tile boundary
    # can never flip on a floating-point ulp at any n.
    tile = F.expr(
        """
        CASE WHEN __r <= ((__n div 4) + 1) * (__n % 4)
             THEN (__r + (__n div 4)) div ((__n div 4) + 1)
             ELSE (__n % 4) +
                  (__r - ((__n div 4) + 1) * (__n % 4)
                       + greatest(__n div 4, 1) - 1)
                  div greatest(__n div 4, 1)
        END
        """
    )
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            "c_custkey",
            tile.cast("bigint").alias("quartile"),
            ((r - 1).cast("double") / (n - 1)).cast("double").alias("pct_rank"),
            (r.cast("double") / n).cast("double").alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "window_range_interval",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100 AS DOUBLE) AS val_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    group="window",
    doc="Sliding event-time aggregate as a RANGE frame (last hour per "
    "user): RANGE includes all peers of the current order value, so "
    "the frame is a pure set — tie-order inside the hour cannot "
    "change the result. Values sum as exact cents (the money.py "
    "construction) so the windowed float sum is order-independent.",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3600000, W.currentRow)
    )
    cents = (F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            (F.sum(cents).over(w).cast("double") / 100).cast("double").alias("val_1h"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------


@register(
    "sort_multi_key_nulls",
    """
    SELECT c_custkey, bal, c_mktsegment FROM (
      SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
             c_mktsegment
      FROM customer) t
    ORDER BY bal DESC NULLS FIRST, c_mktsegment ASC, c_custkey
    LIMIT 50
    """,
    group="sort",
    doc="Multi-key sort with explicit null placement, observable through "
    "the LIMIT (hash compare is order-insensitive, set membership isn't).",
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
            "c_mktsegment",
        )
        .orderBy(F.col("bal").desc_nulls_first(), F.col("c_mktsegment").asc(), "c_custkey")
        .limit(50)
    )


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    group="sort",
    doc="TakeOrderedAndProject: Spark never globally sorts for top-k.",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    """
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier) t
    ORDER BY nk
    """,
    group="setop",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).orderBy("nk")


@register(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    ORDER BY nk
    """,
    group="setop",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct().orderBy("nk")


@register(
    "setop_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    ORDER BY nk
    """,
    group="setop",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


@register(
    "setop_except",
    """
    SELECT DISTINCT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nk FROM supplier
    ORDER BY nk
    """,
    group="setop",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    return c.exceptAll(s).orderBy("nk")


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@register(
    "scalar_string",
    """
    SELECT p_partkey,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           REGEXP_REPLACE(p_type, '[aeiou]', '_', 'g') AS type_novowel,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
    FROM part
    ORDER BY p_partkey
    """,
    group="scalar",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").cast("int").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_novowel"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
    ).orderBy("p_partkey")


@register(
    "scalar_url_parse",
    """
    SELECT doc_id,
           COALESCE(source, 'unk') || '.example.org' AS url_host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS url_path,
           'lang=' || COALESCE(lang, 'und') AS url_query,
           COALESCE(lang, 'und') AS lang_param
    FROM documents
    ORDER BY doc_id
    """,
    group="scalar",
    doc="URL component extraction (parse_url HOST/PATH/QUERY + query "
    "parameter) — the per-record projection a web-corpus pipeline runs "
    "to derive domain keys for per-site dedup/rate stats. Pure codegen "
    "expressions; the oracle reconstructs the components positionally "
    "from the same fields, so the check validates parse_url's component "
    "grammar bit-for-bit. Scale: map-only, no shuffle before the "
    "ordering exchange.",
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.coalesce(F.col("source"), F.lit("unk")),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.coalesce(F.col("lang"), F.lit("und")),
    )
    d = d.select("doc_id", url.alias("u"))
    return d.select(
        "doc_id",
        F.parse_url("u", F.lit("HOST")).alias("url_host"),
        F.parse_url("u", F.lit("PATH")).alias("url_path"),
        F.parse_url("u", F.lit("QUERY")).alias("url_query"),
        F.parse_url("u", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@register(
    "scalar_math",
    """
    SELECT p_partkey,
           CAST(ROUND(p_retailprice, 1) AS DOUBLE) AS price_round,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(ABS(p_retailprice - 1000) AS DOUBLE) AS price_dev,
           CAST(ROUND(POW(p_size, 2), 6) AS DOUBLE) AS size_sq,
           CAST(ROUND(LN(p_retailprice), 6) AS DOUBLE) AS price_ln,
           CAST(ROUND(SQRT(p_retailprice), 6) AS DOUBLE) AS price_sqrt,
           CAST(p_size % 7 AS INTEGER) AS size_mod
    FROM part
    WHERE p_retailprice > 0
    ORDER BY p_partkey
    """,
    group="scalar",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).cast("double").alias("price_round"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("p_retailprice") - 1000).cast("double").alias("price_dev"),
        F.round(F.pow("p_size", F.lit(2)), 6).cast("double").alias("size_sq"),
        F.round(F.log(F.col("p_retailprice")), 6).cast("double").alias("price_ln"),
        F.round(F.sqrt("p_retailprice"), 6).cast("double").alias("price_sqrt"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
    ).orderBy("p_partkey")


@register(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dy,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER) AS days_to_eoy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    ORDER BY o_orderkey
    """,
    group="scalar",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_eoy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    ).orderBy("o_orderkey")


@register(
    "scalar_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END AS missing_is_null
    FROM events
    ORDER BY event_id
    """,
    group="scalar",
    doc="JSON path extraction — the reference's core transform "
    "(JSON_VALUE, flink_json_to_iceberg.py:113-114,140-141).",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
    ).orderBy("event_id")


@register(
    "scalar_array",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           array_to_string(string_split(text, ' ')[1:3], '|') AS first3,
           array_to_string(list_sort(string_split(substr(text, 1, 40), ' ')), '|') AS sorted_head,
           CASE WHEN list_contains(string_split(text, ' '), 'spark') THEN 1 ELSE 0 END AS has_spark
    FROM documents
    ORDER BY doc_id
    """,
    group="scalar",
    doc="Array fns (split/slice/sort/contains/join); array outputs are "
    "string-joined so the cross-engine hash sees one scalar encoding.",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_join(
            F.sort_array(F.split(F.substring("text", 1, 40), " ")), "|"
        ).alias("sorted_head"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
    ).orderBy("doc_id")


@register(
    "scalar_array_explode",
    """
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    group="scalar",
    doc="explode → agg: token frequency (word-count over the corpus).",
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@register(
    "scalar_map",
    """
    SELECT o_orderkey,
           o_orderstatus AS status_val,
           2 AS n_keys
    FROM orders
    ORDER BY o_orderkey
    """,
    group="scalar",
    doc="Map construction + element_at + map_keys; oracle mirrors the "
    "values directly (DuckDB map semantics differ, values are identical).",
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    ).orderBy("o_orderkey")


@register(
    "scalar_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 75000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_norm,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    ORDER BY o_orderkey
    """,
    group="scalar",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 75000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("is_urgent"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Subqueries / introspection
# ---------------------------------------------------------------------------


@register(
    "subquery_scalar_agg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    ORDER BY o_orderkey
    """,
    group="subquery",
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM _sq_orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM _sq_orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_in",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    ORDER BY o_orderkey
    """,
    group="subquery",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_sqin_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_sqin_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM _sqin_orders
        WHERE o_custkey IN (SELECT c_custkey FROM _sqin_customer
                            WHERE c_mktsegment = 'MACHINERY')
        ORDER BY o_orderkey
        """
    )


@register(
    "agg_mode_tiebreak",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderstatus, o_orderpriority),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c)
    SELECT o_orderstatus, o_orderpriority AS modal_priority,
           CAST(cnt AS BIGINT) AS cnt
    FROM r WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    group="aggregation",
    doc="Statistical mode with a deterministic tie-break: native "
    "mode()/any_value() pick an arbitrary winner on equal counts, so "
    "both engines compute it as count-per-value + row_number ordered "
    "by (cnt DESC, value ASC) — reproducible across runs, retries, "
    "and engines. Two map-combining aggregates; the window runs over "
    "the tiny (status x priority) count table, not the fact table.",
)
def agg_mode_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_argminmax_countif",
    """
    SELECT o_orderstatus,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           CAST(CASE WHEN bool_or(o_totalprice > 400000) THEN 1 ELSE 0 END
                AS INT) AS any_jumbo,
           CAST(CASE WHEN bool_and(o_totalprice > 1000) THEN 1 ELSE 0 END
                AS INT) AS all_over_1k
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    group="aggregation",
    doc="Argument-extrema and predicate aggregates: max_by/min_by "
    "(DuckDB arg_max/arg_min) keyed on the UNIQUE o_orderkey so the "
    "winner is well-defined — arg extrema on non-unique keys are "
    "engine-dependent on ties; count_if / bool_or / bool_and round "
    "out the predicate-aggregate family (booleans emitted as INT for "
    "cross-engine hashing). All partial-aggregatable: max_by combines "
    "as max-of-pairs map-side.",
)
def agg_argminmax_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
            F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
            F.count_if(big).cast("bigint").alias("n_big"),
            F.when(F.bool_or(F.col("o_totalprice") > 400000), 1)
            .otherwise(0)
            .cast("int")
            .alias("any_jumbo"),
            F.when(F.bool_and(F.col("o_totalprice") > 1000), 1)
            .otherwise(0)
            .cast("int")
            .alias("all_over_1k"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "window_nth_first_last",
    """
    SELECT o_orderkey, o_custkey,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_price,
           CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    group="window",
    doc="FIRST_VALUE / NTH_VALUE(2) / LAST_VALUE over the customer's "
    "full order history (unbounded frame, deterministic tie-broken "
    "order). The frame is the whole partition, so Spark evaluates it "
    "as one pass per key with no per-row frame re-scan; partition key "
    "is the high-cardinality o_custkey, so the shuffle spreads evenly. "
    "Values are copied, not aggregated — no float-order sensitivity.",
)
def window_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).cast("double").alias("second_price"),
        F.last("o_totalprice").over(w).cast("double").alias("last_price"),
    ).orderBy("o_orderkey")


@register(
    "agg_grouping_id",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
    group="aggregation",
    doc="GROUPING()/grouping_id over ROLLUP: distinguishes a real NULL "
    "group key from a rollup subtotal — the standard way BI layers "
    "consume rollup output. Spark computes grouping_id() natively in "
    "the expand+aggregate plan; the bit layout (first key = high bit) "
    "matches the SQL standard on both engines.",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
        )
        .orderBy("gid", "status", "priority")
    )


@register(
    "scalar_try_safe_arith",
    """
    SELECT o_orderkey,
           CAST(ROUND(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE CAST(o_totalprice AS DECIMAL(18,2))
                     / CAST(o_orderkey % 7 AS DECIMAL(18,2)) END, 6)
                AS DOUBLE) AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
           TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS first_digit
    FROM orders
    ORDER BY o_orderkey
    """,
    group="scalar",
    doc="Error-safe expression family: try_divide (NULL on /0 instead "
    "of job failure under ANSI), try_cast on non-numeric strings, and "
    "a succeeding try_cast of the leading priority digit. At 100 TB "
    "one malformed row must never kill a 10-hour job — NULL-on-error "
    "keeps the scan whole-stage-codegen'd with no exception path. "
    "DuckDB divides decimals exactly the same, so the oracle is a "
    "plain CASE guard.",
)
def scalar_try_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(
                F.col("o_totalprice").cast("decimal(18,2)"),
                (F.col("o_orderkey") % 7).cast("decimal(18,2)"),
            ),
            6,
        )
        .cast("double")
        .alias("safe_div"),
        F.col("o_orderpriority").try_cast("int").alias("bad_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("first_digit"),
    ).orderBy("o_orderkey")


@register(
    "scalar_array_hof",
    """
    WITH t AS (
      SELECT o_orderkey,
             list_transform(generate_series(1, CAST(o_orderkey % 5 + 1 AS BIGINT)),
                            i -> i * (o_orderkey % 3 + 1)) AS xs
      FROM orders)
    SELECT o_orderkey,
           CAST(len(xs) AS INTEGER) AS n,
           list_transform(xs, x -> CAST(x * x AS BIGINT)) AS squared,
           list_filter(xs, x -> x % 2 = 0) AS evens,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
                            (acc, x) -> acc + x) AS BIGINT) AS total,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(list_zip(xs, list_reverse(xs)),
                                 p -> p[1] * p[2])),
                (acc, x) -> acc + x) AS BIGINT) AS dot_rev
    FROM t
    ORDER BY o_orderkey
    """,
    group="scalar",
    doc="Higher-order array functions — transform / filter / aggregate "
    "/ zip_with — over a synthesized integer array: the JVM-side "
    "lambda surface that replaces row-at-a-time Python UDFs for "
    "array-valued columns. All integer arithmetic, so both engines "
    "fold identically; everything runs inside one codegen'd "
    "projection, no shuffle before the presentation sort.",
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    xs = F.transform(
        F.sequence(F.lit(1).cast("bigint"), (F.col("o_orderkey") % 5 + 1).cast("bigint")),
        lambda i: i * (F.col("o_orderkey") % 3 + 1),
    )
    t = o.select("o_orderkey", xs.alias("xs"))
    total = F.aggregate(
        F.col("xs"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    dot_rev = F.aggregate(
        F.zip_with(F.col("xs"), F.reverse(F.col("xs")), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return t.select(
        "o_orderkey",
        F.size("xs").alias("n"),
        F.transform(F.col("xs"), lambda x: (x * x).cast("bigint")).alias("squared"),
        F.filter(F.col("xs"), lambda x: x % 2 == 0).alias("evens"),
        total.alias("total"),
        dot_rev.alias("dot_rev"),
    ).orderBy("o_orderkey")


@register(
    "window_topn_paginated",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM ranked
    WHERE rn BETWEEN 3 AND 5
    ORDER BY o_custkey, rn
    """,
    group="window",
    doc="Paginated per-group Top-N (Flink Top-N with OFFSET: rows 3-5 "
    "of each customer's orders by price): the rank lower bound cannot "
    "use WindowGroupLimit's early exit, but the upper bound still "
    "caps the per-group heap at 5 — page depth, not group size, "
    "bounds the window state.",
)
def window_topn_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(3, 5))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("rn").cast("bigint").alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "scalar_variant_semistructured",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
    FROM events
    ORDER BY event_id
    """,
    group="scalar",
    doc="Semi-structured access through Spark 4's VARIANT type "
    "(parse_json once -> variant_get paths): the idiomatic model for "
    "the reference's schemaless raw-JSON columns "
    "(flink_json_to_iceberg.py:95-107 single-STRING tables + "
    "JSON_VALUE) — VARIANT parses each document ONCE into a binary "
    "encoding and every path access is a cheap traversal, vs "
    "get_json_object re-parsing the text per path. Missing paths "
    "yield NULL (try semantics), matching JSON_VALUE's lax mode.",
)
def scalar_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return v.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.try_variant_get("v", "$.missing", "bigint").alias("absent"),
    ).orderBy("event_id")


@register(
    "agg_regression_exact",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS DOUBLE) AS slope,
           CAST(ROUND(
             (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
                * ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
             / n, 6) AS DOUBLE) AS intercept
    FROM m
    ORDER BY l_returnflag
    """,
    group="aggregation",
    doc="OLS regression aggregates (regr_slope / regr_intercept of "
    "price on quantity) via exact decimal moment sums — the builtin "
    "regr_* aggregates accumulate doubles whose partial-merge order "
    "varies run to run; decimal moments make the fit deterministic "
    "under any partitioning, with one float expression at the end.",
)
def agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    from flink_stream_spark.operators.money import _cents as _c, _sum_scaled as _s

    xc = _c("l_quantity")
    yc = _c("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _s(xc, 2).alias("sx"),
        _s(yc, 2).alias("sy"),
        _s(xc * xc, 4).alias("sxx"),
        _s(xc * yc, 4).alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - F.col("sx") * slope) / n
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope, 6).cast("double").alias("slope"),
        F.round(intercept, 6).cast("double").alias("intercept"),
    ).orderBy("l_returnflag")
