"""Bucketing removes the join shuffle; salting spreads a hot key.

Plan-level and result-level checks for the scale utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.plans import bucketize_table, explain_str, salted_join


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the in-memory catalog forgets tables between sessions but the
        # warehouse directory persists — clear it or CREATE fails
        shutil.rmtree(f"/tmp/flink_stream_spark/warehouse/{t}", ignore_errors=True)
    o = load_table(spark, sf_small, "orders")
    l = load_table(spark, sf_small, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bo = bucketize_table(o, "b_orders", "o_orderkey", 8)
    bl = bucketize_table(l, "b_lineitem", "o_orderkey", 8)
    joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
    plan = explain_str(joined)
    join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    # no shuffle exchange feeding the join (bucketed co-location)
    assert "Exchange hashpartitioning(o_orderkey" not in join_section
    # result parity with the plain join
    want = (
        o.join(l, "o_orderkey").groupBy("o_orderstatus").count().collect()
    )
    got = joined.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_salted_join_matches_plain_join(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    salted = (
        salted_join(o, c, "o_custkey", salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_rejects_outer_sides(spark, sf_small):
    import pytest as _pytest
    from flink_stream_spark.plans.scale import salted_join

    n = spark.read.parquet(f"{sf_small}/nation.parquet")
    r = spark.read.parquet(f"{sf_small}/region.parquet")
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(n, r, "n_regionkey", how=how)


def test_salted_join_salt_is_deterministic(spark, sf_small):
    """Same input → identical salt assignment across evaluations (the
    recompute-after-executor-loss safety property: salt derives from
    row content, never from a nondeterministic id)."""
    from flink_stream_spark.plans.scale import salted_join

    c = spark.read.parquet(f"{sf_small}/customer.parquet")
    n = spark.read.parquet(f"{sf_small}/nation.parquet").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    j = salted_join(c, n, "c_nationkey", how="left", salt=8)
    a = sorted(map(tuple, j.collect()))
    b = sorted(map(tuple, j.collect()))
    assert a == b
    plain = sorted(map(tuple, c.join(n, "c_nationkey", "left").collect()))
    assert a == plain


def test_last_per_key_hot_key_two_phase_plan_and_parity(spark):
    """CDC hot-key posture: last_per_key must compile to a two-phase
    aggregate (partial HashAggregate before the Exchange — a hot key
    collapses map-side), never a Window (which funnels the whole hot
    key into one task). Parity: an adversarial batch where ONE key
    receives every event still reduces to the correct single winner."""
    from flink_stream_spark.cdc.envelope import last_per_key

    # 20k events, 99% on key 7, interleaved order columns
    df = (
        spark.range(20000)
        .select(
            F.when(F.col("id") % 100 == 0, F.col("id") % 7).otherwise(7).alias("k"),
            F.col("id").alias("_lsn"),
            (F.col("id") % 977).alias("_ts_ms"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
    )
    red = last_per_key(df, ["k"], ["_ts_ms", "_lsn"])
    plan = explain_str(red)
    assert "Window" not in plan
    # partial aggregation happens before the key exchange
    pre_exchange = plan.split("Exchange hashpartitioning(k")[0]
    assert "partial_max_by" in pre_exchange or "HashAggregate" in pre_exchange
    got = {r["k"]: (r["_ts_ms"], r["_lsn"]) for r in red.collect()}
    # python reference: max by (_ts_ms, _lsn) per key
    import collections
    want = {}
    for r in df.collect():
        cur = want.get(r["k"])
        cand = (r["_ts_ms"], r["_lsn"])
        if cur is None or cand > cur:
            want[r["k"]] = cand
    assert got == want


def test_partition_pruning_on_date_partitioned_layout(spark, sf_small, tmp_path):
    """The 100 TB layout contract: events written partitioned by day
    must prune to ONE partition for a single-day filter — the scan's
    PartitionFilters carries the predicate and the other days' files
    are never listed into the plan. (The flat fixture files can only
    show PushedFilters; this asserts the stronger directory-level
    prune used on real deployments.)"""
    ev = load_table(spark, sf_small, "events")
    part_dir = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(part_dir)
    pe = spark.read.parquet(part_dir)
    one_day = [r["day"] for r in pe.select("day").distinct().limit(1).collect()][0]
    q = pe.filter(F.col("day") == F.lit(one_day)).groupBy("event_type").count()
    plan = explain_str(q)
    assert "PartitionFilters" in plan
    pf_line = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "day" in pf_line  # the day predicate prunes at directory level
    # result parity with the unpartitioned filter
    want = sorted(
        map(
            tuple,
            ev.filter(F.to_date("ts") == F.lit(one_day))
            .groupBy("event_type")
            .count()
            .collect(),
        )
    )
    assert sorted(map(tuple, q.collect())) == want


def test_global_rank_matches_single_task_window(spark, sf_small):
    """with_global_rank must equal row_number() OVER (ORDER BY ...) for
    a total order, while its plan contains NO partitionless Window
    (every Window node is keyed by the range-partition id)."""
    from pyspark.sql.window import Window as W

    from flink_stream_spark.plans.scale import with_global_rank

    c = load_table(spark, sf_small, "customer").select("c_custkey", "c_acctbal")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    got = {
        r["c_custkey"]: r["rank"]
        for r in with_global_rank(c, order, "rank").collect()
    }
    want = {
        r["c_custkey"]: r["rank"]
        for r in c.withColumn(
            "rank", F.row_number().over(W.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want
    # the data window is keyed by the range-partition id (the only
    # unpartitioned window runs over the #partitions-row offsets frame)
    plan = explain_str(with_global_rank(c, order, "rank"))
    assert "SPARK_PARTITION_ID" in plan or "__pid" in plan
