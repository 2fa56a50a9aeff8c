"""Table-format seam: interface conformance (always runs) + a real
Iceberg round-trip smoke (skips without iceberg-spark jars — this
sandbox has no network to fetch them; dated note in README)."""

from __future__ import annotations

import inspect

import pytest

from flink_stream_spark.tables.format import TableCatalog, TableHandle
from flink_stream_spark.tables.iceberg import (
    IcebergTable,
    IcebergWarehouse,
    iceberg_available,
)
from flink_stream_spark.tables.managed import ManagedTable, Warehouse


def _protocol_methods(proto) -> list[str]:
    return [
        n
        for n, v in vars(proto).items()
        if not n.startswith("_") and callable(v)
    ]


@pytest.mark.parametrize(
    "impl,proto",
    [
        (ManagedTable, TableHandle),
        (IcebergTable, TableHandle),
        (Warehouse, TableCatalog),
        (IcebergWarehouse, TableCatalog),
    ],
)
def test_implementations_cover_the_seam(impl, proto):
    """Both formats expose every seam method with compatible
    positional signatures — the static contract that lets CDC apply /
    ingest / IVM run over either backend unchanged."""
    for m in _protocol_methods(proto):
        assert hasattr(impl, m), f"{impl.__name__} missing {m}"
        want = [
            p
            for p in inspect.signature(getattr(proto, m)).parameters
            if p not in ("self",)
        ]
        have = list(inspect.signature(getattr(impl, m)).parameters)
        for p in want:
            assert p in have or any(
                q for q in have if q in ("args", "kwargs")
            ), f"{impl.__name__}.{m} lacks parameter {p!r}"


def test_managed_instances_satisfy_runtime_protocols(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    assert isinstance(wh, TableCatalog)
    t = wh.table("t", ["k"])
    assert isinstance(t, TableHandle)


def test_iceberg_probe_is_honest(spark):
    """iceberg_available must agree with an actual class lookup (no
    silent true in a jar-free image)."""
    avail = iceberg_available(spark)
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        really = True
    except Exception:
        really = False
    assert avail == really
    if not avail:
        with pytest.raises(RuntimeError, match="iceberg-spark"):
            IcebergWarehouse(spark, "/tmp/never-used")


def test_merge_sql_statements_exact():
    """The MERGE statements are the Iceberg write contract; pin their
    exact text (quoting included) so a refactor can't silently change
    the row-level semantics the jar-gated smoke would only catch on a
    cluster."""
    from flink_stream_spark.tables.iceberg import (
        merge_delete_sql,
        merge_upsert_sql,
    )

    up = merge_upsert_sql("graft.db.account", "src_v", ["user_id", "region"])
    assert up == (
        "MERGE INTO `graft`.`db`.`account` t USING src_v s "
        "ON t.`user_id` = s.`user_id` AND t.`region` = s.`region` "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    de = merge_delete_sql("graft.db.account", "del_v", ["user_id"])
    assert de == (
        "MERGE INTO `graft`.`db`.`account` t USING del_v s "
        "ON t.`user_id` = s.`user_id` "
        "WHEN MATCHED THEN DELETE"
    )


@pytest.fixture
def iceberg_wh(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark runtime jars absent (no network to fetch)")
    return IcebergWarehouse(spark, str(tmp_path / "ice_wh"))


def test_iceberg_create_merge_expire_roundtrip(spark, iceberg_wh):
    """The reference's production loop over a REAL Iceberg catalog:
    create a v2 keyed table, upsert + delete through MERGE, read back,
    expire snapshots (flink_json_to_iceberg.py:28-71,
    snapshot_mgmt.py:13-19)."""
    t = iceberg_wh.table("account", key_columns=["user_id"])
    base = spark.createDataFrame(
        [(1, "a@x"), (2, "b@x")], "user_id bigint, email string"
    )
    v1 = t.merge(base)
    assert v1 >= 1
    upd = spark.createDataFrame(
        [(2, "b2@x"), (3, "c@x")], "user_id bigint, email string"
    )
    dels = spark.createDataFrame([(1,)], "user_id bigint")
    t.merge(upd, deletes=dels)
    got = {r["user_id"]: r["email"] for r in t.read(spark).collect()}
    assert got == {2: "b2@x", 3: "c@x"}
    assert "account" in iceberg_wh.list_tables()
    removed = t.expire_snapshots(retain_last=1)
    assert removed >= 1
    # data unaffected by expiry
    assert {r["user_id"] for r in t.read(spark).collect()} == {2, 3}
