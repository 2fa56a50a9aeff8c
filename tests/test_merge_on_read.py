"""Merge-on-read equality deletes for ManagedTable.

The reference's upsert path is Iceberg v2 equality-delete files
(``write.upsert.enabled=true``, flink_json_to_iceberg.py:61-71):
an upsert commit writes new rows + delete files, never rewriting
existing data. ManagedTable.merge(mode='mor') mirrors that: the
commit is O(|batch|), reads anti-join version-sequenced key
tombstones, and compact() folds spent tombstones.
"""

from __future__ import annotations

from flink_stream_spark.tables.managed import ManagedTable


def _state(spark, t):
    return {r["k"]: r["v"] for r in t.read(spark).collect()}


def test_mor_merge_appends_without_rewriting_data(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=4)
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(8)], "k int, v string")
    )
    files_v1 = set(t.data_files())
    t.merge(
        spark.createDataFrame([(3, "v3b"), (99, "new")], "k int, v string"),
        mode="mor",
    )
    # every v1 data file survives verbatim — nothing was rewritten
    assert files_v1 <= set(t.data_files())
    assert _state(spark, t) == {
        **{i: f"v{i}" for i in range(8) if i != 3},
        3: "v3b",
        99: "new",
    }
    # the manifest records equality-delete files ($files content=2)
    files = t.files(spark).collect()
    assert any(f["content"] == 2 for f in files)


def test_mor_delete_then_reinsert_resurrects_key(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=4)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.merge(
        upserts=spark.createDataFrame([], "k int, v string"),
        deletes=spark.createDataFrame([(1,)], "k int"),
        mode="mor",
    )
    assert _state(spark, t) == {2: "b"}
    # re-insert: the new data dir's version outranks the tombstone
    t.merge(spark.createDataFrame([(1, "a2")], "k int, v string"), mode="mor")
    assert _state(spark, t) == {1: "a2", 2: "b"}
    # and a later tombstone kills the re-insert again
    t.merge(
        upserts=spark.createDataFrame([], "k int, v string"),
        deletes=spark.createDataFrame([(1,)], "k int"),
        mode="mor",
    )
    assert _state(spark, t) == {2: "b"}


def test_mor_same_commit_rows_survive_their_own_tombstone(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=2)
    t.merge(spark.createDataFrame([(1, "a")], "k int, v string"), mode="mor")
    # upsert of an existing key: tombstone + new row in ONE commit;
    # the new row must survive (same version: tv <= dv)
    t.merge(spark.createDataFrame([(1, "a2")], "k int, v string"), mode="mor")
    assert _state(spark, t) == {1: "a2"}


def test_compact_folds_tombstones(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=2)
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(6)], "k int, v string")
    )
    for i in range(3):
        t.merge(
            spark.createDataFrame([(i, f"u{i}")], "k int, v string"), mode="mor"
        )
    assert any(f["content"] == 2 for f in t.files(spark).collect())
    t.compact(spark, min_files=2)
    # tombstones folded: no delete files remain, state preserved
    assert not any(f["content"] == 2 for f in t.files(spark).collect())
    assert _state(spark, t) == {0: "u0", 1: "u1", 2: "u2", 3: "v3", 4: "v4", 5: "v5"}


def test_expire_keeps_carried_tombstones(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=2)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.merge(
        upserts=spark.createDataFrame([], "k int, v string"),
        deletes=spark.createDataFrame([(1,)], "k int"),
        mode="mor",
    )
    t.merge(spark.createDataFrame([(3, "c")], "k int, v string"), mode="mor")
    t.expire_snapshots(retain_last=1)
    # the v2 tombstone is still referenced by the current manifest and
    # must survive the GC of expired version dirs
    assert _state(spark, t) == {2: "b", 3: "c"}


def test_mor_then_cow_merge_folds_touched_tombstones(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=1)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.merge(spark.createDataFrame([(1, "a2")], "k int, v string"), mode="mor")
    # COW merge rewrites the bucket with tombstones applied -> folded
    t.merge(spark.createDataFrame([(2, "b2")], "k int, v string"), mode="cow")
    assert not any(f["content"] == 2 for f in t.files(spark).collect())
    assert _state(spark, t) == {1: "a2", 2: "b2"}


def test_delete_where_after_mor_does_not_resurrect(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=1)
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(6)], "k int, v string")
    )
    t.merge(
        upserts=spark.createDataFrame([], "k int, v string"),
        deletes=spark.createDataFrame([(0,)], "k int"),
        mode="mor",
    )
    # the predicate rewrite reads WITH tombstones applied; the rewritten
    # dir outranks the tombstone, so key 0 must NOT come back
    t.delete_where(spark, [("k", ">=", 4)])
    assert _state(spark, t) == {1: "v1", 2: "v2", 3: "v3"}


def test_mor_lookup_and_pruned_read_respect_tombstones(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=4)
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(8)], "k int, v string")
    )
    t.merge(
        upserts=spark.createDataFrame([(5, "u5")], "k int, v string"),
        deletes=spark.createDataFrame([(2,)], "k int"),
        mode="mor",
    )
    assert t.lookup(spark, {"k": 2}).count() == 0
    assert [r["v"] for r in t.lookup(spark, {"k": 5}).collect()] == ["u5"]
    got = {r["k"] for r in t.read(spark, where=[("k", "between", (1, 6))]).collect()}
    assert got == {1, 3, 4, 5, 6}


def test_mor_merge_with_schema_evolution(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=2)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    # the MoR batch adds a column: manifest schema evolves, old data
    # files null-fill on read, tombstone sequencing still applies
    t.merge(
        spark.createDataFrame([(1, "a2", 7)], "k int, v string, w int"),
        mode="mor",
    )
    got = {r["k"]: (r["v"], r["w"]) for r in t.read(spark).collect()}
    assert got == {1: ("a2", 7), 2: ("b", None)}


def test_mor_merge_idempotency_token_no_ops_replay(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "t", ["k"], num_buckets=2)
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    up = spark.createDataFrame([(1, "a2")], "k int, v string")
    v1 = t.merge(up, mode="mor", token="epoch-7")
    v2 = t.merge(up, mode="mor", token="epoch-7")  # replayed micro-batch
    assert v1 == v2 == t.current_version()
    assert _state(spark, t) == {1: "a2"}
