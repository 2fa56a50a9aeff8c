"""Continuous, slot-advancing CDC consumption from a live pgoutput slot.

The reference's operating mode is a CONTINUOUS tail: Debezium sits on
a PostgreSQL logical-replication slot and streams every change into
the pipeline (reference: kafka/config/connect-postgres-source.json:4-13
— "plugin.name": "pgoutput"), with the slot's ``confirmed_flush_lsn``
as the durable consumption cursor. The repo's earlier live e2es decoded
a ONE-SHOT ``peek`` (idempotent but never advancing); this module
closes that gap with a micro-batch consumer loop:

    per trigger:
      1. PEEK the slot (``pg_logical_slot_peek_binary_changes`` over
         JDBC) and pin ONE snapshot of the returned frame — each row
         carries its WAL byte offset (``lsn - '0/0'``) so the ack
         target comes from the SAME snapshot that is applied (a second
         read could see newer rows and ack past unapplied data).
      2. DECODE via cdc/pgoutput.py and APPLY per routed table: reduce
         to last-event-per-key, MERGE upserts + deletes into the
         managed warehouse with an idempotency token derived from
         (slot, max lsn of the batch).
      3. ACK: ``pg_replication_slot_advance(slot, lsn)`` — executed
         only AFTER every table committed.

Delivery contract — exactly-once EFFECT from at-least-once delivery,
the same recipe as the reference's Debezium→Iceberg path (Kafka offsets
+ Iceberg commit dedup):

- crash between apply and ack: the batch is re-delivered whole; every
  table MERGE no-ops on its committed token (same max-lsn) and the ack
  then lands. No double-apply.
- crash mid-apply: re-delivery re-MERGEs; tables that committed no-op
  on the token, tables that didn't apply now. MERGE reduces to
  last-per-key in WAL order, so a re-applied prefix is absorbed.
- re-delivery that grew (new commits since the crash): the token
  differs, the whole superset re-applies — last-per-key over a
  superset in WAL order yields the same final state. Idempotent.
- ``peek`` (not ``get``) is deliberate: ``get`` is a destructive read
  that advances the slot AT READ TIME, so a crash between read and
  apply LOSES the batch. peek + advance-after-commit is the ack-after-
  durable-write pattern every at-least-once consumer uses.

Restart survival is structural: the durable state is the slot cursor
(Postgres-side) + the managed tables (warehouse-side); a new consumer
process resumes from ``confirmed_flush_lsn`` with zero local state.

The ack is ONE control-plane statement on a plain JDBC connection via
the JVM gateway (DriverManager) — NOT a Spark read: Spark's JDBC
source probes schemas with a ``WHERE 1=0`` wrapper and may plan the
inner query zero or multiple times, which would make the ack's
execution count undefined.

Scale posture: the per-trigger frame is one change batch (bounded by
trigger cadence × write rate, never table size); parse is the narrow
Arrow pass of parse_pgoutput; apply shuffles once per table on its
key (the MERGE contract). TRUNCATE is honored transactionally: the
batch's post-truncate changes apply over an emptied table, with the
emptying and the merge guarded by the same token so a re-delivery
can never wipe already-merged state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.cdc.envelope import last_per_key
from flink_stream_spark.cdc.pgoutput import parse_pgoutput
from flink_stream_spark.tables.managed import Warehouse


class PgSlotCdcConsumer:
    """Micro-batch consumer of one pgoutput replication slot into a
    managed warehouse.

    ``tables`` routes source tables to sinks:
    ``{"public.items": {"sink": "items", "key": "id",
       "columns": ["id", "name"]}}`` — column values land as strings
    (the pgoutput text wire format; cast downstream as needed, exactly
    like Debezium's string-mode envelopes).
    """

    def __init__(
        self,
        spark: SparkSession,
        jdbc_url: str,
        slot: str,
        publication: str,
        warehouse: Warehouse,
        tables: dict,
        driver: str = "org.postgresql.Driver",
    ):
        self.spark = spark
        self.jdbc_url = jdbc_url
        self.slot = slot
        self.publication = publication
        self.warehouse = warehouse
        self.tables = tables
        self.driver = driver

    # -- data plane ---------------------------------------------------------

    def _peek_query(self) -> str:
        return (
            "(SELECT row_number() OVER () AS seq, "
            "(lsn - '0/0'::pg_lsn)::bigint AS lsn_off, data "
            f"FROM pg_logical_slot_peek_binary_changes('{self.slot}', "
            "NULL, NULL, 'proto_version', '1', "
            f"'publication_names', '{self.publication}')) src"
        )

    def peek(self) -> DataFrame:
        """One PINNED snapshot of the slot's pending changes (eager
        localCheckpoint: the apply pass and the max-lsn ack target
        must come from the same read — see module doc)."""
        return (
            self.spark.read.format("jdbc")
            .option("url", self.jdbc_url)
            .option("dbtable", self._peek_query())
            .option("driver", self.driver)
            .load()
            .localCheckpoint(eager=True)
        )

    # -- control plane ------------------------------------------------------

    def _exec_scalar(self, sql: str):
        """One statement on a plain JDBC connection through the JVM
        gateway — deterministic single execution (a Spark JDBC read
        may plan the pushed-down query 0..n times). The driver class
        is resolved through the context classloader and instantiated
        DIRECTLY (jars added via ``spark.jars`` live in Spark's
        mutable URL classloader, which the system classloader — and
        therefore Class.forName/DriverManager — cannot see)."""
        jvm = self.spark._jvm
        loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
        # Class.newInstance(): deprecated in Java but the only no-arg
        # construction py4j can express (getDeclaredConstructor() is a
        # varargs method py4j cannot call with zero args)
        drv = loader.loadClass(self.driver).newInstance()
        conn = drv.connect(self.jdbc_url, jvm.java.util.Properties())
        try:
            stmt = conn.createStatement()
            rs = stmt.executeQuery(sql)
            rs.next()
            return rs.getString(1)
        finally:
            conn.close()

    def advance(self, lsn_off: int) -> str:
        """Ack everything up to ``lsn_off`` WAL bytes (advances
        ``confirmed_flush_lsn``; peeks never return it again)."""
        return self._exec_scalar(
            "SELECT (pg_replication_slot_advance("
            f"'{self.slot}', '0/0'::pg_lsn + {int(lsn_off)}::numeric)"
            ").end_lsn::text"
        )

    # -- apply --------------------------------------------------------------

    def _apply_table(
        self, env: DataFrame, src_tbl: str, spec: dict, token: str
    ) -> None:
        sink = self.warehouse.table(spec["sink"], key_columns=[spec["key"]])
        if token in sink.committed_tokens():
            return  # re-delivered batch: this table already committed
        rows = env.filter(F.col("tbl") == src_tbl)
        t_seq = (
            rows.filter(F.col("op") == "TRUNCATE")
            .agg(F.max("seq"))
            .collect()[0][0]
        )
        key = spec["key"]
        cols = spec["columns"]
        if key not in cols:
            raise ValueError(f"{src_tbl}: key {key!r} must be in columns")
        if t_seq is not None:
            # truncate semantics: everything before t_seq is void; the
            # emptying rides the SAME merge commit (token-guarded) as
            # the post-truncate apply, so re-delivery cannot wipe
            # already-merged state
            rows = rows.filter(
                (F.col("seq") > F.lit(t_seq)) & (F.col("op") != "TRUNCATE")
            )
        # flatten the wire map to the declared columns BEFORE the
        # per-key reduce (last_per_key's content tie-break hashes every
        # column, and map columns don't hash)
        flat = rows.select(
            "seq",
            "op",
            *[F.col("after").getItem(c).alias(c) for c in cols],
        )
        last = last_per_key(flat, [key], ["seq"])
        # a key whose LAST event is DELETE is a delete; anything else
        # is an upsert — the two sets are disjoint by construction
        ups = last.filter(F.col("op") != "DELETE").select(*cols)
        dels = last.filter(F.col("op") == "DELETE").select(key)
        if t_seq is not None and sink.exists():
            survivors = ups.select(key)
            dels = (
                sink.read(self.spark)
                .select(key)
                .join(survivors, key, "left_anti")
                .unionByName(dels)
                .distinct()
            )
        if sink.exists():
            sink.merge(
                ups, keys=[key], deletes=dels,
                validate_unique_keys=False, token=token,
            )
        else:
            # first batch bootstraps the table; deletes of never-seen
            # keys are vacuous (ups and dels are disjoint)
            sink.append(ups, token=token)

    def run_once(self) -> "int | None":
        """Consume one micro-batch: peek → decode → apply → ack.
        Returns the acked lsn offset, or None when the slot was idle."""
        snap = self.peek()
        if snap.isEmpty():
            return None
        max_off = snap.agg(F.max("lsn_off")).collect()[0][0]
        env = parse_pgoutput(snap)  # eager (localCheckpoint inside)
        for src_tbl, spec in self.tables.items():
            token = f"slot:{self.slot}:lsn:{max_off}"
            self._apply_table(env, src_tbl, spec, token)
        self.advance(int(max_off))
        return int(max_off)

    def run_loop(self, max_triggers: int, idle_stop_after: int = 0) -> list:
        """Drive ``run_once`` up to ``max_triggers`` times (a Structured
        Streaming foreachBatch trigger loop without the Kafka hop —
        the sandbox has no Kafka jars; the cadence contract matches
        the reference's ~10 s commit interval). Stops early after
        ``idle_stop_after`` consecutive empty polls when set. Returns
        the acked offsets."""
        acked, idle = [], 0
        for _ in range(max_triggers):
            off = self.run_once()
            if off is None:
                idle += 1
                if idle_stop_after and idle >= idle_stop_after:
                    break
            else:
                idle = 0
                acked.append(off)
        return acked
