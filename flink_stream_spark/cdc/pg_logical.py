"""CDC from PostgreSQL logical decoding — no Debezium/Kafka needed.

The reference captures Postgres changes through Debezium into Kafka
(reference: test_cdc.py:34-63, kafka/plugins/debezium-connector-postgres).
Postgres itself exposes the same WAL change stream through logical
replication slots; the built-in ``test_decoding`` output plugin renders
each change as one text row:

    table public.customers: INSERT: id[integer]:1 email[text]:'a@x'
    table public.customers: UPDATE: id[integer]:2 email[text]:'b2@y'
    table public.customers: DELETE: id[integer]:1

``pg_logical_slot_peek_changes`` returns these in WAL order, so a JDBC
batch read of the slot (with a Postgres-side ``row_number() OVER ()``
preserving stream order — Spark gives no row-order guarantee after the
scan) is a complete CDC envelope source. Parsing and apply are plain
codegen'd projections + one last-per-key window, identical in shape to
cdc/envelope.py's Debezium path.

Scale posture: the parse is per-row regexp (narrow, no shuffle); the
final-state apply shuffles once on (table, key) — same contract as
``cdc_apply_final_state``. At production scale the slot would be
consumed incrementally (``get_changes`` advances the slot; ``peek``
here keeps the test idempotent) with the same parse applied per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one col[type]:value fragment; values are either a single-quoted
# string (doubled-quote escapes) or a bare token. Key and value are
# captured from the SAME fragment match so the two can never misalign
# (a quoted value containing a "word[type]:" substring would desync
# two independent extraction passes).
_VAL = r"('(?:[^']|'')*'|[^ ]+)"
_PAIR_RE = r"\w+\[[^\]]+\]:" + _VAL.replace("(", "(?:", 1)
_KEY_RE = r"^(\w+)\["
_VAL_RE = r"\]:" + _VAL + "$"
_HEAD_RE = r"^table ([\w.]+): (INSERT|UPDATE|DELETE|TRUNCATE):"


def parse_test_decoding(changes: DataFrame, data_col: str = "data") -> DataFrame:
    """(seq, data) -> (seq, tbl, op, after map<string,string>).

    Non-change rows (BEGIN/COMMIT markers) are dropped. TRUNCATE
    renders as ``table x: TRUNCATE: (no-flags)`` and is emitted with
    an empty image (``(no-flags)`` matches no col[type]:value
    fragment), mirroring the pgoutput twin; a multi-table
    ``TRUNCATE a, b`` renders as ``table a, b: TRUNCATE:`` which the
    single-table head regex does not match — use the pgoutput parser
    (which receives one relid per table) for that case. Quoted values
    are unquoted with '' -> ' unescaping; bare tokens pass through as
    their text rendering (the caller casts as needed).

    A test_decoding UPDATE that changes the primary key — or any table
    with REPLICA IDENTITY FULL — emits ``old-key: ... new-tuple: ...``
    sections where the same column appears twice; only the text after
    the first ``new-tuple:`` marker is parsed (the new row image), so
    map_from_arrays never sees a duplicated key."""
    d = F.col(data_col)
    # new row image only: strip the head + any old-key section. The
    # non-greedy ^.*? cut takes the FIRST marker, which precedes every
    # column value by construction of the test_decoding format.
    body = F.when(
        d.rlike(r" new-tuple: "),
        F.regexp_replace(d, r"^.*? new-tuple: ", ""),
    ).otherwise(d)
    # Python-API pattern literals: the regexes contain single quotes,
    # which would need double-escaping inside F.expr SQL strings.
    # ONE match per fragment; key/value re-split per fragment (anchored)
    # so alignment is structural, not positional.
    frags = F.regexp_extract_all(body, F.lit(_PAIR_RE), F.lit(0))
    keys = F.transform(frags, lambda p: F.regexp_extract(p, _KEY_RE, 1))
    vals = F.transform(
        frags,
        lambda p: F.regexp_extract(p, _VAL_RE, 1),
    )
    vals = F.transform(
        vals,
        lambda v: F.when(
            v.startswith("'"),
            F.replace(v.substr(F.lit(2), F.length(v) - 2), F.lit("''"), F.lit("'")),
        ).otherwise(v),
    )
    return (
        changes.select(
            "seq",
            F.regexp_extract(d, _HEAD_RE, 1).alias("tbl"),
            F.regexp_extract(d, _HEAD_RE, 2).alias("op"),
            F.map_from_arrays(keys, vals).alias("after"),
        )
        .filter(F.col("op") != "")
    )


def cdc_final_state_from_log(parsed: DataFrame, key: str) -> DataFrame:
    """Replay the ordered change log to current state: last change per
    (tbl, key) wins; a last-op DELETE removes the row, and a TRUNCATE
    removes every row of its table whose last change precedes it
    (rows re-inserted after the truncate survive — exactly Postgres
    semantics). Returns (tbl, key, after) for surviving rows — the
    same last-per-key + delete-aware apply as cdc/envelope.py, over
    the logical-slot source.

    Scale: one shuffle on (tbl, key) for the window; the truncate
    side aggregates to one row per truncated TABLE (broadcast-size by
    construction) and joins broadcast, so honoring TRUNCATE adds no
    second data-volume shuffle.

    The truncate side does RE-SCAN ``parsed``: replayable sources
    (files, golden captures) are fine, but a frame backed by a LIVE
    ``pg_logical_slot_peek_changes`` JDBC read is single-consumer —
    two concurrent scans fail with "replication slot is active for
    PID". Pin one snapshot first (``.localCheckpoint(eager=True)``,
    exactly what cdc/slot_stream.py and parse_pgoutput do)."""
    trunc = (
        parsed.filter(F.col("op") == "TRUNCATE")
        .groupBy("tbl")
        .agg(F.max("seq").alias("__trunc_seq"))
    )
    dml = parsed.filter(F.col("op") != "TRUNCATE")
    keyed = dml.withColumn("k", F.col("after").getItem(key))
    w = Window.partitionBy("tbl", "k").orderBy(F.desc("seq"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .join(F.broadcast(trunc), "tbl", "left")
        .filter(
            F.col("__trunc_seq").isNull() | (F.col("seq") > F.col("__trunc_seq"))
        )
        .select("tbl", F.col("k").alias(key), "after")
    )
