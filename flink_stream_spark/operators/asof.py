"""General as-of join: nearest-event matching without a range join.

The classic custom operator relational engines lack and event
pipelines need everywhere: attach to each LEFT row the nearest RIGHT
row at-or-before it (``backward``) or at-or-after it (``forward``) on
an ordering column, per key, optionally within a tolerance.

Spark-first formulation — NOT a per-group ``merge_asof`` UDF and NOT a
windowed theta-join: union the two tagged sides, sort per key, and
carry the latest right-side row forward as a running ``last(struct,
ignorenulls)`` window. Cost is ONE shuffle of |left|+|right| rows on
the key — the same plan shape at any scale, no range-bucketing tune
knob, no quadratic candidate stage. (The registered
``events_asof_join`` query is this pattern hand-specialized; this
module is the general library form, tested against pandas.merge_asof.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    allow_global_sort: bool = False,
) -> DataFrame:
    """Left as-of join (pandas ``merge_asof`` semantics).

    Every left row survives; the matched right columns (all non-key,
    non-``on`` columns, suffixed) are NULL when no right row qualifies.
    ``on`` must be numeric or timestamp; ``tolerance`` (same unit as
    ``on``'s difference semantics — use a number for numeric, an
    interval-in-ms number for timestamps after ``unix_millis``) bounds
    |left.on - right.on|. Equal ``on`` values match (at-or-before /
    at-or-after inclusive).

    ``by`` partitions the running-carry window; WITHOUT it the window
    is global and Spark funnels ALL |left|+|right| rows through ONE
    task — fine for bounded inputs (a small reference series), a
    scale-killer on large ones. The keyless form therefore requires an
    explicit ``allow_global_sort=True`` acknowledging that
    single-task, bounded-input contract.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not by and not allow_global_sort:
        raise ValueError(
            "asof_join without `by` builds a GLOBAL unpartitioned window "
            "(all rows in one task). Pass by=[...] to partition, or "
            "allow_global_sort=True to accept the single-task cost for "
            "bounded inputs"
        )
    by = by or []
    carry_cols = [c for c in right.columns if c not in by and c != on]

    r_payload = F.struct(
        F.col(on).alias("__r_on"), *[F.col(c) for c in carry_cols]
    )
    r_tag = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),  # right sorts before left on ties
        r_payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l_tag = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tag.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    merged = r_tag.unionByName(l_tag)

    # __r as the final key makes the winner among equal-`on` right rows
    # deterministic (struct-lexicographic max), independent of
    # partition layout
    if direction == "backward":
        order = [F.col("__on").asc(), F.col("__side").asc(), F.col("__r").asc()]
    else:
        order = [F.col("__on").desc(), F.col("__side").asc(), F.col("__r").asc()]
    w = (
        W.partitionBy(*by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
        if by
        else W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = merged.withColumn("__match", F.last("__r", ignorenulls=True).over(w))

    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    matched_on = F.col("__match.__r_on")
    if tolerance is not None:
        delta = (
            (F.col("__on") - matched_on)
            if direction == "backward"
            else (matched_on - F.col("__on"))
        )
        in_tol = delta <= tolerance
        match = F.when(F.col("__match").isNotNull() & in_tol, F.col("__match"))
    else:
        match = F.col("__match")
    out_right = [
        match[c].alias(f"{c}{suffix}" if c in left.columns else c)
        for c in carry_cols
    ]
    return filled.filter(F.col("__side") == 1).select(
        *out_left,
        match["__r_on"].alias(f"{on}{suffix}"),
        *out_right,
    )
