"""Temporal operators: as-of join + latest-snapshot resolution.

Two standard event-time building blocks a web-corpus pipeline needs
(capture history per url, metric-vs-config alignment, CDX-style "latest
snapshot wins"):

* :func:`asof_join` — for every left row, the most recent right row with
  ``right.ts <= left.ts`` per key (backward direction).  Implemented with
  the union+window trick: tag both sides, union, and carry the right
  payload forward with ``last(..., ignorenulls)`` over a per-key window.
  That is ONE shuffle on the join key and a linear sort-merge pass —
  never the naive range/cross join whose candidate set explodes
  quadratically on hot keys at 10^12 rows.  (Spark has no native ASOF;
  DuckDB does — the driver oracle uses it to verify this composition.)
* :func:`latest_snapshot` — one row per key, the maximum-``ts`` row with a
  deterministic id tie-break (window row_number, single shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts: str = "ts", payload: Sequence[str] = ("value",),
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: attach the latest right payload at-or-before
    each left row's timestamp, per key.

    Output = every left row + ``<payload><suffix>`` columns (null when no
    right row precedes it).  At equal timestamps the right row counts as
    visible (``<=`` semantics, matching DuckDB ``ASOF JOIN`` on
    ``l.ts >= r.ts``); among multiple right rows the window order makes the
    latest (ts, then last-sorted) one win.
    """
    lcols = left.columns
    tagged_l = (left
                .withColumn("_is_left", F.lit(1))
                .withColumn("_rpay", F.lit(None).cast(
                    "struct<" + ",".join(
                        f"{c}:{right.schema[c].dataType.simpleString()}"
                        for c in payload) + ">")))
    tagged_r = (right
                .select(on, ts,
                        F.struct(*[F.col(c) for c in payload]).alias("_rpay"))
                .withColumn("_is_left", F.lit(0)))
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))
    unioned = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))
    # right rows sort BEFORE left rows at the same ts (_is_left asc) so the
    # <= visibility rule holds; last(ignorenulls) carries the payload forward
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("_asof", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_asof.{c}").alias(f"{c}{suffix}") for c in payload])
    return out


def latest_snapshot(df: DataFrame, key: str = "user_id", ts: str = "ts",
                    tie_break: str = "event_id") -> DataFrame:
    """One row per key: maximum ``ts``, deterministic ``tie_break`` desc —
    the CDX-style "latest capture per url wins" resolution (single shuffle
    on the key; at 10^12 rows this is a map-side-combinable top-1)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(),
                                        F.col(tie_break).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
