"""Physical-plan inspection helpers (SURVEY.md §4.2).

The reference has no optimizer; Catalyst supplies ours.  These helpers make
the plan *shape* assertable in tests, so the properties the 100 TB design
relies on — filter pushdown into the parquet scan, column pruning, broadcast
joins for dimension tables, partial (map-side) aggregation, whole-stage
codegen over the native expressions — are pinned by CI instead of hoped for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final (AQE-initial) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(),
                                            "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into a file-source scan (empty if none)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the scan (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (HashAggregate partial pass)."""
    plan = physical_plan(df)
    return bool(re.search(r"HashAggregate.*partial", plan, re.I | re.S)) or \
        plan.count("HashAggregate") >= 2


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (native expressions fused)."""
    text = physical_plan(df) + formatted_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", text)) |
               set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))


def python_eval_count(df: DataFrame) -> int:
    """ArrowEvalPython / python-runner nodes — each is one JVM↔Python hop
    per batch.  The fused pipeline keeps this at one per tier (§4.2-2)."""
    return len(re.findall(r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
                          physical_plan(df)))
