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


def _split_top_level(body: str, opens: str, closes: str) -> list[str]:
    """Split on commas at bracket depth 0 — a naive ``[^\\]]*`` capture
    truncates at the FIRST closing bracket inside a nested entry (e.g.
    ``In(lang, [es,ca])`` or ``spans:array<struct<...>>``), silently
    DROPPING every entry after it; a pruning/pushdown assertion built on
    the truncated list then passes when the property does not hold."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in body:
        if ch in opens:
            depth += 1
        elif ch in closes:
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into a file-source scan (empty if none)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", formatted_plan(df)):
        out.extend(_split_top_level(m.group(1), "[(", "])"))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """TOP-LEVEL columns actually read by the scan (column pruning
    check); nested struct/array fields stay inside their column entry."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*)>", formatted_plan(df)):
        for entry in _split_top_level(m.group(1), "<", ">"):
            cols.append(entry.split(":", 1)[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (HashAggregate partial pass).

    Matched PER HashAggregate NODE: a plan-wide ``HashAggregate.*partial``
    DOTALL search would accept 'partial' anywhere later in the plan text
    (AQE's 'PartialReducerPartitionSpec', an alias containing the word),
    and a bare two-HashAggregate count accepts two unrelated final-mode
    aggregates — either way the pin silently passes with NO map-side
    combine, which is exactly the failure the helper exists to catch."""
    for line in physical_plan(df).splitlines():
        if "HashAggregate" in line and "partial_" in line:
            return True
    # formatted explain spells each node's functions out even when the
    # one-line form truncates: "Functions [partial_count(...)]"
    return bool(re.search(r"Functions \[partial_", formatted_plan(df)))


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
