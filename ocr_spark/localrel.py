"""Small driver-side DataFrames via the Arrow local-relation path.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the rows
over ``defaultParallelism`` RDD partitions and pays one Python-worker task
per partition on EVERY action — measured ~5 s for an 8-row frame at
local[32] in this environment (32 worker spin-ups, or one task dragging 32
parent partitions after a coalesce).  Routing the same rows through a
pandas payload produces an Arrow-backed local relation: no Python tasks at
action time, ~25× faster for the tiny frames this repo builds driver-side
(IVF centroids and probe lists, planted test rows, collected summaries).

At cluster scale the same rule holds: driver-local inputs should enter the
plan as a local relation (broadcastable, no job), not as a parallelized
RDD.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Arrow-path ``createDataFrame`` for small driver-side row lists.

    ``rows`` is a list of tuples; ``schema`` a DDL string ("a int, b
    array<double>") or a ``StructType``.  Column order must match the
    tuples, as with the plain-list form.
    """
    if isinstance(schema, str):
        names = [f.split()[0].strip() for f in _split_fields(schema)]
    else:
        names = list(schema.fieldNames())
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema=schema)


def _split_fields(schema: str) -> list[str]:
    """Split a DDL struct body on top-level commas ("a int, b array<int>"
    → ["a int", "b array<int>"])."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:i].strip())
            start = i + 1
    fields.append(schema[start:].strip())
    return fields
