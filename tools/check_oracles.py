"""Self-check harness mimicking the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at the given sf and,
where an ``oracle_sql()`` twin exists, the same query on DuckDB (tables
pre-registered as views).  Compares row count, sorted column names, and an
order-insensitive value frame.  Exit code 1 on any mismatch.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
        elif str(df[col].dtype).startswith("float"):
            df[col] = df[col].round(6)
        elif str(df[col].dtype) in ("bool", "boolean"):
            df[col] = df[col].astype("boolean").astype(str)
        else:
            try:
                df[col] = df[col].astype("Int64")
            except (TypeError, ValueError):
                df[col] = df[col].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from ocr_spark.job import build_session
    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"✗ {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only ({len(sdf)} rows, "
                  f"{len(sdf.columns)} cols) — no oracle")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"✗ {name}: duckdb error {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if diff[c].any()]
                idx = diff.any(axis=1)
                sample_a = a[idx].head(3).to_dict("records")
                sample_b = b[idx].head(3).to_dict("records")
                problems.append(f"values differ in {bad_cols}; "
                                f"spark={sample_a} duck={sample_b}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"✓ {name}: {len(sdf)} rows match")

    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
