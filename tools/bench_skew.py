"""Skew-salt evidence bench (§4.2-1 / VERDICT r2 item 8).

Plants the salt mechanism's pathological input — ONE url re-captured for
~30% of the corpus (url-hash placement puts every capture in a single
partition) — and runs the SAME pipeline with ``salt=0`` and ``salt=8``.
Straggler severity is read from the pipeline's own per-partition lineage
rows: ``wall_ms`` is the partition's Python-stage extraction wall and
``input_count`` its row count, so

    straggler_ratio = max(partition wall) / median(partition wall)

collapses toward ~1 when the salt spreads the hot url's captures.  The
global digest must be IDENTICAL across both runs — placement must never
change a single output byte.

Host skew needs no salt: urls are distinct there and ``xxhash64(url)``
already spreads them (asserted by the placement unit test); the salt
exists precisely for same-url capture floods, which is what this bench
plants.

Usage::

    python tools/bench_skew.py [--pages 24000] [--partitions 32] \
        [--hot-pct 30] [--out BENCH_skew.json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys  # noqa: E402

sys.path.insert(0, str(REPO))

RUN_DATE = date(2026, 8, 16)
HOT_URL = "https://hot-host.example/flooded-capture"


def skewed_pages(spark, rows: int, hot_pct: int, partitions: int):
    """Deterministic corpus where ``hot_pct``% of pages are captures of ONE
    url (distinct warc_ts/content per capture, as a crawl flood would be)."""
    import pandas as pd

    from ocr_spark import pagegen
    from ocr_spark.schema import PAGES_SCHEMA

    def gen(iterator):
        for pdf in iterator:
            batch = []
            for i in pdf["id"]:
                row = pagegen.page_for(int(i))
                if int(i) % 100 < hot_pct:
                    row["url"] = HOT_URL
                batch.append(row)
            yield pd.DataFrame(batch)

    return (spark.range(0, rows, numPartitions=partitions)
            .mapInPandas(gen, schema=PAGES_SCHEMA))


def run_once(spark, pages_path: str, out: str, partitions: int, salt: int,
             curate_chain: bool = True) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark import job

    t0 = time.monotonic()
    summary = job.run_pipeline(
        spark, pages_path, out, RUN_DATE, partitions=partitions, salt=salt)
    wall_s = time.monotonic() - t0
    lineage = (spark.read.parquet(f"{out}/lineage")
               .filter(F.col("partition_id") >= 0)
               .select("partition_id", "input_count", "wall_ms").collect())
    walls = sorted(r["wall_ms"] for r in lineage)
    counts = sorted(r["input_count"] for r in lineage)
    med_wall = statistics.median(walls) or 1
    result = {
        "salt": salt,
        "digest": summary["digest"],
        "wall_s": round(wall_s, 2),
        "n_partitions": len(walls),
        "max_partition_rows": counts[-1],
        "median_partition_rows": statistics.median(counts),
        "max_partition_wall_ms": walls[-1],
        "median_partition_wall_ms": med_wall,
        "straggler_ratio": round(walls[-1] / med_wall, 3),
    }
    if curate_chain:
        # the 100-TB story continues past extraction: run the curation
        # chain over this salted run's output.  doc identity must include
        # warc_ts — the flood makes url itself non-unique by design — so
        # the chain's digest stays salt-invariant (placement never changes
        # an output byte, end to end)
        from ocr_spark import curate

        t1 = time.monotonic()
        (spark.read.parquet(f"{out}/data")
         .select(F.xxhash64("url", "warc_ts").alias("doc_id"),
                 F.coalesce(F.col("extracted_text"), F.lit(""))
                 .alias("text"))
         .write.mode("overwrite").parquet(f"{out}/docs"))
        cu = curate.run_curation(spark, f"{out}/docs", f"{out}/curated",
                                 partitions=partitions)
        result["curate_wall_s"] = round(time.monotonic() - t1, 2)
        result["curate_digest"] = cu["digest"]
        result["curate_kept"] = cu["kept_count"]
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--hot-pct", type=int, default=30)
    ap.add_argument("--out", default=str(REPO / "BENCH_skew.json"))
    ap.add_argument("--no-curate", action="store_true",
                    help="skip the attached curation chain (round-2 shape)")
    args = ap.parse_args()

    import shutil
    import tempfile

    from ocr_spark import job

    spark = job.build_session("bench_skew", master="local[32]",
                              shuffle_partitions=args.partitions)
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        pages_path = f"{wd}/pages.parquet"
        skewed_pages(spark, args.pages, args.hot_pct, args.partitions) \
            .write.mode("overwrite").parquet(pages_path)
        # warmup (JIT + Python worker pool) so neither measured run pays it
        run_once(spark, pages_path, f"{wd}/warm", args.partitions, 0,
                 curate_chain=not args.no_curate)
        results = [run_once(spark, pages_path, f"{wd}/salt{s}",
                            args.partitions, s,
                            curate_chain=not args.no_curate)
                   for s in (0, 8)]
        blob = {
            "bench": "skew_salt",
            "pages": args.pages,
            "hot_url_pct": args.hot_pct,
            "partitions": args.partitions,
            "master": "local[32]",
            "runs": results,
            "digests_identical": results[0]["digest"] == results[1]["digest"],
            "straggler_collapse":
                round(results[0]["straggler_ratio"]
                      / results[1]["straggler_ratio"], 2),
        }
        if not args.no_curate:
            blob["curate_digests_identical"] = (
                results[0]["curate_digest"] == results[1]["curate_digest"])
        Path(args.out).write_text(json.dumps(blob, indent=2) + "\n")
        print(json.dumps(blob, indent=2))
        print("\n| salt | max rows/part | straggler ratio (wall) | job wall s |")
        print("|---|---|---|---|")
        for r in results:
            print(f"| {r['salt']} | {r['max_partition_rows']} | "
                  f"{r['straggler_ratio']} | {r['wall_s']} |")
    finally:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
