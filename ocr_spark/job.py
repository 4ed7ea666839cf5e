"""The batch extraction pipeline (SURVEY.md §3.4 / §7).

    pages (url, warc_ts, html, text, lang)
      → admission gates (size cap, decodable) + quarantine      [S2–S4]
      → resume anti-join                                        [§4.3]
      → repartition(P, xxhash64(url) [+ salt])                  [§4.2-1]
      → ONE fused pUDF pass: tier-1 strip → route → parse →
        validate, and — for rows the router sends to fallback —
        the permissive tier-2 extraction INLINE over the same
        DOM segmentation → re-route → re-parse                  [T1/T2/T5/T6]
      → ONE data sink partitioned by doc_type (unified columns +
        response_json; typed view via read_datos) + quarantine + lineage

(``fuse_tiers=False`` selects the two-stage twin — tier-1 pass, persisted;
tier-2 pass over the fallback slice; union — which produces byte-identical
rows/digests and remains the differential check for the fused shape.)

Scale notes (designed for 10^12 docs / 1000 executors, tested on local[*]):
* the only shuffle is the single explicit ``repartition`` — everything after
  is narrow (one fused pUDF, filters), so scaling is governed by the parse
  stage which is embarrassingly parallel;
* hot hosts are spread by hashing the full url (doc-level, not host-level);
  ``--salt`` adds an extra random-ish key term for pathological cases;
* AQE left on for post-shuffle coalesce; Arrow batch size capped because a
  page can be ~100 KB of text (``§4.2-2``);
* tier-2 work runs ONLY for rows the tier-1 router sends to fallback — the
  reference's "≤1 Vision credit per document" cost rule
  (``docs/API.md:85-86``); fused inline it additionally reuses tier 1's
  DOM segmentation instead of re-parsing the html.

CLI::

    python -m ocr_spark.job --input pages.parquet --output /out \
        --run-date 2026-08-16 --partitions 256 [--salt 8] [--resume]
"""

from __future__ import annotations

import argparse
import time
import uuid
from datetime import date
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark import lineage as lin
from ocr_spark.functions import udfs
from ocr_spark.schema import PAGES_SCHEMA

MAX_HTML_BYTES = 5 * 1024 * 1024  # reference's 5 MB admission cap (S4)

DOC_TYPES = ("dni", "permiso_circulacion", "nif")

# unified output row (same schema for every doc type → single table)
_UNIFIED_COLS = ("url", "warc_ts", "lang", "doc_type", "tier", "tier2_reason",
                 "extracted_text", "ocr_engine", "ocr_confidence",
                 "valido", "confianza_global", "spans")

_SPANS_TYPE = "array<struct<field:string,start:int,end:int>>"


def build_session(app: str = "ocr_spark", master: Optional[str] = None,
                  shuffle_partitions: int = 64) -> SparkSession:
    import os
    builder = (
        SparkSession.builder.appName(app)
        # local mode runs everything in one JVM — the 1g default heap cannot
        # hold 32 concurrent task slots' shuffle+cache state (no-op if the
        # session already exists or on a real cluster where executors size it)
        .config("spark.driver.memory", os.environ.get("OCR_SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pages are big rows — keep Arrow batches small enough for worker RAM
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # commit output files in tasks, not serially on the driver — with
        # hundreds of partitions × several sinks the v1 driver-side rename
        # pass becomes the serial fraction that caps scaling
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # T7 straggler reaper: re-launch tasks running far beyond the stage
        # median (a wedged page/regex can't hold a partition hostage on a
        # real cluster; no-op under local mode). Per-partition extraction
        # wall lands in lineage.wall_ms for the audit trail.
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "4")
        .config("spark.speculation.quantile", "0.9")
    )
    if master:
        builder = builder.master(master)
    return builder.getOrCreate()


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Pages source: parquet path, or ``table:<catalog.db.tbl>`` for an
    Iceberg (or any catalog) table — same schema contract either way.
    Iceberg gives the scan partition pruning on ``warc_ts`` and atomic
    commit semantics; the parquet path mirrors the layout 1:1 for
    environments (like this sandbox) without the runtime jars.
    """
    if path.startswith("table:"):
        return spark.read.table(path[len("table:"):])
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_datos(spark: SparkSession, output_path: str, doc_type: str) -> DataFrame:
    """Typed per-type view of the data sink (the reference's per-type JSON
    response contract, ``app/models/response.py``).

    The sink stores the response as canonical JSON, hive-partitioned by
    doc_type; this reader prunes the scan to one partition directory and
    decodes the JSON to the per-type struct JVM-side with ``from_json``.
    """
    return (spark.read.parquet(f"{output_path}/data")
            .filter(F.col("doc_type") == doc_type)
            .select("url", "extracted_text",
                    F.from_json("response_json",
                                udfs.RESPONSE_STRUCTS[doc_type])
                    .alias("response")))


def preflight(pages: DataFrame) -> None:
    """S9 health-check analog: fail fast with a clear message if the input
    does not carry the pages contract (before any executor work starts)."""
    missing = [f.name for f in PAGES_SCHEMA.fields
               if f.name not in pages.columns]
    if missing:
        raise ValueError(
            f"input is missing pages columns {missing}; expected schema "
            f"{PAGES_SCHEMA.simpleString()}")


def admission_split(pages: DataFrame,
                    respect_noindex: bool = False) -> tuple[DataFrame,
                                                            DataFrame]:
    """(admitted, quarantined) — S2–S4 gates as native filters.

    Oversized html or rows with neither html nor text are quarantined with a
    reason instead of failing the job (the batch analog of HTTP 400).

    ``respect_noindex`` (opt-in: it changes output row sets and digests)
    additionally quarantines pages whose html carries a
    ``<meta name="robots">`` listing ``noindex`` — the publisher opt-out
    a compliant training-corpus ingest honors.  The check is one JVM
    regexp over the already-scanned html column, BEFORE the Python
    extraction stage spends anything on the page.
    """
    reason = (
        F.when(F.col("url").isNull(), F.lit("missing_url"))
        .when(F.col("html").isNull() & F.col("text").isNull(), F.lit("empty_payload"))
        .when(F.length("html") > MAX_HTML_BYTES, F.lit("oversize"))
    )
    if respect_noindex:
        from ocr_spark.operators.urls import (_ROBOTS_CONTENT_FIRST,
                                              _ROBOTS_NAME_FIRST)
        h = F.col("html").cast("string")
        robots = F.lower(F.coalesce(
            F.nullif(F.regexp_extract(h, _ROBOTS_NAME_FIRST, 1), F.lit("")),
            F.nullif(F.regexp_extract(h, _ROBOTS_CONTENT_FIRST, 1),
                     F.lit("")),
            F.lit("")))
        reason = reason.when(
            robots.rlike(r"(^|[,\s])noindex([,\s]|$)"), F.lit("noindex"))
    tagged = pages.withColumn("_q_reason", reason)
    admitted = tagged.filter(F.col("_q_reason").isNull()).drop("_q_reason")
    quarantined = (tagged.filter(F.col("_q_reason").isNotNull())
                   .select("url", F.col("_q_reason").alias("reason")))
    return admitted, quarantined


def spread_partitions(pages: DataFrame, partitions: int, salt: int = 0) -> DataFrame:
    """Balance work by document, not by input-file layout (§4.2-1).

    Hashing the full url already splits hot hosts across partitions.  The
    optional salt handles the case url-hashing cannot: one url re-crawled
    millions of times.  The salt term must therefore vary *across captures
    of the same url* — it hashes the capture identity (timestamp + content),
    not the url again (which would be a per-url constant and spread
    nothing).  Rows identical in every column still co-locate; that is
    dedup's job, not placement's.
    """
    if salt > 1:
        capture = F.pmod(F.xxhash64("url", "warc_ts", "text", F.lit(salt)),
                         F.lit(salt))
        return pages.repartition(partitions, F.xxhash64("url"), capture)
    return pages.repartition(partitions, F.xxhash64("url"))


def run_pipeline(spark: SparkSession, input_path: str, output_path: str,
                 run_date: date, partitions: int = 64, salt: int = 0,
                 mode: str = "standard", resume: bool = False,
                 tier2_enabled: bool = True, run_id: Optional[str] = None,
                 input_df: Optional[DataFrame] = None,
                 storage_level: str = "MEMORY_AND_DISK",
                 canonicalize_urls: bool = False,
                 respect_noindex: bool = False,
                 fuse_tiers: bool = True) -> dict:
    """Execute the full pipeline; returns run metrics (counts, digest, wall).

    Plan shape (default, ``fuse_tiers=True``): each row crosses the
    JVM↔Python boundary exactly ONCE — one fused mapInPandas doing
    extract → route → parse → validate and, for routed-to-fallback rows,
    the permissive tier-2 extraction inline over the same DOM
    segmentation.  The unified result (html already dropped) is persisted
    once so the sinks and lineage reuse it, and the nested per-type
    response travels as a JSON string decoded JVM-side with ``from_json``
    (whole-stage codegen).

    ``fuse_tiers=False`` runs the two-stage composition (tier-1 pass over
    all rows, persisted; tier-2 pass over the fallback slice; union) —
    kept as the differential twin: both shapes produce byte-identical
    rows and digests (``tests/test_pipeline.py``).  The fused shape saves
    a second html parse for the fallback slice, an input-sized cache (the
    persisted frame carries no raw html), and a stage + union per run.
    """
    t0 = time.monotonic()
    run_id = run_id or uuid.uuid4().hex[:12]

    pages = input_df if input_df is not None else read_pages(spark, input_path)
    preflight(pages)
    if canonicalize_urls:
        # normalize the identity key BEFORE resume/dedup/lineage: raw crawl
        # urls for one resource differ in case/ports/fragments/query order
        # (opt-in — it changes the url column, hence every digest)
        from ocr_spark.operators.urls import canonical_url
        pages = pages.withColumn("url", canonical_url(F.col("url")))
    admitted, quarantined = admission_split(
        pages, respect_noindex=respect_noindex)
    if resume:
        admitted = lin.anti_join_done(admitted, f"{output_path}/data")
    admitted = spread_partitions(admitted, partitions, salt)

    # the persisted frame is ≲ extracted-text-sized (fused path carries no
    # raw html); DISK_ONLY remains the right level when even that does not
    # fit cluster memory (100 TB story, docs/SCALE.md)
    from pyspark import StorageLevel
    level = getattr(StorageLevel, storage_level)

    p1 = p2 = None
    if fuse_tiers:
        # --- ONE fused pass: tier 1 + inline tier 2 on the fallback rows -----
        fused = udfs.fused_single_pass_udf(run_date, mode, tier2_enabled)
        unified = admitted.mapInPandas(fused, udfs.FUSED_SCHEMA)
    else:
        # --- two-stage twin: tier-1 pass, then tier 2 on the failed slice ----
        fused1 = udfs.fused_tier1_udf(run_date, mode, route=tier2_enabled)
        p1 = admitted.mapInPandas(fused1, udfs.FUSED_SCHEMA)
        p1.persist(level)

        parts = [p1.filter(~F.col("needs_tier2"))]
        if tier2_enabled:
            fallback = p1.filter(F.col("needs_tier2")).select(
                "url", "warc_ts", "lang", "html",
                F.col("src_text").alias("text"), "tier2_reason")
            p2 = fallback.mapInPandas(udfs.fused_tier2_udf(run_date, mode),
                                      udfs.FUSED_SCHEMA)
            p2.persist(level)
            parts.append(p2)

        unified = parts[0]
        for part in parts[1:]:
            unified = unified.unionByName(part)
    unified = unified.drop("html", "src_text").withColumn(
        "spans", F.from_json("spans_json", _SPANS_TYPE))
    if fuse_tiers:
        unified.persist(level)

    # --- writes.  ONE partitioned write carries both the unified table and
    #     the per-type response payload: ``data/`` is hive-partitioned by
    #     doc_type with the canonical response JSON alongside the unified
    #     columns, so per-type consumers get partition pruning for free and
    #     the typed struct on demand via :func:`read_datos` (``from_json``
    #     on read).  Compared with the round-1 layout (data + 3 datos_*
    #     sinks) this cuts 3 write jobs and keeps the wide per-type struct
    #     decode out of the write path entirely.  Lineage is aggregated from
    #     the persisted tier frames — no output read-back — and written
    #     strictly last (write-audit-publish order).

    # resume appends (overwrite would drop previously committed runs);
    # quarantine is re-derived every run, so under resume drop rows already
    # quarantined to keep the sink exactly-once too
    write_mode = "append" if resume else "overwrite"
    if resume:
        from pyspark.errors import AnalysisException

        from ocr_spark.lineage import _is_path_not_found
        try:
            prior_q = spark.read.parquet(f"{output_path}/quarantine") \
                .select("url").localCheckpoint(eager=True)
            quarantined = quarantined.join(prior_q, "url", "left_anti")
        except AnalysisException as exc:
            if not _is_path_not_found(exc):
                raise  # any other failure must surface — silently
                # skipping the anti-join would append duplicate rows
            # no prior quarantine output: first run, nothing to dedup

    def _write(df: DataFrame, sub: str, partition_by: Optional[str] = None) -> None:
        writer = df.write.mode(write_mode)
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(f"{output_path}/{sub}")

    def _write_data() -> None:
        if p1 is not None:
            # (two-stage twin) materialize tier 1 first: the unified DAG's
            # two p1 branches (direct + tier-2 input) would otherwise race
            # to compute the same uncached partitions inside the write job.
            # The fused path has one frame and one computing consumer —
            # the write itself fills the cache.
            p1.count()
        _write(unified.select(*_UNIFIED_COLS, "response_json"),
               "data", "doc_type")

    # quarantine derives from the admission split, not the tier caches, so
    # its write overlaps the tier-1 materialization fully
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [
            pool.submit(_write, quarantined, "quarantine"),
            pool.submit(_write_data),
        ]
        for fut in futures:
            fut.result()  # surface the first failure

    lrows = lin.lineage_rows(unified, run_id).persist()
    lrows.write.mode("append").parquet(f"{output_path}/lineage")
    wall_ms = int((time.monotonic() - t0) * 1000)
    # fold the summary from the ~P cached lineage rows (XOR re-folds
    # exactly) instead of a second full aggregation pass over unified
    summary_df = lin.summary_from_lineage(lrows, run_id, wall_ms)
    summary_df.write.mode("append").parquet(f"{output_path}/lineage_summary")
    summary = summary_df.collect()[0].asDict()
    lrows.unpersist()

    for cached in (p1, p2, unified if fuse_tiers else None):
        if cached is not None:
            cached.unpersist()
    summary["wall_ms"] = int((time.monotonic() - t0) * 1000)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description="ocr_spark batch extraction pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-date", required=True, help="YYYY-MM-DD (freezes the clock)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--mode", default="standard",
                    choices=["standard", "aggressive", "layout"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-tier2", action="store_true")
    ap.add_argument("--respect-noindex", action="store_true",
                    help="quarantine pages whose meta robots lists noindex "
                         "(publisher opt-out; changes digests)")
    ap.add_argument("--canonicalize-urls", action="store_true",
                    help="normalize the url column (case/ports/fragments/"
                         "query order) before resume/dedup")
    ap.add_argument("--storage-level", default="MEMORY_AND_DISK",
                    choices=["MEMORY_AND_DISK", "DISK_ONLY", "MEMORY_ONLY"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(master=args.master, shuffle_partitions=args.partitions)
    summary = run_pipeline(
        spark, args.input, args.output, date.fromisoformat(args.run_date),
        partitions=args.partitions, salt=args.salt, mode=args.mode,
        resume=args.resume, tier2_enabled=not args.no_tier2,
        storage_level=args.storage_level,
        canonicalize_urls=args.canonicalize_urls,
        respect_noindex=args.respect_noindex)
    print({k: summary[k] for k in ("run_id", "input_count", "extracted_count",
                                   "valid_count", "tier2_count", "digest", "wall_ms")})


if __name__ == "__main__":
    main()
