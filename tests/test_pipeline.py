"""Spark pipeline integration: routing, tiers, lineage, determinism, resume."""

from __future__ import annotations

from datetime import date
from html import escape

import pytest
from pyspark.sql import functions as F

from ocr_spark import pagegen
from ocr_spark.functions.native import doc_type_router
from ocr_spark.job import admission_split, run_pipeline
from ocr_spark.parsers import dni as dni_parser
from tests.conftest import RUN_DATE
from tests.fixture_texts import DNI_TEXTS

N_PAGES = 240


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    pagegen.write_local(N_PAGES, str(path))
    return str(path)


@pytest.fixture(scope="module")
def pipeline_out(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "run1")
    summary = run_pipeline(spark, pages_path, out, RUN_DATE, partitions=8)
    return out, summary


def test_counts_and_coverage(spark, pipeline_out, pages_path):
    out, summary = pipeline_out
    assert summary["input_count"] == N_PAGES
    assert summary["extracted_count"] == N_PAGES
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N_PAGES
    assert data.select("url").distinct().count() == N_PAGES  # exactly-once
    types = {r["doc_type"] for r in data.select("doc_type").distinct().collect()}
    assert types == {"dni", "permiso_circulacion", "nif"}


def test_extracted_text_contains_source_block(spark, pipeline_out, pages_path):
    out, _ = pipeline_out
    data = spark.read.parquet(f"{out}/data")
    src = spark.read.parquet(pages_path).select("url", F.col("text").alias("expected"))
    lost = data.join(src, "url").filter(F.instr("extracted_text", F.col("expected")) == 0)
    assert lost.count() == 0


def test_typed_outputs_match_pure_parser(spark, pipeline_out, pages_path):
    """Spark response struct == pure-Python kernel on the same extracted text."""
    out, _ = pipeline_out
    from ocr_spark.job import read_datos
    rows = (read_datos(spark, out, "dni")
            .select("url", "extracted_text", "response").limit(30).collect())
    assert rows
    for row in rows:
        datos, raw_mrz = dni_parser.parse(row["extracted_text"], RUN_DATE)
        resp = dni_parser.validate(datos, raw_mrz,
                                   row["response"]["raw"]["ocr_engine"],
                                   row["response"]["raw"]["ocr_confidence"], RUN_DATE)
        got = row["response"].asDict(recursive=True)
        assert got["valido"] == resp["valido"]
        assert got["confianza_global"] == resp["confianza_global"]
        assert got["datos"]["numero_documento"] == resp["datos"]["numero_documento"]
        assert got["datos"]["apellidos"] == resp["datos"]["apellidos"]
        assert [e["code"] for e in got["errores_detectados"]] == \
               [e["code"] for e in resp["errores_detectados"]]


@pytest.mark.parametrize("mode,tier2", [("standard", True),
                                         ("aggressive", True),
                                         ("layout", True),
                                         ("standard", False)])
def test_single_pass_matches_two_stage(spark, pages_path, tmp_path,
                                       mode, tier2):
    """The fused single-pass pipeline (default) and the two-stage twin
    (fuse_tiers=False) must produce byte-identical output in EVERY mode
    and with tier 2 on or off: same global digest, same counts, and
    row-for-row equal data sinks (every unified column + spans)."""
    s_fused = run_pipeline(spark, pages_path, str(tmp_path / "fused"),
                           RUN_DATE, partitions=8, mode=mode,
                           tier2_enabled=tier2)
    s_two = run_pipeline(spark, pages_path, str(tmp_path / "two"),
                         RUN_DATE, partitions=8, mode=mode,
                         tier2_enabled=tier2, fuse_tiers=False)
    assert s_fused["digest"] == s_two["digest"]
    for k in ("input_count", "extracted_count", "valid_count", "tier2_count"):
        assert s_fused[k] == s_two[k], k
    a = spark.read.parquet(f"{tmp_path}/fused/data")
    b = spark.read.parquet(f"{tmp_path}/two/data")
    cols = sorted(set(a.columns) - {"spans"})  # spans compared via json cast
    proj = [F.col(c) for c in cols] + [F.to_json("spans").alias("spans_j")]
    rows_a = sorted(map(tuple, a.select(*proj).collect()))
    rows_b = sorted(map(tuple, b.select(*proj).collect()))
    assert rows_a == rows_b


def test_rerun_digest_identical(spark, pages_path, tmp_path):
    """Same input + same run-date ⇒ identical global digest (determinism),
    at any partition count and with salting on or off."""
    s1 = run_pipeline(spark, pages_path, str(tmp_path / "a"), RUN_DATE, partitions=8)
    s2 = run_pipeline(spark, pages_path, str(tmp_path / "b"), RUN_DATE, partitions=4)
    s3 = run_pipeline(spark, pages_path, str(tmp_path / "c"), RUN_DATE,
                      partitions=8, salt=4)
    assert s1["digest"] == s2["digest"] == s3["digest"]
    assert s1["valid_count"] == s2["valid_count"] == s3["valid_count"]


def test_lineage_rows(spark, pipeline_out):
    out, summary = pipeline_out
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.agg(F.sum("input_count")).collect()[0][0] == N_PAGES
    got = lineage.agg(F.bit_xor("digest")).collect()[0][0]
    # XOR of per-partition digests == global digest (order independence)
    assert got == summary["digest"]


def test_lineage_per_partition_wall(spark, pipeline_out):
    """T7 evidence: every partition records its Python-stage extraction
    wall, and the straggler-reaper configs are active in the session."""
    out, _ = pipeline_out
    lineage = spark.read.parquet(f"{out}/lineage")
    walls = [r["wall_ms"] for r in lineage.select("wall_ms").collect()]
    assert all(w is not None and w >= 0 for w in walls)
    assert any(w > 0 for w in walls)  # real work was timed, not all zeros
    # build_session (not the shared test session) enables the reaper —
    # assert the configs are in its builder recipe
    import inspect

    from ocr_spark.job import build_session
    src = inspect.getsource(build_session)
    assert '"spark.speculation", "true"' in src


def test_preflight_rejects_wrong_schema(spark, tmp_path):
    from ocr_spark.job import preflight
    bad = spark.createDataFrame([(1, "x")], ["id", "body"])
    with pytest.raises(ValueError, match="missing pages columns"):
        preflight(bad)


def test_quarantine(spark, tmp_path):
    big = b"x" * (6 * 1024 * 1024)
    df = spark.createDataFrame(
        [("u-big", None, big, None, "es"), ("u-null", None, None, None, "es"),
         ("u-ok", None, b"<html><body><pre>APELLIDOS</pre></body></html>", None, "es")],
        schema="url string, warc_ts timestamp, html binary, text string, lang string")
    admitted, quarantined = admission_split(df)
    q = {r["url"]: r["reason"] for r in quarantined.collect()}
    assert q == {"u-big": "oversize", "u-null": "empty_payload"}
    assert [r["url"] for r in admitted.collect()] == ["u-ok"]


def test_respect_noindex_gate(spark):
    """Opt-in publisher opt-out: meta-robots noindex pages quarantine
    with their own reason; default behavior unchanged."""
    rows = [
        ("u-ni", None, b'<html><head><meta name="robots" content='
                       b'"noindex"></head><body>x</body></html>', None, "es"),
        ("u-ok", None, b"<html><body><pre>APELLIDOS</pre></body></html>",
         None, "es"),
    ]
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    df = spark.createDataFrame(rows, schema=schema)
    admitted, quarantined = admission_split(df, respect_noindex=True)
    assert {r["url"]: r["reason"] for r in quarantined.collect()} \
        == {"u-ni": "noindex"}
    assert [r["url"] for r in admitted.collect()] == ["u-ok"]
    # off by default: both admitted
    a0, q0 = admission_split(df)
    assert q0.count() == 0 and a0.count() == 2


def test_resume_skips_done(spark, pages_path, tmp_path):
    out = str(tmp_path / "resume")
    run_pipeline(spark, pages_path, out, RUN_DATE, partitions=4)
    # second run with resume: everything already extracted → 0 new rows
    s2 = run_pipeline(spark, pages_path, out, RUN_DATE, partitions=4, resume=True,
                      run_id="resume2")
    assert s2["input_count"] == 0
    # resume appends — the rows committed by run 1 must survive run 2
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N_PAGES
    assert data.select("url").distinct().count() == N_PAGES


def test_resume_completes_partial_run(spark, pages_path, tmp_path):
    """Kill-and-resume: a first run over half the input, then a resumed run
    over the full input, must land every row exactly once."""
    out = str(tmp_path / "partial")
    pages = spark.read.parquet(pages_path)
    half = pages.limit(N_PAGES // 2)
    run_pipeline(spark, pages_path, out, RUN_DATE, partitions=4, input_df=half)
    s2 = run_pipeline(spark, pages_path, out, RUN_DATE, partitions=4,
                      resume=True, run_id="resume-fill")
    assert s2["input_count"] == N_PAGES - N_PAGES // 2
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == N_PAGES
    assert data.select("url").distinct().count() == N_PAGES


def test_doc_router(spark):
    rows = [("PERMISO DE CIRCULACIÓN\nA 1177MTM", "permiso_circulacion"),
            ("TARJETA DE IDENTIFICACIÓN FISCAL\nB76261874", "nif"),
            ("APELLIDOS\nCOLL", "dni"),
            ("IDESPBHV1227380", "dni"),
            ("random prose", "dni"),
            ("B76261874 something", "nif"),
            ("D.1\nTOYOTA", "permiso_circulacion")]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r[0] for r in df.select(doc_type_router(F.col("text"))).collect()]
    assert got == [expected for _, expected in rows]


def test_salt_spreads_duplicate_urls(spark):
    """xxhash64(url) alone lands re-crawls of one hot url in one partition;
    the salt term spreads them (the adversarial-skew guard of §4.2-1)."""
    from ocr_spark.job import spread_partitions
    rows = [(f"https://hot.example/page", None, None, f"crawl {i}", "es")
            for i in range(400)]
    rows += [(f"https://host-{i}.example/x", None, None, "t", "es")
             for i in range(100)]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string")

    def max_partition(df2):
        return (df2.withColumn("p", F.spark_partition_id())
                .groupBy("p").count().agg(F.max("count")).collect()[0][0])

    unsalted = max_partition(spread_partitions(df, 16, salt=0))
    salted = max_partition(spread_partitions(df, 16, salt=8))
    assert unsalted >= 400          # all dups in one partition
    assert salted <= 150            # spread across salt buckets


def test_python_router_matches_native(spark):
    """The fused stage's Python router is a byte-exact twin of the native
    Column form (R4) — checked over every generated page kind."""
    from ocr_spark.functions.udfs import route_doc_type
    texts = [pagegen.page_for(i)["text"] for i in range(200)]
    texts += ["", "PERMIS DE CIRCULACIO", "tarjeta de identificación fiscal",
              "1234BCD", "X1234567L", "B76261874", "D.1", "cognoms"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    native_got = [r[0] for r in df.select(doc_type_router(F.col("text"))).collect()]
    python_got = [route_doc_type(t) for t in texts]
    assert native_got == python_got


def test_fixture_pages_through_pipeline(spark, tmp_path):
    """FIXTURES.md §2 replay: per-url extracted text byte-identical."""
    rows = [(f"fixture://dni/{name}", None,
             f"<html><body><pre>{escape(text)}</pre></body></html>".encode(),
             text, "es")
            for name, text in DNI_TEXTS.items() if text.strip()]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string")
    out = str(tmp_path / "fixtures")
    run_pipeline(spark, None, out, RUN_DATE, partitions=2, input_df=df)
    data = spark.read.parquet(f"{out}/data").select("url", "extracted_text").collect()
    expected = {f"fixture://dni/{n}": t for n, t in DNI_TEXTS.items()}
    assert len(data) == len(rows)
    for row in data:
        assert row["extracted_text"] == expected[row["url"]], row["url"]


def test_incremental_backfill_by_partition(spark, tmp_path):
    """The 10^12-doc operating mode: a date/hour-partitioned source is
    processed slice by slice into ONE output with resume on — each run
    reads only its partition (pruned scan) and the union is exactly-once
    even when slices overlap (re-crawled urls)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    pages = pagegen.generate_df(spark, 180, partitions=4).withColumn(
        "slice", F.date_format("warc_ts", "yyyy-MM-dd-HH-mm"))
    pages.write.partitionBy("slice").parquet(src)
    slices = sorted(r["slice"] for r in
                    spark.read.parquet(src).select("slice").distinct().collect())
    assert len(slices) >= 2
    for i, s in enumerate(slices):
        batch = (spark.read.parquet(src)
                 .filter(F.col("slice") == s)
                 .drop("slice"))
        # overlap: each batch re-includes the previous slice too (re-crawl)
        if i > 0:
            batch = batch.unionByName(
                spark.read.parquet(src)
                .filter(F.col("slice") == slices[i - 1]).drop("slice"))
        run_pipeline(spark, "", out, RUN_DATE, partitions=4,
                     input_df=batch, resume=i > 0, run_id=f"slice-{i}")
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == 180
    assert data.select("url").distinct().count() == 180


def test_canonicalize_urls_unifies_identity(spark, tmp_path):
    """With canonicalize_urls, messy variants of one resource share the
    SAME url key in the output (so resume anti-joins and exact dedup see
    one identity); a resumed re-crawl under a different variant is then
    skipped as already-done."""
    body = b"<html><body><pre>APELLIDOS\nCOLL</pre></body></html>"
    mk = lambda rows: spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    out = str(tmp_path / "canon")
    run_pipeline(spark, "", out, RUN_DATE, partitions=2,
                 input_df=mk([("HTTP://Example.COM:80/a/?b=2&a=1#x",
                               None, body, None, "es"),
                              ("http://example.com/other", None, body,
                               None, "es")]),
                 canonicalize_urls=True)
    data = spark.read.parquet(f"{out}/data")
    assert sorted(r["url"] for r in data.collect()) == [
        "http://example.com/a?a=1&b=2", "http://example.com/other"]
    # resumed run with ANOTHER variant of the same resource: anti-joined out
    s2 = run_pipeline(spark, "", out, RUN_DATE, partitions=2,
                      input_df=mk([("http://Example.com/a?a=1&b=2#frag2",
                                    None, body, None, "es")]),
                      canonicalize_urls=True, resume=True, run_id="r2")
    assert s2["input_count"] == 0
    assert spark.read.parquet(f"{out}/data").count() == 2


def test_pipeline_job_count_budget(spark, pages_path, tmp_path):
    """Fixed-cost regression guard: one pipeline run must stay within its
    Spark job budget (6 actions — tier-1 materialize, 2 sink writes,
    lineage, summary write+collect — plus AQE per-query-stage sub-jobs;
    measures 14 today). A regression (e.g. reintroducing per-type sinks or
    an output read-back) is invisible to value tests but caps small-input
    scaling efficiency."""
    tracker = spark.sparkContext.statusTracker()
    all_before = set(tracker.getJobIdsForGroup(None) or [])
    run_pipeline(spark, pages_path, str(tmp_path / "budget"), RUN_DATE,
                 partitions=4)
    all_after = set(spark.sparkContext.statusTracker()
                    .getJobIdsForGroup(None) or [])
    n_jobs = len(all_after - all_before)
    assert 0 < n_jobs <= 16, f"pipeline ran {n_jobs} Spark jobs"


def test_extract_then_curate_integration(spark, tmp_path):
    """The two halves of the engine compose: extracted tier-1/2 text from
    the HTML pipeline feeds the curation chain directly, and the chain
    produces a non-trivial admission split over it."""
    from datetime import date
    from ocr_spark import curate, job, pagegen
    from pyspark.sql import functions as F

    out = str(tmp_path / "ex")
    pages = pagegen.generate_df(spark, 80, partitions=4)
    job.run_pipeline(spark, "", out, date(2026, 8, 16), partitions=4,
                     input_df=pages)
    docs = (spark.read.parquet(f"{out}/data")
            .select(F.xxhash64("url").alias("doc_id"),
                    F.col("extracted_text").alias("text")))
    n_docs = docs.count()
    assert n_docs > 0
    verdicts = curate.curate(docs, langs=("es", "und"), budget_tokens=500)
    by_reason = {r["drop_reason"]: r["n"] for r in
                 verdicts.groupBy("drop_reason")
                 .agg(F.count("*").alias("n")).collect()}
    assert sum(by_reason.values()) == n_docs
    assert by_reason.get(None, 0) > 0          # something survives
    kept = verdicts.filter("keep")
    assert kept.filter("shard_id is null").count() == 0


def test_resume_anti_join_surfaces_non_path_errors(spark, tmp_path):
    """anti_join_done may swallow ONLY path-not-found: any other read
    failure (here: a mispointed path whose parquet lacks a url column)
    must raise — silently skipping the anti-join would re-extract and
    append rows already committed."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    from ocr_spark import lineage as _lin

    pages = spark.createDataFrame([("http://a", b"<p>x</p>")],
                                  ["url", "html"])
    # missing path: passthrough
    assert _lin.anti_join_done(
        pages, str(tmp_path / "nope")).count() == 1
    # existing parquet WITHOUT a url column: must surface
    bad = str(tmp_path / "bad")
    spark.range(3).write.parquet(bad)
    with _pytest.raises(AnalysisException):
        _lin.anti_join_done(pages, bad).count()


def test_parse_udfs_null_confidence_routes_to_tier2(spark):
    """Arrow delivers NULL doubles to pandas UDFs as NaN, not None: a
    None-only guard let NaN through, and `NaN < 50.0` is False — a
    null-confidence row was reported tier1_acceptat instead of routed.
    All three contract-surface parse UDFs must treat null as 0.0."""
    from ocr_spark.functions import udfs as u

    df = spark.createDataFrame(
        [("APELLIDOS GARCIA", None)],
        "text string, confidence double")
    for factory in (u.dni_parse_udf, u.permis_parse_udf, u.nif_parse_udf):
        fn = factory(RUN_DATE)
        row = df.select(fn("text", "confidence").alias("r")).collect()[0]["r"]
        assert row["needs_tier2"] is True, factory.__name__
