"""Corpus curation job: the composed training-data admission pipeline.

Chains the operator suite end-to-end over a documents-shaped table
(``doc_id``, ``text``, ...):

    [optional URL domain blocklist] → quality gate → repetition gate →
    language allowlist → eval-set decontamination → [optional LM
    surprisal gate] → [optional seed-vs-background quality classifier]
    → exact dedup → [optional MinHash near-dedup] →
    [optional per-host cap] → [optional ExactSubstr span removal] →
    PII scrub → token-budget shard assignment

Every document gets a first-failing-gate reason code (precedence:
``url_blocked`` → ``low_quality`` → ``repetitive`` → ``lang_filtered``
→ ``contaminated`` → ``high_surprisal`` → ``classifier_rejected`` →
``exact_duplicate`` → ``near_duplicate`` → ``host_capped``); kept
documents additionally get
scrubbed text, a post-scrub token count, and a training-shard id.
As in :func:`ocr_spark.operators.textstats.corpus_clean`, gate verdicts
are independent per document: a duplicate copy is reported
``exact_duplicate`` even when its group's min-id keeper was itself
dropped by an earlier gate — group membership is a property of the full
input, not of the survivors.  The two set-dependent stages are the
explicit exceptions: near-dedup and the per-host cap rank only the
SURVIVORS of every earlier gate (dropping a host's spam pages must free
its cap slots for clean ones), so their verdicts depend on the admitted
set by design.

Scale notes — gate order is cost order:

* The narrow gates (quality, repetition, lang: pure Column
  expressions) and the broadcast decontamination run first and fuse
  into the scan stage; nothing corpus-sized shuffles for them.
* The exact-dup keeper is the skew-safe min-id-per-fingerprint
  aggregate of ``corpus_clean`` (map-side combinable; never a window
  over a pathologically hot fingerprint).
* MinHash near-dedup — the expensive stage — sees only survivors of
  every cheaper gate (opt-in: its verdict is not SQL-expressible, so
  the oracle-checked driver query runs with it off and the pytest
  exercises it on).
* Shard assignment runs :func:`textstats.token_shards`' two-phase
  prefix scan over a skinny (id, token-count) projection of the
  SCRUBBED text; the one id-keyed join back to the verdict frame is
  the same clustering the shard-ordered write wants anyway.
* The PII scrub expression is evaluated in two narrow consumers
  (token counting and output text/md5) rather than materialized —
  trading a regex re-evaluation for not shuffling scrubbed text.
* The chain is deliberately **scan-heavy, shuffle-light**: evaluating
  the gate chain reads the corpus parquet ~3× (gate expressions,
  dup-keeper aggregate, eval-gram join), each scan column-pruned to
  (id, text) — but the only corpus-sized exchanges are the map-side-
  combined fingerprint aggregate and the skinny (id, token-count)
  range partition.  On columnar storage, repeated pruned scans
  parallelize embarrassingly; shuffles do not.  The verdict frame is
  lazily ``localCheckpoint``-ed (one corpus-sized disk copy) so its
  three consumers — the near-dup survivor set, the shard pass's totals
  action, and the final annotate join — trigger that evaluation ONCE,
  and the near-dup drop list (ids only) is checkpointed so no
  downstream re-evaluation can re-run the MinHash stage.
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators import dedup, textstats, urls

DEFAULT_LANGS = ("en", "es", "de", "fr")

REASONS = ("url_blocked", "low_quality", "repetitive", "lang_filtered",
           "contaminated", "high_surprisal", "classifier_rejected",
           "exact_duplicate", "near_duplicate", "host_capped")


def curate(df: DataFrame, bench: Optional[DataFrame] = None,
           id_col: str = "doc_id", text_col: str = "text",
           langs: tuple[str, ...] = DEFAULT_LANGS,
           budget_tokens: int = 2000, ngram_n: int = 13,
           near_dup: bool = False, with_text: bool = False,
           blocklist: Optional[DataFrame] = None,
           url_col: str = "url",
           max_per_host: Optional[int] = None,
           lm_model: Optional[dict] = None,
           max_surprisal_x1000: Optional[int] = None,
           clf_model: Optional[dict] = None,
           min_logodds_x1000: Optional[int] = None,
           substr_dedup_k: Optional[int] = None) -> DataFrame:
    """Per-document curation verdicts: (id, keep, drop_reason, n_tokens,
    shard_id, scrubbed_md5[, scrubbed_text]).

    ``n_tokens``/``shard_id``/``scrubbed_md5`` are null for dropped
    docs; token counts and shards are computed over the SCRUBBED text
    (what a training run would actually read).  ``bench`` (optional) is
    the eval table for decontamination; ``near_dup`` enables the
    MinHash near-dedup stage over survivors.  ``blocklist`` (optional,
    a ``domain`` DataFrame) turns on the URL domain gate and
    ``max_per_host`` the per-host cap — both require ``url_col`` to
    exist in *df*; the cap ranks survivors by id within
    :func:`ocr_spark.operators.urls.bare_host` of the url.
    ``lm_model`` (a trained :func:`textstats.surprisal_model`) +
    ``max_surprisal_x1000`` turn on the CCNet-style fluency gate:
    docs scoring above the threshold (milli-bits/gram vs the seed)
    drop as ``high_surprisal``.  ``clf_model`` (a trained
    :func:`textstats.quality_classifier_model`) + ``min_logodds_x1000``
    turn on the GPT-3-style classifier gate: docs scoring BELOW the
    threshold (milli-bits/token of seed-vs-background log-odds) drop as
    ``classifier_rejected``.  Score-less documents — too short to
    produce any gram/token under either model — are EXEMPT from both
    score gates by design: their NULL score makes the ``score > lit``
    comparison NULL, so they can never drop as ``high_surprisal`` or
    ``classifier_rejected`` (degenerate shortness is the min-token
    quality gate's job, which runs first).

    ``substr_dedup_k`` turns on the ExactSubstr REWRITE stage
    (RefinedWeb's exact-substring removal after document-level dedup):
    duplicated ``k``-token spans are cut from every admitted copy but
    the corpus-first one (:func:`ocr_spark.operators.dedup.
    dedup_substrings`) before scrubbing/token counting/sharding.  Not a
    gate — no doc drops — but it rewrites kept text to the CANONICAL
    token stream (lowercased, whitespace-collapsed) and, like near-dedup
    and the host cap, it is set-dependent by design (spans are
    deduplicated among survivors only).
    """
    if (lm_model is None) != (max_surprisal_x1000 is None):
        raise ValueError(
            "lm_model and max_surprisal_x1000 must be given together")
    if (clf_model is None) != (min_logodds_x1000 is None):
        raise ValueError(
            "clf_model and min_logodds_x1000 must be given together")
    if blocklist is not None or max_per_host is not None:
        if url_col not in df.columns:
            raise ValueError(
                f"url gates need column {url_col!r}; have {df.columns}")
    if blocklist is not None:
        df = (urls.blocklist_annotate(df, blocklist, url_col=url_col,
                                      id_col=id_col)
              .drop("blocked_domain"))
    else:
        df = df.withColumn("url_blocked", F.lit(False))
    feats = textstats.quality_features(df, text_col)
    feats = textstats.repetition_features(feats, text_col)
    if bench is not None:
        feats = textstats.decontaminate(feats, bench, id_col=id_col,
                                        text_col=text_col, n=ngram_n)
    else:
        feats = feats.withColumn("contaminated", F.lit(False))
    if lm_model is not None:
        feats = textstats.surprisal_score(feats, lm_model,
                                          text_col=text_col)
    else:
        feats = feats.withColumn("surprisal_x1000",
                                 F.lit(None).cast("bigint"))
    if clf_model is not None:
        feats = textstats.quality_classifier_score(feats, clf_model,
                                                   text_col=text_col)
    else:
        feats = feats.withColumn("logodds_x1000",
                                 F.lit(None).cast("bigint"))
    lang = textstats.language_id(F.col(text_col))
    fp = textstats.fingerprint(F.col(text_col))
    keepers = (df.groupBy(fp.alias("_keep_fp"))
               .agg(F.min(F.col(id_col)).alias("_keep_id")))
    joined = (feats.withColumn("_fp", fp)
              .join(keepers,
                    F.col("_fp").eqNullSafe(F.col("_keep_fp")), "inner"))
    reason = (F.when(F.col("url_blocked"), F.lit("url_blocked"))
              .when(~F.col("quality_ok"), F.lit("low_quality"))
              .when(F.col("repetitive"), F.lit("repetitive"))
              .when(~lang.isin(*langs), F.lit("lang_filtered"))
              .when(F.col("contaminated"), F.lit("contaminated"))
              .when(F.col("surprisal_x1000")
                    > F.lit(max_surprisal_x1000 or 0),
                    F.lit("high_surprisal"))
              # null logodds (gate off, or token-less text) never fires
              .when(F.col("logodds_x1000")
                    < F.lit(min_logodds_x1000 or 0),
                    F.lit("classifier_rejected"))
              .when(F.col(id_col) != F.col("_keep_id"),
                    F.lit("exact_duplicate")))
    carry = [id_col, text_col] \
        + ([url_col] if max_per_host is not None else [])
    verdicts = (joined.withColumn("drop_reason", reason)
                .select(*carry, "drop_reason"))
    # three consumers follow (near-dup survivors, the shard pass's totals
    # collect, the final annotate join) — materialize the gate chain ONCE
    # (one corpus-sized disk copy) instead of re-running quality/
    # repetition/decontaminate/dup joins per consumer
    verdicts = verdicts.localCheckpoint(eager=False)

    if near_dup:
        survivors = (verdicts.filter(F.col("drop_reason").isNull())
                     .select(id_col, text_col))
        kept_ids = (dedup.dedup_near_minhash(survivors, id_col=id_col,
                                             text_col=text_col)
                    .select(id_col))
        near_drops = (survivors.select(id_col)
                      .join(kept_ids, id_col, "left_anti")
                      .withColumn("_near_drop", F.lit(True))
                      # skinny id list — checkpoint so downstream
                      # re-evaluation never re-runs the MinHash stage
                      .localCheckpoint(eager=False))
        verdicts = (verdicts.join(near_drops, id_col, "left")
                    .withColumn(
                        "drop_reason",
                        F.coalesce(F.col("drop_reason"),
                                   F.when(F.col("_near_drop"),
                                          F.lit("near_duplicate"))))
                    .drop("_near_drop"))

    if max_per_host is not None:
        survivors = (verdicts.filter(F.col("drop_reason").isNull())
                     .select(id_col, url_col))
        capped = (urls.host_cap(survivors, max_per_host, url_col=url_col,
                                id_col=id_col)
                  .select(id_col))
        cap_drops = (survivors.select(id_col)
                     .join(capped, id_col, "left_anti")
                     .withColumn("_cap_drop", F.lit(True))
                     # skinny id list — keep downstream re-evaluation off
                     # the window stage, as with the near-dup drop list
                     .localCheckpoint(eager=False))
        verdicts = (verdicts.join(cap_drops, id_col, "left")
                    .withColumn(
                        "drop_reason",
                        F.coalesce(F.col("drop_reason"),
                                   F.when(F.col("_cap_drop"),
                                          F.lit("host_capped"))))
                    .drop("_cap_drop", url_col))

    scrubbed = textstats.scrub_pii(F.col(text_col))
    if substr_dedup_k is not None:
        # rewrite path: admitted text goes through ExactSubstr removal,
        # so the final text is join-carried (it no longer equals any
        # expression over the input column)
        survivors = (verdicts.filter(F.col("drop_reason").isNull())
                     .select(id_col, text_col))
        kept = (dedup.dedup_substrings(survivors, k=substr_dedup_k,
                                       id_col=id_col, text_col=text_col)
                .select(F.col(id_col),
                        textstats.scrub_pii(F.col("text_clean"))
                        .alias("text"))
                .localCheckpoint(eager=False))   # shards + annotate join
        shards = textstats.token_shards(kept, budget_tokens,
                                        id_col=id_col, text_col="text")
        out = (verdicts
               .withColumn("keep", F.col("drop_reason").isNull())
               .join(kept.select(F.col(id_col),
                                 F.col("text").alias("_final_text")),
                     id_col, "left")
               .withColumn("scrubbed_md5",
                           F.when(F.col("keep"), F.md5("_final_text")))
               .join(shards.select(id_col, "n_tokens", "shard_id"),
                     id_col, "left"))
        cols = [id_col, "keep", "drop_reason", "n_tokens", "shard_id",
                "scrubbed_md5"]
        if with_text:
            out = out.withColumn("scrubbed_text",
                                 F.when(F.col("keep"),
                                        F.col("_final_text")))
            cols.append("scrubbed_text")
        return out.select(*cols)

    kept = (verdicts.filter(F.col("drop_reason").isNull())
            .select(F.col(id_col), scrubbed.alias("text")))
    shards = textstats.token_shards(kept, budget_tokens, id_col=id_col,
                                    text_col="text")
    out = (verdicts
           .withColumn("keep", F.col("drop_reason").isNull())
           .withColumn("scrubbed_md5",
                       F.when(F.col("keep"), F.md5(scrubbed)))
           .join(shards.select(id_col, "n_tokens", "shard_id"),
                 id_col, "left"))
    cols = [id_col, "keep", "drop_reason", "n_tokens", "shard_id",
            "scrubbed_md5"]
    if with_text:
        out = out.withColumn("scrubbed_text",
                             F.when(F.col("keep"), scrubbed))
        cols.append("scrubbed_text")
    return out.select(*cols)


def run_curation(spark: SparkSession, input_path: str, output_path: str,
                 bench_path: Optional[str] = None,
                 langs: tuple[str, ...] = DEFAULT_LANGS,
                 budget_tokens: int = 2000, near_dup: bool = False,
                 partitions: int = 32,
                 blocklist_path: Optional[str] = None,
                 url_col: str = "url",
                 max_per_host: Optional[int] = None,
                 lm_seed_path: Optional[str] = None,
                 max_surprisal_x1000: Optional[int] = None,
                 clf_seed_path: Optional[str] = None,
                 min_logodds_x1000: Optional[int] = None,
                 clf_bg_fraction: float = 0.1,
                 substr_dedup_k: Optional[int] = None) -> dict:
    """Execute the curation job: parquet in → three sinks out.

    * ``{out}/data``    — kept docs (doc_id, text=scrubbed, n_tokens,
      shard_id), clustered by shard id so a training reader streams
      whole shards sequentially.
    * ``{out}/report``  — per-doc verdict (doc_id, keep, drop_reason).
    * ``{out}/summary`` — one row: counts per reason, kept count, total
      tokens, shard count, XOR-aggregate digest of
      ``xxhash64(doc_id, scrubbed_text)`` (order-free and overflow-free
      → identical at any parallelism), wall ms.

    Returns the summary as a dict.
    """
    t0 = time.monotonic()
    docs = spark.read.parquet(input_path)
    bench = spark.read.parquet(bench_path) if bench_path else None
    blocklist = (spark.read.parquet(blocklist_path)
                 if blocklist_path else None)
    lm_model = (textstats.surprisal_model(spark.read.parquet(lm_seed_path))
                if lm_seed_path else None)
    # GPT-3 recipe: classifier positives = the clean seed corpus,
    # negatives = a reproducible sample of the raw input itself
    clf_model = (textstats.quality_classifier_model(
                     spark.read.parquet(clf_seed_path),
                     textstats.deterministic_sample(
                         docs, clf_bg_fraction, salt="clfbg"))
                 if clf_seed_path else None)
    verdicts = curate(docs, bench=bench, langs=langs,
                      budget_tokens=budget_tokens, near_dup=near_dup,
                      with_text=True, blocklist=blocklist,
                      url_col=url_col, max_per_host=max_per_host,
                      lm_model=lm_model,
                      max_surprisal_x1000=max_surprisal_x1000,
                      clf_model=clf_model,
                      min_logodds_x1000=min_logodds_x1000,
                      substr_dedup_k=substr_dedup_k)
    # the verdict frame feeds three sinks and the summary — materialize
    # once (eagerly: the two sink jobs below run concurrently and must
    # not race to compute an unmaterialized checkpoint) instead of
    # re-running the gates per consumer
    verdicts = verdicts.localCheckpoint(eager=True)

    def _write_data() -> None:
        (verdicts.filter("keep")
         .select("doc_id", F.col("scrubbed_text").alias("text"),
                 "n_tokens", "shard_id")
         .repartition(partitions, "shard_id")
         .sortWithinPartitions("shard_id", "doc_id")
         .write.mode("overwrite").parquet(f"{output_path}/data"))

    def _write_report() -> None:
        (verdicts.select("doc_id", "keep", "drop_reason")
         .write.mode("overwrite").parquet(f"{output_path}/report"))

    # data and report are independent reads of the checkpointed frame —
    # overlap them (the run_pipeline sink idiom); the summary stays
    # strictly last (write-audit-publish order)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        for fut in [pool.submit(_write_data), pool.submit(_write_report)]:
            fut.result()  # surface the first failure

    # every sum is coalesced: over ZERO rows sum() is NULL, the summary
    # dict would carry Nones, and createDataFrame cannot infer types from
    # them — an empty crawl day must publish a zero-count summary, not die
    # at the last step after the data/report sinks were already written
    row = (verdicts.agg(
        F.count("*").alias("input_count"),
        F.coalesce(F.sum(F.col("keep").cast("long")),
                   F.lit(0)).alias("kept_count"),
        *[F.coalesce(F.sum((F.col("drop_reason") == r).cast("long")),
                     F.lit(0)).alias(f"n_{r}")
          for r in REASONS],
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.countDistinct("shard_id").alias("n_shards"),
        F.coalesce(F.bit_xor(F.when(F.col("keep"),
                                    F.xxhash64("doc_id", "scrubbed_text"))),
                   F.lit(0)).alias("digest")).collect()[0])
    summary = row.asDict()
    summary["wall_ms"] = int((time.monotonic() - t0) * 1000)
    (spark.createDataFrame([tuple(summary.values())],
                           list(summary.keys()))
     .write.mode("overwrite").json(f"{output_path}/summary"))
    return summary


def main() -> None:
    from ocr_spark.job import build_session
    ap = argparse.ArgumentParser(
        description="ocr_spark corpus curation pipeline")
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--bench", default=None,
                    help="eval-set parquet for decontamination (optional)")
    ap.add_argument("--langs", default=",".join(DEFAULT_LANGS),
                    help="comma-separated language allowlist")
    ap.add_argument("--budget-tokens", type=int, default=2000)
    ap.add_argument("--near-dup", action="store_true",
                    help="enable the MinHash near-dedup stage")
    ap.add_argument("--blocklist", default=None,
                    help="domain-blocklist parquet (column: domain)")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--max-per-host", type=int, default=None,
                    help="keep at most N surviving docs per url host")
    ap.add_argument("--lm-seed", default=None,
                    help="clean seed parquet to train the surprisal LM on")
    ap.add_argument("--max-surprisal", type=int, default=None,
                    help="drop docs above this milli-bits/gram score")
    ap.add_argument("--clf-seed", default=None,
                    help="clean seed parquet for the quality classifier "
                         "(negatives come from a deterministic sample of "
                         "the input)")
    ap.add_argument("--min-logodds", type=int, default=None,
                    help="drop docs below this milli-bits/token "
                         "seed-vs-background log-odds score")
    ap.add_argument("--clf-bg-fraction", type=float, default=0.1)
    ap.add_argument("--substr-dedup-k", type=int, default=None,
                    help="remove duplicated k-token spans from admitted "
                         "docs (ExactSubstr rewrite; keeps corpus-first)")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app="ocr_spark-curate", master=args.master,
                          shuffle_partitions=args.partitions)
    summary = run_curation(
        spark, args.input, args.output, bench_path=args.bench,
        langs=tuple(l for l in args.langs.split(",") if l),
        budget_tokens=args.budget_tokens, near_dup=args.near_dup,
        partitions=args.partitions, blocklist_path=args.blocklist,
        url_col=args.url_col, max_per_host=args.max_per_host,
        lm_seed_path=args.lm_seed, max_surprisal_x1000=args.max_surprisal,
        clf_seed_path=args.clf_seed, min_logodds_x1000=args.min_logodds,
        clf_bg_fraction=args.clf_bg_fraction,
        substr_dedup_k=args.substr_dedup_k)
    print(summary)


if __name__ == "__main__":
    main()
