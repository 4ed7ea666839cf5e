"""Arrow-vectorized pandas UDF factories (SURVEY.md §4.2-2).

Design: **one fused UDF per stage**, not per field — each document's text is
parsed exactly once per stage, mirroring the reference's single ``parse()``
call per request.  Batches cross the JVM↔Python boundary once per Arrow
batch (cap with ``spark.sql.execution.arrow.maxRecordsPerBatch``; pages can
be ~100 KB of text, so the job sets a conservative batch size).

Everything contract-bearing (Python-regex semantics, banker's rounding,
elif order) runs inside these UDFs; the cheap scalar shapes live in
:mod:`ocr_spark.functions.native` as Catalyst expressions instead.

All factories take ``run_date`` explicitly — no clock access inside
executors, so re-runs and resumes are byte-identical.
"""

from __future__ import annotations

from datetime import date

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ocr_spark import html_extract
from ocr_spark.parsers import dni, nif, permis
from ocr_spark.schema import (DNI_RESPONSE_STRUCT, NIF_RESPONSE_STRUCT,
                              PERMIS_RESPONSE_STRUCT)

# tier-1/2 map onto the reference's engine Literal ("tesseract"|"google_vision")
TIER1_ENGINE = "tesseract"
TIER2_ENGINE = "google_vision"

EXTRACT_STRUCT = T.StructType([
    T.StructField("text", T.StringType(), True),
    T.StructField("confidence", T.DoubleType(), True),
])

SPAN_STRUCT = T.StructType([
    T.StructField("field", T.StringType(), True),
    T.StructField("start", T.IntegerType(), True),
    T.StructField("end", T.IntegerType(), True),
])

EXTRACT2_STRUCT = T.StructType([
    T.StructField("text", T.StringType(), True),
    T.StructField("confidence", T.DoubleType(), True),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
])


def _routed(response_struct: T.StructType) -> T.StructType:
    """Parse-stage output: full response + the tier-2 routing decision."""
    return T.StructType([
        T.StructField("response", response_struct, True),
        T.StructField("needs_tier2", T.BooleanType(), True),
        T.StructField("tier2_reason", T.StringType(), True),
    ])


DNI_ROUTED_STRUCT = _routed(DNI_RESPONSE_STRUCT)
PERMIS_ROUTED_STRUCT = _routed(PERMIS_RESPONSE_STRUCT)
NIF_ROUTED_STRUCT = _routed(NIF_RESPONSE_STRUCT)


def tier1_extract_udf(mode: str = "standard"):
    """html binary → struct(text, confidence) — cheap boilerplate strip (T1)."""

    @pandas_udf(EXTRACT_STRUCT)
    def _extract(html: pd.Series) -> pd.DataFrame:
        out = [html_extract.extract_tier1(h, mode) for h in html]
        return pd.DataFrame(out, columns=["text", "confidence"])

    return _extract


def tier2_extract_udf(mode: str = "standard", with_spans: bool = True):
    """html binary → struct(text, confidence, spans) — permissive walk (T2/T3)."""

    @pandas_udf(EXTRACT2_STRUCT)
    def _extract(html: pd.Series) -> pd.DataFrame:
        out = [html_extract.extract_tier2(h, mode, with_spans) for h in html]
        return pd.DataFrame(out, columns=["text", "confidence", "spans"])

    return _extract


def dni_parse_udf(run_date: date, engine: str = TIER1_ENGINE,
                  route: bool = True):
    """(text, confidence) → struct(response, needs_tier2, tier2_reason).

    One DNI parse+validate per row, vectorized per Arrow batch (D1–D21 +
    Phase 2 + the T5 router in a single text pass).
    """

    @pandas_udf(DNI_ROUTED_STRUCT)
    def _parse(text: pd.Series, confidence: pd.Series) -> pd.DataFrame:
        rows = []
        for t, conf in zip(text, confidence):
            t = t or ""
            conf = float(conf) if conf is not None else 0.0
            datos, raw_mrz = dni.parse(t, run_date)
            if route:
                needs, reason = dni.needs_tier2(datos, conf, t)
            else:
                needs, reason = False, "tier2_final"
            response = dni.validate(datos, raw_mrz, engine, conf, run_date)
            rows.append({"response": response, "needs_tier2": needs,
                         "tier2_reason": reason})
        return pd.DataFrame(rows)

    return _parse


def permis_parse_udf(run_date: date, engine: str = TIER1_ENGINE,
                     route: bool = True):
    """(text, confidence) → struct(response, needs_tier2, tier2_reason)."""

    @pandas_udf(PERMIS_ROUTED_STRUCT)
    def _parse(text: pd.Series, confidence: pd.Series) -> pd.DataFrame:
        rows = []
        for t, conf in zip(text, confidence):
            t = t or ""
            conf = float(conf) if conf is not None else 0.0
            datos = permis.parse(t, run_date)
            if route:
                needs, reason = permis.needs_tier2(datos, conf)
            else:
                needs, reason = False, "tier2_final"
            response = permis.validate(datos, engine, conf, run_date)
            rows.append({"response": response, "needs_tier2": needs,
                         "tier2_reason": reason})
        return pd.DataFrame(rows)

    return _parse


def nif_parse_udf(run_date: date, engine: str = TIER1_ENGINE,
                  route: bool = True):
    """(text, confidence) → struct(response, needs_tier2, tier2_reason).

    The reference has no NIF fallback router; we reuse the generic quality
    signal (low tier-1 confidence) so boilerplate-heavy pages still get the
    permissive tier.
    """

    @pandas_udf(NIF_ROUTED_STRUCT)
    def _parse(text: pd.Series, confidence: pd.Series) -> pd.DataFrame:
        rows = []
        for t, conf in zip(text, confidence):
            t = t or ""
            conf = float(conf) if conf is not None else 0.0
            datos = nif.parse(t, run_date)
            response = nif.validate(datos, engine, conf, run_date)
            needs = route and conf < 50.0
            rows.append({"response": response, "needs_tier2": bool(needs),
                         "tier2_reason": ("confidence_baixa" if needs else "tier1_acceptat")})
        return pd.DataFrame(rows)

    return _parse


PARSE_UDFS = {
    "dni": (dni_parse_udf, DNI_RESPONSE_STRUCT),
    "permiso_circulacion": (permis_parse_udf, PERMIS_RESPONSE_STRUCT),
    "nif": (nif_parse_udf, NIF_RESPONSE_STRUCT),
}
