"""Phase-1 extraction + Phase-2 validation, one module per document type.

Each module exposes::

    parse(text, run_date)                       -> datos dict (+ raw_mrz for DNI)
    validate(datos, ..., engine, conf, run_date) -> response envelope dict

All functions are pure and deterministic: the reference's ``date.today()``
calls (SURVEY.md §5.3) become the explicit ``run_date`` parameter, which the
Spark job freezes per run (``--run-date``).
"""

from ocr_spark.parsers import dni, nif, permis  # noqa: F401
