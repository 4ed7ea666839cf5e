"""Spark-facing function surface.

:mod:`ocr_spark.functions.udfs`   — Arrow-vectorized pandas UDF factories
:mod:`ocr_spark.functions.native` — native Column expressions (Catalyst,
                                    whole-stage codegen) for the operators
                                    that are provably byte-identical in SQL
"""
