"""Large-scale training-data operators over document/page tables.

:mod:`ocr_spark.operators.textstats`  — language-ID, quality scoring, token
                                        counting, fingerprinting
:mod:`ocr_spark.operators.dedup`      — exact, MinHash+LSH, SimHash, n-gram
                                        Jaccard, embedding-cosine near-dup
:mod:`ocr_spark.operators.similarity` — brute-force + LSH-bucketed ANN search
:mod:`ocr_spark.operators.multimodal` — binary media columns: schema,
                                        partitioning and UDF plumbing (decode
                                        stubbed — no media libs in-container)
"""
