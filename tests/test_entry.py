"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    cols = set(df.columns)
    assert {"doc_type", "n_docs", "n_valido", "sum_conf", "n_tier2",
            "digest"} == cols
    assert sum(r["n_docs"] for r in rows) > 0
    # every doc type reached the written output, some rows took tier 2,
    # and the global digest is attached (same value on every row)
    assert {r["doc_type"] for r in rows} == {"dni", "nif",
                                             "permiso_circulacion"}
    assert sum(r["n_tier2"] for r in rows) > 0
    assert len({r["digest"] for r in rows}) == 1


def test_queries_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # the SQL-expressible core is oracle-covered
    for name in ("token_count", "dni_check_letter", "cif_control", "tpch_q1",
                 "embedding_topk", "confidence_score", "fingerprint"):
        assert name in oracles


def test_sample_query_runs(spark):
    qs = entrymod.queries()
    df = qs["token_count"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
