"""IVF recall curve: recall@5 vs brute-force over the sf0.1 embeddings
(VERDICT r4 Next-round #6).

Sweeps n_cells x n_probe over the real test corpus, measuring recall@5 of
``cosine_topk_ivf`` against the exact ``cosine_topk_matmul`` top-5 for a
fixed deterministic query set, plus the fraction of the corpus each
configuration scans (the inverted-list read cost, what partition pruning
turns into I/O savings at scale).  Emits one JSON document (committed as
``BENCH_ivf_recall_r5.json``) and a markdown table for ``docs/SCALE.md``.

The recall-qualified default operating point asserted by
``tests/test_operators.py::test_ivf_default_operating_point_recall`` is
(n_cells=64, n_probe=32) — the cheapest measured config with recall@5
>= 0.9 on this corpus.  The synthetic embeddings are unit-norm ISOTROPIC
(mean pairwise cosine ~ 0, no cluster structure), the worst case for IVF:
recall-per-scanned-byte still improves with cell count (at scan ~ 0.50,
recall is 0.80 with 8 cells vs 0.92 with 64), but hitting 0.9 costs ~half
the corpus here, where clustered real-text embeddings reach it at
nprobe/nlist ratios of a few percent.  The registered driver query keeps
(n_cells=8, n_probe=3) — it witnesses probe-path CORRECTNESS against the
DuckDB twin, not recall.  See docs/SCALE.md for the 100-TB mapping.

Usage: python tools/ivf_recall_curve.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CELLS = (8, 16, 64)
N_PROBE = (1, 2, 3, 4, 5, 6, 7, 8, 16, 32)
K = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_ivf_recall_r5.json"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ocr_spark.operators import similarity

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .appName("ivf-recall-curve").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vectors = emb.count()
    queries = emb.filter(F.col("vec_id") % 40 == 0).cache()
    n_queries = queries.count()

    exact = {(r["query_id"], r["vec_id"]) for r in
             similarity.cosine_topk_matmul(emb, queries, k=K).collect()}

    grid = []
    for n_cells in N_CELLS:
        centroids, assigned = similarity.ivf_build(emb, n_cells=n_cells)
        assigned = assigned.cache()
        cell_sizes = {r["cell"]: r["n"] for r in
                      assigned.groupBy("cell").agg(
                          F.count("*").alias("n")).collect()}
        for n_probe in N_PROBE:
            if n_probe > n_cells:
                continue
            approx = {(r["query_id"], r["vec_id"]) for r in
                      similarity.cosine_topk_ivf(
                          assigned, centroids, queries,
                          k=K, n_probe=n_probe).collect()}
            recall = len(exact & approx) / len(exact)
            # scanned fraction: per-query sum of probed-cell sizes / corpus
            import numpy as np
            qrows = queries.select("vec_id", "embedding").collect()
            scanned = 0
            for row in qrows:
                arr = np.asarray(row["embedding"], dtype="float64")
                order = np.argsort(((centroids - arr) ** 2).sum(axis=1),
                                   kind="stable")
                scanned += sum(cell_sizes.get(int(c), 0)
                               for c in order[:n_probe])
            grid.append({
                "n_cells": n_cells, "n_probe": n_probe,
                "recall_at_5": round(recall, 4),
                "scan_frac": round(scanned / (n_queries * n_vectors), 4),
            })
            print(f"n_cells={n_cells:3d} n_probe={n_probe} "
                  f"recall@5={recall:.3f} scan={grid[-1]['scan_frac']:.3f}",
                  flush=True)
        assigned.unpersist()

    doc = {
        "metric": "IVF recall@5 vs exact cosine top-5",
        "sf_dir": sf_dir, "n_vectors": n_vectors, "n_queries": n_queries,
        "k": K, "grid": grid,
        "default_operating_point": {"n_cells": 64, "n_probe": 32},
    }
    Path(out_path).write_text(json.dumps(doc, indent=1))
    print(f"wrote {out_path}")

    # markdown table for docs/SCALE.md
    print("\n| n_cells | n_probe | recall@5 | scan frac |")
    print("|---|---|---|---|")
    for g in grid:
        print(f"| {g['n_cells']} | {g['n_probe']} | {g['recall_at_5']:.3f} "
              f"| {g['scan_frac']:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
