"""Solo probe (r11 ask #4 'done' criterion): q288's exact fixture —
16 pinned centroids, GEMM path — WITH the max_cell_rows fence, at 30x
and 100x.  Unfenced r11 numbers: 23.6 s (30x) -> 357 s (100x), the
|cell|^2 blowup from a centroid count that didn't scale.  Fenced, the
pair mass is bounded by n * max_cell_rows, so time should scale ~with
the corpus (linear), not its square.

    python tools/probe_knn_fence.py /root/repo/.scale30x
    python tools/probe_knn_fence.py /root/repo/.scale100x
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100x"
    cell_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.operators.similarity import (
        knn_outlier_scores,
    )
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("probe-knn-fence")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    cent = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    t0 = time.time()
    out = knn_outlier_scores(
        e,
        cent,
        k=5,
        method="blas",
        max_cell_rows=cell_cap,
        report_splits=True,
    )
    row = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.max("cells_split").alias("cells_split"),
        F.max("rows_resharded").alias("rows_resharded"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"{sf_dir}: n={n} cap={cell_cap} rows={row['rows']} "
        f"cells_split={row['cells_split']} "
        f"rows_resharded={row['rows_resharded']} time={dt:.1f}s"
    )


if __name__ == "__main__":
    main()
