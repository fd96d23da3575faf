"""Measure the settled-index read pruning of the streaming near-dup
sink (r12 judge ask #2): build a 30x-scale settled index, then ingest
a DRIP micro-batch (a handful of docs — the steady-state streaming
regime) and report how many settled-index bytes its partition filter
actually admits, against the unpartitioned control.

    python tools/probe_neardup_prune.py [corpus_dir] [out_json]

Prints one JSON line per configuration:
  {"index_buckets": B, "drip_docs": D, "kb_touched": m,
   "index_bytes_total": T, "index_bytes_scanned": S,
   "prune_ratio": S/T, "drip_upsert_sec": t}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale30x"
OUT = sys.argv[2] if len(sys.argv) > 2 else ".probe_prune.json"
BUCKETS = [
    None if b.lower() == "none" else int(b)
    for b in (sys.argv[3] if len(sys.argv) > 3 else "64,256,None").split(",")
]
DRIP = 5  # docs in the drip batch


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from btc_usdt_etl_pipeline_spark.session import build_session
    from btc_usdt_etl_pipeline_spark.streaming.neardup import (
        incremental_minhash_upsert,
    )

    spark = build_session(
        "probe-prune",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{CORPUS}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    settled = docs.filter(F.col("doc_id") < n - DRIP)
    drip = docs.filter(F.col("doc_id") >= n - DRIP)
    results = []
    for buckets in BUCKETS:
        tmp = tempfile.mkdtemp(prefix="prune_probe_")
        try:
            state = os.path.join(tmp, "state")
            up = incremental_minhash_upsert(
                spark,
                state,
                text_col="text",
                id_col="doc_id",
                shingle_n=3,
                num_hashes=128,
                bands=32,
                jaccard_threshold=0.8,
                index_buckets=buckets,
            )
            up(settled.filter(F.col("doc_id") % 2 == 0), 0)
            up(settled.filter(F.col("doc_id") % 2 == 1), 1)
            t0 = time.time()
            up(drip, 2)
            took = time.time() - t0
            idx_root = f"{state}/index"
            total = sum(
                _du(f"{idx_root}/{d}")
                for d in os.listdir(idx_root)
                if d in ("b0", "b1")
            )
            if buckets is None:
                scanned = total
                m = None
            else:
                # the drip batch's bucket set — what the partition
                # filter admits (recompute exactly as the sink does)
                from btc_usdt_etl_pipeline_spark.operators.dedup import (
                    minhash_band_keys,
                    minhash_shingle_rows,
                )

                kb = (
                    minhash_band_keys(
                        minhash_shingle_rows(
                            drip.select(
                                F.col("doc_id").alias("_id"),
                                F.col("text").alias("_text"),
                            ),
                            "_text",
                            "_id",
                            3,
                        ),
                        ["_id"],
                        128,
                        32,
                    )
                    .select(
                        F.pmod(F.xxhash64("_key"), F.lit(buckets))
                        .cast("int")
                        .alias("_kb")
                    )
                    .distinct()
                    .collect()
                )
                kbs = {r[0] for r in kb}
                m = len(kbs)
                scanned = 0
                for d in os.listdir(idx_root):
                    if d not in ("b0", "b1"):
                        continue
                    for sub in os.listdir(f"{idx_root}/{d}"):
                        if sub.startswith("_kb=") and int(
                            sub.split("=")[1]
                        ) in kbs:
                            scanned += _du(f"{idx_root}/{d}/{sub}")
            row = {
                "index_buckets": buckets,
                "drip_docs": DRIP,
                "kb_touched": m,
                "index_bytes_total": total,
                "index_bytes_scanned": scanned,
                "prune_ratio": round(scanned / total, 4),
                "drip_upsert_sec": round(took, 2),
            }
            results.append(row)
            print(json.dumps(row))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
