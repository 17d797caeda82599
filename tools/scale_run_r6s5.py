#!/usr/bin/env python
"""Round-6 session-5 ANN scale point: two-level IVF (ivf2) on a
1,024k-vector derived store — one further doubling past the 512k run
(tools/scale_run_r6.py), checking the hierarchical coarse quantizer
holds its sublinear shape and recall floor as n keeps growing.

Usage: python tools/scale_run_r6s5.py
Prints one JSON line. Quiet host only — the number goes into the
scale record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_run_r6 import _spark, big_embeddings  # noqa: E402


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from text_extraction_spark import dataops as D

    spark = _spark()
    store = big_embeddings(copies=512)  # 1,024,000 vectors
    e = spark.read.parquet(os.path.join(store, "embeddings.parquet"))
    stats = D.emb_stats(e)
    assert stats[0] > D._IVF2_THRESHOLD, stats
    D.ivf2_topk(e.limit(20000)).write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    D.ivf2_topk(e, stats=stats).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    hits = D.ivf2_topk(e, stats=stats).filter(F.col("q_id") < D._RECALL_QUERIES)
    qv = e.filter(F.col("vec_id") < D._RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    j = e.crossJoin(F.broadcast(qv)).filter(F.col("vec_id") != F.col("q_id"))
    sims = j.select(
        "q_id",
        "vec_id",
        F.round(D._cosine(F.col("embedding"), F.col("qe")), 4).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    truth = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    n_hit = truth.join(hits.select("q_id", "vec_id"), ["q_id", "vec_id"]).count()
    recall = n_hit / (3 * D._RECALL_QUERIES)
    sf1_point = 22.3  # round-5 flat-path measurement at 20k vectors
    lin = wall / (stats[0] / 20_000 * sf1_point)
    print(
        json.dumps(
            {
                "op": "d15/ivf2 two-level @1M",
                "n_vecs": stats[0],
                "wall_s": round(wall, 1),
                "linearity_vs_sf1_flat": round(lin, 2),
                "recall_at_3": round(recall, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
