#!/usr/bin/env python
"""Round-6 scale evidence (BENCH/BASELINE.md):

1. ivf2 (two-level IVF) on a 512k-vector derived store — past the
   _IVF2_THRESHOLD (~344k) where the flat trainer's k cap would let
   occupancy (and candidate volume) go quadratic again. Reports wall
   time, linearity vs the measured sf1 flat-path point, and recall@3
   of the 50-query evaluation set vs a distributed brute-force truth.
2. d26 (embedding dedup) at sf1 + sf10 with the round-6 verify degree
   cap — the VERDICT r5 #5 target is <= ~1.2x linear at the second
   decade (round 5 measured 1.5x uncapped).
3. d16 (PII scrub) at sf10 with the round-6 candidate prefilter —
   the VERDICT r5 #7 target is meaningfully below the 54.1 s round-5
   record.

Usage: python tools/scale_run_r6.py [ivf2|d26|d16|all]
Prints one JSON line per measurement. Run on a quiet host (no
concurrent Spark jobs) — these numbers go into the scale record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def big_embeddings(copies: int = 256) -> str:
    """512k-vector store derived from sf0.1 embeddings (2k rows): vec_id
    shifted per copy, seeded N(0, 0.02) noise per copy (the scaledata
    rule — cluster structure survives, exact duplication doesn't).
    Embeddings-only: deriving every table at 256x just to scale one
    store would cost ~150M lineitem rows nobody reads."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_extraction_spark.conf import cache_root

    d = os.path.join(cache_root(), f"emb_store_{copies}x_v1")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil
        import tempfile

        src = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
        n0 = len(src)
        stride = int(pa.compute.max(src.column("vec_id")).as_py()) + 1
        base = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
        ids0 = np.array(src.column("vec_id").to_pylist(), dtype=np.int64)
        labels = src.column("label")
        pieces = []
        for k in range(copies):
            emb = base
            if k > 0:
                rng = np.random.Generator(np.random.PCG64(1000 + k))
                emb = base + rng.normal(0.0, 0.02, base.shape).astype(np.float32)
            pieces.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids0 + k * stride, pa.int64()),
                        "label": labels,
                        "embedding": pa.array(
                            [row.tolist() for row in emb], pa.list_(pa.float32())
                        ),
                    }
                )
            )
        tmp = tempfile.mkdtemp(prefix=".emb_store_build_", dir=cache_root())
        pq.write_table(
            pa.concat_tables(pieces),
            os.path.join(tmp, "embeddings.parquet"),
            row_group_size=1 << 18,
        )
        open(os.path.join(tmp, "_COMPLETE"), "w").write("ok")
        try:
            os.rename(tmp, d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"built {copies}x store ({n0 * copies} vecs)", file=sys.stderr)
    return d


def _spark(shuffle: int = 128):
    from text_extraction_spark.conf import get_spark, stop_active

    stop_active()
    s = get_spark("local[32]", app_name="scale-r6", shuffle_partitions=shuffle)
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_ivf2(copies: int = 256, label: str = "d15/ivf2 two-level") -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from text_extraction_spark import dataops as D

    spark = _spark()
    store = big_embeddings(copies=copies)
    e = spark.read.parquet(os.path.join(store, "embeddings.parquet"))
    stats = D.emb_stats(e)
    assert stats[0] > D._IVF2_THRESHOLD, stats
    # warm-up on a slice (JIT + Python worker pool), discarded
    D.ivf2_topk(e.limit(20000)).write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    res = D.ivf2_topk(e, stats=stats)
    res.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    # recall@3 of the 50-query eval set vs distributed brute force
    hits = D.ivf2_topk(e, stats=stats).filter(F.col("q_id") < D._RECALL_QUERIES)
    qv = e.filter(F.col("vec_id") < D._RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    j = e.crossJoin(F.broadcast(qv)).filter(F.col("vec_id") != F.col("q_id"))
    sims = j.select(
        "q_id", "vec_id",
        F.round(D._cosine(F.col("embedding"), F.col("qe")), 4).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    truth = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    n_hit = truth.join(hits.select("q_id", "vec_id"), ["q_id", "vec_id"]).count()
    recall = n_hit / (3 * D._RECALL_QUERIES)
    # linearity vs the round-5 sf1 flat-path measurement (22.3 s @ 20k)
    sf1_point = 22.3
    lin = wall / (stats[0] / 20_000 * sf1_point)
    print(json.dumps({
        "op": label,
        "n_vecs": stats[0],
        "wall_s": round(wall, 1),
        "linearity_vs_sf1_flat": round(lin, 2),
        "recall_at_3": round(recall, 3),
    }))


def run_d26() -> None:
    from text_extraction_spark import dataops as D
    from text_extraction_spark.scaledata import sf1_dir

    spark = _spark()
    out = {}
    for tag, sf_dir in (("sf1", sf1_dir()), ("sf10", sf1_dir(copies=100))):
        fn = D.QUERIES["d26_embedding_dedup_pipeline"]
        fn(spark, sf_dir).limit(1).collect()  # warm-up, discarded
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[tag] = round(time.monotonic() - t0, 1)
    print(json.dumps({
        "op": "d26 embedding dedup (degree-capped verify)",
        "sf1_wall_s": out["sf1"],
        "sf10_wall_s": out["sf10"],
        "decade_linearity": round(out["sf10"] / (10 * out["sf1"]), 2),
    }))


def run_d16() -> None:
    from text_extraction_spark import dataops as D
    from text_extraction_spark.scaledata import sf1_dir

    spark = _spark()
    sf10 = sf1_dir(copies=100)
    fn = D.QUERIES["d16_pii_scrub"]
    fn(spark, SF01).write.format("noop").mode("overwrite").save()  # warm-up
    t0 = time.monotonic()
    fn(spark, sf10).write.format("noop").mode("overwrite").save()
    print(json.dumps({
        "op": "d16 PII scrub (prefiltered)",
        "sf10_wall_s": round(time.monotonic() - t0, 1),
        "round5_record_s": 54.1,
    }))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ivf2", "all"):
        run_ivf2()
    if which in ("d26", "all"):
        run_d26()
    if which in ("d16", "all"):
        run_d16()
