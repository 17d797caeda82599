#!/usr/bin/env python
"""Round-6 session-4 scale evidence (BENCH/BASELINE.md): the corpus-
index / statistics / SQ8 ops (d67 URL dedup, d68 cluster
representative, d69 inverted index, d70 bigram PMI, d71 vocabulary
entropy, d72 SQ8 ANN) measured across two derived decades —
sf0.1 → sf1 → sf10 — same scaledata protocol as the earlier round-6
batches. d73 is fixture-based (scale-invariant planted store) and is
excluded.

Usage: python tools/scale_run_r6s4.py [op-prefix ...]
Prints one JSON line per op. Run on a quiet host (no concurrent Spark
jobs) — these numbers go into the scale record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
OPS = (
    "d67_url_dedup",
    "d68_cluster_representative",
    "d69_inverted_index",
    "d70_bigram_pmi",
    "d71_vocab_entropy",
    "d72_ann_sq8",
)


def main() -> int:
    from text_extraction_spark import dataops
    from text_extraction_spark.conf import get_spark, stop_active
    from text_extraction_spark.scaledata import sf1_dir

    stop_active()
    spark = get_spark("local[32]", app_name="scale-r6s4", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    dirs = [("sf0.1", SF01), ("sf1", sf1_dir()), ("sf10", sf1_dir(copies=100))]

    def run(name: str, sf: str) -> float:
        t0 = time.monotonic()
        df = dataops.QUERIES[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    only = set(sys.argv[1:])
    for name in OPS:
        if only and not any(name.startswith(p) for p in only):
            continue
        rec: dict = {"op": name}
        prev = None
        for tag, d in dirs:
            w = run(name, d)  # cold single-shot, same protocol as scale_run_r6
            rec[tag] = round(w, 2)
            if prev is not None:
                rec[f"linearity_{tag}"] = round(w / (10 * prev), 2)
            prev = w
        print(json.dumps(rec), flush=True)
    stop_active()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
