#!/usr/bin/env python
"""Round-6 session-3 scale evidence (BENCH/BASELINE.md): the
incremental-curation ops (d53 chunking, d54 incremental exact dedup,
d55 frozen-classifier gate, d57 token-budget sample, d58 snapshot diff,
d59 streaming ingest dedup, d60 source-overlap matrix) measured across
two derived decades — sf0.1 → sf1 → sf10 — using the same scaledata
protocol as the earlier round-6 batches. d56 is fixture-based
(scale-invariant planted store) and is excluded.

Usage: python tools/scale_run_r6s3.py
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
    "d53_chunk_sliding",
    "d54_incremental_dedup",
    "d55_quality_classifier_apply",
    "d57_token_budget_sample",
    "d58_snapshot_diff",
    "d59_stream_ingest_dedup",
    "d60_source_overlap",
    # second batch (same session): ordered-selection primitives
    "d61_stratified_split",
    "d62_curriculum_length",
    "d63_mixture_materialize",
    # third batch (same session): audit/pruning/manifest
    "d64_duplication_exposure",
    "d65_source_quality_prune",
    "d66_batch_manifest",
)


def main() -> int:
    from text_extraction_spark import dataops
    from text_extraction_spark.conf import get_spark, stop_active
    from text_extraction_spark.scaledata import sf1_dir

    stop_active()
    spark = get_spark("local[32]", app_name="scale-r6s3", shuffle_partitions=64)
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
            # warm the scan cache once per (op, dir) is NOT done — these
            # are cold single-shot numbers, same protocol as scale_run_r6
            w = run(name, d)
            rec[tag] = round(w, 2)
            if prev is not None:
                rec[f"linearity_{tag}"] = round(w / (10 * prev), 2)
            prev = w
        print(json.dumps(rec), flush=True)
    stop_active()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
