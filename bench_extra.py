#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): targeted per-query noop
timing + plan capture, SEPARATE from the frozen bench.py.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 [--repeats 3]
      [--plans plans/r07 --tag after] [names...]

Times each named queries() entry with the noop sink (warm-up discarded,
median of repeats) on local[$SPARK_GRAFT_CPUS] with the same session
shape as bench.py's query block (shuffle_partitions=64), and optionally
writes each query's explain("formatted") to <plans>/<name>_<tag>.txt.
Prints one JSON line {"sf": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--tag", default="after", help="plan filename suffix")
    ap.add_argument("names", nargs="*")
    ns = ap.parse_args()

    import __spark_entry__ as entry
    from text_extraction_spark.conf import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="bench-extra", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = ns.names or list(qs)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if ns.plans:
            os.makedirs(ns.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, ns.sf).explain("formatted")
            with open(os.path.join(ns.plans, f"{name}_{ns.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        noop(fn(spark, ns.sf))  # warm-up discarded
        runs = []
        for _ in range(max(ns.repeats, 1)):
            t0 = time.monotonic()
            noop(fn(spark, ns.sf))
            runs.append(time.monotonic() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(f"  {name}: {out[name]}s  (runs: {[round(r,3) for r in runs]})",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": ns.sf, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
