#!/usr/bin/env python
"""Full driver-contract self-check: run EVERY __spark_entry__.queries()
entry at sf0.01 and compare against its oracle_sql() twin in DuckDB
(row count + schema + order-insensitive value hash), mirroring the
driver's CORRECTNESS_rN harness — including entries past the driver's
50-cap, so nothing goes externally stale without being locally green.

Usage: python tools/check_contract.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # argparse (round-5 ADVICE fix): `--sf` with a missing value now
    # errors loudly, `--sf=/path` parses as the option, and a positional
    # query name can no longer be swallowed by the sf path.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="query names to check (default: all)")
    ns = ap.parse_args()
    sf, args = ns.sf, ns.names
    # Fail fast on a bad --sf (round-6, VERDICT r5 #6): a bare "0.01"
    # otherwise produces 70+ bogus FileNotFound FAILs after a 40 s
    # Spark startup instead of one loud message.
    if not os.path.isdir(sf):
        print(f"error: --sf path is not a directory: {sf!r} "
              f"(expected e.g. /root/testdata/sf0.01)", file=sys.stderr)
        return 2

    import __spark_entry__ as entry
    from text_extraction_spark.conf import get_spark
    from text_extraction_spark.oracle_check import compare, duckdb_con

    spark = get_spark("local[16]", app_name="contract-check", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb_con(sf)
    n_fail = 0
    n_checked = 0
    matched_args: set[str] = set()
    t0 = time.monotonic()
    for name, fn in qs.items():
        if args:
            hits = [a for a in args if name == a or name.startswith(a)]
            if not hits:
                continue
            matched_args.update(hits)
        n_checked += 1
        try:
            if name in oracles:
                r = compare(fn(spark, sf), con, oracles[name])
                ok = r.get("count_match") and r.get("schema_match") and r.get("values_match")
            else:
                r = {"rows_spark": fn(spark, sf).count(), "rows_only": True}
                ok = r["rows_spark"] >= 0
        except Exception as e:  # noqa: BLE001 — report, keep going
            r, ok = {"err": repr(e)[:300]}, False
        if not ok:
            n_fail += 1
            print(f"FAIL {name}: {json.dumps(r, default=str)[:400]}")
        else:
            print(f"ok   {name}" + ("  (rows-only)" if r.get("rows_only") else ""))
    # A name arg that matched NOTHING is an error, not a silent pass —
    # the old exact-match filter printed "N entries, 0 failures" for a
    # typo'd or prefix name while checking zero queries (found round 6
    # session 5: a broken x09 oracle sailed through such a run).
    unmatched = [a for a in args if a not in matched_args]
    if unmatched:
        print(f"error: no query matches name(s) {unmatched}", file=sys.stderr)
        return 2
    print(
        f"done: {n_checked} entries checked, {n_fail} failures, "
        f"{time.monotonic() - t0:.1f}s, oracle-backed={len(oracles)}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
