"""Multi-executor correctness (round 2): the flagship pipeline must be
exactly golden-equal when run on Spark's local-cluster mode — REAL
separate executor JVMs with their own Python worker pools, executor-side
shuffle and serialization — not just in-process local[n] threads. This
is the closest a single box gets to the north rule's multi-executor
cluster; the same pair (1 vs 4 executors) provides bench.py's primary
N→4N scaling number.

Runs in a SUBPROCESS: a second SparkSession with a different master
cannot coexist with the session-scoped fixture session.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_cluster_golden_equality(tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lc_out"))
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from text_extraction_spark.conf import get_spark, stop_active
        from text_extraction_spark.pipeline import compare_golden, extract_corpus
        spark = get_spark("local-cluster[2,2,1536]", app_name="lc-test",
                          shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        res = extract_corpus(spark, {tiny_corpus!r}, {out!r}, run_id="lc1")
        assert res["docs"] > 0, res
        e = spark.read.parquet({out!r} + "/extracted")
        g = spark.read.parquet({tiny_corpus!r} + "/golden.parquet")
        mm = compare_golden(e, g).count()
        stop_active()
        assert mm == 0, f"{{mm}} golden mismatches on local-cluster"
        print("LC-GOLDEN-OK")
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "LC-GOLDEN-OK" in proc.stdout


def test_local_cluster_dataops_match_local(tmp_path_factory):
    """Round 3: the dataops plane's hot UDF paths (MinHash sigs, d25
    curation, d19 components) must produce IDENTICAL results on real
    separate executor JVMs as on local threads — catches closure
    shipping, per-executor Python worker determinism, and cross-JVM
    hash stability in one go."""
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from text_extraction_spark.conf import get_spark, stop_active
        from text_extraction_spark import dataops
        SF = "/root/testdata/sf0.001"
        results = {{}}
        for master in ("local[4]", "local-cluster[2,2,1536]"):
            stop_active()
            spark = get_spark(master, app_name="lc-dataops", shuffle_partitions=8)
            spark.sparkContext.setLogLevel("ERROR")
            results[master] = {{
                "d02": sorted(map(tuple, dataops.QUERIES["d02_dedup_minhash_lsh"](spark, SF).collect())),
                "d19": sorted(map(tuple, dataops.QUERIES["d19_dedup_components"](spark, SF).collect())),
                "d25": sorted(map(tuple, dataops.QUERIES["d25_curation_pipeline"](spark, SF).collect())),
            }}
            stop_active()
        a, b = results.values()
        for k in a:
            assert a[k] == b[k], f"{{k}} differs between local and local-cluster"
        print("LC-DATAOPS-OK")
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "LC-DATAOPS-OK" in proc.stdout
