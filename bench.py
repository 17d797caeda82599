#!/usr/bin/env python
"""Per-round benchmark (driver contract + BASELINE.md scaling evidence).

Runs headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32), PLUS the extraction pipeline's
N→4N scaling evidence, measured two ways:

* PRIMARY (round 2): Spark local-cluster mode with REAL separate
  executor JVMs — local-cluster[1,2] vs local-cluster[4,2] is literally
  1 executor vs 4 executors (the north rule's "two cluster sizes, N and
  4N executors"), with executor-side shuffle service, serialization and
  per-executor Python worker pools all live. Round 4: the two levels
  are INTERLEAVED A/B/A/B so host-contention windows hit adjacent pair
  members symmetrically. Round 5 (VERDICT r4 #1): headline efficiency
  = MEDIAN over per-pair ratios — max-of-pairs is upward-biased
  (noise that hits only the 1-executor half of a pair INFLATES that
  pair's ratio, and max() selects exactly the most-inflated pair; the
  r4 record's nonphysical 1.05 pair proved it). Max and min of pairs
  ride along as diagnostics, plus the min-of-level ratio.
* secondary: local[n] thread pairs (2→8→32 cores) as in round 1.

Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "extraction": {docs_per_sec@…,
   scaling_efficiency, executor_scaling: {...}}}

Protocol (SURVEY §6): corpus pre-generated (not timed), one warm-up per
session discarded, bench timings are medians of BENCH_REPEATS runs
(min for extraction — host noise only adds time), full materialization
forced via the noop sink.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = int(os.environ.get("SPARK_GRAFT_LOW_CPUS", "2"))
MID_CPUS = int(os.environ.get("SPARK_GRAFT_MID_CPUS", "8"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
BENCH_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

HEADLINE = [
    "q01_scan_projection",
    "q04_shuffle_join_3way",
    "q08_range_join",
    "q10_tpch_q1_agg",
    "q13_rollup",
    "q14_window_rank",
    "q22_json_funcs",
    "q28_tumbling_window",
    "q30_session_window",
    "d01_dedup_exact",
    "d02_dedup_minhash_lsh",
    "d05_ann_cosine_bruteforce",
    "d06_ann_lsh_bucketed",  # round 5: adaptive planes — scaling story
    "d15_ann_ivf",  # round 5: adaptive k + cell co-partitioning
    "d07_token_count",
    "d16_pii_scrub",
    "d17_paragraph_dedup",
    "d31_unigram_lm_score",
    "d32_vocab_coverage",
    "d39_boilerplate_removal",  # round 6: broadcast anti-join + reassembly
    "d40_cluster_assign",  # round 6: map-only k-means E-step
    "d41_dsir_importance",  # round 6: single-scan importance scoring
    "d44_substring_dedup",  # round 6: sliding 8-gram exact dedup
    "d45_decontaminate_bloom",  # round 6: bloom decontamination
    "d46_ann_pq",  # round 6: PQ ADC + exact refine (BLAS-trained books)
    "d53_chunk_sliding",  # round 6: narrow chunk-explode (0 shuffles)
    "d55_quality_classifier_apply",  # round 6: frozen-model gate (0 shuffles)
    "d57_token_budget_sample",  # round 6: two-stage distributed prefix sum
    "d67_url_dedup",  # round 6 s4: canonicalize + one uniform shuffle
    "d69_inverted_index",  # round 6 s4: two partial-agg shuffles
    "d71_vocab_entropy",  # round 6 s4: distribution-level trap flag
    "d72_ann_sq8",  # round 6 s4: untrained int8 ADC + shared refine
    "x01_main_content_extraction",
    "x08_pdf_text_extraction",
    "x09_table_cells_typed",  # round 6 s5: OCR grid typed explode
]


def _bench_corpus(control: bool = False) -> str:
    """Pre-generate (cached, untimed) the interleaved bench corpus under
    the ownership-verified per-user cache dir (conf.cache_root). The
    cache key shares extraction_queries._CORPUS_VERSION so a generator
    change can never serve a stale bench corpus; a cold regeneration is
    ~40 s (gen_corpus parallelizes across processes).

    control=True generates the PINNED round-1-comparable mix (gray
    raw/png images only — corpus.CONTROL_PROFILE) so every BENCH_rN
    carries one throughput number whose cross-round delta is never
    confounded by corpus-mix changes (round-3 addition, VERDICT r2)."""
    from text_extraction_spark.conf import cache_root
    from text_extraction_spark.extraction_queries import _CORPUS_VERSION

    tag = "control_" if control else ""
    d = os.path.join(cache_root(), f"bench_corpus_{tag}{_CORPUS_VERSION}_{BENCH_DOCS}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        from text_extraction_spark.corpus import CONTROL_PROFILE, write_corpus_parquet

        write_corpus_parquet(
            d, BENCH_DOCS, with_golden=False,
            profile=CONTROL_PROFILE if control else None,
        )
        open(marker, "w").write("ok")
    return d


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_extraction(master: str, corpus: str, tag: str, repeats: int | None = None) -> dict:
    """Fresh session at `master`; extraction docs/sec over the bench
    corpus (UDF stage + reassembly, noop sink — storage write excluded
    so the two parallelism levels compare pure compute scaling)."""
    from text_extraction_spark.conf import get_spark, stop_active
    from text_extraction_spark.pipeline import extract_spans, load_corpus, load_media, reassemble

    stop_active()
    inner = master.split("[")[1].rstrip("]")
    if "," in inner:  # local-cluster[execs,cores_per_exec,mem] → total cores
        execs, cpe = (int(x) for x in inner.split(",")[:2])
        cores = execs * cpe
    else:
        cores = int(inner)
    spark = get_spark(
        master,
        app_name=f"bench-{tag}",
        # per-core-proportional knobs, as a real cluster would be tuned
        shuffle_partitions=4 * cores,
        extra={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df = load_corpus(spark, corpus)
    media_df = load_media(spark, corpus)
    n_docs = corpus_df.count()
    # warm-up (JIT, file listing, Python worker pool) — discarded
    _noop_write(extract_spans(corpus_df.limit(512), media_df))
    times = []
    for _ in range(max(repeats or BENCH_REPEATS, 1)):
        t0 = time.monotonic()
        spans = extract_spans(corpus_df, media_df)
        _noop_write(reassemble(spans, corpus_df))
        times.append(time.monotonic() - t0)
    # the host has noisy neighbors (BENCH/BASELINE.md): noise only ever
    # ADDS time, so min-of-repeats is the least-biased estimate of true
    # cost; the median is reported alongside for transparency
    wall = min(times)
    stop_active()
    return {"master": master, "docs": n_docs, "wall_s": round(wall, 3),
            "wall_s_median": round(statistics.median(times), 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def main() -> None:
    corpus = _bench_corpus()

    # ---- PRIMARY north-rule evidence: 1 executor vs 4 executors, real
    # separate JVMs via local-cluster (each 2 cores + 2 GB). Below ~8
    # total cores the box is compute-bound, so the executor pair
    # measures the JOB's scaling, not the host's DRAM ceiling.
    #
    # Round-4 protocol (VERDICT r3 #1): the efficiency is a RATIO of two
    # short runs on a host with ±30% contention windows; the r3 driver
    # record (0.723) lost to a window that hit only the 4-exec block.
    # Fix: INTERLEAVE the levels A/B/A/B — each adjacent (1-exec,
    # 4-exec) pair runs within the same few-minute window, so a
    # contention burst hits both sides of a pair roughly symmetrically.
    # Round-5 estimator fix (VERDICT r4 #1): "noise only adds time"
    # cuts BOTH ways on a ratio — noise on the 1-exec half inflates the
    # pair's ratio, so max-of-pairs is upward-biased (the r4 record's
    # 1.05 pair is nonphysical proof). Headline = MEDIAN of pairs;
    # max/min-of-pairs and min-of-level ride along as diagnostics.
    pair_reps = int(os.environ.get("SPARK_GRAFT_PAIR_REPEATS", "3"))
    runs_1, runs_4, pair_effs = [], [], []
    for i in range(pair_reps):
        a = _run_extraction("local-cluster[1,2,2048]", corpus, f"e1x2-p{i}", repeats=1)
        b = _run_extraction("local-cluster[4,2,2048]", corpus, f"e4x2-p{i}", repeats=1)
        runs_1.append(a)
        runs_4.append(b)
        pair_effs.append((b["docs_per_sec"] / a["docs_per_sec"]) / 4.0)
    exe_1 = min(runs_1, key=lambda r: r["wall_s"])  # best (least-noise) run per level
    exe_4 = min(runs_4, key=lambda r: r["wall_s"])
    eff_min_level = (exe_4["docs_per_sec"] / exe_1["docs_per_sec"]) / 4.0
    eff_exec = statistics.median(pair_effs)

    # ---- secondary: in-process thread scaling at three levels (2/8/32
    # cores). 8→32 is DRAM-bandwidth-bound on this shared box (separate
    # cluster nodes each have their own DRAM — BENCH/BASELINE.md).
    ext_low = _run_extraction(f"local[{LOW_CPUS}]", corpus, f"c{LOW_CPUS}", repeats=2)
    ext_mid = _run_extraction(f"local[{MID_CPUS}]", corpus, f"c{MID_CPUS}")
    ext_high = _run_extraction(f"local[{CPUS}]", corpus, f"c{CPUS}")

    # ---- pinned cross-round CONTROL: round-1-comparable corpus (no
    # pdf/color/embed/skew) at full parallelism — the one number that is
    # comparable across rounds regardless of main-corpus mix changes.
    ctl = _run_extraction(
        f"local[{CPUS}]", _bench_corpus(control=True), f"ctl{CPUS}", repeats=2
    )
    eff_n_4n = (ext_mid["docs_per_sec"] / ext_low["docs_per_sec"]) / (MID_CPUS / LOW_CPUS)
    eff_4n_16n = (ext_high["docs_per_sec"] / ext_mid["docs_per_sec"]) / (CPUS / MID_CPUS)

    # ---- relational/dataops headline queries at SF_DIR
    from text_extraction_spark.conf import get_spark, stop_active
    import __spark_entry__ as entry_mod

    spark = get_spark(f"local[{CPUS}]", app_name="bench-queries", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def _time_queries(sf_dir: str, names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            _noop_write(fn(spark, sf_dir))  # warm-up discarded
            runs = []
            for _ in range(max(BENCH_REPEATS, 1)):
                t0 = time.monotonic()
                _noop_write(fn(spark, sf_dir))
                runs.append(time.monotonic() - t0)
            out[name] = round(statistics.median(runs), 3)
        return out

    timings = _time_queries(SF_DIR, HEADLINE)

    # ---- sf1 scale point (round 5, VERDICT r4 #4): the same headline
    # queries at 10× the data, derived deterministically from sf0.1
    # (scaledata.sf1_dir — cached, ~4 s to build cold). One measured
    # decade of scaling turns every at-100× extrapolation into an
    # interpolation; the linearity ratio per query is t_sf1/(10·t_sf0.1).
    # x08 is excluded (it reads its own fixed PDF fixture, not sf_dir).
    # Round 6 (ADVICE r5): the 10× factor only holds when the base run
    # really was sf0.1 — skip the block under an SF_DIR override rather
    # than emit mislabeled ratios.
    sf1_block = {}
    if (
        os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
        and os.path.realpath(SF_DIR) == os.path.realpath("/root/testdata/sf0.1")
    ):
        from text_extraction_spark.scaledata import sf1_dir

        # x08/x09 excluded: they read their own fixed corpus fixture,
        # not sf_dir, so a linearity ratio would be meaningless
        sf1_names = [
            n
            for n in HEADLINE
            if n not in ("x08_pdf_text_extraction", "x09_table_cells_typed")
        ]
        t_sf1 = _time_queries(sf1_dir(), sf1_names)
        sf1_block = {
            "queries": t_sf1,
            "linearity_vs_sf0.1": {
                n: round(t_sf1[n] / (10 * timings[n]), 2)
                for n in sf1_names
                if timings.get(n)
            },
        }
    stop_active()

    total = round(
        sum(timings.values())
        + sum(r["wall_s"] for r in runs_1 + runs_4)
        + ext_low["wall_s"] + ext_mid["wall_s"] + ext_high["wall_s"]
        + ctl["wall_s"],
        3,
    )
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    full_record = {
        "metric": "headline queries + extraction pipeline wall time",
        "value": total,
        "unit": "sec",
        "queries": {
            **timings,
            "extraction_1exec_2c": exe_1["wall_s"],
            "extraction_4exec_8c": exe_4["wall_s"],
            f"extraction_{LOW_CPUS}c": ext_low["wall_s"],
            f"extraction_{MID_CPUS}c": ext_mid["wall_s"],
            f"extraction_{CPUS}c": ext_high["wall_s"],
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **({"sf1": sf1_block} if sf1_block else {}),
        "control": {
            "corpus": "round-1-comparable (gray images only, no pdf/color/embed/skew)",
            "docs": ctl["docs"],
            f"docs_per_sec_{CPUS}c": ctl["docs_per_sec"],
            "wall_s": ctl["wall_s"],
        },
        "extraction": {
            "bench_docs": ext_high["docs"],
            f"docs_per_sec_{LOW_CPUS}c": ext_low["docs_per_sec"],
            f"docs_per_sec_{MID_CPUS}c": ext_mid["docs_per_sec"],
            f"docs_per_sec_{CPUS}c": ext_high["docs_per_sec"],
            "scaling_efficiency": round(eff_exec, 3),
            "executor_scaling": {
                "mode": "local-cluster (separate executor JVMs)",
                "protocol": "interleaved A/B/A/B pairs; headline = median-of-pairs (see BENCH/BASELINE.md)",
                "docs_per_sec_1_executor": exe_1["docs_per_sec"],
                "docs_per_sec_4_executors": exe_4["docs_per_sec"],
                "executors_pair": [1, 4],
                "cores_per_executor": 2,
                "pair_efficiencies": [round(p, 3) for p in pair_effs],
                "efficiency_min_of_level": round(eff_min_level, 3),
                "efficiency_max_of_pairs": round(max(pair_effs), 3),
                "efficiency_min_of_pairs": round(min(pair_effs), 3),
                "efficiency_n_to_4n_executors": round(eff_exec, 3),
            },
            "thread_scaling": {
                "efficiency_2c_to_8c": round(eff_n_4n, 3),
                "efficiency_8c_to_32c": round(eff_4n_16n, 3),
                "note": "8->32c is DRAM-bandwidth-bound on this shared box; see BENCH/BASELINE.md",
            },
        },
    }

    # Round 6 (VERDICT r5 #1): the r5 driver record came back
    # "parsed": null because this single JSON line outgrew the driver's
    # stdout-tail capture once the sf1 per-query block landed. The FULL
    # record now goes to a file (BENCH/bench_full_latest.json + a
    # history copy), and stdout carries a COMPACT line — headline
    # scalars, per-query sf0.1 timings, efficiency pairs, and the sf1
    # block summarized to {n_queries, worst/median linearity} — that
    # fits the tail budget with a wide margin.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    for path in ("bench_full_latest.json", f"bench_full_{stamp}.json"):
        with open(os.path.join(bench_dir, path), "w") as fh:
            json.dump(full_record, fh, indent=1)
            fh.write("\n")

    compact = {
        "metric": full_record["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": full_record["sf"],
        "control_docs_per_sec": ctl["docs_per_sec"],
        "extraction": {
            "bench_docs": ext_high["docs"],
            "docs_per_sec_1_executor": exe_1["docs_per_sec"],
            "docs_per_sec_4_executors": exe_4["docs_per_sec"],
            "scaling_efficiency": round(eff_exec, 3),
            "pair_efficiencies": [round(p, 3) for p in pair_effs],
            "efficiency_min_of_level": round(eff_min_level, 3),
            f"docs_per_sec_{CPUS}c": ext_high["docs_per_sec"],
        },
        "full_record": "BENCH/bench_full_latest.json",
    }
    if sf1_block:
        lin = sf1_block["linearity_vs_sf0.1"]
        worst = max(lin, key=lambda k: lin[k])
        compact["sf1"] = {
            "n_queries": len(lin),
            "worst_linearity": lin[worst],
            "worst_query": worst,
            "median_linearity": round(statistics.median(lin.values()), 2),
        }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
