"""Round-6 session-5 ops: d74 exact AllPairs prefix-filter join, x10
media-context pairing. Value equality vs DuckDB is covered by the
auto-parametrized oracle sweep; these pin what the hash can't: the
prefix filter actually PRUNES (efficiency claim), losslessness on a
planted pair, and the nearest-text-span semantics by a driver-side
re-walk of real span sequences."""

from pyspark.sql import functions as F

from text_extraction_spark import dataops

SF = "/root/testdata/sf0.001"


def test_d74_finds_planted_near_dup_pair(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " zz1 zz2"
    far = " ".join(f"v{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    # the op reads only `documents`; patch BOTH reader seams — round 7
    # routed d74's scan through t_spread for row-group parallelism
    orig_t, orig_spread = dataops.t, dataops.t_spread
    dataops.t = dataops.t_spread = lambda s, sf, name: df
    try:
        rows = dataops.QUERIES["d74_allpairs_exact_join"](spark, SF).collect()
    finally:
        dataops.t, dataops.t_spread = orig_t, orig_spread
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    # shingle sets: 38 each, intersection = first 36 trigrams
    assert r["inter"] == 36
    assert abs(r["jac"] - round(36 / (38 + 38 - 36), 4)) < 1e-9


def test_d74_prefix_filter_prunes_candidates(spark):
    """The PRODUCTION prefix index (dataops._d74_index) must drive a
    candidate join that examines far fewer pairs than n^2/2 — otherwise
    the op is a disguised cross join."""
    docs = dataops._d74_shingles(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    )
    n = docs.count()
    _, prefix = dataops._d74_index(docs)
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert cands < 0.10 * n * (n - 1) / 2, (cands, n)


def test_x10_pairs_match_driver_side_rewalk(spark):
    from text_extraction_spark import extraction_queries as xq

    got = {
        (r["doc_id"], r["media_ref"]): (r["before_text"], r["after_text"])
        for r in xq.QUERIES["x10_media_context_pairs"](spark, SF).collect()
    }
    out = xq._run_pipeline(spark)
    import os

    e = spark.read.parquet(os.path.join(out, "extracted")).collect()
    want = {}
    for row in e:
        spans = row["spans"]
        for i, sp in enumerate(spans):
            if sp["kind"] != "media":
                continue
            before = next(
                (s["text"] for s in reversed(spans[:i]) if s["kind"] == "text"), None
            )
            after = next((s["text"] for s in spans[i + 1 :] if s["kind"] == "text"), None)
            want[(row["doc_id"], sp["media_ref"])] = (before, after)
    assert got == want
    assert len(got) > 0
