"""Skew + error-path behavior of the pipeline (SURVEY A3/A4, A17).

A pathologically media-heavy document must not serialize the decode
stage (span-level distribution dissolves doc-level skew), and corrupt
media payloads must be counted as media_err and dropped — identically
by the Spark pipeline and the single-process oracle — without failing
the job.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from text_extraction_spark import corpus, pipeline


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    """40 normal docs + one monster doc holding 60 media spans + a media
    row with corrupt bytes + a span pointing at a missing media_ref."""
    d = str(tmp_path_factory.mktemp("skew"))
    docs, media = corpus.gen_corpus(40)

    monster_spans = []
    monster_media = []
    for j in range(60):
        ref = f"img-monster-{j}"
        monster_media.append(corpus.gen_media(ref))
        monster_spans.append(
            {"kind": "media", "text": None, "media_ref": ref, "offset": j + 1}
        )
    monster_spans.append(
        {"kind": "media", "text": None, "media_ref": "img-missing", "offset": 99}
    )
    docs.append(corpus.Doc(doc_id="doc-monster", spans=monster_spans))
    media.extend(monster_media)

    # corrupt one normal image's payload (truncated garbage)
    media[0] = corpus.Media(
        media_ref=media[0].media_ref,
        width=media[0].width,
        height=media[0].height,
        fmt=media[0].fmt,
        data=b"\x00\x01garbage",
        expected_text="",
    )

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x.doc_id for x in docs]),
                "spans": pa.array([x.spans for x in docs], pa.list_(span_t)),
            }
        ),
        os.path.join(d, "documents.parquet"),
        row_group_size=8,
    )
    pq.write_table(
        pa.table(
            {
                "media_ref": pa.array([m.media_ref for m in media]),
                "width": pa.array([m.width for m in media], pa.int32()),
                "height": pa.array([m.height for m in media], pa.int32()),
                "fmt": pa.array([m.fmt for m in media]),
                "data": pa.array([m.data for m in media], pa.binary()),
            }
        ),
        os.path.join(d, "media.parquet"),
        row_group_size=8,
    )

    # golden via the single-process oracle over the SAME corrupted store
    lookup = {m.media_ref: m for m in media}
    out_span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("order", pa.int32())]
    )
    from text_extraction_spark.reference_impl import extract_doc

    golden_rows = [extract_doc(x.spans, lookup) for x in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x.doc_id for x in docs]),
                "spans": pa.array(golden_rows, pa.list_(out_span_t)),
            }
        ),
        os.path.join(d, "golden.parquet"),
    )
    return d


def test_corrupt_and_missing_media_counted_not_fatal(spark, skew_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewout"))
    res = pipeline.extract_corpus(spark, skew_corpus, out, run_id="skew1")
    assert res["buckets_committed"] > 0
    m = spark.read.parquet(os.path.join(out, "metrics"))
    agg = m.agg(F.sum("media_err").alias("err"), F.sum("media_ok").alias("ok")).first()
    # corrupt payload + missing ref = exactly 2 errors; the rest decode
    assert agg["err"] == 2
    assert agg["ok"] > 0


def test_skewed_doc_matches_golden_exactly(spark, skew_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewout2"))
    pipeline.extract_corpus(spark, skew_corpus, out, run_id="skew2")
    e = spark.read.parquet(os.path.join(out, "extracted"))
    g = spark.read.parquet(os.path.join(skew_corpus, "golden.parquet"))
    assert pipeline.compare_golden(e, g).count() == 0
    monster = e.filter(F.col("doc_id") == "doc-monster").first()
    assert len(monster["spans"]) == 60  # 60 decoded, corrupt/missing dropped


def test_monster_doc_spans_spread_across_partitions(spark, skew_corpus):
    """A4: the 60 media spans of one document must NOT land on one
    decode partition — scan/byte-uniform distribution dissolves doc
    skew."""
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # the whole fixture store is ~1.5 MB — shrink splits so the tiny file
    # exhibits the same multi-split scan a real 100 TB store has (16 KB:
    # small enough that even runs of tiny PDF media rows split apart)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        c = pipeline.load_corpus(spark, skew_corpus)
        m = pipeline.load_media(spark, skew_corpus)
        spans = pipeline.extract_spans(c, m, salt_partitions=16)
        dist = (
            spans.filter(
                (F.col("doc_id") == "doc-monster") & F.col("out_text").isNotNull()
            )
            .groupBy("partition_id")
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert len(dist) >= 4  # spread, not serialized
    assert max(r["count"] for r in dist) < 60
