"""Extraction-plane queries for the driver contract (SURVEY §2-A).

Two groups:

1. Oracle-checked (DuckDB twin): the real extraction UDFs run over the
   driver's flat `documents` testdata. Flat word-salad text tokenizes to
   a single block with zero link density, so the Kohlschütter tree
   reduces to `keep iff words > 16` — exactly expressible in SQL. The
   driver therefore value-checks the REAL UDF chain, not a stand-in.

2. Rows-only (⊘): the full interleaved pipeline (A1–A19) over this
   repo's own corpus (generated deterministically into a /tmp cache on
   first use — testdata has no media/spans table). The golden-equality
   query returns MISMATCH rows, so its correct row-count is 0.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import t, t_spread

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_CORPUS_VERSION = "v6"  # v6: 5-angle skew refinement changed skewed-media
# golden text (v5: + media_golden.parquet for the x03/x06 value oracles)
_CORPUS_DOCS = 250


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ------------------------------------------------ oracle-checked (testdata)


@q(
    "x01_main_content_extraction",
    """SELECT doc_id, text AS main_text FROM documents
       WHERE len(string_split(text, ' ')) > 16""",
)
def x01(spark, sf):
    """A5+A6+A14 fused UDF over flat documents: single zero-link block →
    Kohlschütter keeps iff words > 16; dropped docs are filtered."""
    from .pipeline import extract_text_udf

    return (
        t_spread(spark, sf, "documents")
        .select("doc_id", extract_text_udf("text").alias("main_text"))
        .filter(F.col("main_text").isNotNull())
    )


@q(
    "x02_tokenize_features",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INT) AS words,
              CAST(0 AS INT) AS link_words,
              CAST(length(text) AS INT) AS chars
       FROM documents""",
)
def x02(spark, sf):
    """A5 tokenizer features via a struct-returning pandas UDF."""
    from .engine.textproc import tokenize

    @F.pandas_udf("words int, link_words int, chars int")
    def feats(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for s in texts:
            blocks = tokenize(s or "")
            rows.append(
                {
                    "words": sum(b.words for b in blocks),
                    "link_words": sum(b.link_words for b in blocks),
                    "chars": sum(b.chars for b in blocks) + max(len(blocks) - 1, 0),
                }
            )
        return pd.DataFrame(rows)

    d = t_spread(spark, sf, "documents").select("doc_id", feats("text").alias("f"))
    return d.select(
        "doc_id",
        F.col("f.words").alias("words"),
        F.col("f.link_words").alias("link_words"),
        F.col("f.chars").alias("chars"),
    )


# --------------------------------------------------- rows-only (own corpus)


def corpus_dir() -> str:
    """Deterministic fixture corpus, generated once per content version
    (under the ownership-verified per-user cache dir — conf.cache_root)."""
    from .conf import cache_root

    d = os.path.join(cache_root(), f"corpus_{_CORPUS_VERSION}_{_CORPUS_DOCS}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        from .corpus import write_corpus_parquet

        write_corpus_parquet(d, _CORPUS_DOCS)
        open(marker, "w").write("ok")
    return d


def _run_pipeline(spark: SparkSession) -> str:
    from .conf import cache_root

    out = os.path.join(cache_root(), f"out_{_CORPUS_VERSION}_{_CORPUS_DOCS}")
    if not os.path.exists(os.path.join(out, "extracted")):
        from .pipeline import extract_corpus

        extract_corpus(spark, corpus_dir(), out, run_id="entryq")
    return out


@q("x03_extract_corpus_pipeline")  # oracle registered lazily (golden parquet)
def x03(spark, sf):
    """Full A1–A20 pipeline over the interleaved corpus; returns the
    extracted doc-level table (doc_id, n_spans, n_media, n_text).
    VALUE-oracled (round 2): DuckDB computes the same shape counts from
    golden.parquet — the single-process oracle's own output — so a hash
    match proves the distributed pipeline reproduced the golden table."""
    out = _run_pipeline(spark)
    e = spark.read.parquet(os.path.join(out, "extracted"))
    return e.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "media")).alias("n_media"),
        F.size(F.filter("spans", lambda s: s["kind"] == "text")).alias("n_text"),
    )


def x03_oracle_sql() -> str:
    """Lazy (embeds the generated corpus path)."""
    return f"""
SELECT doc_id, CAST(len(spans) AS INT) AS n_spans,
       CAST(len(list_filter(spans, s -> s.kind = 'media')) AS INT) AS n_media,
       CAST(len(list_filter(spans, s -> s.kind = 'text')) AS INT) AS n_text
FROM read_parquet('{corpus_dir()}/golden.parquet')"""


@q("x04_golden_equality_mismatches")  # ⊘ rows-only; correct row-count is 0
def x04(spark, sf):
    """A16: span-sequence equality vs the single-process golden oracle.
    Every row is a mismatching document — 0 rows = exact parity."""
    from .pipeline import compare_golden

    out = _run_pipeline(spark)
    e = spark.read.parquet(os.path.join(out, "extracted"))
    g = spark.read.parquet(os.path.join(corpus_dir(), "golden.parquet"))
    return compare_golden(e, g)


@q("x05_extraction_metrics")  # ⊘ rows-only
def x05(spark, sf):
    """A17 per-partition lineage + metrics table of the pipeline run."""
    out = _run_pipeline(spark)
    return spark.read.parquet(os.path.join(out, "metrics"))


@q("x06_media_table_ocr")  # oracle registered lazily (media_golden parquet)
def x06(spark, sf):
    """A7–A13 (+A20 pdf, +skew/region fallbacks) media path standalone:
    the fused media UDF over the WHOLE media store → (media_ref,
    table_text), NULL = dropped. VALUE-oracled (round 2): DuckDB reads
    media_golden.parquet — the single-process oracle's per-media outputs
    — so a hash match proves the distributed extraction is bit-equal for
    every media kind (raw/png/color/pdf/embedded/skewed)."""
    from .pipeline import extract_media_udf

    m = spark.read.parquet(os.path.join(corpus_dir(), "media.parquet"))
    return m.select(
        "media_ref",
        extract_media_udf("width", "height", "fmt", "data").alias("table_text"),
    )


def x06_oracle_sql() -> str:
    """Lazy (embeds the generated corpus path)."""
    return (
        "SELECT media_ref, table_text "
        f"FROM read_parquet('{corpus_dir()}/media_golden.parquet')"
    )


@q("x08_pdf_text_extraction")  # oracle registered lazily — see pdf_oracle_sql
def x08(spark, sf):
    """A20 PDF/layout parse standalone: the SAME fused media UDF over the
    corpus's PDF media spans → (media_ref, pdf_text). PDF parsing is
    lossless, so the DuckDB twin reads the generation-time expected text
    (pdf_expected.parquet) — a full value-hash oracle, not rows-only:
    a match proves the distributed byte-stream parse equals truth."""
    from .pipeline import extract_media_udf

    m = spark.read.parquet(os.path.join(corpus_dir(), "media.parquet")).filter(
        F.col("fmt") == "pdf"
    )
    return m.select(
        "media_ref",
        extract_media_udf("width", "height", "fmt", "data").alias("pdf_text"),
    )


def pdf_oracle_sql() -> str:
    """DuckDB twin for x08. Built lazily (not at import) because the SQL
    embeds the generated corpus path and generation must have happened."""
    return (
        "SELECT media_ref, expected_text AS pdf_text "
        f"FROM read_parquet('{corpus_dir()}/pdf_expected.parquet')"
    )


@q("x09_table_cells_typed")  # oracle registered lazily (media_golden parquet)
def x09(spark, sf):
    """A12–A13 typed table materialization: the real fused media UDF
    (OCR path) over the WHOLE media store, then a JVM-side double
    posexplode of the row-major table text into a typed cell grid
    (media_ref, row_idx, col_idx, cell, cell_int). The int cast is
    regex-gated (`^-?[0-9]+$`) so both engines type exactly the same
    cells. VALUE-oracled: DuckDB performs the identical explode over
    media_golden.parquet — the single-process oracle's per-media
    outputs — so a hash match proves OCR + grid assembly + cell typing
    are bit-equal end-to-end. Scale shape: the explode is pure
    whole-stage-codegen string work after the one Arrow UDF pass; no
    extra shuffle is introduced (narrow explode), so the op inherits
    the media path's scan partitioning at any corpus size."""
    from .pipeline import extract_media_udf

    m = spark.read.parquet(os.path.join(corpus_dir(), "media.parquet"))
    tt = m.select(
        "media_ref",
        extract_media_udf("width", "height", "fmt", "data").alias("tt"),
    ).filter(F.col("tt").isNotNull())
    rows = tt.select(
        "media_ref",
        F.posexplode(F.split("tt", "\n")).alias("row_idx", "row_text"),
    )
    cells = rows.select(
        "media_ref",
        "row_idx",
        F.posexplode(F.split("row_text", "\\|")).alias("col_idx", "cell"),
    )
    return cells.select(
        "media_ref",
        "row_idx",
        "col_idx",
        "cell",
        # bounded regex + BIGINT keep both engines divergence-free for
        # any digit run the fixture could ever emit (Spark cast would
        # silently null on overflow where DuckDB hard-errors)
        F.when(
            F.col("cell").rlike("^-?[0-9]{1,18}$"), F.col("cell").cast("long")
        ).alias("cell_int"),
    )


def x09_oracle_sql() -> str:
    """Lazy DuckDB twin for x09 (embeds the generated corpus path):
    the same two-level explode + regex-gated int typing over the
    single-process oracle's media_golden.parquet."""
    d = corpus_dir()
    return f"""
WITH g AS (
  SELECT media_ref, string_split(table_text, chr(10)) AS rws
  FROM read_parquet('{d}/media_golden.parquet')
  WHERE table_text IS NOT NULL
),
r AS (
  SELECT media_ref, CAST(u.i AS INT) AS row_idx,
         string_split(rws[u.i + 1], '|') AS cls
  FROM g, UNNEST(range(0, len(rws))) AS u(i)
)
SELECT media_ref, row_idx, CAST(v.j AS INT) AS col_idx,
       cls[v.j + 1] AS cell,
       CASE WHEN regexp_full_match(cls[v.j + 1], '-?[0-9]{{1,18}}')
            THEN CAST(cls[v.j + 1] AS BIGINT) END AS cell_int
FROM r, UNNEST(range(0, len(cls))) AS v(j)"""


@q("x10_media_context_pairs")  # oracle registered lazily (golden parquet)
def x10(spark, sf):
    """Interleaved caption mining (the image-text-pair step of a
    multimodal training-data pipeline): for every media span in the
    DISTRIBUTED pipeline's extracted output, attach the nearest
    preceding and following text spans via two ignore-null window
    frames over the span order. The oracle runs the identical window
    over golden.parquet, so a hash match proves both the extraction
    parity AND the pairing logic. Scale shape: one posexplode + one
    window partitioned by doc_id (spans arrays are small, docs are
    many — the window key is the uniform doc hash; no global sort)."""
    from pyspark.sql import Window

    out = _run_pipeline(spark)
    e = spark.read.parquet(os.path.join(out, "extracted"))
    s = e.select("doc_id", F.posexplode("spans").alias("i", "sp")).select(
        "doc_id",
        "i",
        F.col("sp.kind").alias("kind"),
        F.col("sp.text").alias("text"),
        F.col("sp.media_ref").alias("media_ref"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    txt = F.when(F.col("kind") == "text", F.col("text"))
    return (
        s.withColumn(
            "before_text",
            F.last(txt, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "after_text",
            F.first(txt, ignorenulls=True).over(
                w.rowsBetween(1, Window.unboundedFollowing)
            ),
        )
        .filter(F.col("kind") == "media")
        .select("doc_id", "media_ref", "before_text", "after_text")
    )


def x10_oracle_sql() -> str:
    """Lazy DuckDB twin for x10 (embeds the generated corpus path):
    the same ignore-null context windows over the single-process
    oracle's golden.parquet span sequences."""
    d = corpus_dir()
    return f"""
WITH g AS (SELECT doc_id, spans FROM read_parquet('{d}/golden.parquet')),
s AS (SELECT doc_id, CAST(u.i AS INT) AS i,
             spans[u.i+1].kind AS kind, spans[u.i+1].text AS text,
             spans[u.i+1].media_ref AS media_ref
      FROM g, UNNEST(range(0, len(spans))) AS u(i)),
w AS (SELECT *,
        last_value(CASE WHEN kind='text' THEN text END IGNORE NULLS)
          OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS before_text,
        first_value(CASE WHEN kind='text' THEN text END IGNORE NULLS)
          OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS after_text
      FROM s)
SELECT doc_id, media_ref, before_text, after_text FROM w
WHERE kind = 'media'"""


@q("x07_streaming_extraction")  # ⊘ rows-only; golden equality in tests
def x07(spark, sf):
    """Incremental extraction: corpus documents replayed as a file
    stream, extracted per micro-batch via foreachBatch with idempotent
    per-batch output dirs (streaming edition of the A18 protocol).
    Golden equality asserted in tests/test_streaming.py."""
    import tempfile

    import pyarrow.parquet as pq

    from .streaming import extract_corpus_streaming

    cdir = corpus_dir()
    stream_dir = tempfile.mkdtemp(prefix="tes_docstream_")
    t_ = pq.read_table(os.path.join(cdir, "documents.parquet"))
    step = max(1, t_.num_rows // 4)
    for i in range(4):
        chunk = t_.slice(i * step, step if i < 3 else t_.num_rows - 3 * step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(stream_dir, f"chunk-{i:02d}.parquet"))
    out = tempfile.mkdtemp(prefix="tes_streamout_")
    res = extract_corpus_streaming(spark, stream_dir, cdir, out)
    e = spark.read.option("basePath", res["out_table"]).parquet(res["out_table"])
    from pyspark.sql import functions as F

    return e.select("doc_id", F.size("spans").alias("n_spans"))
