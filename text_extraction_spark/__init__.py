"""text_extraction_spark — a from-scratch, PySpark-native main-content +
table extraction engine over interleaved text+media document tables.

Blueprint: /root/repo/SURVEY.md (see §0 for the provenance/citation
policy — /root/reference is empty in this sandbox, so the per-document
golden oracle is this package's own ``reference_impl``).

Layout:
  engine/          pure numpy + stdlib extraction stages (no Spark)
  reference_impl   single-process per-document oracle (SURVEY §0, §5)
  corpus           deterministic fixture-corpus generator (FIXTURES.md §2)
  pipeline         the distributed Spark job (SURVEY §2-A A1–A19)
  relational       relational/dataflow operator plane (SURVEY §2-B Q1–Q32)
  dataops          training-data ops: dedup / similarity / text analysis
  streaming        Structured Streaming windows / watermark / dedup
  conf             SparkSession builder with scale-tuned defaults
"""

__version__ = "0.1.0"
