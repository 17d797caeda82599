"""Pure numpy + stdlib extraction stages (SURVEY.md §2-A).

No Spark, no cv2/PIL/tesseract/scipy (absent in env — SURVEY §0 [ENV]).
Every function here is bit-deterministic: integer arithmetic only, all
thresholds defined with strict/non-strict comparison spelled out, so the
single-process oracle (reference_impl) and the distributed pipeline
(pipeline.py) produce identical bytes.
"""
