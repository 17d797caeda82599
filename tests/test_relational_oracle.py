"""Relational + dataops + extraction-plane oracle checks (SURVEY §5.4):
every `queries()` entry with an `oracle_sql()` twin must match DuckDB on
row-count, schema (sorted column names) and order-insensitive values —
the same compare the driver runs at sf0.01. Runs here at sf0.001 for
speed; mismatches reproduce identically at sf0.01 (both verified
manually during development).
"""

import pytest

import __spark_entry__ as entry_mod
from text_extraction_spark.oracle_check import compare, duckdb_con

SF = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# slow rows-only queries that run the full pipeline are covered by
# test_pipeline.py; skip re-running them here
_SKIP_ROWS_ONLY = {"x03_extract_corpus_pipeline", "x04_golden_equality_mismatches",
                   "x05_extraction_metrics", "q31_watermark_late_data"}


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


def test_every_query_has_callable():
    assert len(_QUERIES) >= 45
    for name, fn in _QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_ORACLES) >= 35  # SQL-expressible coverage floor


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, con, name):
    r = compare(_QUERIES[name](spark, SF), con, _ORACLES[name])
    assert r["schema_match"], r
    assert r["count_match"], r
    assert r["values_match"], r


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES) - _SKIP_ROWS_ONLY)
)
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF)
    assert df.count() >= 0  # materializes without error


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["lang", "n_docs", "n_kept", "avg_kept_chars", "avg_chars"]


def test_register_testdata_views_pure_sql(spark):
    """catalog.register_testdata_views exposes the driver testdata under
    the same names the DuckDB oracle uses — the whole relational plane
    is reachable from pure spark.sql."""
    from text_extraction_spark.catalog import register_testdata_views

    register_testdata_views(spark, SF)
    r = spark.sql(
        "SELECT r_name, count(*) AS n FROM region JOIN nation "
        "ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"
    ).collect()
    assert len(r) == 5 and sum(x.n for x in r) == 25


def test_check_all_helper_matches_driver_gate(spark, con):
    """oracle_check.check_all is the in-repo twin of the driver's
    correctness loop; spot-run it on three queries."""
    from text_extraction_spark.oracle_check import check_all

    out = check_all(spark, SF, only=[
        "q01_scan_projection", "q10_tpch_q1_agg", "q43_salted_skew_join",
    ])
    assert set(out) == {"q01_scan_projection", "q10_tpch_q1_agg", "q43_salted_skew_join"}
    for name, r in out.items():
        assert r["schema_match"] and r["count_match"] and r["values_match"], (name, r)
