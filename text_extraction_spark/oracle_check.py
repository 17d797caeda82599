"""Self-check harness mirroring the driver's DuckDB-oracle compare
(__spark_entry__ docstring: row-count + schema + order-insensitive
value-hash). Used by tests/test_relational_oracle.py so oracle drift is
caught locally before the driver's CORRECTNESS round.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonical fixed-point: engines must agree post-rounding anyway
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    canon_rows = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return names, canon_rows


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    s_names, s_canon = _rowset(s_cols, s_rows)
    d_names, d_canon = _rowset(d_cols, d_rows)
    res = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "schema_match": s_names == d_names,
        "count_match": len(s_rows) == len(d_rows),
        "values_match": s_canon == d_canon,
    }
    if not res["values_match"]:
        s_set, d_set = set(s_canon), set(d_canon)
        res["spark_only"] = sorted(s_set - d_set)[:3]
        res["duckdb_only"] = sorted(d_set - s_set)[:3]
    if not res["schema_match"]:
        res["spark_schema"] = s_names
        res["duckdb_schema"] = d_names
    return res


def check_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from . import relational

    con = duckdb_con(sf_dir)
    out = {}
    for name, fn in relational.QUERIES.items():
        if only and name not in only:
            continue
        sql = relational.ORACLES.get(name)
        if sql is None:
            df = fn(spark, sf_dir)
            out[name] = {"rows_spark": df.count(), "rows_only": True}
        else:
            out[name] = compare(fn(spark, sf_dir), con, sql)
    return out
