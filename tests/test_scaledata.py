"""sf1 scale-point generator (scaledata.py): the derived decade must be
a set of SELF-CONSISTENT universes — every foreign key resolves inside
its own copy, counts scale exactly linearly, and the text/embedding
perturbations keep cross-copy overlap at zero without touching copy 0.
Built from the sf0.001 base with copies=3 so the test stays fast."""

import os

import duckdb
import pytest

from text_extraction_spark import scaledata

BASE = "/root/testdata/sf0.001"
COPIES = 3


@pytest.fixture(scope="module")
def sf3() -> str:
    return scaledata.sf1_dir(base=BASE, copies=COPIES)


def _q(d: str, sql: str):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "events", "documents", "embeddings", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def test_linear_row_counts(sf3):
    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        (base_n,) = _q(BASE, f"SELECT count(*) FROM {t}")[0]
        (n,) = _q(sf3, f"SELECT count(*) FROM {t}")[0]
        assert n == COPIES * base_n, t
    # dimensions are NOT replicated
    assert _q(sf3, "SELECT count(*) FROM nation")[0][0] == 25
    assert _q(sf3, "SELECT count(*) FROM region")[0][0] == 5


def test_foreign_keys_resolve(sf3):
    # every FK joins to exactly one parent row — no dangling, no fan-out
    for sql in (
        "SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
        "SELECT count(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL",
        "SELECT count(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL",
        "SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
        "SELECT count(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL",
    ):
        assert _q(sf3, sql)[0][0] == 0, sql


def test_keys_unique_and_join_scales_linearly(sf3):
    assert _q(sf3, "SELECT count(*) - count(DISTINCT o_orderkey) FROM orders")[0][0] == 0
    assert _q(sf3, "SELECT count(*) - count(DISTINCT doc_id) FROM documents")[0][0] == 0
    # a representative join+agg returns exactly copies× the base answer
    sql = ("SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
           "WHERE o.o_orderstatus = 'F'")
    assert _q(sf3, sql)[0][0] == COPIES * _q(BASE, sql)[0][0]


def test_copy0_untouched_and_copies_disjoint(sf3):
    # copy 0 text is byte-identical to the base table
    (mismatch,) = _q(
        sf3,
        f"""SELECT count(*) FROM documents d
            JOIN read_parquet('{BASE}/documents.parquet') b USING (doc_id)
            WHERE d.text <> b.text""",
    )[0]
    assert mismatch == 0
    # cross-copy word overlap is ZERO (suffixed vocab) — dedup ops see a
    # genuinely 3× corpus, not 3× duplicate groups
    (max_doc,) = _q(BASE, "SELECT max(doc_id) + 1 FROM documents")[0]
    (overlap,) = _q(
        sf3,
        f"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
            SELECT count(*) FROM
              (SELECT DISTINCT word FROM w WHERE doc_id < {max_doc}) a
              JOIN (SELECT DISTINCT word FROM w WHERE doc_id >= {max_doc}) b USING (word)""",
    )[0]
    assert overlap == 0


def test_embeddings_perturbed_not_duplicated(sf3):
    (n_base,) = _q(BASE, "SELECT max(vec_id) + 1 FROM embeddings")[0]
    rows = _q(
        sf3,
        f"""SELECT a.embedding = b.embedding
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + {n_base}
            WHERE a.vec_id < {n_base}""",
    )
    assert rows and not any(r[0] for r in rows)


def test_deterministic_rebuild(sf3, tmp_path, monkeypatch):
    """Same base + copies → byte-identical parquet content on rebuild
    (fresh cache dir)."""
    import pyarrow.parquet as pq

    monkeypatch.setattr(
        "text_extraction_spark.conf.cache_root", lambda: str(tmp_path)
    )
    d2 = scaledata.sf1_dir(base=BASE, copies=COPIES)
    assert d2 != sf3
    for t in ("documents", "lineitem", "embeddings"):
        a = pq.read_table(os.path.join(sf3, f"{t}.parquet"))
        b = pq.read_table(os.path.join(d2, f"{t}.parquet"))
        assert a.equals(b), t
