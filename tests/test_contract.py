"""Contract validation: every queries()/oracle_sql() pair must agree —
row count, column names, and order-insensitive values — exactly what the
driver's DuckDB cross-check does (at sf0.001 here for speed; the driver runs
sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    # driver-style: sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


SQL_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", SQL_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), (name, len(s_rows), len(d_rows))
    ns, nd = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:5]
    assert ns == nd, (name, [(ns[i], nd[i]) for i in mism])


def test_rowsonly_queries_run(spark):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    for name in set(qs) - set(sqls):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
