"""Self-check of the driver contract: every ``queries()`` entry runs, and
every ``oracle_sql()`` entry matches the Spark result exactly under the
driver's comparison (row count + schema column names + order-insensitive
values) at sf0.01."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    """Order-insensitive canonical form: sort columns by name, coerce
    values to plain python, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            if isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


ORACLED = sorted(entrymod.oracle_sql())
ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0  # schema resolves, query executes


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    s_rows = [tuple(r) for r in df.collect()]
    s_cols = list(df.columns)

    res = duck.execute(entrymod.oracle_sql()[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    sc, sv = normalize(s_rows, s_cols)
    dc, dv = normalize(d_rows, d_cols)
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={sv[mism[0]]} oracle={dv[mism[0]]} cols={sc}"
    )


def test_oracle_keys_subset():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "data"]
