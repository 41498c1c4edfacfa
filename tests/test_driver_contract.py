"""Mimic the grading driver: run every ``queries()`` entry AND its
``oracle_sql()`` on the same parquet tables, compare values.

Comparison = driver semantics: columns sorted by name, rows sorted by all
columns; floats compared to 1e-9 after our own 6-dp rounding (both sides
round in the query/SQL definitions themselves)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)  # 6-dp guard against sub-ULP noise
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


QUERIES = sorted(entry.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entry.queries()[name]
    osql = entry.oracle_sql().get(name)
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if osql is None:
        # rows-only check (driver's weaker gate for non-SQL ops)
        assert srows is not None
        return
    res = ddb.execute(osql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (name, scols, ocols)
    got, exp = _normalize(srows, scols), _normalize(orows, ocols)
    assert len(got) == len(exp), (name, len(got), len(exp))
    for g, e in zip(got, exp):
        for gv, ev in zip(g, e):
            if isinstance(gv, float) and isinstance(ev, float):
                assert math.isclose(gv, ev, rel_tol=0, abs_tol=2e-6), (name, g, e)
            else:
                assert gv == ev, (name, g, e)
