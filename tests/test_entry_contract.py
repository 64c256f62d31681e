"""Emulates the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB over the same
parquet tables; compare row multisets exactly (the driver hashes
values order-insensitively — exact equality here is strictly
stronger)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    got = _rows(spark_rows, spark_cols)
    want = _rows(duck_rows, duck_cols)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w][:5]
    assert got == want, f"{name}: first mismatches {mismatches}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0].fetch_ord == 0
    # stable schema
    assert df.columns == [
        "job_id", "url", "fetch_ord", "depth", "success",
        "text_chars", "md_chars", "title",
    ]
