"""Session-timezone independence sweep (round-4 verdict ask #1).

Every contract row must produce BIT-IDENTICAL results under a
DST-observing session timezone (``America/New_York``) as under the
UTC zone the repo's own harness pins (`session.py:45`). This is the
bug class that made `recrawl_priorities` the one red row in
CORRECTNESS_r03.json: `cast("timestamp").cast("long")` routes naive
timestamps through the session zone, and a January snapshot vs a July
`now` literal shift by DIFFERENT offsets under DST. Any operator that
reads ambient session state this way also breaks resumability on a
real cluster whose driver TZ differs from the original run's.

The DuckDB oracle is TZ-naive, so comparing the America/New_York
Spark run against the same oracle the UTC run is compared against
(in test_entry_contract) proves full invariance without doubling the
oracle cost.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ORACLE = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def spark_ny(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


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


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match_under_dst_zone(spark_ny, duck, name):
    qdf = QUERIES[name](spark_ny, SF_DIR)
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
    assert got == want, (
        f"{name}: session-TZ-sensitive result (America/New_York != "
        f"oracle); first mismatches {mismatches}"
    )
