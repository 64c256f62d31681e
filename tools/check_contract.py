"""Driver-mirror correctness check: run every ``queries()`` entry at
sf0.01 side-by-side with its ``oracle_sql()`` DuckDB query and compare
row count, column names, and a value hash (columns sorted by name,
rows sorted, floats rounded) — the same comparison shape the round
driver records in CORRECTNESS_r{N}.json.

Usage: python tools/check_contract.py [--adversarial] [sf_dir] [query_name ...]
(with query names given, only those contract rows are checked)

``--adversarial`` re-runs the whole grid under a matrix of hostile
ambient session configs (DST session zone, LTZ parquet timestamp
inference, LEGACY time parser) and asserts every row still matches
the SAME config-naive DuckDB oracle. This is the pre-round checklist
guard for the bug class that kept ``recrawl_priorities`` red in
rounds 3–4: results must never depend on reader/session knobs the
driver is free to flip. The matrix is documented in ADVERSARIAL.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, int):
        return str(v)
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


# Hostile-but-legal ambient configs a driver session may carry. Each
# entry is (label, {runtime SQL conf: value}); the grid must match the
# config-naive oracle under every one of them. Documented rationale:
# - dst_ltz: DST session zone + naive-parquet-as-LTZ reads — the exact
#   combination that reproduced the r3/r4 recrawl_priorities red hash
#   (epoch math must dispatch on the column's ACTUAL dtype).
# - legacy_parser: SimpleDateFormat-era datetime parsing — any
#   to_timestamp pattern an operator uses must mean the same thing.
# - non_ansi: ANSI mode off — arithmetic/cast edge semantics (the
#   grid must not rely on ANSI-only behavior, e.g. error-on-overflow).
ADVERSARIAL = [
    ("dst_ltz", {
        "spark.sql.session.timeZone": "America/New_York",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }),
    ("legacy_parser", {
        "spark.sql.legacy.timeParserPolicy": "LEGACY",
    }),
    ("non_ansi", {
        "spark.sql.ansi.enabled": "false",
    }),
]


def run_grid(spark, con, sf_dir, queries, oracles, only, oracle_cache,
             label=""):
    tag = f" [{label}]" if label else ""
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}{tag}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}{tag}: {len(srows)} rows (rows-only check)")
            if len(srows) == 0 and name not in ("snapshot_diff",):
                failures.append((name, "0 rows on rows-only query"))
            continue
        if name not in oracle_cache:
            try:
                res = con.execute(oracles[name])
                oracle_cache[name] = (
                    [d[0] for d in res.description], res.fetchall()
                )
            except Exception as e:  # noqa: BLE001
                oracle_cache[name] = None
                failures.append((name, f"ORACLE ERROR: {e}"))
                print(f"FAIL  {name}{tag}: oracle error: {e}")
                continue
        if oracle_cache[name] is None:
            failures.append((name, "ORACLE ERROR (cached)"))
            continue
        ocols, orows = oracle_cache[name]
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            sh, oh = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} vs {oh}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}{tag}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}{tag}: {len(srows)} rows match")
    return failures


def main() -> int:
    argv = sys.argv[1:]
    adversarial = "--adversarial" in argv
    argv = [a for a in argv if a != "--adversarial"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry_mod
    from website_to_agent_spark.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    oracle_cache: dict = {}
    failures = run_grid(spark, con, sf_dir, queries, oracles, only,
                        oracle_cache, label="default" if adversarial else "")
    n_runs = 1
    if adversarial:
        for label, confs in ADVERSARIAL:
            prev = {k: spark.conf.get(k, None) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                failures += run_grid(spark, con, sf_dir, queries, oracles,
                                     only, oracle_cache, label=label)
            finally:
                for k, v in prev.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
            n_runs += 1
    spark.stop()
    n_checked = len([n for n in queries if not only or n in only]) * n_runs
    print(f"\n{n_checked - len(failures)}/{n_checked} pass"
          + (f" across {n_runs} session configs" if adversarial else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
