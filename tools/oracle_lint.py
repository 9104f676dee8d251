#!/usr/bin/env python3
"""Oracle OUTPUT-TYPE lint — the gate the round-6 red rows proved we need.

The driver canonicalizes DuckDB HUGEINT (and friends) differently from
BIGINT, while this repo's local replica (`oracle_check.py`) reads rows via
`fetchall()`, where Python collapses every integer type to `int` — so a
HUGEINT output column is PROVABLY invisible to the local value compare yet
red under the driver. Round 6 shipped four such rows (q1e/q1m/q1n/q8d:
uncast `sum()` / `sum() OVER ()` / `//` promote BIGINT→HUGEINT in DuckDB)
believing they were green.

This lint closes the class: DESCRIBE every oracle (bind+plan only, no
execution — fast even for heavy queries) and fail on any output column
whose declared type can diverge under the driver's stringification:
HUGEINT, UHUGEINT, and DECIMAL (driver renders scale digits; Python
yields Decimal objects that str() differently than the parquet double).

Usage:
  python3 tools/oracle_lint.py <sfDir> <oracleJsonPath>   # lint all
  python3 tools/oracle_lint.py --self-test <sfDir>        # planted negative

Exit 0 = clean; 1 = violations (or self-test failure).
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Declared output types whose driver stringification provably differs from
# what fetchall()-based local checks can observe.
BANNED = re.compile(r"\b(U?HUGEINT|DECIMAL)\b", re.IGNORECASE)


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def lint(con, oracle):
    """Return {name: [(col, type), ...]} for every oracle whose DESCRIBE
    shows a banned output type. DESCRIBE only binds and plans."""
    bad = {}
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad[name] = [("<describe failed>", str(e))]
            continue
        hits = [(col, typ) for col, typ, *_ in desc if BANNED.search(typ)]
        if hits:
            bad[name] = hits
    return bad


def self_test(sf_dir):
    """Planted-HUGEINT negative: the exact round-6 shape (uncast integer
    sum + windowed sum + // division) must be flagged; the cast fix must
    pass. Proves the lint sees what fetchall() cannot."""
    con = connect(sf_dir)
    planted = {
        "neg_uncast_sum": "SELECT sum(o_orderkey) AS s FROM orders",
        "neg_windowed_sum":
            "SELECT o_orderpriority, sum(count(1)) OVER () AS t "
            "FROM orders GROUP BY 1",
        "neg_intdiv":
            "SELECT (sum(o_orderkey) * 1000000) // count(1) AS ppm FROM orders",
        "neg_decimal": "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d",
    }
    fixed = {
        "pos_cast_sum": "SELECT CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders",
        "pos_plain": "SELECT count(1) AS n FROM orders",
    }
    bad = lint(con, planted)
    missed = sorted(set(planted) - set(bad))
    false_pos = sorted(lint(con, fixed))
    if missed:
        print(f"SELF-TEST FAIL: lint missed planted violations: {missed}")
        return 1
    if false_pos:
        print(f"SELF-TEST FAIL: lint flagged clean queries: {false_pos}")
        return 1
    print(f"SELF-TEST PASS: all {len(planted)} planted violations caught, "
          f"{len(fixed)} clean queries clean")
    return 0


def main(argv):
    if argv[0] == "--self-test":
        return self_test(argv[1])
    sf_dir, oracle_path = argv[0], argv[1]
    con = connect(sf_dir)
    oracle = json.load(open(oracle_path))
    bad = lint(con, oracle)
    for name, hits in sorted(bad.items()):
        cols = ", ".join(f"{c}:{t}" for c, t in hits)
        print(f"LINT FAIL {name}: {cols}")
    print(f"\n{len(oracle) - len(bad)} clean / {len(bad)} flagged "
          f"/ {len(oracle)} oracles linted")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
