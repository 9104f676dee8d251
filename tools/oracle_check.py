#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracleSql
entry in DuckDB over the fixture parquet tables and compare against the
Spark result parquet dumped by graft.Verify.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [qPrefix...]

Comparison mirrors the driver: columns sorted by name, rows sorted by
all columns, values stringified (floats via repr of round-tripped
float) and hashed.
"""
import json, sys, math
import duckdb

from oracle_lint import lint as lint_types

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.6f}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main(sf_dir, out_dir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Output-type lint FIRST: fetchall() below collapses every DuckDB
    # integer type to Python int, so a HUGEINT output column passes the
    # value compare here while failing the driver's canonicalization
    # (the round-6 q1e/q1m/q1n/q8d bug class). A lint hit is a FAIL even
    # when values match.
    type_bad = lint_types(con, {k: v for k, v in oracle.items()
                                if not prefixes
                                or any(k.startswith(p) for p in prefixes)})
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        if name in type_bad:
            cols = ", ".join(f"{c}:{t}" for c, t in type_bad[name])
            print(f"FAIL {name}: banned oracle output type ({cols}) — "
                  f"driver-divergent even if values match below")
            n_fail += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: schema spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = canon([[r[i] for i in sidx] for r in spark_rows])
        d = canon([[r[i] for i in didx] for r in duck_rows])
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
        elif s != d:
            diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_pass + n_fail} oracle-checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
