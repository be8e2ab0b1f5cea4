#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only —
NOT part of the library). Compares graft.Verify parquet output against
the DuckDB oracle SQL, the same way the driver does: sort columns by
name, sort rows, compare values.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(repr(v))
            else:
                canon_row.append(repr(v))
        out.append(tuple(canon_row))
    return out


def types_equiv(got, exp):
    """Spark-parquet type vs DuckDB oracle result type, as DuckDB reports
    them. Exact match required except for representation differences the
    driver's hash is known to tolerate (timestamp precision: parquet
    written by Spark reads back TIMESTAMP_NS, DuckDB computes TIMESTAMP)."""
    if got == exp:
        return True
    ts = {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}
    if got in ts and exp in ts:
        return True
    # The driver's hash canonicalizes machine-int widths (11 queries with
    # INTEGER vs BIGINT drift were all hash-green in CORRECTNESS_r04), but
    # NOT types outside int64 range: HUGEINT — DuckDB's SUM(BIGINT) result
    # — and DECIMAL are hashed differently (q_pagerank was the one red r4
    # row for exactly this). So int widths are equivalent; HUGEINT is not.
    ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
    if got in ints and exp in ints:
        return True
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            if got_cols == ["__verify_error"]:
                # graft.Verify writes this marker when the query threw at
                # plan/build time — surface the original error, don't
                # report a confusing column mismatch
                msg = got_rel.fetchall()[0][0]
                print(f"FAIL {name}: query failed in Verify: {msg}")
                n_fail += 1
                continue
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            if sorted(c.lower() for c in got_cols) != sorted(
                    c.lower() for c in exp_cols):
                print(f"FAIL {name}: columns differ: spark={sorted(got_cols)}"
                      f" oracle={sorted(exp_cols)}")
                n_fail += 1
                continue
            # Type-strict gate: the driver's hash is dtype-sensitive, so
            # an oracle column that widens (DuckDB SUM(BIGINT)->HUGEINT,
            # integer AVG->DECIMAL, ...) fails the driver even when every
            # value matches. Compare DuckDB's view of both sides so that
            # drift fails HERE, not in the driver.
            got_types = {c.lower(): str(t) for c, t in
                         zip(got_cols, got_rel.types)}
            exp_types = {c.lower(): str(t) for c, t in
                         zip(exp_cols, exp_rel.types)}
            bad_types = [(c, got_types[c], exp_types[c])
                         for c in sorted(got_types)
                         if not types_equiv(got_types[c], exp_types[c])]
            if bad_types:
                n_fail += 1
                print(f"FAIL {name}: dtype drift (spark vs oracle):")
                for c, g, e in bad_types:
                    print(f"  {c}: spark={g} oracle={e}")
                continue
            # sorted() on the canonicalized tuples: comparison must not
            # depend on DuckDB preserving scan/subquery row order
            got = sorted(canon(con.sql(
                "SELECT " + ",".join(f'"{c}"' for c in sorted(got_cols, key=str.lower))
                + f" FROM got_rel").fetchall()))
            exp = sorted(canon(con.sql(
                "SELECT " + ",".join(f'"{c}"' for c in sorted(exp_cols, key=str.lower))
                + f" FROM exp_rel").fetchall()))
            if got == exp:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
                # show first few diffs
                shown = 0
                for i, (g, e) in enumerate(zip(got, exp)):
                    if g != e:
                        print(f"  row {i}: spark={g}")
                        print(f"          oracle={e}")
                        shown += 1
                        if shown >= 3:
                            break
                if len(got) != len(exp) and shown == 0:
                    print(f"  spark extra: {got[len(exp):len(exp)+2]}"
                          if len(got) > len(exp) else
                          f"  oracle extra: {exp[len(got):len(got)+2]}")
        except Exception as ex:
            n_fail += 1
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


main()
