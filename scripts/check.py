#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: read the Spark result
parquet, run the oracle SQL in DuckDB over the sf tables, sort columns by
name (the driver does), and compare cell-by-cell in row order.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if v is None:
        return None
    return v


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql)
            exp_cols = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c[0] for c in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_bad += 1
            continue
        # dtype audit (warn-only): engines should agree on arrow types too
        try:
            ea = con.execute(sql).arrow().schema
            ga = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").arrow().schema
            for cname in sorted(set(ea.names) & set(ga.names)):
                et, gt = ea.field(cname).type, ga.field(cname).type
                if str(et) != str(gt):
                    print(f"  dtype {name}.{cname}: oracle={et} spark={gt}")
        except Exception:
            pass
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            n_bad += 1
            continue
        # driver sorts columns by name before hashing
        e_ix = [exp_cols.index(c) for c in sorted(exp_cols)]
        g_ix = [got_cols.index(c) for c in sorted(got_cols)]
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: row count: oracle={len(exp_rows)} spark={len(got_rows)}")
            n_bad += 1
            continue
        bad = None
        for i, (er, gr) in enumerate(zip(exp_rows, got_rows)):
            for j, c in enumerate(sorted(exp_cols)):
                a, b = norm(er[e_ix[j]]), norm(gr[g_ix[j]])
                if not cells_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp_rows)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
