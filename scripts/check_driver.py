#!/usr/bin/env python3
"""Driver-faithful compare: pandas-based, like CORRECTNESS_r01.json shows.

The driver appears to: read Spark parquet + DuckDB oracle result into
pandas, sort columns by name, sort_values over all columns, then hash
values. We emulate that (pd.util.hash_pandas_object) to catch dtype-level
mismatches (Decimal vs float64, int32 vs int64) that value-equality
checks miss, and sort crashes on ndarray cells.

Usage: python3 scripts/check_driver.py <sfDir> <verifyOutDir> [query...]
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def hash_df(df):
    return pd.util.hash_pandas_object(df, index=False).sum()


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    names = [n for n in sorted(oracle) if not only or n in only]
    for name in names:
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols oracle={sorted(exp.columns)} spark={sorted(got.columns)}")
            n_bad += 1
            continue
        # Driver-faithful SCHEMA check: pandas dtype equality per column.
        # hash_pandas_object hashes tz-aware and naive timestamps to the
        # same values, so a dtype drift (datetime64[us, UTC] vs
        # datetime64[us]) passes the hash yet fails the driver's schema
        # compare (round-9 q_scan_parquet) — catch it explicitly here.
        dtype_bad = [c for c in sorted(exp.columns)
                     if str(exp[c].dtype) != str(got[c].dtype)]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch " + "; ".join(
                f"{c}: oracle={exp[c].dtype} spark={got[c].dtype}" for c in dtype_bad))
            n_bad += 1
            continue
        try:
            e, g = canon(exp), canon(got)
        except Exception as ex:
            print(f"FAIL {name}: sort crashed (driver err path): {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows oracle={len(e)} spark={len(g)}")
            n_bad += 1
            continue
        try:
            he, hg = hash_df(e), hash_df(g)
        except Exception as ex:
            print(f"FAIL {name}: hash crashed: {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if he != hg:
            # diagnose: per-column dtype + first differing cell
            msgs = []
            for c in e.columns:
                if str(e[c].dtype) != str(g[c].dtype):
                    msgs.append(f"dtype {c}: oracle={e[c].dtype} spark={g[c].dtype}")
                else:
                    try:
                        hce = pd.util.hash_pandas_object(e[c], index=False).sum()
                        hcg = pd.util.hash_pandas_object(g[c], index=False).sum()
                        if hce != hcg:
                            neq = (e[c].astype(object) != g[c].astype(object))
                            idx = neq[neq].index
                            if len(idx):
                                i = idx[0]
                                msgs.append(f"col {c}: row {i} oracle={e[c][i]!r} spark={g[c][i]!r}")
                            else:
                                i0 = e.index[0] if len(e) else None
                                msgs.append(f"col {c}: hash differs, values == (repr e0={e[c][i0]!r} g0={g[c][i0]!r}, "
                                            f"type e0={type(e[c][i0]).__name__} g0={type(g[c][i0]).__name__})")
                    except Exception as ex:
                        msgs.append(f"col {c}: diag err {ex}")
            print(f"FAIL {name}: hash mismatch; " + ("; ".join(msgs) or "(no per-col diff found)"))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(e)} rows)")
    print(f"\n{len(names) - n_bad}/{len(names)} match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
