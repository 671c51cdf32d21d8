#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each dumped query
result (Verify output), run the oracle SQL in DuckDB over the same
parquet tables and compare row-by-row (columns sorted by name, rows
compared in result order, with a sorted-rows fallback report).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # local iteration on a subset (matches Verify's 3rd arg)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = exp.df()[exp_cols].values.tolist()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = got.df()[got_cols].values.tolist()
        except Exception as e:
            print(f"FAIL {name}: result read error: {str(e)[:300]}")
            n_bad += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns {got_cols} != oracle {exp_cols}")
            n_bad += 1
            continue
        # Driver's hash is TYPE-sensitive (e.g. DuckDB window-sum over
        # BIGINT yields HUGEINT; Spark emits BIGINT -> hash mismatch even
        # with identical values). Compare logical types, not just values.
        exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
        got_types = dict(zip(got.columns, [str(t) for t in got.types]))
        type_diff = {c: (got_types[c], exp_types[c]) for c in exp_cols
                     if got_types[c] != exp_types[c]}
        if type_diff:
            print(f"FAIL {name}: dtype mismatch (result vs oracle): "
                  f"{type_diff}")
            n_bad += 1
            continue
        e_n = [[norm(v) for v in r] for r in exp_rows]
        g_n = [[norm(v) for v in r] for r in got_rows]
        if e_n == g_n:
            print(f"OK   {name} ({len(e_n)} rows)")
            n_ok += 1
        elif sorted(map(tuple, e_n)) == sorted(map(tuple, g_n)):
            print(f"WARN {name}: rows match only after sorting "
                  f"({len(e_n)} rows) - fix ORDER BY")
            n_bad += 1
        else:
            print(f"FAIL {name}: {len(g_n)} rows vs oracle {len(e_n)}")
            eset = set(map(tuple, e_n)); gset = set(map(tuple, g_n))
            for r in list(eset - gset)[:3]:
                print(f"  oracle-only: {r}")
            for r in list(gset - eset)[:3]:
                print(f"  result-only: {r}")
            if len(e_n) == len(g_n):
                for i, (a, b) in enumerate(zip(e_n, g_n)):
                    if a != b:
                        print(f"  first diff at row {i}:\n   oracle {a}\n   result {b}")
                        break
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
