import duckdb, json, sys, glob, os
sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = duckdb.connect().execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        # normalize: sort columns by name, sort rows, compare values
        exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"cols differ: {list(exp.columns)} vs {list(got.columns)}")); continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            fails.append((name, f"rows {len(exp)} vs {len(got)}")); continue
        import pandas as pd
        eq = exp.equals(got)
        if not eq:
            diff = (exp != got) & ~(exp.isna() & got.isna())
            bad = diff.any(axis=1)
            fails.append((name, f"values differ, first: exp={exp[bad].head(2).to_dict('records')} got={got[bad].head(2).to_dict('records')} dtypes exp={dict(exp.dtypes.astype(str))} got={dict(got.dtypes.astype(str))}"))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
# rows-only entries
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(d)
    if name not in oracle and os.path.isdir(d):
        n = duckdb.connect().execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n}")
for name, msg in fails:
    print(f"FAIL {name}: {msg[:500]}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-checked OK")

# Local oracle validation harness (driver-side python: duckdb/pandas).
# Usage:  sbt -batch "runMain graft.Verify <sfDir> <outDir>"
#         python3 scripts/compare.py <sfDir> <outDir>
