#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle correctness gate.

NOT part of the engine (the library is pure Scala/Spark) — this just lets us
run the same compare the driver will run, before the driver runs it.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]
  1. (caller) sbt "runMain graft.Verify <sfDir> <outDir>"
  2. python3 tools/check.py <sfDir> <outDir>
"""
import duckdb, json, sys, os

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_verify'
    con = duckdb.connect()
    # at-scale oracle runs (sf10) need spill room; harmless at sf0.01
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # NOTE: do NOT set preserve_insertion_order=false here. Under DuckDB
    # 1.0 it silently drops a final ORDER BY fed by MATERIALIZED CTEs
    # (q_kcore's shape), making the positional compare flap; the spill
    # temp_directory above is what the sf10 runs actually needed.
    for t in TABLES:
        # driver fixtures are single files; Probe make-scale corpora are
        # Spark output DIRECTORIES — glob the parts in that case
        p = f'{sf}/{t}.parquet'
        if os.path.isdir(p):
            p = f'{p}/*.parquet'
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    import pandas as pd
    fails, npass = [], 0
    for name in sorted(os.listdir(out)):
        qdir = os.path.join(out, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_df()
            if name not in oracle:
                status = 'OK  ' if len(got) > 0 else 'WARN(0 rows)'
                print(f'{status} {name} (rows-only, {len(got)} rows)')
                npass += 1
                continue
            exp = con.execute(oracle[name]).fetch_df()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            if list(exp.columns) != list(got.columns):
                fails.append((name, f'cols: oracle={list(exp.columns)} got={list(got.columns)}')); continue
            if len(exp) != len(got):
                fails.append((name, f'rows: oracle={len(exp)} got={len(got)}')); continue
            try:
                pd.testing.assert_frame_equal(exp.reset_index(drop=True),
                                              got.reset_index(drop=True),
                                              check_dtype=False, check_exact=True)
            except AssertionError as e:
                fails.append((name, str(e)[:400])); continue
            # the driver's hash is type-sensitive (int64 vs float64 hash
            # differently even when values match) — flag kind mismatches
            kinds = [(c, exp[c].dtype.kind, got[c].dtype.kind)
                     for c in exp.columns if exp[c].dtype.kind != got[c].dtype.kind]
            if kinds:
                fails.append((name, f'dtype kinds differ (driver hash would mismatch): {kinds}')); continue
            print(f'OK   {name} ({len(exp)} rows)')
            npass += 1
        except Exception as e:
            fails.append((name, f'error: {e}'))
    for name, msg in fails:
        print(f'FAIL {name}: {msg}')
    missing = sorted(set(oracle) - {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))})
    for m in missing:
        print(f'MISS {m}: oracle present but no query output')
    print(f'{npass} pass / {len(fails)} fail / {len(missing)} missing')
    sys.exit(1 if fails or missing else 0)

main()
