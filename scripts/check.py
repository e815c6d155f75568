#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf dir, compare to the Verify-dumped parquet (columns
sorted by name, values hashed)."""
import duckdb, glob, json, sys, math
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); fail += 1; continue
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'{name}: MISSING spark output'); fail += 1; continue
    got = pq.read_table(files[0]).to_pandas()
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f'{name}: COLUMN MISMATCH exp={list(exp.columns)} got={list(got.columns)}'); fail += 1; continue
    if len(exp) != len(got):
        print(f'{name}: ROWS exp={len(exp)} got={len(got)}'); fail += 1; continue
    mismatch = None
    for c in exp.columns:
        e, g = exp[c], got[c]
        # Type-strict gate: an integer column on one side fetched as
        # float on the other is the uncast-HUGEINT class (DuckDB
        # SUM(BIGINT) -> HUGEINT -> float64, lossy past 2^53). Numeric
        # comparison is structurally blind to it (both sides round the
        # same way), so dtype-kind divergence must fail outright.
        if e.dtype.kind != g.dtype.kind:
            mismatch = f'col {c}: DTYPE KIND MISMATCH oracle={e.dtype} spark={g.dtype}'
            break
        try:
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                same = ((e.isna() & g.isna()) | (e == g)).all()
            else:
                ev, gv = e.astype(str), g.astype(str)
                same = ((e.isna() & g.isna()) | (ev == gv)).all()
            if not same:
                idx = ((e.isna() & g.isna()) | (e.astype(str) == g.astype(str)))
                bad = (~idx).idxmax()
                mismatch = f'col {c} row {bad}: exp={e[bad]!r} got={g[bad]!r} (dtypes {e.dtype}/{g.dtype})'
                break
        except Exception as ex:
            mismatch = f'col {c}: compare error {ex} (dtypes {e.dtype}/{g.dtype})'; break
    if mismatch:
        print(f'{name}: VALUE MISMATCH {mismatch}'); fail += 1
    else:
        print(f'{name}: OK ({len(exp)} rows)'); ok += 1

# rows-only queries
import os
for d in sorted(glob.glob(f'{outdir}/q*')):
    name = os.path.basename(d)
    if name in oracle: continue
    files = glob.glob(f'{d}/*.parquet')
    n = pq.read_table(files[0]).num_rows if files else -1
    print(f'{name}: rows-only, {n} rows' + (' [EMPTY!]' if n <= 0 else ''))
print(f'\n{ok} ok / {fail} fail of {len(oracle)} oracle queries')
