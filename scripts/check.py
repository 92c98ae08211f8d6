#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against its DuckDB oracle (columns sorted by name, exact value
match including nulls). Usage: check.py [outDir] [sfDir] [jsonOut] —
the optional third arg also writes a driver-format per-query record
(rows/schema/hash match booleans), the builder's committed
CORRECTNESS_LOCAL artifact."""
import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}
def rec(name, rows=False, schema=False, hsh=False, sr=None, orr=None, err=None):
    record[name] = {"rows_match": rows, "schema_match": schema,
                    "hash_match": hsh, "spark_rows": sr, "oracle_rows": orr,
                    "err": err}
con = duckdb.connect()
for p in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(p)[:-len('.parquet')]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
n_ok, fails = 0, []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f'{outdir}/{name}')
    except Exception as e:
        fails.append((name, 'spark-dump-missing', str(e)[:200]))
        rec(name, err='spark-dump-missing'); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, 'oracle-sql-error', str(e)[:300]))
        rec(name, sr=len(spark_df), err='oracle-sql-error: ' + str(e)[:200]); continue
    spark_df = spark_df[sorted(spark_df.columns)]
    duck_df = duck_df[sorted(duck_df.columns)]
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, 'schema', list(spark_df.columns), list(duck_df.columns)))
        rec(name, rows=len(spark_df) == len(duck_df), sr=len(spark_df),
            orr=len(duck_df), err='schema'); continue
    if len(spark_df) != len(duck_df):
        fails.append((name, 'rowcount', len(spark_df), len(duck_df)))
        rec(name, schema=True, sr=len(spark_df), orr=len(duck_df),
            err='rowcount'); continue
    bad_col = None
    for c in spark_df.columns:
        a, b = spark_df[c].to_numpy(), duck_df[c].to_numpy()
        # The driver's hash is value-REPRESENTATION-sensitive: a Spark
        # bigint 1609 vs a DuckDB-widened HUGEINT->float64 1609.0
        # hash-mismatches even though float coercion below would pass.
        # Flag the dtype-class split (integer one side, float the other)
        # as a failure so the local gate predicts the driver's.
        ka, kb = a.dtype.kind, b.dtype.kind
        if {ka, kb} <= {'i', 'u', 'f'} and (ka == 'f') != (kb == 'f'):
            bad_col = (name, 'dtype-class', c,
                       f'spark={a.dtype} oracle={b.dtype} '
                       '(driver hash is representation-sensitive; '
                       'CAST the oracle column, e.g. ::BIGINT)')
            break
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            a = a.astype(float); b = b.astype(float)
            eq = (np.isnan(a) & np.isnan(b)) | (a == b)
        else:
            eq = (pd.isna(a) & pd.isna(b)) | (a == b)
        if not eq.all():
            idx = np.nonzero(~eq)[0][:5]
            bad_col = (name, 'values', c, int((~eq).sum()),
                       [(int(i), a[i], b[i]) for i in idx])
            break
    if bad_col:
        fails.append(bad_col)
        rec(name, rows=True, schema=True, sr=len(spark_df), orr=len(duck_df),
            err=f'{bad_col[1]}: {bad_col[2]} ({bad_col[3]})')
    else:
        n_ok += 1
        rec(name, rows=True, schema=True, hsh=True,
            sr=len(spark_df), orr=len(duck_df))

# rows-only queries (no oracle): check dump exists and is non-empty
dumps = {os.path.basename(d) for d in glob.glob(f'{outdir}/*') if os.path.isdir(d)}
rows_only = dumps - set(oracle)
ro_fail = []
for name in sorted(rows_only):
    try:
        n = len(pd.read_parquet(f'{outdir}/{name}'))
        if n == 0: ro_fail.append((name, 'empty'))
    except Exception as e:
        ro_fail.append((name, str(e)[:120]))

print(f"oracle: {n_ok}/{len(oracle)} ok; rows-only: {len(rows_only)-len(ro_fail)}/{len(rows_only)} ok")
for f in fails + ro_fail:
    print('FAIL', f)
if json_out:
    with open(json_out, 'w') as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(record)} queries)")
sys.exit(1 if (fails or ro_fail) else 0)
