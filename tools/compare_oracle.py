"""Replicate the driver's correctness gate locally: for each query output
parquet under OUT, run the oracle SQL in DuckDB against the sf tables and
compare row-by-row (columns sorted by name, rows sorted)."""
import duckdb, json, sys, glob, os, math

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f'{d}/*.parquet')
    if not files:
        results[name] = 'NO_OUTPUT'
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetch_df()
    if name not in oracle:
        results[name] = f'rows_only({len(got)})'
        continue
    try:
        exp = con.execute(oracle[name]).fetch_df()
    except Exception as e:
        results[name] = f'ORACLE_SQL_ERROR: {e}'
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        results[name] = f'SCHEMA_MISMATCH: got={list(g.columns)} exp={list(e.columns)}'
        continue
    if len(g) != len(e):
        results[name] = f'ROWCOUNT: got={len(g)} exp={len(e)}'
        continue
    # array/list columns are unhashable for sort_values — sort on a stringified
    # shadow of every column instead (values themselves still compared raw)
    def sortable(df):
        key_cols = {}
        for c in df.columns:
            key_cols['__k_' + c] = df[c].map(repr)
        return df.assign(**key_cols).sort_values(
            by=['__k_' + c for c in df.columns], ignore_index=True)[list(df.columns)]
    g = sortable(g)
    e = sortable(e)
    bad = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b and not (math.isnan(a) and math.isnan(b)):
                    bad = f'col {c} row {i}: {a!r} != {b!r} (diff={a-b!r})'
                    break
            elif str(a) != str(b):
                bad = f'col {c} row {i}: {a!r} != {b!r}'
                break
        if bad: break
    results[name] = 'OK' if bad is None else f'VALUE_MISMATCH: {bad}'

for k, v in sorted(results.items()):
    print(f'{k:24s} {v}')
n_ok = sum(1 for v in results.values() if v == 'OK')
print(f'--- {n_ok} exact-OK / {len(results)} total')
