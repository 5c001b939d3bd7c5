import duckdb, json, sys, glob
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
for name, sql in oracle.items():
    try:
        expected = con.execute(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); continue
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); continue
    actual = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)])
    # driver-style: sort columns by name, compare
    expected = expected[sorted(expected.columns)].reset_index(drop=True)
    actual = actual[sorted(actual.columns)].reset_index(drop=True)
    if list(expected.columns) != list(actual.columns):
        print(f'{name}: SCHEMA MISMATCH exp={list(expected.columns)} act={list(actual.columns)}'); continue
    if len(expected) != len(actual):
        print(f'{name}: ROWCOUNT exp={len(expected)} act={len(actual)}'); continue
    # normalize dtypes for compare
    ok = True
    for c in expected.columns:
        e = expected[c]; a = actual[c]
        try:
            same = (e.astype(str).values == a.astype(str).values).all()
        except Exception as ex:
            same = False
        if not same:
            ok = False
            mism = (e.astype(str).values != a.astype(str).values)
            idx = mism.argmax()
            print(f'{name}: COLUMN {c} MISMATCH at row {idx}: exp={e.iloc[idx]!r} act={a.iloc[idx]!r}')
            break
    if ok:
        print(f'{name}: OK ({len(expected)} rows)')
