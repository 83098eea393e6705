import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv)>1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv)>2 else "/tmp/v001"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files else pd.DataFrame()
    if name not in oracles:
        ok.append(f"{name} (rows-only: {len(spark_df)})")
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        bad.append(f"{name}: ORACLE SQL ERROR {e}"); continue
    # driver compare: sort columns by name, hash values
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    o = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(o.columns):
        bad.append(f"{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}"); continue
    if len(s) != len(o):
        bad.append(f"{name}: ROWS {len(s)} vs {len(o)}"); continue
    ss = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    oo = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    try:
        mismatch = None
        for c in s.columns:
            a, b = ss[c], oo[c]
            try:
                if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                    a = a.astype("datetime64[us]"); b = b.astype("datetime64[us]")
                a2 = pd.to_numeric(a, errors="raise"); b2 = pd.to_numeric(b, errors="raise")
                # GRAFT_EXACT=1: bit-exact like the driver's value hash —
                # the 1e-9 tolerance hid the r9 embed_jl_project red row
                if os.environ.get("GRAFT_EXACT"):
                    eqs = (a2 == b2) | (a2.isna() & b2.isna())
                else:
                    eqs = ((a2 - b2).abs() < 1e-9) | (a2.isna() & b2.isna())
            except Exception:
                eqs = (a.astype(str) == b.astype(str))
            if not eqs.all():
                i = eqs.idxmin(); mismatch = f"col {c} row {i}: {a[i]!r} vs {b[i]!r}"; break
        if mismatch: bad.append(f"{name}: VALUES {mismatch}")
        else: ok.append(f"{name} ({len(s)})")
    except Exception as e:
        bad.append(f"{name}: COMPARE ERR {e}")
print(f"OK: {len(ok)}  BAD: {len(bad)}")
for b in bad: print("FAIL", b)
