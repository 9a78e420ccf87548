"""Local replica of the driver correctness gate: every queries() entry
vs its DuckDB oracle (order-insensitive value compare); rows-only
entries just execute. Run from anywhere:

    python tools/gate_replica.py [sf_dir]    # default /root/testdata/sf0.01
"""
import sys, time
import duckdb, numpy as np, pandas as pd
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import ray.data
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, sqls = e.queries(), e.oracle_sql()
ok = bad = 0
fails = []
for name in sorted(qs):
    t0 = time.perf_counter()
    try:
        res = qs[name](SF)
        mine = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        if name in sqls:
            want = canon(con.execute(sqls[name]).fetchdf())
            mine = canon(mine)
            assert list(mine.columns) == list(want.columns), "cols"
            assert len(mine) == len(want), f"rows {len(mine)} vs {len(want)}"
            for c in mine.columns:
                a, b = mine[c], want[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0), f"float {c}"
                else:
                    assert a.tolist() == b.tolist(), f"val {c}"
            tag = "ORACLE-OK"
        else:
            assert len(mine) > 0, "no rows"
            tag = "ROWS-OK"
        ok += 1
        print(f"{tag:9s} {name} ({len(mine)} rows, {time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as ex:
        bad += 1
        fails.append((name, str(ex)[:200]))
        print(f"FAIL      {name}: {ex}", flush=True)
print(f"\nTOTAL: {ok} ok, {bad} fail of {len(qs)} ({len(sqls)} oracled)")
for n, m in fails: print(" -", n, m)
ray.shutdown()
