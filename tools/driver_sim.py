"""Simulate the driver: smoke entry(), then queries() vs oracle_sql() at sf0.01.

Usage: python tools/driver_sim.py [name-substring ...]
With args, only queries whose name contains any substring are run.
Exit code is nonzero if any query errors or mismatches.
"""
import os, sys, hashlib, time, traceback
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from advanced_strapi_import_spark import caching
from advanced_strapi_import_spark.session import get_spark

spark = get_spark("driver-sim", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
try:  # static conf in Spark 4 — builder-time only; harmless if refused
    spark.conf.set("spark.ui.showConsoleProgress", "false")
except Exception:
    pass

only = sys.argv[1:]

# 1. smoke: entry
if not only:
    df = e.entry(spark)
    rows = df.collect()
    print("ENTRY: rows =", len(rows), "schema =", df.schema.simpleString())

# 2. correctness at sf0.01 (the driver's SF); DRIVER_SIM_SF_DIR
# overrides for local 3-SF parity sweeps — note SPARK_GRAFT_SF_DIR is
# deliberately NOT honored here (it belongs to bench.py; honoring it
# would silently shrink the oracle gate when both are exported)
SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = e.queries(), e.oracle_sql()
bad = []
for name, fn in qs.items():
    if only and not any(s in name for s in only):
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        scols = sorted(sdf.columns)
        order = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        srows = sorted(tuple(r[i] for i in order)
                       for r in [tuple(str(x) for x in row) for row in sdf.collect()])
        if name not in oracles:
            print(f"{name}: ROWS-ONLY rows={len(srows)} ({time.time()-t0:.1f}s)", flush=True)
            continue
        res = con.sql(oracles[name])
        dorder = [d[0] for d in res.description]
        dcols = sorted(dorder)
        dsortidx = sorted(range(len(dorder)), key=lambda i: dorder[i])
        drows = sorted(tuple(str(r[i]) for i in dsortidx) for r in res.fetchall())
    except Exception:
        print(f"{name}: ERROR ({time.time()-t0:.1f}s)", flush=True)
        traceback.print_exc()
        bad.append(name)
        continue
    finally:
        caching.release_tracked()
    h = lambda rs: hashlib.md5(repr(rs).encode()).hexdigest()[:12]
    status = "MATCH" if (scols == dcols and srows == drows) else "MISMATCH"
    print(f"{name}: {status} rows={len(srows)}/{len(drows)} "
          f"cols={'ok' if scols == dcols else (scols, dcols)} "
          f"hash={h(srows)}/{h(drows)} ({time.time()-t0:.1f}s)", flush=True)
    if status == "MISMATCH":
        bad.append(name)
        if scols == dcols:
            for a, b in zip(srows, drows):
                if a != b:
                    print("  first diff spark:", a)
                    print("  first diff duck :", b)
                    break
spark.stop()
if bad:
    print("FAILING:", bad)
    sys.exit(1)
print("ALL GREEN")
