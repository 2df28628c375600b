"""Simulate the driver: smoke entry(), then queries() vs oracle_sql() at sf0.01."""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from advanced_strapi_import_spark.session import get_spark

spark = get_spark("driver-sim", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry
df = e.entry(spark)
rows = df.collect()
print("ENTRY: rows =", len(rows), "schema =", df.schema.simpleString())

# 2. correctness at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = e.queries(), e.oracle_sql()
for name, fn in qs.items():
    sdf = fn(spark, SF)
    srows = sorted([tuple(str(x) for x in r) for r in sdf.collect()])
    scols = sorted(sdf.columns)
    if name not in oracles:
        print(f"{name}: ROWS-ONLY rows={len(srows)}")
        continue
    res = con.sql(oracles[name])
    dcols = sorted(d[0] for d in res.description)
    drows = sorted([tuple(str(x) for x in r) for r in res.fetchall()])
    # reorder spark row tuples to sorted-col order (spark collect keeps df col order)
    order = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    srows = sorted(tuple(r[i] for i in order) for r in [tuple(str(x) for x in row) for row in sdf.collect()])
    dorder = [d[0] for d in res.description]
    dres = con.sql(oracles[name]).fetchall()
    dsortidx = sorted(range(len(dorder)), key=lambda i: dorder[i])
    drows = sorted(tuple(str(r[i]) for i in dsortidx) for r in dres)
    h = lambda rs: hashlib.md5(repr(rs).encode()).hexdigest()[:12]
    status = "MATCH" if (scols==dcols and srows==drows) else "MISMATCH"
    print(f"{name}: {status} rows={len(srows)}/{len(drows)} cols={'ok' if scols==dcols else (scols,dcols)} hash={h(srows)}/{h(drows)}")
    if status == "MISMATCH" and scols==dcols:
        for a,b in zip(srows,drows):
            if a!=b:
                print("  first diff spark:", a); print("  first diff duck :", b); break
spark.stop()
