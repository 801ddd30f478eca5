"""Drive the driver's own protocol: load __spark_entry__, run each query
on Spark and its oracle on DuckDB, sort columns by name, hash values."""
import hashlib, json, sys
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as em
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(df):
    df = df[sorted(df.columns)].sort_values(by=sorted(df.columns), ignore_index=True)
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row: h.update(repr(v).encode()); h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

Q, O = em.queries(), em.oracle_sql()
out = {}
for name in (NAMES or sorted(O)):
    sdf = Q[name](spark, SF).toPandas()
    odf = con.execute(O[name]).df()
    out[name] = {
        "rows_match": len(sdf) == len(odf),
        "schema_match": sorted(sdf.columns) == sorted(odf.columns),
        "hash_match": vhash(sdf) == vhash(odf),
        "spark_dtypes": dict(sdf.dtypes.astype(str)),
        "oracle_dtypes": dict(odf.dtypes.astype(str)),
    }
print(json.dumps({k: {kk: v[kk] for kk in ("rows_match","schema_match","hash_match")} for k, v in out.items()}, indent=1))
bad = [k for k, v in out.items() if not all((v["rows_match"], v["schema_match"], v["hash_match"]))]
print("FAILING:", bad)
for k in bad: print(k, out[k])
