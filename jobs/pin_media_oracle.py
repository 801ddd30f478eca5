"""Regenerate the pinned VALUES literal for SQL_MEDIA_FEATURES.

The media table is synthesized by a fully-seeded generator and decoded by
our own pure-numpy codecs, so the per-kind aggregate is a constant; this
script runs q_media_features once and prints the DuckDB VALUES literal to
paste into plans/queries.py. Rerun whenever FEATURE_DIM, the codecs, or
the generator change.
"""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from datafusion_orc_spark.plans.queries import q_media_features

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
rows = q_media_features(spark, "unused").collect()
print('SQL_MEDIA_FEATURES = """')
print("SELECT * FROM (VALUES")
vals = ",\n".join(
    f"  ('{r['kind']}', CAST({r['n_media']} AS BIGINT), "
    f"CAST({r['payload_bytes']} AS BIGINT), CAST({r['feature_q_sum']} AS BIGINT))"
    for r in rows
)
print(vals)
print(") AS t(kind, n_media, payload_bytes, feature_q_sum) ORDER BY kind")
print('"""')
