"""F1 input table — pre-tokenized training sequences
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
derived deterministically from the driver's ``documents`` table
(FIXTURES.md F4), no external data.

The tokenizer is a deterministic word-hash chosen to be expressible in
BOTH Spark SQL and DuckDB SQL (so encode→decode→aggregate queries can be
checked against the DuckDB oracle): for each whitespace word,

    tok(w) = (length(w)*131 + ascii(substr(w,1,1))*31
              + ascii(substr(w, length(w), 1))*7) % 50257

Vectorized JVM-side (no Python UDF): split/filter/transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257

# Spark-side tokens expression over a `text` column
TOKENS_EXPR = (
    "transform(filter(split(text, ' '), w -> w <> ''), "
    "w -> cast((length(w)*131 + ascii(substr(w, 1, 1))*31 "
    "+ ascii(substr(w, length(w), 1))*7) % 50257 as int))"
)

# identical tokenizer in DuckDB SQL (list_transform/list_filter)
TOKENS_SQL_DUCKDB = (
    "list_transform(list_filter(string_split(text, ' '), w -> w <> ''), "
    "w -> CAST((length(w)*131 + ascii(substr(w, 1, 1))*31 "
    "+ ascii(substr(w, length(w), 1))*7) % 50257 AS INTEGER))"
)


def tokenized_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> F1-shaped DataFrame.

    doc_id is re-keyed to the high-cardinality string shape of
    BASELINE.json's input_hint (shared prefix, FSST-friendly); source is
    carried through (low-cardinality, skew-relevant).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.concat(F.lit("doc-"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("doc_id"),
            F.expr(TOKENS_EXPR).alias("tokens"),
            F.col("source"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )


def synthetic_sequences(spark: SparkSession, n_rows: int, seed: int = 42, skew: bool = True) -> DataFrame:
    """Driver-independent deterministic F1 generator (FIXTURES.md F1):
    used for scale benchmarks where documents.parquet is too small.

    Pure Spark SQL over ``spark.range`` — generation itself is
    distributed and vectorized (no Python). Shapes: every 7th doc sorted
    ascending (delta-friendly), every 13th constant (short-repeat),
    every 97th token an outlier (patched-base), 50% of rows in src_0
    when ``skew`` (salting tests).
    """
    df = spark.range(n_rows).withColumn("rnd", F.xxhash64(F.col("id") + F.lit(seed)))
    n_tok = (F.lit(64) + F.pmod(F.col("rnd"), F.lit(1985))).cast("int")
    base_tok = (
        "transform(sequence(1, n_tok), i -> "
        f" cast(pmod(xxhash64(id * 2654435761 + i), {VOCAB}) as int))"
    )
    df = (
        df.withColumn("n_tok", n_tok)
        .withColumn("tokens_raw", F.expr(base_tok))
        .withColumn(
            "tokens",
            F.when(F.pmod("id", F.lit(13)) == 0, F.expr(f"array_repeat(cast(pmod(id, {VOCAB}) as int), n_tok)"))
            .when(F.pmod("id", F.lit(7)) == 0, F.expr("array_sort(tokens_raw)"))
            .otherwise(
                F.expr(
                    "transform(tokens_raw, (t, i) -> "
                    f"if(pmod(i, 97) = 0, cast({VOCAB} + pmod(t, 1000) as int), t))"
                )
            ),
        )
        .withColumn(
            "source",
            F.when(F.pmod("rnd", F.lit(2)) == 0, F.lit("src_0")).otherwise(
                F.concat(F.lit("src_"), F.pmod("rnd", F.lit(8)).cast("string"))
            )
            if skew
            else F.concat(F.lit("src_"), F.pmod("rnd", F.lit(8)).cast("string")),
        )
        .withColumn("doc_id", F.concat(F.lit("doc-"), F.lpad(F.hex(F.abs("rnd")), 16, "0"), F.lit("-"), F.col("id").cast("string")))
    )
    return df.select("doc_id", "tokens", "n_tok", "source")
