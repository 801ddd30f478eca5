"""M4 — Spark encode/decode path end-to-end on local Spark."""

import numpy as np
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_orc_spark.operators.encode import decode_table, encode_table, verify_roundtrip
from datafusion_orc_spark.sources.tokens import synthetic_sequences, tokenized_sequences

SF_DIR = "/root/testdata/sf0.001"


def test_orc_v11_rlev1_conformance(spark, tmp_path):
    """Decode an ORC 0.11 file (RLEv1 DIRECT/DICTIONARY encodings,
    written by Spark's ORC-Java writer) bit-identically vs pyarrow."""
    import glob

    import pyarrow.orc

    from datafusion_orc_spark.format.orc_reader import read_orc

    out = str(tmp_path / "orc_v11")
    df = spark.range(2000).selectExpr(
        "id", "cast(id % 7 as int) small", "concat('s', id % 5) s",
        "cast(id as double) d", "if(id % 9 = 0, null, id * 3) nullable",
    )
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("orc.write.format", "0.11")
        .option("compression", "none")
        .orc(out)
    )
    path = glob.glob(f"{out}/*.orc")[0]
    ours = read_orc(path)
    oracle = pyarrow.orc.ORCFile(path).read()
    for name in oracle.schema.names:
        assert ours.column(name).combine_chunks().equals(oracle.column(name).combine_chunks()), name


def test_tokenized_sequences_shape(spark):
    seqs = tokenized_sequences(spark, SF_DIR)
    assert [f.name for f in seqs.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    row = seqs.first()
    assert row.doc_id.startswith("doc-")
    assert all(0 <= t < 50257 for t in row.tokens)
    assert row.n_tok == len(row.tokens)


def test_roundtrip_tokens_table(spark):
    seqs = tokenized_sequences(spark, SF_DIR).repartition(4)
    ok, info = verify_roundtrip(seqs, stripe_rows=128)
    assert ok, info
    assert info["rows"] == seqs.count()
    assert info["enc_bytes"] < info["raw_bytes"], info


def test_roundtrip_synthetic(spark):
    seqs = synthetic_sequences(spark, 500).repartition(3)
    ok, info = verify_roundtrip(seqs, stripe_rows=100)
    assert ok, info


def test_roundtrip_lineitem(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(4)
    ok, info = verify_roundtrip(df, stripe_rows=1000)
    assert ok, info
    assert info["ratio"] > 1.0


def test_decode_projection(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(2)
    blobs = encode_table(df, stripe_rows=2000).cache()
    proj = decode_table(blobs, None, df.schema, columns=["l_orderkey", "l_quantity"])
    assert proj.columns == ["l_orderkey", "l_quantity"]
    assert proj.count() == df.count()
    assert proj.agg(F.sum("l_quantity")).collect()[0][0] == df.agg(F.sum("l_quantity")).collect()[0][0]
    blobs.unpersist()


def test_per_row_token_equality(spark):
    """The north-rule invariant: token-array equality per row."""
    seqs = tokenized_sequences(spark, SF_DIR)
    blobs = encode_table(seqs.repartition(2), stripe_rows=200)
    decoded = decode_table(blobs, None, seqs.schema)
    joined = (
        seqs.alias("a")
        .join(decoded.alias("b"), "doc_id")
        .select(
            (F.col("a.tokens") == F.col("b.tokens")).alias("tok_eq"),
            (F.col("a.source") == F.col("b.source")).alias("src_eq"),
        )
    )
    agg = joined.agg(F.count(F.lit(1)).alias("n"), F.sum(F.when(F.col("tok_eq") & F.col("src_eq"), 0).otherwise(1)).alias("bad")).collect()[0]
    assert agg["n"] == seqs.count()
    assert agg["bad"] == 0


def test_decode_projection_caller_order_normalized(spark):
    """r8: a projection passed in non-schema order must decode correctly —
    decode output column order follows the SCHEMA, not the caller list
    (caller-order used to mis-bind column vectors JVM-side: an array
    column read as string → UNSUPPORTED_CALL getArray)."""
    seqs = tokenized_sequences(spark, SF_DIR)
    blobs = encode_table(seqs.repartition(2), stripe_rows=500)
    # schema order is [doc_id, tokens, n_tok, source]; request reversed
    dec = decode_table(blobs, None, seqs.schema, columns=["source", "n_tok", "tokens"])
    assert dec.columns == ["tokens", "n_tok", "source"]
    got = dec.agg(
        F.sum("n_tok").alias("s"),
        F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("t"),
    ).collect()[0]
    want = seqs.agg(
        F.sum("n_tok").alias("s"),
        F.sum(F.expr("aggregate(tokens, 0L, (a, x) -> a + x)")).alias("t"),
    ).collect()[0]
    assert (got["s"], got["t"]) == (want["s"], want["t"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown columns"):
        decode_table(blobs, None, seqs.schema, columns=["nope"])
