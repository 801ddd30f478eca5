"""Stripe pruning on per-stripe min/max stats (S7/D19 analogue)."""

import pytest
from pyspark.sql import functions as F

from datafusion_orc_spark.operators.encode import decode_table, encode_table

SF_DIR = "/root/testdata/sf0.001"


def test_stripe_pruning_skips_blobs(spark):
    # sort by orderkey so stripes carry disjoint key ranges
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .orderBy("l_orderkey")
        .coalesce(1)
    )
    blobs = encode_table(li, stripe_rows=500).cache()
    n_stripes = blobs.select("stripe_id").distinct().count()
    assert n_stripes >= 8

    lo, hi = 100, 400
    pruned = decode_table(
        blobs, None, li.schema, prune={"l_orderkey": (lo, hi)}
    ).filter(F.col("l_orderkey").between(lo, hi))
    expected = li.filter(F.col("l_orderkey").between(lo, hi))
    assert pruned.count() == expected.count()
    assert (
        pruned.agg(F.sum("l_quantity")).collect()[0][0]
        == expected.agg(F.sum("l_quantity")).collect()[0][0]
    )

    # the pruning actually skipped most stripes
    surviving = (
        blobs.filter(
            (F.col("column") == "l_orderkey")
            & (F.col("vmax") >= lo)
            & (F.col("vmin") <= hi)
        )
        .select("stripe_id")
        .distinct()
        .count()
    )
    assert surviving < n_stripes / 2, (surviving, n_stripes)
    blobs.unpersist()


def test_pruning_stats_present(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").coalesce(2)
    blobs = encode_table(li, stripe_rows=2000)
    row = blobs.filter(F.col("column") == "l_orderkey").first()
    assert row["vmin"] is not None and row["vmax"] is not None
    assert row["vmin"] <= row["vmax"]
    srow = blobs.filter(F.col("column") == "l_returnflag").first()
    assert srow["vmin"] is None  # string columns carry no int min/max
