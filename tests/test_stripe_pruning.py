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


def test_prune_bounds_from_predicate_parser():
    from datafusion_orc_spark.operators.encode import prune_bounds_from_predicate

    b = prune_bounds_from_predicate(
        "l_orderkey > 100 AND l_orderkey <= 400 and l_partkey = 7 "
        "AND 250 >= l_suppkey AND l_comment = 'x' AND l_quantity < 1.5"
    )
    assert b["l_orderkey"] == (101, 400)
    assert b["l_partkey"] == (7, 7)
    assert b["l_suppkey"][1] == 250
    assert "l_comment" not in b and "l_quantity" not in b  # non-int: ignored
    # OR disables pruning entirely (a disjunct can rescue dropped rows)
    assert prune_bounds_from_predicate("l_orderkey > 100 OR l_partkey = 1") == {}


def test_decode_where_auto_prunes_and_filters(spark):
    """decode_table(where=...) derives stripe pruning from the predicate
    with no manual prune hint AND applies the exact residual filter."""
    from datafusion_orc_spark.format import stripe as stripe_mod

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .orderBy("l_orderkey")
        .coalesce(1)
    )
    blobs = encode_table(li, stripe_rows=500).cache()
    n_stripes = blobs.select("stripe_id").distinct().count()

    got = decode_table(
        blobs, None, li.schema, where="l_orderkey >= 100 AND l_orderkey < 401"
    )
    expected = li.filter("l_orderkey >= 100 AND l_orderkey < 401")
    assert got.count() == expected.count()
    assert (
        got.agg(F.sum("l_quantity")).collect()[0][0]
        == expected.agg(F.sum("l_quantity")).collect()[0][0]
    )
    # and the plan decodes fewer stripes: the broadcast keep-set join is
    # present and bounds the blob scan to the surviving stripe ids
    surviving = (
        blobs.filter(
            (F.col("column") == "l_orderkey")
            & (F.col("vmax") >= 100)
            & (F.col("vmin") <= 400)
        ).select("stripe_id").distinct().count()
    )
    assert surviving < n_stripes / 2
    blobs.unpersist()


def test_sub_block_rowidx_stats_roundtrip():
    """K_ROWIDX (D19 stride index): block stats parse back exactly and
    the global min/max derived from them matches the array."""
    import numpy as np
    import pyarrow as pa

    from datafusion_orc_spark.format.stripe import (
        SUB_BLOCK_ROWS,
        encode_column,
        read_block_stats,
        surviving_blocks,
    )

    n = 4 * SUB_BLOCK_ROWS
    vals = np.arange(n, dtype=np.int64)
    blob, stats = encode_column(pa.array(vals))
    assert stats["min"] == 0 and stats["max"] == n - 1
    bs = read_block_stats(blob)
    assert bs is not None
    block_rows, mins, maxs = bs
    assert block_rows == SUB_BLOCK_ROWS and len(mins) == 4
    assert list(mins) == [i * SUB_BLOCK_ROWS for i in range(4)]
    assert list(maxs) == [(i + 1) * SUB_BLOCK_ROWS - 1 for i in range(4)]
    # query hits exactly one block
    keep = surviving_blocks(blob, SUB_BLOCK_ROWS + 5, SUB_BLOCK_ROWS + 9)
    assert list(keep) == [1]
    # small columns carry no index
    blob2, _ = encode_column(pa.array(np.arange(100, dtype=np.int64)))
    assert read_block_stats(blob2) is None


def test_decode_table_skips_sub_blocks_within_surviving_stripe(spark):
    """One big sorted stripe: a narrow predicate decodes only the
    surviving SUB_BLOCK_ROWS blocks (row count proves the skip), and the
    where= residual filter returns exactly the matching rows."""
    import numpy as np

    from datafusion_orc_spark.format.stripe import SUB_BLOCK_ROWS

    n = 4 * SUB_BLOCK_ROWS
    df = spark.range(n).selectExpr("id as k", "id % 7 as v").coalesce(1)
    blobs = encode_table(df, stripe_rows=n).cache()
    assert blobs.select("stripe_id").distinct().count() == 1

    lo, hi = SUB_BLOCK_ROWS + 5, SUB_BLOCK_ROWS + 104
    # prune only (no residual): rows = surviving block, not the stripe
    pruned = decode_table(blobs, None, df.schema, prune={"k": (lo, hi)})
    assert pruned.count() == SUB_BLOCK_ROWS, "expected exactly one block"
    # where=: pruning + exact residual filter
    exact = decode_table(blobs, None, df.schema, where=f"k >= {lo} and k <= {hi}")
    rows = exact.orderBy("k").collect()
    assert len(rows) == 100 and rows[0]["k"] == lo and rows[-1]["k"] == hi
    # a range no block can satisfy: stripe survives min/max, zero rows decode
    nothing = decode_table(blobs, None, df.schema, prune={"k": (-50, -1)})
    assert nothing.count() == 0
    blobs.unpersist()
