"""Physical-plan assertions: the optimizations SURVEY.md §4.1 promises
must actually appear in `.explain` output — pushed filters, pruned scan
schemas, broadcast joins, whole-stage codegen, and no shuffle in the
encode hot path."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_quantity") < 24)
        .select("l_returnflag", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,24.0)" in plan, plan
    # column pruning: ReadSchema must not include unprojected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_returnflag" in read_schema


def test_broadcast_join_used_for_dims(spark):
    from datafusion_orc_spark.plans.queries import q_nation_revenue

    plan = _plan(q_nation_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle-join


def test_encode_plan_has_no_exchange(spark):
    """The encode hot path must be shuffle-free: scan -> mapInArrow."""
    from datafusion_orc_spark.operators.encode import encode_table

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(encode_table(df, stripe_rows=4096))
    assert "Exchange" not in plan, plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan, plan


def test_wholestage_codegen_in_agg(spark):
    from datafusion_orc_spark.plans.queries import q_pricing_summary

    df = q_pricing_summary(spark, SF_DIR)
    # AQE's pre-execution formatted plan hides codegen: ask for codegen mode
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in plan


def test_decode_prune_is_broadcast(spark):
    """Stripe pruning must broadcast the surviving-stripe-id set, not
    shuffle the blob table."""
    from datafusion_orc_spark.operators.encode import decode_table, encode_table

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    blobs = encode_table(df, stripe_rows=2000)
    dec = decode_table(blobs, None, df.schema, prune={"l_orderkey": (0, 100)})
    plan = _plan(dec)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
