"""End-to-end string-key bloom point lookup (r7): the Murmur3 bloom path
through write_orc_distributed -> read_orc_distributed, with the pruning
actually observed (non-matching row groups skipped), not just correct."""

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def string_bloom_dir(spark, tmp_path_factory):
    from datafusion_orc_spark.sources.orc_sink import write_orc_distributed
    from datafusion_orc_spark.sources.tokens import tokenized_sequences

    out = str(tmp_path_factory.mktemp("strbloom"))
    seqs = tokenized_sequences(spark, SF_DIR).select("doc_id", "n_tok", "source")
    # hash-shuffle so every stripe's doc_id min/max spans the whole
    # domain: stats pruning provably cannot discriminate a point, so any
    # observed skip is the bloom's
    stats = write_orc_distributed(
        seqs.repartition(2), out, stripe_rows=512, compression="snappy",
        row_index_stride=128, bloom_filter_columns=["doc_id"],
    ).collect()
    total = sum(r["n_rows"] for r in stats)
    assert total > 0
    return out, total


def test_absent_string_key_prunes_almost_everything(spark, string_bloom_dir):
    """A needle that is NOT in the table: min/max stats keep every group
    (full-domain ranges), so any group that comes back was a bloom false
    positive — the decoded row count is the read log. At fpp=0.05 the
    expected survivors are ~5% of groups; assert <25% of rows decoded."""
    from datafusion_orc_spark.sources.orc_source import read_orc_distributed

    out, total = string_bloom_dir
    needle = "doc-999999999999"
    df = read_orc_distributed(spark, out, prune={"doc_id": (needle, needle)})
    decoded = df.count()
    assert decoded < total * 0.25, (decoded, total)
    assert df.filter(F.col("doc_id") == needle).count() == 0


def test_present_string_key_survives_and_is_exact(spark, string_bloom_dir):
    from datafusion_orc_spark.sources.orc_source import read_orc_distributed
    from datafusion_orc_spark.sources.tokens import tokenized_sequences

    out, total = string_bloom_dir
    seqs = tokenized_sequences(spark, SF_DIR)
    key, want_n_tok = seqs.select("doc_id", "n_tok").orderBy("doc_id").first()
    df = read_orc_distributed(spark, out, prune={"doc_id": (key, key)})
    decoded = df.count()
    assert 0 < decoded < total, (decoded, total)  # pruned, but key's group kept
    got = df.filter(F.col("doc_id") == key).collect()
    assert len(got) == 1 and got[0]["n_tok"] == want_n_tok


def test_query_entry_matches_plain_aggregate(spark):
    """q_orc_string_lookup (the oracled entry) against the same aggregate
    computed straight from the raw table — the in-repo mirror of the
    DuckDB oracle."""
    from datafusion_orc_spark.plans.queries import q_orc_string_lookup
    from datafusion_orc_spark.sources.tokens import tokenized_sequences

    got = q_orc_string_lookup(spark, SF_DIR).collect()
    seqs = tokenized_sequences(spark, SF_DIR)
    key = seqs.agg(F.max("doc_id")).collect()[0][0]
    want = (
        seqs.filter(F.col("doc_id") == key)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").cast("long").alias("sum_tok"))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
