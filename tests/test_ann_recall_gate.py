"""CI gate for ANN quality (r5 verdict task #4): the recall@10 metrics
must not live only in bench artifacts — a kernel change that silently
degrades recall has to fail pytest.

Both paths are fully deterministic on the fixed sf0.001 fixture (integer
LCG hyperplanes / integer-quantized cosine — see functions/dialect.py),
so the asserted values are exact measurements, not flaky bounds:
  LSH multi-probe per-query recall_pct = {90,100,90,80,90} -> mean 90
  IVF (8 lists, 2 probes)             = {100,80,90,90,90} -> mean 90
"""

import pytest

from datafusion_orc_spark.plans import queries as Q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def recalls(spark):
    lsh = {r.query_id: r.recall_pct for r in Q.q_ann_recall(spark, SF_DIR).collect()}
    ivf = {r.query_id: r.recall_pct for r in Q.q_ann_recall_ivf(spark, SF_DIR).collect()}
    return lsh, ivf


def test_lsh_multiprobe_recall_gate(recalls):
    lsh, _ = recalls
    assert len(lsh) == 5
    assert sum(lsh.values()) / len(lsh) >= 90, lsh  # measured mean: exactly 90
    assert min(lsh.values()) >= 80, lsh  # measured per-query floor


def test_ivf_recall_gate(recalls):
    _, ivf = recalls
    assert len(ivf) == 5
    assert sum(ivf.values()) / len(ivf) >= 90, ivf  # measured mean: exactly 90
    assert min(ivf.values()) >= 80, ivf  # measured per-query floor
