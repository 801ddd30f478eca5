"""ORC UNION type (the one ORC v1 type the r2 verdict listed as out of
scope): decode an ORC-Java-written uniontype file with our pure-python
reader and compare row values against pyarrow's ORC C++ reader.

The fixture file is written through Spark's JVM (orc-core) because no
python writer in this sandbox can produce uniontype files.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.orc as paorc
import pytest


@pytest.fixture(scope="module")
def union_file(spark, tmp_path_factory):
    from py4j.java_gateway import get_field, set_field

    p = str(tmp_path_factory.mktemp("orc_union") / "u.orc")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    td = jvm.org.apache.orc.TypeDescription.fromString(
        "struct<k:int,u:uniontype<int,string>>"
    )
    writer = jvm.org.apache.orc.OrcFile.createWriter(
        jvm.org.apache.hadoop.fs.Path(p),
        jvm.org.apache.orc.OrcFile.writerOptions(conf).setSchema(td),
    )
    batch = td.createRowBatch()
    k = get_field(batch, "cols")[0]
    u = get_field(batch, "cols")[1]
    tags = get_field(u, "tags")
    fields = get_field(u, "fields")
    ints, strs = fields[0], fields[1]
    n = 1000
    for i in range(n):
        get_field(k, "vector")[i] = i
        tags[i] = i % 3 % 2  # pattern 0,1,0,0,1,0,... both children used
        if tags[i] == 0:
            get_field(ints, "vector")[i] = i * 10
        else:
            strs.setVal(i, bytearray(f"s-{i}".encode()))
    set_field(batch, "size", n)
    writer.addRowBatch(batch)
    writer.close()
    return p, n


def test_union_decodes_match_orc_cxx(union_file):
    from datafusion_orc_spark.format.orc_reader import read_orc

    p, n = union_file
    ours = read_orc(p)
    cxx = paorc.ORCFile(p).read()
    assert ours.num_rows == cxx.num_rows == n
    assert pa.types.is_union(ours.schema.field("u").type)
    # row-by-row value equality (ours is dense union, C++ reader surfaces
    # sparse — to_pylist normalizes both to plain python values)
    assert ours.column("k").to_pylist() == cxx.column("k").to_pylist()
    assert ours.column("u").to_pylist() == cxx.column("u").to_pylist()
    # spot-check the tag pattern
    u = ours.column("u").to_pylist()
    assert u[0] == 0 and u[1] == "s-1" and u[3] == 30


def test_union_distributed_scan(spark, union_file):
    """UNION columns can't cross into Spark (no Spark union type) — but a
    projection that EXCLUDES the union column must scan fine."""
    from datafusion_orc_spark.sources.orc_source import read_orc_distributed

    p, n = union_file
    df = read_orc_distributed(spark, p, columns=["k"])
    assert df.count() == n
    assert df.agg({"k": "max"}).collect()[0][0] == n - 1
