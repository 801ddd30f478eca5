"""Distributed ORC scan built on the engine's pure-python ORC reader.

This is the reference's role re-expressed as a Spark operator: the
reference plugs a per-file ORC->Arrow opener into DataFusion's scan
(`OrcOpener::open`, src/physical_exec.rs:57-91; one `FileOpenFuture`
per `PartitionedFile`); here each Spark task opens its file(s) with
``format.orc_reader.OrcReader`` and streams Arrow record batches out of
``mapInArrow`` — file-level parallelism, no shuffle.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def read_orc_distributed(
    spark: SparkSession,
    path_or_glob: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan ORC files with OUR reader, one task per file.

    Schema inference touches only the first file's tail (the reference's
    EP2 single-path schema behavior, lib.rs:148-150). ``columns`` is the
    projection pushed into the per-file read (name -> ORC column mask,
    the physical_exec.rs:69-78 analogue).
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    from datafusion_orc_spark.format.orc_reader import OrcReader
    from datafusion_orc_spark.operators.encode import _ensure_workers_can_import

    paths = sorted(_glob.glob(path_or_glob)) if any(c in path_or_glob for c in "*?[") else [path_or_glob]
    if not paths:
        raise FileNotFoundError(path_or_glob)
    arrow_schema = OrcReader(paths[0]).schema()
    if columns is not None:
        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)

    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(len(paths))
    _ensure_workers_can_import(pdf)

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from datafusion_orc_spark.format.orc_reader import read_orc

        for b in batches:
            for p in b.column(0).to_pylist():
                table = read_orc(p, columns=columns)
                yield from table.to_batches()

    return pdf.mapInArrow(scan, spark_schema)
