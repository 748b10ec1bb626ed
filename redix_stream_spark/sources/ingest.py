"""Multi-format ingestion into the engine (E1/E3 breadth).

The reference's only wire format is the Redis protocol; a Spark-native
engine ingests whatever lands in object storage. These helpers normalize
CSV / JSON-lines / ORC / parquet into DataFrames (and onwards into an
EventLog via ``EventLog.produce_df``), with the schema supplied explicitly
— schema inference is a two-pass scan at 100 TB, so production ingest
always declares its schema (``infer=True`` exists for exploration only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "orc", "json", "csv")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` in the given format with an explicit schema.

    CSV defaults: header on, standard quoting. JSON is JSON-lines (the
    only JSON shape that splits across workers).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; known: {_FORMATS}")
    if schema is None and not infer and fmt in ("json", "csv"):
        raise ValueError(
            f"{fmt} ingest requires an explicit schema (or infer=True for "
            "exploration — inference double-scans the data)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **options}
        if schema is None and infer:
            options["inferSchema"] = "true"
    return reader.options(**options).format(fmt).load(path)


def convert(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    schema: str | None = None,
    partition_cols: list[str] | None = None,
    **options: str,
) -> int:
    """Land a foreign-format dataset as (optionally partitioned) parquet —
    the standard first step of every ingestion pipeline. Returns row count.
    """
    df = read_any(spark, src_path, src_fmt, schema=schema, **options)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dst_path)
    return spark.read.parquet(dst_path).count()
