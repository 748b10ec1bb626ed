"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders) is the
shuffle of both sides on the join key. Writing both tables bucketed by
that key with the same bucket count lets Spark plan a sort-merge join with
ZERO Exchange — each task reads matching buckets from both sides
(tests/test_bucketing.py asserts the Exchange-free plan).

Bucketing requires a catalog table (``saveAsTable``); Spark's session
catalog with a local warehouse dir works without any Hive service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should scale with the table: at 100 TB you want buckets
    sized to a few hundred MB each so a bucket pair fits one task.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
