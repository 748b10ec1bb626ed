"""Partitioned sink writer (E3 at scale).

The reference's only sink is XADD (append one message). At 100 TB the
at-rest layout decides query cost: hive-style partitioning by a
low-cardinality time/source key gives partition pruning for free to every
downstream scan, and per-partition file sizing avoids the small-file and
giant-file failure modes both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``.

    The repartition on the partition columns routes each output partition's
    rows to ``files_per_partition`` tasks, so the layout is
    #partitions × files_per_partition files — not #tasks × #partitions
    (the accidental-small-files shape a naive ``partitionBy`` produces).
    """
    from pyspark.sql import functions as F

    keys = [F.col(c) for c in partition_cols]
    (
        df.repartition(files_per_partition * 8, *keys)
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
