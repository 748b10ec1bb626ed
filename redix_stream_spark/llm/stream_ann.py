"""Incremental ANN: a durable IVF index with streaming ingest.

q43b (llm/similarity.py) demonstrates the IVF pattern end-to-end but
refits its codebook per run — fine for a one-shot query, wrong for a
corpus that grows continuously. This module makes the inverted file a
*stateful component*:

- ``fit``: train the k-means codebook ONCE on a sample and persist it
  (parquet). A codebook is a model artifact — it must stay frozen so
  cell assignments remain comparable across ingest batches.
- ``ingest_batch`` / ``run``: assign each new embedding to its nearest
  centroid (Arrow-batched numpy argmax — map-only, no shuffle; the
  codebook travels in the closure, kilobytes) and append to the index
  **partitioned by cell**, so the directory layout IS the inverted file.
- ``query``: rank cells by centroid similarity, scan only the top
  ``nprobe`` cell partitions (partition-pruned — the scan reads
  nprobe/k of the corpus), exact cosine within, global top-k via
  orderBy+limit (TakeOrdered).

Scale (100 TB): ingest is embarrassingly parallel; the only data the
driver ever holds is the k×dim codebook. Queries touch nprobe partitions
regardless of corpus size. Re-balancing a drifted codebook = fit a new
one and re-ingest into a fresh index directory (versioned side-by-side),
the standard offline reindex.

Cosine convention matches ``similarity.cosine`` (left-fold dot products)
so exact re-ranking agrees bit-for-bit with the batch operators.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..session import ship_package
from .similarity import cosine

#: Matches the testdata embeddings table (label is an int cluster id;
#: vectors are float32 at rest — ``dot`` upcasts per element, so scoring
#: runs in double regardless).
INDEX_SCHEMA = "vec_id long, label int, embedding array<float>, cell int"


class StreamingIvfIndex:
    """A persistent inverted-file ANN index with incremental ingest."""

    def __init__(self, codebook_path: str, index_path: str):
        self.codebook_path = codebook_path
        self.index_path = index_path

    # -- one-time codebook fit -----------------------------------------

    def fit(self, sample: DataFrame, k: int = 8, seed: int = 42) -> None:
        """Train and persist the codebook from a (vec_id, embedding)
        sample. At 100 TB the sample is a tiny fraction of the corpus —
        k-means quality needs thousands of points per cell, not the
        corpus (same rationale as q43b's sample-fit note)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # L2-normalize before training: ingest assignment and query
        # ranking are both cosine, so the codebook must be trained in the
        # same spherical space — Euclidean k-means on unnormalized
        # vectors would split by magnitude, degrading cell quality.
        nrm = F.sqrt(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        unit = F.transform("embedding", lambda x: x.cast("double") / nrm)
        vecs = sample.withColumn("features", array_to_vector(unit))
        model = KMeans(k=k, seed=seed, maxIter=10).fit(vecs.select("features"))
        spark = sample.sparkSession
        centroids = spark.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(model.clusterCenters())
            ],
            "cell int, centroid array<double>",
        )
        centroids.coalesce(1).write.mode("overwrite").parquet(self.codebook_path)

    def centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema("cell int, centroid array<double>").parquet(
            self.codebook_path
        )

    # -- ingest ---------------------------------------------------------

    def ingest_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """Assign cells and append, partitioned by cell (map-only)."""
        spark = batch.sparkSession
        # Executor-closure rule (CLAUDE.md): the pandas_udf below runs
        # worker-side; ship the package so workers resolve imports even
        # when the driver found it via a cwd-only sys.path entry.
        ship_package(spark)
        cents = sorted(
            (r["cell"], r["centroid"]) for r in self.centroids(spark).collect()
        )
        import numpy as np

        mat = np.array([c for _, c in cents])  # k × dim, kilobytes
        mat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cell_ids = np.array([i for i, _ in cents])

        @pandas_udf("int")
        def assign(emb: pd.Series) -> pd.Series:
            v = np.stack(emb.to_numpy())
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            return pd.Series(cell_ids[np.argmax(v @ mat_norm.T, axis=1)])

        (
            batch.select(
                "vec_id", "label", "embedding", assign("embedding").alias("cell")
            )
            .write.mode("append")
            .partitionBy("cell")
            .parquet(self.index_path)
        )

    def run(self, vec_stream: DataFrame, checkpoint_dir: str, **trigger):
        """Attach ingest to a streaming (vec_id, label, embedding) frame."""
        trigger = trigger or {"availableNow": True}
        return (
            vec_stream.writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
            .start()
        )

    # -- query ----------------------------------------------------------

    def query(
        self,
        spark: SparkSession,
        qv: list[float],
        k: int = 10,
        nprobe: int = 3,
    ) -> DataFrame:
        """Top-k by exact cosine within the nprobe nearest cells.

        The cell filter is a partition filter (the index is laid out by
        cell), so the scan reads only the probed directories; the final
        top-k is orderBy+limit (TakeOrdered), never a full rank window.
        """
        qcol = F.lit(qv).cast("array<double>")
        cells = [
            r["cell"]
            for r in self.centroids(spark)
            .select("cell", cosine(F.col("centroid"), qcol).alias("csim"))
            .orderBy(F.col("csim").desc(), "cell")
            .limit(nprobe)
            .collect()
        ]
        idx = spark.read.schema(INDEX_SCHEMA).option(
            "basePath", self.index_path
        ).parquet(self.index_path)
        return (
            idx.filter(F.col("cell").isin(cells))
            .select("vec_id", "label", cosine(F.col("embedding"), qcol).alias("sim"))
            .orderBy(F.col("sim").desc(), "vec_id")
            .limit(k)
        )

    def exists(self) -> bool:
        return os.path.isdir(self.codebook_path) and os.path.isdir(self.index_path)
