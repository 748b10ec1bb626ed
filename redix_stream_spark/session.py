"""SparkSession construction with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); production target is a 1000-executor cluster over ~100 TB.
Every default below is chosen to survive that scale-up:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting), so
  the same plan that runs at sf0.1 re-plans itself at 100 TB.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE coalesces from a deliberately-high initial number instead.
- Arrow enabled for the Pandas-UDF path (the engine's "handler" escape
  hatch, SURVEY.md E26) — Arrow batches are the only acceptable
  Python-boundary transport at scale.
- Session timezone pinned to UTC so event-time semantics are deployment
  independent (the reference's ids are epoch-millis, consumer.ex:301-313 —
  wall-clock-zone-free by construction; we keep that property).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "redix_stream_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster the ``master`` is supplied by spark-submit; locally we
    default to ``local[N]``.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 128 MiB input splits: good parallelism without tiny-task overhead;
        # holds at 100 TB (≈800k splits, well within scheduler limits).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER") and "SPARK_CONNECT_MODE_ENABLED" not in os.environ:
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        # local[N] shares ONE JVM between driver and all N task slots; the
        # 1g spark.driver.memory default gives 32 concurrent tasks ~32 MB
        # each and OOMs on multi-10M-row aggregations (q86 at the 100×
        # documents replica died exactly this way). Size the heap for the
        # slot count; on a cluster spark-submit owns this setting and this
        # branch never runs. Only effective at JVM launch — first
        # get_spark() in the process wins, like the master itself.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune(spark)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The correctness driver supplies its own SparkSession; these confs are
    the subset we depend on for deterministic, oracle-comparable output.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # A vanilla session keeps Spark's default 200 shuffle partitions —
    # pure tiny-task overhead at local test scale (measured: q80's
    # iterative joins 15 s → ~5 s). Override only the untouched default;
    # an explicitly configured value (cluster deployments) is respected.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, cores)))
    ship_package(spark)
    return spark


_shipped_contexts: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``redix_stream_spark`` importable on executor Python workers.

    Closures that reference module-level engine objects (HandlerResult,
    decode stubs, …) pickle those by *reference*; workers then import the
    module — which fails whenever the driver process found the package via
    a sys.path entry the workers don't share (e.g. the correctness driver
    running from another cwd). Shipping a zip via ``addPyFile`` makes the
    import self-contained; on a real cluster this is also exactly how the
    engine reaches 1000 executors without any image baking.
    """
    import hashlib
    import zipfile

    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped_contexts:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    sources = []
    for dirpath, _, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                sources.append((os.path.relpath(full, root), full))
    sources.sort()
    # Content-addressed zip name: a changed package gets a fresh file
    # (pid-based names collide with stale zips when pids recycle).
    digest = hashlib.md5()
    for rel, full in sources:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(), f"redix_stream_spark-{digest.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for rel, full in sources:
                z.write(full, rel)
    sc.addPyFile(zpath)
    _shipped_contexts.add(key)
