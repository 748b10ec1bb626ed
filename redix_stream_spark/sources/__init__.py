"""Custom data sources (SURVEY.md §7 phase 4)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_eventlog_source(spark: SparkSession) -> None:
    """Register format("eventlog") (reader + writer halves).

    Two distribution mechanisms, because Spark runs the class in two kinds
    of Python workers: executors (covered by ``ship_package``'s addPyFile)
    and the driver-side streaming *planner* runner, which does NOT see
    pyFiles — for that one the module is registered for cloudpickle
    pickle-by-value, so the class travels inside the pickle itself and no
    worker ever needs to import the package.
    """
    from pyspark import cloudpickle

    from ..session import ship_package
    from . import eventlog_source

    ship_package(spark)
    cloudpickle.register_pickle_by_value(eventlog_source)
    spark.dataSource.register(eventlog_source.EventLogDataSource)
