"""Physical-plan inspection helpers.

The engine's performance contract is expressed as plan assertions
(tests/test_plans.py): filters pushed to scans, dimensions broadcast,
no cartesian products, top-k via TakeOrdered. These helpers make the
formatted plan available to library code and tests alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as .explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)
