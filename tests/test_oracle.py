"""Cross-check every SQL-expressible query against DuckDB at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from redix_stream_spark import registry

from .conftest import SF_DIR
from .oracle_check import compare

ORACLE = registry.all_oracle_sql()
QUERIES = registry.all_queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck, sf_dir):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(ORACLE[name]).fetchdf()
    problems = compare(spark_df, duck_df)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
