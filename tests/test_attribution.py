"""q161 attribution invariants the oracle hash can't articulate:
every model must CONSERVE total purchase cents exactly — attribution
re-assigns revenue, it never creates or destroys it."""

from __future__ import annotations

from pyspark.sql import functions as F

from redix_stream_spark.catalog import load_table
from redix_stream_spark.registry import all_queries


def test_q161_every_model_conserves_total_cents(spark, sf_dir):
    total = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    rep = all_queries()["q161_attribution"](spark, sf_dir).collect()
    for model in ("first_touch_cents", "last_touch_cents", "linear_cents"):
        assert sum(r[model] for r in rep) == total, model


def test_q161_channels_are_touch_types_plus_unattributed(spark, sf_dir):
    rep = all_queries()["q161_attribution"](spark, sf_dir).collect()
    assert {r["channel"] for r in rep} <= {"view", "click", "unattributed"}
    # Multi-touch exists in the fixture: linear must differ from last-touch
    # somewhere, or the test data degenerated to single-touch journeys.
    assert any(r["linear_cents"] != r["last_touch_cents"] for r in rep)
