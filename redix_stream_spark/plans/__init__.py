"""Plan-level utilities: physical-plan inspection, bucketed co-located
joins, and skew mitigation — the knobs that matter at 100 TB."""

from .inspect import formatted_plan, has_operator
from .bucketing import write_bucketed, read_bucketed
from .skew import salted_join

__all__ = [
    "formatted_plan",
    "has_operator",
    "write_bucketed",
    "read_bucketed",
    "salted_join",
]
