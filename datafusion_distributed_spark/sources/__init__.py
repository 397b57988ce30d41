"""Source connectors beyond plain ``spark.read``."""

from .work_unit_feed import (
    FilteredWorkUnitFeedDataSource,
    WorkUnitFeedDataSource,
    register_filtered_work_unit_feed,
    register_work_unit_feed,
)

__all__ = [
    "FilteredWorkUnitFeedDataSource",
    "WorkUnitFeedDataSource",
    "register_filtered_work_unit_feed",
    "register_work_unit_feed",
]
