"""Source connectors beyond plain ``spark.read``."""

from .work_unit_feed import WorkUnitFeedDataSource, register_work_unit_feed

__all__ = ["WorkUnitFeedDataSource", "register_work_unit_feed"]
