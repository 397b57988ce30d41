"""Work-unit-feed source: runtime-discovered work descriptors drive the scan.

Reference analogue: a leaf scan driven by work units (file URLs, API pages,
queue offsets) discovered on the coordinator at runtime and streamed to
workers (/root/reference/src/work_unit_feed/work_unit.rs:4-48,
docs/source/advanced/04-work-unit-feeds.md, tests/work_unit_feed.rs).

SURVEY.md §1.4 maps this onto the Spark 4 Python DataSource API: the
``partitions()`` call runs on the DRIVER (== the reference's coordinator-side
``WorkUnitFeedProvider``) and returns one ``InputPartition`` per discovered
work unit; each executor task then materializes only its own unit in
``read()`` (== the reference worker pulling its ``WorkUnit``). Data returns
as Arrow RecordBatches — the same Arrow-batch plane the reference streams
over Flight.

Work units here are (file, row_start, row_count) descriptors over parquet,
discovered from footers at plan time. At 100 TB the same structure holds:
discovery is metadata-only (footers / a queue / an API listing), and each
task reads one bounded unit; nothing data-scale ever touches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class WorkUnit(InputPartition):
    """One discovered unit of scan work (reference: WorkUnit, work_unit.rs:4-17)."""

    path: str
    row_group: int
    row_start: int
    row_count: int


class WorkUnitFeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("work_unit_feed requires a 'path' option")
        self.rows_per_unit = int(options.get("rows_per_unit", "0"))

    def partitions(self):
        """DRIVER-side work discovery — the WorkUnitFeedProvider role.

        Enumerates row groups from parquet footers (metadata-only, no data
        read), optionally sub-splitting into fixed row ranges so one file
        still fans out to many tasks."""
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(self.path)) or [self.path]
        units: list[WorkUnit] = []
        for f in files:
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                n = meta.row_group(rg).num_rows
                step = self.rows_per_unit if self.rows_per_unit > 0 else n
                for start in range(0, n, step):
                    units.append(WorkUnit(f, rg, start, min(step, n - start)))
        return units

    def read(self, partition: WorkUnit):
        """Executor-side: materialize exactly one work unit as Arrow batches."""
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read_row_group(partition.row_group)
        yield from table.slice(partition.row_start, partition.row_count).to_batches()


class WorkUnitFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "work_unit_feed"

    def schema(self):
        import glob

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        files = sorted(glob.glob(path)) or [path]
        arrow_schema = pq.ParquetFile(files[0]).schema_arrow
        return from_arrow_schema(arrow_schema.remove_metadata())

    def reader(self, schema) -> WorkUnitFeedReader:
        return WorkUnitFeedReader(self.options)


def register_work_unit_feed(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(WorkUnitFeedDataSource)
