"""Custom Python Data Source (PySpark 4 DataSource API): a distributed
date-spine generator.

The reference's date spines come from BigQuery's
``UNNEST(GENERATE_DATE_ARRAY(...))`` (annotations.py:35-45). The
engine's expression form is ``sources.tables.date_spine`` (S12); this
module is the SOURCE form — the same spine as a first-class
``spark.read.format("date_spine")`` relation with real partition
planning, demonstrating the engine's custom-connector surface:

    spark.dataSource.register(DateSpineDataSource)
    spark.read.format("date_spine")
         .option("start", "2024-01-01").option("stop", "2024-06-30")
         .option("step_days", 7).option("numPartitions", 8).load()

Scale notes: each planner partition covers a contiguous slice of the
date range, so N tasks generate N disjoint slices in parallel with no
driver materialization and no shuffle; a 10-year daily spine is ~3650
rows — the API matters for the pattern (connector with pushed-down
range planning), not the volume.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import DateType, IntegerType, StructField, StructType

SPINE_SCHEMA = StructType(
    [
        StructField("day", DateType(), nullable=False),
        StructField("step_index", IntegerType(), nullable=False),
    ]
)


class _SpineSlice(InputPartition):
    def __init__(self, start_index: int, end_index: int):
        self.start_index = start_index
        self.end_index = end_index  # exclusive


class DateSpineReader(DataSourceReader):
    def __init__(self, options):
        self.start = date.fromisoformat(options["start"])
        self.stop = date.fromisoformat(options["stop"])  # inclusive
        self.step_days = int(options.get("step_days", "7"))
        if self.step_days <= 0:
            raise ValueError("step_days must be positive")
        self.num_partitions = int(options.get("numPartitions", "4"))
        span = (self.stop - self.start).days
        self.n_rows = 0 if span < 0 else span // self.step_days + 1

    def partitions(self):
        n = max(1, min(self.num_partitions, max(self.n_rows, 1)))
        per = -(-self.n_rows // n) or 1
        return [
            _SpineSlice(i, min(i + per, self.n_rows))
            for i in range(0, max(self.n_rows, 1), per)
        ]

    def read(self, partition: _SpineSlice):
        for i in range(partition.start_index, partition.end_index):
            yield (self.start + timedelta(days=i * self.step_days), i)


class DateSpineDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "date_spine"

    def schema(self):
        return SPINE_SCHEMA

    def reader(self, schema):
        return DateSpineReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source on a session."""
    spark.dataSource.register(DateSpineDataSource)
