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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
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
        # Pushed-down filters narrow this [lo, hi) step-index range
        # BEFORE partition planning — the connector-level analog of
        # parquet row-group pruning.
        self.lo = 0
        self.hi = self.n_rows

    def _clamp_day(self, d: date, op: str) -> None:
        days = (d - self.start).days
        if op in (">=", ">"):
            if op == ">=":
                self.lo = max(self.lo, -(-days // self.step_days))
            else:
                self.lo = max(self.lo, days // self.step_days + 1)
        elif op == "<=":
            self.hi = min(self.hi, days // self.step_days + 1)
        elif op == "<":
            self.hi = min(self.hi, -(-days // self.step_days))
        elif op == "==":
            if days >= 0 and days % self.step_days == 0:
                i = days // self.step_days
                self.lo = max(self.lo, i)
                self.hi = min(self.hi, i + 1)
            else:
                self.hi = self.lo  # no row can match

    def pushFilters(self, filters):
        """Fully handles comparison/equality filters on `day` and
        `step_index` by narrowing the generated index range (exact, so
        the filters are consumed — Spark does not re-evaluate them).
        Anything else is yielded back for post-scan evaluation."""
        ops = {
            GreaterThanOrEqual: ">=",
            GreaterThan: ">",
            LessThanOrEqual: "<=",
            LessThan: "<",
            EqualTo: "==",
        }
        for f in filters:
            op = ops.get(type(f))
            col = f.attribute[-1] if op else None
            if op and col == "day" and isinstance(f.value, date):
                self._clamp_day(f.value, op)
            elif op and col == "step_index" and isinstance(f.value, int):
                v = f.value
                if op == ">=":
                    self.lo = max(self.lo, v)
                elif op == ">":
                    self.lo = max(self.lo, v + 1)
                elif op == "<=":
                    self.hi = min(self.hi, v + 1)
                elif op == "<":
                    self.hi = min(self.hi, v)
                else:
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n_rows = hi - lo
        n = max(1, min(self.num_partitions, max(n_rows, 1)))
        per = -(-n_rows // n) or 1
        return [
            _SpineSlice(i, min(i + per, hi)) for i in range(lo, max(hi, lo + 1), per)
        ] or [_SpineSlice(lo, lo)]

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
    """Idempotent registration of the source on a session. Also
    enables Python-source filter pushdown (off by default; runtime
    conf, harness-proof like load_table's confs)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DateSpineDataSource)
