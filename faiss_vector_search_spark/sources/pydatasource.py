"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the engine-extensibility surface: a connector the DataFrame reader
treats like any built-in format, with partition-parallel reads and
SOURCE-SIDE filter pushdown.

The concrete source here is a deterministic synthetic event generator
(seeded arithmetic per (partition, row) — no RNG state), which stands
in for any external system the reference's users might wire up (a
task queue, a document store, a metrics API). The structure is what
matters:

- ``partitions()`` splits the read into N independent shards → every
  executor generates/fetches its slice; nothing is driver-side.
- ``pushFilters()`` accepts ``event_type = X`` and prunes AT THE
  SOURCE — the Filter node disappears from the Spark plan entirely,
  the connector-side analogue of parquet PushedFilters.

Register per-session with ``spark.dataSource.register`` then
``spark.read.format("synthetic_events")``.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

EVENT_TYPES = ("click", "view", "purchase", "error", "signup")
SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
_EPOCH = datetime(2024, 1, 1)


def _h(i: int) -> int:
    # deterministic 64-bit stream independent of Python's hash seed
    return int.from_bytes(
        hashlib.md5(f"ev{i}".encode()).digest()[:8], "big"
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 4))
        self.type_filter: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and f.value in EVENT_TYPES
            ):
                self.type_filter = f.value
            else:
                yield f  # unsupported → Spark keeps evaluating it

    def partitions(self):
        return [InputPartition(i) for i in range(self.nparts)]

    def read(self, partition):
        per = self.rows // self.nparts
        start = partition.value * per
        end = self.rows if partition.value == self.nparts - 1 else start + per
        for i in range(start, end):
            h = _h(i)
            etype = EVENT_TYPES[h % len(EVENT_TYPES)]
            if self.type_filter is not None and etype != self.type_filter:
                continue  # pruned at the source, never shipped
            yield (
                i,
                _EPOCH + timedelta(seconds=(h >> 3) % 2_592_000),
                (h >> 8) % 1000,
                etype,
                round(((h >> 16) % 100_000) / 1000.0, 3),
                f'{{"shard":{partition.value}}}',
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(dict(self.options))


def register(spark) -> None:
    # pushFilters requires the (default-off) python pushdown flag;
    # runtime conf, scoped to this session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
