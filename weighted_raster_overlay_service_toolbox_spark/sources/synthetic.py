"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

A deterministic synthetic-documents source: ``doc_id`` plus an md5
payload, sharded across explicit input partitions. Exists to cover the
custom-connector surface of the engine -- the same API shape a real
connector (REST pager, proprietary format, message queue snapshot) would
implement: ``schema()``, ``partitions()`` (the parallelism contract),
and a per-partition ``read()`` generator.

Scale posture: partition count is the caller's knob; each partition
streams rows lazily (generator), so a 10^9-row synthetic load never
materializes driver-side. Rows are a pure function of ``doc_id``, so the
output is independent of scheduling/partition order -- which is what
makes the source ORACLE-CHECKABLE (DuckDB re-derives it from range()).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, payload string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", "1000"))
        self.num_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        shard = partition.value
        for doc_id in range(shard, self.n, self.num_partitions):
            yield (doc_id, hashlib.md5(str(doc_id).encode()).hexdigest())
