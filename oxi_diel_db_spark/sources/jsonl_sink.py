"""Custom Python DataSource SINK (Spark 4 DataSource API, write side —
the writer twin of sources/poscar.py's reader): shards a DataFrame to
one JSONL file per partition.

The write path a custom exporter needs (feature stores, labeling
tools, downstream trainers that want newline-JSON shards): each task
serializes its partition locally — no driver involvement, no collect —
so the sink scales exactly like the parquet writers. Commit messages
flow back through the standard V2 write protocol (all-or-nothing job
commit is the engine's responsibility, not the sink's).

Cited parity: the reference emits its predictions as a JSON document
map (ml_prediction.py's prediction_result_*.json); this sink is the
distributed form of that export."""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class _ShardWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards sink requires option 'path'")

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return WriterCommitMessage()


class JsonlShardSink(DataSource):
    """``df.write.format("jsonl_shards").option("path", dir).save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite):
        return _ShardWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlShardSink)
