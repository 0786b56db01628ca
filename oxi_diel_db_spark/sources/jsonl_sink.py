"""Custom Python DataSource SINK (Spark 4 DataSource API, write side —
the writer twin of sources/poscar.py's reader): shards a DataFrame to
one JSONL file per partition.

The write path a custom exporter needs (feature stores, labeling
tools, downstream trainers that want newline-JSON shards): each task
serializes its partition locally — no driver involvement, no collect —
so the sink scales exactly like the parquet writers.

Commit protocol: tasks write to job+attempt-unique TEMP files and
return the temp path in their WriterCommitMessage; only the driver's
``commit()`` moves the winning attempt's file into place (and
``abort()`` deletes this job's temps). This is what makes the sink
safe under speculative execution and task retries — two attempts for
the same partition never touch the same file, and a failed job leaves
no output that looks committed. ``overwrite`` (``mode("overwrite")``)
replaces each part file atomically (``os.replace``) and then removes
stale parts the new job didn't produce; renames happen BEFORE stale
deletion, so a crash mid-commit leaves the new output complete plus
possibly some stale extras — never a window where old output is gone
and new output is partial. (Directory-level atomicity — all-or-nothing
across shards — is the committer's job on a real cluster: swap in
Hadoop's FileOutputCommitter v1 semantics or an Iceberg/Delta
transactional sink there; this local sink documents per-file atomicity
only.)

Cited parity: the reference emits its predictions as a JSON document
map (ml_prediction.py's prediction_result_*.json); this sink is the
distributed form of that export."""

from __future__ import annotations

import glob
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _ShardCommit(WriterCommitMessage):
    temp_path: str
    final_name: str


class _ShardWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.overwrite = overwrite
        # Job-unique token, generated driver-side and pickled to every
        # task: temp-file names carry it, so commit()/abort() cleanup
        # globs touch ONLY this job's temps — a concurrent job writing
        # to the same directory keeps its in-flight attempts.
        self.job_token = uuid.uuid4().hex[:12]
        if not self.path:
            raise ValueError("jsonl_shards sink requires option 'path'")

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        final_name = f"part-{pid:05d}.jsonl"
        # Job+attempt-unique temp name: concurrent speculative attempts
        # for the same partition write disjoint files; commit() picks one.
        tmp = os.path.join(
            self.path, f"_temp-{self.job_token}-{final_name}.{attempt}"
        )
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
        return _ShardCommit(temp_path=tmp, final_name=final_name)

    def commit(self, messages):
        # 1. Rename winning temps into place FIRST (os.replace is atomic
        #    per file and also overwrites same-named stale parts)...
        committed = set()
        for m in messages:
            if m is None:
                continue
            os.replace(m.temp_path, os.path.join(self.path, m.final_name))
            committed.add(m.final_name)
        # 2. ...THEN drop stale parts a previous job wrote that this one
        #    didn't: new output is already complete if we crash between
        #    the two steps (old ordering lost old output first).
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if os.path.basename(old) not in committed:
                    os.remove(old)
        # 3. Losing speculative attempts leave temps with no commit
        #    message — scoped to THIS job's token.
        self._clean_temps()

    def abort(self, messages):
        self._clean_temps()

    def _clean_temps(self):
        for stray in glob.glob(
            os.path.join(self.path, f"_temp-{self.job_token}-part-*")
        ):
            try:
                os.remove(stray)
            except OSError:
                pass


class JsonlShardSink(DataSource):
    """``df.write.format("jsonl_shards").option("path", dir).save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite):
        return _ShardWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlShardSink)
