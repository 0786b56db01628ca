"""Python *streaming* data source (Spark 4, SPARK-45023 family): replays
the events parquet in fixed row-offset micro-batches through
``SimpleDataSourceStreamReader`` — the streaming sibling of the POSCAR
batch Python DataSource (S3, sources/poscar.py) and the Python
DataSource WRITE sink (S9, sources/jsonl_sink.py). Together the three
close the Python DataSource API matrix: batch read, batch write,
streaming read.

Semantics and scale posture
---------------------------
A *simple* stream reader runs driver-side: ``read(start)`` returns the
batch's rows plus the next offset, and the engine persists the rows to
its own WAL so `readBetweenOffsets` replays are exact on recovery. That
driver-side contract is the right shape for low-volume control-plane
streams (change feeds, manifests, API pages) — the use case the Python
API targets — NOT for 100 TB firehoses, which stay on the JVM
partition-parallel sources (Kafka/files; see streaming/ops.py
read_events_kafka). The offset is a plain row index into an immutable
file, so replays are deterministic by construction.

ts handling: the parquet's nanos/micros timestamp is surfaced as BIGINT
micros (Python DataSource rows cross as plain tuples; integer epochs
avoid tz/precision drift), and the query side rebuilds a session-tz
timestamp with ``timestamp_micros`` — the same normalization contract
as tables.normalize_event_ts.
"""

from __future__ import annotations

try:  # pragma: no cover - import guard mirrors sources/poscar.py
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    HAVE_PYTHON_STREAM_SOURCE = True
except ImportError:  # Spark < 4
    HAVE_PYTHON_STREAM_SOURCE = False


if HAVE_PYTHON_STREAM_SOURCE:

    EVENTS_REPLAY_SCHEMA = (
        "event_id bigint, ts bigint, user_id bigint, "
        "event_type string, value double, props string"
    )

    class EventsReplayDataSource(DataSource):
        """``spark.readStream.format("events_replay")`` with options:

        * ``path`` (required): the events parquet file;
        * ``batchrows`` (default 20000): rows per micro-batch — the
          replay cadence knob (tests use small values to force a
          multi-trigger replay).
        """

        @classmethod
        def name(cls) -> str:
            return "events_replay"

        def schema(self) -> str:
            return EVENTS_REPLAY_SCHEMA

        def simpleStreamReader(self, schema):  # noqa: ARG002 - fixed schema
            return _EventsReplayReader(self.options)

    class _EventsReplayReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("events_replay requires option 'path'")
            self.batch_rows = int(options.get("batchrows", "20000"))
            if self.batch_rows <= 0:
                raise ValueError("batchrows must be positive")
            self._tbl = None

        def _table(self):
            # lazy + cached: the reader object lives for the query's
            # lifetime, so the file is read once per run, not per batch
            if self._tbl is None:
                import pyarrow as pa
                import pyarrow.parquet as pq

                t = pq.read_table(self.path)
                t = t.set_column(
                    t.schema.get_field_index("ts"),
                    "ts",
                    t.column("ts").cast(pa.int64()),
                )
                self._tbl = t
            return self._tbl

        def initialOffset(self) -> dict:
            return {"row": 0}

        def read(self, start: dict):
            tbl = self._table()
            s = int(start["row"])
            e = min(s + self.batch_rows, tbl.num_rows)
            if e <= s:  # drained: empty batch, offset unchanged
                return (iter(()), {"row": s})
            return (self._rows(tbl.slice(s, e - s)), {"row": e})

        def readBetweenOffsets(self, start: dict, end: dict):
            s, e = int(start["row"]), int(end["row"])
            return self._rows(self._table().slice(s, e - s))

        def _rows(self, tbl):
            cols = [
                tbl.column(n).to_pylist()
                for n in ("event_id", "ts", "user_id", "event_type", "value", "props")
            ]
            return iter(zip(*cols))

    def register_events_replay(spark) -> None:
        """Idempotent: re-registering replaces the prior entry, so
        repeated queries() invocations in one driver session are safe."""
        spark.dataSource.register(EventsReplayDataSource)

else:  # pragma: no cover

    def register_events_replay(spark) -> None:
        raise NotImplementedError(
            "Python streaming data sources require Spark 4+ "
            "(pyspark.sql.datasource.SimpleDataSourceStreamReader)"
        )
