"""Deterministic replay of a parquet event table as a streaming source.

Testing a Structured Streaming pipeline needs a source that (a) replays
the SAME rows in the SAME order every run and (b) supports exact
batch-vs-stream twin checks. File sources need directory choreography and
rate sources are nondeterministic; this is a Python DataSource
(``SimpleDataSourceStreamReader``, Spark 4) that replays a parquet table
in a stable order in fixed-size microbatches:

    spark.dataSource.register(EventsReplayDataSource)
    stream = (spark.readStream.format("events_replay")
              .option("path", f"{sf_dir}/events.parquet")
              .option("order_by", "ts,event_id")
              .option("rows_per_batch", "5000")
              .load())

Offsets are plain row indexes into the ordered table ({"index": n}), so
restarts resume exactly and ``readBetweenOffsets`` re-yields a committed
batch deterministically — the replay equivalent of a Kafka offset pair.

Scale note: the Simple reader API reads on the DRIVER (no partition
planning) — by design for replay/testing duty where input rate is small.
A production firehose belongs on Kafka/file sources or the full
``DataSourceStreamReader`` with partition planning.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("events_replay requires a path (use .load(path))")
        self.path = path
        self.rows_per_batch = int(options.get("rows_per_batch", "5000"))
        if self.rows_per_batch < 1:
            raise ValueError(f"rows_per_batch must be >= 1 (got {self.rows_per_batch})")
        self.order_by = [
            c.strip() for c in options.get("order_by", "").split(",") if c.strip()
        ]
        self._table = None  # lazy; lives on the driver only

    def _ordered_table(self):
        if self._table is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path)
            if self.order_by:
                t = t.sort_by([(c, "ascending") for c in self.order_by])
            # Pin column order to the declared schema — parquet physical
            # order is not a contract.
            self._table = t.select(
                ["event_id", "ts", "user_id", "event_type", "value", "props"]
            )
        return self._table

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _slice_rows(self, start: int, stop: int):
        t = self._ordered_table()
        stop = min(stop, t.num_rows)
        if stop <= start:
            return iter(()), start
        cols = [c.to_pylist() for c in t.slice(start, stop - start).columns]
        return iter(list(zip(*cols))), stop

    def read(self, start: dict):
        rows, stop = self._slice_rows(start["index"], start["index"] + self.rows_per_batch)
        return rows, {"index": stop}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._slice_rows(start["index"], end["index"])
        return rows

    def commit(self, end: dict) -> None:
        pass


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        # Matches the events fixture (TESTDATA.md); ts stays LTZ to line
        # up with sources.catalog's reader settings.
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )

    def simpleStreamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(dict(self.options))
