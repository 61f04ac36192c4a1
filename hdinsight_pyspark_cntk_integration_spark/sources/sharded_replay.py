"""Partition-planned streaming replay: the PRODUCTION-shaped Python
DataSource stream reader (``DataSourceStreamReader``, Spark 4), completing
the repo's coverage of the Python DataSource API surface:

* batch reader       — ``sources/cifar_datasource.py``
* batch writer       — ``sources/jsonl_sink.py`` (two-phase commit)
* simple stream read — ``streaming/replay_source.py`` (driver-side, test duty)
* planned stream read — THIS: per-microbatch partition planning with
  executor-side reads.

Contrast with the Simple reader (replay_source.py): there the DRIVER
materializes every microbatch — fine for test replay, a non-starter for a
firehose. Here the driver touches only the parquet FOOTER (row count +
row-group boundaries, a metadata-only read); each microbatch is split
into ``slices_per_batch`` :class:`InputPartition` row-ranges, and every
executor task opens the file itself and reads ONLY the row groups
intersecting its range (``ParquetFile.read_row_group``) — the classic
split-planning contract of a real source (Kafka partitions, file
splits), expressed in the Python API.

Offsets are row indexes (``{"index": n}``), so restart/recovery and
exactly-once sink pairing behave like any offset-tracked source: Spark
persists the (start, end] range per microbatch to the checkpoint WAL and
replays identical ranges after a crash (pinned by the parquet-sink
restart test: stop mid-stream, restart on the checkpoint, output is
exactly-once). ``latestOffset`` is by default the constant table end —
see the method comment for why a naive advancing reader-local cursor is
unsafe across restarts on this API. ``max_rows_per_batch`` opts into
bounded ADMISSION: each microbatch advances at most that many rows past
the engine-learned floor, so a long-stopped query drains its backlog as
several bounded commits instead of one whole-backlog transaction.

Usage::

    spark.dataSource.register(ShardedReplayDataSource)
    stream = (spark.readStream.format("sharded_replay")
              .option("path", f"{sf_dir}/events.parquet")
              .option("rows_per_batch", "5000")
              .option("slices_per_batch", "4")
              .load())

Determinism caveat (documented, not hidden): row order within the file
is the replay order — no re-sort happens (sorting would require driver
materialization, exactly what this source exists to avoid). Pair it
with order-insensitive sinks/aggregations, or pre-sort the file.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def _ddl_from_parquet(path: str) -> str:
    """Map the parquet arrow schema to a Spark DDL string. Timestamps of
    any unit/tz map to ``timestamp`` (Spark reads them as micros LTZ —
    same convention the catalog uses); unsupported types raise."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    parts = []
    for field in schema:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t in _ARROW_TO_DDL:
            ddl = _ARROW_TO_DDL[t]
        else:
            raise ValueError(
                f"sharded_replay: unsupported parquet type {t!r} for "
                f"column {field.name!r}"
            )
        parts.append(f"{field.name} {ddl}")
    return ", ".join(parts)


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = int(start)
        self.end = int(end)


class ShardedReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("sharded_replay requires a path (use .load(path))")
        self.path = path
        self.rows_per_batch = int(options.get("rows_per_batch", "5000"))
        self.slices_per_batch = int(options.get("slices_per_batch", "4"))
        # Admission control: bound how far each MICROBATCH advances (0 =
        # unbounded, the constant-latest behavior). rows_per_batch bounds
        # per-TASK ranges within a batch; this bounds the batch itself —
        # after a long stop the backlog drains as many bounded commits
        # instead of one giant transaction.
        self.max_rows_per_batch = int(options.get("max_rows_per_batch", "0"))
        if self.rows_per_batch < 1:
            raise ValueError(
                f"rows_per_batch must be >= 1 (got {self.rows_per_batch})"
            )
        if self.slices_per_batch < 1:
            raise ValueError(
                f"slices_per_batch must be >= 1 (got {self.slices_per_batch})"
            )
        if self.max_rows_per_batch < 0:
            raise ValueError(
                f"max_rows_per_batch must be >= 0 (got {self.max_rows_per_batch})"
            )
        # High-water mark of every offset the ENGINE has shown us
        # (partitions() starts/ends, commit() ends). Restart-safe floor
        # for bounded admission: on recovery the engine re-plans the
        # WAL's last batch via partitions(start, end) BEFORE its first
        # latestOffset call (verified empirically for committed AND
        # uncommitted tails), so the floor is re-learned before we ever
        # answer — a fresh reader can never hand back an offset below
        # the WAL and rewind it (the backward-offset duplicate bug the
        # constant-latest design exists to avoid).
        self._floor = 0
        # Driver-side planning state: FOOTER metadata only — never row data.
        import pyarrow.parquet as pq

        self._n_rows = pq.ParquetFile(self.path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # Default (max_rows_per_batch=0): always the table end —
        # deliberately NOT an advancing planner-local cursor. The
        # microbatch engine starts a batch whenever latestOffset DIFFERS
        # from the current offset (not only when it is greater), so any
        # reader-local cursor that restarts at 0 after a recovery would
        # hand Spark a BACKWARD offset, rewind the WAL, and re-emit
        # committed ranges (observed as duplicates in the restart test
        # before this was fixed). A constant latest is monotone by
        # construction and therefore restart-safe; per-task work stays
        # bounded because partitions() splits the catch-up span into
        # rows_per_batch × slices_per_batch ranges.
        #
        # With max_rows_per_batch set: bounded admission off the floor.
        # The floor only ever comes from offsets the engine itself
        # handed us, so floor + step is always >= the WAL tail — monotone
        # across restarts too (see the __init__ comment for the
        # partitions-before-latestOffset recovery ordering this rests
        # on, pinned by the mid-backlog restart test).
        if self.max_rows_per_batch < 1:
            return {"index": self._n_rows}
        return {"index": min(self._n_rows, self._floor + self.max_rows_per_batch)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        if hi > self._floor or lo > self._floor:
            self._floor = max(hi, lo)
        if hi <= lo:
            return [_RangePartition(self.path, lo, lo)]
        out = []
        pos = lo
        # Cap each slice at rows_per_batch, then split into
        # slices_per_batch tasks for executor parallelism.
        while pos < hi:
            batch_end = min(pos + self.rows_per_batch, hi)
            span = batch_end - pos
            step = max(1, -(-span // self.slices_per_batch))
            s = pos
            while s < batch_end:
                e = min(s + step, batch_end)
                out.append(_RangePartition(self.path, s, e))
                s = e
            pos = batch_end
        return out

    def read(self, partition: _RangePartition):
        """Executor-side: read only the row groups intersecting
        [start, end), slice exactly, yield Arrow record batches."""
        if partition.end <= partition.start:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        md = pf.metadata
        cum = 0
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            rg_lo, rg_hi = cum, cum + n
            cum = rg_hi
            if rg_hi <= partition.start or rg_lo >= partition.end:
                continue  # row-group pruning: skip non-intersecting groups
            tbl = pf.read_row_group(rg)
            lo = max(partition.start - rg_lo, 0)
            hi = min(partition.end - rg_lo, n)
            sliced = tbl.slice(lo, hi - lo)
            for b in sliced.to_batches():
                if b.num_rows:
                    yield b

    def commit(self, end: dict) -> None:
        # Nothing to clean up (static file; the checkpoint WAL is the
        # durable progress record) — but fold the committed offset into
        # the admission floor for good measure.
        idx = int(end["index"])
        if idx > self._floor:
            self._floor = idx


class ShardedReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sharded_replay"

    def schema(self) -> str:
        return _ddl_from_parquet(self.options["path"])

    def streamReader(self, schema) -> ShardedReplayStreamReader:
        return ShardedReplayStreamReader(self.options)
