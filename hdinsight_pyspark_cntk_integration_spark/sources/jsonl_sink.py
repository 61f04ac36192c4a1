"""Manifest-committed JSONL sink as a Spark Python DataSource WRITER —
the write-side counterpart of the ``cifar_pickle`` reader
(``sources/cifar_datasource.py``) on the same Spark 4 extension API.

    df.write.format("jsonl_manifest").mode("append") \
        .option("path", "/data/out").save()

Why a manifest: plain task-file output is not atomic — a retried or
speculative task leaves orphan files that a naive directory listing
happily reads (duplicates), and a failed job leaves partial output that
looks complete. This sink implements the two-phase commit the
DataSourceWriter protocol exists for:

* each task writes ``part-<partition>-<uuid>.jsonl`` (uuid per attempt,
  so retries never collide) and returns the file name + row count as
  its commit message;
* ``commit`` runs once on the driver ONLY if every task succeeded and
  writes ``_MANIFEST.json`` listing exactly the committed files (task
  attempts that lost a retry race are absent — their files are inert
  orphans, ignored by every reader);
* ``abort`` removes this attempt's files, leaving a previous manifest
  intact.

Readers go through ``read_jsonl_manifest`` which reads ONLY the
manifest-listed files — the visibility barrier.

Scale notes: one file per partition, streamed row-by-row (bounded
memory); the commit message is (name, count) — driver state is
O(partitions). Values are JSON-encoded with sorted keys; binary is not
supported (JSONL is a text format; parquet remains the columnar path).
Cites the reference's CSV sink role (README.md:217: coalesce(1) CSV
write) — this is the cluster-width, atomically-visible version of
"write results somewhere a downstream tool can read".
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST_NAME = "_MANIFEST.json"


def _json_default(o):
    """Typed JSON fallback — explicit conversions only, no silent str():
    Decimal -> float (JSONL is a float format; keep decimals in parquet
    if exactness matters), date/datetime -> ISO-8601. Anything else
    (e.g. binary) raises with a clear message."""
    import datetime
    import decimal

    if isinstance(o, decimal.Decimal):
        return float(o)
    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    raise TypeError(
        f"jsonl_manifest cannot encode {type(o).__name__}; use parquet for "
        "binary/exotic types"
    )


class _FileCommit(WriterCommitMessage):
    def __init__(self, name: str, rows: int):
        self.name = name
        self.rows = rows


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_manifest requires option 'path'")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(recursive=True), sort_keys=True,
                                    default=_json_default))
                fh.write("\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages) -> None:
        files = sorted(
            ({"name": m.name, "rows": m.rows} for m in messages if m is not None),
            key=lambda f: f["name"],
        )
        manifest = {
            "format": "jsonl_manifest/v1",
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        tmp = os.path.join(self.path, f".{MANIFEST_NAME}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        # rename is the atomicity point (POSIX; object stores would use
        # a conditional put here)
        os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.name))
            except FileNotFoundError:
                pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(dict(self.options), overwrite)


def read_jsonl_manifest(spark, path: str, schema=None):
    """Read back ONLY the manifest-committed files (orphans from lost
    task attempts are invisible). Schema optional; pass one to skip
    inference on wide datasets."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["name"]) for f in manifest["files"]]
    if not files:
        raise ValueError(f"manifest at {path} lists no files")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)
