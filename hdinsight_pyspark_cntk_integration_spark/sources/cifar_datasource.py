"""CIFAR-10 python-format archives as a first-class Spark data source.

The reference bootstraps its dataset with driver-side code: ``urlretrieve``
the tarball, unpickle the test batch on the driver, ``sc.parallelize`` the
rows (reference README.md:66-84). ``sources.cifar.cifar_batch_df`` keeps
that driver-side path for bootstrap-sized artifacts; this module is the
scaled-out formulation using the public Python DataSource API (Spark 4):

    spark.dataSource.register(CifarPickleDataSource)
    df = spark.read.format("cifar_pickle").load("/data/cifar-*.tar.gz")

The driver plans ONE input partition per (archive, batch member), so the
expensive work — untar, unpickle, uint8 decode — runs on executors in
parallel, and rows cross into the JVM as Arrow RecordBatches (never
per-row Python tuples).

Scale note: ``.tar.gz`` has no random-access index, so member listing
streams each archive once on the driver and every task re-streams up to
its member — acceptable for CIFAR-sized bootstrap archives (tens of MB,
a handful of members), and the member decode is the distributed part.
Petabyte image corpora should not be tarballs at all: land them as
parquet / binaryFile datasets (``sources.io``) instead.

Options:
    path          archive path or glob (also set by ``.load(path)``)
    member_filter substring filter on member names (default: all members;
                  non-batch members are skipped at read time, mirroring
                  ``sources.cifar.read_cifar_archive``)
    arrow_batch_rows rows per emitted RecordBatch (default 2048)
"""

from __future__ import annotations

import glob
import pickle
import tarfile

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "batch string, row_in_batch bigint, image array<int>, label bigint"


class CifarBatchPartition(InputPartition):
    def __init__(self, path: str, member: str):
        self.path = path
        self.member = member


class CifarPickleReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cifar_pickle requires a path (use .load(path))")
        self.path = path
        self.member_filter = options.get("member_filter", "")
        self.arrow_batch_rows = int(options.get("arrow_batch_rows", "2048"))
        if self.arrow_batch_rows < 1:
            raise ValueError(
                f"arrow_batch_rows must be >= 1 (got {self.arrow_batch_rows})"
            )

    def partitions(self):
        paths = sorted(glob.glob(self.path)) or [self.path]
        parts: list[CifarBatchPartition] = []
        for p in paths:
            with tarfile.open(p, "r:*") as tar:
                for member in tar:
                    if member.isfile() and self.member_filter in member.name:
                        parts.append(CifarBatchPartition(p, member.name))
        if not parts:
            raise ValueError(
                f"no members matching {self.member_filter!r} in {self.path!r}"
            )
        return parts

    def read(self, partition: CifarBatchPartition):
        # Heavy imports inside read(): this body runs on executors.
        import numpy as np
        import pyarrow as pa

        with tarfile.open(partition.path, "r:*") as tar:
            fh = tar.extractfile(partition.member)
            if fh is None:
                return
            try:
                batch = pickle.load(fh, encoding="bytes")  # noqa: S301 — local artifact
            except (pickle.UnpicklingError, EOFError):
                return
            if not isinstance(batch, dict) or b"data" not in batch or b"labels" not in batch:
                return
            data = np.asarray(batch[b"data"], dtype=np.uint8)
            labels = np.asarray(batch[b"labels"], dtype=np.int64)
            if labels.shape[0] != data.shape[0]:
                raise ValueError(
                    f"{partition.member}: {data.shape[0]} rows but {labels.shape[0]} labels"
                )
            n, width = data.shape
            for start in range(0, n, self.arrow_batch_rows):
                stop = min(start + self.arrow_batch_rows, n)
                chunk = data[start:stop]
                m = stop - start
                offsets = pa.array(
                    np.arange(0, (m + 1) * width, width, dtype=np.int32)
                )
                images = pa.ListArray.from_arrays(
                    offsets, pa.array(chunk.reshape(-1).astype(np.int32))
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([partition.member] * m),
                        pa.array(np.arange(start, stop, dtype=np.int64)),
                        images,
                        pa.array(labels[start:stop]),
                    ],
                    names=["batch", "row_in_batch", "image", "label"],
                )


class CifarPickleDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cifar_pickle"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CifarPickleReader:
        return CifarPickleReader(dict(self.options))
