"""CIFAR-shaped archive ingest (SURVEY.md §2.1, the S2 tail).

The reference downloads ``cifar-10-python.tar.gz``, unpickles the test
batch on the driver, and ``sc.parallelize``s the rows (reference
README.md:69-84). Same semantics here: the archive is a small bootstrap
artifact (CIFAR's test batch is ~30 MB), so driver-side untar+unpickle
followed by an Arrow ``createDataFrame`` with an explicit partition
count is the right plan — the expensive part (preprocess + inference)
then runs distributed at full parallelism. Production-scale image
corpora do NOT go through this path: they land as parquet / binaryFile
datasets read distributed (``sources.io``); this loader exists for
reference-format parity and golden tests.

Batch dict format (CIFAR-10 python version): pickled ``dict`` with
``b'data'`` — uint8 array (N, 3072), rows flat in C-major (C,H,W) order
— and ``b'labels'`` — list of N ints. That flat layout is exactly what
``operators.scoring.reshape_hwc`` (P1) expects.
"""

from __future__ import annotations

import pickle
import tarfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_cifar_archive(
    path: str, member_filter: str = ""
) -> Iterator[tuple[str, np.ndarray, list[int]]]:
    """Stream (member_name, data (N,3072) uint8, labels) from a CIFAR-10
    python-format tar(.gz) archive. ``member_filter`` selects members by
    substring (e.g. ``"test_batch"``); batch dicts are recognized by
    their ``b'data'``/``b'labels'`` keys, other members are skipped."""
    with tarfile.open(path, "r:*") as tar:
        for member in tar:
            if not member.isfile() or member_filter not in member.name:
                continue
            fh = tar.extractfile(member)
            if fh is None:
                continue
            try:
                batch = pickle.load(fh, encoding="bytes")  # noqa: S301 — local artifact
            except (pickle.UnpicklingError, EOFError):
                continue
            if not isinstance(batch, dict) or b"data" not in batch:
                continue
            data = np.asarray(batch[b"data"], dtype=np.uint8)
            labels = [int(x) for x in batch[b"labels"]]
            yield member.name, data, labels


def cifar_batch_df(
    spark: SparkSession,
    path: str,
    member_filter: str = "test_batch",
    num_slices: int | None = None,
) -> DataFrame:
    """Load matching archive batches into a DataFrame
    ``(row_id long, image array<int>, label long)`` — the reference's
    ``sc.parallelize(zip(data, labels))`` (README.md:84) in DataFrame
    form. ``row_id`` is the 0-based position across batches (stable join
    key for golden comparisons). ``num_slices`` defaults to the session's
    default parallelism so downstream ``mapInPandas`` scoring never
    serializes on one core."""
    datas: list[np.ndarray] = []
    labels: list[int] = []
    for _, data, labs in read_cifar_archive(path, member_filter):
        if len(labs) != data.shape[0]:
            raise ValueError(f"batch has {data.shape[0]} rows but {len(labs)} labels")
        datas.append(data)
        labels.extend(labs)
    if not datas:
        raise ValueError(f"no CIFAR batch members matching {member_filter!r} in {path}")
    all_data = np.concatenate(datas)
    pdf = pd.DataFrame(
        {
            "row_id": np.arange(len(labels), dtype=np.int64),
            "image": [row.astype(np.int32) for row in all_data],
            "label": np.asarray(labels, dtype=np.int64),
        }
    )
    n = num_slices or spark.sparkContext.defaultParallelism
    return spark.createDataFrame(pdf).repartition(n)
