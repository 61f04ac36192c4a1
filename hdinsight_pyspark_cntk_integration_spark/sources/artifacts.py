"""Model/side-car artifact handling (SURVEY.md §2.1 S1, S4-S7).

The reference's artifact lifecycle: idempotent HTTP download
(README.md:66-67, 137), ``sc.addFile`` distribution (README.md:138),
worker-side ``SparkFiles.get`` resolution (README.md:164), OpenCV-XML
mean-matrix parse (README.md:140-143), and ``sc.broadcast`` of the
parsed tensor (README.md:144). Re-expressed here as small utilities; at
cluster scale the preferred path is shared storage (read the artifact
from blob/ABFS inside the UDF's init) — ``addFile`` remains for
driver-local artifacts.
"""

from __future__ import annotations

import os
import urllib.request
import xml.etree.ElementTree as ET

import numpy as np
from pyspark import SparkFiles
from pyspark.sql import SparkSession


def fetch_once(url: str, local_path: str) -> str:
    """S1: idempotent download — skips if the file already exists
    (reference guards the same way, README.md:66)."""
    if not os.path.exists(local_path):
        urllib.request.urlretrieve(url, filename=local_path)  # noqa: S310
    return local_path


def distribute_file(spark: SparkSession, local_path: str) -> str:
    """S4: register a driver-local artifact for shipment to every
    executor (one copy per executor, pulled at first task)."""
    spark.sparkContext.addFile(local_path)
    return os.path.basename(local_path)


def resolve_file(name: str) -> str:
    """S7: worker-side resolution of a distributed artifact — call inside
    a UDF/mapInPandas init section."""
    return SparkFiles.get(name)


def parse_opencv_matrix_xml(path: str, dtype=np.float32) -> np.ndarray:
    """S5: parse an OpenCV-storage XML matrix (<rows>/<cols>/<data>
    elements, as in the reference's CIFAR-10 mean file) into a 2-D array.
    """
    root = ET.parse(path).getroot()  # noqa: S314 — trusted local artifact
    # The matrix element is the first child with <rows>/<cols>/<data> —
    # the real CIFAR-10_mean.xml carries scalar <Channel>/<Row>/<Col>
    # siblings ahead of the <MeanImg type_id="opencv-matrix"> node.
    mat = next(
        (el for el in root if el.find("rows") is not None and el.find("data") is not None),
        None,
    )
    if mat is None:
        raise ValueError(f"no opencv-matrix element (<rows>/<cols>/<data>) in {path}")
    rows = int(mat.find("rows").text)
    cols = int(mat.find("cols").text)
    data = np.array([float(x) for x in mat.find("data").text.split()], dtype=dtype)
    if data.size != rows * cols:
        raise ValueError(f"matrix data size {data.size} != {rows}x{cols}")
    return data.reshape(rows, cols)


def mean_image_chw(flat_mean: np.ndarray, channels: int = 3, height: int = 32, width: int = 32) -> np.ndarray:
    """Reshape a flat mean row to CHW the way the reference does
    (README.md:143: reshape (32,32,3) then transpose (2,0,1))."""
    return (
        flat_mean.reshape((height, width, channels)).transpose((2, 0, 1)).astype(np.float32)
    )


def broadcast_array(spark: SparkSession, arr: np.ndarray):
    """S6: ship a read-only tensor to executors once per executor
    (reference README.md:144). For values under a few MB, plain closure
    capture inside mapInPandas is equivalent — the serialized function is
    itself broadcast."""
    return spark.sparkContext.broadcast(arr)
