"""Batch model scoring — the engine's generalization of the reference's
centerpiece operator (SURVEY.md §2.3 M1/M2).

The reference ships a CNTK model to executors with ``sc.addFile``, loads
it once per partition inside ``run_worker``, and calls ``model.eval`` one
image at a time (reference README.md:162-184). That per-record eval is
its documented inefficiency (SURVEY.md §4). Here the same lifecycle is
expressed with ``DataFrame.mapInPandas``:

* iterator-of-batches form → the model loads ONCE per task, before the
  batch loop (the reference's "one partition per worker" trick,
  README.md:76, without hand-setting partition counts);
* inference runs on whole Arrow batches (NumPy matrix ops / BLAS), not
  per row — the order-of-magnitude win BASELINE.md asks for;
* batch width is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so wide image/embedding columns can't blow task memory.

``predict`` is any callable ``(np.ndarray[batch, features]) ->
np.ndarray[batch, classes]`` — a real framework model or the
deterministic linear stub used by the golden tests (FIXTURES.md).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ModelLoader = Callable[[], Callable[[np.ndarray], np.ndarray]]

# ---------------------------------------------------------------------------
# Deterministic stub model (stands in for resnet20_meanimage_159.dnn in
# tests — FIXTURES.md "stub model"). Weight formula uses only integer
# arithmetic + one float division so an ANSI-SQL oracle can reproduce it
# bit-for-bit: w[c][i] = ((c*D + i) * 2654435761 mod 1000003) / 1000003 - 0.5
# ---------------------------------------------------------------------------
_MULT = 2654435761  # Knuth multiplicative-hash constant
_MOD = 1000003


def linear_stub_weight(clazz: int, feature: int, n_features: int) -> float:
    return ((clazz * n_features + feature) * _MULT % _MOD) / _MOD - 0.5


def linear_stub_weights(n_features: int, n_classes: int) -> np.ndarray:
    """(n_classes, n_features) float64 weight matrix, fully deterministic."""
    idx = np.arange(n_classes * n_features, dtype=np.int64).reshape(n_classes, n_features)
    return (idx * _MULT % _MOD) / float(_MOD) - 0.5


def make_linear_stub_loader(n_features: int, n_classes: int) -> ModelLoader:
    """ModelLoader for the stub: 'loading' builds the weight matrix once
    per task, mirroring the reference's once-per-partition
    ``load_model(SparkFiles.get(...))`` (README.md:164)."""

    def loader() -> Callable[[np.ndarray], np.ndarray]:
        w = linear_stub_weights(n_features, n_classes)

        def predict(batch: np.ndarray) -> np.ndarray:
            return batch.astype(np.float64, copy=False) @ w.T

        return predict

    return loader


# ---------------------------------------------------------------------------
# Preprocessing chain P1-P5 (reference README.md:80-85, 154-160) as batch
# NumPy transforms. Each step takes/returns (batch, ...) float arrays.
# ---------------------------------------------------------------------------
def reshape_hwc(batch: np.ndarray, channels: int = 3, height: int = 32, width: int = 32) -> np.ndarray:
    """P1: flat (N, C*H*W) CIFAR rows → (N, H, W, C) HWC images
    (reference ``reshape_image``: reshape(3,32,32).transpose(1,2,0),
    README.md:80-82)."""
    return batch.reshape(-1, channels, height, width).transpose(0, 2, 3, 1)


def cast_float32(batch: np.ndarray) -> np.ndarray:
    """P2: ``astype(np.float32)`` (README.md:156)."""
    return batch.astype(np.float32, copy=False)


def rgb_to_bgr(batch: np.ndarray) -> np.ndarray:
    """P3: channel reverse ``[:, :, ::-1]`` on HWC batches (README.md:157)."""
    return batch[..., ::-1]


def hwc_to_chw(batch: np.ndarray) -> np.ndarray:
    """P4: transpose to CHW + contiguify (README.md:158)."""
    return np.ascontiguousarray(batch.transpose(0, 3, 1, 2))


def subtract_mean(batch: np.ndarray, mean_image: np.ndarray) -> np.ndarray:
    """P5: broadcast mean-image subtraction (README.md:159,165). The mean
    ships inside the task closure — small constants don't need an explicit
    ``sc.broadcast`` under mapInPandas, Spark broadcasts the serialized
    function once per executor."""
    return batch - mean_image


def cifar_preprocess(flat_batch: np.ndarray, mean_chw: np.ndarray | None = None) -> np.ndarray:
    """Full reference chain on a flat (N, 3072) batch → flat (N, 3072)
    float32 ready for a linear/conv scorer, reproducing README.md:154-160:
    reshape→HWC, cast f32, RGB→BGR, HWC→CHW, mean-subtract."""
    x = reshape_hwc(flat_batch)
    x = cast_float32(x)
    x = rgb_to_bgr(x)
    x = hwc_to_chw(x)
    if mean_chw is not None:
        x = subtract_mean(x, mean_chw)
    return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# The scoring operator
# ---------------------------------------------------------------------------
def score(
    df: DataFrame,
    model_loader: ModelLoader,
    input_col: str,
    pass_through: Sequence[str] = (),
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
    scores_col: str | None = None,
    pred_col: str = "predicted_label",
    repartition: int | str | None = None,
) -> DataFrame:
    """Distributed batch inference over an ``array<float>`` column.

    Plan shape: FileScan → ArrowEvalPython(mapInPandas) — single stage, no
    shuffle; Catalyst prunes unused columns before the Python boundary
    (the reference does this pruning by hand, yielding only
    ``(label, pred)`` before collect — README.md:174).

    Returns ``pass_through`` columns + ``pred_col`` (long, argmax of class
    scores = M2) and optionally the raw score vector.
    """
    pass_through = list(pass_through)
    out_fields = [f"{c} {df.schema[c].dataType.simpleString()}" for c in pass_through]
    out_fields.append(f"{pred_col} long")
    if scores_col:
        out_fields.append(f"{scores_col} array<double>")
    out_schema = ", ".join(out_fields)

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Load once per task, before the batch loop — M1's amortization.
        predict = model_loader()
        for pdf in batches:
            x = np.stack(pdf[input_col].to_numpy())
            if preprocess is not None:
                x = preprocess(x)
            scores = np.asarray(predict(x), dtype=np.float64)
            out = {c: pdf[c] for c in pass_through}
            out[pred_col] = scores.argmax(axis=1).astype(np.int64)
            if scores_col:
                out[scores_col] = list(scores)
            yield pd.DataFrame(out)

    cols_needed = [*pass_through, input_col]
    narrow = df.select(*cols_needed)
    # The reference hand-tunes one partition per worker (README.md:76);
    # the inverse problem matters for small sources: one parquet file
    # arrives as ONE partition, serializing inference on one core.
    # "auto" repartitions ONLY when the input is narrower than the core
    # count; an explicit int forces that count; None never shuffles (big
    # scans already have file-split parallelism, and a shuffle of the
    # full input ahead of inference would dominate at scale).
    if repartition == "auto":
        par = df.sparkSession.sparkContext.defaultParallelism
        if narrow.rdd.getNumPartitions() < par:
            narrow = narrow.repartition(par)
    elif repartition:
        narrow = narrow.repartition(repartition)
    return narrow.mapInPandas(run_batches, schema=out_schema)


# ---------------------------------------------------------------------------
# Alternative scoring surfaces
# ---------------------------------------------------------------------------
def score_with_predict_batch_udf(
    df: DataFrame,
    model_loader: ModelLoader,
    input_col: str,
    n_features: int,
    n_classes: int | None = None,
    pass_through: Sequence[str] = (),
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
    pred_col: str = "predicted_label",
    batch_size: int = 1024,
) -> DataFrame:
    """M1/M2 via ``pyspark.ml.functions.predict_batch_udf`` (SURVEY §2.3's
    alternative surface) — same semantics as ``score``: model loaded once
    per task via ``make_predict_fn``, Arrow-batched inference, argmax
    postprocess. Column-expression form, so it composes with arbitrary
    projections; ``score``'s mapInPandas form remains the primary path
    (it can emit multiple columns without re-invoking the model).

    ``n_features`` is the fixed width of the ``array<float>`` input column:
    predict_batch_udf treats array columns as tensor columns and requires
    ``input_tensor_shapes``, so batches arrive as dense (batch, n_features)
    ndarrays. ``n_classes``, when given, validates the model's score-vector
    width on the first batch.
    """
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType

    def make_predict_fn():
        predict = model_loader()

        def predict_fn(inputs: np.ndarray) -> np.ndarray:
            x = np.stack(inputs) if inputs.dtype == object else inputs
            if preprocess is not None:
                x = preprocess(x)
            scores = np.asarray(predict(x), dtype=np.float64)
            if n_classes is not None and scores.shape[1] != n_classes:
                raise ValueError(
                    f"model emitted {scores.shape[1]} classes, expected {n_classes}"
                )
            return scores

        return predict_fn

    scores_udf = predict_batch_udf(
        make_predict_fn,
        return_type=ArrayType(DoubleType()),
        batch_size=batch_size,
        input_tensor_shapes=[[n_features]],
    )
    from hdinsight_pyspark_cntk_integration_spark.functions.vector import argmax_index

    scored = df.select(*pass_through, scores_udf(F.col(input_col)).alias("_scores"))
    return scored.select(
        *pass_through, argmax_index(F.col("_scores")).cast("long").alias(pred_col)
    )


def make_onnx_loader(model_path: str, input_name: str | None = None) -> ModelLoader:
    """ModelLoader for an ONNX model via onnxruntime (the public-runtime
    stand-in for the reference's CNTK ``.dnn`` load, README.md:162-184).
    Import-gated: this container ships no onnxruntime, so construction
    raises with a clear message there; the loader contract and the
    session-per-task lifecycle are what the engine guarantees.

    The returned loader opens one ``InferenceSession`` per task (the M1
    amortization) and feeds float32 batches to the model's first input.
    """
    try:
        import onnxruntime  # noqa: F401
    except ImportError as exc:  # pragma: no cover - absent in this container
        raise ImportError(
            "onnxruntime is not installed; make_onnx_loader needs it. "
            "Use make_linear_stub_loader for the deterministic test model."
        ) from exc

    def loader() -> Callable[[np.ndarray], np.ndarray]:
        import onnxruntime as ort

        sess = ort.InferenceSession(model_path, providers=["CPUExecutionProvider"])
        name = input_name or sess.get_inputs()[0].name

        def predict(batch: np.ndarray) -> np.ndarray:
            out = sess.run(None, {name: batch.astype(np.float32, copy=False)})
            return np.asarray(out[0], dtype=np.float64)

        return predict

    return loader
