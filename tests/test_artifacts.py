"""Artifact lifecycle S1, S4-S7: idempotent fetch, OpenCV-XML matrix
parse, addFile/SparkFiles distribution, broadcast use inside scoring."""

from __future__ import annotations

import numpy as np

from hdinsight_pyspark_cntk_integration_spark.operators import scoring as sc
from hdinsight_pyspark_cntk_integration_spark.sources import artifacts as art

# Same structure as the reference's OpenCV storage XML (a 1xN float
# matrix under <MeanImg><rows|cols|dt|data>), with synthetic values.
_XML = """<?xml version="1.0"?>
<opencv_storage>
<MeanImg type_id="opencv-matrix">
  <rows>1</rows>
  <cols>12</cols>
  <dt>f</dt>
  <data>
    1.5 2.5 3.5 4.5 5.5 6.5 7.5 8.5 9.5 10.5 11.5 12.5</data>
</MeanImg>
</opencv_storage>
"""


def test_parse_opencv_matrix(tmp_path):
    p = tmp_path / "mean.xml"
    p.write_text(_XML)
    mat = art.parse_opencv_matrix_xml(str(p))
    assert mat.shape == (1, 12)
    assert mat.dtype == np.float32
    assert mat[0, 0] == 1.5 and mat[0, 11] == 12.5
    chw = art.mean_image_chw(mat[0], channels=3, height=2, width=2)
    assert chw.shape == (3, 2, 2)
    # HWC->CHW transpose semantics: flat[(h*W+w)*C + c] == chw[c,h,w]
    assert chw[0, 0, 0] == 1.5 and chw[1, 0, 0] == 2.5 and chw[0, 0, 1] == 4.5


def test_fetch_once_idempotent(tmp_path):
    p = tmp_path / "artifact.bin"
    p.write_bytes(b"existing")
    # must NOT re-download (the URL is unreachable — guard short-circuits)
    out = art.fetch_once("http://127.0.0.1:1/never", str(p))
    assert out == str(p)
    assert p.read_bytes() == b"existing"


def test_addfile_resolution_inside_scoring(spark, tmp_path):
    """S4+S7 end to end: weights distributed via addFile, resolved with
    SparkFiles.get inside the mapInPandas init — the reference's exact
    model lifecycle (README.md:138,164) on the new scoring operator."""
    w = sc.linear_stub_weights(8, 3)
    p = tmp_path / "model_weights.npy"
    np.save(p, w)
    name = art.distribute_file(spark, str(p))

    def loader():
        weights = np.load(art.resolve_file(name))

        def predict(batch):
            return batch.astype(np.float64) @ weights.T

        return predict

    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 8))
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(50)], "rid long, vec array<float>"
    )
    out = sc.score(df, loader, input_col="vec", pass_through=["rid"]).toPandas()
    expected = (np.stack([x[i] for i in range(50)]).astype(np.float64) @ w.T).argmax(1)
    got = out.sort_values("rid")["predicted_label"].to_numpy()
    # float32 round-trip of the array column can flip near-ties; require match
    assert (got == expected).mean() >= 0.95


def test_broadcast_mean_in_preprocess(spark):
    mean = np.full((3, 2, 2), 1.0, dtype=np.float32)
    bc = art.broadcast_array(spark, mean)

    def loader():
        m = bc.value

        def predict(batch):
            # batch arrives flat (N, 12); subtract broadcast mean in CHW
            x = batch.reshape(-1, 3, 2, 2) - m
            return x.reshape(x.shape[0], -1)[:, :2]  # 2 fake classes

        return predict

    df = spark.createDataFrame(
        [(0, [2.0] * 12), (1, [0.5] * 12)], "rid long, vec array<float>"
    )
    out = sc.score(df, loader, input_col="vec", pass_through=["rid"], scores_col="s").toPandas()
    s0 = out.sort_values("rid")["s"].iloc[0]
    assert np.allclose(s0, [1.0, 1.0])  # 2.0 - broadcast 1.0
