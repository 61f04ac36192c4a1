"""Text-operator unit tests (the bulk of the text family is covered in
test_corpus_golden.py / test_dedup_text.py; this module holds the
per-doc metric hand cases)."""

from hdinsight_pyspark_cntk_integration_spark.operators import text as tx


def test_lexical_diversity_hand_case(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b A c"), (2, "x"), (3, "t t t t")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.lexical_diversity(df).collect()}
    r1 = out[1]  # tokens a b a c -> N=4 V=3
    assert (r1["n_tokens"], r1["n_types"]) == (4, 3)
    assert r1["ttr_micro"] == 750_000
    assert r1["herdan_c_micro"] == math.floor(
        math.log(3.0) / math.log(4.0) * 1e6
    )
    assert r1["guiraud_r_micro"] == 1_500_000
    # single-token doc: TTR/Guiraud defined, Herdan NULL (ln 1 = 0)
    assert out[2]["ttr_micro"] == 1_000_000
    assert out[2]["herdan_c_micro"] is None
    # fully templated doc scores minimal diversity
    assert out[3]["ttr_micro"] == 250_000 and out[3]["n_types"] == 1
