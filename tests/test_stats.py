"""Two-sample nonparametric statistics (operators.stats): scipy-free
exactness checks against hand-computable cases plus the built-in
algebraic self-checks."""

from __future__ import annotations

from hdinsight_pyspark_cntk_integration_spark.operators import stats as st


def test_mann_whitney_u_known_case(spark):
    # classic textbook case: A = {1,2,3}, B = {4,5,6} -> U_A = 0, U_B = 9
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [("b", v) for v in (4.0, 5.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = st.mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert (r["n_a"], r["n_b"], r["u_a"], r["u_b"]) == (3, 3, 0.0, 9.0)


def test_mann_whitney_u_ties_and_identity(spark):
    # ties across groups use average ranks; U_a + U_b == n_a * n_b always
    rows = [("a", v) for v in (1.0, 2.0, 2.0)] + [("b", v) for v in (2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = st.mann_whitney_u(df, "g", "v", "a", "b").collect()
    assert r["u_a"] + r["u_b"] == r["n_a"] * r["n_b"]
    # ranks: 1, then three 2.0s share (2+3+4)/3 = 3, then 5
    # R_a = 1 + 3 + 3 = 7 -> U_a = 7 - 3*4/2 = 1
    assert r["u_a"] == 1.0


def test_mann_whitney_partition_invariance(spark):
    import numpy as np

    rng = np.random.default_rng(6)
    rows = [("a", float(v)) for v in rng.integers(0, 50, 500)] + [
        ("b", float(v)) for v in rng.integers(10, 60, 400)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r1 = st.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    r2 = st.mann_whitney_u(df.repartition(13), "g", "v", "a", "b").collect()[0]
    assert (r1["u_a"], r1["u_b"]) == (r2["u_a"], r2["u_b"])


def test_ks_statistic_disjoint_and_identical(spark):
    disjoint = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0)], "g string, v double"
    )
    [r] = st.ks_statistic(disjoint, "g", "v", "a", "b").collect()
    assert r["ks_d"] == 1.0
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    [r2] = st.ks_statistic(same, "g", "v", "a", "b").collect()
    assert r2["ks_d"] == 0.0


def test_spearman_matches_scipy_free_reference(spark):
    """Perfect monotone -> 1; perfect inverse -> -1; pandas parity on a
    tied random case (pandas' spearman uses the same average-rank
    definition)."""
    import numpy as np
    import pandas as pd

    from hdinsight_pyspark_cntk_integration_spark.operators import stats as st

    mono = spark.createDataFrame(
        [("g", float(i), float(i * i)) for i in range(1, 30)],
        "k string, x double, y double",
    )
    [r] = st.spearman_corr(mono, "k", "x", "y").collect()
    assert abs(r["spearman"] - 1.0) < 1e-12
    inv = spark.createDataFrame(
        [("g", float(i), float(-i)) for i in range(1, 30)],
        "k string, x double, y double",
    )
    [r2] = st.spearman_corr(inv, "k", "x", "y").collect()
    assert abs(r2["spearman"] + 1.0) < 1e-12

    rng = np.random.default_rng(8)
    xs = rng.integers(0, 15, 400).astype(float)  # heavy ties
    ys = xs * 2 + rng.integers(0, 10, 400).astype(float)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(xs, ys)],
        "k string, x double, y double",
    ).repartition(9)
    [r3] = st.spearman_corr(df, "k", "x", "y").collect()
    # scipy-free reference: Pearson on average ranks IS Spearman
    rx = pd.Series(xs).rank(method="average")
    ry = pd.Series(ys).rank(method="average")
    expected = rx.corr(ry)
    assert abs(r3["spearman"] - expected) < 1e-9


def test_cusum_changepoint_locates_planted_shift(spark):
    import datetime as _dt

    from hdinsight_pyspark_cntk_integration_spark.operators import stats as st

    base = _dt.datetime(2024, 5, 1)
    # level 10.0 for 30 steps, then 20.0 for 30 steps: |cusum| peaks at
    # the last pre-shift row (median splits the two levels)
    rows = [
        (1, i, base + _dt.timedelta(minutes=i), 10.0 if i < 30 else 20.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    [r] = st.cusum_changepoint(
        df, "user_id", ["ts", "event_id"], "value", "event_id"
    ).collect()
    assert r["changepoint_id"] == 29
    assert r["cusum"] < 0  # below-median run accumulates negative


def test_mad_outliers_robust_to_extreme_value(spark):
    """The property z-scores lack: ONE extreme value inflates stddev
    (shrinking everyone's z) but barely moves the median/MAD, so the
    spike is still flagged and nothing else is; constant groups and
    MAD=0 groups emit nothing."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as st

    rows = (
        [("g", float(v)) for v in (10, 11, 12, 13, 14, 15, 16, 17, 18, 19)]
        + [("g", 1_000_000.0)]           # the spike
        + [("const", 5.0)] * 20          # MAD = 0: emit nothing
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    got = st.mad_outliers(df, "grp", "v", k=3.0).collect()
    assert [r["v"] for r in got] == [1_000_000.0]
    assert got[0]["grp"] == "g"
    assert got[0]["robust_score"] > 1000
    # partition invariance
    got7 = st.mad_outliers(df.repartition(7), "grp", "v", k=3.0).collect()
    assert [r["v"] for r in got7] == [1_000_000.0]
