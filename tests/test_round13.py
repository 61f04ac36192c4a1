"""Round-13 operator unit tests: hand-computed goldens on tiny frames
for the multiple-testing / reliability / drift / inequality /
keyword-contrast / rank-overlap / matching / allocation additions.
(The sf-level oracle parity gate covers the full-scale behavior; these
pin the math on inputs small enough to verify by hand.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdinsight_pyspark_cntk_integration_spark.operators import mining as mn
from hdinsight_pyspark_cntk_integration_spark.operators import pipeline as pl
from hdinsight_pyspark_cntk_integration_spark.operators import similarity as sim
from hdinsight_pyspark_cntk_integration_spark.operators import stats as st
from hdinsight_pyspark_cntk_integration_spark.operators import text as tx


def test_benjamini_hochberg_textbook(spark):
    # classic example: m=5, alpha=0.25; sorted p = .01,.04,.1,.12,.9
    # step-up: i=4 passes (.12 <= 4/5*.25 = .2), so reject ranks 1..4.
    rows = [(1, 100_000), (2, 10_000), (3, 40_000), (4, 120_000), (5, 900_000)]
    df = spark.createDataFrame(rows, "hyp_id long, p_micro long")
    out = {
        r["hyp_id"]: (r["rank"], r["reject"])
        for r in st.benjamini_hochberg(df, alpha_micro=250_000).collect()
    }
    assert out == {2: (1, True), 3: (2, True), 1: (3, True), 4: (4, True), 5: (5, False)}


def test_benjamini_hochberg_none_pass(spark):
    df = spark.createDataFrame(
        [(1, 800_000), (2, 900_000)], "hyp_id long, p_micro long"
    )
    out = st.benjamini_hochberg(df, alpha_micro=50_000).collect()
    assert all(not r["reject"] for r in out)


def test_icc_oneway_golden(spark):
    # 3 items x 2 ratings: (1,2), (3,3), (5,4).
    # S=[3,6,9] G=18 sx2=64 ss2=126 n=3 k=2
    # A = n*ss2 - G^2 = 378-324 = 54; B = k*sx2 - ss2 = 128-126 = 2
    # num = A*(k-1) - B*(n-1) = 54-4 = 50
    # den = A*(k-1) + B*(n-1)*(k-1) = 54+4 = 58 -> icc = 50/58
    rows = [(1, 1), (1, 2), (2, 3), (2, 3), (3, 5), (3, 4)]
    df = spark.createDataFrame(rows, "item_id long, rating long")
    r = st.icc_oneway(df).collect()[0]
    assert (r["n_items"], r["k"]) == (3, 2)
    assert r["icc_micro"] == (50 * 1_000_000) // 58


def test_ece_exact(spark):
    # two bins: scores .1 (x2, 1 pos) and .95 (x2, 2 pos)
    # bin0: |1e6*1 - 200000| = 800000 ; bin9: |2e6 - 1900000| = 100000
    # ece = 900000 / 4 = 225000
    rows = [(100_000, 1), (100_000, 0), (950_000, 1), (950_000, 1)]
    df = spark.createDataFrame(rows, "score_micro long, y long")
    r = st.expected_calibration_error(df).collect()[0]
    assert (r["n"], r["n_bins"], r["ece_micro"]) == (4, 10, 225_000)


def test_mcc_golden(spark):
    # tp=4 tn=3 fp=1 fn=2: mcc = (12-2)/sqrt(5*6*4*5) = 10/sqrt(600)
    rows = (
        [(True, True)] * 4 + [(False, False)] * 3
        + [(False, True)] * 1 + [(True, False)] * 2
    )
    df = spark.createDataFrame(rows, "y boolean, yhat boolean")
    r = st.mcc_binary(df).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (4, 1, 3, 2)
    assert r["mcc_micro"] == math.floor(10.0 / math.sqrt(600.0) * 1e6)


def test_mcc_degenerate_null(spark):
    # all-positive predictions: tn+fn = 0 -> NULL (0 denominator)
    df = spark.createDataFrame(
        [(True, True), (False, True)], "y boolean, yhat boolean"
    )
    assert st.mcc_binary(df).collect()[0]["mcc_micro"] is None


def test_cusum_closed_form_matches_recursion(spark):
    # x = [9, 1, 9, 9, 1], target+slack = 5 -> d = [4,-4,4,4,-4]
    # recursion S = max(0, S+d): [4,0,4,8,4]; alarm > 7 at step 4
    rows = [(1, i + 1, x) for i, x in enumerate([9, 1, 9, 9, 1])]
    df = spark.createDataFrame(rows, "g long, t long, x long")
    r = st.cusum_detect(df, "g", "t", "x", target=5, slack=0, threshold=7).collect()[0]
    assert (r["n"], r["max_cusum"], r["first_alarm_step"]) == (5, 8, 4)


def test_cusum_never_alarms_null_step(spark):
    df = spark.createDataFrame([(1, 1, 1), (1, 2, 1)], "g long, t long, x long")
    r = st.cusum_detect(df, "g", "t", "x", target=5, slack=0, threshold=7).collect()[0]
    assert r["first_alarm_step"] is None and r["max_cusum"] == 0


def test_theil_uniform_is_zero_and_concentrated_is_ln_n(spark):
    rows = [("u", 5), ("u", 5), ("u", 5), ("c", 30), ("c", 0), ("c", 0)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r["group"]: r for r in st.theil_index(df, "g", "x").collect()}
    assert out["u"]["theil_micro"] == 0
    # concentrated: only the x>0 row survives -> n=1, T = ln(1) = 0
    assert out["c"]["n"] == 1 and out["c"]["theil_micro"] == 0


def test_theil_two_point(spark):
    # x = [1, 3]: mean 2, T = ((.5 ln .5) + (1.5 ln 1.5)) / 2
    df = spark.createDataFrame([("g", 1), ("g", 3)], "g string, x long")
    r = st.theil_index(df, "g", "x").collect()[0]
    expect = (
        math.floor(0.5 * math.log(0.5) * 1e6)
        + math.floor(1.5 * math.log(1.5) * 1e6)
    ) // 2
    assert r["theil_micro"] == expect


def test_g_test_flags_planted_token(spark):
    a = spark.createDataFrame(
        [(i, "alpha beta beta") for i in range(20)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, "alpha gamma gamma") for i in range(20)], "doc_id long, text string"
    )
    out = tx.g_test_keywords(a, b, min_count=5, top_k=3).collect()
    by_tok = {r["token"]: r for r in out}
    # beta is A-only, gamma is B-only, alpha is balanced (lowest G2)
    assert by_tok["beta"]["sign"] == 1 and by_tok["gamma"]["sign"] == -1
    assert out[0]["token"] in ("beta", "gamma")
    assert by_tok["beta"]["g2_micro"] > by_tok["alpha"]["g2_micro"]


def test_log_odds_shrinks_rare_words(spark):
    # "big" (50x, A-only) and "small" (5x, A-only) have the same
    # direction; the Dirichlet prior shrinks the low-count word's
    # z-score, so z_big > z_small > 0 (raw log-odds would rank them
    # by ratio alone).
    a_text = " ".join(["big"] * 50 + ["small"] * 5 + ["pad"] * 45)
    b_text = " ".join(["pad"] * 100)
    a = spark.createDataFrame([(1, a_text)], "doc_id long, text string")
    b = spark.createDataFrame([(1, b_text)], "doc_id long, text string")
    out = {r["token"]: r["z_micro"] for r in
           tx.log_odds_dirichlet(a, b, alpha0=20, min_count=5, top_k=10).collect()}
    assert out["big"] > out["small"] > 0
    assert out["pad"] < 0  # B-leaning token scores negative


def test_yules_k_repetitive_beats_diverse(spark):
    rep = spark.createDataFrame(
        [(1, "x x x x x x x x", "rep")], "doc_id long, text string, g string"
    )
    div = spark.createDataFrame(
        [(2, "a b c d e f g h", "div")], "doc_id long, text string, g string"
    )
    out = {r["group"]: r["k_micro"] for r in
           tx.yules_k(rep.unionByName(div), "g", "text").collect()}
    # diverse: every type once -> sum c^2 = N -> K = 0
    assert out["div"] == 0 and out["rep"] > 0


def test_yules_k_hand_value(spark):
    # counts: [2, 1, 1] N=4: K = 1e4*(6-4)/16 = 1250 -> micro 1.25e9
    df = spark.createDataFrame([(1, "a a b c", "g")], "i long, text string, g string")
    r = tx.yules_k(df, "g", "text").collect()[0]
    assert (r["n_tokens"], r["n_types"]) == (4, 3)
    assert r["k_micro"] == (2 * 10_000 * 1_000_000) // 16


def test_rbo_identical_lists_is_one(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 6)], "item long, rank long")
    r = sim.rbo_overlap(a, a, k=5, p=0.9).collect()[0]
    # identical lists: overlap(d)=d, every term = w_d*d; RBO = (1-p)sum p^(d-1)
    expect = sum(
        math.floor(w * 1e6 * d) for d, w in
        zip(range(1, 6), sim.rbo_weights(5, 0.9))
    )
    assert r["rbo_micro"] == expect and r["overlap_at_k"] == 5


def test_rbo_disjoint_lists_is_zero(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 6)], "item long, rank long")
    b = spark.createDataFrame([(i + 100, i) for i in range(1, 6)], "item long, rank long")
    r = sim.rbo_overlap(a, b, k=5, p=0.9).collect()[0]
    assert r["rbo_micro"] == 0 and r["overlap_at_k"] == 0


def test_cem_att_hand_computed(spark):
    # stratum A: treated y=[10], control y=[4, 6] (mean 5)  -> att 5
    # stratum B: treated y=[8],  control y=[8]              -> att 0
    # stratum C: treated only -> unmatched, dropped
    rows = [
        ("A", True, 10), ("A", False, 4), ("A", False, 6),
        ("B", True, 8), ("B", False, 8),
        ("C", True, 100),
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y long")
    r = mn.cem_att(df, "t", "y", ["s"]).collect()[0]
    assert (r["n_strata_matched"], r["n_treated"], r["n_control"]) == (2, 2, 3)
    # terms: A: (10*2 - 1*10)*1e6 // 2 = 5e6 ; B: (8-8) = 0 ; att = 5e6 // 2
    assert r["att_micro"] == 2_500_000


def test_neyman_allocation_favors_variable_stratum(spark):
    rows = (
        [("flat", 100)] * 10
        + [("wild", v) for v in (0, 200, 0, 200, 0, 200, 0, 200, 0, 200)]
    )
    df = spark.createDataFrame(rows, "s string, v long")
    out = {r["stratum"]: r for r in
           pl.neyman_allocation(df, "s", "v", n_total=100).collect()}
    assert out["flat"]["sigma_micro"] == 0 and out["flat"]["alloc"] == 0
    assert out["wild"]["alloc"] == 100


def test_neyman_single_row_stratum_zero_sigma(spark):
    df = spark.createDataFrame([("a", 5), ("b", 1), ("b", 9)], "s string, v long")
    out = {r["stratum"]: r for r in
           pl.neyman_allocation(df, "s", "v", n_total=10).collect()}
    assert out["a"]["sigma_micro"] == 0
    assert out["b"]["alloc"] == 10


def test_neyman_largest_remainder_exhausts_budget(spark):
    # three equal-weight strata, n_total=10: floor share 3 each leaves
    # 1 unassigned; largest-remainder hands it to the tie-break-first
    # stratum so the total is exactly the budget (ADVICE r13)
    rows = [(s, v) for s in ("a", "b", "c") for v in (0, 100)]
    df = spark.createDataFrame(rows, "s string, v long")
    out = {r["stratum"]: r["alloc"] for r in
           pl.neyman_allocation(df, "s", "v", n_total=10).collect()}
    assert sum(out.values()) == 10
    assert sorted(out.values()) == [3, 3, 4] and out["a"] == 4
    # and a budget below the stratum count still allocates every sample
    out2 = {r["stratum"]: r["alloc"] for r in
            pl.neyman_allocation(df, "s", "v", n_total=2).collect()}
    assert sum(out2.values()) == 2
    # all-zero-variance input keeps the NULL convention (no evidence)
    flat = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 7), ("b", 7)], "s string, v long"
    )
    out3 = pl.neyman_allocation(flat, "s", "v", n_total=10).collect()
    assert all(r["alloc"] is None for r in out3)


def test_benjamini_hochberg_drops_null_p(spark):
    # NULL p-values are upstream-test failures: they must not take the
    # lowest ranks, inflate m, or appear in the output (ADVICE r13)
    rows = [(1, 100_000), (2, 10_000), (3, 40_000), (4, 120_000),
            (5, 900_000), (6, None), (7, None)]
    df = spark.createDataFrame(rows, "hyp_id long, p_micro long")
    out = {
        r["hyp_id"]: (r["rank"], r["m"], r["reject"])
        for r in st.benjamini_hochberg(df, alpha_micro=250_000).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out == {2: (1, 5, True), 3: (2, 5, True), 1: (3, 5, True),
                   4: (4, 5, True), 5: (5, 5, False)}


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 35)], "x long, y long")
    r = st.spearman_rho(df, "x", "y").collect()[0]
    assert (r["n"], r["rho_micro"]) == (3, 1_000_000)


def test_spearman_perfect_inverse_with_ties(spark):
    # y reversed; ties in x average-rank correctly
    df = spark.createDataFrame(
        [(1, 4), (2, 3), (2, 2), (3, 1)], "x long, y long"
    )
    r = st.spearman_rho(df, "x", "y").collect()[0]
    assert r["rho_micro"] <= -940_000  # strong negative (ties damp from -1)


def test_gk_gamma_signs(spark):
    # perfectly concordant ordinals -> gamma = 1
    conc = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "x long, y long")
    r = st.goodman_kruskal_gamma(conc, "x", "y").collect()[0]
    assert (r["concordant"], r["discordant"], r["gamma_micro"]) == (3, 0, 1_000_000)
    # ties on either axis are ignored entirely
    tied = spark.createDataFrame([(1, 1), (1, 2), (2, 2), (2, 1)], "x long, y long")
    r2 = st.goodman_kruskal_gamma(tied, "x", "y").collect()[0]
    # pairs across x-levels: (1,1)-(2,2) conc, (1,1)-(2,1) tied-y (skip),
    # (1,2)-(2,2) tied-y (skip), (1,2)-(2,1) disc -> gamma = 0
    assert (r2["concordant"], r2["discordant"], r2["gamma_micro"]) == (1, 1, 0)


def test_page_hinkley_detects_level_shift(spark):
    # flat 10s then a jump to 100s: running mean lags, PH grows
    xs = [10] * 5 + [100] * 5
    rows = [(1, i + 1, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, t long, x long")
    r = st.page_hinkley(df, "g", "t", "x", delta_micro=0,
                        lambda_micro=50_000_000).collect()[0]
    assert r["first_alarm_step"] is not None and r["first_alarm_step"] > 5
    flat = spark.createDataFrame(
        [(1, i + 1, 10) for i in range(10)], "g long, t long, x long"
    )
    r2 = st.page_hinkley(flat, "g", "t", "x", delta_micro=0,
                         lambda_micro=50_000_000).collect()[0]
    assert r2["first_alarm_step"] is None


def test_winsorized_mean_clamps_tails(spark):
    # 20 values: one huge outlier; 5% winsorization clamps it to hi
    vals = list(range(1, 20)) + [1000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = st.winsorized_mean(df, "g", "v", 5, 100).collect()[0]
    # ceil(.05*20)=1 -> lo = 1; ceil(.95*20)=19 -> hi = 19
    assert (r["lo"], r["hi"]) == (1, 19)
    expect = (sum(range(1, 20)) + 19) * 1_000_000 // 20
    assert r["wmean_micro"] == expect


def test_gains_table_perfect_ranker(spark):
    # scores 10..1, positives are the top 5: first half captures all
    rows = [(10 - i, 1 if i < 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s long, y long")
    out = {r["bucket"]: r for r in st.gains_table(df, "s", "y", 5).collect()}
    # bucket 1 = top 20% (2 rows, 2 pos): capture 40%, lift 2x
    assert out[1]["capture_micro"] == 400_000
    assert out[1]["lift_micro"] == 2_000_000
    # by bucket 3 (top 60%) all 5 positives are captured
    assert out[3]["capture_micro"] == 1_000_000


def test_jsd_identical_zero_disjoint_ln2(spark):
    a = spark.createDataFrame([(1, "x y z x y z")], "doc_id long, text string")
    same = tx.jsd_divergence(a, a).collect()[0]
    assert same["jsd_micro"] == 0
    b = spark.createDataFrame([(1, "p q r p q r")], "doc_id long, text string")
    dis = tx.jsd_divergence(a, b).collect()[0]
    # fully disjoint vocabularies -> JSD = ln 2; the per-token floor +
    # the two final truncating DIVs each shave < 1 micro, so the result
    # sits within 2 micro BELOW the real value (never above)
    ln2 = math.floor(math.log(2.0) * 1e6)
    assert ln2 - 2 <= dis["jsd_micro"] <= ln2


def test_cronbach_alpha_perfect_consistency(spark):
    # two items that always agree exactly -> alpha = 1
    rows = [(s, i, s % 3) for s in range(6) for i in (0, 1)]
    df = spark.createDataFrame(rows, "subject long, item_id long, score long")
    r = st.cronbach_alpha(df).collect()[0]
    assert (r["n_subjects"], r["k"], r["alpha_micro"]) == (6, 2, 1_000_000)


def test_cronbach_alpha_uncorrelated_near_zero(spark):
    # independent checkerboard items: covariance 0 -> alpha = 0
    rows = [(s, 0, s % 2) for s in range(8)] + [(s, 1, (s // 2) % 2) for s in range(8)]
    df = spark.createDataFrame(rows, "subject long, item_id long, score long")
    r = st.cronbach_alpha(df).collect()[0]
    assert abs(r["alpha_micro"]) < 1_000  # 0 within micro truncation


def test_nelson_aalen_hand_curve(spark):
    # one group: events at t=1 (n=4), t=2 (n=3), censor at t=3 (n=2... )
    rows = [("g", 1, True), ("g", 2, True), ("g", 3, False), ("g", 3, True)]
    df = spark.createDataFrame(rows, "g string, dur long, ev boolean")
    out = {r["t"]: r for r in st.nelson_aalen(df, "g", "dur", "ev").collect()}
    # t=1: d=1 n=4 -> 250000 ; t=2: d=1 n=3 -> +333333 ; t=3: d=1 n=2 -> +500000
    assert out[1]["cum_hazard_micro"] == 250_000
    assert out[2]["cum_hazard_micro"] == 250_000 + 333_333
    assert out[3]["cum_hazard_micro"] == 250_000 + 333_333 + 500_000
    assert (out[1]["n_risk"], out[2]["n_risk"], out[3]["n_risk"]) == (4, 3, 2)


def test_dp_noisy_counts_reproducible_and_centered(spark):
    from hdinsight_pyspark_cntk_integration_spark.operators import pipeline as pl2

    df = spark.createDataFrame(
        [(g, i) for g in range(40) for i in range(10)], "g long, i long"
    )
    a = {r["group"]: r["released_micro"]
         for r in pl2.dp_noisy_counts(df, "g", seed=1).collect()}
    b = {r["group"]: r["released_micro"]
         for r in pl2.dp_noisy_counts(df, "g", seed=1).collect()}
    c = {r["group"]: r["released_micro"]
         for r in pl2.dp_noisy_counts(df, "g", seed=2).collect()}
    assert a == b          # seeded determinism
    assert a != c          # seed changes the draw
    # Laplace(1) noise around true count 10e6: mean abs noise ~1e6
    errs = [abs(v - 10_000_000) for v in a.values()]
    assert 0 < sum(errs) / len(errs) < 3_000_000


def test_feature_hashing_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b a c"), (3, "z z z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           tx.feature_hashing(df, dim=8, hash_family="md5").collect()}
    assert out[1]["features"] == out[2]["features"]  # same text, same vector
    assert out[1]["nnz"] <= 3 and out[3]["nnz"] == 1
    # single repeated token: |val| = 4 at one index
    idx, val = out[3]["features"].split(":")
    assert abs(int(val)) == 4 and 0 <= int(idx) < 8


def test_wasserstein_hand_value(spark):
    # A = {0, 10}, B = {5, 15}: W1 = 5 exactly (shift everything by 5)
    rows = [("a", 0), ("a", 10), ("b", 5), ("b", 15)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = st.wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["w1_micro"]) == (2, 2, 5_000_000)


def test_wasserstein_identical_zero(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    assert st.wasserstein_1d(df, "g", "v", "a", "b").collect()[0]["w1_micro"] == 0


def test_roc_points_perfect_separation(spark):
    rows = [(9, 1), (8, 1), (2, 0), (1, 0)]
    df = spark.createDataFrame(rows, "s long, y long")
    out = {r["threshold"]: r for r in st.roc_points(df, "s", "y").collect()}
    assert out[8]["tpr_micro"] == 1_000_000 and out[8]["fpr_micro"] == 0
    assert out[1]["tpr_micro"] == 1_000_000 and out[1]["fpr_micro"] == 1_000_000


def test_average_precision_perfect_and_worst(spark):
    perfect = spark.createDataFrame(
        [(4, 1), (3, 1), (2, 0), (1, 0)], "s long, y long"
    )
    r = st.average_precision(perfect, "s", "y").collect()[0]
    assert (r["n"], r["n_pos"], r["ap_micro"]) == (4, 2, 1_000_000)
    worst = spark.createDataFrame(
        [(4, 0), (3, 0), (2, 1), (1, 1)], "s long, y long"
    )
    r2 = st.average_precision(worst, "s", "y").collect()[0]
    # positives at ranks 3, 4: AP = (1/3 + 2/4)/2 = 5/12 (micro-truncated)
    assert abs(r2["ap_micro"] - (5 * 1_000_000) // 12) <= 1


def test_isotonic_pava_pools_violators(spark):
    # level rates: s=1 -> 1.0, s=2 -> 0.0, s=3 -> 1.0
    # PAVA pools levels 1-2 (violation): fit = [0.5, 0.5, 1.0]
    rows = [(1, 1), (1, 1), (2, 0), (2, 0), (3, 1), (3, 1)]
    df = spark.createDataFrame(rows, "s long, y long")
    out = {r["score"]: r["iso_micro"] for r in
           st.isotonic_calibration(df, "s", "y").collect()}
    assert out == {1: 500_000, 2: 500_000, 3: 1_000_000}
    # already-monotone input is returned unchanged
    mono = spark.createDataFrame(
        [(1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1)], "s long, y long"
    )
    out2 = {r["score"]: r["iso_micro"] for r in
            st.isotonic_calibration(mono, "s", "y").collect()}
    assert out2 == {1: 0, 2: 500_000, 3: 1_000_000}


def test_isotonic_output_is_monotone(spark):
    rows = [(s, (s * 7 + i) % 3 == 0) for s in range(10) for i in range(8)]
    df = spark.createDataFrame(
        [(s, int(y)) for s, y in rows], "s long, y long"
    )
    out = sorted(
        (r["score"], r["iso_micro"])
        for r in st.isotonic_calibration(df, "s", "y").collect()
    )
    fits = [f for _, f in out]
    assert fits == sorted(fits)


def test_diebold_mariano_signs(spark):
    # A always worse by a constant 2 with some jitter -> positive DM
    rows = [(10 + (i % 3), 8 + (i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, "la long, lb long")
    r = st.diebold_mariano(df, "la", "lb").collect()[0]
    assert r["dm_micro"] > 0 and r["mean_diff_micro"] > 0
    # identical losses -> zero-variance NULL
    same = spark.createDataFrame([(5, 5), (7, 7)], "la long, lb long")
    r2 = st.diebold_mariano(same, "la", "lb").collect()[0]
    assert r2["dm_micro"] is None and r2["mean_diff_micro"] == 0


def test_log_rank_identical_groups_zero(spark):
    # same survival experience in both groups -> O == E, z ~ 0
    rows = []
    for g in ("a", "b"):
        rows += [(g, 1, True), (g, 2, True), (g, 3, False)]
    df = spark.createDataFrame(rows, "g string, dur long, ev boolean")
    r = st.log_rank_test(df, "g", "dur", "ev", "a", "b").collect()[0]
    assert abs(r["o_a"] * 1_000_000 - r["e_a_micro"]) <= 2  # micro truncation
    assert abs(r["z_micro"]) <= 10


def test_log_rank_separated_groups(spark):
    # group a all events early, group b all censored late -> strong signal
    rows = [("a", 1, True)] * 5 + [("b", 10, False)] * 5
    df = spark.createDataFrame(rows, "g string, dur long, ev boolean")
    r = st.log_rank_test(df, "g", "dur", "ev", "a", "b").collect()[0]
    # O_a = 5, E_a = 5 * 5/10 = 2.5 -> positive z
    assert r["o_a"] == 5 and r["z_micro"] > 1_000_000


def test_two_proportion_z_hand_value(spark):
    # a: 30/100, b: 20/100; pooled .25
    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [("b", 0)] * 80
    df = spark.createDataFrame(rows, "g string, s long")
    r = st.two_proportion_ztest(df, "g", "s", "a", "b").collect()[0]
    expect = math.floor(
        (0.30 - 0.20) / math.sqrt(0.25 * 0.75 * (1 / 100 + 1 / 100)) * 1e6
    )
    assert (r["n_a"], r["x_a"], r["x_b"]) == (100, 30, 20)
    assert abs(r["z_micro"] - expect) <= 1
    # degenerate: all successes -> NULL
    d = spark.createDataFrame([("a", 1), ("b", 1)], "g string, s long")
    assert st.two_proportion_ztest(d, "g", "s", "a", "b").collect()[0]["z_micro"] is None


def test_post_stratified_corrects_imbalance(spark):
    # stratum X: outcome 100; stratum Y: outcome 0. Arm A oversampled in
    # X, so the naive diff is positive; within-stratum diffs are ZERO,
    # so the post-stratified estimate is 0.
    rows = (
        [("A", "X", 100)] * 8 + [("A", "Y", 0)] * 2
        + [("B", "X", 100)] * 2 + [("B", "Y", 0)] * 8
    )
    df = spark.createDataFrame(rows, "arm string, s string, y long")
    r = st.post_stratified_mean(df, "arm", "s", "y", "A", "B").collect()[0]
    assert (r["n_strata"], r["n_a"], r["n_b"]) == (2, 10, 10)
    assert r["diff_micro"] == 0


def test_embedding_contamination_lsh_planted_pair(spark):
    # plant a near-identical eval/train pair; the parity-tagged LSH
    # production path must surface it, and every emitted pair must be
    # a true >= threshold pair (verify-exact containment)
    import random

    rnd = random.Random(7)
    def vec(seed):
        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(16)]

    base = vec(42)
    near = [x + 0.01 for x in base]
    train_rows = [(i, vec(i)) for i in range(100, 140)] + [(199, base)]
    eval_rows = [(i, vec(1000 + i)) for i in range(10)] + [(99, near)]
    tr = spark.createDataFrame(train_rows, "vec_id long, embedding array<float>")
    ev = spark.createDataFrame(eval_rows, "vec_id long, embedding array<float>")
    from hdinsight_pyspark_cntk_integration_spark.operators import dedup as dd2

    got = dd2.embedding_contamination(
        ev, tr, threshold=0.95, num_planes=4, bands=16
    ).collect()
    pairs = {(r["eval_id"], r["train_id"]) for r in got}
    assert (99, 199) in pairs
    assert all(r["cos"] >= 0.95 for r in got)


def test_embedding_contamination_rejects_string_ids(spark):
    from hdinsight_pyspark_cntk_integration_spark.operators import dedup as dd2

    df = spark.createDataFrame([("a", [1.0, 0.0])], "vec_id string, embedding array<float>")
    with pytest.raises(TypeError):
        dd2.embedding_contamination(df, df)


def test_benford_chi2_uniform_vs_benford(spark):
    # genuinely Benford-ish data (powers spanning magnitudes) has small
    # chi2 terms; uniform same-magnitude data is flagged hard
    import itertools

    benford_vals = [int(1.7 ** k) for k in range(1, 60)]
    uni_vals = list(range(500, 560))
    b = spark.createDataFrame([(v,) for v in benford_vals], "v long")
    u = spark.createDataFrame([(v,) for v in uni_vals], "v long")
    tb = sum(r["chi2_term_micro"] for r in st.benford_digits(b, "v").collect())
    tu = sum(r["chi2_term_micro"] for r in st.benford_digits(u, "v").collect())
    assert tu > tb  # uniform-magnitude data deviates far more
    # digit-5-only data: ALL 9 digits emitted; missing digits carry
    # n=0 and a full (0-N*p)^2/(N*p) = N*p term (ADVICE r13)
    out = {r["digit"]: r for r in st.benford_digits(u, "v").collect()}
    assert set(out) == set(range(1, 10)) and out[5]["n"] == 60
    assert all(out[d]["n"] == 0 for d in range(1, 10) if d != 5)
    n_total = 60
    for d in range(1, 10):
        if d == 5:
            continue
        p = __import__("math").log10(1.0 + 1.0 / d)
        expect = int((n_total * p) * 1_000_000)
        assert abs(out[d]["chi2_term_micro"] - expect) <= 1
    # non-positive values are excluded (Benford's domain)
    z = spark.createDataFrame([(0,), (-5,), (7,)], "v long")
    rows = {r["digit"]: r for r in st.benford_digits(z, "v").collect()}
    assert len(rows) == 9 and rows[7]["n"] == 1
    assert sum(r["n"] for r in rows.values()) == 1


def test_dp_noisy_sum_clips_before_summing(spark):
    from hdinsight_pyspark_cntk_integration_spark.operators import pipeline as pl2

    # one whale (1000) and one negative row; clip to 10 -> clipped sum 10+0+5
    df = spark.createDataFrame(
        [("g", 1000), ("g", -50), ("g", 5)], "g string, y long"
    )
    r = pl2.dp_noisy_sum(df, "g", "y", clip=10, epsilon_micro=10_000_000,
                         seed=3).collect()[0]
    # high epsilon -> tiny noise; release within 1 unit of the clipped sum
    assert abs(r["released_micro"] - 15_000_000) < 1_000_000
    # reproducible per seed, different across seeds
    a = pl2.dp_noisy_sum(df, "g", "y", clip=10, seed=3).collect()[0]["released_micro"]
    b = pl2.dp_noisy_sum(df, "g", "y", clip=10, seed=3).collect()[0]["released_micro"]
    c = pl2.dp_noisy_sum(df, "g", "y", clip=10, seed=4).collect()[0]["released_micro"]
    assert a == b and a != c


def test_tv_and_hellinger_bounds(spark):
    # identical distributions -> 0; disjoint supports -> TV = 1, H2 = 1
    same = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)],
        "g string, v long",
    )
    r = st.tv_distance(same, "g", "v", "a", "b").collect()[0]
    h = st.hellinger_distance(same, "g", "v", "a", "b").collect()[0]
    assert r["tv_micro"] == 0 and h["h2_micro"] == 0
    disj = spark.createDataFrame(
        [("a", v) for v in (1, 2)] + [("b", v) for v in (10, 20)],
        "g string, v long",
    )
    r2 = st.tv_distance(disj, "g", "v", "a", "b").collect()[0]
    h2 = st.hellinger_distance(disj, "g", "v", "a", "b").collect()[0]
    assert r2["tv_micro"] == 1_000_000
    assert 999_990 <= h2["h2_micro"] <= 1_000_000  # per-value floors


def test_tv_hand_value(spark):
    # p = (.5, .5, 0), q = (0, .5, .5): TV = .5
    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    assert st.tv_distance(df, "g", "v", "a", "b").collect()[0]["tv_micro"] == 500_000


def test_dp_noisy_mean_ledger_and_reproducibility(spark):
    df = spark.createDataFrame(
        [("g", 100), ("g", 200), ("g", 1000), ("h", 50)], "g string, y long"
    )
    rows = {r["group"]: r for r in pl.dp_noisy_mean(
        df, "g", "y", clip=300, epsilon_micro=10_000_000,
        sum_share_micro=500_000, seed=3,
    ).collect()}
    # ledger: the two slices sum exactly to the total budget
    for r in rows.values():
        assert (r["epsilon_sum_micro"] + r["epsilon_count_micro"]
                == r["epsilon_total_micro"] == 10_000_000)
    # g's clipped sum is 100+200+300 = 600 units, n=3; noise scales are
    # b_sum = clip/eps_sum = 60 units and b_cnt = 1/eps_cnt = 0.2 units,
    # and |Lap(b)| < 13.9b at the hash-uniform's extreme point — so the
    # releases are bracketed by the mechanism's own hard envelope
    g = rows["g"]
    assert abs(g["released_sum_micro"] - 600_000_000) < 840_000_000
    assert abs(g["released_count_micro"] - 3_000_000) < 2_800_000
    assert g["mean_micro"] is not None
    # reproducible per seed, different across seeds
    a = pl.dp_noisy_mean(df, "g", "y", clip=300, seed=3).collect()
    b = pl.dp_noisy_mean(df, "g", "y", clip=300, seed=3).collect()
    c = pl.dp_noisy_mean(df, "g", "y", clip=300, seed=4).collect()
    key = lambda rows_: sorted((r["group"], r["released_sum_micro"]) for r in rows_)
    assert key(a) == key(b) != key(c)
    # the sum and count draws are independent (disjoint seed tags):
    # identical u's would make noise/b ratios equal — they must differ
    [r1] = [r for r in a if r["group"] == "g"]
    # degenerate split raises
    import pytest
    with pytest.raises(ValueError):
        pl.dp_noisy_mean(df, "g", "y", clip=300, epsilon_micro=1,
                         sum_share_micro=500_000)
