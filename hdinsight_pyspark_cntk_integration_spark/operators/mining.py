"""Market-basket and customer-value mining — the OLAP-adjacent analytics
a training-data/commerce pipeline layers on top of the relational core:
association rules (frequent co-occurring items with support/confidence/
lift), RFM segmentation (recency/frequency/monetary quartiles), and
Pareto (80/20) contribution analysis.

Scale design notes (100 TB):

- ``frequent_pairs`` applies the Apriori property BEFORE the pair
  explode: an item pair can only be frequent if both items are, so the
  basket stream is semi-joined against the (small, broadcastable)
  frequent-item set first. Pair generation is a self-join co-located on
  the basket key — one shuffle keyed by basket, one by pair. No window,
  no collect; the frequent-item table is bounded by ``1/min_support``
  baskets by construction.
- ``rfm_segments`` deliberately scores quartiles WITHIN a partition
  column (market/nation) rather than globally: a global NTILE is a
  single-task sort at corpus scale, while per-market quartiles are a
  partitioned window AND the business-correct comparison. Ties break on
  the customer key, making the quartile assignment total-order
  deterministic and oracle-reproducible.
- ``pareto_contribution`` is the same shape: per-group descending
  cumulative share, never a global sort.

All money flows in integer cents and ratios in integer micro-units
(floor), so results hash-match an ANSI-SQL oracle exactly.

Reference anchor: the reference's analytics are notebook-cell
aggregations over scored rows (CNTK_model_scoring_on_Spark_walkthrough.ipynb
cells 14-19 — accuracy % and confusion counts); this module generalizes
that "aggregate the scored corpus" stage to the rule/segment/contribution
mining a production corpus warehouse needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 10,
    min_pair_support: int | None = None,
) -> DataFrame:
    """Association-rule mining over (basket, item) rows: all item pairs
    co-occurring in at least ``min_pair_support`` baskets, with their
    support counts, confidence and lift in integer micro-units.

    Returns (item_a, item_b, pair_n, n_a, n_b, n_baskets,
    conf_a_b_micro, conf_b_a_micro, lift_micro) with item_a < item_b.

    - ``min_support``: minimum baskets an ITEM must appear in to enter
      pair generation (Apriori prune — a pair of infrequent items can
      never be frequent).
    - ``min_pair_support``: minimum co-occurrence count for an emitted
      pair (defaults to ``min_support``).

    lift_micro = floor(pair_n * n_baskets * 1e6 / (n_a * n_b)) computed
    in DECIMAL(38,0) (the long product passes 2^63 once basket counts
    reach corpus scale — same discipline as temperature_mixture /
    key_skew_profile, HUGEINT ``//`` on the oracle side);
    conf_x_y_micro = floor(pair_n * 1e6 / n_x), which stays within long
    range (pair_n <= n_baskets). Integer floor division end-to-end — no
    float in the result.
    """
    if min_pair_support is None:
        min_pair_support = min_support

    # Presence, not multiplicity: one row per (basket, item).
    # Optimization r14: materialized — `bi` is referenced FOUR times
    # (item counts, basket total, both sides of the pair self-join), and
    # unmaterialized each reference re-ran the upstream join + distinct
    # (15 Exchanges at the gate). The presence table is the standard
    # Apriori transaction table (≤ |baskets|·|item domain| rows, strictly
    # smaller than the input stream); one materialization replaces four
    # full input derivations.
    bi = (
        df.select(
            F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    item_counts = bi.groupBy("__item").agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    frequent = item_counts.filter(F.col("n_item") >= min_support)

    # Total baskets as a 1-row frame, attached by broadcast cross join
    # (never a driver collect).
    n_baskets = bi.select("__basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )

    # Apriori prune, then co-located pair self-join on the basket key.
    pruned = bi.join(F.broadcast(frequent.select("__item")), "__item", "left_semi")
    a = pruned.select(F.col("__basket"), F.col("__item").alias("item_a"))
    b = pruned.select(F.col("__basket"), F.col("__item").alias("item_b"))
    pairs = (
        a.join(b, "__basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_support)
    )

    fa = F.broadcast(frequent.select(F.col("__item").alias("item_a"), F.col("n_item").alias("n_a")))
    fb = F.broadcast(frequent.select(F.col("__item").alias("item_b"), F.col("n_item").alias("n_b")))
    out = (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_n",
        "n_a",
        "n_b",
        "n_baskets",
        F.floor(F.col("pair_n") * MICRO / F.col("n_a")).cast("long").alias("conf_a_b_micro"),
        F.floor(F.col("pair_n") * MICRO / F.col("n_b")).cast("long").alias("conf_b_a_micro"),
        F.floor(
            F.col("pair_n").cast("decimal(38,0)")
            * F.col("n_baskets").cast("decimal(38,0)")
            * F.lit(MICRO).cast("decimal(38,0)")
            / (F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)"))
        )
        .cast("long")
        .alias("lift_micro"),
    )


def rfm_segments(
    orders: DataFrame,
    partition_col: str,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    quartiles: int = 4,
) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order,
    measured against the group's max date), frequency (order count) and
    monetary (total cents), each scored into ``quartiles`` buckets
    WITHIN ``partition_col`` via NTILE.

    Quartiles are per-partition-column on purpose — a global NTILE is a
    one-task global sort at 100 TB, and cross-market quartiles mix
    incomparable currencies/behaviors anyway. Ordering ties break on the
    customer key, so bucket assignment is fully deterministic.

    r_q orders recency ASCENDING (1 = most recent), f_q and m_q order
    value DESCENDING (1 = best) — the conventional "111 is your best
    customer" labeling. Returns (partition, customer, recency_days,
    frequency, monetary_cents, r_q, f_q, m_q, segment).
    """
    from pyspark.sql import Window

    per_cust = orders.groupBy(
        F.col(partition_col).alias("grp"), F.col(customer_col).alias("customer")
    ).agg(
        F.max(F.col(date_col)).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).cast("long").alias("monetary_cents"),
    )
    ref = Window.partitionBy("grp")
    per_cust = per_cust.withColumn(
        "recency_days",
        F.datediff(F.max("__last").over(ref), F.col("__last")).cast("long"),
    )
    w_r = Window.partitionBy("grp").orderBy(F.col("recency_days").asc(), F.col("customer").asc())
    w_f = Window.partitionBy("grp").orderBy(F.col("frequency").desc(), F.col("customer").asc())
    w_m = Window.partitionBy("grp").orderBy(
        F.col("monetary_cents").desc(), F.col("customer").asc()
    )
    return per_cust.select(
        F.col("grp"),
        F.col("customer"),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(quartiles).over(w_r).cast("long").alias("r_q"),
        F.ntile(quartiles).over(w_f).cast("long").alias("f_q"),
        F.ntile(quartiles).over(w_m).cast("long").alias("m_q"),
    ).withColumn(
        "segment",
        F.concat_ws("", F.col("r_q"), F.col("f_q"), F.col("m_q")),
    )


def pareto_contribution(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    amount_cents_col: str,
    threshold_micro: int = 800_000,
) -> DataFrame:
    """Pareto (80/20) analysis per group: how many entities does it take
    to cover ``threshold_micro``/1e6 of the group's total?

    Entities sort descending by amount within the group (ties break on
    the entity key) and accumulate; an entity is in the covering set iff
    the cumulative total BEFORE it is still below the threshold — i.e.
    the set is minimal and includes the entity that crosses the line.

    Returns one row per group: (group, n_entities, n_to_threshold,
    threshold_micro, top_share_micro) where top_share_micro is the
    covering set's actual share in micro-units (floor).

    Per-group windowed cumsum — never a global sort; the window input is
    one group's entities, the pre-aggregated per-entity rollup, not raw
    rows.
    """
    from pyspark.sql import Window

    per_entity = df.groupBy(
        F.col(group_col).alias("grp"), F.col(entity_col).alias("entity")
    ).agg(F.sum(F.col(amount_cents_col)).cast("long").alias("amt"))

    w = Window.partitionBy("grp").orderBy(F.col("amt").desc(), F.col("entity").asc())
    tot = Window.partitionBy("grp")
    cum = (
        per_entity.withColumn("cum", F.sum("amt").over(w))
        .withColumn("total", F.sum("amt").over(tot))
        .withColumn("prev", F.col("cum") - F.col("amt"))
    )
    # Double-ratio comparison (not prev*1e6 < total*thr): cents totals at
    # corpus scale push the integer product past 2^63, while the ratio of
    # two longs is one correctly-rounded IEEE division — identical in
    # every engine, no overflow at any scale.
    covering = cum.filter(
        F.col("prev").cast("double") / F.col("total").cast("double")
        < F.lit(threshold_micro / float(MICRO))
    )
    return (
        covering.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_to_threshold"),
            F.max("total").alias("__total"),
            F.sum("amt").cast("long").alias("__covered"),
        )
        .join(
            per_entity.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n_entities")),
            "grp",
        )
        .select(
            "grp",
            "n_entities",
            "n_to_threshold",
            F.lit(threshold_micro).cast("long").alias("threshold_micro"),
            F.floor(
                F.col("__covered").cast("double") / F.col("__total").cast("double") * MICRO
            ).cast("long").alias("top_share_micro"),
        )
    )


def weighted_reservoir_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 10,
    max_weight: int = 64,
) -> DataFrame:
    """Deterministic weighted reservoir sampling WITHOUT replacement,
    exactly k per group — the data-mixture primitive ("sample documents
    proportional to quality weight") that the Bernoulli thinning of
    ``pipeline.weighted_sample`` / ``mixture_sample`` cannot give you
    when you need an exact per-group quota.

    Scheme: Efraimidis-Spirakis (IPL 2006) assigns each row the key
    u^(1/w) (u uniform) and keeps the k largest. We use the
    distributionally IDENTICAL max-of-w-uniforms form — priority =
    max_{c=1..w} U(id, c), since the max of w iid uniforms has exactly
    the CDF t^w that u^(1/w) has — with U(id, c) a 60-bit integer
    carved from md5(id || '_' || c). No transcendentals, no RNG state:
    integer-exact, reproducible on any engine, any partitioning.

    Weights must be integer ≥ 1 (rows with w < 1 are excluded — weight
    0 means "never sample"); ``max_weight`` bounds the per-row
    priority scan and is enforced with a runtime raise_error, not a
    silent cap — quantize big weights down before sampling.

    Returns (group, id, weight, priority, rank) with rank 1..k by
    (priority DESC, id) — the id tiebreak makes the draw a total order
    even in the astronomically-unlikely 60-bit tie.

    Scale shape: the priority is a per-row ``transform``+``array_max``
    over ≤ max_weight md5 calls — no explode, no shuffle; the only
    shuffle is the per-group top-k, built on the two-stage
    ``bounded_topk`` (per-partition slice first), so no reducer ever
    holds more than partition×k candidates per group.
    """
    from hdinsight_pyspark_cntk_integration_spark.operators.similarity import bounded_topk

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1 (got {max_weight})")
    w = F.col(weight_col).cast("long")
    wg = F.when(w <= max_weight, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample: weight exceeds max_weight={max_weight} "
                    "(quantize weights down): "
                ),
                w.cast("string"),
            )
        ).cast("long")
    )
    pri = F.array_max(
        F.transform(
            F.sequence(F.lit(1), wg),
            lambda c: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws("_", F.col(id_col).cast("string"), c.cast("string"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        )
    )
    scored = (
        df.filter(w >= 1)
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            w.alias("weight"),
            pri.alias("priority"),
        )
    )
    item = F.struct(
        (-F.col("priority")).alias("np"), F.col("id").alias("id"),
        F.col("weight").alias("weight"),
    )
    top = bounded_topk(scored, "grp", item, k)
    return (
        top.select("grp", F.posexplode("top").alias("pos", "t"))
        .select(
            F.col("grp").alias(group_col),
            F.col("t.id").alias(id_col),
            F.col("t.weight").alias("weight"),
            (-F.col("t.np")).alias("priority"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion over an event stream: for each user,
    step i counts only if it happens STRICTLY AFTER the user's
    earliest completion of step i-1 (earliest-completion semantics,
    the standard product-analytics funnel), optionally within
    ``horizon_seconds`` of the user's step-1 time. Returns one row per
    step:

        (step_index, step, n_users, conv_from_first_micro,
         conv_from_prev_micro)

    with the ratios as exact integer micro-units (1e6·a div b — integer
    division of exact counts, hash-stable on any engine). The first
    step's ratios are both 1e6 by definition; an empty first step
    yields zero rows for every step (no 0/0).

    Scale shape: one filtered min-ts aggregate per step plus a hash
    join per step transition, all keyed on the user — len(steps)-1
    shuffles on a high-cardinality key, the natural co-partitioned
    plan (AQE reuses the exchange where sizes allow). No windows over
    raw events, no per-user event arrays, no collect: per-user state
    is ONE timestamp per step, the per-step counts are partial-agg
    1-row aggregates unioned LAZILY (one action total), and the
    conversion ratios are a window over the len(steps)-row result.
    Event-time skew lives in the user key, not a global sort.
    """
    from pyspark.sql import Window

    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps (got {len(steps)})")
    ts = F.col(ts_col)
    reached = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts).alias("t1"))
        .withColumn("t_prev", F.col("t1"))
        .localCheckpoint(eager=True)
    )

    def step_count(r: DataFrame, i: int, s: str) -> DataFrame:
        return r.groupBy().agg(
            F.lit(i + 1).cast("long").alias("step_index"),
            F.lit(s).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        ).select("step_index", "step", "n_users")

    parts = [step_count(reached, 0, steps[0])]
    for i, s in enumerate(steps[1:], start=1):
        nxt = df.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("u"), ts.alias("__ts")
        )
        cond = F.col("__ts") > F.col("t_prev")
        if horizon_seconds is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col("t1") + F.expr(f"INTERVAL {int(horizon_seconds)} SECOND")
            )
        reached = (
            nxt.join(reached, "u")
            .filter(cond)
            .groupBy("u", "t1")
            .agg(F.min("__ts").alias("t_prev"))
        )
        # Each step's reach table feeds BOTH the next transition and its
        # own count branch; un-materialized, every union branch re-chains
        # back to the source (K²/2 scans). The table is one row per
        # surviving user — localCheckpoint it so the event stream is
        # scanned once per step, K scans total.
        reached = reached.localCheckpoint(eager=True)
        parts.append(step_count(reached, i, s))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.orderBy("step_index").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n1 = F.first("n_users").over(w)
    np_ = F.coalesce(
        F.lag("n_users").over(Window.orderBy("step_index")), F.col("n_users")
    )
    return (
        out.withColumn("__n1", n1)
        .withColumn("__np", np_)
        .filter(F.col("__n1") > 0)
        .select(
            "step_index", "step", "n_users",
            F.expr(f"{MICRO} * n_users div __n1").alias("conv_from_first_micro"),
            # a dead step (prev count 0 ⇒ this count 0, funnel is
            # monotone) yields NULL, not an ANSI divide-by-zero
            F.expr(f"{MICRO} * n_users div nullif(__np, 0)").alias(
                "conv_from_prev_micro"
            ),
        )
    )


def markov_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition table over each key's event
    sequence: count consecutive (src → dst) state pairs across all
    keys, with the conditional probability P(dst | src) in exact
    integer micro-units — the navigation/behavior model behind "what
    do users do after X?", next to but distinct from
    ``text.bigram_condprob`` (token bigrams, no per-key sequencing).

    Determinism under timestamp ties: the successor is chosen by
    (ts, state) lexicographic order, a total order over any key's
    events up to exact duplicate rows — reruns and repartitionings
    produce identical transition counts, and an independent engine
    sorting the same way reproduces them.

    Returns (src, dst, n, n_src, prob_micro) for transitions with
    n >= ``min_count``; ``n_src`` counts ALL transitions leaving src,
    so Σ prob over dst ≈ 1e6 per src (exact up to floor).

    Shape: one lag window partitioned on the key (per-key state is the
    sort buffer for that key's events — bounded by per-key activity,
    the natural partition axis), one partial-agg groupBy on the pair,
    one window over the (domain-bounded) src marginals. No global
    sort, no collect.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("dst"))
    seq = df.select(
        F.col(key_col), F.col(ts_col), F.col(state_col).alias("dst")
    ).withColumn("src", F.lag("dst").over(w)).filter(F.col("src").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wsrc = Window.partitionBy("src")
    return (
        pairs.withColumn("n_src", F.sum("n").over(wsrc).cast("long"))
        .filter(F.col("n") >= min_count)
        .select(
            "src", "dst", "n", "n_src",
            F.expr(f"{MICRO} * n div n_src").alias("prob_micro"),
        )
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    smoothing: int = 0,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the
    categorical-feature encoder that replaces a category with the mean
    target of the OTHER rows sharing it (excluding the row's own target
    is what blocks the label-leakage a naive per-category mean commits):

        enc_i = (S_c − y_i + m·ybar) / (n_c − 1 + m)

    with S_c/n_c the category's target sum/count, ybar the global mean,
    m = ``smoothing`` virtual global-mean rows (m = 0 is pure LOO).
    Rows whose denominator is 0 (singleton category, m = 0) fall back
    to the global mean — the standard unseen-category treatment.

    Exactness: targets are quantized to integer cents at birth
    (fixture 2-decimal doubles → exact longs); category sums accumulate
    in DECIMAL(38,0) (corpus-scale safe, order-independent); the
    encoding is one fixed-order double chain over exact integers,
    micro-floored. enc_micro is in MICRO-CENTS.

    Shape: one domain-bounded partial-agg groupBy on the category, one
    1-row global aggregate, both broadcast back onto the row stream —
    the big table is scanned once and never shuffled.

    Returns (id, category, target_cents, n_cat, enc_micro).
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0 (got {smoothing})")
    dec = "decimal(38,0)"
    cents = F.round(F.col(target_col) * 100).cast("long")
    rows = df.select(
        F.col(id_col).alias("__id"),
        F.col(cat_col).alias("__cat"),
        cents.alias("__y"),
    )
    per_cat = rows.groupBy("__cat").agg(
        F.sum(F.col("__y").cast(dec)).cast(dec).alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    glob = rows.groupBy().agg(
        F.sum(F.col("__y").cast(dec)).cast(dec).alias("__st"),
        F.count(F.lit(1)).cast("long").alias("__nt"),
    )
    j = rows.join(F.broadcast(per_cat), "__cat").crossJoin(F.broadcast(glob))
    ybar = F.col("__st").cast("double") / F.col("__nt").cast("double")
    m = F.lit(float(smoothing))
    den = F.col("__n").cast("double") - F.lit(1.0) + m
    num = (F.col("__s").cast(dec) - F.col("__y").cast(dec)).cast(
        "double"
    ) + m * ybar
    enc = F.when(den > 0.0, num / den).otherwise(ybar)
    return j.select(
        F.col("__id").alias(id_col),
        F.col("__cat").alias(cat_col),
        F.col("__y").alias("target_cents"),
        F.col("__n").alias("n_cat"),
        F.floor(enc * F.lit(1_000_000.0)).cast("long").alias("enc_micro"),
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    flag_col: str,
) -> DataFrame:
    """Weight of Evidence and Information Value per category — the
    credit-scoring-standard strength measure of a categorical feature
    against a binary outcome:

        woe_c = ln( (pos_c/P) / (neg_c/N) )
        iv_c  = (pos_c/P − neg_c/N) · woe_c

    (total IV = Σ iv_c; the conventional read: < 0.02 useless,
    > 0.3 strong). Categories with zero positives or zero negatives
    are DROPPED — their WOE is ±∞ by definition (the standard remedy
    is binning them away, a modeling choice that belongs upstream);
    NULL categories and NULL flags are excluded like
    ``mutual_information`` excludes NULL cells.

    Exactness: one partial-agg shuffle collapses the stream to its
    category cells (domain-bounded); totals are windows OVER the cells;
    the ln argument is a fixed-order ratio chain (pos_c/P)·(N/neg_c) of
    doubles from exact longs, and woe/iv are each ONE fixed-order
    double chain micro-floored at birth (same ln discipline as
    ``mutual_information`` / the unigram scores).

    Returns (category, n_pos, n_neg, pos_total, neg_total, woe_micro,
    iv_micro).
    """
    from pyspark.sql import Window

    flag = F.col(flag_col)
    cells = (
        df.filter(F.col(cat_col).isNotNull() & flag.isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(
            F.sum(flag.cast("long")).cast("long").alias("n_pos"),
            F.sum((~flag.cast("boolean")).cast("long")).cast("long").alias("n_neg"),
        )
    )
    w = Window.partitionBy()
    out = cells.select(
        "category", "n_pos", "n_neg",
        F.sum("n_pos").over(w).cast("long").alias("pos_total"),
        F.sum("n_neg").over(w).cast("long").alias("neg_total"),
    ).filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    p = F.col("n_pos").cast("double") / F.col("pos_total").cast("double")
    q = F.col("n_neg").cast("double") / F.col("neg_total").cast("double")
    ratio = (
        F.col("n_pos").cast("double") / F.col("pos_total").cast("double")
    ) * (F.col("neg_total").cast("double") / F.col("n_neg").cast("double"))
    woe = F.log(ratio)
    return out.select(
        "category", "n_pos", "n_neg", "pos_total", "neg_total",
        F.floor(woe * F.lit(1_000_000.0)).cast("long").alias("woe_micro"),
        F.floor((p - q) * woe * F.lit(1_000_000.0)).cast("long").alias("iv_micro"),
    )


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion_expr,
    id_col: str,
) -> DataFrame:
    """Multi-touch marketing attribution over an event stream: every
    TOUCH (non-conversion event) is assigned to the user's NEXT
    conversion, and each conversion's credit is distributed across its
    touch set under the three standard models at once — first-touch
    (all credit to the earliest), last-touch (all to the latest), and
    linear (1/n to each). The query behind "which channel actually
    drives purchases", where last-touch alone systematically
    over-credits closers.

    Exactness: first/last credits are integer conversion counts
    (argmin/argmax by exact (ts, id) — the id tiebreak makes
    simultaneous touches deterministic); linear credit quantizes 1/n
    to floor(1e6/n) per touch AT BIRTH and sums integers (each
    conversion leaks ≤ n−1 micro — deterministic, documented, the
    adamic_adar discipline). Touches with no later conversion are
    unattributed and excluded, as are conversions with no prior touch.

    Shape: ONE key-partitioned window (reverse running min over the
    conversion timestamps) assigns each touch its conversion; one
    (user, conversion) partial-agg computes n/first/last; one explode-
    free channel rollup. No self-join of the event stream.

    Returns (channel, first_touch, last_touch, linear_micro,
    n_touches).
    """
    from pyspark.sql import Window

    is_conv = conversion_expr if isinstance(conversion_expr, Column) else F.expr(
        conversion_expr
    )
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(channel_col).alias("__ch"),
        is_conv.alias("__conv"),
    )
    # next conversion at-or-after each row: reverse running min over a
    # conversion-only (ts, id) struct — one window, ordered by the same
    # total order used everywhere
    w_rev = (
        Window.partitionBy("__u")
        .orderBy(F.col("__ts"), F.col("__id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    conv_key = F.when(
        F.col("__conv"), F.struct(F.col("__ts").alias("t"), F.col("__id").alias("i"))
    )
    tagged = ev.withColumn("__next_conv", F.min(conv_key).over(w_rev))
    touches = tagged.filter(
        (~F.col("__conv")) & F.col("__next_conv").isNotNull()
    )
    # Collapse the touch stream ONCE to the (user, conversion, channel)
    # grain before anything else reads it: per-cell count plus the
    # min/max (ts, id) struct. Every downstream model is derivable from
    # this table — count n = Σ cnt, first/last channel = argmin/argmax
    # over the per-channel extrema ((ts, id) is unique per event, so the
    # per-channel minima are distinct and the two-level argmin equals
    # the per-touch argmin), and each channel's linear credit is
    # cnt · (1e6 DIV n). Unmaterialized, the event scan + user window
    # ran FOUR times (per_conv, linear's two sides, and the join
    # re-derivation); now the corpus is scanned and windowed once.
    pcc = touches.groupBy("__u", "__next_conv", "__ch").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.min(F.struct(F.col("__ts"), F.col("__id"))).alias("__mn"),
        F.max(F.struct(F.col("__ts"), F.col("__id"))).alias("__mx"),
    ).localCheckpoint(eager=True)
    per_conv = pcc.groupBy("__u", "__next_conv").agg(
        F.sum("__cnt").cast("long").alias("__n"),
        F.min_by("__ch", F.col("__mn")).alias("__first_ch"),
        F.max_by("__ch", F.col("__mx")).alias("__last_ch"),
    ).localCheckpoint(eager=True)
    linear = (
        pcc.join(
            per_conv.select("__u", "__next_conv", "__n"), ["__u", "__next_conv"]
        )
        .groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.sum(F.col("__cnt") * F.expr("1000000 div __n"))
            .cast("long")
            .alias("linear_micro"),
            F.sum("__cnt").cast("long").alias("n_touches"),
        )
    )
    firsts = per_conv.groupBy(F.col("__first_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch")
    )
    lasts = per_conv.groupBy(F.col("__last_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch")
    )
    return (
        linear.join(firsts, "channel", "full_outer")
        .join(lasts, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("first_touch", F.lit(0)).cast("long").alias("first_touch"),
            F.coalesce("last_touch", F.lit(0)).cast("long").alias("last_touch"),
            F.coalesce("linear_micro", F.lit(0)).cast("long").alias("linear_micro"),
            F.coalesce("n_touches", F.lit(0)).cast("long").alias("n_touches"),
        )
    )


def cohort_ltv(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, revenue accumulated by months-since-cohort — the retention
    twin ``cohort_retention`` counts heads; this one follows the money
    (is the March cohort worth more per head at month 6 than
    January's?).

    Exactness: cohort month and age are exact integer month indices
    (year·12+month); revenue is integer cents in DECIMAL(38,0); the
    cumulative sum is a window over the (cohort, age) AGGREGATE —
    bounded by months², never customer count — and ltv_micro =
    floor(cum_cents·1e6 / cohort_size / 100) is integer micro-dollars
    per head, computed in DECIMAL so cents·1e6 cannot pass 2^63.

    Shape: one customer groupBy for the cohort assignment (broadcast
    back), one (cohort, age) partial agg, one cohort-partitioned
    window over that aggregate, one 1-row-per-cohort size join.

    Returns (cohort_month, age_months, n_customers, rev_cents,
    cum_rev_cents, ltv_micro).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    mi = (F.year(F.col(date_col)) * 12 + F.month(F.col(date_col)) - 1).cast("long")
    rows = orders.select(
        F.col(customer_col).alias("__cust"),
        mi.alias("__m"),
        F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
    )
    cohorts = rows.groupBy("__cust").agg(F.min("__m").alias("__cm"))
    sizes = cohorts.groupBy(F.col("__cm").alias("cohort_month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    aged = rows.join(cohorts, "__cust").groupBy(
        F.col("__cm").alias("cohort_month"),
        (F.col("__m") - F.col("__cm")).cast("long").alias("age_months"),
    ).agg(F.sum(F.col("__cents").cast(dec)).cast(dec).alias("__rev"))
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = aged.select(
        "cohort_month", "age_months",
        F.col("__rev").cast("long").alias("rev_cents"),
        F.sum("__rev").over(w).cast(dec).alias("__cum"),
    )
    out = curve.join(F.broadcast(sizes), "cohort_month")
    ltv = F.expr(
        "CAST((CAST(__cum AS decimal(38,0)) * 1000000)"
        " DIV (CAST(n_customers AS decimal(38,0)) * 100) AS BIGINT)"
    )
    return out.select(
        "cohort_month", "age_months", "n_customers",
        "rev_cents",
        F.col("__cum").cast("long").alias("cum_rev_cents"),
        ltv.alias("ltv_micro"),
    )


def hhi_concentration(
    df: DataFrame,
    market_col: str,
    member_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per market —
    the antitrust/risk-screening aggregate (is this nation's supply
    dominated by two suppliers, or spread across fifty?):

        HHI = Σ_members share²,   share = member value / market total

    HHI ∈ (0, 1]: 1 = monopoly, 1/n = perfectly even n-way split.

    Exactness: member values quantize to integer cents and aggregate
    in DECIMAL(38,0); each member's share² is ONE fixed fp64
    expression over exact integers, pico-floored (∈ [0, 1e12],
    long-safe at any corpus size), then integer-summed across members
    — the order-independent cross-member reduction, same discipline
    as anova_f's bounded decomposition. top_share is a max over
    ppm-floored shares (max is order-free).

    Shape: one (market, member) partial agg, one market-total window
    over THAT aggregate (markets × members rows, never raw rows),
    one market rollup. Markets with total <= 0 drop (shares
    undefined for zero/negative-sum markets).

    Returns (market, n_members, top_share_ppm, hhi_pico).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    cents = F.round(F.col(value_col) * 100).cast("long")
    per_member = (
        df.select(
            F.col(market_col).alias("__m"),
            F.col(member_col).alias("__s"),
            cents.alias("__c"),
        )
        .groupBy("__m", "__s")
        .agg(F.sum(F.col("__c").cast(dec)).cast(dec).alias("__v"))
    )
    w = Window.partitionBy("__m")
    with_tot = per_member.select(
        "__m", "__v", F.sum("__v").over(w).cast(dec).alias("__t")
    ).filter(F.col("__t") > 0)
    share = F.col("__v").cast("double") / F.col("__t").cast("double")
    return (
        with_tot.select(
            "__m",
            F.floor(share * share * F.lit(1_000_000_000_000.0))
            .cast("long").alias("__p2"),
            F.floor(share * F.lit(1_000_000.0)).cast("long").alias("__ppm"),
        )
        .groupBy(F.col("__m").alias(market_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("__ppm").cast("long").alias("top_share_ppm"),
            F.sum("__p2").cast("long").alias("hhi_pico"),
        )
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences estimator — the workhorse
    quasi-experimental effect measure (did the treated segment's mean
    move MORE across the cutover than the control's, netting out the
    common time trend?):

        DiD = (m_t,post − m_t,pre) − (m_c,post − m_c,pre)
        SE  = sqrt(Σ_cells s²_cell / n_cell)   (Welch-style, unpooled)

    ``treat_col`` / ``post_col`` are boolean expressions or columns.
    All four cells need n >= 2 (cell variance undefined below) — the
    caller gets an empty frame, not a NaN.

    Exactness: values quantize to integer cents at birth; the 12 cell
    moments (n, Σx, Σx²) accumulate in DECIMAL(38,0) in ONE
    partial-agg pass with conditional sums (the welch_ttest discipline
    at four cells); DiD, SE, and t are one fixed-order fp64 expression
    tree over those exact integers, micro-floored.

    Shape: one full-scan aggregate to a single row; nothing shuffles
    but twelve numbers.

    Returns one row (n_t_pre, n_t_post, n_c_pre, n_c_post, did_micro,
    se_micro, t_micro) in cent-micro units.
    """
    dec = "decimal(38,0)"
    cents = F.round(F.col(value_col) * 100).cast("long")
    rows = df.select(
        F.col(treat_col).cast("boolean").alias("__tr"),
        F.col(post_col).cast("boolean").alias("__po"),
        cents.alias("__c"),
    ).filter(F.col("__tr").isNotNull() & F.col("__po").isNotNull())
    cd = F.col("__c").cast(dec)
    cells = {
        "t_post": F.col("__tr") & F.col("__po"),
        "t_pre": F.col("__tr") & ~F.col("__po"),
        "c_post": ~F.col("__tr") & F.col("__po"),
        "c_pre": ~F.col("__tr") & ~F.col("__po"),
    }
    aggs = []
    for name, cond in cells.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{name}"),
            F.sum(F.when(cond, cd)).cast(dec).alias(f"__s_{name}"),
            F.sum(F.when(cond, cd * cd)).cast(dec).alias(f"__q_{name}"),
        ]
    m = rows.groupBy().agg(*aggs)
    for name in cells:
        m = m.filter(F.col(f"n_{name}") >= 2)

    def mean(name):
        return F.col(f"__s_{name}").cast("double") / F.col(f"n_{name}").cast("double")

    def var_over_n(name):
        n = F.col(f"n_{name}").cast("double")
        s = F.col(f"__s_{name}").cast("double")
        q = F.col(f"__q_{name}").cast("double")
        return ((q - s * s / n) / (n - F.lit(1.0))) / n

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    se = F.sqrt(
        var_over_n("t_post") + var_over_n("t_pre")
        + var_over_n("c_post") + var_over_n("c_pre")
    )
    micro = F.lit(1_000_000.0)
    return m.select(
        "n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
        F.floor(did * F.lit(10_000.0)).cast("long").alias("did_micro"),
        F.floor(se * F.lit(10_000.0)).cast("long").alias("se_micro"),
        F.floor(did / se * micro).cast("long").alias("t_micro"),
    )


def fellegi_sunter_patterns(
    df: DataFrame,
    block_cols: list[str],
    compare_cols: list[str],
    id_col: str,
    m_micro: list[int] | None = None,
    u_micro: list[int] | None = None,
) -> DataFrame:
    """Fellegi-Sunter record-linkage pattern table (Fellegi & Sunter
    1969) — the probabilistic dedup/integration scorer for STRUCTURED
    records (the relational sibling of text minhash): candidate pairs
    come from blocking (equal ``block_cols`` — never all-pairs), each
    pair is reduced to its field-agreement bit pattern over
    ``compare_cols``, and every pattern gets the match weight
    ``Σ_f agree_f ? ln(m_f/u_f) : ln((1−m_f)/(1−u_f))`` — positive
    weight = evidence the pair is the same entity.

    m/u probabilities (P(agree | match), P(agree | non-match)) are
    caller-supplied micro integers (defaults 900000/100000 per field —
    the conventional starting prior; fit them offline with EM if
    labels exist). The per-field ln weights are computed ONCE in
    Python and embedded as integer micro-nat literals in both engines
    (the ndcg discount-table discipline), so the weight of a pattern
    is an exact integer sum.

    Scale shape: one self-join co-keyed on the blocking columns
    (candidate volume = Σ block² — pick blocks like a banding scheme),
    a pure projection to bit patterns, one partial-agg shuffle to the
    2^F-bounded pattern table. The id inequality keeps pairs ordered;
    pattern weights are plan-time constants.

    NULL convention (documented; ADVICE r12): field agreement uses
    null-safe equality (``eqNullSafe`` / SQL ``IS NOT DISTINCT FROM``),
    so NULL-vs-NULL counts as agreement and earns the positive match
    weight, while NULL-vs-value disagrees. This is a deliberate choice
    — a field both sources failed to record is weak shared evidence,
    and the alternative (excluding NULL comparisons) makes the weight
    scale vary per pair. Callers wanting the exclusion convention
    should pre-filter or coalesce the compare columns. The registered
    oracles mirror this with IS NOT DISTINCT FROM.

    Returns (pattern, n_pairs, weight_micro) — pattern is the
    agreement bitmask (bit f set = field f agreed), one row per
    OBSERVED pattern.
    """
    import math

    nf = len(compare_cols)
    if nf == 0 or nf > 16:
        raise ValueError("compare_cols must have 1..16 fields")
    if not block_cols:
        raise ValueError("block_cols must be non-empty (no all-pairs)")
    m_micro = m_micro or [900_000] * nf
    u_micro = u_micro or [100_000] * nf
    if len(m_micro) != nf or len(u_micro) != nf:
        raise ValueError("m_micro/u_micro must match compare_cols length")
    a = df.alias("a")
    b = df.alias("b")
    pair = a.join(b, block_cols).filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    return _fs_pattern_table(pair, compare_cols, m_micro, u_micro)


def _fs_pattern_table(
    pair: DataFrame,
    compare_cols: list[str],
    m_micro: list[int],
    u_micro: list[int],
    a_name=lambda c: f"a.{c}",
    b_name=lambda c: f"b.{c}",
) -> DataFrame:
    """Shared Fellegi-Sunter scorer: reduce a candidate pair frame
    (two sides addressed via ``a_name``/``b_name`` — dataframe-alias
    qualified by default, prefixed flat columns for the
    sorted-neighborhood join) to the 2^F-bounded (pattern, n_pairs,
    weight_micro) table with Python-embedded integer micro-nat field
    weights."""
    import math

    w_agree = [
        math.floor(math.log(m / u) * 1e6) for m, u in zip(m_micro, u_micro)
    ]
    w_disagree = [
        math.floor(math.log((1e6 - m) / (1e6 - u)) * 1e6)
        for m, u in zip(m_micro, u_micro)
    ]
    weight = None
    pattern = None
    for i, c in enumerate(compare_cols):
        agree = F.col(a_name(c)).eqNullSafe(F.col(b_name(c)))
        term = F.when(agree, F.lit(w_agree[i])).otherwise(F.lit(w_disagree[i]))
        bcol = F.when(agree, F.lit(1 << i)).otherwise(F.lit(0))
        weight = term if weight is None else weight + term
        pattern = bcol if pattern is None else pattern + bcol
    return (
        pair.select(
            pattern.cast("long").alias("pattern"),
            weight.cast("long").alias("weight_micro"),
        )
        .groupBy("pattern", "weight_micro")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select("pattern", "n_pairs", "weight_micro")
    )


def sorted_neighborhood_patterns(
    df: DataFrame,
    block_cols: list[str],
    sort_col: str,
    compare_cols: list[str],
    id_col: str,
    window: int = 3,
    m_micro: list[int] | None = None,
    u_micro: list[int] | None = None,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995) —
    the LINEAR-candidate scale path for :func:`fellegi_sunter_patterns`.
    Equality blocking is intrinsically quadratic in block size: a
    fixed-domain blocking key means 10× the records makes every block
    10× deeper and candidate pairs grow ~100× (measured,
    SCALING_DATA_linkage.json). Sorted-neighborhood instead sorts each
    block by ``sort_col`` (id tie-break) and pairs every record with
    only its next ``window`` neighbors — candidates = n·window, LINEAR
    in the corpus, trading recall for records whose sort keys land far
    apart (the standard remedy: union several passes with different
    sort keys).

    Sort keys must be NON-NULL (coalesce upstream): ascending NULL
    placement differs across engines (Spark NULLS FIRST, DuckDB NULLS
    LAST), so a NULL key would make the neighborhood itself
    engine-dependent.

    Scale shape: one per-block sort window for row numbers (spillable
    partition sort, linear), then the neighbor join is built as an
    EXPLICIT equi-join — each record explodes into ``window`` (block,
    rn+offset) probe keys joined against (block, rn) — so the plan
    never enumerates block² pairs and then filters; candidate volume
    is exactly n·window rows into the shared Fellegi-Sunter scorer.

    Returns (pattern, n_pairs, weight_micro) — same contract as
    :func:`fellegi_sunter_patterns`.
    """
    nf = len(compare_cols)
    if nf == 0 or nf > 16:
        raise ValueError("compare_cols must have 1..16 fields")
    if not block_cols:
        raise ValueError("block_cols must be non-empty")
    if window < 1:
        raise ValueError(f"window must be >= 1 (got {window})")
    m_micro = m_micro or [900_000] * nf
    u_micro = u_micro or [100_000] * nf
    if len(m_micro) != nf or len(u_micro) != nf:
        raise ValueError("m_micro/u_micro must match compare_cols length")
    from pyspark.sql import Window as W

    w = W.partitionBy(*block_cols).orderBy(F.col(sort_col), F.col(id_col))
    ranked = df.select(
        *block_cols, sort_col, id_col, *compare_cols
    ).withColumn("__rn", F.row_number().over(w).cast("long"))
    probes = ranked.select(
        *block_cols,
        F.explode(
            F.sequence(F.col("__rn") + 1, F.col("__rn") + window)
        ).alias("__target"),
        *[F.col(c).alias(f"__a_{c}") for c in [id_col, *compare_cols]],
    )
    right = ranked.select(
        *block_cols,
        F.col("__rn").alias("__target"),
        *[F.col(c).alias(f"__b_{c}") for c in [id_col, *compare_cols]],
    )
    joined = probes.join(right, [*block_cols, "__target"])
    return _fs_pattern_table(
        joined, compare_cols, m_micro, u_micro,
        a_name=lambda c: f"__a_{c}", b_name=lambda c: f"__b_{c}",
    )


def cem_att(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    strata_cols: list[str],
) -> DataFrame:
    """Coarsened exact matching ATT (Iacus, King & Porro 2012) — the
    design-based causal estimate for observational slices: coarsen the
    covariates into the caller's ``strata_cols`` bins, keep only
    strata containing BOTH treated and control units, weight each
    stratum's control mean to its treated count, and average:

        ATT = Σ_s (Σ y_treated,s − n_t,s · ȳ_control,s) / Σ_s n_t,s

    (the diff_in_diff/cuped sibling for when assignment isn't an
    experiment but covariate overlap exists).

    Exactness: outcomes must arrive as integers (micro-quantize
    upstream); per-stratum sums/counts are exact BIGINT/DECIMAL. The
    per-stratum term ``(Σy_t·n_c − n_t·Σy_c)·1e6 DIV n_c`` truncates
    ONCE per stratum and the final ATT is one more truncating DIV —
    both mirrored verbatim by an oracle, so the result is
    engine-exact despite the rational stratum means.

    Scale shape: one strata-keyed partial-agg shuffle (conditional
    sums collapse treated/control in the same pass), one bounded
    reduce over the stratum table (strata domain = the product of the
    coarsened bins, not the row count). No joins, no windows.

    Returns one row (n_strata_matched, n_treated, n_control,
    att_micro) over the matched strata.
    """
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    t = F.col(treat_col).cast("boolean")
    y = F.col(outcome_col).cast("long")
    per = df.groupBy(*strata_cols).agg(
        F.sum(t.cast("long")).cast("long").alias("n_t"),
        F.sum((~t).cast("long")).cast("long").alias("n_c"),
        F.sum(F.when(t, y).otherwise(F.lit(0))).cast("long").alias("sy_t"),
        F.sum(F.when(~t, y).otherwise(F.lit(0))).cast("long").alias("sy_c"),
    )
    matched = per.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    contrib = matched.select(
        "n_t",
        "n_c",
        F.expr(
            "CAST((CAST(sy_t AS DECIMAL(38,0)) * n_c"
            " - CAST(n_t AS DECIMAL(38,0)) * sy_c) * 1000000"
            " DIV n_c AS DECIMAL(38,0))"
        ).alias("__term"),
    )
    return contrib.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_matched"),
        F.sum("n_t").cast("long").alias("n_treated"),
        F.sum("n_c").cast("long").alias("n_control"),
        F.expr(
            "CAST(SUM(__term) DIV NULLIF(SUM(n_t), 0) AS BIGINT)"
        ).alias("att_micro"),
    )
