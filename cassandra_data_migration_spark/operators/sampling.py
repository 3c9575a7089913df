"""Deterministic sampling operators for training-data pipelines:
stable train/val/test splits, rate-controlled corpus sampling, and
weighted multi-source mixtures.

Why not ``df.sample()``: Spark's sampler is seed-deterministic only
for a FIXED partitioning — adding an executor or re-splitting the
scan reassigns rows.  A 100 TB corpus re-partitions constantly, so
membership must be a pure function of the ROW, not of the plan.
These operators derive a bucket in [0, 10000) from md5 of the id —
stable across engines (the DuckDB oracle recomputes it), partitions,
and re-runs, and it's a narrow scan-side expression: sampling pushes
no shuffle, and a split column costs one projected expression.

The same row-hash trick is what makes incremental re-processing safe:
a doc keeps its split forever, so retraining on a grown corpus never
leaks val docs into train.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_BUCKETS = 10_000


def hash_bucket(col: str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000): the first 8 hex digits of
    md5(salt || value) as an integer, mod 10000.  32 input bits over
    10^4 buckets keeps modulo bias < 0.003%."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % NUM_BUCKETS).cast("int")


def bucket_sql(col: str, salt: str = "") -> str:
    """The DuckDB-equivalent expression for :func:`hash_bucket` —
    kept beside it so the two definitions can't drift."""
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 8)"
        f" AS BIGINT) % {NUM_BUCKETS} AS INTEGER)"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of the
    id: bucket(id) < fraction·10000.  Supersets nest — a 1% sample is
    contained in the 10% sample with the same salt, which is what
    makes staged scale-up experiments comparable."""
    return df.filter(hash_bucket(id_col, salt) < int(round(fraction * NUM_BUCKETS)))


def split_column(
    id_col: str, weights: dict[str, float], salt: str = ""
) -> Column:
    """Label column assigning each row to one named split with the
    given weights (must sum to ~1).  Thresholds are cumulative over
    the bucket space, so changing one weight only migrates rows
    across the one moved boundary."""
    b = hash_bucket(id_col, salt)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * NUM_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return last


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Add a stable train/val/test-style ``split`` column.

    Pass a GROUP key (domain, source, author) instead of the document
    id for a leakage-safe split: every row of a group lands in the
    same side, so near-duplicates within a group can never straddle
    train and eval — the standard guard against contamination-by-
    provenance in pretraining splits."""
    return df.withColumn(out, split_column(id_col, weights, salt))


def negative_samples(
    df: DataFrame,
    id_col: str,
    corpus_size: int,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor row draws ``k`` uniform partners from the corpus, never
    itself.  Precondition: ids are dense ``0..corpus_size-1`` (the
    fixture layout; re-rank once offline otherwise) — that makes the
    draw pure row-local arithmetic: ``d = md5_draw(salt, id, j) %
    (N-1)``, then skip-self via ``d + 1`` when ``d >= id``, which is
    exactly uniform over the other N-1 ids.

    Physical shape: explode k per anchor (narrow), draws are
    codegen'd hash arithmetic, and the single shuffle is the join
    that attaches partner payloads — no global rank, no window, so it
    scales to any corpus the join itself can handle."""
    from cassandra_data_migration_spark.functions.hashing import md5_draw

    anchors = df.select(F.col(id_col)).withColumn(
        "neg_ix", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    d = md5_draw(salt, id_col, "neg_ix") % F.lit(corpus_size - 1)
    neg = F.when(d >= F.col(id_col), d + 1).otherwise(d)
    return anchors.withColumn("neg_id", neg.cast("long"))


def weighted_mixture(
    sources: list[tuple[str, DataFrame, float]], id_col: str
) -> DataFrame:
    """Union of per-source hash samples with a ``source`` label —
    the dataset-mixture step of corpus assembly (e.g. web 30%, books
    90%).  Each source is salted with its own name so membership
    draws are independent across sources; the union is narrow (no
    shuffle), so the mixture costs exactly the underlying scans."""
    parts = [
        hash_sample(df, id_col, frac, salt=name).withColumn(
            "source", F.lit(name)
        )
        for name, df, frac in sources
    ]
    outp = parts[0]
    for p in parts[1:]:
        outp = outp.unionByName(p)
    return outp


def hash_bucket_expr(key: Column, salt: str = "") -> Column:
    """:func:`hash_bucket` over an arbitrary string expression instead
    of a single column — same draw, same bias bound."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10
    ).cast("long")
    return (h % NUM_BUCKETS).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing /
    language-rebalancing step of corpus assembly (e.g. keep 50% of
    English but 100% of low-resource languages).  Membership is a pure
    function of (stratum, id): the draw key is ``stratum:id``, so
    changing one stratum's rate never reshuffles another's survivors,
    and supersets nest per stratum exactly as in :func:`hash_sample`.

    Scan-side filter — no shuffle, no per-stratum pass; one predicate
    evaluates every row regardless of how many strata exist (contrast
    ``df.sampleBy``, which is plan-dependent like ``df.sample``)."""
    key = F.concat(
        F.col(strata_col).cast("string"), F.lit(":"), F.col(id_col).cast("string")
    )
    bucket = hash_bucket_expr(key, salt)
    threshold = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        t = F.lit(int(round(frac * NUM_BUCKETS)))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    threshold = (
        threshold.otherwise(int(round(default_fraction * NUM_BUCKETS)))
        if threshold is not None
        else F.lit(int(round(default_fraction * NUM_BUCKETS)))
    )
    return df.filter(bucket < threshold)


def stratified_bucket_sql(
    strata_col: str, id_col: str, salt: str = "strat"
) -> str:
    """DuckDB twin of the :func:`stratified_sample` draw, kept beside
    it so the two definitions cannot drift."""
    key = f"CAST({strata_col} AS VARCHAR) || ':' || CAST({id_col} AS VARCHAR)"
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}' || {key}), 1, 8)"
        f" AS BIGINT) % {NUM_BUCKETS} AS INTEGER)"
    )


def _term_bucket(term: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket for a token: first 8 hex digits of
    md5(term) mod ``n_buckets`` — the portable analogue of DSIR's
    hashed n-gram featurizer (engine-reproducible, no vocab)."""
    h = F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
    return h % n_buckets


def dsir_importance(
    df: DataFrame,
    target_filter: Column,
    k: int = 100,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): pick the ``k`` raw documents whose hashed-unigram bag looks
    most like a target distribution.  Two hashed-unigram models are
    fit — target = rows matching ``target_filter``, raw = the whole
    corpus — with add-one smoothing over ``n_buckets`` buckets:

        p(b) = (c[b]+1) / (T+B)
        w(doc) = sum_tokens  log p_target(b(t)) - log p_raw(b(t))

    Per-bucket log-ratios are e6-rounded BIGINTs so document sums are
    exact integers, independent of token order and partitioning; the
    deterministic analogue of DSIR's Gumbel resampling is top-k by
    (weight, id).

    Physical plan: the model pass shuffles ``n_buckets`` (≤64) partial
    counts (map-side combined); the fitted log-ratio table re-enters
    as a 1-row broadcast map, so scoring is a scan-stage fold over the
    token array with no join, and the top-k is a TakeOrdered (no
    global sort).  At 100 TB both passes are embarrassingly parallel.
    """
    from cassandra_data_migration_spark.operators.text import tokens

    toks = tokens(text_col)
    flat = df.select(
        target_filter.cast("int").alias("_is_t"),
        F.explode(toks).alias("_term"),
    ).select("_is_t", _term_bucket(F.col("_term"), n_buckets).alias("_b"))
    counts = flat.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_c_raw"),
        F.sum("_is_t").alias("_c_tgt"),
    )
    totals = counts.agg(
        F.sum("_c_raw").alias("_t_raw"), F.sum("_c_tgt").alias("_t_tgt")
    )
    b = F.lit(float(n_buckets))
    lr_e6 = F.round(
        F.lit(1000000.0)
        * (
            F.log((F.col("_c_tgt") + 1.0) / (F.col("_t_tgt") + b))
            - F.log((F.col("_c_raw") + 1.0) / (F.col("_t_raw") + b))
        ),
        0,
    ).cast("bigint")
    model = (
        counts.crossJoin(F.broadcast(totals))
        .select(F.col("_b"), lr_e6.alias("_lr"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_b"), F.col("_lr")))
            ).alias("_m")
        )
    )
    scored = (
        df.select(F.col(id_col), toks.alias("_t"))
        .crossJoin(F.broadcast(model))
        .select(
            F.col(id_col),
            F.size("_t").cast("bigint").alias("n_tokens"),
            F.aggregate(
                F.col("_t"),
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + F.col("_m")[_term_bucket(t, n_buckets)],
            ).alias("weight_e6"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "weight_e6",
            F.round(F.col("weight_e6") * 1.0 / 1000000.0, 4).alias("weight"),
        )
    )
    return scored.orderBy(F.desc("weight_e6"), F.asc(id_col)).limit(k)


def token_budget_select(
    df: DataFrame,
    budget: int,
    priority_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents in priority order until a global token budget
    is exhausted: walk rows in (priority DESC, id ASC) order and keep
    every row whose inclusive running token total is <= ``budget`` —
    the standard "fill the training mix to N tokens" step.

    A naive implementation is a GLOBAL ordered cumsum — a single-
    partition sort of the whole corpus, the classic 100 TB scale
    killer.  Instead, selection is split in two exact phases:

    1. Per-priority-value token totals (one O(distinct priorities)
       map-side-combined aggregation) are cumsum'd on the driver —
       priorities are coarse features (scores, lengths), so this is
       KBs, not data — yielding the cutoff priority p* and the budget
       remaining when the walk reaches p*.
    2. Rows with priority > p* are kept by a scan-side filter (no
       sort at all); ONLY the p* stratum runs a windowed cumsum, and
       that window is partitioned on the priority value, so the sort
       covers one stratum instead of the corpus.

    The result equals the naive global walk exactly (the oracle states
    it as one window cumsum).
    """
    d = df.select(
        F.col(id_col),
        F.col(priority_col).alias("_prio"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    )
    per_prio = (
        d.groupBy("_prio").agg(F.sum("n_tokens").alias("_tot")).collect()
    )
    running = 0
    cutoff = None  # first priority whose stratum crosses the budget
    remaining = budget
    for row in sorted(per_prio, key=lambda r: r["_prio"], reverse=True):
        if running + row["_tot"] > budget:
            cutoff = row["_prio"]
            remaining = budget - running
            break
        running += row["_tot"]
    out_cols = [
        F.col(id_col),
        F.col("_prio").alias(priority_col),
        "n_tokens",
    ]
    if cutoff is None:  # whole corpus fits
        return d.select(*out_cols)
    kept_hi = d.filter(F.col("_prio") > F.lit(cutoff))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_prio")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_edge = (
        d.filter(F.col("_prio") == F.lit(cutoff))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= F.lit(remaining))
    )
    return kept_hi.select(*out_cols).unionByName(kept_edge.select(*out_cols))


def aes_key(
    group_col: str, id_col: str, weight_col: str, salt: str = "wsample"
) -> Column:
    """The Efraimidis–Spirakis sort key ``−ln(u)/w`` with ``u`` drawn
    from the portable md5 hash of (salt, group, id) — shared by the
    batch sampler and the streaming reservoir so the two can never
    disagree about which rows win."""
    draw32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(salt),
                    F.col(group_col).cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (draw32 + 1) / F.lit(float(1 << 32))
    return -F.log(u) / F.col(weight_col)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 5,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    group — Efraimidis–Spirakis A-ES (public algorithm): each row
    draws u ~ U(0,1) from the portable md5 hash and is ranked by
    ``-ln(u)/w``; the k smallest keys per group are an exact weighted
    sample without replacement.  Engine-reproducible: the same rows
    win in Spark, DuckDB, or plain Python because the draw is
    content-derived, not RNG-state-derived.

    Plan: scan-side draw + ONE per-group window rank (single shuffle
    on the group key); no global sort.  At 100 TB the window's
    per-group sort is bounded by group size — for heavy groups,
    pre-filter with a per-partition top-k (TakeOrdered shape) before
    the window if profiling demands it."""
    from pyspark.sql import Window

    key = aes_key(group_col, id_col, weight_col, salt)
    w = Window.partitionBy(group_col).orderBy(F.asc("_akey"), F.asc(id_col))
    # A-ES is defined for w > 0: a zero/NULL weight makes the key NULL
    # (non-ANSI division), and NULLs sort FIRST ascending — such rows
    # would always win the sample, the opposite of zero-probability.
    # Exclude them up front (standard A-ES precondition).
    df = df.filter(F.col(weight_col) > 0)
    return (
        df.withColumn("_akey", key)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(group_col, id_col, weight_col)
    )


def ab_test_readout(
    df: DataFrame,
    unit_col: str = "user_id",
    metric_col: str = "value",
    salt: str = "exp1",
    treatment_pct: int = 50,
) -> DataFrame:
    """Experiment readout over a deterministic assignment: units hash
    into treatment/control via the salted md5 bucket (same draw as
    ``hash_split`` — stable across reruns and engines), and each arm
    reports n, mean, variance, and the Welch z-score of the
    treatment-control difference.

    Exactness: Σx and Σx² accumulate as DECIMALs (order-independent);
    means/variances derive from those exact sums at the edge, so both
    engines produce identical doubles.  One scan, one map-combined
    aggregation; the z-score computes on the 2-row result.

    (At 10¹² rows the Σx² DECIMAL(38,12) would overflow — switch the
    accumulator to e6 fixed-point BIGINT pairs as in
    ``linalg.gram_matrix``; at fixture scale the decimal form is
    clearer and exact.)"""
    arm = F.when(
        hash_bucket_expr(F.col(unit_col).cast("string"), salt=salt)
        < F.lit(treatment_pct * NUM_BUCKETS // 100),
        "treatment",
    ).otherwise("control")
    x = F.col(metric_col).cast("decimal(18,6)")
    stats = (
        df.select(arm.alias("arm"), x.alias("_x"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_x").alias("_sx"),
            F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,12)")).alias(
                "_sxx"
            ),
        )
    )
    mean = (F.col("_sx").cast("double") / F.col("n")).alias("mean")
    var = (
        (
            F.col("_sxx").cast("double")
            - F.col("_sx").cast("double")
            * F.col("_sx").cast("double")
            / F.col("n")
        )
        / (F.col("n") - 1)
    ).alias("variance")
    per_arm = stats.select("arm", "n", mean, var)
    t = per_arm.filter(F.col("arm") == "treatment").select(
        F.col("n").alias("_nt"),
        F.col("mean").alias("_mt"),
        F.col("variance").alias("_vt"),
    )
    c = per_arm.filter(F.col("arm") == "control").select(
        F.col("n").alias("_nc"),
        F.col("mean").alias("_mc"),
        F.col("variance").alias("_vc"),
    )
    z = (F.col("_mt") - F.col("_mc")) / F.sqrt(
        F.col("_vt") / F.col("_nt") + F.col("_vc") / F.col("_nc")
    )
    return t.crossJoin(c).select(
        F.col("_nt").alias("n_treatment"),
        F.col("_nc").alias("n_control"),
        F.round(F.col("_mt"), 6).alias("mean_treatment"),
        F.round(F.col("_mc"), 6).alias("mean_control"),
        F.round(F.col("_mt") - F.col("_mc"), 6).alias("lift"),
        F.round(z, 6).alias("welch_z"),
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual/domain
    α-sampling rule, cf. XLM/mT5: p_i ∝ n_i^α) — α < 1 upsamples the
    tail domains relative to their natural share, α = 1 is natural
    mixing.  A domain's admission rate is

        rate_i = min(1, target_total · n_i^α / Σ_j n_j^α / n_i)

    and each row draws a deterministic md5 key — so membership is a
    pure row function, repartition-invariant and engine-reproducible.
    Rates are fixed to e6 integers before the compare (both engines
    round the one float expression once), making the selected SET
    bit-identical cross-engine, not just the expected counts.

    Plan: one O(groups) count aggregate → rates broadcast back → a
    scan-side integer compare.  The corpus shuffles nothing.

    Returns the sampled rows with the per-domain rate attached:
    (id, group, rate_e6)."""
    from pyspark.sql import Window

    from cassandra_data_migration_spark.functions.hashing import md5_draw

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # O(groups) rows: the unpartitioned totals window is over domains,
    # never data
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pw = F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    rate = F.least(
        F.round(
            F.lit(float(target_fraction))
            * F.sum("_n").over(w).cast("double")
            * pw
            / F.sum(pw).over(w)
            / F.col("_n")
            * 1_000_000.0,
            0,
        ),
        F.lit(1_000_000.0),
    )
    rates = counts.select(
        group_col, rate.cast("long").alias("rate_e6")
    )
    draw_e6 = F.pmod(md5_draw(salt, group_col, id_col), F.lit(1_000_000))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(draw_e6 < F.col("rate_e6"))
        .select(id_col, group_col, "rate_e6")
    )


def preference_pairs(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """RLHF/DPO preference-pair construction: within each group, pair
    the i-th best-scored row with the i-th worst (i = 1..k), keeping
    only pairs with a strictly positive score margin — the standard
    chosen/rejected data prep when preferences come from a scalar
    reward or quality model rather than human labels.

    Deterministic: ordering is (score desc, id asc), so ties break
    identically in every engine and every run.  Pairing best-with-
    worst (not adjacent ranks) maximizes the margin per pair, which
    is what margin-weighted DPO variants want.

    Plan shape: two row_number windows over the SAME (group) exchange
    — Catalyst computes both in one Window node after one shuffle;
    the top-k/bottom-k cut drops everything but 2k rows per group
    before the self-join, so the join input is tiny regardless of
    corpus size.  A group's rows are window-partition-bounded; at
    100 TB the group key must be a real partitioning key (source /
    domain / prompt-cluster), which is the semantics anyway.
    """
    from pyspark.sql import Window as W

    w_desc = W.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_asc = W.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).desc()
    )
    ranked = df.select(
        F.col(group_col),
        F.col(id_col),
        F.col(score_col),
        F.row_number().over(w_desc).alias("_rb"),
        F.row_number().over(w_asc).alias("_rw"),
    )
    chosen = ranked.filter(F.col("_rb") <= k).select(
        F.col(group_col),
        F.col("_rb").alias("pair_ix"),
        F.col(id_col).alias("chosen_id"),
        F.col(score_col).alias("chosen_score"),
    )
    rejected = ranked.filter(F.col("_rw") <= k).select(
        F.col(group_col),
        F.col("_rw").alias("pair_ix"),
        F.col(id_col).alias("rejected_id"),
        F.col(score_col).alias("rejected_score"),
    )
    return (
        chosen.join(rejected, [group_col, "pair_ix"])
        .filter(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            group_col,
            F.col("pair_ix").cast("long").alias("pair_ix"),
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 4
            ).alias("margin"),
        )
    )


def doremi_domain_weights(
    docs,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    unigram_vocab: int = 50,
    bigram_vocab: int = 200,
    bigram_context: int = 200,
):
    """One DoReMi-style multiplicative-weights round over domains
    (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
    Language Model Pretraining" — public paper): domains where the
    weak PROXY model underperforms the stronger REFERENCE model get
    upweighted, concentrating the training mixture on hard-but-
    learnable data.

    Stand-ins at engine level: proxy = the corpus BIGRAM LM (the
    higher-capacity model still far from fitting its domain), reference
    = the unigram LM (the same two quality scorers the CCNet ladder
    uses, operators/text.py) — per-token negative log-prob gaps play
    the excess-loss role, and domains whose token ORDER the bigram
    model explains worst carry the largest positive excess.  The update is the LINEARIZED step
    ``w_d ∝ 1 + excess_d`` (exact integer arithmetic end-to-end, so
    the DuckDB twin matches bit-for-bit; the exp() form differs only
    at O(excess²) for the small per-token gaps seen here and would
    hinge on cross-engine libm parity).

    Output per domain: (group, n_docs, excess_e6, weight_ppm) with
    weight_ppm summing to ~1e6.  EVERY input domain appears exactly
    once: n_docs counts ALL its documents, while excess averages over
    its scoreable ones (>=2 tokens — the bigram model needs a bigram);
    a domain with no scoreable documents carries excess 0 and the
    baseline weight rather than silently vanishing from the mixture.  Plan shape: the two LM scorers are
    scan-side folds over broadcast tables (see their docstrings); the
    composition adds one doc_id join and an O(domains) aggregate —
    nothing new shuffles at scale.
    """
    from pyspark.sql import functions as F

    from cassandra_data_migration_spark.operators.text import (
        bigram_logprob,
        unigram_logprob,
    )

    uni = unigram_logprob(
        docs, vocab_size=unigram_vocab, id_col=id_col, text_col=text_col
    ).select(
        id_col, F.col("logprob_e6").alias("_ulp"), F.col("n_tokens").alias("_un")
    )
    big = bigram_logprob(
        docs,
        vocab_size=bigram_vocab,
        context_size=bigram_context,
        id_col=id_col,
        text_col=text_col,
    ).select(
        id_col, F.col("logprob_e6").alias("_blp"), F.col("n_bigrams").alias("_bn")
    )
    per_doc = (
        docs.select(id_col, group_col)
        .join(uni, id_col)
        .join(big, id_col)
        .select(
            group_col,
            F.floor(
                F.greatest(
                    F.lit(0.0),
                    (-F.col("_blp")) * 1.0 / F.col("_bn")
                    - (-F.col("_ulp")) * 1.0 / F.col("_un"),
                )
                + F.lit(0.5)
            )
            .cast("long")
            .alias("_excess_e6"),
        )
    )
    scored = per_doc.groupBy(group_col).agg(
        F.floor(F.avg("_excess_e6") + F.lit(0.5))
        .cast("long")
        .alias("excess_e6"),
    )
    dom = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(scored, group_col, "left")
        .select(
            group_col,
            "n_docs",
            F.coalesce(F.col("excess_e6"), F.lit(0).cast("long")).alias(
                "excess_e6"
            ),
        )
    )
    tot = dom.agg(
        F.sum(F.lit(1_000_000) + F.col("excess_e6")).alias("_s")
    )
    return (
        dom.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            "excess_e6",
            F.floor(
                (F.lit(1_000_000) + F.col("excess_e6"))
                * F.lit(1_000_000.0)
                / F.col("_s")
            )
            .cast("long")
            .alias("weight_ppm"),
        )
    )
