"""Deterministic sampling for training-data mixes (north star).

Corpus pipelines need samples that are (a) reproducible across runs and
engines, (b) stable under repartitioning, and (c) cheap at 100 TB.
``df.sample()`` is none of these (seeded per-partition RNG — resplitting
the input changes the sample). Hash-gating is all three: a row is kept
iff a hash of its key falls below the fraction threshold, so membership
is a pure function of the key. The gate compares the leading 15 hex
digits of md5(key) against the fraction rendered as 15-digit hex —
fixed-width lowercase hex compares identically as a string in every
engine (and md5, unlike xxhash64, exists everywhere), so the DuckDB
oracle reproduces the exact sample.

Scale shape: a filter on a codegen'd hash — no shuffle, no state, prunes
at full scan speed; stratified mixing is the same filter with a
per-stratum threshold from a CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits of the md5 — plenty of resolution for any
# practical fraction, and exact in BIGINT for anyone converting.
_HEX_DIGITS = 15
_SPACE = 16 ** _HEX_DIGITS


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    n = int(fraction * _SPACE)
    if n >= _SPACE:
        # saturate: 'g' sorts after every hex digit, so every fixed-width
        # hex prefix passes (a 16-char numeric rendering would string-sort
        # BELOW 15-char prefixes and silently keep ~1/16 instead of all)
        return "g"
    return format(n, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key.

    Same key ⇒ same verdict on every run, engine, and partitioning; a
    different ``salt`` draws an independent sample (e.g. independent
    subsamples for ablations).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(_hash_prefix(key) < F.lit(_threshold_hex(fraction)))


def stratified_mix(df: DataFrame, stratum_col: str, key_col: str,
                   fractions: dict[str, float], salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix weighting
    step (e.g. keep 100% of books, 10% of web). Strata absent from
    ``fractions`` are dropped; the verdict is the same hash gate as
    ``hash_sample`` with the threshold chosen by stratum."""
    if not fractions:
        raise ValueError(
            "stratified_mix requires at least one stratum fraction "
            "(an empty mix would silently drop the whole corpus)"
        )
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    case = None
    for s, f in sorted(fractions.items()):
        cond = F.col(stratum_col) == F.lit(s)
        t = F.lit(_threshold_hex(f))
        case = F.when(cond, t) if case is None else case.when(cond, t)
    thr = case.otherwise(F.lit(""))  # unknown stratum: nothing sorts below ''
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(_hash_prefix(key) < thr)


def split_train_eval(df: DataFrame, key_col: str, eval_fraction: float = 0.01,
                     salt: str = "split") -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split by key hash:
    the eval set is the bottom ``eval_fraction`` of the hash space, train
    is everything else — membership never changes as the corpus grows
    (a new row lands on one fixed side), the property that prevents
    train/eval contamination across pipeline re-runs."""
    thr = F.lit(_threshold_hex(eval_fraction))
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    prefix = _hash_prefix(key)
    return df.filter(prefix >= thr), df.filter(prefix < thr)


def hash_sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_expr: Column,
    seed: str = "w-0",
) -> DataFrame:
    """Deterministic IMPORTANCE sampling (round 7): keep a row iff its
    uniform hash draw falls under its per-row weight — u(key) <
    clamp(w, 0, 1), where u is the first 12 hex digits of
    md5(seed:key) over 2^48. Membership is a pure function of (key,
    seed, weight): reproducible across runs, engines, and
    partitionings (the per-row generalization of hash_sample's fixed
    fraction), which is what quality-proportional corpus downsampling
    needs — e.g. weight = a quality score in [0, 1] keeps high-quality
    documents at full rate and low-quality ones proportionally.

    The 48-bit draw is exact in a double (2^48 < 2^53), so the
    comparison is bit-identical in any engine with md5 and IEEE
    doubles; inclusion uses strict ``<`` (weight 0 keeps nothing,
    weight >= 1 keeps everything). Shuffle-free: a scan-side filter,
    same plan shape as hash_sample."""
    from .scale import md5_tag48

    u = (
        md5_tag48(
            F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string"))
        ).cast("double")
        / F.lit(281474976710656.0)  # 16^12 = 2^48
    )
    w = F.least(F.greatest(weight_expr.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(u < w)


def temperature_mix_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
    seed: str = "mix-0",
) -> DataFrame:
    """TEMPERATURE-based source re-balancing (round 8) — the
    multilingual/mixture standard (XLM-R, mT5): sample source s with
    probability proportional to p_s^alpha, flattening the source
    distribution (alpha < 1 upsamples small sources relative to big
    ones; alpha = 1 is proportional sampling, where every source's rate
    degenerates to exactly ``target_frac``). Per-source keep rate:

        rate_s = min(1, target_frac · N · q_s / n_s),
        q_s = p_s^alpha / Σ_t p_t^alpha,   p_s = n_s / N,

    fixed to 6 decimals (the engine-portable rounding), then applied as
    a deterministic per-row hash gate (:func:`hash_sample_weighted` —
    u(seed:id) < rate_s), so the admitted SET is a pure function of
    (corpus, seed, alpha, target_frac), bit-identical across engines.
    alpha = 0.5 computes the power as SQRT — correctly-rounded IEEE in
    every engine, unlike generic pow whose last ulp is libm-specific
    (rates are fix6-rounded either way, so generic alpha still matches
    oracles except within an ulp of a rounding boundary).

    DELIBERATE deviation from the paper mixtures: XLM-R/mT5 sample WITH
    replacement and therefore realize q_s exactly even when a tiny
    source needs >1x its size; a deterministic KEEP-GATE cannot
    replicate rows, so ``rate_s`` caps at 1 and the clipped mass is NOT
    redistributed — a capped source contributes all its rows, the
    realized mix flattens toward the cap, and the admitted total can
    fall below ``target_frac``·N. Upsampling past 1x is this pipeline's
    job for the multi-epoch plan (queries.sample_multi_epoch_plan
    replicates small sources across epochs), composed downstream of
    this gate.

    Returns the admitted rows as (id, source, n_s, rate). Scale shape:
    one source-count aggregate (O(#sources) rows), two 1-row reductions
    crossJoined back as coalesced broadcasts (the metadata-crossJoin
    house rule), then a broadcast join + scan-side filter — no
    corpus-sized shuffle and no window."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0, 1], got {target_frac}")
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    tot = counts.agg(F.sum("n_s").cast("double").alias("n_tot")).coalesce(1)
    withp = counts.crossJoin(F.broadcast(tot)).withColumn(
        "p_s", F.col("n_s") / F.col("n_tot")
    )
    w_expr = (
        F.sqrt(F.col("p_s")) if alpha == 0.5
        else F.pow(F.col("p_s"), F.lit(float(alpha)))
    )
    weighted = withp.withColumn("w_s", w_expr)
    z = weighted.agg(F.sum("w_s").alias("z")).coalesce(1)
    fix6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    rates = (
        weighted.crossJoin(F.broadcast(z))
        .withColumn(
            "rate",
            fix6(F.least(
                F.lit(1.0),
                F.lit(float(target_frac)) * F.col("n_tot")
                * (F.col("w_s") / F.col("z")) / F.col("n_s"),
            )),
        )
        .select(source_col, "n_s", "rate")
    )
    gated = hash_sample_weighted(
        df.select(id_col, source_col).join(F.broadcast(rates), source_col),
        id_col, F.col("rate"), seed=seed,
    )
    return gated.select(id_col, source_col, "n_s", "rate")


def score_bucket(
    score: Column, lo: float = 0.0, hi: float = 1.0, buckets: int = 10000
) -> Column:
    """Fixed-width bin of a BOUNDED score: clamp to [lo, hi], quantize
    into ``buckets`` bins (top edge folds into the last bin). Monotone
    nondecreasing in the score — the invariant the histogram-CDF
    operators below (quantile gate, global curriculum rank) rely on."""
    s = score.cast("double")
    clamped = F.greatest(F.least(s, F.lit(float(hi))), F.lit(float(lo)))
    return F.least(
        F.floor((clamped - F.lit(float(lo)))
                * F.lit(float(buckets)) / F.lit(float(hi - lo))),
        F.lit(buckets - 1),
    ).cast("bigint")


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    drop_frac_num: int,
    drop_frac_den: int,
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 10000,
    cache_input: bool = True,
) -> DataFrame:
    """CORPUS-RELATIVE quality gate: drop (approximately, conservatively)
    the lowest ``drop_frac_num/drop_frac_den`` fraction of rows by
    ``score_col`` — the DCLM/FineWeb-style percentile filter, where the
    cut moves with the corpus instead of a hand-tuned constant.

    An exact distributed quantile needs a global sort (or a driver-side
    exact-percentile aggregate that buffers every value — neither
    survives 100 TB), so this quantizes the BOUNDED score domain
    [lo, hi] into ``buckets`` fixed-width bins and takes the histogram
    CDF: one map-side-combinable groupBy over <= ``buckets`` keys, one
    window over the <= ``buckets``-row histogram (bounded by the knob,
    never by corpus size — the one single-partition window here is over
    at most 10k rows), then a broadcast of the 1-row threshold back onto
    the scan. Whole buckets are dropped while the running count stays
    <= floor(N * num / den) — integer arithmetic, so the admitted SET is
    exact and engine-portable (no float-percentile boundary drift), and
    the realized drop rate is <= the requested one (ties at the cut
    survive; resolution is (hi-lo)/buckets).

    Returns the surviving rows of ``df`` plus their ``_qbucket``.
    """
    if drop_frac_num < 0 or drop_frac_den <= 0 or drop_frac_num > drop_frac_den:
        raise ValueError("drop_frac must satisfy 0 <= num/den <= 1")
    # cached when the input is NARROW (round 18, the winnow_near_dup
    # precedent): the bucketed relation is consumed TWICE here
    # (histogram + the final gate) and downstream cap/rank stages
    # typically consume the gate's output twice more — uncached, the
    # whole upstream chain re-executes per consumer. The bench clears
    # the cache every attempt, so population stays inside the timed
    # region (honest per-run cost). ``cache_input=False`` is for WIDE
    # callers: measured on the config-path curation chain (gate input
    # carries the reassembled document text), materializing the
    # full-text InMemoryRelation cost MORE than the re-execution it
    # saved (stage A/B: +5.5 s with the cache vs +0.15 s without) —
    # column pruning per consumer beats caching unprunable rows.
    b = df.withColumn(
        "_qbucket", score_bucket(F.col(score_col), lo, hi, buckets)
    )
    if cache_input:
        b = b.cache()
    hist = b.groupBy("_qbucket").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    # histogram-sized window: <= `buckets` rows on one task by design.
    # N rides the SAME window as the running count (round 19): the full
    # unbounded frame shares the cdf's partition/order spec, so both
    # land in one WindowExec and the separate 1-row `total` aggregate —
    # previously its own broadcast subquery, i.e. one more serial job
    # per gate on every curation chain — disappears. sum(_c) over the
    # histogram is provably the corpus count (every row lands in
    # exactly one bucket); no second corpus scan either way.
    w = Window.orderBy("_qbucket")
    cdf = hist.select(
        "_qbucket",
        F.sum("_c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("_c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    )
    thresh = (
        cdf.filter(
            # integer `div`: floor(N * num / den) with no float on the path
            F.col("_cum")
            <= F.expr(f"(_n * {drop_frac_num}) div {drop_frac_den}")
        )
        .groupBy()
        .agg(F.coalesce(F.max("_qbucket"), F.lit(-1)).alias("_t"))
    )
    return (
        b.crossJoin(F.broadcast(thresh.coalesce(1)))
        .filter(F.col("_qbucket") > F.col("_t"))
        .drop("_t")
    )


def curriculum_rank(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 10000,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT curriculum position by (score, id) — easy-to-hard ordering
    for curriculum training — WITHOUT a global sort; global by default,
    per-group when ``partition_cols`` is given (the per-source ranking
    behind domain caps). A naive ``row_number() OVER (ORDER BY score)``
    funnels the whole corpus (or a whole mega-source) through one task;
    instead: quantize the bounded score (:func:`score_bucket`, monotone,
    so bucket order == score order) → histogram → per-bucket STARTING
    OFFSET via a window over the <= groups × ``buckets``-row histogram
    (bounded by the knobs, not the corpus) → broadcast-join offsets
    back → per-(group, BUCKET) ``row_number`` ordered by (score, id) —
    a KEYED window whose partitions are group-size/buckets rows.
    rank = bucket offset + within-bucket position: bit-identical to the
    single-sort answer (the DuckDB twin IS the naive window), 1-based,
    dense, deterministic via the id tie-break.
    """
    parts = list(partition_cols or [])
    b = df.withColumn(
        "_qbucket", score_bucket(F.col(score_col), lo, hi, buckets)
    )
    hist = b.groupBy(*parts, "_qbucket").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    # histogram-sized window: <= groups x `buckets` rows, keyed by group
    offs = hist.withColumn(
        "_below",
        F.coalesce(
            F.sum("_c").over(
                Window.partitionBy(*parts)
                .orderBy("_qbucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(*parts, "_qbucket", "_below")
    w = Window.partitionBy(*parts, "_qbucket").orderBy(
        F.col(score_col).cast("double"), F.col(id_col)
    )
    return (
        b.join(F.broadcast(offs), [*parts, "_qbucket"])
        .withColumn(
            "curriculum_rank",
            (F.col("_below") + F.row_number().over(w)).cast("bigint"),
        )
        .drop("_below")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    cap: int,
    id_col: str = "doc_id",
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 10000,
) -> DataFrame:
    """PER-DOMAIN CAP: keep at most ``cap`` rows per group, best-first
    by score (id tie-break) — the Common-Crawl-style guard against one
    domain flooding the corpus. The per-group top-``cap`` is exact: the
    ordering inverts the bounded score (``lo + hi - score``, monotone
    decreasing) and reuses :func:`curriculum_rank`'s histogram
    construction, so no group is ever sorted on one task no matter how
    large — the mega-domain case is exactly when the naive
    ``row_number() OVER (PARTITION BY domain)`` dies. Returns the
    surviving rows with ``rank_in_group``.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    inv = df.withColumn(
        "_inv_score", F.lit(float(lo + hi)) - F.col(score_col).cast("double")
    )
    ranked = curriculum_rank(
        inv, "_inv_score", id_col=id_col, lo=lo, hi=hi, buckets=buckets,
        partition_cols=group_cols,
    )
    return (
        ranked.filter(F.col("curriculum_rank") <= cap)
        .withColumnRenamed("curriculum_rank", "rank_in_group")
        .drop("_inv_score", "_qbucket")
    )


def dsir_scored(
    df: DataFrame,
    target_df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    target_flag=None,
) -> DataFrame:
    """The SCORED-ONLY half of :func:`dsir_log_weights` (round 15):
    (id_col, n_feats, log_weight) for every document with >= 1 bigram —
    no universe left-join, so a consumer that drops no-evidence rows
    anyway (the curation ``dsir`` stage's threshold gate) never pays
    the corpus-wide doc_id distinct + join that the full surface needs
    to keep zero-bigram docs visible. Same determinism kit and scale
    shape as the public wrapper below.

    DSIR-style importance weights for data selection (round 14 —
    the published hashed-n-gram importance-resampling recipe, Xie et
    al. 2023): fit two bag-of-hashed-bigram categorical distributions —
    ``p`` over a small TARGET corpus (the distribution you want more
    of) and ``q`` over the raw corpus being selected from — and score
    every raw document by its log importance weight
    ``log w(x) = Σ_f count_f(x) · log(p_f / q_f)`` over its hashed
    features. Resampling by these weights shifts the selected corpus
    toward the target distribution; a fixed threshold at 0 keeps the
    "more target-like than raw" half.

    Determinism across engines (the repo's standard kit): features are
    md5-bucketed bigrams (md5, not xxhash64, so DuckDB replays the
    bucketing bit-for-bit), each feature's log-ratio is fixed to 6
    decimals BEFORE the per-doc aggregation, and the aggregation is a
    decimal-bridge sum — order-independent in both engines. Add-α
    smoothing keeps every bucket's ratio finite (a bucket unseen in
    both corpora contributes log(α·q_total' / α·p_total') — a constant
    per-occurrence prior offset, not a NaN).

    Scale shape (round 18 — see OPTIMIZATION_r18.md): ONE tokenize +
    md5 pass over the raw corpus. The per-(doc, bucket) count aggregate
    is the shared subtree — the corpus bucket counts ``q`` are its
    ``groupBy(f)`` rollup and the per-doc scoring join+sum consumes it
    directly, so the exchange above the bigram explode is planned once
    and ReuseExchange'd by both consumers (the pre-r18 shape tokenized
    and hashed the whole corpus TWICE, once for q and once for the
    scoring occurrences, and both passes ran inside the one-task
    single-row-group fixture scan). The ratio table is at most
    ``n_buckets`` rows and BROADCASTS; the scoring join+sum is
    map-side-combinable over distinct (doc, bucket) pairs rather than
    raw occurrences. No corpus-sized shuffle beyond the per-doc
    groupBy, no Python. Docs with no bigrams (0/1 token) surface with
    n_feats = 0 and a NULL weight ("no evidence"), never vanish —
    the bigram_lm_score discipline.

    ``target_flag`` (round 19 — the SELF-TARGET fusion): when the
    target corpus is a FILTER OF ``df`` ITSELF (the standard DSIR
    deployment — "more rows like this slice of the same corpus"), pass
    the membership predicate as a Column instead of a ``target_df`` and
    the target counts ``p`` come from the SAME per-(doc, f) aggregate
    as ``q`` and the scoring join: the flag rides the one corpus
    tokenize+md5 pass and ``p`` is the flagged rollup — the separate
    tokenize+md5+explode pass over the target slice (a second full
    scan + generate of up to the whole corpus) disappears from the
    plan. Provably identical: target occurrences per bucket =
    Σ per-(doc, f) counts over flagged docs, the same integers the
    two-pass shape counted. The flag must be a row-level predicate
    over ``df``'s columns (evaluated before tokenization; NULL ⇒ not
    target, matching ``df.filter``). One edge documented like the
    operator's other isnotnull notes: null-``id`` target rows no
    longer contribute to ``p`` (the shared aggregate drops them);
    vacuous whenever the id is a key. Exactly one of ``target_df`` /
    ``target_flag`` must be given."""
    from .scale import spread_if_narrow
    from .text import TOKEN_SPLIT_RE, drop_empty_tokens

    if (target_df is None) == (target_flag is None):
        raise ValueError(
            "dsir_scored: pass exactly one of target_df or target_flag"
        )

    def feats(d: DataFrame, keep_id: bool, flag=None) -> DataFrame:
        cols = [
            F.col(id_col).alias("doc"),
            F.col(text_col).alias("_dsir_txt"),
        ]
        if flag is not None:
            cols.append(flag.cast("boolean").alias("_t"))
        t = d.select(*cols)
        # adaptive spread BEFORE the tokenize+explode: a narrow scan
        # (single-row-group file) would otherwise run the whole corpus
        # bigram+md5 pass in one task; at real scale the scan is already
        # parallel and this is an identity. The derived xxhash64 key
        # (a) avoids the keyless form's local sort-before-repartition
        # and (b) does NOT satisfy the (doc, f) clustering, so the
        # shared count aggregate keeps its own exchange above the heavy
        # stage — the ReuseExchange boundary both consumers share.
        t = spread_if_narrow(t, F.xxhash64(F.col("doc")))
        toks = drop_empty_tokens(
            F.split(F.trim(F.lower(F.col("_dsir_txt"))), TOKEN_SPLIT_RE)
        ).alias("t")
        ride = ["_t"] if flag is not None else []
        t = t.select("doc", *ride, toks)
        z = F.zip_with(
            F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
            F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
            lambda p, w: F.concat_ws(" ", p, w),
        )
        g = t.select("doc", *ride, F.explode(z).alias("g"))
        bucket = (
            F.conv(F.substring(F.md5(F.col("g")), 1, 12), 16, 10)
            .cast("bigint") % n_buckets
        ).alias("f")
        if keep_id:
            return g.select("doc", *ride, bucket)
        return g.select(bucket)

    # ONE corpus pass: per-(doc, f) occurrence counts. Everything the
    # old two-pass shape needed is derivable from this aggregate, and
    # because both derivations consume the SAME aggregate subtree its
    # exchange is planned once and reused (ReusedExchange in the plan).
    # The explicit isnotnull filters are VACUOUS (doc is the corpus id;
    # f is md5-derived from a non-null concat) but load-bearing for the
    # reuse: the scoring consumer's joins infer exactly these filters
    # into its copy of the subtree (inner join on f, outer join on doc)
    # and the q-side copy would not carry them — canonically different
    # subtrees, no ReuseExchange, and the tokenize+md5 pass runs twice
    # again. Pinned by test_dsir_one_corpus_pass.
    if target_flag is not None:
        # self-target fusion: the flag (constant per doc — a row-level
        # predicate) rides the one pass as an EXTRA GROUPING KEY — not
        # an aggregate expression, which per-consumer column pruning
        # would drop from the scoring copy (different partial agg ⇒
        # canonically different exchange ⇒ no ReuseExchange and the
        # tokenize+md5 pass would run twice again). Grouping keys are
        # never pruned, and the flag is constant per doc, so the
        # (doc, _t, f) groups ARE the (doc, f) groups with one extra
        # boolean riding the exchange.
        occ_counts = (
            feats(df, True, flag=target_flag)
            .filter(F.col("doc").isNotNull() & F.col("f").isNotNull())
            .groupBy("doc", "_t", "f")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # p and q from ONE rollup of the shared aggregate (target ⊆
        # corpus, so every target bucket is a corpus bucket and the
        # two-sided full join degenerates): pc via when(), not a
        # filter, so no one-sided inferred isnotnull(_t) can make the
        # copies canonically different. NULL flag ⇒ not target —
        # df.filter(flag)'s semantics exactly.
        fstat = occ_counts.groupBy("f").agg(
            F.sum("c").alias("qc"),
            F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0)))
            .alias("pc"),
        )
        p_cnt = fstat.select("f", "pc")
        q_cnt = fstat.select("f", "qc")
    else:
        occ_counts = (
            feats(df, True)
            .filter(F.col("doc").isNotNull() & F.col("f").isNotNull())
            .groupBy("doc", "f")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        p_cnt = feats(target_df, False).groupBy("f").agg(
            F.count(F.lit(1)).alias("pc"))
        q_cnt = occ_counts.groupBy("f").agg(F.sum("c").alias("qc"))
    # totals ride as 1-row scalar aggregates broadcast with the ratio
    # table. Fused mode: BOTH totals from one rollup of fstat — separate
    # pt/qt aggregates would re-read the shared (doc, _t, f) exchange
    # once more each (measured ~5% on the whole operator at sf0.1).
    if target_flag is not None:
        totals = fstat.agg(F.sum("pc").alias("pt"), F.sum("qc").alias("qt"))
    else:
        pt = p_cnt.agg(F.sum("pc").alias("pt"))
        qt = q_cnt.agg(F.sum("qc").alias("qt"))
    fix6 = lambda c: (F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
                      / F.lit(1000000.0))
    # Fail LOUD on an empty target (round-15 ADVICE): SUM over zero rows
    # makes pt NULL, which would otherwise NULL every log-ratio and
    # surface the whole corpus as log_weight NULL / selected=false with
    # no signal. assert_true is embedded in the pt expression itself (not
    # a separate column Catalyst could prune), so the plan stays lazy —
    # no extra driver-side pass over the target — and an accidentally
    # empty target fails the job with this message at first execution.
    # (fused mode: a zero-occurrence target makes pt = 0, not NULL —
    # there fstat still has a row per corpus bucket — so the loud-error
    # contract checks > 0 as well; pt is a count, never legitimately 0
    # with a non-degenerate target.)
    _pt_ok = (
        F.col("pt").isNotNull()
        if target_flag is None
        else (F.col("pt").isNotNull() & (F.col("pt") > 0))
    )
    pt_checked = F.when(
        F.assert_true(
            _pt_ok,
            F.lit(
                "dsir_log_weights: target corpus has zero bigram "
                "occurrences (empty target_df or all 0/1-token docs)"
            ),
        ).isNull(),
        F.col("pt"),
    )
    # fused mode: pc and qc already live on one relation (target ⊆
    # corpus ⇒ p's buckets ⊆ q's) — the two-sided full join is only
    # needed when p comes from an independent target pass; likewise the
    # totals arrive as ONE broadcast 1-row relation, not two
    if target_flag is not None:
        pq = fstat.crossJoin(F.broadcast(totals))
    else:
        pq = (p_cnt.join(q_cnt, "f", "full")
              .crossJoin(F.broadcast(pt)).crossJoin(F.broadcast(qt)))
    ratio = (
        pq
        .select(
            "f",
            fix6(
                F.log(
                    (F.coalesce(F.col("pc"), F.lit(0)) + F.lit(alpha))
                    / (pt_checked + F.lit(alpha) * F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("qc"), F.lit(0)) + F.lit(alpha))
                    / (F.col("qt") + F.lit(alpha) * F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )
    # per-doc scoring over the SAME (doc, f) count aggregate: n_feats is
    # the occurrence count (Σ c) and the weight sum distributes over the
    # counts — c · lr in exact decimal arithmetic (lr is a fix6 multiple
    # of 1e-6, so decimal(18,6) holds it exactly; the product and sum
    # stay in decimal), bit-identical to the old per-occurrence
    # Σ lr but over distinct (doc, f) pairs instead of every bigram.
    agg = (
        occ_counts.join(F.broadcast(ratio), "f")
        .groupBy("doc")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            fix6(
                F.sum(
                    F.col("c").cast("decimal(12,0)")
                    * F.col("lr").cast("decimal(18,6)")
                ).cast("double")
            ).alias("log_weight"),
        )
    )
    return agg.select(
        F.col("doc").alias(id_col),
        "n_feats",
        "log_weight",
    )


def dsir_log_weights(
    df: DataFrame,
    target_df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    target_flag=None,
) -> DataFrame:
    """The full DSIR surface (round 14; see :func:`dsir_scored` for the
    algorithm, determinism kit, scale shape, and the round-19
    ``target_flag`` self-target fusion — when the target is a filter of
    ``df`` itself, pass the predicate Column and the target's separate
    tokenize+md5 pass disappears): every document of
    ``df`` surfaces — zero-bigram docs as (0, NULL, selected=false),
    never vanishing (the bigram_lm_score discipline) — via a doc_id
    universe left-join over the scored half. Consumers that drop
    no-evidence rows anyway should use :func:`dsir_scored` and skip the
    universe distinct+join."""
    agg = dsir_scored(df, target_df, text_col=text_col, id_col=id_col,
                      n_buckets=n_buckets, alpha=alpha,
                      target_flag=target_flag)
    universe = df.select(F.col(id_col).alias(id_col)).distinct()
    return universe.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0).cast("bigint")).alias("n_feats"),
        "log_weight",
        (F.coalesce(F.col("log_weight"), F.lit(0.0)) > 0).alias("selected"),
    )
