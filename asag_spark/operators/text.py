"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting).

All built-in JVM-side operations (no Python UDFs anywhere) — designed
so an ANSI-SQL oracle (DuckDB) reproduces values bit-for-bit: md5 for
fingerprints, explicit rounding where float math is involved,
deterministic tie-breaks. The per-row scorers are pure column
expressions; tfidf_top_terms / corpus_stats add groupBy/join/window
stages (their plan shapes are documented in SCALE.md §8).
Operates on the ``documents`` table (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")

# marker-word heuristics per language (n-gram-ish language ID --
# deliberately simple and SQL-mirrorable; priority order breaks ties)
LANG_MARKERS = [
    ("en", r"\b(the|and|of)\b"),
    ("es", r"\b(el|la|los|de)\b"),
    ("de", r"\b(der|die|das|und)\b"),
    ("fr", r"\b(le|la|les|et)\b"),
]


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def md5_long60(col: Column) -> Column:
    """First 15 hex chars of md5(string col) → bigint — THE shared
    engine-portable hash idiom: DuckDB mirrors it as
    ('0x' || substr(md5(x),1,15))::BIGINT. Every oracle-matched
    operator (minhash, simhash tokens, KMV, split) must use this one
    helper so the substring length / base can never drift per copy."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (BPE-ish subword estimate = ceil(chars/4)
    alongside, the common LLM heuristic)."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword quality heuristic in [0,1]:
    0.5·min(tokens/100,1) + 0.3·(1-punct_ratio) + 0.2·stopword_ratio,
    rounded to 6 decimals for cross-engine float parity."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    punct_ratio = F.length(F.regexp_replace(t, r"[^!?.,;:]", "")) / F.greatest(
        F.length(t), F.lit(1)
    )
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    score = (
        F.lit(0.5) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * stop_ratio
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with fixed priority; 'und' when no
    marker fires. (The synthetic corpus is English-ish so this mostly
    exercises the expression plumbing + oracle parity.)"""
    t = F.lower(F.col(text_col))
    pred = F.lit("und")
    for code, pattern in reversed(LANG_MARKERS):
        pred = F.when(F.regexp_count(t, F.lit(pattern)) > 0, code).otherwise(pred)
    return docs.select("doc_id", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lower-cased
    text (the exact-dedup key; md5 matches any SQL engine)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing rolling-hash fingerprints (Schleimer/Wilkerson/Aiken):
    k-token shingles → hash each → keep the minimum hash of every
    w-wide rolling window → distinct selected hashes per doc.

    Hash = first 16 hex chars of md5(shingle) so the rolling minimum is
    a plain lexicographic min any SQL engine reproduces bit-for-bit.
    Docs with shingles but fewer than w of them contribute their global
    min; docs shorter than k tokens fall back to the whole-text hash.
    Everything is built-in column expressions (whole-stage codegen) —
    no shuffle until the consumer groups by fingerprint.

    The normalize+split is MATERIALIZED as a column before the
    higher-order transform: expressions referenced inside a lambda are
    NOT common-subexpression-eliminated across the lambda boundary, so
    inlining `split(regexp_replace(...))` into the shingle lambda
    re-runs the regex once per shingle POSITION — O(tokens²) regex
    work per doc, measured 4x slower on the benchmark corpus.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    staged = docs.withColumn("_norm", norm).withColumn(
        "_toks", F.split(F.col("_norm"), " ")
    )
    n_sh = F.size(F.col("_toks")) - k + 1
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, k))), 1, 16
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n = F.size(F.col("_sh"))
    window_mins = (
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1))),
                lambda j: F.array_min(F.slice(F.col("_sh"), j, w)),
            ),
        )
        .when(n >= 1, F.array(F.array_min(F.col("_sh"))))
        .otherwise(F.array(F.substring(F.md5(F.col("_norm")), 1, 16)))
    )
    return (
        staged.withColumn("_sh", shingles)
        .select(
            "doc_id",
            F.explode(F.array_distinct(window_mins)).alias("fp"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document — the keyword/topicality signal
    a training pipeline derives before quality filtering or topic
    clustering. tf = in-document term count, idf = ln(N/df) (plain
    formulation; df = documents containing the term); score rounded to
    6 dp BEFORE ranking, ties break on term ascending, so ranks are
    parallelism- and engine-invariant.

    Plan at scale: ONE pass over the raw text — explode → (doc, term)
    count with map-side combine (shuffle ∝ distinct doc-term pairs,
    not tokens), then df as a count window OVER THE COMPACT tf FRAME
    keyed by term (a df-agg-and-join-back formulation re-scanned and
    re-exploded the documents table a second time: measured 3 FileScans
    / 5 exchanges vs 2 / 3 here; the window costs one term-keyed
    exchange of tf rows instead), N rides a 1-row broadcast cross join
    whose count(*) scan is parquet-statistics-only, and the final
    per-doc rank window shuffles only tf rows."""
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def corpus_stats(docs: DataFrame, by: str = "source") -> DataFrame:
    """Per-source corpus profile — the first report any 100 TB text
    pipeline produces: volume, exact-duplicate share, and the
    token/char length distribution per provenance bucket. One groupBy
    (map-side combined counts + sort-based exact percentiles; Spark
    `percentile` and DuckDB `quantile_cont` share linear
    interpolation). Exact percentiles sort within each group — fine
    while a source's rows fit a task's spill budget; at extreme group
    sizes swap `percentile` for `percentile_approx` and accept the
    documented approximation."""
    t = docs.select(
        F.col(by),
        F.col("text"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return t.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dups"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 2).alias("med_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 2).alias("p95_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def hash_unit(id_col: str, seed: str) -> Column:
    """Deterministic U(0,1] per id: md5(seed:id) 60-bit prefix mapped
    to the unit interval. The +1 keeps 0 out of the range so a rate of
    exactly 0 never admits a row; division by 2^60 is exact binary
    scaling, so any engine computing the same md5 lands on the same
    double. Shared by split_assign and stratified_sample — one idiom,
    one oracle translation."""
    return (
        md5_long60(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ) + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))


def split_assign(docs: DataFrame, weights: dict[str, float] | None = None,
                 id_col: str = "doc_id", seed: str = "split-v1") -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs to be STABLE across reruns and engines:
    bucket = md5(seed:doc_id) mapped to (0,1], assigned by cumulative
    weight. Pure expressions (no sampling state, no RNG), so adding
    documents never reshuffles existing assignments and any engine
    reproduces the split bit-for-bit. Weights must sum to 1 (a short
    sum would silently inflate the last split — the otherwise-branch
    absorbs whatever the declared weights leave uncovered).
    Cumulative boundaries are rounded to 12 dp so 0.9 + 0.05 compiles
    to the literal 0.95 an SQL oracle writes, not
    0.9500000000000001."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_unit(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc = round(acc + weights[name], 12)
        cond = u <= F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = (expr.otherwise(names[-1]) if expr is not None
             else F.lit(names[-1]))
    return docs.select(F.col(id_col), split.alias("split"))


def _split_expr(id_col: str, weights: dict[str, float], seed: str) -> Column:
    """The split_assign CASE as a bare Column, for operators that need
    the split label WITHOUT a join back to the assignment table (it is
    a pure function of the id, so recomputing it inline is free and
    join-free — contamination_check uses this to stay shuffle-free
    until its fingerprint join)."""
    u = hash_unit(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc = round(acc + weights[name], 12)
        cond = u <= F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])


def stratified_sample(docs: DataFrame, rates: dict[str, float] | None = None,
                      strata_col: str = "lang", id_col: str = "doc_id",
                      seed: str = "strata-v1") -> DataFrame:
    """Deterministic per-stratum downsampling — the language/source
    rebalancing step every corpus-mixing pipeline runs (e.g. cap English
    at 30%, keep low-resource languages whole). keep iff
    hash_unit(id) <= rate[stratum]; strata absent from ``rates`` get
    rate 0 (dropped), which makes the declared mix explicit rather
    than silently passing unknown strata through.

    Pure per-row expressions: no sampling state, no RNG, no shuffle —
    appending documents never changes existing keep/drop decisions,
    and identical rates reproduce the identical sample on any engine
    (the property DataFrame.sample() explicitly does NOT give you:
    its Bernoulli draw depends on partitioning). At 100 TB this is a
    filter fused into the scan."""
    rates = rates if rates is not None else {
        "en": 0.3, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 0.25,
    }
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    u = hash_unit(id_col, seed)
    rate = None
    for name, r in rates.items():
        cond = F.col(strata_col) == name
        rate = (F.when(cond, F.lit(float(r))) if rate is None
                else rate.when(cond, F.lit(float(r))))
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return docs.filter(u <= rate).select(F.col(id_col), F.col(strata_col))


def seq_pack(docs: DataFrame, budget: int = 256, text_col: str = "text",
             id_col: str = "doc_id", n_buckets: int = 32) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out as one
    token stream in ``id_col`` order and cut it into fixed ``budget``
    packs — the standard LLM pretraining batch layout (every doc gets
    its stream offset; a doc whose span crosses pack boundaries is
    split ``n_splits`` times). Output:
    (doc_id, n_tokens, start_tok, pack_id, n_splits).

    The core is a GLOBAL running sum, and the naive spelling — a
    window over ``ORDER BY doc_id`` with no partition — collapses to a
    single task holding the whole corpus, the textbook anti-pattern.
    The scalable shape used here is the two-phase prefix sum:

      1. bucket rows by id range (width_bucket over min/max — order-
         preserving, deterministic, no sampled range boundaries whose
         re-execution could disagree between passes);
      2. one map-side-combined groupBy(bucket) for per-bucket token
         totals → driver computes the tiny exclusive prefix (n_buckets
         rows) and broadcasts it as a literal map;
      3. one shuffle on bucket for the within-bucket running sum;
         global offset = prefix[bucket] + within-bucket sum.

    Each task then holds 1/n_buckets of the data; at 100 TB you raise
    n_buckets to taste (the driver-side prefix stays trivially small).
    start_tok is a pure function of the global id order, so the result
    is identical at any parallelism. Empty docs occupy max(1, n) slots
    so every doc owns at least one position (keeps pack_id total)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    lo, hi = toks.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return toks.select(
            id_col, "n_tokens",
            F.lit(0).cast("long").alias("start_tok"),
            F.lit(0).cast("long").alias("pack_id"),
            F.lit(0).cast("int").alias("n_splits"),
        ).limit(0)
    span = int(hi) - int(lo) + 1
    nb = max(1, min(n_buckets, span))
    width = -(-span // nb)  # ceil — last bucket may be short, never empty
    slots = F.greatest(F.col("n_tokens"), F.lit(1)).cast("long")
    # integer `div`, not double `/`: exact for ids/offsets past 2^53
    b = toks.withColumn(
        "_bkt", F.expr(f"(cast({id_col} as bigint) - {int(lo)}) div {width}")
    ).withColumn("_slots", slots)
    per_bucket = {
        int(r["_bkt"]): int(r["s"])
        for r in b.groupBy("_bkt").agg(F.sum("_slots").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for k in range(nb):
        prefix[k] = acc
        acc += per_bucket.get(k, 0)
    offset = F.element_at(
        F.create_map(*[F.lit(x) for kv in prefix.items() for x in kv]),
        F.col("_bkt"),
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (offset + F.coalesce(F.sum("_slots").over(w), F.lit(0))).cast("long")
    out = b.withColumn("start_tok", start)
    pack = F.expr(f"start_tok div {budget}")
    last_pack = F.expr(f"(start_tok + _slots - 1) div {budget}")
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("start_tok"),
        pack.alias("pack_id"),
        (last_pack - pack).cast("int").alias("n_splits"),
    )


def contamination_check(docs: DataFrame, weights: dict[str, float] | None = None,
                        seed: str = "split-v1", k: int = 5, w: int = 4,
                        max_df: int = 100, probe_split: str = "test",
                        against_split: str = "train") -> DataFrame:
    """Benchmark decontamination: which held-out docs share a winnowed
    fingerprint with any training doc? The step every eval-hygiene
    pipeline runs before publishing a split — n-gram overlap detection
    between train and test (the GPT-3/C4 papers' 13-gram check is this
    exact shape with different k).

    Composition, not new machinery: split labels are recomputed inline
    (pure function of doc_id — no join against an assignment table),
    fingerprints come from winnow_fingerprints, and the only shuffles
    are (a) the fp document-frequency cap and (b) the probe⋈against
    fingerprint equi-join, both keyed on fp. ``max_df`` drops
    fingerprints appearing in more than that many docs BEFORE the
    join — boilerplate shingles (headers, licenses) are both a skew
    bomb (hot fp key ⇒ one reducer gets the cross product) and noise
    (matching boilerplate is not contamination). Output:
    (doc_id, n_train_matches) for probe-split docs with ≥1 capped-fp
    match, n_train_matches = distinct matched against-split docs."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    fps = winnow_fingerprints(docs, k=k, w=w).withColumn(
        "split", _split_expr("doc_id", weights, seed)
    )
    df_ok = (
        fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    capped = fps.join(df_ok, "fp")
    probe = capped.filter(F.col("split") == probe_split).select(
        "fp", F.col("doc_id")
    )
    against = capped.filter(F.col("split") == against_split).select(
        "fp", F.col("doc_id").alias("_train_id")
    )
    return (
        probe.join(against, "fp")
        .groupBy("doc_id")
        .agg(F.count_distinct("_train_id").alias("n_train_matches"))
    )


def _run_fold(sorted_arr: Column) -> Column:
    """One pass over a sorted array: longest equal run (= max
    multiplicity) and total mass of runs with length >= 2. acc.run
    counts the current run; when it closes at length 1 it contributed
    nothing to dup. Shared by repetition_stats and gopher_filter."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        dup = acc["dup"] + F.when(
            same, F.when(acc["run"] == 1, F.lit(2)).otherwise(F.lit(1))
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(sorted_arr, init, step)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition metrics (the Gopher/Dolma "repetitious
    text" filter family: Rae et al. 2021 §A1.1 compute fraction of
    characters in the most frequent n-gram and in duplicated n-grams,
    then drop docs over thresholds).

    ENTIRELY map-side: token and bigram multiplicities come from
    array_sort + a single aggregate() fold over adjacent-equal runs
    (no explode, no groupBy — per-doc metrics need no cross-row data,
    so the plan contains ZERO exchanges and rides whole-stage codegen
    end to end; at 100 TB this is a pure scan-speed pass, pytest pins
    the no-Exchange plan shape). All outputs are integers (counts, not
    fractions) so the DuckDB oracle — which computes the same numbers
    RELATIONALLY via unnest + GROUP BY, a deliberately different plan
    — hash-matches bit-for-bit with no float formatting concerns.

    Output: (doc_id, n_tokens, n_distinct, top_token_cnt,
    dup_token_cnt, top_bigram_cnt, rep_flag) where dup_token_cnt
    counts WITH multiplicity every token whose count >= 2, and
    rep_flag = 1 iff top_bigram_cnt*5 >= n_bigrams (>=20% mass in one
    bigram) or dup_token_cnt*2 >= n_tokens (>=50% repeated mass) —
    integer arithmetic only.

    The two fold structs are MATERIALIZED as columns before the final
    projection (the winnowing lesson, `winnow_fingerprints` docstring:
    explicit staging guarantees single evaluation instead of trusting
    codegen CSE to dedupe the re-embedded fold trees — measured ~11%
    on the sf0.1 corpus, same output)."""
    toks = F.split(F.col(text_col), " ")
    run_fold = _run_fold
    t = F.col("_toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    staged = (
        docs.withColumn("_toks", toks)
        .withColumn("_uni", run_fold(F.array_sort(t)))
        .withColumn("_big", run_fold(F.array_sort(bigrams)))
    )
    uni = F.col("_uni")
    big = F.col("_big")
    n_tokens = F.size(t)
    n_bigrams = F.greatest(F.size(t) - 1, F.lit(0))
    return staged.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        uni["best"].alias("top_token_cnt"),
        uni["dup"].alias("dup_token_cnt"),
        big["best"].alias("top_bigram_cnt"),
        F.when(
            ((big["best"] * 5 >= n_bigrams) & (n_bigrams > 0))
            | (uni["dup"] * 2 >= n_tokens),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("rep_flag"),
    )


def contamination_check_bloom(docs: DataFrame,
                              weights: dict[str, float] | None = None,
                              seed: str = "split-v1", k: int = 5, w: int = 4,
                              max_df: int = 100, probe_split: str = "test",
                              against_split: str = "train",
                              m_bits: int = 1 << 20,
                              n_hashes: int = 7) -> DataFrame:
    """contamination_check with a Bloom semi-join prefilter on the
    against (train) side — IDENTICAL output by construction, different
    physical plan for the 100 TB case.

    The plain check shuffles every capped train fingerprint into the
    probe⋈against exchange; at web scale train is ~95% of the corpus
    while test fingerprints (the thing being probed FOR) are tiny. So:
    build a Bloom bit array over the PROBE side's fingerprints (small
    — a few MB at 10 bits/key even for millions of test fps),
    broadcast it, and drop train rows whose fp cannot match before
    they reach the exchange. No false negatives, so the exact fp
    equi-join that follows erases the ~1% false positives and the
    result equals contamination_check row for row (pytest-pinned and
    it shares the same DuckDB oracle). Train-side shuffle volume drops
    to ~(test-overlap + 1%) of the corpus instead of 100%."""
    from .bloom import bloom_semi_join_prefilter

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    fps = winnow_fingerprints(docs, k=k, w=w).withColumn(
        "split", _split_expr("doc_id", weights, seed)
    )
    df_ok = (
        fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    capped = fps.join(df_ok, "fp")
    probe = capped.filter(F.col("split") == probe_split).select(
        "fp", F.col("doc_id")
    )
    against = capped.filter(F.col("split") == against_split).select(
        "fp", F.col("doc_id").alias("_train_id")
    )
    against = bloom_semi_join_prefilter(
        against, probe, "fp", m_bits=m_bits, n_hashes=n_hashes
    )
    return (
        probe.join(against, "fp")
        .groupBy("doc_id")
        .agg(F.count_distinct("_train_id").alias("n_train_matches"))
    )


GOPHER_RULES = ("too_short", "too_long", "short_words", "long_words",
                "stop_words", "repetition")


def gopher_filter(docs: DataFrame, min_tokens: int = 20,
                  max_tokens: int = 100000, min_mean_wl: int = 2,
                  max_mean_wl: int = 8, min_stopwords: int = 2,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite Gopher-style quality gate (Rae et al. 2021 §A1.1):
    token-count window, mean-word-length window, minimum distinct
    stopwords, and the repetition_stats flag — keep=1 iff no rule
    fires, with the fired rule names in a fixed-order comma-joined
    ``reasons`` string so downstream pipelines can report WHY a doc
    was dropped (the Dolma/RefinedWeb attribute pattern) rather than
    just that it was.

    Same zero-exchange discipline as repetition_stats: every rule is
    a pure column expression over the staged token array (mean word
    length compares are integer cross-multiplications — total_chars <
    min_wl * n_tokens — so no float thresholds exist anywhere), and
    the plan is a single whole-stage-codegen projection. At 100 TB
    this runs at scan speed; the oracle recomputes the repetition leg
    relationally (unnest + GROUP BY) and the rest in SQL.

    Output: (doc_id, n_tokens, keep, reasons)."""
    toks = F.split(F.col(text_col), " ")
    t = F.col("_toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    staged = (
        docs.withColumn("_toks", toks)
        .withColumn("_uni", _run_fold(F.array_sort(t)))
        .withColumn("_big", _run_fold(F.array_sort(bigrams)))
        .withColumn(
            "_chars",
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)),
        )
        .withColumn(
            "_stopd",
            F.size(F.array_distinct(
                F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS))
            )),
        )
    )
    n_tokens = F.size(t)
    n_bigrams = F.greatest(F.size(t) - 1, F.lit(0))
    # rep_flag: EXACTLY repetition_stats' formula (parity pytest-pinned)
    rep = (
        ((F.col("_big")["best"] * 5 >= n_bigrams) & (n_bigrams > 0))
        | (F.col("_uni")["dup"] * 2 >= n_tokens)
    )
    rules = [
        ("too_short", n_tokens < min_tokens),
        ("too_long", n_tokens > max_tokens),
        ("short_words", F.col("_chars") < min_mean_wl * n_tokens),
        ("long_words", F.col("_chars") > max_mean_wl * n_tokens),
        ("stop_words", F.col("_stopd") < min_stopwords),
        ("repetition", rep),
    ]
    fired = F.array_compact(F.array(*[
        F.when(cond, F.lit(name)) for name, cond in rules
    ]))
    return staged.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.when(F.size(fired) == 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        F.array_join(fired, ",").alias("reasons"),
    )


def train_shuffle(docs: DataFrame, n_shards: int = 8,
                  id_col: str = "doc_id",
                  seed: str = "epoch-0") -> DataFrame:
    """Deterministic epoch shuffle + shard assignment — the "permute
    the corpus, write N shard files" step every pretraining pipeline
    ends with. Order key is the 60-bit md5(seed:id) prefix: a new seed
    string is a fresh permutation (next epoch), the same seed
    reproduces bit-for-bit on any engine at any partitioning — the
    property ``orderBy(rand())`` explicitly does NOT give you (its
    draw depends on partition layout and Spark version).

    Plan shape (100 TB): NO global total sort. shard = h mod n_shards
    is a pure row expression; the within-shard position is a
    row_number window on (shard) — ONE hash exchange keyed by shard,
    then a per-partition sort. Parallelism equals n_shards, which at
    real scale is the output file count (10^4-10^5 file-sized shards
    for 100 TB), so no reducer sees more than one shard's rows. The
    toy default of 8 is for the 500-doc oracle table only.

    Output: (<id_col>, shard, pos) — pos is 1-based within shard;
    reading shards in order [0..n_shards) by pos replays the epoch.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = md5_long60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    staged = docs.select(F.col(id_col), h.alias("_h")).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return staged.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).alias("pos"),
    )


def stratum_cap(docs: DataFrame, cap: int = 72,
                strata_col: str = "lang", id_col: str = "doc_id",
                seed: str = "cap-v1", salt: int = 16) -> DataFrame:
    """Exact per-stratum cap: keep AT MOST ``cap`` docs per stratum —
    the "cap English at K documents, keep low-resource languages
    whole" balancing rule, complementing stratified_sample's
    rate-based thinning with a count-based guarantee. Selection is the
    ``cap`` smallest md5(seed:id) hashes per stratum: deterministic,
    engine-portable, and stable to re-runs (appending docs can only
    displace by hash order, never reshuffle survivors arbitrarily).

    Plan shape (100 TB): a naive row_number over (stratum) puts each
    language on ONE reducer — with ~30 languages that is a 30-task
    sort of the whole corpus. This is the classic two-phase
    distributed top-k instead: phase 1 ranks within (stratum,
    salt-bucket) — parallelism strata x ``salt``, each task sorting
    ~1/salt of a stratum — and keeps each bucket's local top-cap,
    which provably contains the global top-cap (any global top-cap row
    is also top-cap within its own bucket). Phase 2 re-ranks the
    <= cap x salt survivors per stratum: a few thousand rows, one tiny
    exchange. Output rows are EXACTLY the naive window's.

    Output: (<id_col>, <strata_col>, rk) — rk 1..cap by hash order.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = md5_long60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    staged = (
        docs.select(F.col(id_col), F.col(strata_col), h.alias("_h"))
        .withColumn("_b", F.pmod(F.col("_h"), F.lit(salt)))
    )
    w1 = Window.partitionBy(strata_col, "_b").orderBy("_h", id_col)
    cand = staged.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= cap
    )
    w2 = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        cand.withColumn("rk", F.row_number().over(w2).cast("int"))
        .filter(F.col("rk") <= cap)
        .select(F.col(id_col), F.col(strata_col), "rk")
    )


def temperature_resample(docs: DataFrame,
                         weights: dict[str, float] | None = None,
                         strata_col: str = "lang", id_col: str = "doc_id",
                         seed: str = "temp-v1") -> DataFrame:
    """Weighted resampling WITH replacement — the alpha/temperature
    data-mixing step (upsample low-resource languages, thin dominant
    ones) that rate-based thinning cannot express: a weight of 2.25
    means every doc appears twice and one in four appears a third
    time. Per-doc copy count is floor(w) + (hash_unit <= frac(w)),
    so expected copies equal the weight exactly, the decision is a
    pure function of (seed, id) — append-stable, engine-portable, no
    RNG state — and copies materialize as an explode of
    sequence(1, n): a row expression + generator, ZERO shuffles,
    fused into the scan at 100 TB. Strata absent from ``weights``
    get 0 (dropped), matching stratified_sample's explicit-mix rule.

    Fractional weights should be binary-exact (x/2^k: .5, .25, .75)
    so the frac(w) comparison reproduces bit-for-bit on any engine —
    the practical grids (0.25 steps) all are.

    Output: (<id_col>, <strata_col>, copy_idx) — copy_idx 1..n_copies;
    downstream training order comes from train_shuffle over
    (id, copy_idx).
    """
    weights = weights if weights is not None else {
        "en": 0.5, "es": 1.5, "de": 2.0, "fr": 2.25, "zh": 0.75,
    }
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
    u = hash_unit(id_col, seed)
    w_expr = None
    for name, w in weights.items():
        cond = F.col(strata_col) == name
        w_expr = (F.when(cond, F.lit(float(w))) if w_expr is None
                  else w_expr.when(cond, F.lit(float(w))))
    w_expr = w_expr.otherwise(F.lit(0.0)) if w_expr is not None else F.lit(0.0)
    base = F.floor(w_expr).cast("int")
    n = base + F.when(u <= (w_expr - base), F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select(F.col(id_col), F.col(strata_col), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_idx"),
        )
    )


def quality_topq(docs: DataFrame, share: float = 0.25,
                 text_col: str = "text") -> DataFrame:
    """Keep the top ``share`` of the corpus by quality score, ties at
    the threshold included — the "train on the best 25%" selection
    step downstream of per-doc scoring.

    EXACT corpus quantile with NO global sort: ``quality`` is rounded
    to 6 decimals in [0,1], so its domain holds at most 10^6 + 1
    distinct values. The k-th largest score (k = ceil(share·n)) is
    read off a HISTOGRAM — one map-combined groupBy(quality) whose
    output is <= 1M rows no matter the corpus size, a running count
    over that tiny frame (the single-partition window is over the
    HISTOGRAM, never the data), threshold = the largest score whose
    cumulative-from-top count reaches k. The 10^12-row side is touched
    by exactly two scan-fused passes: the histogram build and the
    final broadcast-threshold filter. Contrast percentile(): exact
    interpolation needs a sort, approx_percentile() trades exactness —
    the quantized domain gives both exactness and scan-speed.

    Output: (doc_id, quality) for kept docs; |output| >= k, minimal
    subject to ties.
    """
    if not 0.0 < share <= 1.0:
        raise ValueError(f"share must be in (0,1], got {share}")
    q = quality_score(docs, text_col=text_col).select("doc_id", "quality")
    hist = q.groupBy("quality").agg(F.count(F.lit(1)).alias("_c"))
    # both windows share one ordering → one Window exec over the SAME
    # histogram (a separate hist.agg(sum) branch would re-scan docs)
    w_cum = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = (
        hist.select(
            "quality",
            F.sum("_c").over(w_cum).alias("_cum"),
            F.sum("_c").over(w_all).alias("_n"),
        )
        .filter(F.col("_cum") >= F.ceil(F.lit(float(share)) * F.col("_n")))
        .agg(F.max("quality").alias("_thr"))
    )
    return (
        q.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("_thr"))
        .select("doc_id", "quality")
    )


def chunk_windows(docs: DataFrame, window: int = 32, stride: int = 24,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the "split each document
    into W-token windows every S tokens" preprocessing step of every
    embedding / retrieval pipeline (overlap = W - S tokens keeps
    boundary context). Chunk count = 1 if n <= W else
    ceil((n - W) / S) + 1, so the final window always reaches the last
    token and short docs yield exactly one chunk.

    Pure per-row: token split, a sequence generator, slice + join —
    ZERO exchanges, scan-fused at 100 TB (same plan family as
    temperature_resample). Deterministic: chunk boundaries are pure
    arithmetic on the token count.

    Output: (<id_col>, chunk_idx, chunk_text, n_chunk_tokens) —
    chunk_idx 0-based, n_chunk_tokens = min(W, n - idx·S).
    """
    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"need 1 <= stride <= window, got window={window} stride={stride}"
        )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - window) / float(stride)).cast("int") + 1
    )
    staged = docs.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return staged.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_toks"), start + 1, F.lit(window)), " "
        ).alias("chunk_text"),
        F.least(F.lit(window), F.col("_n") - start).cast("int")
        .alias("n_chunk_tokens"),
    )


# --- PII detection / redaction -------------------------------------------
# Patterns are deliberately restricted to syntax valid AND equivalent in
# both Java regex (Spark executors) and RE2 (the DuckDB oracle): ASCII
# classes, non-capturing groups, \b word boundaries — no lookarounds, no
# backreferences. Counts are taken on the RAW text; redaction is applied
# in the pinned order email → IPv4 → phone so both engines see identical
# intermediate strings (an email local-part containing "+digits" must be
# consumed by the email pass before the phone pass can touch it).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d(?:[ -]?\d){6,14}"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Detect and redact PII (emails, IPv4 addresses, +international
    phone numbers) — the scrubbing pass every web-scale training-data
    pipeline runs before tokenization (reference scope: the brief's
    text-analysis family; the asag reference has no PII surface).

    Pure per-row JVM regex column expressions — ZERO exchanges, fused
    into the scan at 100 TB; no Python anywhere. Deterministic and
    engine-portable: the DuckDB oracle reproduces counts with
    len(regexp_extract_all) and the scrubbed text with the same
    replacement sequence under the 'g' flag.

    Output: (<id_col>, n_emails, n_ips, n_phones, scrubbed) with
    redaction tokens <EMAIL>/<IP>/<PHONE>.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def bpe_pair_counts(docs: DataFrame, top: int = 20,
                    text_col: str = "text") -> DataFrame:
    """One BPE-tokenizer training iteration: score every adjacent
    character pair across the corpus (weighted by word frequency) and
    emit the top-N merge candidates — the inner loop of byte-pair
    encoding vocabulary training (Sennrich et al. 2016), distributed.

    Plan shape (and why it scales to 100 TB):
      1. lowercase + split to alpha words, explode — scan-fused, no
         exchange yet;
      2. groupBy(word) count — ONE map-combined shuffle whose key
         space is the DISTINCT vocabulary (sub-linear in corpus size:
         partial aggregation collapses repeats executor-side, so the
         wire carries vocab-sized data, not corpus-sized);
      3. per distinct word, generate its length-1 adjacent pairs with
         a sequence/substring transform (no Python), explode;
      4. groupBy(pair) sum(word_freq) — a second map-combined shuffle
         on an even smaller key space (≤ alphabet², a few hundred
         keys);
      5. global top-N by (count desc, pair asc) — orderBy+limit
         compiles to TakeOrderedAndProject (per-partition heap + tiny
         driver merge, never a full sort), then row_number over the
         ≤N surviving rows assigns the deterministic merge rank.

    A full BPE train loop re-runs this over the merged-symbol corpus;
    one exact scoring pass is the unit the driver's SQL oracle can
    verify end-to-end. Deterministic: ties break on the pair string.

    Output: (rank, pair, n) — rank 1-based, pair the two merged
    symbols, n the corpus-wide weighted count.
    """
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count("*").alias("wf"))
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
        "wf",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wf").alias("n"))
    topn = counts.orderBy(F.desc("n"), F.asc("pair")).limit(top)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return topn.select(
        F.row_number().over(w).alias("rank"), "pair", "n"
    )


def lm_bigram_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram language-model fluency scoring (the CCNet-style quality
    dial: train an n-gram LM on the corpus, keep the low-perplexity
    tail). One pass trains the LM — add-one-smoothed bigram
    conditionals over the corpus itself — and scores every document by
    its average negative log-likelihood:

        nll(d) = (1/|bigrams(d)|) * SUM -ln( (c(w1,w2)+1) / (c(w1)+V) )

    lower = more corpus-typical text (perplexity = e^nll if a caller
    wants the conventional unit).

    Plan shape (and why it scales to 100 TB):
      1. one scan projects the token array; unigram counts and bigram
         counts are TWO map-combined shuffles whose key spaces are the
         distinct vocabulary / distinct bigram set — sub-linear in
         corpus size under Zipf (partial aggregation collapses repeats
         executor-side, the wire carries vocab-sized data);
      2. per-doc bigram occurrences are pre-aggregated to
         (doc_id, w1, w2, cnt) BEFORE the count join, so repetitive
         docs join each distinct bigram once and multiply — the join
         input is bounded by distinct-bigrams-per-doc, not tokens;
      3. the count join is a plain hash join keyed by the bigram (the
         build side has ONE row per key, so hot "of the"-style keys
         replicate cheaply; AQE broadcasts it when the pruned vocab
         fits, shuffle-hash otherwise); V rides along as a broadcast
         single-row cross join;
      4. per-term quantization floor(term*1e6 + 0.5) -> BIGINT makes
         the per-doc SUM integer-exact, so aggregation order can never
         move the result (the SQ8 / hyperplane-LSH idiom); the only
         float op is one final division, rounded to 6 dp. Cross-engine
         risk is confined to ln() ulp parity at the 1e-6 boundary,
         the same accepted class as the rounded-cosine operators.
      5. the scorer re-aggregates by doc_id — one further map-combined
         shuffle keyed by the doc.

    Docs with fewer than two tokens have no bigrams: n_bigrams = 0,
    nll NULL (never a 0/0 under ANSI mode).

    Output: (doc_id, n_bigrams, nll).
    """
    tk = docs.select("doc_id", tokens(F.lower(F.col(text_col))).alias("tk"))
    uni = (
        tk.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # V counts uni's rows THROUGH c1's value (c1 >= 1 by construction,
    # so the count is exactly the vocabulary size): a bare count(1)
    # lets the optimizer rewrite this branch to a keys-only distinct,
    # whose exchange no longer canonically matches uni's, and the
    # corpus gets re-tokenized for a single scalar. Keying the count
    # on c1 keeps the (w, partial_count) exchange byte-identical, so
    # ReusedExchange feeds uni's shuffle to both consumers
    # broadcast pinned HERE and re-hinted at the crossJoin site below:
    # a 1-row aggregate must never be left to stats-dependent planning
    vocab = F.broadcast(
        uni.agg(F.count(F.when(F.col("c1") > 0, F.lit(1))).alias("v"))
    )
    m = F.size(F.col("tk")) - 1
    # the explicit doc_id NOT NULL (doc_id is the PK — never null)
    # keeps the docbg subtree byte-identical under both consumers:
    # without it the scored branch gets the join's isnotnull pushed in
    # while big's branch doesn't, and ReusedExchange needs exact
    # canonical equality to serve both from one shuffle write
    bg = (
        tk.filter((F.size("tk") >= 2) & F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("tk", 1, m).alias("w1"),
                    F.slice("tk", 2, m).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    docbg = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus bigram counts re-aggregate docbg (NOT a fresh explode):
    # the (doc_id, w1, w2) exchange is an identical subtree, so
    # ReusedExchange serves both consumers from one shuffle write and
    # the corpus is tokenized/exploded once per key space, not twice
    big = docbg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    term = -F.log((F.col("c12") + F.lit(1)) / (F.col("c1") + F.col("v")))
    term_q = F.floor(term * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (
        docbg.join(big, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * term_q).alias("sq"),
            F.sum("cnt").alias("nb"),
        )
        .select(
            "doc_id",
            F.col("nb").alias("n_bigrams"),
            F.round(F.col("sq") / (F.col("nb") * F.lit(1e6)), 6).alias("nll"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        "nll",
    )


def rendezvous_shards(docs: DataFrame, n_shards: int = 8,
                      id_col: str = "doc_id",
                      seed: str = "rdz-0") -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    minimal-movement layout for a GROWING corpus: shard(doc) =
    argmax over shards of md5(seed:shard:doc). Unlike mod-N hashing
    (train_shuffle's epoch layout, where going N -> N+1 remaps
    ~N/(N+1) of ALL docs), adding a shard moves EXACTLY the docs
    whose new shard wins the argmax — ~1/(N+1) of the corpus, and
    every mover lands IN the new shard (property-tested). That is the
    difference between "nightly corpus-wide rewrite" and "backfill
    one new shard" at 10^12 docs.

    Plan shape: shard is a PURE ROW EXPRESSION — array_max over
    n_shards (weight, -shard) structs (struct comparison is
    lexicographic, so max weight wins and the NEGATED shard id breaks
    ties toward the smaller shard), zero exchanges, no explode (an
    explode × shards + window argmax formulation shuffles n_shards×
    the corpus for the same answer). Each md5 term appears exactly
    once in the expression — a running best-so-far CASE fold embeds
    the accumulated subtree twice per step, goes exponential, and
    janino ejects the stage to interpreted mode (observed before this
    formulation). n_shards is the physical shard-file count.

    Output: (<id_col>, shard).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def weight(s: int) -> Column:
        return md5_long60(
            F.concat(F.lit(f"{seed}:{s}:"), F.col(id_col).cast("string"))
        )

    entries = F.array(*[
        F.struct(weight(s).alias("w"), F.lit(-s).alias("ns"))
        for s in range(n_shards)
    ])
    best = F.array_max(entries)
    return docs.select(
        F.col(id_col), (-best["ns"]).cast("int").alias("shard")
    )


def dsir_weights(docs: DataFrame, target_sources: tuple[str, ...] = ("src0", "src1"),
                 n_buckets: int = 1024, text_col: str = "text",
                 source_col: str = "source", id_col: str = "doc_id") -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every RAW-pool document by how target-like its hashed n-gram
    profile is,

        logw(d) = SUM_b c_d(b) * [ ln p_t(b) - ln p_r(b) ]

    over hashed unigram+bigram buckets b, where p_t / p_r are the
    add-one-smoothed bucket distributions of the target corpus
    (``source IN target_sources``) and the raw pool (everything else),
    and c_d(b) is the doc's occurrence count in bucket b. High logw =
    looks like the target; downstream selection composes with
    quality_topq-style thresholding or temperature_resample.

    Engine-portable math: bucket(g) = md5_long60(g) % n_buckets (both
    operands non-negative, so % == pmod on any engine); the per-bucket
    log-ratio is quantized ONCE — floor(lr * 1e6 + 0.5)::long, the
    lm_bigram_score idiom — so the per-doc SUM is integer-exact and
    aggregation order can never move the result. The only cross-engine
    risk is ln() ulp parity at the 1e-6 quantization boundary, the
    same accepted class as lm_bigram_score / the rounded cosines.

    Plan shape (and why it scales to 100 TB):
      1. the corpus-scale work is TWO map-combined shuffles: the
         (doc, bucket) feature aggregation (key space ≤ docs ×
         n_buckets, combiner collapses repeats executor-side) and the
         final per-doc weight sum;
      2. BOTH distributions re-aggregate the (doc, is_target, bucket)
         feature frame — ≤ n_buckets rows each after their
         map-combined agg, never a second corpus pass per
         distribution;
      3. the log-ratio table is ≤ n_buckets rows and joins the
         feature frame under an explicit broadcast() — the corpus
         side never shuffles to get its ratio terms;
      4. hot buckets (Zipf grams all hashing into few buckets) are a
         non-issue: the skew lives inside the map-combined feature
         agg, which ships one row per (partition, doc, bucket).
    A raw doc's every bucket appears in the raw distribution by
    construction, so the ratio join is exact (no lost grams); buckets
    the target never saw get the Laplace floor 1/(T_t + n_buckets).

    Output: (doc_id, n_grams, logw) — one row per RAW-pool doc
    (every doc has ≥ 1 gram: whitespace split of an empty string —
    NULL text included, via coalesce — yields the '' token,
    identically on DuckDB; a NULL source is raw); logw rounded to
    6 dp. An empty target corpus raises rather than returning all-NULL
    weights.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if not target_sources:
        raise ValueError("target_sources must be non-empty")
    # null-robust contract (review r3): NULL text tokenizes as the
    # empty string (one '' gram — the doc keeps its output row), and a
    # NULL source is raw by definition (isin(NULL) is NULL, which
    # would otherwise exclude the doc from BOTH distributions and
    # silently drop it from the output)
    tk = tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    tkf = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.col(source_col).isin(*target_sources), F.lit(False)
        ).alias("tgt"),
        tk.alias("tk"),
    )
    uni = tkf.select("doc_id", "tgt", F.explode("tk").alias("g"))
    m = F.size("tk") - 1
    big = (
        tkf.filter(F.size("tk") >= 2)
        .select(
            "doc_id", "tgt",
            F.explode(
                F.arrays_zip(
                    F.slice("tk", 1, m).alias("w1"),
                    F.slice("tk", 2, m).alias("w2"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id", "tgt",
            F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("g"),
        )
    )
    ex = uni.union(big).select(
        "doc_id", "tgt", (md5_long60(F.col("g")) % n_buckets).alias("b")
    )
    feat = ex.groupBy("doc_id", "tgt", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bt = feat.filter(F.col("tgt")).groupBy("b").agg(F.sum("cnt").alias("ct"))
    br = feat.filter(~F.col("tgt")).groupBy("b").agg(F.sum("cnt").alias("cr"))
    tt = bt.agg(F.sum("ct").alias("tt"))
    tr = br.agg(F.sum("cr").alias("tr"))
    # tt is NULL ⟺ the target matched zero docs — every logw would be
    # silently NULL; raise through the expression instead (review r3)
    tt_checked = F.when(
        F.col("tt").isNull(),
        F.raise_error(F.lit(
            "dsir_weights: target corpus is empty (no doc matched "
            "target_sources)"
        )).cast("long"),
    ).otherwise(F.col("tt"))
    lr = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
              / (tt_checked + F.lit(float(n_buckets))))
        - F.log((F.col("cr") + 1) / (F.col("tr") + F.lit(float(n_buckets))))
    )
    ratio = (
        br.join(bt, "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "b",
            F.floor(lr * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lrq"),
        )
    )
    return (
        feat.filter(~F.col("tgt"))
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("cnt") * F.col("lrq")) / F.lit(1e6), 6)
            .alias("logw"),
        )
    )


def weighted_sample(docs: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id",
                    seed: str = "wsamp-v1") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis via
    the exponential race): keep the k rows with the smallest
    key = −ln(u)/w, u = hash_unit(seed, id) — each row's key is an
    Exp(w) draw, so inclusion probabilities follow the classic A-ES
    successive-sampling design (a row with twice the weight is twice
    as likely to win each slot). The deterministic-u construction
    makes the draw a pure function of (seed, id): append-stable,
    engine-portable, no RNG state — the weighted complement to
    stratified_sample's rate filter and temperature_resample's
    with-replacement mixing (quality-score-weighted corpus
    subsampling is this operator with w = quality).

    Portability contract: keys round to 9 dp BEFORE selection and
    ties break on id ascending, so the selected set is identical on
    any engine whose ln() agrees to within the quantum — the same
    accepted class as every other rounded-transcendental operator
    here. Rows with NULL or non-positive weight never qualify
    (documented, not an error: a zero-weight row has zero inclusion
    probability by definition).

    Plan shape: the key is a pure row expression; selection is
    orderBy(key, id).limit(k), which Spark plans as
    TakeOrderedAndProject — per-partition top-k heaps, one k-row
    merge, NO full sort and NO wide exchange. k is assumed
    driver-mergeable (≤ ~10^6); for larger samples compose the
    stratum_cap two-phase threshold pattern instead.

    Output: (<id_col>, <weight_col>, skey) for the k winners.
    """
    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = hash_unit(id_col, seed)
    key = F.round(-F.log(u) / w, 9)
    return (
        docs.filter(w.isNotNull() & (w > 0))
        .select(F.col(id_col), F.col(weight_col), key.alias("skey"))
        .orderBy(F.col("skey").asc(), F.col(id_col).asc())
        .limit(k)
    )
