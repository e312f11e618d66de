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
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = F.split(norm, " ")
    n_sh = F.size(toks) - k + 1
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 16
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
        .otherwise(F.array(F.substring(F.md5(norm), 1, 16)))
    )
    return (
        docs.withColumn("_sh", shingles)
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
    u = (
        md5_long60(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ) + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
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
