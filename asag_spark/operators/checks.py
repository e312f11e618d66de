"""Data-quality contract checks (the Deequ / Great Expectations
component of a production pipeline): declarative per-column rules
evaluated in ONE aggregation pass over the table, emitted as a
metrics frame a gate can assert on before data ships downstream.

The reference has no validation stage (its XSD check is schema-level,
mirrored by netex.validate_delivery); this is the row-content
counterpart a 100 TB ingest runs between landing and curation — the
same role as plans/checkpoint.py's row-count metrics, extended to
content constraints.

Scale shape: every rule compiles to conditional aggregate expressions
over ONE scan — a single map-combined hash aggregate with no grouping
key (partial rows are one row per partition), so the pass costs one
scan regardless of rule count. The `unique` rule needs a distinct
count; it uses count_distinct (exact), which Spark plans via expand +
two-level aggregate — still map-combined per key, and the only rule
whose wire volume is data-dependent; at 10^12 rows swap in
approx_count_distinct via the ``approx_unique`` rule when a relative
HLL bound is acceptable (both variants are first-class so the choice
is explicit, not silent). All observed values are exact counts (longs
cast to double only at the output boundary) — engine-portable, no
float accumulation.

Rules (dicts, validated loudly):
  {"rule": "not_null",        "col": c}
  {"rule": "unique",          "col": c}                 # exact
  {"rule": "approx_unique",   "col": c, "rsd": 0.05}    # HLL; passes
                                        # within a 2·rsd band; no oracle
  {"rule": "range",           "col": c, "min": x, "max": y}  # null passes;
                                        # at least one bound required
  {"rule": "accepted_values", "col": c, "values": [...]}     # null fails
  {"rule": "matches",         "col": c, "regex": r}          # null fails
  {"rule": "min_rows",        "n": k}

Output: one row per rule —
  (rule_id, rule, column, observed, expected, passed)
where observed = the violating-row count (not_null / range /
accepted_values / matches), the distinct count (unique variants), or
the row count (min_rows); expected = the bound the rule asserts
(violations: 0; unique: the total non-null count it must equal;
min_rows: k); passed = 1/0. rule_id is the rule's position in the
input list, so the output order is the contract order and joins back
to the caller's rule table deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULES = ("not_null", "unique", "approx_unique", "range",
          "accepted_values", "matches", "min_rows")


def _violations(rule: dict) -> Column:
    """Conditional count of rows violating the rule (None when the
    rule is not violation-shaped)."""
    c = F.col(rule["col"]) if "col" in rule else None
    kind = rule["rule"]
    if kind == "not_null":
        return F.count(F.when(c.isNull(), F.lit(1)))
    if kind == "range":
        lo, hi = rule.get("min"), rule.get("max")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (c < F.lit(lo))
        if hi is not None:
            bad = bad | (c > F.lit(hi))
        return F.count(F.when(bad, F.lit(1)))
    if kind == "accepted_values":
        vals = [F.lit(v) for v in rule["values"]]
        return F.count(F.when(~c.isin(*vals) | c.isNull(), F.lit(1)))
    if kind == "matches":
        ok = c.isNotNull() & c.cast("string").rlike(rule["regex"])
        return F.count(F.when(~ok, F.lit(1)))
    return None


def _validate_rules(rules: list[dict], exact_unique_ok: bool = True) -> None:
    if not rules:
        raise ValueError("table_checks: rules must be non-empty")
    for i, r in enumerate(rules):
        if r.get("rule") not in _RULES:
            raise ValueError(
                f"table_checks: rule #{i} has unknown kind {r.get('rule')!r}"
                f" (known: {_RULES})"
            )
        if r["rule"] != "min_rows" and "col" not in r:
            raise ValueError(f"table_checks: rule #{i} needs 'col'")
        if r["rule"] == "min_rows" and "n" not in r:
            raise ValueError("table_checks: min_rows needs 'n'")
        if r["rule"] == "range" and r.get("min") is None \
                and r.get("max") is None:
            raise ValueError(
                "table_checks: range needs 'min' and/or 'max' (a "
                "boundless range asserts nothing)"
            )
        if r["rule"] == "accepted_values" and not r.get("values"):
            raise ValueError("table_checks: accepted_values needs 'values'")
        if r["rule"] == "matches" and not r.get("regex"):
            raise ValueError("table_checks: matches needs 'regex'")
        if r["rule"] == "unique" and not exact_unique_ok:
            raise ValueError(
                "checks_stream: exact 'unique' needs a distinct aggregate, "
                "which streaming aggregation does not support — use "
                "'approx_unique'"
            )


def _rule_aggs(rules: list[dict]) -> list[Column]:
    """One conditional-aggregate column set for the whole contract —
    shared by the batch single-pass and the streaming per-window
    variants (the compilation IS the operator; only the grouping
    differs)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "unique":
            c = F.col(r["col"])
            aggs.append(F.count_distinct(c).alias(f"_d{i}"))
            aggs.append(F.count(c).alias(f"_c{i}"))
        elif kind == "approx_unique":
            c = F.col(r["col"])
            aggs.append(
                F.approx_count_distinct(c, rsd=float(r.get("rsd", 0.05)))
                .alias(f"_d{i}")
            )
            aggs.append(F.count(c).alias(f"_c{i}"))
        elif kind != "min_rows":
            aggs.append(_violations(r).alias(f"_v{i}"))
    return aggs


def _readout(rules: list[dict]) -> list[Column]:
    """Per-rule result structs over the aggregate columns _rule_aggs
    emits — exploded as a plan-time array so rule count never
    multiplies jobs."""
    out_rows = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        col = r.get("col")
        if kind == "unique":
            observed = F.col(f"_d{i}")
            expected = F.col(f"_c{i}")
            passed = observed == expected
        elif kind == "approx_unique":
            # HLL is exact only in its small-cardinality sparse mode;
            # at real cardinalities the estimate carries ~rsd relative
            # error, so exact equality would false-alarm on perfectly
            # unique data (review r3). Pass within a 2·rsd band — the
            # ~95% interval of the HLL error distribution.
            observed = F.col(f"_d{i}")
            expected = F.col(f"_c{i}")
            tol = 2.0 * float(r.get("rsd", 0.05))
            passed = (
                F.abs(observed - expected)
                <= F.lit(tol) * F.greatest(expected, F.lit(1))
            )
        elif kind == "min_rows":
            observed = F.col("_n")
            expected = F.lit(int(r["n"])).cast("long")
            passed = observed >= expected
        else:
            observed = F.col(f"_v{i}")
            expected = F.lit(0).cast("long")
            passed = observed == expected
        out_rows.append(F.struct(
            F.lit(i).cast("int").alias("rule_id"),
            F.lit(kind).alias("rule"),
            (F.lit(col) if col is not None
             else F.lit(None).cast("string")).alias("column"),
            observed.cast("double").alias("observed"),
            expected.cast("double").alias("expected"),
            F.when(passed, F.lit(1)).otherwise(F.lit(0)).cast("int")
            .alias("passed"),
        ))
    return out_rows


def table_checks(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` in one aggregation job; see
    module docstring for the rule grammar and output contract."""
    _validate_rules(rules)
    agg = df.agg(*_rule_aggs(rules))
    # one row in, |rules| rows out: explode the plan-time struct array
    # over the single aggregate row — no second pass, no union of jobs
    return agg.select(
        F.explode(F.array(*_readout(rules))).alias("r")
    ).select("r.*")


def assert_checks(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Gate form: evaluate and RAISE listing every failed rule (the
    stop-the-line behavior a pipeline stage wants between landing and
    curation); returns the metrics frame when all rules pass so
    callers can persist it alongside checkpoint metrics."""
    out = table_checks(df, rules)
    rows = out.collect()
    failed = [r for r in rows if r["passed"] == 0]
    if failed:
        detail = "; ".join(
            f"#{r['rule_id']} {r['rule']}({r['column']}) "
            f"observed={r['observed']:g} expected={r['expected']:g}"
            for r in failed
        )
        raise ValueError(f"table_checks failed: {detail}")
    return out


def psi_drift(ref: DataFrame, cur: DataFrame, col: str,
              bins: int = 10, lo: float | None = None,
              hi: float | None = None) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard production drift monitor ("did this
    feature's distribution move between last week's corpus and
    today's"). PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b)/p_ref(b))
    over fixed-width bins; the conventional alert bands are ~0.1
    (drifting) and ~0.25 (shifted).

    Binning: ``bins`` equal-width bins over [lo, hi] — bounds default
    to the REFERENCE snapshot's min/max (one tiny agg, collected
    driver-side: two scalars, the broadcast-threshold class of
    collect); values outside clamp into the edge bins so a shifted
    current snapshot lands visibly in bin 0 / bins−1 instead of
    disappearing; nulls get their own bin (id = ``bins``) so null-rate
    drift is part of the same number. Add-one smoothing keeps every
    ln() finite regardless of empty bins.

    Engine-portable math: bin ids are exact integer arithmetic; the
    per-bin PSI term is quantized ONCE (floor(term·1e6 + 0.5), the
    lm_bigram_score idiom) so the total is an integer sum — identical
    under any aggregation order, DuckDB-reproducible.

    Plan shape at 100 TB: each snapshot contributes ONE map-combined
    keyless-then-bin aggregation (wire = bins+1 rows per partition);
    the bin join and the PSI window run on ≤ bins+1 rows. Nothing is
    data-dependent except the two scans.

    Output: one row per bin, ALL bins 0..``bins`` (the last is the
    null bin) whether occupied or not — never-occupied bins still
    contribute their add-one-smoothed terms, the standard all-bin
    smoothed PSI — as (bin, n_ref, n_cur, term, psi): ``term`` the
    bin's smoothed PSI contribution and ``psi`` the total (identical
    on every row, so a single-row gate reads it without a second
    pass); both 6 dp.
    """
    from pyspark.sql import Window

    if bins < 2:
        raise ValueError(f"psi_drift: bins must be >= 2, got {bins}")
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        row = ref.agg(
            F.min(c).alias("lo"), F.max(c).alias("hi")
        ).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
        if lo is None or hi is None:
            raise ValueError(f"psi_drift: reference column {col!r} is all null")
    if not hi > lo:
        raise ValueError(f"psi_drift: need hi > lo, got [{lo}, {hi}]")
    w = (float(hi) - float(lo)) / bins

    def binned(df, alias):
        b = F.when(
            c.isNull(), F.lit(bins)
        ).otherwise(
            F.least(
                F.greatest(
                    F.floor((c - F.lit(float(lo))) / F.lit(w)), F.lit(0)
                ),
                F.lit(bins - 1),
            )
        ).cast("int")
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(alias)
        )

    r = binned(ref, "n_ref")
    u = binned(cur, "n_cur")
    # all-bin spine (0..bins incl. the null bin — ≤ bins+1 rows from a
    # driver-side range): bins occupied in NEITHER snapshot still carry
    # nonzero add-one-smoothed terms whenever the two totals differ, so
    # joining only occupied bins made the total depend on which bins
    # happened to be hit — standard smoothed PSI sums over ALL bins
    spine = ref.sparkSession.range(0, bins + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = spine.join(r, "bin", "left").join(u, "bin", "left").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tiny = Window.partitionBy()  # ≤ bins+1 rows — single-task by design
    tr = F.sum("n_ref").over(tiny)
    tu = F.sum("n_cur").over(tiny)
    B = bins + 1
    pr = (F.col("n_ref") + 1) / (tr + F.lit(float(B)))
    pu = (F.col("n_cur") + 1) / (tu + F.lit(float(B)))
    term_q = F.floor((pu - pr) * F.log(pu / pr) * F.lit(1e6) + F.lit(0.5))
    out = joined.select(
        "bin", "n_ref", "n_cur", term_q.cast("long").alias("_tq")
    )
    return out.select(
        "bin", "n_ref", "n_cur",
        F.round(F.col("_tq") / F.lit(1e6), 6).alias("term"),
        F.round(
            F.sum("_tq").over(Window.partitionBy()) / F.lit(1e6), 6
        ).alias("psi"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Column profile — the OBSERVE side of the checks family (what
    you look at before writing a table_checks contract or a psi_drift
    bound): per column, row/null/distinct counts, stringified min and
    max (portable across types), and the numeric mean where the type
    is numeric.

    One aggregation pass for the whole profile: every statistic is an
    aggregate expression over the same scan. With ``exact_distinct``
    each column adds a count_distinct, which Spark plans via ONE
    expand over the scan (rows × profiled columns on the map side,
    still combined before the exchange) — the honest cost of exact
    cardinalities; ``exact_distinct=False`` swaps in
    approx_count_distinct (HLL: no expand, constant state) for the
    10^12-row profile, the same explicit trade the `unique` /
    `approx_unique` rules expose.

    Output: one row per profiled column —
    (column, n_rows, n_nulls, n_distinct, min_value, max_value, mean)
    with min/max cast to string (NULL for all-null columns), mean NULL
    for non-numeric columns, and 6-dp rounding on mean.
    """
    import pyspark.sql.types as T

    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), F.lit(1))).alias(f"_nul{i}"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"_d{i}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"_d{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max{i}"))
        if c in numeric:
            aggs.append(
                F.round(F.avg(col.cast("double")), 6).alias(f"_avg{i}")
            )
    agg = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nul{i}").alias("n_nulls"),
            F.col(f"_d{i}").alias("n_distinct"),
            F.col(f"_min{i}").alias("min_value"),
            F.col(f"_max{i}").alias("max_value"),
            (F.col(f"_avg{i}") if c in numeric
             else F.lit(None).cast("double")).alias("mean"),
        )
        for i, c in enumerate(cols)
    ]
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
