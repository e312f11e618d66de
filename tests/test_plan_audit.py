"""Engine-wide physical-plan audit.

The input_hint pins "vectorized pandas/Arrow UDFs (no per-row Python)
throughout". Row-at-a-time Python appears in Spark plans as
``BatchEvalPython``; Arrow-vectorized surfaces appear as
``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``.
This audit builds the logical→physical plan of EVERY batch query in
the driver contract and rejects any per-row-Python or cartesian
operator — a regression guard over the whole query surface, not one
operator at a time.
"""

import importlib.util
import os

import pytest

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry_audit", _ENTRY)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)

# streaming queries execute on registration (availableNow drain);
# exclude them from the plan-only audit (their operators are covered
# by the s_* parity gates)
_SKIP = {"s_hourly_stream", "s_tile_stream", "s_sessionize_stateful",
         "s_dedup_stream", "s_checks_stream"}

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


def _audit(qs, spark, sf_dir):
    offenders = {}
    for name, fn in qs.items():
        if name in _SKIP:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [op for op in FORBIDDEN if op in plan]
        if hits:
            offenders[name] = hits
    assert not offenders, f"per-row Python / cartesian operators: {offenders}"


def test_no_per_row_python_or_cartesian_in_any_query_plan(spark, sf_dir):
    _audit(entry_mod.queries(), spark, sf_dir)


def test_no_per_row_python_or_cartesian_in_demoted_plans(spark, sf_dir):
    # the demoted registry holds the NEWEST operators (SemDeDup, DSIR,
    # IVF-PQ, boilerplate, funnel, ...) — exactly where a per-row-
    # Python or cartesian regression would land first
    _audit(entry_mod.demoted_queries(), spark, sf_dir)


def test_entry_plan_is_arrow_only(spark):
    plan = entry_mod.entry(spark)._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan
    # the extraction path must be Arrow-vectorized, not absent
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
