"""End-to-end curation driver (plans/curate.py): funnel sanity, stage
resume, and partial-resume after losing a stage marker. Driven as a
subprocess (the driver owns and stops its SparkSession, like
plans/job.py in test_submit.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(workdir, sf_dir):
    proc = subprocess.run(
        [sys.executable, "-m", "asag_spark.plans.curate",
         "--input", f"{sf_dir}/documents.parquet",
         "--workdir", str(workdir),
         "--quality-gate", "topq",
         "--master", "local[8]"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_curate_funnel_and_resume(tmp_path, sf_dir, spark):
    r1 = _run(tmp_path, sf_dir)
    f = r1["funnel"]
    # funnel is monotone non-increasing and ends non-empty
    assert f["input"] >= f["quality_gate"] >= f["exact_dedup"] \
        >= f["near_dedup"] >= f["output"] > 0
    assert all(not s["resumed"] for s in r1["stages"])

    # identical rerun resumes every stage
    r2 = _run(tmp_path, sf_dir)
    assert all(s["resumed"] for s in r2["stages"])
    assert r2["funnel"] == r1["funnel"]

    # kill the LAST stage's marker: only it re-runs (earlier stages'
    # lineage fingerprints still match)
    os.remove(tmp_path / "split_shard" / "data" / "_SUCCESS")
    r3 = _run(tmp_path, sf_dir)
    flags = {s["stage"]: s["resumed"] for s in r3["stages"]}
    assert flags.pop("split_shard") is False
    assert all(flags.values())
    assert r3["funnel"] == r1["funnel"]

    # outputs carry split + shard columns with sane domains
    out = spark.read.parquet(str(tmp_path / "split_shard" / "data"))
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    shards = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert shards <= set(range(8))

    # per-partition lineage metrics exist for every stage
    stages = {r["stage"] for r in
              spark.read.parquet(str(tmp_path / "*" / "metrics")).collect()}
    assert stages == {"quality_gate", "pii_scrub", "ngram_scrub",
                      "exact_dedup", "near_dedup", "split_shard"}
