"""North-rule drive mode: the checkpointed pipeline end-to-end via
`spark-submit --py-files` (tools/run_submit.sh — the exact cluster
deployment shape), including idempotent resume: the second submit of
the same input must skip every stage via the checkpoint fingerprints.

Reference analog: MapBoxUpdateRouteBuilderTest drives the full Camel
route; here the route is the staged Spark driver (plans/job.py).
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit(docs_path: str, workdir: str) -> dict:
    proc = subprocess.run(
        ["bash", f"{REPO}/tools/run_submit.sh", "local[4]", docs_path, workdir],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the driver prints ONE json line (stage log) on stdout
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_pipeline_and_resume(spark, tmp_path):
    from asag_spark.datagen import generate_docs

    docs_path = str(tmp_path / "docs")
    generate_docs(spark, 2000, partitions=4).write.parquet(docs_path)
    workdir = str(tmp_path / "wd")

    first = _submit(docs_path, workdir)
    assert first["n_docs"] == 2000
    stages = {s["stage"]: s for s in first["stages"]}
    assert set(stages) >= {"extract_features", "tile_assign", "tiles", "pyramid"}
    assert not any(s["resumed"] for s in first["stages"])
    # checkpointed stage outputs exist on disk
    assert os.path.isdir(os.path.join(workdir, "extract_features"))

    second = _submit(docs_path, workdir)
    assert all(s["resumed"] for s in second["stages"]), second["stages"]
