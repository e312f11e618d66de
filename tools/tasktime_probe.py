"""Event-log task-time accounting for the scaling gap.

Runs the flagship tile job once per pinned core level with the Spark
event log on, then aggregates per level: wall, sum(executorRunTime),
sum(executorCpuTime), GC time, shuffle fetch/write wait, result-serialize,
deserialize, and scheduler-idle = cores*wall - sum(runTime).

Interpretation:
* runTime@big  >> runTime@small  -> per-core contention (GC, locks, bw)
* runTime equal but idle@big big -> stragglers / waves / serial stages
Usage: python tools/tasktime_probe.py [--docs 10000000] [--small 4] [--big 16]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, os, sys, time
os.sched_setaffinity(0, set(range({cores})))
sys.path.insert(0, {repo!r})
from asag_spark.session import get_spark
from asag_spark.functions import assign_tiles
from asag_spark.operators.enrich import build_features

spark = get_spark("tasktime", master="local[{cores}]",
                  shuffle_partitions={cores},
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "16m",
                      "spark.eventLog.enabled": "true",
                      "spark.eventLog.compress": "false",
                      "spark.eventLog.dir": {evdir!r},
                  }})
docs = spark.read.parquet({docs_path!r})
tiles = assign_tiles(build_features(docs, as_of="2019-01-01T00:00:00"))
tiles.write.format("noop").mode("overwrite").save()   # warm
t0 = time.perf_counter()
tiles.write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
print("WALL " + json.dumps({{"cores": {cores}, "wall": round(wall, 2)}}))
spark.stop()
"""


def run_level(cores: int, docs_path: str, evdir: str) -> float:
    os.makedirs(evdir, exist_ok=True)
    code = SNIPPET.format(repo=REPO, cores=cores, docs_path=docs_path,
                          evdir=evdir)
    env = dict(os.environ, PYTHONPATH=REPO, OPENBLAS_NUM_THREADS="1",
               OMP_NUM_THREADS="1",
               ASAG_DRIVER_MEM=os.environ.get("ASAG_DRIVER_MEM", "20g"))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("WALL "):
            return json.loads(line[5:])["wall"]
    raise RuntimeError(out.stderr[-3000:])


def aggregate(evdir: str, half: str = "second") -> dict:
    """Sum task metrics from the single event-log file in evdir.

    The snippet runs the job twice (warm + timed); `half` selects which
    job's stages to count by splitting tasks at the midpoint job id.
    """
    files = [f for f in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
             if os.path.isfile(f) and "appstatus" not in os.path.basename(f)]
    assert len(files) >= 1, files
    agg = dict(run=0.0, cpu=0.0, gc=0.0, fetch_wait=0.0, write_time=0.0,
               deser=0.0, ser=0.0, tasks=0)
    stage_to_job = {}
    job_submit = []
    rows = []
    import io
    import subprocess as sp

    def opened(p):
        if p.endswith(".zstd"):
            raw = sp.run(["unzstd", "-c", p], capture_output=True).stdout
            return io.StringIO(raw.decode())
        return open(p)

    for path in files:
        with opened(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    job_submit.append(jid)
                    for sid in ev["Stage IDs"]:
                        stage_to_job[sid] = jid
                elif k == "SparkListenerTaskEnd":
                    rows.append(ev)
    jobs = sorted(job_submit)
    cut = jobs[len(jobs) // 2] if half == "second" else None
    per_stage = {}
    for ev in rows:
        sid = ev["Stage ID"]
        if cut is not None and stage_to_job.get(sid, 0) < cut:
            continue
        m = ev.get("Task Metrics") or {}
        sm = per_stage.setdefault(sid, dict(run=0.0, cpu=0.0, gc=0.0,
                                            fetch_wait=0.0, write_time=0.0,
                                            tasks=0, max_run=0.0))
        run = m.get("Executor Run Time", 0) / 1e3
        sm["run"] += run
        sm["max_run"] = max(sm["max_run"], run)
        sm["cpu"] += m.get("Executor CPU Time", 0) / 1e9
        sm["gc"] += m.get("JVM GC Time", 0) / 1e3
        sm["fetch_wait"] += (m.get("Shuffle Read Metrics") or {}).get(
            "Fetch Wait Time", 0) / 1e3
        sm["write_time"] += (m.get("Shuffle Write Metrics") or {}).get(
            "Shuffle Write Time", 0) / 1e9
        sm["tasks"] += 1
        for key in ("run", "cpu", "gc", "fetch_wait", "write_time"):
            agg[key] += sm and 0  # aggregated below
    for sm in per_stage.values():
        for key in ("run", "cpu", "gc", "fetch_wait", "write_time", "tasks"):
            agg[key] += sm[key]
    agg["per_stage"] = {
        sid: {k: round(v, 1) for k, v in sm.items()}
        for sid, sm in sorted(per_stage.items())
    }
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10000000)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--big", type=int, default=16)
    args = ap.parse_args()
    docs_path = f"/tmp/asag_bench/docs_{args.docs}"
    assert os.path.exists(os.path.join(docs_path, "_SUCCESS")), docs_path

    for cores in (args.small, args.big):
        evdir = f"/tmp/asag_ev_{cores}"
        subprocess.run(["rm", "-rf", evdir])
        wall = run_level(cores, docs_path, evdir)
        agg = aggregate(evdir)
        idle = cores * wall - agg["run"]  # includes the warm run's tasks? no: second half only
        print(f"\n=== cores={cores} wall={wall}s ===")
        print(json.dumps({k: round(v, 1) if isinstance(v, float) else v
                          for k, v in agg.items() if k != "per_stage"}))
        print(f"idle = cores*wall - sum(run) = {idle:.1f}s "
              f"({100 * idle / (cores * wall):.0f}% of slots)")
        for sid, sm in agg["per_stage"].items():
            print(f"  stage {sid:>3}: tasks={sm['tasks']:>3} run={sm['run']:>8} "
                  f"cpu={sm['cpu']:>8} gc={sm['gc']:>7} fw={sm['fetch_wait']:>6} "
                  f"wt={sm['write_time']:>6} max_task={sm['max_run']:>7}")


if __name__ == "__main__":
    main()
