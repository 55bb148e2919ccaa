"""Per-stage breakdown of the index build from the Spark event log.

Runs the same build at several parallelism levels (fresh subprocess each,
JIT-warmed), parses the event log, and prints per-stage wall / task-time /
cpu / GC / shuffle bytes plus the stage-by-stage N->4N scaling ratio —
the evidence VERDICT r1 asked for: *which* stage (if any) scales worse
than the machine's memory-bandwidth control.

Usage: python scripts/stage_breakdown.py [target_turns] [cores ...]
Defaults: 10_000_000 turns, cores 1 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_build(cores: int, n_convs: int, max_turns: int, outdir: str) -> dict:
    code = f"""
import sys, json, time
sys.path.insert(0, {REPO!r})
from resin_spark.session import make_session
from resin_spark.fixtures import transcripts_df_distributed
from resin_spark.build import build_index

spark = make_session("local[{cores}]", "stagebd",
                     shuffle_partitions=max(8, {cores} * 2),
                     extra={{"spark.eventLog.enabled": "true",
                             "spark.eventLog.compress": "false",
                             "spark.eventLog.rolling.enabled": "false",
                             "spark.eventLog.dir": "file://{outdir}"}})
spark.sparkContext.setLogLevel("ERROR")
warm = transcripts_df_distributed(spark, 2000, {max_turns})
build_index(spark, warm, {outdir!r} + "/warm_idx")
# profile the contract job: indexing a parquet TABLE (matches bench.py)
transcripts_df_distributed(spark, {n_convs}, {max_turns}).write.mode(
    "overwrite").parquet({outdir!r} + "/corpus")
t = spark.read.parquet({outdir!r} + "/corpus")
t0_epoch = time.time() * 1000
t0 = time.monotonic()
out = build_index(spark, t, {outdir!r} + "/idx")
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"wall": wall, "turns": out["turns"],
      "app_id": spark.sparkContext.applicationId, "t0_ms": t0_epoch}}))
spark.stop()
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=5400)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"build failed (cores={cores}):\n{p.stdout[-2000:]}\n"
                       f"{p.stderr[-3000:]}")


def parse_log(outdir: str, app_id: str, t0_ms: float) -> dict:
    """Aggregate per-stage metrics for stages submitted after t0_ms."""
    path = os.path.join(outdir, app_id)
    if not os.path.exists(path):
        path += ".inprogress"
    task = defaultdict(lambda: defaultdict(float))
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                t = task[sid]
                t["run_ms"] += m.get("Executor Run Time", 0)
                t["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                t["gc_ms"] += m.get("JVM GC Time", 0)
                t["tasks"] += 1
                sw = m.get("Shuffle Write Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                t["shuf_w_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                t["shuf_w_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                t["shuf_r_mb"] += (sr.get("Local Bytes Read", 0)
                                   + sr.get("Remote Bytes Read", 0)) / 1e6
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                if sub is None or sub < t0_ms:
                    continue
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split(" at ")[0],
                    "detail": si["Stage Name"],
                    "wall_ms": si.get("Completion Time", sub) - sub,
                }
    rows = []
    for sid, info in sorted(stages.items()):
        m = task.get(sid, {})
        rows.append({"stage": sid, **info,
                     **{k: round(v, 1) for k, v in m.items()}})
    return rows


def phase_of(detail: str) -> str:
    """Map a stage callsite to a build phase."""
    d = detail
    if "zipWithIndex" in d or "createDataFrame" in d:
        return "conv_dim (sort+zipWithIndex)"
    if "count" in d.split(" at ")[0]:
        return "counts (conv_dim/docs)"
    if "parquet" in d:
        return "write (docs or postings+encode)"
    return d.split(" at ")[0]


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores_list = [int(c) for c in sys.argv[2:]] or [1, 4]
    max_turns = 12
    n_convs = max(200, int(target / (max_turns / 2 + 0.5)))
    results = {}
    for cores in cores_list:
        outdir = tempfile.mkdtemp(prefix=f"stagebd_{cores}_")
        r = run_build(cores, n_convs, max_turns, outdir)
        rows = parse_log(outdir, r["app_id"], r["t0_ms"])
        results[cores] = {"wall": r["wall"], "turns": r["turns"], "stages": rows}
        print(f"\n=== local[{cores}]  wall={r['wall']:.1f}s "
              f"({r['turns']/r['wall']:.0f} turns/s) ===")
        for row in rows:
            print(f"  stage {row['stage']:>3} {row['name'][:28]:<28} "
                  f"wall={row['wall_ms']/1000:7.1f}s run={row.get('run_ms',0)/1000:8.1f}s "
                  f"cpu={row.get('cpu_ms',0)/1000:8.1f}s gc={row.get('gc_ms',0)/1000:6.1f}s "
                  f"tasks={int(row.get('tasks',0)):>4} "
                  f"shufW={row.get('shuf_w_mb',0):8.1f}MB shufR={row.get('shuf_r_mb',0):8.1f}MB")
        # wall not covered by any stage = driver-side gaps
        stage_wall = sum(row["wall_ms"] for row in rows) / 1000
        print(f"  stage-wall sum {stage_wall:.1f}s  vs  build wall "
              f"{r['wall']:.1f}s  (driver gaps ~{r['wall']-stage_wall:.1f}s; "
              "stages can overlap)")
    if len(cores_list) == 2:
        lo, hi = cores_list
        a, b = results[lo], results[hi]
        print(f"\n=== per-stage scaling local[{lo}] -> local[{hi}] "
              f"(ideal wall ratio {hi/lo:.0f}x) ===")
        # align by order of appearance (same plan => same stage sequence)
        for ra, rb in zip(a["stages"], b["stages"]):
            if ra["wall_ms"] < 500:
                continue
            ratio = ra["wall_ms"] / max(rb["wall_ms"], 1)
            eff = ratio / (hi / lo)
            print(f"  {ra['name'][:30]:<30} {ra['wall_ms']/1000:7.1f}s -> "
                  f"{rb['wall_ms']/1000:7.1f}s  speedup {ratio:4.2f}x  eff {eff:.2f}")
        print(f"  TOTAL wall {a['wall']:.1f}s -> {b['wall']:.1f}s  "
              f"speedup {a['wall']/b['wall']:.2f}x  "
              f"eff {(a['wall']/b['wall'])/(hi/lo):.2f}")
    print("\nRESULT_JSON " + json.dumps({
        c: {"wall": r["wall"], "turns": r["turns"],
            "stages": [{k: row.get(k) for k in
                        ("stage", "detail", "wall_ms", "run_ms", "cpu_ms",
                         "gc_ms", "tasks", "shuf_w_mb", "shuf_r_mb")}
                       for row in r["stages"]]}
        for c, r in results.items()}))


if __name__ == "__main__":
    main()
