"""Benchmark harness (driver contract + north-rule scaling evidence).

Measures:
1. index-build throughput (turns/sec) on a deterministic synthetic
   transcript corpus at TWO parallelism levels — local[8] and local[32]
   (the sandbox stand-in for N vs 4N executors) — and the scaling
   efficiency throughput(4N) / (4 * throughput(N)).
2. BM25 top-10 query latency over the built index (FIXTURES.md query
   shapes incl. the hot skewed term).

Each build runs in a fresh subprocess so the JVM/session is cold and the
parallelism level is honest.  Prints ONE JSON line; also rewrites
BENCH.md with the human-readable report.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1) — only used to
                       derive sf for corpus sizing; the corpus itself is
                       synthesized (transcripts are not in the testdata).
  SPARK_GRAFT_CPUS     (default 32) — the high parallelism level.
  RESIN_BENCH_TURNS    override corpus size (approx turns).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = {
    "q_single": {"or": {"text": "banana"}},
    "q_and": {"and": {"text": "banana cantalope"}},
    "q_or": {"or": {"text": "apple banana"}},
    "q_not": {"and": {"text": "apple", "not": {"text": "apples"}}},
    "q_hot": {"and": {"text": "hotterm"}},
    "q_unicode": {"or": {"text": "ferriman gallwey score"}},
    "q_multifield": {"and": {"role": "tool", "and": {"text": "search"}}},
}


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else 0.1


def _build_once(cores: int, n_convs: int, max_turns: int, root: str) -> dict:
    """Run one cold build in a subprocess; return its stats JSON."""
    code = f"""
import sys, json, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from resin_spark.session import make_session
from resin_spark.fixtures import transcripts_df_distributed
from resin_spark.build import build_index

spark = make_session("local[{cores}]", "bench_build", shuffle_partitions={max(16, cores)})
spark.sparkContext.setLogLevel("ERROR")
# JIT warmup: run the full pipeline once on a small slice so the timed
# run measures steady-state throughput, not C2 compilation
warm = transcripts_df_distributed(spark, max(200, {n_convs} // 20), {max_turns})
build_index(spark, warm, {root!r} + "_warmup")
t = transcripts_df_distributed(spark, {n_convs}, {max_turns})
t0 = time.monotonic()
out = build_index(spark, t, {root!r})
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"turns": out["turns"], "wall_sec": wall,
      "turns_per_sec": out["turns"] / wall}}))
spark.stop()
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3000)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"build subprocess failed (cores={cores}):\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    lo = max(1, hi // 4)
    max_turns = 12  # avg ~6.5 turns/conv
    target_turns = int(os.environ.get("RESIN_BENCH_TURNS", str(int(3_000_000 * sf))))
    n_convs = max(200, int(target_turns / (max_turns / 2 + 0.5)))

    t_all = time.monotonic()
    tmp = tempfile.mkdtemp(prefix="resin_bench_")
    b_lo = _build_once(lo, n_convs, max_turns, f"{tmp}/idx_lo")
    b_hi = _build_once(hi, n_convs, max_turns, f"{tmp}/idx_hi")
    eff = b_hi["turns_per_sec"] / ((hi / lo) * b_lo["turns_per_sec"])

    # query latency on the high-parallelism index, warm session
    from resin_spark.executor import SearchEngine
    from resin_spark.session import make_session

    spark = make_session(f"local[{hi}]", "bench_query", shuffle_partitions=max(8, hi))
    spark.sparkContext.setLogLevel("ERROR")
    engine = SearchEngine(spark, f"{tmp}/idx_hi")
    engine.stats()  # warm stats
    q_lat: dict[str, float] = {}
    for name, q in QUERIES.items():
        t0 = time.monotonic()
        engine.search(q, k=10).collect()
        q_lat[name] = round(time.monotonic() - t0, 3)
        engine.clear_cache()
    spark.stop()

    total = time.monotonic() - t_all
    result = {
        "metric": "bm25_engine_e2e_bench",
        "value": round(total, 2),
        "unit": "sec",
        "sf": sf,
        "queries": q_lat,
        "build_turns": b_hi["turns"],
        "build_local%d_turns_per_sec" % lo: round(b_lo["turns_per_sec"], 1),
        "build_local%d_turns_per_sec" % hi: round(b_hi["turns_per_sec"], 1),
        "build_local%d_wall_sec" % lo: round(b_lo["wall_sec"], 2),
        "build_local%d_wall_sec" % hi: round(b_hi["wall_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "query_latency_avg_sec": round(sum(q_lat.values()) / len(q_lat), 3),
    }

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — measured results (bench.py)\n\n"
            f"Corpus: {b_hi['turns']:,} synthetic transcript turns "
            f"(deterministic, FIXTURES.md shape; sf={sf}).\n\n"
            "| metric | local[%d] (N) | local[%d] (4N) |\n|---|---|---|\n" % (lo, hi)
            + f"| index-build wall (s) | {b_lo['wall_sec']:.1f} | {b_hi['wall_sec']:.1f} |\n"
            + f"| index-build throughput (turns/s) | {b_lo['turns_per_sec']:.0f} | {b_hi['turns_per_sec']:.0f} |\n"
            + f"\n**Scaling efficiency (N→4N)** = throughput(4N) / (4 × throughput(N)) "
            + f"= **{eff:.3f}** (north-rule target ≥ 0.8; evidenced at two local "
            + "parallelism levels per driver instruction — same input, cold JVM each).\n\n"
            + "BM25 top-10 query latency (warm session, local[%d]):\n\n" % hi
            + "| query | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v:.3f} |\n" for k, v in q_lat.items())
            + f"\nAvg: {result['query_latency_avg_sec']:.3f} s. Reference claims "
            + "\"sub-second\" phrase queries on a ~6M-doc corpus single-node "
            + "(README.md:34); per-query Spark job overhead dominates at this scale.\n"
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
