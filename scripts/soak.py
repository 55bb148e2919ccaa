"""Soak run: the full engine lifecycle at 10M+ turns on local[32].

Exercises at ~5x bench scale what the unit tests prove at toy scale:
multi-segment build -> interrupted-resume (no-op on receipts) ->
queries over segments -> compaction -> identical queries after.
Prints one JSON line; non-zero exit on any mismatch.

Usage: python scripts/soak.py [n_convs]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resin_spark.build import build_index, compact, completed_segments, resume_build
from resin_spark.executor import SearchEngine
from resin_spark.fixtures import transcripts_df_distributed
from resin_spark.session import make_session

QUERIES = [
    {"or": {"text": "banana"}},
    {"and": {"text": "apple", "not": {"text": "apples"}}},
    {"and": {"text": "hotterm"}},
    {"or": {"text": "ferriman gallwey score"}},
]


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000  # ~10.4M turns
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_session(f"local[{cpus}]", "soak", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="resin_soak_") + "/coll"

    t = transcripts_df_distributed(spark, n_convs, 12)
    t0 = time.monotonic()
    out = build_index(spark, t, root, n_segments=4)
    build_wall = time.monotonic() - t0

    # resume on a completed index is a receipt-checked no-op
    t0 = time.monotonic()
    assert completed_segments(spark, root) == {0, 1, 2, 3}
    r = resume_build(spark, t, root, n_segments=4)
    resume_wall = time.monotonic() - t0
    assert r["turns"] == 0, f"resume rebuilt segments: {r}"

    eng = SearchEngine(spark, root)
    before = {json.dumps(q): eng.topk(q, k=10) for q in QUERIES}
    assert all(len(v) > 0 for v in before.values()), "queries must match"

    t0 = time.monotonic()
    compact(spark, root)
    compact_wall = time.monotonic() - t0

    eng.refresh()
    after = {json.dumps(q): eng.topk(q, k=10) for q in QUERIES}
    mismatches = [q for q in before if before[q] != after[q]]

    print(json.dumps({
        "turns": out["turns"],
        "segments": 4,
        "build_wall_sec": round(build_wall, 1),
        "build_turns_per_sec": round(out["turns"] / build_wall, 1),
        "resume_noop_sec": round(resume_wall, 2),
        "compact_wall_sec": round(compact_wall, 1),
        "query_parity_after_compact": not mismatches,
        "mismatches": mismatches,
    }))
    spark.stop()
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
