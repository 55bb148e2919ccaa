"""Targeted 6M-tier re-measurement of the shapes affected by raising
_BLOCKMAX_MIN_POSTINGS 200k -> 500k (q_single's 360k-df term now takes
the standard decode-once path).  Mirrors bench.py's bigscale tier:
same corpus generator, same positional build, medians of 3 cold
(clear_cache between trials) and 3 repeat-warm."""
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from resin_spark.executor import SearchEngine  # noqa: E402
from resin_spark.session import make_session  # noqa: E402
from resin_spark.build import build_index  # noqa: E402
from resin_spark.fixtures import transcripts_df_distributed  # noqa: E402

QUERIES = {
    "q_single": {"or": {"text": "banana"}},
    "q_and": {"and": {"text": "banana cantalope"}},
    "q_hot": {"and": {"text": "hotterm"}},
}

def main() -> None:
    spark = make_session("local[32]", "bigq_measure", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="bigq_")
    max_turns = 12
    big_convs = max(1000, int(6_000_000 / (max_turns / 2 + 0.5)))
    corpus = f"{tmp}/big_corpus.parquet"
    transcripts_df_distributed(spark, big_convs, max_turns).write.mode(
        "overwrite").parquet(corpus)
    bt = spark.read.parquet(corpus)
    t0 = time.monotonic()
    out = build_index(spark, bt, f"{tmp}/idx_big", positions=True)
    wall = time.monotonic() - t0
    print(f"build: {out['turns']:,} turns in {wall:.1f} s "
          f"({out['turns'] / wall:.0f} turns/s)", flush=True)
    eng = SearchEngine(spark, f"{tmp}/idx_big")
    eng.stats()
    eng.search({"and": {"text": "the a"}}, k=10).collect()
    eng.clear_cache()
    for name, q in QUERIES.items():
        ts = []
        for _ in range(3):
            eng.last_blockmax_stats = None
            t0 = time.monotonic()
            eng.search(q, k=10).collect()
            ts.append(time.monotonic() - t0)
            eng.clear_cache()
        bm = dict(eng.last_blockmax_stats) if eng.last_blockmax_stats else None
        eng.search(q, k=10).collect()
        ws = []
        for _ in range(3):
            t0 = time.monotonic()
            eng.search(q, k=10).collect()
            ws.append(time.monotonic() - t0)
        eng.clear_cache()
        print(f"{name}: cold {statistics.median(ts):.3f} s "
              f"(trials {[round(x, 3) for x in ts]}), "
              f"warm {statistics.median(ws):.3f} s "
              f"(trials {[round(x, 3) for x in ws]}), blockmax={bm}",
              flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
