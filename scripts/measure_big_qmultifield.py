"""Targeted 6M-tier re-measurement of the over-cap AND shapes after the
term-LRU changes to _collect_key_postings (restricted reads serve cached
full-term arrays; a restricted read that covered the term's entire df is
cached as a full read).  The q_multifield bench shape (role:tool AND
text:search) previously re-read + re-decoded the hot dimension term's
~1.2M postings on EVERY repeat because block-restricted collects never
touched the LRU — warm repeats were as slow as cold (0.963 s vs 1.063 s
in the round-5 record).  Mirrors bench.py's bigscale tier: same corpus
generator, same positional build, medians of 3 cold (clear_cache between
trials) and 3 repeat-warm."""
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
    "q_multifield": {"and": {"role": "tool", "and": {"text": "search"}}},
    "q_and": {"and": {"text": "banana cantalope"}},
}


def main() -> None:
    spark = make_session("local[32]", "bigmf_measure", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="bigmf_")
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
    dfm = eng._term_df_driver_map()
    for key in (("role", "tool"), ("text", "search"), ("text", "banana"),
                ("text", "cantalope")):
        print(f"df{key} = {dfm.get(key) if dfm else '?'}")
    for name, q in QUERIES.items():
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            eng.search(q, k=10).collect()
            ts.append(time.monotonic() - t0)
            eng.clear_cache()
        eng.search(q, k=10).collect()
        st_warmup = dict(eng.last_and_stats)
        ws = []
        for _ in range(3):
            t0 = time.monotonic()
            eng.search(q, k=10).collect()
            ws.append(time.monotonic() - t0)
        st_warm = dict(eng.last_and_stats)
        eng.clear_cache()
        print(f"{name}: cold {statistics.median(ts):.3f} s "
              f"(trials {[round(x, 3) for x in ts]}), "
              f"warm {statistics.median(ws):.3f} s "
              f"(trials {[round(x, 3) for x in ws]})")
        print(f"  and_stats after warmup: {st_warmup}")
        print(f"  and_stats warm: {st_warm}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
