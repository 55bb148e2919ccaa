"""Dataset-assembly operators (resin_spark/datasets.py): sequence
packing invariants, deterministic stratified sampling, n-gram top-k vs a
pure-Python twin, and plan gates (no Python in the row path; packing
shuffles once on the shard key)."""

import pytest
from pyspark.sql import functions as F

from resin_spark import datasets
from resin_spark.tokenizer import tokenize_py, tokens_col


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i,
         " ".join(f"w{(i * 7 + j) % 13}" for j in range((i * 31) % 40)),
         ["en", "de", "fr"][i % 3])
        for i in range(60)
    ] + [(60, "", "en")]  # zero-token doc
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pack_sequences_invariants(spark, docs):
    d = docs.select(
        "doc_id", "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tokens"))
    out = datasets.pack_sequences(d, capacity=64, tokens="n_tokens",
                                  shard="lang").collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["lang"], []).append(r)
    assert set(by_shard) == {"en", "de", "fr"}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            # the tape is gapless and in doc order
            assert r["tape_pos"] == pos
            assert r["start_pack"] == pos // 64
            assert r["start_offset"] == pos % 64
            last = pos + max(r["n_tokens"], 1) - 1
            assert r["end_pack"] == last // 64
            assert r["end_pack"] >= r["start_pack"]
            pos += r["n_tokens"]


def test_pack_sequences_plan(spark, docs):
    d = docs.select(
        "doc_id", "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tokens"))
    plan = (datasets.pack_sequences(d, capacity=64, shard="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan  # all-JVM row path
    # exactly one exchange: the hash partitioning on the shard key
    assert plan.count("Exchange") == 1 and "hashpartitioning(lang" in plan


def test_stratified_sample_deterministic_and_rated(spark, docs):
    rates = {"en": 0.6, "de": 0.2}
    a = {r["doc_id"] for r in datasets.stratified_sample(
        docs, rates, strata="lang", salt="s0", default_rate=0.0).collect()}
    b = {r["doc_id"] for r in datasets.stratified_sample(
        docs.repartition(7), rates, strata="lang", salt="s0",
        default_rate=0.0).collect()}
    assert a == b  # partitioning-independent
    c = {r["doc_id"] for r in datasets.stratified_sample(
        docs, rates, strata="lang", salt="s1", default_rate=0.0).collect()}
    assert a != c  # independent draw per salt
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    assert all(langs[i] in rates for i in a)  # default_rate=0 excludes fr
    # python twin of the keep rule
    import hashlib

    def keep(doc_id, rate):
        h = int(hashlib.md5(f"{doc_id}|s0".encode()).hexdigest()[:8], 16)
        return (h % 1_000_000) < int(rate * 1_000_000)

    want = {i for i, lg in langs.items()
            if lg in rates and keep(i, rates[lg])}
    assert a == want


def test_topk_ngrams_matches_python_twin(spark, docs):
    from collections import Counter

    got = [(r["ngram"], r["cnt"])
           for r in datasets.topk_ngrams(docs, tokens_col("text"),
                                         n=2, k=15).collect()]
    cnt: Counter = Counter()
    for r in docs.collect():
        toks = tokenize_py(r["text"])
        for i in range(len(toks) - 1):
            cnt[toks[i] + " " + toks[i + 1]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == want


def test_event_analytics_ops(spark):
    """Window (lag/lead) + JSON ops: exact microsecond gaps, transition
    bigrams, props sums — values checked against hand computation."""
    import datetime as dt

    from resin_spark import datasets as D

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (event_id, ts, user_id, event_type, props)
        (0, base, 1, "view", '{"k": 3}'),
        (1, base + dt.timedelta(microseconds=1_500_000), 1, "click", '{"k": 5}'),
        (2, base + dt.timedelta(seconds=10), 1, "view", '{}'),
        (3, base, 2, "click", None),
        # same-ts pair for user 2: event_id breaks the tie
        (4, base + dt.timedelta(seconds=1), 2, "view", '{"k": 2}'),
        (5, base + dt.timedelta(seconds=1), 2, "click", '{"k": 4}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, props string")
    gaps = {r["user_id"]: r for r in D.event_gap_stats(df).collect()}
    assert (gaps[1]["n_events"], gaps[1]["span_us"],
            gaps[1]["max_gap_us"]) == (3, 10_000_000, 8_500_000)
    assert (gaps[2]["n_events"], gaps[2]["span_us"],
            gaps[2]["max_gap_us"]) == (3, 1_000_000, 1_000_000)
    trans = {(r["event_type"], r["next_type"]): r["n"]
             for r in D.event_transitions(df).collect()}
    assert trans == {("view", "click"): 2, ("click", "view"): 2}
    props = {r["event_type"]: (r["n"], r["sum_val"])
             for r in D.props_agg(df).collect()}
    assert props == {"view": (3, 5), "click": (3, 9)}


def test_epoch_micros_pre_epoch(spark):
    """_epoch_micros must floor, not truncate toward zero: pre-1970
    timestamps with a positive wall-clock fraction are negative micros
    (1969-12-31 23:59:59.500000 -> -500000), matching epoch_us()."""
    import datetime as dt

    from pyspark.sql import functions as F

    from resin_spark.datasets import _epoch_micros

    epoch = dt.datetime(1970, 1, 1)
    vals = [
        dt.datetime(1969, 12, 31, 23, 59, 59, 500_000),
        dt.datetime(1969, 12, 31, 23, 59, 59),
        dt.datetime(1969, 12, 31, 23, 59, 58, 250_000),
        dt.datetime(1969, 12, 30, 1, 2, 3, 1),
        epoch,
        dt.datetime(1970, 1, 1, 0, 0, 0, 750_000),
        dt.datetime(2024, 6, 1, 12, 0, 0, 123_456),
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, ts timestamp")
    got = {r["i"]: r["us"] for r in
           df.select("i", _epoch_micros(F.col("ts")).alias("us")).collect()}
    want = {i: (v - epoch) // dt.timedelta(microseconds=1)
            for i, v in enumerate(vals)}
    assert got == want
