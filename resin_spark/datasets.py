"""Training-dataset assembly operators: sequence packing, stratified
sampling, n-gram vocabulary.  The ops an LLM data pipeline runs AFTER
cleaning/dedup (textops/dedup/similarity) to turn a document table into
training shards.

All three are pure Catalyst (no Python in the row path) and have exact
DuckDB oracles:

* ``pack_sequences`` — GPT-style "concatenate then chunk" packing: per
  shard, documents are laid out on a token tape in a deterministic order
  and cut into packs of ``capacity`` tokens; each document learns which
  pack it starts in, at what offset, and where it ends.  One shuffle
  (hash on the shard column) + a per-shard window sort (spillable); shards
  are independent, so 100 TB parallelism = #shards — pick the shard key
  (language, source, hash-range) so one shard's docs fit an executor's
  spill budget.  No global window anywhere.
* ``stratified_sample`` — deterministic per-stratum Bernoulli sampling by
  md5 lane (same hash in Spark/DuckDB/Python, see resin_spark.dedup):
  a narrow map-only filter, no shuffle, reproducible across runs and
  engines, stable under repartitioning (the keep decision depends only on
  the row's key, never on partitioning or order).
* ``topk_ngrams`` — token n-gram vocabulary: JVM tokenize -> slice-join
  n-grams -> partial-aggregated count -> TakeOrderedAndProject.  The
  groupBy map-side-combines, so the shuffle carries one row per distinct
  n-gram per task, and the total order (count desc, ngram asc) makes the
  top-k boundary deterministic.

Role analog in the reference: dataset assembly around the index is done
by its crawler/command pipeline (e.g. the Wikipedia/CommonCrawl jobs,
/root/reference/src/Sir.Wikipedia/IndexWikipediaCommand.cs:23-48), which
truncates and batches documents before indexing; these operators are the
scale-out, declarative form of that stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from resin_spark.dedup import _md5_lane_col


def pack_sequences(
    df: DataFrame,
    capacity: int,
    tokens: str | Column = "n_tokens",
    shard: str = "shard",
    order_by: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Concat-then-chunk sequence packing.

    Within each ``shard``, rows ordered by ``order_by`` form a token tape;
    packs are consecutive ``capacity``-token windows of that tape.  Output
    adds ``start_pack`` / ``start_offset`` / ``end_pack``: the pack the
    doc's first token lands in, its offset there, and the pack of its last
    token (a doc spanning a boundary is split across packs — the standard
    LLM pretraining layout).  Zero-token docs sit at the boundary of their
    predecessor (``end_pack == start_pack``).

    Integer-exact: positions are int64 window sums; pack ids come from
    integer division, so results are bit-identical in any engine."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    w = (
        Window.partitionBy(shard)
        .orderBy(*[F.asc(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(t).over(w) - t).alias("tape_pos")
    cap = int(capacity)
    out = df.withColumn("tape_pos", before).withColumn(
        "_last", F.col("tape_pos") + F.greatest(t, F.lit(1)) - F.lit(1)
    )
    return out.select(
        "*",
        F.expr(f"tape_pos div {cap}").alias("start_pack"),
        F.pmod(F.col("tape_pos"), F.lit(cap)).cast("long").alias("start_offset"),
        F.expr(f"_last div {cap}").alias("end_pack"),
    ).drop("_last")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata: str = "lang",
    key: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``md5_lane(key|salt) % 1e6 < rate(stratum) * 1e6``.

    The hash is the cross-engine md5 32-bit lane (resin_spark.dedup), so
    the same (key, salt) keeps the same rows in Spark, DuckDB and Python
    — reruns, retries and repartitions never change the sample.  Change
    ``salt`` to draw an independent sample.  Narrow (no shuffle)."""
    h = F.pmod(
        _md5_lane_col(
            F.concat_ws("|", F.col(key).cast("string"), F.lit(salt)), 1
        ),
        F.lit(1_000_000),
    )
    rate = F.lit(int(default_rate * 1_000_000))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata) == s, F.lit(int(r * 1_000_000))).otherwise(rate)
    return df.filter(h < rate)


def topk_ngrams(
    df: DataFrame,
    toks: Column,
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k token n-grams by count over the corpus; ``toks`` is an
    array<string> column (e.g. ``tokenizer.tokens_col("text")``).
    Returns (ngram, cnt) with the deterministic total order
    (cnt desc, ngram asc).  Partial aggregation makes the shuffle
    O(distinct n-grams); the top-k is a TakeOrderedAndProject."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


# ----------------------------------------------------- event analytics
# Sequence analytics over event/transcript logs (the exploratory queries
# a transcripts user runs next to search): per-key gap statistics,
# event-type transition counts, JSON-props aggregation.  Each is one
# hash-partitioned window or aggregation — no global window, no Python.


def _epoch_micros(c) -> Column:
    """NTZ-safe exact epoch microseconds: whole seconds via wall-clock
    interval from the epoch (tz-independent, as streaming._epoch_seconds)
    plus the microsecond fraction — matches DuckDB epoch_us() exactly.

    Pre-epoch safe: the interval→long cast truncates toward zero while
    the SSSSSS fraction is always the positive wall-clock field, so for
    negative timestamps with a fraction the whole-second part must be
    floored (one less) — 1969-12-31 23:59:59.500000 → -1 s + 500000 µs
    = -500000, matching epoch_us()."""
    ntz = c.cast("timestamp_ntz")
    epoch = F.expr("timestamp_ntz'1970-01-01 00:00:00'")
    secs = (ntz - epoch).cast("long")
    frac = F.date_format(ntz, "SSSSSS").cast("long")
    secs = F.when((ntz < epoch) & (frac > 0), secs - 1).otherwise(secs)
    return secs * F.lit(1_000_000) + frac


def event_gap_stats(df: DataFrame, key: str = "user_id", ts: str = "ts",
                    tie: str = "event_id") -> DataFrame:
    """Per-key event timing: (key, n_events, span_us, max_gap_us) where
    gaps are consecutive-event deltas under the deterministic order
    (ts, tie).  One shuffle (hash on key); the window sort is per-key and
    spillable — at 10^12 events parallelism = #keys, never a global
    sort.  Microsecond integers end-to-end, so values are engine-exact."""
    us = _epoch_micros(F.col(ts))
    w = Window.partitionBy(key).orderBy(ts, tie)
    gap = us - F.lag(us).over(w)
    return (
        df.select(F.col(key), us.alias("_us"), gap.alias("_gap"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.max("_us") - F.min("_us")).cast("long").alias("span_us"),
            F.max("_gap").cast("long").alias("max_gap_us"),
        )
    )


def event_transitions(df: DataFrame, key: str = "user_id", ts: str = "ts",
                      etype: str = "event_type",
                      tie: str = "event_id") -> DataFrame:
    """Event-type bigram counts: how often ``a`` is immediately followed
    by ``b`` within one key's ordered stream.  lead() under the same
    deterministic per-key order, then a map-side-combined count —
    (event_type, next_type, n)."""
    w = Window.partitionBy(key).orderBy(ts, tie)
    nxt = F.lead(etype).over(w)
    return (
        df.select(F.col(etype).alias("event_type"), nxt.alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def props_agg(df: DataFrame, path: str = "$.k", etype: str = "event_type",
              props: str = "props") -> DataFrame:
    """JSON-props aggregation: extract an integer field from the JSON
    ``props`` column (JVM get_json_object — codegen, no Python) and sum
    it per event type.  (event_type, n, sum_val); rows whose props lack
    the path are counted with sum contribution 0."""
    v = F.coalesce(
        F.get_json_object(F.col(props), path).cast("long"), F.lit(0))
    return (
        df.groupBy(F.col(etype).alias("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum(v).cast("long").alias("sum_val"))
    )
