"""Structured Streaming incremental index: file-source micro-batches
become appended segments; results equal a one-shot batch build."""

import pytest
from pyspark.sql import functions as F

from resin_spark import build as B
from resin_spark.executor import SearchEngine
from resin_spark.fixtures import transcripts_df
from resin_spark.streaming import stream_index


def test_stream_index_equals_batch(spark, tmp_path):
    t = transcripts_df(spark, n_convs=20, max_turns=4)

    # drop two waves of files into the watched dir
    src = str(tmp_path / "incoming")
    w1 = t.filter(F.col("conv_id") < "conv00000010")
    w2 = t.filter(F.col("conv_id") >= "conv00000010")
    w1.write.mode("append").parquet(src)

    root = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    q = stream_index(spark, src, root, ckpt)
    q.awaitTermination(120)

    w2.write.mode("append").parquet(src)
    q2 = stream_index(spark, src, root, ckpt)
    q2.awaitTermination(120)

    # all turns indexed exactly once across streamed segments
    eng = SearchEngine(spark, root)
    assert eng.documents().count() == t.count()
    segs = [r["segment"] for r in
            B.read_postings(spark, root).select("segment").distinct().collect()]
    assert len(segs) >= 2  # two micro-batches -> two segments

    # batch twin on the same data
    batch_root = str(tmp_path / "batch_idx")
    B.build_index(spark, t, batch_root)
    beng = SearchEngine(spark, batch_root)

    for query in ({"or": {"text": "banana"}},
                  {"and": {"text": "apple", "not": {"text": "apples"}}}):
        got = eng.topk(query, k=5)
        want = beng.topk(query, k=5)
        assert [k for k, _ in got] == [k for k, _ in want]
        assert got == pytest.approx(want)


def test_stream_keeps_doclens_artifact(spark, tmp_path):
    """A root built with write_doclens=True keeps getting per-segment
    doclens from streamed micro-batches (auto-detected), so a later
    compact merges a doclens table covering ALL docs."""
    from resin_spark.streaming import index_microbatch

    t = transcripts_df(spark, n_convs=8, max_turns=3)
    w1 = t.filter(F.col("conv_id") < "conv00000004")
    w2 = t.filter(F.col("conv_id") >= "conv00000004")
    root = str(tmp_path / "idx_dl")
    B.build_index(spark, w1, root, fields=("text",), write_doclens=True)
    index_microbatch(root, fields=("text",))(w2, 0)
    dl = B.read_doclens(spark, root)
    assert dl.count() == t.count()
    segs = {r["segment"] for r in dl.select("segment").distinct().collect()}
    assert len(segs) == 2
    # a root WITHOUT the artifact stays without it
    root2 = str(tmp_path / "idx_nodl")
    B.build_index(spark, w1, root2, fields=("text",))
    index_microbatch(root2, fields=("text",))(w2, 0)
    assert not B._exists(spark, B.p_doclens(root2))


def test_stream_replay_is_idempotent(spark, tmp_path):
    """Replaying the same batch id overwrites its own segment dir (no
    duplicate postings)."""
    from resin_spark.streaming import index_microbatch

    t = transcripts_df(spark, n_convs=6, max_turns=3)
    root = str(tmp_path / "idx")
    fn = index_microbatch(root, fields=("text",))
    fn(t, 0)
    n1 = B.read_docs(spark, root).count()
    fn(t, 0)  # replay same epoch
    assert B.read_docs(spark, root).count() == n1


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """windowed_event_counts on an actual stream (file source, append
    mode, availableNow): finalized windows match the batch computation,
    and the plan carries the EventTimeWatermark."""
    import datetime as dt

    from resin_spark.streaming import sessionize, windowed_event_counts

    rows = [
        (i, dt.datetime(2024, 1, 1, 10 + (i % 3), (i * 7) % 60, 0), "click")
        for i in range(30)
    ]
    src = str(tmp_path / "ev_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, event_type string"
    ).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="5 minutes")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan, plan
    sink = str(tmp_path / "ev_out")
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ev_ckpt"))
         .trigger(availableNow=True)
         .format("parquet").start(sink))
    assert q.awaitTermination(300), "availableNow run did not finish in time"
    # append mode emits only FINALIZED windows: all but the last open one
    batch = windowed_event_counts(
        spark.read.parquet(src), window="1 hour"
    ).collect()
    got = {(r["win_start"], r["event_type"]): r["n"]
           for r in spark.read.parquet(sink).collect()}
    want = {(r["win_start"], r["event_type"]): r["n"] for r in batch}
    assert set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) - 1  # at most the open window withheld

    # session op, batch form, python cross-check on a tiny case
    sess = sessionize(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0, 0)),
             (1, dt.datetime(2024, 1, 1, 10, 10, 0)),
             (1, dt.datetime(2024, 1, 1, 11, 0, 0)),   # 50-min gap -> new
             (2, dt.datetime(2024, 1, 1, 9, 0, 0))],
            "user_id long, ts timestamp_ntz",
        ),
        gap="30 minutes",
    ).collect()
    got_s = sorted((r["user_id"], r["sess_start"], r["n_events"]) for r in sess)
    t0 = int(dt.datetime(2024, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc).timestamp())
    assert got_s == [
        (1, t0, 2), (1, t0 + 3600, 1), (2, t0 - 3600, 1),
    ]


def test_first_seen_dedup_batch_equals_groupby(spark):
    """Batch mode of the applyInPandasWithState operator == the SQL-
    expressible GROUP BY twin (the oracle form)."""
    from resin_spark.streaming import first_seen_dedup
    from resin_spark.textops import fingerprint_col

    rows = [(i, ["alpha beta", "gamma delta", "alpha  BETA?"][i % 3])
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["fp"], r["keep_id"], r["batch_dups"])
        for r in first_seen_dedup(df).collect()
    )
    want = sorted(
        (r["fp"], r["keep_id"], r["batch_dups"])
        for r in (
            df.select("doc_id", fingerprint_col("text").alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("keep_id"),
                 (F.count(F.lit(1)) - 1).alias("batch_dups"))
        ).collect()
    )
    assert got == want
    # fingerprint normalizes whitespace/case/punct: 2 groups, not 3
    assert len(got) == 2


def test_first_seen_dedup_stream_suppresses_later_batches(spark, tmp_path):
    """Across micro-batches (one file each), a fingerprint emits exactly
    once — in its first batch, with that batch's min id and dup count;
    later occurrences only bump state."""
    from resin_spark.streaming import first_seen_dedup

    schema = "doc_id long, text string"
    src = str(tmp_path / "docs_src")
    w1 = spark.createDataFrame(
        [(3, "apple pie"), (1, "apple pie"), (5, "banana bread")], schema)
    w2 = spark.createDataFrame(
        [(0, "apple pie"), (7, "cherry cake"), (9, "cherry cake")], schema)
    w1.coalesce(1).write.mode("append").parquet(src)

    sink, ckpt = str(tmp_path / "novel"), str(tmp_path / "novel_ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            first_seen_dedup(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .start(sink)
        )
        assert q.awaitTermination(300)

    run()
    w2.coalesce(1).write.mode("append").parquet(src)
    run()

    got = {r["fp"]: (r["keep_id"], r["batch_dups"])
           for r in spark.read.parquet(sink).collect()}
    assert len(got) == 3  # one row per distinct fingerprint, ever
    vals = sorted(got.values())
    # apple pie: first batch had ids {3,1} -> keep 1, one dup; doc 0 from
    # batch 2 is suppressed.  banana: keep 5, no dup.  cherry: keep 7, 1 dup.
    assert vals == [(1, 1), (5, 0), (7, 1)]


def test_stream_exact_dedup_forms(spark, tmp_path):
    """Declarative streaming dedup: batch form is the deterministic
    exact_dedup twin; the watermarked streaming form carries both the
    watermark and the within-watermark dedup in the analyzed plan."""
    import datetime as dt

    from resin_spark.dedup import exact_dedup
    from resin_spark.streaming import stream_exact_dedup

    rows = [
        (i, ["apple pie", "banana bread"][i % 2],
         dt.datetime(2024, 1, 1, 10, i, 0))
        for i in range(8)
    ]
    schema = "doc_id long, text string, ts timestamp_ntz"
    df = spark.createDataFrame(rows, schema)
    got = sorted(r["doc_id"] for r in stream_exact_dedup(df).collect())
    want = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert got == want == [0, 1]

    src = str(tmp_path / "dd_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_exact_dedup(stream, within_watermark="10 minutes")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan, plan
    assert "DeduplicateWithinWatermark" in plan, plan
    sink, ckpt = str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .format("parquet").start(sink))
    assert q.awaitTermination(300)
    kept = spark.read.parquet(sink).collect()
    assert len(kept) == 2
    assert sorted({r["text"] for r in kept}) == ["apple pie", "banana bread"]
