"""Embedded IO (SearchEngine io_mode='auto'): when the index root is
driver-local, driver-scored queries read posting blocks / the term-df
mirror / the top-k point fetch through pyarrow — zero Spark jobs on the
warm path (the reference's embedded read session, SearchSession.cs:34-46,
as a size-gated physical strategy).  Results must be identical to the
Spark-IO path in every column, including timestamps."""

import uuid

import pytest

from resin_spark.executor import SearchEngine

QUERIES = [
    {"or": {"text": "banana"}},
    {"and": {"text": "term97 hotterm"}},
    {"and": {"text": "apple", "not": {"text": "apples"}}},
    {"and": {"text": "hotterm"}},
    {"or": {"text": "apple banana"}},
]


@pytest.fixture(scope="module")
def spark_engine(spark, index_root):
    return SearchEngine(spark, index_root, io_mode="spark")


def test_embedded_engages_on_local_root(engine):
    assert engine.io_mode == "auto"
    assert engine._pa_dataset("postings") is not None
    assert engine._pa_dataset("docs") is not None


def test_local_path_gating():
    assert SearchEngine._local_path("s3://bucket/idx") is None
    assert SearchEngine._local_path("hdfs://nn/idx") is None
    assert SearchEngine._local_path("/definitely/not/a/dir/xyz") is None
    assert SearchEngine._local_path("/tmp") == "/tmp"
    assert SearchEngine._local_path("file:/tmp") == "/tmp"
    assert SearchEngine._local_path("file:///tmp") == "/tmp"


def test_embedded_full_column_parity(engine, spark_engine):
    """Every column — role/text/tool and the timestamp — must round-trip
    identically through the pyarrow point fetch and the Spark join."""
    for q in QUERIES:
        got = [tuple(r) for r in engine.search(q, k=8).collect()]
        want = [tuple(r) for r in spark_engine.search(q, k=8).collect()]
        assert got == want and got, q
        engine.clear_cache()
        spark_engine.clear_cache()


def test_embedded_warm_query_is_job_free(engine):
    """A warm driver-scored query under embedded IO launches NO Spark
    jobs: postings + docs read via pyarrow, the result is a pre-sorted
    k-row LocalRelation whose collect is driver-side."""
    engine.stats()
    engine._term_df_driver_map()
    engine.search(QUERIES[0], k=5).collect()  # warm every session cache
    engine.clear_cache()
    sc = engine.spark.sparkContext
    for q in QUERIES:
        g = uuid.uuid4().hex
        sc.setJobGroup(g, "probe")
        rows = engine.search(q, k=5).collect()
        engine.clear_cache()
        sc.setJobGroup(None, None)
        assert rows, q
        assert len(sc.statusTracker().getJobIdsForGroup(g)) == 0, q


def test_embedded_respects_snapshot_pin(spark, tmp_path):
    """A snapshot-pinned engine must read the OLD tree through pyarrow
    too (the dataset resolves at the pinned pointer version)."""
    from resin_spark import build
    from resin_spark.fixtures import transcripts_df

    root = str(tmp_path / "snap_idx")
    build.build_index(spark, transcripts_df(spark, 12, 4), root)
    eng0 = SearchEngine(spark, root)
    before = eng0.topk({"or": {"text": "banana"}}, k=5)
    build.compact(spark, root)
    snaps = build.list_snapshots(root)
    old = min(snaps)
    pinned = SearchEngine(spark, root, snapshot=old)
    assert pinned._pa_dataset("postings") is not None
    assert pinned.topk({"or": {"text": "banana"}}, k=5) == before
    # and the newest pointer agrees post-compaction as well
    assert SearchEngine(spark, root).topk(
        {"or": {"text": "banana"}}, k=5) == before


def test_spark_io_mode_forces_spark_reads(engine):
    e = SearchEngine(engine.spark, engine.root, io_mode="spark")
    assert e._pa_dataset("postings") is None
    assert e._pa_dataset("docs") is None


def test_term_lru_repeat_query_skips_postings_read(engine, monkeypatch):
    """A repeat query over warm terms must answer from the decoded-
    postings LRU: identical results with NO postings read at all; a
    public clear_cache() drops the LRU (benchmark honesty)."""
    q = {"or": {"text": "banana"}}
    engine.clear_cache()
    want = engine.topk(q, k=5)
    assert engine._term_lru  # warm after the first query

    def boom(*a, **k):
        raise AssertionError("postings store touched on a warm repeat")

    monkeypatch.setattr(engine, "postings", boom)
    monkeypatch.setattr(engine, "_pa_postings_rows", boom)
    assert engine.topk(q, k=5) == want
    monkeypatch.undo()
    # a public clear_cache must drop the LRU; the next query re-reads
    engine.clear_cache()
    assert not engine._term_lru
    got = engine.topk(q, k=5)
    assert got == want


def test_term_lru_eviction_bound(engine):
    import numpy as np

    engine.clear_cache()
    one = np.ones(1, dtype=np.int64)
    cap = engine._TERM_LRU_MAX_POSTINGS
    big = np.ones(cap // 2 + 1, dtype=np.int64)
    engine._lru_put(("text", "a"), (big, big, big))
    engine._lru_put(("text", "b"), (big, big, big))  # evicts 'a'
    assert ("text", "a") not in engine._term_lru
    engine._lru_put(("text", "c"), (one, one, one))
    assert engine._term_lru_postings <= cap
    over = np.ones(cap + 1, dtype=np.int64)
    engine._lru_put(("text", "d"), (over, over, over))  # too big: ignored
    assert ("text", "d") not in engine._term_lru
    engine.clear_cache()
    assert engine._term_lru_postings == 0 and not engine._term_lru
