"""q20: cross-segment merge parity — identical query results on a
1-segment index, an 8-segment index, and after compaction (mirrors
Can_search_filestreamed_with_multiple_pages,
/root/reference/src/Sir.Store.Tests/IndexSessionTests.cs:60-116)."""

import math

import pytest

from resin_spark.api import compact
from resin_spark.executor import SearchEngine
from resin_spark.build import build_index

QUERIES = [
    {"and": {"text": "banana cantalope"}},
    {"or": {"text": "apple banana"}},
    {"and": {"text": "hotterm"}},
    {"and": {"role": "tool", "and": {"text": "search"}}},
]


@pytest.fixture(scope="module")
def seg_root(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_seg") / "collection")
    build_index(spark, transcripts, root, n_segments=8)
    return root


def _results(engine, q):
    return engine.topk(q, k=10)


def _assert_same(a, b):
    assert [h[0] for h in a] == [h[0] for h in b]
    for (_, s1), (_, s2) in zip(a, b):
        assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-9)


def test_segment_invariance(spark, engine, seg_root):
    seg_engine = SearchEngine(spark, seg_root)
    for q in QUERIES:
        _assert_same(_results(engine, q), _results(seg_engine, q))


def test_compaction_invariance(spark, engine, seg_root):
    before = SearchEngine(spark, seg_root)
    results_before = [_results(before, q) for q in QUERIES]
    # pin pre-compact DataFrames: this emulates a query IN FLIGHT while
    # compaction commits — the version-pointer commit must leave the old
    # snapshot's dirs in place (GC happens one compaction later)
    inflight_postings = before.postings()
    inflight_n = inflight_postings.count()
    compact(spark, seg_root)
    # the in-flight reader still resolves its (old) snapshot completely
    assert inflight_postings.count() == inflight_n
    after = SearchEngine(spark, seg_root)
    # exactly one segment remains
    segs = {r["segment"] for r in after.postings().select("segment").distinct().collect()}
    assert segs == {0}
    for q, rb in zip(QUERIES, results_before):
        _assert_same(rb, _results(after, q))
    for q in QUERIES:
        _assert_same(_results(engine, q), _results(after, q))


def test_compaction_pointer_commit_and_gc(spark, engine, seg_root):
    """Version-pointer commit: _ptr files advance, exactly the current +
    previous versions' dirs exist after each compact, and results stay
    identical across two compactions."""
    import glob
    import os

    from resin_spark import build as B

    # seg_root was compacted by the previous test (v1); compact again
    compact(spark, seg_root)
    ver, dirs = B._current_pointer(seg_root)
    assert ver == 2 and dirs["postings"] == "postings__v2"
    # v1 retained for in-flight readers; v0 (plain dirs) GC'd
    assert os.path.isdir(f"{seg_root}/postings__v1")
    assert not os.path.isdir(f"{seg_root}/postings")
    assert len(glob.glob(f"{seg_root}/_ptr_*.json")) == 2  # v1 + v2
    eng = SearchEngine(spark, seg_root)
    for q in QUERIES:
        _assert_same(_results(engine, q), _results(eng, q))


def test_truncate_index_keeps_docs_after_compaction(spark, transcripts,
                                                    tmp_path):
    from resin_spark.api import truncate_index

    root = str(tmp_path / "idx_trunc")
    build_index(spark, transcripts, root, n_segments=2)
    compact(spark, root)
    n_docs = SearchEngine(spark, root).documents().count()
    truncate_index(spark, root)
    from resin_spark import build as B

    assert not B._exists(spark, f"{root}/postings")
    assert not B._exists(spark, f"{root}/postings__v1")
    docs = B.read_docs(spark, root)
    assert docs.count() == n_docs


def test_snapshot_time_travel(spark, transcripts, tmp_path):
    """Time-travel reads over the pointer commit: an engine pinned to the
    PREVIOUS snapshot answers from the pre-compact tree; list_snapshots
    tracks the GC window; a GC'd snapshot raises with the available set."""
    import pytest as _pytest

    from resin_spark import build as B

    root = str(tmp_path / "idx_tt")
    build_index(spark, transcripts, root, n_segments=4)
    assert B.list_snapshots(root) == [0]

    cur = SearchEngine(spark, root)
    want = [_results(cur, q) for q in QUERIES]

    compact(spark, root)  # v0 -> v1; v0 dirs retained
    assert B.list_snapshots(root) == [0, 1]
    pinned = SearchEngine(spark, root, snapshot=0)
    # pinned engine reads the ORIGINAL 4-segment tree
    segs = {r["segment"]
            for r in pinned.postings().select("segment").distinct().collect()}
    assert len(segs) == 4
    for q, w in zip(QUERIES, want):
        _assert_same(w, _results(pinned, q))

    compact(spark, root)  # v1 -> v2; v0 GC'd, v1 retained
    assert B.list_snapshots(root) == [1, 2]
    prev = SearchEngine(spark, root, snapshot=1)
    for q, w in zip(QUERIES, want):
        _assert_same(w, _results(prev, q))
    with _pytest.raises(FileNotFoundError, match="available"):
        B.read_postings(spark, root, snapshot=0).count()
