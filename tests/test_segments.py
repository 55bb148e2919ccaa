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
    compact(spark, seg_root)
    after = SearchEngine(spark, seg_root)
    # exactly one segment remains
    segs = {r["segment"] for r in after.postings().select("segment").distinct().collect()}
    assert segs == {0}
    for q, rb in zip(QUERIES, results_before):
        _assert_same(rb, _results(after, q))
    for q in QUERIES:
        _assert_same(_results(engine, q), _results(after, q))
