"""Resin-native char-bag cosine ranking (score_model='resin'):
fuzzy typo retrieval, anagram collision, and rank/score parity with the
pure-python twin (PathFinder.ClosestMatch + Reducer + 1/#terms
normalization semantics)."""

import math

import pytest

from resin_spark import resin_score as R


def _ids(engine, rows):
    docs = {r["doc_id"]: (r["conv_id"], r["turn_idx"])
            for r in engine.documents()
            .select("doc_id", "conv_id", "turn_idx").collect()}
    return [(docs[r["doc_id"]], r["score"]) for r in rows]


@pytest.mark.parametrize("text,mode", [
    ("banana", "or"),
    ("applw", "or"),            # typo -> closest char bag is 'apple'
    ("silent", "or"),           # anagram of 'listen'/'enlist'
    ("banana cantalope", "and"),
    ("apple banana", "or"),
])
def test_resin_rank_matches_twin(spark, engine, oracle, text, mode):
    got = _ids(engine, R.resin_topk(engine, text, k=10, mode=mode).collect())
    want = R.resin_topk_py(oracle, text, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want], (text, mode)
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-9)


def test_typo_still_retrieves(spark, engine):
    """Resin's fuzzy matching: a typo'd token retrieves the postings of
    its closest char-bag neighbour with score < identical."""
    exact = R.resin_topk(engine, "apple", k=5).collect()
    typo = R.resin_topk(engine, "applw", k=5).collect()
    assert typo, "typo query must still match"
    assert {r["doc_id"] for r in typo} == {r["doc_id"] for r in exact}
    assert typo[0]["score"] < exact[0]["score"]
    assert exact[0]["score"] == pytest.approx(1.0)  # identical bag


def test_anagrams_collide(spark, engine):
    """listen/silent/enlist share one char bag: identical result sets
    with cosine 1 (IdenticalAngle semantics)."""
    a = R.resin_topk(engine, "listen", k=20).collect()
    b = R.resin_topk(engine, "silent", k=20).collect()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
    assert a and a[0]["score"] == pytest.approx(1.0)
