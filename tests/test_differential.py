"""Differential rank-identity fuzzing: the Spark engine vs the pure-Python
oracle on a seeded family of random boolean query trees over the fixture
vocabulary (including tokens that don't exist, multi-field clauses, and
nested and/or/not chains).  One Spark round trip per query, so the family
is kept to ~24 queries; the seed makes failures reproducible."""

import math
import random

import pytest

from resin_spark.fixtures import FRUIT_WORDS
from resin_spark.reference import oracle_search

VOCAB = (FRUIT_WORDS
         + ["the", "run", "tool", "search", "vector", "index", "query",
            "hotterm", "listen", "silent",
            "term1", "term7", "term42", "term99",
            "zzznope", "qqnada"])  # last two never occur
FIELDS = ["text", "text", "text", "role", "tool"]  # text-weighted


def _rand_clause(rng: random.Random, depth: int) -> dict:
    n_terms = rng.randint(1, 3)
    clause = {}
    for _ in range(n_terms):
        f = rng.choice(FIELDS)
        toks = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 2)))
        clause[f] = toks if f not in clause else clause[f] + " " + toks
    if depth > 0 and rng.random() < 0.6:
        op = rng.choice(["and", "or", "not"])
        clause[op] = _rand_clause(rng, depth - 1)
    return clause


def _queries(seed: int = 20260816, n: int = 24):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        op = rng.choice(["and", "or", "and", "or", "not"])
        out.append((f"fz{i:02d}", {op: _rand_clause(rng, rng.randint(0, 2))}))
    return out


@pytest.mark.parametrize("qid,query", _queries(), ids=[q[0] for q in _queries()])
def test_differential_rank_identity(engine_s, oracle, qid, query):
    got = engine_s.topk(query, k=10)
    want = oracle_search(oracle, query, k=10)
    assert [h[0] for h in got] == [h[0] for h in want], (qid, query)
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-9), (qid, query)
