"""Oracle self-consistency: the pure-Python engine must satisfy the
reference's own test invariants (self-retrieval, boolean semantics)."""

import math

from resin_spark.fixtures import FRUIT_WORDS, gen_transcripts
from resin_spark.reference import (build_oracle_index, oracle_search,
                                   oracle_stats)


def test_self_retrieval_unique_terms(oracle, fixture_rows):
    """Every uterm{k} planted in exactly one turn retrieves that turn at
    rank 1 (mirrors IndexSessionTests.cs:42-56 score>=IdenticalAngle)."""
    planted = {}
    for r in fixture_rows:
        for tok in r["text"].split():
            if tok.startswith("uterm"):
                planted[tok] = (r["conv_id"], r["turn_idx"])
    assert planted, "fixture must plant unique terms"
    for tok, key in planted.items():
        hits = oracle_search(oracle, {"or": {"text": tok}}, k=1)
        assert hits and hits[0][0] == key, tok


def test_fruit_words_retrievable(oracle):
    for w in FRUIT_WORDS:
        hits = oracle_search(oracle, {"or": {"text": w}}, k=5)
        assert hits, w
        assert all(s > 0 for _, s in hits)


def test_and_intersection(oracle):
    a = dict(oracle_search(oracle, {"or": {"text": "banana"}}, k=0))
    b = dict(oracle_search(oracle, {"or": {"text": "cantalope"}}, k=0))
    both = dict(oracle_search(oracle, {"and": {"text": "banana cantalope"}}, k=0))
    assert set(both) == set(a) & set(b)
    for k, s in both.items():
        assert math.isclose(s, a[k] + b[k], rel_tol=0, abs_tol=1e-12)


def test_or_order_sensitive(oracle):
    """OR after the first term only boosts existing keys
    (Reducer.cs:130-137)."""
    a = dict(oracle_search(oracle, {"or": {"text": "apple"}}, k=0))
    ab = dict(oracle_search(oracle, {"or": {"text": "apple banana"}}, k=0))
    assert set(ab) == set(a)  # banana-only docs NOT added
    b = dict(oracle_search(oracle, {"or": {"text": "banana"}}, k=0))
    for k in ab:
        expected = a[k] + (b.get(k, 0.0))
        assert math.isclose(ab[k], expected, abs_tol=1e-12)


def test_not_subtraction(oracle):
    base = dict(oracle_search(oracle, {"and": {"text": "apple"}}, k=0))
    neg = dict(oracle_search(oracle, {"or": {"text": "apples"}}, k=0))
    assert set(base) & set(neg), "fixture must plant apple+apples overlap"
    got = dict(
        oracle_search(
            oracle, {"and": {"text": "apple", "not": {"text": "apples"}}}, k=0
        )
    )
    assert set(got) == set(base) - set(neg)
    assert set(got) < set(base)  # something actually subtracted


def test_not_clause_multi_term_union(oracle):
    """Terms of a 'not' clause union into one subtraction set."""
    base = dict(oracle_search(oracle, {"and": {"text": "the"}}, k=0))
    n1 = dict(oracle_search(oracle, {"or": {"text": "apple"}}, k=0))
    n2 = dict(oracle_search(oracle, {"or": {"text": "banana"}}, k=0))
    got = dict(
        oracle_search(
            oracle, {"and": {"text": "the", "not": {"text": "apple banana"}}}, k=0
        )
    )
    assert set(got) == set(base) - (set(n1) | set(n2))


def test_unmatched_term_skipped(oracle):
    """An AND term with no postings must not clear the result
    (Reducer.cs:88-89)."""
    base = oracle_search(oracle, {"and": {"text": "apple"}}, k=0)
    got = oracle_search(oracle, {"and": {"text": "apple zzzzmissing"}}, k=0)
    assert got == base


def test_multi_field(oracle):
    got = oracle_search(
        oracle, {"and": {"role": "tool", "and": {"text": "search"}}}, k=0
    )
    for (conv_id, turn_idx), _ in got:
        row = oracle.docs[(conv_id, turn_idx)]
        assert row["role"] == "tool"
        assert "search" in row["text"].split()


def test_pagination(oracle):
    all_hits = oracle_search(oracle, {"and": {"text": "banana"}}, k=0)
    page = oracle_search(oracle, {"and": {"text": "banana"}}, k=5, skip=5)
    assert page == all_hits[5:10]


def test_stats(oracle, fixture_rows):
    from resin_spark.tokenizer import tokenize_py

    st = oracle_stats(oracle, "text")
    assert st["n_docs"] == len(fixture_rows)
    assert st["total_tokens"] == sum(
        len(tokenize_py(r["text"])) for r in fixture_rows
    )


def test_endash_tokenized(oracle):
    hits = oracle_search(oracle, {"or": {"text": "ferriman gallwey score"}}, k=3)
    assert hits
    top = oracle.docs[hits[0][0]]
    assert "Ferriman–Gallwey" in top["text"]


def test_deterministic_generation():
    a = gen_transcripts(n_convs=10, max_turns=4)
    b = gen_transcripts(n_convs=10, max_turns=4)
    assert a == b
