"""The docops analytic BM25 path (bm25_topk/and/or/not + paging +
corpus_stats) is rank- and score-identical to the SearchEngine index
path.  The engine entries carry the driver-green DuckDB-oracle rows
(ft_engine_*: the SAME oracle SQL the former ft_bm25_* entries ran);
this parity test pins the docops twins to that green path after the
entry consolidation to 50 driver slots."""

import pytest

from resin_spark import docops


def _pairs(rows):
    return [(r["doc_id"], r["score"]) for r in rows]


def test_docops_engine_parity(engine):
    from pyspark.sql import functions as F

    from resin_spark.tokenizer import tokenize_py

    docs = engine.documents().select("doc_id", "text")
    # a term pair that genuinely co-occurs (AND must rank rows)
    row = docs.filter(F.col("text").contains("banana")).orderBy("doc_id").first()
    t2 = next(t for t in tokenize_py(row["text"]) if t != "banana")
    cases = [
        ("topk", docops.bm25_topk(docs, "banana", k=10),
         {"or": {"text": "banana"}}, 0),
        ("paged", docops.bm25_topk(docs, "banana", k=5, skip=3),
         {"or": {"text": "banana"}}, 3),
        ("and", docops.bm25_and(docs, "banana", t2, k=10),
         {"and": {"text": f"banana {t2}"}}, 0),
        ("or", docops.bm25_or(docs, "banana", "cantalope", k=10),
         {"or": {"text": "banana cantalope"}}, 0),
        ("not", docops.bm25_not(docs, "banana", "apples", k=10),
         {"and": {"text": "banana", "not": {"text": "apples"}}}, 0),
    ]
    for name, got_df, q, skip in cases:
        got = _pairs(got_df.collect())
        k = 5 if name == "paged" else 10
        want = _pairs(engine.search(q, k=k, skip=skip,
                                    select=["doc_id"]).collect())
        assert [d for d, _ in got] == [d for d, _ in want], name
        assert got, name  # every case must actually rank rows
        for (_, a), (_, b) in zip(got, want):
            # docops reports round(score, 6) — the oracle-SQL convention
            assert a == pytest.approx(round(b, 6), abs=1e-9), name


def test_corpus_stats_exact(engine, fixture_rows):
    from resin_spark.tokenizer import tokenize_py

    st = docops.corpus_stats(
        engine.documents().select("doc_id", "text")).collect()[0]
    lens = [len(tokenize_py(r["text"] or "")) for r in fixture_rows]
    assert st["n_docs"] == len(lens)
    assert st["total_tokens"] == sum(lens)
    assert st["avgdl"] == pytest.approx(sum(lens) / len(lens), rel=1e-12)
