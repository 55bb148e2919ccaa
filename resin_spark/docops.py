"""Declarative engine slices over a generic documents(doc_id, text) table.

These are the SQL-expressible projections of the engine used by the
driver contract (__spark_entry__.py): tokenize / df / tf / stats / BM25
top-k / boolean merges, written as single DataFrame pipelines (no
driver-side collects) whose float expression trees mirror the oracle SQL
exactly (same op order, round(...,6) on scores) so DuckDB value-hashes
match bit-for-bit.

The full engine (resin_spark.build/executor) stores postings and collects
tiny stats driver-side; these functions recompute everything declaratively
— same operators (SURVEY.md §2.4/§2.7), different materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark.tokenizer import chars_key_col, tokens_col

K1 = 1.2
B = 0.75


def doc_tokens(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, term) one row per token occurrence."""
    return docs.select("doc_id", F.explode(tokens_col(text)).alias("term"))


def doc_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf)."""
    return doc_tokens(docs).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, dl) — token count per doc (docs with 0 tokens keep dl=0)."""
    return docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("dl")
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """One row: n_docs, total_tokens, avgdl (exact-int division)."""
    return doc_lengths(docs).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        (F.sum("dl").cast("long") / F.count(F.lit(1)).cast("long")).alias("avgdl"),
    )


def term_df(docs: DataFrame) -> DataFrame:
    """(term, df) document frequency."""
    return doc_tf(docs).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )


def bm25_term_scores(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(term, doc_id, score) for the given query terms; score is the
    unrounded BM25 weight.  Expression tree mirrors the oracle SQL:
    ln(1 + (N - df + 0.5)/(df + 0.5)) * (tf/(tf + k1*((1-b) + b*dl/avgdl)))
    """
    tf = doc_tf(docs).filter(F.col("term").isin(terms))
    dl = doc_lengths(docs)
    st = corpus_stats(docs)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = tf.join(dl, "doc_id").join(F.broadcast(dfreq), "term").crossJoin(
        F.broadcast(st)
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    wt = F.col("tf") / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
    )
    return j.select("term", "doc_id", (idf * wt).alias("score"))


def bm25_topk(docs: DataFrame, term: str, k: int = 10, skip: int = 0) -> DataFrame:
    """Single-term BM25 top-k: (doc_id, score[rounded 6])."""
    s = bm25_term_scores(docs, [term]).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    out = s.orderBy(F.desc("score"), F.asc("doc_id"))
    if skip:
        out = out.offset(skip)
    return out.limit(k)


def bm25_and(docs: DataFrame, t1: str, t2: str, k: int = 10) -> DataFrame:
    """AND: intersect + score sum (Reducer.cs intersection semantics)."""
    s = bm25_term_scores(docs, [t1, t2])
    a = s.filter(F.col("term") == t1).select("doc_id", F.col("score").alias("s1"))
    b = s.filter(F.col("term") == t2).select("doc_id", F.col("score").alias("s2"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", F.round(F.col("s1") + F.col("s2"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_or(docs: DataFrame, t1: str, t2: str, k: int = 10) -> DataFrame:
    """Order-sensitive OR: docs of t1, boosted where t2 also matches."""
    s = bm25_term_scores(docs, [t1, t2])
    a = s.filter(F.col("term") == t1).select("doc_id", F.col("score").alias("s1"))
    b = s.filter(F.col("term") == t2).select("doc_id", F.col("score").alias("s2"))
    return (
        a.join(b, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.col("s1") + F.coalesce(F.col("s2"), F.lit(0.0)), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_not(docs: DataFrame, t1: str, t2: str, k: int = 10) -> DataFrame:
    """NOT: subtract t2's docs from t1's result."""
    s = bm25_term_scores(docs, [t1, t2])
    a = s.filter(F.col("term") == t1).select("doc_id", F.col("score").alias("s1"))
    b = s.filter(F.col("term") == t2).select("doc_id")
    return (
        a.join(b, "doc_id", "left_anti")
        .select("doc_id", F.round("s1", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_charbag(docs: DataFrame, token: str, k: int = 10) -> DataFrame:
    """Single-term BM25 under Resin's char-bag term identity: the query
    token matches every term with the same character multiset (anagrams
    collide into one posting list, IdenticalAngle=0.998 on char-count
    vectors — BagOfCharsModel.cs:9); tf sums over the collided terms,
    df counts distinct docs of the merged list."""
    from resin_spark.tokenizer import chars_key_py

    key = chars_key_py(token)
    toks = doc_tokens(docs).withColumn("ck", chars_key_col("term"))
    tf = (
        toks.filter(F.col("ck") == key)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = doc_lengths(docs)
    st = corpus_stats(docs)
    n_match = tf.count()
    j = tf.join(dl, "doc_id").crossJoin(F.broadcast(st))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.lit(n_match) + F.lit(0.5)) / (F.lit(n_match) + F.lit(0.5))
    )
    wt = F.col("tf") / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
    )
    return (
        j.select("doc_id", F.round(idf * wt, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def chars_key_classes(docs: DataFrame, limit: int = 20) -> DataFrame:
    """Char-bag identity classes over the vocabulary: (chars_key, n_terms,
    terms) — Resin's anagram collision surface (T1/chars_key)."""
    vocab = doc_tokens(docs).select("term").distinct()
    return (
        vocab.select("term", chars_key_col("term").alias("chars_key"))
        .groupBy("chars_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.array_join(F.sort_array(F.collect_list("term")), ",").alias("terms"),
        )
        .orderBy(F.desc("n_terms"), F.asc("chars_key"))
        .limit(limit)
    )


def snippet_col(text, terms: list[str], before: int = 3,
                after: int = 3) -> Column:
    """Result snippet: the token window around the FIRST occurrence of
    any query term in the tokenized text — ``before`` tokens of left
    context, the hit, ``after`` tokens of right context, space-joined;
    empty string when no term matches.  Pure Catalyst HOFs over the
    token array (transform + filter + array_min + slice): codegen, no
    shuffle, no Python — a projection that composes with any ranked
    result (search-result highlighting, which the reference's HTTP
    responses do not offer).  Window indices are token positions, so the
    snippet is engine-independent (oracle-expressible)."""
    toks = tokens_col(text)
    qt = [t.lower() for t in terms]
    hit_positions = F.filter(
        F.transform(toks, lambda x, i: F.when(x.isin(qt), i)),
        lambda v: v.isNotNull(),
    )
    first = F.array_min(hit_positions)  # 0-based
    start = F.greatest(first - before, F.lit(0))  # 0-based window start
    width = F.lit(before + 1 + after)
    return F.when(
        first.isNotNull(),
        F.array_join(F.slice(toks, start + 1, width), " "),
    ).otherwise(F.lit(""))


def bm25_topk_snippets(docs: DataFrame, term: str, k: int = 10,
                       before: int = 3, after: int = 3) -> DataFrame:
    """Top-k BM25 for one term with a highlight snippet per hit —
    the ranked scan plus one narrow snippet projection."""
    ranked = bm25_topk(docs, term, k=k)
    return (
        ranked.join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", "score",
                snippet_col("text", [term], before, after).alias("snippet"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
