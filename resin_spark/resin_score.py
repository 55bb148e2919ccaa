"""Resin's native vector-space ranking (`score_model='resin'`).

The reference scores a term lookup by the COSINE between the query
token's bag-of-chars vector and the matched term node's vector — a
greedy walk that early-exits at IdenticalAngle=0.998 and otherwise
returns the best node seen on the path (PathFinder.ClosestMatch,
/root/reference/src/Sir.VectorSpace/PathFinder.cs:8-46; thresholds
/root/reference/src/Sir.Search/Models/BagOfCharsModel.cs:9-10).  A doc's
score is the SUM of its matched terms' cosines under the Reducer's
boolean fold, normalized by 1/#terms (SearchSession.cs:40,93-99).  This
is Resin's fuzzy matching: a typo'd query token still retrieves the
postings of its closest char-bag neighbour, anagrams collide outright.

Rebuild semantics (documented deviation): the reference's greedy walk
returns the best node ON THE INSERTION-ORDER-DEPENDENT PATH — an
artifact of the tree build, not of the model.  The rebuild computes the
exact argmax over the field's vocabulary (what the walk approximates),
so results depend only on the data.  Everything is JVM-side: per-term
cosines are string expressions over the sorted `chars_key` column
(count of char c == len(key) - len(replace(key, c))), the argmax is one
max(struct(cos, key)) aggregation over the DISTINCT vocabulary, and
scoring reuses the charbag postings path.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import reduce as _reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark import build as B
from resin_spark.tokenizer import chars_key_py, tokenize_py

IDENTICAL_ANGLE = 0.998
FOLD_ANGLE = 0.55


def char_bag(token: str) -> dict[str, int]:
    return dict(Counter(token))


def _count_expr(col, ch: str):
    """Occurrences of ch in the chars_key string (JVM-side)."""
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def cosine_expr(key_col, qbag: dict[str, int]):
    """cos(query char bag, term char bag) as a pure string expression."""
    qnorm = math.sqrt(sum(v * v for v in qbag.values()))
    dot = _reduce(
        lambda a, b: a + b,
        [F.lit(float(v)) * _count_expr(key_col, c).cast("double")
         for c, v in sorted(qbag.items())],
    )
    chars = F.array_distinct(F.regexp_extract_all(key_col, F.lit("."), 0))
    tnorm = F.sqrt(
        F.aggregate(
            F.transform(chars,
                        lambda c: F.pow(
                            (F.length(key_col)
                             - F.length(F.replace(key_col, c, F.lit("")))
                             ).cast("double"), F.lit(2.0))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (tnorm * F.lit(qnorm))


def cosine_py(a: dict[str, int], b: dict[str, int]) -> float:
    dot = sum(v * b.get(c, 0) for c, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def closest_terms(engine, tokens: list[str], field: str = "text"
                  ) -> dict[str, tuple[str, float]]:
    """token -> (best chars_key, cosine) via ONE scan of the field's
    distinct vocabulary: argmax = max(struct(cos, key))."""
    vocab = (
        engine.postings()
        .filter(F.col("field") == field)
        .select("chars_key")
        .distinct()
    )
    aggs = []
    toks = list(dict.fromkeys(tokens))
    for i, t in enumerate(toks):
        cos = cosine_expr(F.col("chars_key"), char_bag(t))
        aggs.append(
            F.max(F.struct(cos.alias("cos"), F.col("chars_key").alias("key")))
            .alias(f"h{i}")
        )
    row = vocab.agg(*aggs).collect()[0]
    out = {}
    for i, t in enumerate(toks):
        h = row[f"h{i}"]
        if h is not None and h["cos"] is not None and h["cos"] > 0:
            out[t] = (h["key"], float(h["cos"]))
    return out


def resin_topk(engine, text: str, field: str = "text", k: int = 10,
               mode: str = "or") -> DataFrame:
    """Resin-native ranked retrieval: tokenize the query, map each token
    to its closest char-bag term (fuzzy), fold postings under the
    clause op with per-term COSINE weights, normalize by 1/#terms.

    mode='or' keeps the reference's order-sensitive OR (docs of the
    first term, boosted by later matches); mode='and' intersects."""
    spark = engine.spark
    tokens = tokenize_py(text)
    if not tokens:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    hits = closest_terms(engine, tokens, field)
    matched = [t for t in dict.fromkeys(tokens) if t in hits]
    if not matched:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    keys = sorted({hits[t][0] for t in matched})
    kidx = {kk: i for i, kk in enumerate(keys)}

    post = engine.postings().filter(
        (F.col("field") == field) & F.col("chars_key").isin(keys)
    )
    dec = B.decoded_postings(
        post.select("field", F.col("chars_key").alias("term"), "segment",
                    "doc_ids_bin", "tfs_bin", "dls_bin")
    )
    bit = _reduce(
        lambda a, b: a.bitwiseOR(b),
        [F.when(F.col("term") == kk, F.lit(1 << i)).otherwise(F.lit(0))
         for kk, i in kidx.items()],
    ).cast("long")
    # several surface terms can share one chars_key (anagrams) and so
    # repeat a (doc, key-bit) row — dedupe before summing bits into the
    # per-doc mask
    per_doc = dec.select("doc_id", bit.alias("b")).dropDuplicates(
        ["doc_id", "b"]).groupBy("doc_id").agg(F.sum("b").alias("mask"))

    # fold over mask classes, python-side (weights are constants)
    n_terms = len(tokens)
    full = 0
    for t in matched:
        full |= 1 << kidx[hits[t][0]]
    scores: dict[int, float] = {}
    for mask in range(1, 1 << len(keys)):
        if mode == "and" and mask != full:
            continue
        first_key = kidx[hits[matched[0]][0]]
        if mode == "or" and not (mask >> first_key) & 1:
            continue  # order-sensitive OR: first term's docs only
        s = 0.0
        for t in matched:
            if (mask >> kidx[hits[t][0]]) & 1:
                s += hits[t][1]
        scores[mask] = s / n_terms
    if not scores:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    score = F.lit(0.0)
    for m, s in sorted(scores.items()):
        score = F.when(F.col("mask") == m, F.lit(s)).otherwise(score)
    return (
        per_doc.filter(F.col("mask").isin(list(scores)))
        .select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def resin_topk_py(oracle, text: str, field: str = "text", k: int = 10,
                  mode: str = "or") -> list[tuple[tuple, float]]:
    """Pure-python twin over the oracle index (reference.py shapes)."""
    tokens = tokenize_py(text)
    if not tokens:
        return []
    vocab_keys = {}
    for term in oracle.postings[field]:
        vocab_keys.setdefault(chars_key_py(term), set()).update(
            oracle.postings[field][term]
        )
    hits = {}
    for t in dict.fromkeys(tokens):
        qb = char_bag(t)
        best = None
        for key in vocab_keys:
            c = cosine_py(qb, char_bag(key))
            # ties broken toward the LARGER key string, matching the
            # Spark max(struct(cos, key)) aggregate
            if c > 0 and (best is None or (c, key) > best):
                best = (c, key)
        if best:
            hits[t] = (best[1], best[0])
    matched = [t for t in dict.fromkeys(tokens) if t in hits]
    if not matched:
        return []
    doc_sets = {t: vocab_keys[hits[t][0]] for t in matched}
    if mode == "and":
        docs = set.intersection(*doc_sets.values())
    else:
        docs = set(doc_sets[matched[0]])
    out = []
    for d in docs:
        s = sum(hits[t][1] for t in matched if d in doc_sets[t])
        out.append((d, s / len(tokens)))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]
