"""Pure-Python oracle engine (no Spark) — the rank-identical target.

Plays the role of Resin's in-memory engine for correctness: build an
inverted index from transcript rows, answer boolean BM25 top-k queries.
The Spark engine (resin_spark/executor.py) must match this oracle's top-k
docIDs exactly and scores within 1e-9 (FIXTURES.md §3/§4).

Scoring (north rule; replaces Resin's cosine X6, SURVEY.md §2.7):
    score(d, t) = idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    k1 = 1.2, b = 0.75
avgdl is computed as exact-integer total_tokens / N in float64 so Spark
and Python agree bit-for-bit.

Boolean merge is faithful to /root/reference/src/Sir.VectorSpace/
Reducer.cs:86-149 (see resin_spark/query.py docstring), with per-doc BM25
weights in place of Resin's per-term cosine score.

Tie-break: score desc, then conv_id asc, turn_idx asc
(Resin's sort is tie-unstable, SearchSession.cs:106-131 — we fix it).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from resin_spark.query import Query, Term, parse_query
from resin_spark.tokenizer import tokenize_py

K1 = 1.2
B = 0.75

DocKey = tuple[str, int]  # (conv_id, turn_idx)


@dataclass
class OracleIndex:
    n_docs: int = 0
    # field -> term -> {dockey: tf}
    postings: dict[str, dict[str, dict[DocKey, int]]] = field(default_factory=dict)
    # field -> {dockey: dl}
    doclens: dict[str, dict[DocKey, int]] = field(default_factory=dict)
    # field -> total token count (exact int)
    total_tokens: dict[str, int] = field(default_factory=dict)
    docs: dict[DocKey, dict] = field(default_factory=dict)

    def avgdl(self, fld: str) -> float:
        if self.n_docs == 0:
            return 0.0
        return self.total_tokens.get(fld, 0) / self.n_docs

    def idf(self, fld: str, term: str) -> float:
        df = len(self.postings.get(fld, {}).get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def weight(self, fld: str, term: str, key: DocKey) -> float:
        tf = self.postings[fld][term][key]
        dl = self.doclens[fld].get(key, 0)
        denom = tf + K1 * (1.0 - B + B * dl / self.avgdl(fld))
        return self.idf(fld, term) * (tf / denom)


def build_oracle_index(rows: list[dict],
                       fields: tuple[str, ...] = ("text", "role", "tool")) -> OracleIndex:
    idx = OracleIndex()
    for row in rows:
        key: DocKey = (row["conv_id"], int(row["turn_idx"]))
        idx.docs[key] = row
        idx.n_docs += 1
        for fld in fields:
            toks = tokenize_py(row.get(fld) or "")
            if not toks:
                continue
            idx.doclens.setdefault(fld, {})[key] = len(toks)
            idx.total_tokens[fld] = idx.total_tokens.get(fld, 0) + len(toks)
            fpost = idx.postings.setdefault(fld, {})
            for term, tf in Counter(toks).items():
                fpost.setdefault(term, {})[key] = tf
    return idx


def _term_scores(idx: OracleIndex, t: Term) -> dict[DocKey, float]:
    plist = idx.postings.get(t.field, {}).get(t.token, {})
    return {key: idx.weight(t.field, t.token, key) for key in plist}


def _merge(result: dict[DocKey, float] | None,
           incoming: dict[DocKey, float], op: str) -> dict[DocKey, float]:
    """Reducer.cs:86-149 fold. ``result=None`` means 'no terms folded yet'
    — Resin starts from an empty dict; empty-dict and None behave the same
    for and/or (insert all) but differ never (not on empty = stay empty)."""
    if result is None or len(result) == 0:
        if op == "not":
            return result if result is not None else {}
        return dict(incoming)
    if op == "and":
        return {k: result[k] + v for k, v in incoming.items() if k in result}
    if op == "or":
        out = dict(result)
        for k, v in incoming.items():
            if k in out:
                out[k] += v
        return out
    # not
    out = dict(result)
    for k in incoming:
        out.pop(k, None)
    return out


def _reduce_query(idx: OracleIndex, q: Query,
                  result: dict[DocKey, float] | None) -> dict[DocKey, float]:
    """Reducer.cs:9-84: reduce own terms into a fresh dict, merge that into
    result under the clause op, then chain and/or/not sub-queries."""
    query_result: dict[DocKey, float] | None = None
    for t in q.terms:
        ts = _term_scores(idx, t)
        if not ts:
            # Resin skips terms with no matched postings entirely
            # (Reducer.cs:88-89: PostingsOffsets == null -> return) —
            # an unmatched AND term does NOT empty the result.
            continue
        if q.op == "not":
            # clause-scoped NOT (see query.py deviation note): the terms
            # of a "not" clause form the UNION of postings to subtract
            if query_result is None:
                query_result = dict(ts)
            else:
                for k, v in ts.items():
                    query_result.setdefault(k, v)
        else:
            query_result = _merge(query_result, ts, t.op)
    if query_result is None:
        query_result = {}
    result = _merge(result, query_result, q.op)
    if q.and_q is not None:
        result = _reduce_query(idx, q.and_q, result)
    if q.or_q is not None:
        result = _reduce_query(idx, q.or_q, result)
    if q.not_q is not None:
        result = _reduce_query(idx, q.not_q, result)
    return result


def oracle_search(idx: OracleIndex, query: dict | Query, k: int = 10,
                  skip: int = 0) -> list[tuple[DocKey, float]]:
    """Top-k (dockey, score), deterministic tie-break; skip/take paging
    mirrors SearchSession.Sort (SearchSession.cs:106-131); take==0 => all."""
    q = parse_query(query) if isinstance(query, dict) else query
    scores = _reduce_query(idx, q, None)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    if k == 0:
        return ranked[skip:]
    return ranked[skip : skip + k]


def oracle_stats(idx: OracleIndex, fld: str = "text") -> dict:
    return {
        "n_docs": idx.n_docs,
        "total_tokens": idx.total_tokens.get(fld, 0),
        "avgdl": idx.avgdl(fld),
        "n_terms": len(idx.postings.get(fld, {})),
    }
