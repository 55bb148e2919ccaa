"""Query IR + JSON parser — rebuild of Resin's Query/Term/QueryParser.

Reference:
* IR:      /root/reference/src/Sir.VectorSpace/Query.cs:16-162, Term.cs:6-34
* parser:  /root/reference/src/Sir.Search/Parsers/QueryParser.cs:21-222

A query is a tree of clauses.  Each clause has an operator ("and" | "or" |
"not"), a list of Terms (one per token of each field value, all carrying
the clause operator), and optional chained sub-queries evaluated in the
fixed order and → or → not (Reducer.cs:72-83).  Evaluation semantics live
in resin_spark/reference.py (oracle) and resin_spark/executor.py (Spark),
both faithful to Reducer.cs:86-149:

* and: empty result -> insert all; else intersect, score = old + new
* or:  empty result -> insert all; else boost existing keys only
       (order-sensitive OR — new keys are NOT added, Reducer.cs:130-137)
* not: remove keys (no-op on empty result)

Documented deviation from the reference parser: QueryParser.Parse(dynamic)
(QueryParser.cs:137-201) keeps and/or/not as STICKY flags that are never
reset while walking nested clauses, chains every nested clause through the
``.Or`` pointer only, and Term's constructor lets a later-set ``not`` flag
clear an earlier ``and`` (Term.cs:29-31 property order) — the net effect
is that a query like {"and": {"text": "apple", "not": {"text": "apples"}}}
marks ALL terms as subtraction and evaluates to the empty set.  That is a
parser artifact, not the documented intent (README.md:40 advertises
AND/OR/NOT queries).  This rebuild scopes operators to their clause: a
"not" clause's terms form the union of postings to subtract from the
parent result, and nested clauses keep their own operators.  The Reducer
fold semantics above are preserved exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from resin_spark.tokenizer import tokenize_py

OPS = ("and", "or", "not")


@dataclass
class Term:
    field: str
    token: str
    op: str  # "and" | "or" | "not" — from the enclosing clause


@dataclass
class Query:
    op: str
    terms: list[Term] = field(default_factory=list)
    and_q: "Query | None" = None
    or_q: "Query | None" = None
    not_q: "Query | None" = None
    collection: str | None = None
    select: list[str] | None = None
    skip: int = 0
    take: int = 10


def parse_query(d: dict, *, skip: int = 0, take: int = 10,
                select: list[str] | None = None) -> Query:
    """Parse the JSON query form (QueryParser.Parse(dynamic),
    QueryParser.cs:116-203).  Exactly one of and/or/not at each level; the
    clause dict maps field names to query text (tokenized, one Term per
    token) and may nest further and/or/not clauses."""
    ops_present = [k for k in OPS if k in d]
    if len(ops_present) != 1:
        raise ValueError(f"query dict must have exactly one of {OPS}: {d}")
    op = ops_present[0]
    clause = d[op]
    q = Query(op=op, skip=skip, take=take, select=select)
    for key, value in clause.items():
        if key == "collection":
            q.collection = value
        elif key in OPS:
            child = parse_query({key: value})
            if key == "and":
                q.and_q = child
            elif key == "or":
                q.or_q = child
            else:
                q.not_q = child
        else:
            for tok in tokenize_py(str(value)):
                q.terms.append(Term(field=key, token=tok, op=op))
    return q


def parse_flat(
    q: str,
    fields: list[str],
    op: str = "or",
    collection: str | None = None,
    select: list[str] | None = None,
    skip: int = 0,
    take: int = 10,
) -> Query:
    """Q1 programmatic parse (QueryParser.Parse(collections, q, fields,
    select, and, or), QueryParser.cs:21-114): one query string searched
    across multiple fields, fanned out into chained per-field clauses
    under the same operator."""
    d: dict = {}
    cursor = d
    for i, f in enumerate(fields):
        clause: dict = {f: q}
        if collection:
            clause["collection"] = collection
        cursor[op] = clause
        cursor = clause
    return parse_query(d, skip=skip, take=take, select=select)


def query_terms(q: Query) -> list[Term]:
    """All terms of the tree (for the one-pass postings join)."""
    out = list(q.terms)
    for child in (q.and_q, q.or_q, q.not_q):
        if child is not None:
            out.extend(query_terms(child))
    return out
