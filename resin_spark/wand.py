"""Block-max WAND top-k (north rule; SURVEY.md §4.2 item 3).

Standard ranked-retrieval semantics: disjunctive ("or": score = sum of
matched term weights) or conjunctive ("and": doc must match all terms)
BM25 top-k.  (executor.py reproduces Resin's order-sensitive boolean fold;
this module is the classic WAND formulation the north rule names.)

Why pruning is exact here: postings blocks are ranges of doc space
(block_id = doc_id >> BLOCK_SHIFT, build.py), so ALL postings of a doc —
across every query term — live in the same block_id.  The per-block upper
bound  ub(b) = Σ_t idf_t · max_tf/(max_tf + k1·(1−b_param + b_param·min_dl/avgdl))
therefore bounds every doc score in the block, and a block with
ub(b) ≤ θ (current kth best) can be skipped WITHOUT decoding.

Two distributed phases, no driver-side posting data:
1. score the top-M blocks by ub (M small) → θ = kth best actual score;
2. score only remaining blocks with ub > θ (a pushed-down filter on the
   block metadata — skipped blocks are never decoded, and with postings
   stored block-per-row Parquet never even materializes their binary
   columns thanks to late row-group decoding).

The exhaustive scorer (``exact=True``) runs the same plan with no pruning
and must return identical top-k — asserted in tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark import build as B

K1 = 1.2
BB = 0.75


def _idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _score_blocks(matched: DataFrame, idf_expr, avgdl: float,
                  mode: str, n_terms: int) -> DataFrame:
    """Decode blocks -> per-doc summed BM25 (doc_id, score)."""
    dec = B.decoded_postings(matched)
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    w = idf_expr * (tf_d / (tf_d + F.lit(K1) * (F.lit(1.0 - BB) + F.lit(BB) * dl_d / F.lit(avgdl))))
    scored = dec.select("term", "doc_id", w.alias("w"))
    agg = scored.groupBy("doc_id").agg(
        F.sum("w").alias("score"), F.count(F.lit(1)).alias("n_matched")
    )
    if mode == "and":
        agg = agg.filter(F.col("n_matched") == n_terms)
    return agg.select("doc_id", "score")


def wand_topk(
    spark,
    root: str,
    tokens: list[str],
    field: str = "text",
    k: int = 10,
    mode: str = "or",
    exact: bool = False,
    first_phase_blocks: int = 4,
) -> tuple[list[tuple[int, float]], dict]:
    """Top-k (doc_id, score) + pruning stats.  Deterministic tie-break
    (score desc, doc_id asc)."""
    postings = B.read_postings(spark, root)
    matched_all = postings.filter(
        (F.col("field") == field) & F.col("term").isin(sorted(set(tokens)))
    ).select("field", "term", "segment", "block_id", "df_block", "max_tf",
             "min_dl", "doc_ids_bin", "tfs_bin", "dls_bin")

    stats_rows = (
        B.read_stats(spark, root)
        .filter(F.col("field") == field)
        .agg(F.sum("total_tokens").alias("tt"), F.sum("n_docs").alias("nd"))
        .collect()[0]
    )
    n_docs = stats_rows["nd"] or 0
    avgdl = (stats_rows["tt"] / n_docs) if n_docs else 0.0

    df_rows = matched_all.groupBy("term").agg(F.sum("df_block").alias("df")).collect()
    df_map = {r["term"]: r["df"] for r in df_rows}
    if not df_map or n_docs == 0:
        return [], {"blocks_total": 0, "blocks_scored": 0}
    if mode == "and" and any(not df_map.get(t) for t in set(tokens)):
        # conjunctive semantics: a query term absent from the index means
        # NO document can match all terms — dropping the term instead
        # would return false positives
        return [], {"blocks_total": 0, "blocks_scored": 0}

    idf_expr = F.lit(0.0)
    for t, dfv in df_map.items():
        idf_expr = F.when(F.col("term") == t, F.lit(_idf(n_docs, dfv))).otherwise(idf_expr)

    n_terms = len([t for t in set(tokens) if df_map.get(t)])

    # per-(term, block) upper bound, then per-block sum
    mtf = F.col("max_tf").cast("double")
    mdl = F.col("min_dl").cast("double")
    ub_term = idf_expr * (mtf / (mtf + F.lit(K1) * (F.lit(1.0 - BB) + F.lit(BB) * mdl / F.lit(avgdl))))
    with_ub = matched_all.withColumn("ub", ub_term)
    block_ub = with_ub.groupBy("block_id").agg(
        F.sum("ub").alias("ub"), F.count(F.lit(1)).alias("n_term_blocks")
    )
    if mode == "and":
        # a block missing any term can't produce a conjunctive match
        block_ub = block_ub.filter(F.col("n_term_blocks") >= n_terms)
    blocks_total = block_ub.count()

    matched = matched_all.join(block_ub.select("block_id"), "block_id")

    if exact:
        ranked = _score_blocks(matched, idf_expr, avgdl, mode, n_terms)
        rows = ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        return ([(r["doc_id"], r["score"]) for r in rows],
                {"blocks_total": blocks_total, "blocks_scored": blocks_total})

    # phase 1: highest-ub blocks establish θ
    top_blocks = [r["block_id"] for r in
                  block_ub.orderBy(F.desc("ub"), F.asc("block_id"))
                  .limit(first_phase_blocks).collect()]
    p1 = _score_blocks(matched.filter(F.col("block_id").isin(top_blocks)),
                       idf_expr, avgdl, mode, n_terms)
    p1_rows = p1.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    theta = p1_rows[k - 1]["score"] if len(p1_rows) >= k else float("-inf")

    # phase 2: blocks whose bound can still affect the top-k.  >= not >:
    # a doc scoring EXACTLY θ in a pruned block could win the doc_id
    # tie-break against the current kth — strict > would drop it and
    # break exact parity with the exhaustive scorer
    survivors = block_ub.filter(
        (F.col("ub") >= F.lit(theta)) & ~F.col("block_id").isin(top_blocks)
    )
    blocks_scored = len(top_blocks) + survivors.count()
    p2 = _score_blocks(
        matched.join(survivors.select("block_id"), "block_id"),
        idf_expr, avgdl, mode, n_terms,
    )
    final = p2.unionByName(p1).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rows = final.collect()
    return ([(r["doc_id"], r["score"]) for r in rows],
            {"blocks_total": blocks_total, "blocks_scored": blocks_scored,
             "theta": theta})
