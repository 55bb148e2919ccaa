"""End-to-end training-data cleaning pipeline: the composition layer over
the individually-verified scrub operators (dedup.py / textops.py).

``clean_corpus`` runs the standard pre-training sequence a data team
applies before packing shards:

1. **PII redaction** — emails/IPs/phones replaced by typed placeholders
   on the RAW text (narrow regexp projection; must run before
   tokenization — the token stream destroys the dotted patterns);
2. **exact dedup** — keep the smallest-key owner of each token-stream
   fingerprint of the redacted text (one hash shuffle);
3. **chunk-level exact-substring dedup** — rewrite each survivor with
   corpus-wide duplicate token chunks removed
   (``dedup.chunk_dedup_apply``: one fingerprint shuffle, no pairs);
4. **benchmark decontamination** — drop docs sharing a token n-gram with
   the held-out eval set (array-intersect for small benches, semi-join
   for big ones).

Everything stays declarative, so Catalyst pipelines the narrow stages
between the two shuffles; at 100 TB the cost is exactly the two
fingerprint aggregations plus one corpus scan.  Per-stage survivor
counts come back in a small report DataFrame (``clean_corpus_report``)
so a pipeline run is auditable without re-running stages.

Role analog in the reference: its crawler pipeline dedupes and filters
documents before indexing (CCHelper.WriteWatSegment,
/root/reference/src/Sir.CommonCrawl/CCHelper.cs:29-66) — single-node,
imperative; this is the scale-out declarative form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark import textops
from resin_spark.dedup import chunk_dedup_apply, decontaminate_flags
from resin_spark.textops import fingerprint_col


def clean_corpus(
    df: DataFrame,
    benchmark: "list[str] | DataFrame | None" = None,
    key: str = "doc_id",
    text: str = "text",
    window: int = 20,
    ngram: int = 5,
    redact_pii: bool = True,
    near_dup: bool = False,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """The composed cleaning pass.  Returns one row per SURVIVING doc:
    (key, clean_text, n_chunks, n_removed) — PII-redacted, exact
    duplicates keep only the smallest key, texts are chunk-deduped, and
    contaminated docs are dropped when ``benchmark`` is given."""
    # 1. PII redaction on the raw text (pre-tokenization)
    red = df.select(
        F.col(key),
        (textops.pii_redact_col(text) if redact_pii
         else F.col(text)).alias(text),
    )
    # 2. exact dedup: smallest key per token-stream fingerprint
    owners = (
        red.select(F.col(key), fingerprint_col(text).alias("_fp"))
        .groupBy("_fp").agg(F.min(key).alias(key))
        .select(key)
    )
    survivors = red.join(owners, key, "left_semi")
    if near_dup:
        # 2b. near-duplicate CLUSTER dedup: MinHash-LSH candidates →
        # exact Jaccard verify → connected components → keep only the
        # canonical (min-key) doc of each cluster.  Bucketed joins +
        # df-capped verify + O(log n) star rounds — no pair explosion.
        from resin_spark.dedup import (connected_components, jaccard_pairs,
                                       minhash_candidates)

        cand = minhash_candidates(survivors, key=key, text=text)
        pairs = jaccard_pairs(survivors, key=key, text=text,
                              threshold=jaccard_threshold, candidates=cand)
        comp = connected_components(survivors.select(key), pairs, key=key)
        survivors = survivors.join(
            comp.filter(F.col("keep")).select(key), key, "left_semi")
    # 3. chunk-level rewrite over the deduped corpus
    out = chunk_dedup_apply(survivors, key=key, text=text, window=window)
    # 4. decontamination on the REWRITTEN text (what would be trained on)
    if benchmark is not None:
        flags = decontaminate_flags(
            out.select(key, F.col("clean_text").alias("text")),
            benchmark, n=ngram, key=key)
        out = (
            out.join(flags.filter(~F.col("contaminated")).select(key),
                     key, "left_semi")
        )
    return out


def clean_corpus_report(df: DataFrame, cleaned: DataFrame,
                        key: str = "doc_id") -> DataFrame:
    """One-row audit: input docs, surviving docs, chunks kept/removed."""
    stats = cleaned.agg(
        F.count(F.lit(1)).cast("long").alias("docs_out"),
        F.sum("n_chunks").cast("long").alias("chunks_seen"),
        F.sum("n_removed").cast("long").alias("chunks_removed"),
    )
    return stats.crossJoin(
        df.agg(F.count(F.lit(1)).cast("long").alias("docs_in"))
    ).select("docs_in", "docs_out", "chunks_seen", "chunks_removed")
