"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes the SQL-expressible slices of the resin_spark engine
(FIXTURES.md §5): tokenize / df / tf / corpus stats / BM25 top-k /
boolean merges / char-bag classes / dedup / text analysis / embedding
similarity — each with a DuckDB oracle in oracle_sql().  The LSH
pipelines (MinHash, SimHash, hyperplane ANN/near-dup) are built on md5
32-bit lanes and integer hyperplanes precisely so their oracles are
expressible in DuckDB: every queries() entry has a full SQL oracle.

Float discipline: every score column is round(x, 6) (cosine: 4) and the
ORDER BY uses the rounded value + id tie-break, so Spark and DuckDB agree
on both values and LIMIT boundaries despite libm-vs-JVM ln() ulp noise.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# DuckDB-side tokenizer (mirrors resin_spark.tokenizer.tokens_col)
TOKS = r"list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')"

SQL_PRELUDE = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
st AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(dl)::BIGINT AS total_tokens,
         sum(dl)::BIGINT / count(*)::BIGINT AS avgdl
  FROM dl
),
dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
scores AS (
  SELECT tf.term, tf.doc_id,
         ln(1.0 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN st
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boolean BM25 (AND) top-10 over sf0.001 documents."""
    from resin_spark import docops

    return docops.bm25_and(_docs(spark, "/root/testdata/sf0.001"), "spark", "query", k=10)


# --------------------------------------------------------------- queries
def _q_doc_count(spark, sf):
    return _docs(spark, sf).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


def _q_scan_page(spark, sf):
    return (
        _docs(spark, sf).orderBy("doc_id").offset(10).limit(5)
        .select("doc_id", "source", "n_chars")
    )


def _q_point_fetch(spark, sf):
    return _docs(spark, sf).filter(F.col("doc_id") == 42).select(
        "doc_id", "text", "n_chars"
    )


def _q_term_df(spark, sf):
    from resin_spark import docops

    return (
        docops.term_df(_docs(spark, sf))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def _q_term_tf(spark, sf):
    from resin_spark import docops

    return (
        docops.doc_tf(_docs(spark, sf))
        .filter(F.col("term") == "spark")
        .select("doc_id", "tf")
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(20)
    )


def _q_chars_key(spark, sf):
    from resin_spark import docops

    return docops.chars_key_classes(_docs(spark, sf), limit=20)


def _q_dedup_exact(spark, sf):
    from resin_spark import dedup

    return (
        dedup.exact_duplicates(_docs(spark, sf))
        .select("fp", "n_dups", "keep_id")
        .orderBy("fp")
    )


def _q_dedup_first_seen(spark, sf):
    """Batch form of the applyInPandasWithState first-seen dedup
    (resin_spark/streaming.py) — the stream's Pandas fn under an
    empty-state shim, hash-checked against plain SQL."""
    from resin_spark import streaming

    return streaming.first_seen_dedup(_docs(spark, sf)).orderBy("fp")


def _q_tok_counts(spark, sf):
    from resin_spark import textops

    return (
        _docs(spark, sf)
        .select(
            "doc_id",
            textops.token_count_col("text").cast("long").alias("n_tok"),
            textops.bpe_ish_count_col("text").cast("long").alias("n_bpe"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


def _q_quality(spark, sf):
    from resin_spark import textops

    q = textops.quality_columns(_docs(spark, sf))
    return (
        q.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("stopword_ratio", 6).alias("stopword_ratio"),
            F.round("punct_ratio", 6).alias("punct_ratio"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


def _q_langid(spark, sf):
    from resin_spark import textops

    return (
        _docs(spark, sf)
        .select(textops.lang_id_col("text").alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"))
    )


def _q_fingerprint(spark, sf):
    from resin_spark import textops

    return (
        _docs(spark, sf)
        .select("doc_id", textops.fingerprint_col("text").alias("fp"))
        .orderBy("doc_id")
        .limit(50)
    )


def _q_emb_knn_join(spark, sf):
    """Exact k-NN JOIN (one corpus pass for a query batch) — top-5
    neighbors for each of 3 query vectors; cosine rounded to 6 dp BEFORE
    ranking in both engines (matmul vs SQL dot differ ~1e-13)."""
    from resin_spark import similarity

    emb = _emb(spark, sf)
    qs = [(r["vec_id"], [float(x) for x in r["embedding"]])
          for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()]
    out = similarity.knn_join(emb, qs, k=5)
    return out.select("q_id", "n_id", "cosine",
                      F.col("rank").cast("long").alias("rank")).orderBy("q_id", "rank")


def _q_emb_topk(spark, sf):
    from resin_spark import similarity

    emb = _emb(spark, sf)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    # margin then round-and-re-rank (see _q_wand_topk): the testdata has
    # 4-dp cosine collisions near the k-boundary, and the oracle limits
    # on the rounded value
    out = similarity.cosine_topk(emb, [float(x) for x in q], k=100)
    return (
        out.select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# ------------------------------------------------- engine-backed queries
# These build a REAL index (resin_spark.build) over the documents table
# (mapped to the transcript shape: conv_id = zero-padded doc_id, one turn
# per doc) and answer through the production read path — postings scan,
# block decode, BM25, boolean fold, WAND — so the driver's oracle gate
# verifies the full engine, not just the declarative recomputation above.
_ENGINE_CACHE: dict[str, object] = {}


def _engine(spark, sf):
    if sf not in _ENGINE_CACHE:
        import hashlib

        from resin_spark import api, build

        # v4: positional postings (phrase adjacency verified from the
        # index, no docs scan); v3 was 18-digit conv_id padding
        tag = hashlib.md5(f"{sf}|v4".encode()).hexdigest()[:8]
        root = f"/tmp/resin_entry_idx_{tag}/coll"
        fields = ("text", "lang", "source")
        # disk-persistent across processes: a completed segment-0 receipt
        # means the index is already built for this sf_dir — reuse it
        if build.completed_segments(spark, root) != {0}:
            t = _docs(spark, sf).select(
                F.format_string("d%018d", F.col("doc_id")).alias("conv_id"),
                F.lit(0).alias("turn_idx"),
                F.col("text"),
                F.col("lang"),
                F.col("source"),
            )
            api.build_index(spark, t, root, fields=fields,
                            positions=True)
        _ENGINE_CACHE[sf] = api.SearchEngine(spark, root, fields=fields)
    return _ENGINE_CACHE[sf]


def _engine_result(ranked: DataFrame, k: int = 10, skip: int = 0) -> DataFrame:
    """conv_id 'd%018d' -> original doc_id; re-rank by the ROUNDED score
    (+ doc_id tie-break) so the LIMIT boundary matches the oracle's."""
    out = (
        ranked.select(
            F.substring("conv_id", 2, 18).cast("long").alias("doc_id"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    if skip:
        out = out.offset(skip)
    return out.limit(k)


def _q_engine_topk(spark, sf):
    eng = _engine(spark, sf)
    return _engine_result(
        eng.search({"or": {"text": "spark"}}, k=0, select=["conv_id", "turn_idx"])
    )


def _q_engine_and(spark, sf):
    eng = _engine(spark, sf)
    return _engine_result(
        eng.search({"and": {"text": "spark query"}}, k=0,
                   select=["conv_id", "turn_idx"])
    )


def _q_engine_not(spark, sf):
    eng = _engine(spark, sf)
    return _engine_result(
        eng.search({"and": {"text": "spark", "not": {"text": "window"}}},
                   k=0, select=["conv_id", "turn_idx"])
    )


def _q_engine_stats(spark, sf):
    """Corpus stats through the ENGINE path: n_docs from the segment
    receipts, total_tokens/avgdl derived from the sum_tf posting-block
    metadata (build.py) — must equal the tokenize-from-scratch oracle."""
    eng = _engine(spark, sf)
    st = eng.stats()["text"]
    return spark.createDataFrame(
        [(int(st["n_docs"]), int(st["total_tokens"]), float(st["avgdl"]))],
        "n_docs long, total_tokens long, avgdl double",
    )


def _q_engine_paged(spark, sf):
    eng = _engine(spark, sf)
    return _engine_result(
        eng.search({"or": {"text": "table"}}, k=0, select=["conv_id", "turn_idx"]),
        k=10, skip=5,
    )


def _q_engine_multifield(spark, sf):
    """Multi-field boolean merge (I8/X4): BM25 over the lang field ANDed
    with BM25 over the text field, each scored with its own field stats."""
    eng = _engine(spark, sf)
    return _engine_result(
        eng.search({"and": {"lang": "en", "and": {"text": "spark"}}},
                   k=0, select=["conv_id", "turn_idx"])
    )


def _q_pii_redact(spark, sf):
    """PII scrub pass: deterministic emails/IPs/phones are planted into
    every doc (mirrored verbatim in the SQL oracle), then counted and
    redacted; the md5 of the redacted text pins the rewrite itself."""
    from resin_spark import textops

    d = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id"), F.lit("@ex.org ip 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)), F.lit(".7 tel 555-010-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)), 4, "0"),
        ).alias("text"),
    )
    return (
        textops.pii_counts(d)
        .select("doc_id", "n_email", "n_ip", "n_phone",
                F.md5(textops.pii_redact_col("text")).alias("red_fp"))
        .orderBy("doc_id")
    )


def _q_url_dedup(spark, sf):
    """Canonical-URL dedup: raw URLs differ per doc (scheme case, www,
    default port, utm param, fragment) but normalize into groups of 5 —
    url_dedup_groups must find exactly those groups."""
    from resin_spark import textops

    d = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("HTTP://WWW."))
            .otherwise(F.lit("http://www.")),
            F.col("source"), F.lit(".Example.COM:80/p/"),
            F.pmod("doc_id", F.lit(25)),
            F.lit("/?utm_source=u"), F.col("doc_id"),
            F.lit("&q=1#frag"), F.col("doc_id"),
        ).alias("url"),
    )
    return textops.url_dedup_groups(d, "url").orderBy("norm_url")


def _q_decontam(spark, sf):
    """Benchmark decontamination: docs 7 and 123 play the eval set; any
    doc sharing a token 3-gram with either is flagged.  The small-bench
    form (array_intersect, no join) runs here; the DataFrame/join form is
    pytest-checked for parity."""
    from resin_spark import dedup

    docs = _docs(spark, sf)
    bench = [r["text"] for r in
             docs.filter(F.col("doc_id").isin(7, 123))
             .orderBy("doc_id").collect()]
    return dedup.decontaminate_flags(docs, bench, n=3).orderBy("doc_id")


def _q_chunk_dedup_apply(spark, sf):
    """The rewrite form: duplicate chunks removed, survivors reassembled;
    the md5 of the clean text pins the rewritten token stream itself."""
    from resin_spark import dedup

    d = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.expr("repeat(concat('shared', doc_id % 7, ' '), 10)"),
            F.col("text"),
        ).alias("text"),
    )
    return (
        dedup.chunk_dedup_apply(d, window=10)
        .select("doc_id", F.md5("clean_text").alias("clean_fp"),
                "n_chunks", "n_removed")
        .orderBy("doc_id")
    )


def _q_snippets(spark, sf):
    """Top-k BM25 with result highlighting: the token window (3 left,
    hit, 3 right) around the first query-term occurrence — a narrow
    HOF projection over the ranked hits."""
    from resin_spark import docops

    return docops.bm25_topk_snippets(_docs(spark, sf), "spark", k=10)


def _q_pipeline_clean(spark, sf):
    """The COMPOSED cleaning pipeline (pipeline.clean_corpus): PII
    redaction -> exact dedup -> chunk-level rewrite -> benchmark
    decontamination, end-to-end against one SQL oracle.  Planted signal:
    every doc_id % 50 == 1 is a byte-identical copy of its leader (exact
    dup), every doc carries a class-shared 10-token prefix (chunk dups)
    and a synthetic email (PII), and doc 7's original text plays the
    eval set (decontamination)."""
    from resin_spark import pipeline

    docs = _docs(spark, sf)
    eff = (
        F.when(F.pmod("doc_id", F.lit(50)) == 1, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    src = docs.select("doc_id", eff.alias("eff_id"))
    leaders = docs.select(F.col("doc_id").alias("eff_id"), "text")
    planted = src.join(leaders, "eff_id").select(
        "doc_id",
        F.concat(
            F.expr("repeat(concat('shared', eff_id % 7, ' '), 10)"),
            F.col("text"),
            F.lit(" contact u"), F.pmod("eff_id", F.lit(25)),
            F.lit("@ex.org"),
        ).alias("text"),
    )
    bench = [docs.filter(F.col("doc_id") == 7).collect()[0]["text"]]
    out = pipeline.clean_corpus(planted, benchmark=bench,
                                window=10, ngram=5)
    return (
        out.select("doc_id", F.md5("clean_text").alias("clean_fp"),
                   "n_chunks", "n_removed")
        .orderBy("doc_id")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _q_events_gap_stats(spark, sf):
    """Per-user event timing via lag() under the deterministic
    (ts, event_id) order — exact epoch-microsecond integers."""
    from resin_spark import datasets

    return datasets.event_gap_stats(_events(spark, sf)).orderBy("user_id")


def _q_events_transitions(spark, sf):
    """Event-type bigram counts via lead() per user stream."""
    from resin_spark import datasets

    return (datasets.event_transitions(_events(spark, sf))
            .orderBy("event_type", "next_type"))


def _q_events_props_agg(spark, sf):
    """JSON-props aggregation: get_json_object('$.k') summed per type."""
    from resin_spark import datasets

    return datasets.props_agg(_events(spark, sf)).orderBy("event_type")


def _q_engine_phrase(spark, sf):
    """Exact-phrase retrieval through the engine: the AND ranking of the
    phrase's terms restricted to docs whose tokenizer-normalized text
    contains the adjacent phrase (verify-after-intersection plan;
    beyond-reference — Resin scores phrases as term bags)."""
    eng = _engine(spark, sf)
    return _engine_result(
        eng.phrase_search("spark table", k=0, select=["conv_id", "turn_idx"])
    )


def _q_wand_topk(spark, sf):
    """Block-max WAND (pruned) disjunction — must equal the exhaustive
    BM25 OR-sum oracle exactly."""
    from resin_spark import wand

    eng = _engine(spark, sf)
    # fetch a wide margin, then round-and-re-rank: the oracle's LIMIT is
    # on the ROUNDED score, and raw-score truncation at exactly k could
    # drop a doc that wins the rounded tie-break
    hits, _ = wand.wand_topk(spark, eng.root, ["spark", "table"], k=100, mode="or")
    hit_df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    docs = eng.documents().select("doc_id", "conv_id")
    return _engine_result(hit_df.join(docs, "doc_id").drop("doc_id"))


def _q_resin_cosine(spark, sf):
    """Resin's native char-bag COSINE ranking through the engine path:
    the typo'd token 'applw' maps to its closest char-bag vocabulary
    term (fuzzy matching, PathFinder.ClosestMatch semantics) and every
    posting of that term scores the cosine (single-token query)."""
    from resin_spark.resin_score import resin_topk

    eng = _engine(spark, sf)
    hits = resin_topk(eng, "applw", field="text", k=1000)
    docs = eng.documents().select("doc_id", "conv_id")
    return (
        hits.join(docs, "doc_id")
        .select(
            F.substring("conv_id", 2, 18).cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def _q_bm25_charbag(spark, sf):
    """BM25 under Resin's char-bag term identity (anagrams collide; the
    testdata vocabulary happens to have no anagram pairs, so this equals
    surface BM25 here — the collision path is rank-tested in pytest with
    listen/silent/enlist)."""
    from resin_spark import docops

    return docops.bm25_topk_charbag(_docs(spark, sf), "spark", k=10)


def _q_ngram_jaccard(spark, sf):
    from resin_spark import dedup

    pairs = dedup.jaccard_pairs(_docs(spark, sf), k=3, threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def _q_ivf_topk(spark, sf):
    """ANN top-k over an IVF (k-means coarse quantizer) layout — the
    second classic ANN family next to hyperplane LSH.  The entry probes
    ALL cells (n_probes = n_clusters), so the whole IVF machinery —
    Lloyd training, cell assignment, partitioned layout, probe routing,
    exact cosine re-rank — must reproduce the exact-cosine ranking and
    is therefore ORACLE-CHECKED end-to-end (any assignment/layout/probe
    bug breaks it).  Pruned-probe behavior (the recall/scan trade) is
    pinned separately: tests/test_dedup_textops.py (deterministic
    centroids, partition-pruned scans, recall floor) and bench.py
    (ivf_recall / ivf_scan_frac)."""
    import tempfile

    from resin_spark import similarity

    emb = _emb(spark, sf)
    q = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    root = tempfile.mkdtemp(prefix="resin_emb_ivf_")
    similarity.write_ivf_embeddings(emb, root, n_clusters=8, iters=3, dim=64)
    out = similarity.ivf_topk(spark, root, [float(x) for x in q],
                              k=100, n_probes=8)
    return (
        out.select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _q_emb_neardup(spark, sf):
    from resin_spark import similarity

    return (
        # testdata embeddings are near-orthogonal random vectors (max
        # pairwise cosine ~0.51), so a production-style 0.9 threshold
        # returns the empty set; 0.4 exercises the verify path with rows
        similarity.cosine_neardup_pairs(_emb(spark, sf), threshold=0.4,
                                        n_planes=16, bands=4, max_bucket=2000,
                                        dim=64)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


# planted boilerplate cluster for dedup_minhash_pairs: 24 near-identical
# docs (3 variants of one template) that agree on every LSH band, so the
# per-bucket cap + re-split + hub-pair path is exercised AND oracle-checked
# — without it the (band, bucket) self-join would go O(c^2) on exactly
# this shape at 100 TB
_MINHASH_PLANT_N = 24
_MINHASH_PLANT_TEXT = ("shared boilerplate template header row common "
                       "across every page variant ")


def _q_minhash_pairs(spark, sf):
    from resin_spark import dedup

    planted = spark.range(_MINHASH_PLANT_N).select(
        (F.col("id") + 900000).alias("doc_id"),
        F.concat(F.lit(_MINHASH_PLANT_TEXT),
                 (F.col("id") % 3).cast("string")).alias("text"),
    )
    docs = _docs(spark, sf).select("doc_id", "text").unionByName(planted)
    return (
        dedup.minhash_candidates(docs, n_hashes=16, bands=8,
                                 max_bucket=6, resplit_lanes=4,
                                 resplit_depth=2)
        .orderBy("id_a", "id_b")
    )


def _q_simhash_pairs(spark, sf):
    from resin_spark import dedup

    return dedup.simhash_candidates(_docs(spark, sf), max_hamming=10).orderBy(
        "id_a", "id_b"
    )


def _q_ann_topk(spark, sf):
    from resin_spark import similarity

    emb = _emb(spark, sf)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    # margin then round-and-re-rank (see _q_emb_topk)
    out = similarity.ann_topk(emb, [float(x) for x in q], k=100, n_planes=6)
    return (
        out.select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _q_ann_bucketed(spark, sf):
    """ann_topk over the MATERIALIZED bucket-partitioned layout: same
    probe set and results as emb_ann_topk, but the probe filter lands on
    the `bucket` partition column (PartitionFilters — the 100 TB path)."""
    import tempfile

    from resin_spark import similarity

    emb = _emb(spark, sf)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    root = tempfile.mkdtemp(prefix="resin_emb_bucketed_")
    similarity.write_bucketed_embeddings(emb, root, n_planes=6, dim=64)
    out = similarity.ann_topk_bucketed(spark, root, [float(x) for x in q],
                                       k=100)
    return (
        out.select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _q_stream_window_counts(spark, sf):
    """Event-time tumbling-window aggregation (the batch form of the
    streaming operator — same expression runs under a watermark on a
    stream) over the events table."""
    from resin_spark.streaming import windowed_event_counts

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return windowed_event_counts(ev, window="1 hour").orderBy(
        "win_start", "event_type"
    )


def _q_stream_sessions(spark, sf):
    """Gap-based sessionization (session_window, 30-min gap) per user
    over the events table — batch form of the streaming operator."""
    from resin_spark.streaming import sessionize

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return sessionize(ev, gap="30 minutes").orderBy("user_id", "sess_start")


def _q_pack_sequences(spark, sf):
    """Concat-then-chunk sequence packing (resin_spark/datasets.py): per
    language shard, docs lie on a token tape cut into 256-token packs;
    integer-exact window arithmetic, oracle-identical in DuckDB."""
    from resin_spark import datasets
    from resin_spark.tokenizer import tokens_col

    d = _docs(spark, sf).select(
        "doc_id", "lang", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    out = datasets.pack_sequences(d, capacity=256, tokens="n_tokens",
                                  shard="lang", order_by=("doc_id",))
    return out.select(
        "doc_id", "lang", "n_tokens",
        F.col("tape_pos").cast("long").alias("tape_pos"),
        F.col("start_pack").cast("long").alias("start_pack"),
        "start_offset",
        F.col("end_pack").cast("long").alias("end_pack"),
    ).orderBy("lang", "doc_id")


def _q_stratified_sample(spark, sf):
    """Deterministic md5-lane Bernoulli sample, per-language rates
    (resin_spark/datasets.py) — same rows kept in Spark and DuckDB."""
    from resin_spark import datasets

    out = datasets.stratified_sample(
        _docs(spark, sf), rates={"en": 0.5, "de": 0.25}, strata="lang",
        key="doc_id", salt="s0", default_rate=0.1)
    return out.select("doc_id", "lang").orderBy("doc_id")


def _q_topk_ngrams(spark, sf):
    """Top-20 token bigrams by corpus count (resin_spark/datasets.py)."""
    from resin_spark import datasets
    from resin_spark.tokenizer import tokens_col

    return datasets.topk_ngrams(_docs(spark, sf), tokens_col("text"),
                                n=2, k=20)


def _q_gopher_quality(spark, sf):
    """Gopher-rule quality filter (public heuristics, Rae et al. 2021
    A1.1): per-doc metrics + pass verdict over the documents table."""
    from resin_spark import textops

    return (
        textops.gopher_quality(_docs(spark, sf))
        .select("doc_id", "g_n_words", "g_mean_word_len", "g_symbol_ratio",
                "g_bullet_frac", "g_alpha_frac", "g_stop_hits", "gopher_pass")
        .orderBy("doc_id")
    )


def _q_dedup_components(spark, sf):
    """Near-dup clustering: connected components (alternating
    large-star/small-star, O(log n) rounds)
    over the exact-Jaccard duplicate pairs; component = min doc_id,
    keep = canonical doc.  The step after pair generation in any real
    dedup pipeline (cluster -> keep one)."""
    from resin_spark import dedup

    docs = _docs(spark, sf)
    pairs = dedup.jaccard_pairs(docs, k=3, threshold=0.6)
    return (
        dedup.connected_components(docs, pairs)
        .orderBy("doc_id")
    )


def _q_vec_arith(spark, sf):
    """T7 sparse-vector arithmetic (Vector.cs:88-158 rebuilt as map
    HOFs): for each embedding a (sparse form m) and its reverse b,
    compute average(3*m, m - b) and return the deterministic
    ascending-key component sum — exercises multiply, subtract (with
    exact-zero drop), add and average in one op tree that DuckDB can
    mirror dim-by-dim."""
    from resin_spark import vectorspace as vs

    emb = _emb(spark, sf)
    m = vs.to_sparse(F.col("embedding"))
    mrev = vs.to_sparse(F.reverse(F.col("embedding")))
    r = vs.vec_average(vs.vec_multiply(m, 3.0), vs.vec_subtract(m, mrev))
    return emb.select(
        "vec_id", F.round(vs.map_sum(r), 4).alias("comp_sum")
    ).orderBy("vec_id")


def _q_text_cbow(spark, sf):
    """T3 CBOW tokenize (BagOfCharsModel.cs:94-144): per-doc vector
    count + total component mass of the context vectors.  The component
    sum is computed from the ACTUAL maps Spark-side; the oracle uses the
    invariant that a char-bag's components sum to the token length, so
    the shift/concat plumbing is what's being checked."""
    from resin_spark import vectorspace as vs

    cb = vs.cbow_vectors(F.col("text"))
    comp = F.aggregate(
        cb, F.lit(0.0), lambda acc, e: acc + vs.map_sum(e["vec"])
    )
    return (
        _docs(spark, sf)
        .select(
            "doc_id",
            F.size(cb).cast("long").alias("n_vecs"),
            comp.cast("long").alias("comp_sum"),
        )
        .orderBy("doc_id")
    )


def _q_vec_classify(spark, sf):
    """I6 supervised insert + validate (GraphBuilder.cs:25-69,
    ValidateMnistCommand.cs:31-46): train a supervised index on the
    first half of the labeled embeddings, classify the second half by
    best cosine exemplar (broadcast), deterministic (cos, label)
    tie-break.

    Oracle scope note: the SQL oracle classifies against the RAW train
    rows; on this fixture (64-dim random floats, no two vectors within
    1/1024 per-component) the quantized merge provably never fires, so
    raw == merged and the comparison is exact.  The merge semantics
    themselves (doc-id union, label-conflict raise) are pytest-covered
    (test_supervised_merges_doc_ids, test_supervised_label_conflict)."""
    from resin_spark import vectorspace as vs

    emb = _emb(spark, sf)
    idx = vs.supervised_index(emb.filter(F.col("vec_id") < 250))
    pred = vs.classify(
        emb.filter(F.col("vec_id") >= 250), idx.select("embedding", "label")
    )
    return pred.select(
        "vec_id", "pred_label", F.round("cos", 4).alias("cos")
    ).orderBy("vec_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver's correctness harness checks the
    # first 50, so every operator family's strongest oracle sits inside
    # the window.  The former ft_stats / ft_bm25_{topk,paged,and,or,not}
    # / dedup_chunks entries were physical-path twins of driver-green
    # entries (ft_engine_* runs the same BM25 oracle SQL; the chunk
    # rewrite form composes the stats form); the dropped docops paths
    # are pinned rank+score-identical to the engine path by
    # tests/test_docops_parity.py instead.
    return {
        "ft_doc_count": _q_doc_count,
        "ft_scan_page": _q_scan_page,
        "ft_point_fetch": _q_point_fetch,
        "ft_term_df": _q_term_df,
        "ft_term_tf": _q_term_tf,
        "ft_chars_key": _q_chars_key,
        "dedup_exact": _q_dedup_exact,
        "dedup_first_seen": _q_dedup_first_seen,
        "text_tok_counts": _q_tok_counts,
        "text_quality": _q_quality,
        "text_langid": _q_langid,
        "text_fingerprint": _q_fingerprint,
        "emb_cosine_topk": _q_emb_topk,
        "emb_knn_join": _q_emb_knn_join,
        "ft_engine_topk": _q_engine_topk,
        "ft_engine_and": _q_engine_and,
        "ft_engine_not": _q_engine_not,
        "ft_engine_stats": _q_engine_stats,
        "ft_engine_paged": _q_engine_paged,
        "ft_engine_multifield": _q_engine_multifield,
        "ft_wand_topk": _q_wand_topk,
        "ft_engine_phrase": _q_engine_phrase,
        # training-data scrub ops (PII, URL canon, chunk dedup, decontam)
        "text_pii_redact": _q_pii_redact,
        "text_url_dedup": _q_url_dedup,
        "dedup_chunks_apply": _q_chunk_dedup_apply,
        "text_decontam": _q_decontam,
        "ft_snippets": _q_snippets,
        "pipeline_clean": _q_pipeline_clean,
        # event-sequence analytics (window + JSON functions)
        "events_gap_stats": _q_events_gap_stats,
        "events_transitions": _q_events_transitions,
        "events_props_agg": _q_events_props_agg,
        "ft_resin_cosine": _q_resin_cosine,
        "ft_bm25_charbag": _q_bm25_charbag,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        # LSH pipelines: md5-lane hashes + integer hyperplanes, so each
        # has a full DuckDB oracle (no rows-only entries left)
        "dedup_minhash_pairs": _q_minhash_pairs,
        "dedup_simhash_pairs": _q_simhash_pairs,
        "emb_ann_topk": _q_ann_topk,
        "emb_ann_bucketed": _q_ann_bucketed,
        "emb_ivf_topk": _q_ivf_topk,
        "dedup_emb_neardup": _q_emb_neardup,
        "text_gopher": _q_gopher_quality,
        # dataset-assembly ops (resin_spark/datasets.py)
        "text_pack_sequences": _q_pack_sequences,
        "text_stratified_sample": _q_stratified_sample,
        "text_topk_ngrams": _q_topk_ngrams,
        "stream_window_counts": _q_stream_window_counts,
        "stream_sessions": _q_stream_sessions,
        "dedup_components": _q_dedup_components,
        # vector-space ops (SURVEY §2 T3/T7/I6, resin_spark/vectorspace.py)
        "vec_sparse_arith": _q_vec_arith,
        "text_cbow": _q_text_cbow,
        "vec_classify": _q_vec_classify,
    }


# --------------------------------------------------------------- oracle
def _bm25_topk_sql(t: str) -> str:
    return SQL_PRELUDE + f"""
SELECT doc_id, round(score, 6) AS score FROM scores WHERE term = '{t}'
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
"""

def _bm25_and_sql(t1: str, t2: str) -> str:
    return SQL_PRELUDE + f"""
SELECT a.doc_id, round(a.score + b.score, 6) AS score
FROM scores a JOIN scores b USING (doc_id)
WHERE a.term = '{t1}' AND b.term = '{t2}'
ORDER BY round(a.score + b.score, 6) DESC, a.doc_id ASC LIMIT 10
"""

def _bm25_not_sql(t1: str, t2: str) -> str:
    return SQL_PRELUDE + f"""
SELECT a.doc_id, round(a.score, 6) AS score
FROM (SELECT * FROM scores WHERE term = '{t1}') a
ANTI JOIN (SELECT * FROM scores WHERE term = '{t2}') b USING (doc_id)
ORDER BY round(a.score, 6) DESC, a.doc_id ASC LIMIT 10
"""

# md5 32-bit lanes — the cross-engine base hash of every LSH pipeline
# (resin_spark.dedup._md5_lane_col / resin_spark.similarity.int_planes)
_H1 = "('0x'||substr(md5({x}),1,8))::BIGINT"
_H2 = "('0x'||substr(md5({x}),9,8))::BIGINT"


def _minhash_sql(n_hashes: int = 16, bands: int = 8, k: int = 3,
                 max_bucket: int = 6, resplit_lanes: int = 4,
                 resplit_depth: int = 2) -> str:
    """Capped MinHash-LSH candidate pairs, mirroring
    dedup.minhash_candidates exactly: base (band, bucket) keys over the
    first n_hashes lanes, over-cap buckets re-split on fresh lanes
    (k{d} = md5(k{d-1} | lane slice), keys nest), terminal over-cap
    buckets emit hub (min-id, member) pairs.  Includes the planted
    boilerplate cluster so the capped path has driver-green evidence."""
    rows = n_hashes // bands
    total = n_hashes + resplit_lanes * resplit_depth
    key_cols = [
        f"md5(array_to_string(list_transform("
        f"list_slice(sig, band * {rows} + 1, band * {rows} + {rows}), "
        f"x -> x::VARCHAR), ',')) AS k0"
    ]
    for d in range(1, resplit_depth + 1):
        lo = n_hashes + (d - 1) * resplit_lanes + 1
        hi = n_hashes + d * resplit_lanes
        key_cols.append(
            f"md5(k{d - 1} || '|' || array_to_string(list_transform("
            f"list_slice(sig, {lo}, {hi}), x -> x::VARCHAR), ',')) AS k{d}")
    counts = ",\n         ".join(
        f"count(*) OVER (PARTITION BY band, k{d}) AS c{d}"
        for d in range(resplit_depth + 1))
    depth_case = "CASE " + " ".join(
        f"WHEN c{d} <= {max_bucket} THEN {d}"
        for d in range(resplit_depth + 1)) + " ELSE NULL END"
    key_case = "CASE " + " ".join(
        f"WHEN c{d} <= {max_bucket} THEN k{d}"
        for d in range(resplit_depth + 1)) + " ELSE NULL END"
    term = " AND ".join(
        f"c{d} > {max_bucket}" for d in range(resplit_depth + 1))
    return f"""
WITH docs0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT 900000 + i AS doc_id,
         '{_MINHASH_PLANT_TEXT}' || (i % 3)::VARCHAR AS text
  FROM range({_MINHASH_PLANT_N}) r(i)
),
t AS (SELECT doc_id, {TOKS} AS t FROM docs0),
sh AS (
  SELECT doc_id, CASE WHEN len(t) >= {k}
    THEN list_transform(range(1, len(t) - {k - 2}),
                        i -> array_to_string(list_slice(t, i, i + {k - 1}), ' '))
    ELSE []::VARCHAR[] END AS shs
  FROM t
),
lanes AS (
  SELECT doc_id,
         list_transform(shs, s -> {_H1.format(x='s')}) AS h1,
         list_transform(shs, s -> {_H2.format(x='s')}) AS h2
  FROM sh
),
sig AS (
  SELECT doc_id, list_transform(range(0, {total}), i ->
    coalesce(list_min(list_transform(range(1, len(h1) + 1),
                      j -> (h1[j] + i * h2[j]) % 2147483647)),
             2147483647)) AS sig
  FROM lanes
),
keys AS (
  SELECT doc_id, band,
         {(',' + chr(10) + '         ').join(key_cols)}
  FROM sig, (SELECT unnest(range(0, {bands})) AS band) b
),
counted AS (
  SELECT *, {counts},
         min(doc_id) OVER (PARTITION BY band, k{resplit_depth}) AS hub
  FROM keys
),
asg AS (
  SELECT doc_id, band, {depth_case} AS depth, {key_case} AS keyf,
         ({term}) AS term, hub
  FROM counted
),
pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b
  FROM asg l JOIN asg r
    ON l.band = r.band AND l.depth = r.depth AND l.keyf = r.keyf
   AND l.doc_id < r.doc_id
  UNION ALL
  SELECT hub AS id_a, doc_id AS id_b FROM asg WHERE term AND doc_id > hub
)
SELECT DISTINCT id_a, id_b FROM pairs ORDER BY id_a, id_b
"""


def _simhash_sql(max_hamming: int = 10) -> str:
    ham = " + ".join(f"bit_count(xor(x.bv[{i}], y.bv[{i}]))" for i in range(1, 5))
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS t FROM documents),
lanes AS (
  SELECT doc_id,
         list_transform(t, s -> {_H1.format(x='s')}) AS lo,
         list_transform(t, s -> {_H2.format(x='s')}) AS hi
  FROM t
),
bands AS (
  SELECT doc_id, list_transform(range(0, 4), band ->
    list_sum(list_transform(range(0, 16), j ->
      CASE WHEN coalesce(list_sum(list_transform(
                   CASE WHEN band * 16 + j < 32 THEN lo ELSE hi END,
                   h -> CASE WHEN (h >> ((band * 16 + j) % 32)) & 1 = 1
                        THEN 1 ELSE -1 END)), 0) > 0
           THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT) AS bv
  FROM lanes
),
bb AS (
  SELECT doc_id, band, bv[band + 1] AS bucket
  FROM bands, (SELECT unnest(range(0, 4)) AS band) r
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bb a JOIN bb b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b, ({ham})::BIGINT AS hamming
FROM pairs p JOIN bands x ON x.doc_id = p.id_a JOIN bands y ON y.doc_id = p.id_b
WHERE ({ham}) <= {max_hamming}
ORDER BY id_a, id_b
"""


# shared CTE chain: exact n-gram Jaccard duplicate pairs (k=3 shingles,
# df cap 1000 mirroring resin_spark.dedup.jaccard_pairs, threshold 0.6);
# `jp` is the verified pair set consumed by both dedup oracles
_JACCARD_CTES = f"""t AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shs
  FROM t
),
ex0 AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
-- mirror resin_spark.dedup.jaccard_pairs' shingle document-frequency cap
-- (max_df=1000): drop stopword shingles before the inverted-index join
cold AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 1000),
ex AS (SELECT ex0.* FROM ex0 JOIN cold USING (sh)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS ni
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT id_a, id_b, round(ni / (sa.n + sb.n - ni), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ni / (sa.n + sb.n - ni) >= 0.6
)"""


def _resin_cosine_sql(token: str, k: int = 10) -> str:
    """Char-bag cosine closest-match + postings, mirroring
    resin_score.cosine_expr's float64 op tree exactly: the dot is a sum
    of exact small-integer products (bit-identical across engines), the
    argmax tie-break is (cos, ck) descending like Spark's
    max(struct(cos, key))."""
    import math
    from collections import Counter

    bag = Counter(token)
    qn = math.sqrt(sum(v * v for v in bag.values()))
    dot = " + ".join(
        f"{float(v)!r}::DOUBLE * "
        f"(length(ck) - length(replace(ck, '{c}', '')))::DOUBLE"
        for c, v in sorted(bag.items())
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
terms AS (SELECT DISTINCT term FROM toks),
cks AS (
  SELECT DISTINCT
         array_to_string(list_sort(regexp_extract_all(term, '.')), '') AS ck
  FROM terms
),
scored AS (
  SELECT ck,
         ({dot}) / (sqrt(list_aggregate(list_transform(
             list_distinct(regexp_extract_all(ck, '.')),
             c -> pow((length(ck) - length(replace(ck, c, '')))::DOUBLE, 2)),
             'sum')) * {qn!r}) AS cos
  FROM cks
),
best AS (SELECT ck, cos FROM scored ORDER BY cos DESC, ck DESC LIMIT 1),
match_docs AS (
  SELECT DISTINCT t.doc_id
  FROM toks t, best b
  WHERE array_to_string(list_sort(regexp_extract_all(t.term, '.')), '') = b.ck
)
SELECT doc_id, round((SELECT cos FROM best), 4) AS score
FROM match_docs
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _planes_literal(dim: int, n_planes: int, tag: str = "plane") -> str:
    from resin_spark.similarity import int_planes

    rows = int_planes(dim, n_planes, tag=tag)
    return "[" + ", ".join("[" + ", ".join(str(v) for v in p) + "]" for p in rows) + "]"


_QUANT_SQL = "list_transform(embedding, x -> floor(x::DOUBLE*1024 + 0.5)::BIGINT)"
_IDOT = ("list_sum(list_transform(list_zip(q, planes[{i}]), "
         "z -> z[1] * z[2]))")
_FNORM = ("sqrt(list_aggregate(list_transform(embedding, "
          "x -> x::DOUBLE * x::DOUBLE), 'sum'))")


def _ann_sql(dim: int = 64, n_planes: int = 6, k: int = 10) -> str:
    bucket = " + ".join(
        f"(CASE WHEN {_IDOT.format(i=i + 1)} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
WITH pl AS (SELECT {_planes_literal(dim, n_planes)} AS planes),
v AS (
  SELECT vec_id, embedding, {_QUANT_SQL} AS q, {_FNORM} AS nrm
  FROM embeddings
),
bk AS (SELECT vec_id, embedding, nrm, ({bucket})::BIGINT AS bucket FROM v, pl),
qv AS (SELECT embedding AS qe, nrm AS qn, bucket AS qb FROM bk WHERE vec_id = 0),
cand AS (
  SELECT vec_id,
         list_aggregate(list_transform(list_zip(embedding, (SELECT qe FROM qv)),
                        z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
           / (nrm * (SELECT qn FROM qv)) AS cosine
  FROM bk WHERE bit_count(xor(bucket, (SELECT qb FROM qv))) <= 1
)
SELECT vec_id, round(cosine, 4) AS cosine FROM cand
ORDER BY round(cosine, 4) DESC, vec_id ASC LIMIT {k}
"""


def _neardup_sql(dim: int = 64, n_planes: int = 16, bands: int = 4,
                 threshold: float = 0.4, max_bucket: int = 2000,
                 resplit_bits: int = 4, resplit_depth: int = 2) -> str:
    """Mirror of similarity.cosine_neardup_pairs incl. the over-cap
    re-split (nested keys k0..kD, first under-cap level wins) and the
    terminal hub-pair fallback — all window functions, independently
    written DuckDB SQL."""
    bits = n_planes // bands
    rb = resplit_bits
    band_bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip(q, planes[band*{bits}+{j + 1}]), "
        f"z -> z[1] * z[2])) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    rs_lits = ", ".join(
        f"{_planes_literal(dim, bands * rb, tag=f'rs{d}_')} AS rs{d}"
        for d in range(resplit_depth)
    )
    sub_cols = ", ".join(
        "(" + " + ".join(
            f"(CASE WHEN list_sum(list_transform(list_zip(q, rs{d}[band*{rb}+{j + 1}]), "
            f"z -> z[1] * z[2])) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(rb)
        ) + f")::BIGINT AS s{d}"
        for d in range(resplit_depth)
    )
    kexpr = "k0"
    kk_cols = ["k0"]
    for d in range(resplit_depth):
        kexpr = f"({kexpr}*{1 << rb} + s{d})"
        kk_cols.append(f"{kexpr} AS k{d + 1}")
    levels = list(range(resplit_depth + 1))
    cnt_cols = ", ".join(
        f"count(*) OVER (PARTITION BY band, k{d}) AS c{d}" for d in levels
    )
    depth_case = " ".join(
        f"WHEN c{d} <= {max_bucket} THEN {d}" for d in levels)
    key_case = " ".join(
        f"WHEN c{d} <= {max_bucket} THEN k{d}" for d in levels)
    term_cond = " AND ".join(f"c{d} > {max_bucket}" for d in levels)
    last = resplit_depth
    return f"""
WITH pl AS (SELECT {_planes_literal(dim, n_planes)} AS planes, {rs_lits}),
v AS (
  SELECT vec_id, embedding, {_QUANT_SQL} AS q, {_FNORM} AS nrm
  FROM embeddings
),
bb AS (
  SELECT vec_id, band, ({band_bucket})::BIGINT AS k0, {sub_cols}
  FROM v, pl, (SELECT unnest(range(0, {bands})) AS band) r
),
kk AS (SELECT vec_id, band, {", ".join(kk_cols)} FROM bb),
cc AS (
  SELECT vec_id, band, {", ".join(f"k{d}" for d in levels)}, {cnt_cols},
         min(vec_id) OVER (PARTITION BY band, k{last}) AS hub
  FROM kk
),
asg AS (
  SELECT vec_id, band,
         CASE {depth_case} END AS depth,
         CASE {key_case} END AS keyf,
         ({term_cond}) AS term, hub
  FROM cc
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM asg a JOIN asg b
      ON a.band = b.band AND a.depth = b.depth AND a.keyf = b.keyf
     AND a.vec_id < b.vec_id
    UNION ALL
    SELECT hub AS id_a, vec_id AS id_b FROM asg WHERE term AND vec_id > hub
  )
),
cos AS (
  SELECT id_a, id_b,
         list_aggregate(list_transform(list_zip(x.embedding, y.embedding),
                        z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
           / (x.nrm * y.nrm) AS cosine
  FROM cand JOIN v x ON x.vec_id = id_a JOIN v y ON y.vec_id = id_b
)
SELECT id_a, id_b, round(cosine, 4) AS cosine FROM cos
WHERE cosine >= {threshold} ORDER BY id_a, id_b
"""


# derived from the ONE source of truth (textops.STOPWORDS) so the SQL
# oracle can never drift from the Spark implementation
from resin_spark.textops import STOPWORDS as _STOPWORDS  # noqa: E402

_STOP = {
    lang: "(" + ",".join(f"'{w}'" for w in words) + ")"
    for lang, words in _STOPWORDS.items()
}
_LANG_HITS = ", ".join(
    f"len(list_filter({TOKS}, x -> x IN {words})) AS {lang}"
    for lang, words in _STOP.items()
)
# first-argmax tie-break, mirroring lang_id_col's strict-> replacement:
# language i wins iff its score > 0, strictly beats every EARLIER
# language and ties-or-beats every LATER one
_langs = list(_STOP)
_LANG_CASE = "CASE " + "\n     ".join(
    f"WHEN {l} > 0"
    + "".join(f" AND {l} > {m}" for m in _langs[:i])
    + "".join(f" AND {l} >= {m}" for m in _langs[i + 1:])
    + f" THEN '{l}'"
    for i, l in enumerate(_langs)
) + "\n     ELSE 'und' END"


def oracle_sql() -> dict[str, str]:
    return {
        "ft_doc_count": "SELECT count(*)::BIGINT AS n_docs FROM documents",
        "ft_scan_page": (
            "SELECT doc_id, source, n_chars FROM documents "
            "ORDER BY doc_id OFFSET 10 LIMIT 5"
        ),
        "ft_point_fetch": (
            "SELECT doc_id, text, n_chars FROM documents WHERE doc_id = 42"
        ),
        "ft_term_df": (
            SQL_PRELUDE
            + "SELECT term, df FROM dfreq ORDER BY df DESC, term ASC LIMIT 20"
        ),
        "ft_term_tf": (
            SQL_PRELUDE
            + "SELECT doc_id, tf FROM tf WHERE term = 'spark' "
            "ORDER BY tf DESC, doc_id ASC LIMIT 20"
        ),
        "ft_chars_key": (
            SQL_PRELUDE
            + """
SELECT array_to_string(list_sort(regexp_extract_all(term, '.')), '') AS chars_key,
       count(*)::BIGINT AS n_terms,
       array_to_string(list_sort(list(term)), ',') AS terms
FROM (SELECT DISTINCT term FROM toks)
GROUP BY 1 ORDER BY n_terms DESC, chars_key ASC LIMIT 20
"""
        ),
        "dedup_exact": f"""
WITH fps AS (
  SELECT doc_id, md5(array_to_string({TOKS}, ' ')) AS fp FROM documents
)
SELECT fp, count(*)::BIGINT AS n_dups, min(doc_id) AS keep_id
FROM fps GROUP BY fp HAVING count(*) > 1 ORDER BY fp
""",
        "dedup_first_seen": f"""
WITH fps AS (
  SELECT doc_id, md5(array_to_string({TOKS}, ' ')) AS fp FROM documents
)
SELECT fp, min(doc_id) AS keep_id, (count(*) - 1)::BIGINT AS batch_dups
FROM fps GROUP BY fp ORDER BY fp
""",
        "text_tok_counts": f"""
SELECT doc_id,
       len({TOKS})::BIGINT AS n_tok,
       len(regexp_extract_all(text, '\\p{{L}}+|\\p{{N}}+|[^\\p{{L}}\\p{{N}}\\s]'))::BIGINT AS n_bpe
FROM documents ORDER BY doc_id LIMIT 50
""",
        "text_quality": f"""
SELECT doc_id,
       len({TOKS})::BIGINT AS n_tokens,
       round(len(list_filter({TOKS}, x -> x IN {_STOP['en']}))
             / len({TOKS}), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))
             / length(text), 6) AS punct_ratio
FROM documents ORDER BY doc_id LIMIT 50
""",
        "text_langid": f"""
WITH hits AS (SELECT doc_id, {_LANG_HITS} FROM documents),
langs AS (SELECT {_LANG_CASE} AS lang FROM hits)
SELECT lang, count(*)::BIGINT AS n FROM langs GROUP BY lang
ORDER BY n DESC, lang ASC
""",
        # tumbling windows align to the epoch in both engines; session
        # boundaries compare MICROSECOND integers (epoch_us), the same
        # exact arithmetic session_window uses internally
        "stream_window_counts": """
SELECT ((epoch_us(ts) // 3600000000) * 3600)::BIGINT AS win_start,
       event_type, count(*)::BIGINT AS n
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type
""",
        "stream_sessions": """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
m AS (
  SELECT user_id, ts,
         CASE WHEN prev IS NULL
                   OR epoch_us(ts) - epoch_us(prev) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, (epoch_us(min(ts)) // 1000000)::BIGINT AS sess_start,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start
""",
        # Gopher rules: identical expression trees (exact-int numerators,
        # one double division) so ratios are bit-equal before round(6)
        "text_pack_sequences": f"""
WITH d AS (
  SELECT doc_id, lang, len({TOKS})::BIGINT AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS tape_pos
  FROM d
)
SELECT doc_id, lang, n_tokens, tape_pos,
       (tape_pos // 256)::BIGINT AS start_pack,
       (tape_pos % 256)::BIGINT AS start_offset,
       ((tape_pos + greatest(n_tokens, 1) - 1) // 256)::BIGINT AS end_pack
FROM c ORDER BY lang, doc_id
""",
        "text_stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'|'||'s0'),1,8))::BIGINT
      % 1000000
      < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                  ELSE 100000 END
ORDER BY doc_id
""",
        "text_topk_ngrams": f"""
WITH t AS (SELECT {TOKS} AS toks FROM documents),
g AS (
  SELECT array_to_string(toks[CAST(i AS BIGINT):CAST(i AS BIGINT)+1],
                         ' ') AS ngram
  FROM t, UNNEST(range(1, len(toks) - 2 + 2)) AS u(i)
)
SELECT ngram, count(*)::BIGINT AS cnt FROM g GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 20
""",
        "text_gopher": f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     w -> w <> '') AS words,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\n'),
                     l -> trim(l) <> '') AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    len(words)::BIGINT AS g_n_words,
    CASE WHEN len(words) > 0 THEN
      list_aggregate(list_transform(words, w -> length(w)), 'sum')::DOUBLE
        / len(words) ELSE 0.0 END AS mw,
    CASE WHEN len(words) > 0 THEN (
        (length(t) - length(replace(t, '#', '')))
        + (length(t) - length(replace(t, '...', ''))) / 3
        + (length(t) - length(replace(t, '{chr(8230)}', '')))
      )::DOUBLE / len(words) ELSE 0.0 END AS sr,
    CASE WHEN len(lines) > 0 THEN
      len(list_filter(lines, l -> starts_with(trim(l), '-')
          OR starts_with(trim(l), '*')
          OR starts_with(trim(l), '{chr(8226)}')))::DOUBLE / len(lines)
      ELSE 0.0 END AS bf,
    CASE WHEN len(words) > 0 THEN
      len(list_filter(words, w -> regexp_matches(w, '\\p{{L}}')))::DOUBLE
        / len(words) ELSE 0.0 END AS af,
    len(list_filter({TOKS}, x -> x IN {_STOP['en']}))::BIGINT AS g_stop_hits
  FROM base JOIN documents USING (doc_id)
)
SELECT doc_id, g_n_words,
       round(mw, 6) AS g_mean_word_len,
       round(sr, 6) AS g_symbol_ratio,
       round(bf, 6) AS g_bullet_frac,
       round(af, 6) AS g_alpha_frac,
       g_stop_hits,
       (g_n_words >= 50 AND g_n_words <= 100000
        AND mw >= 3.0 AND mw <= 10.0 AND sr < 0.1 AND bf < 0.9
        AND af > 0.8 AND g_stop_hits >= 2) AS gopher_pass
FROM m ORDER BY doc_id
""",
        "text_fingerprint": f"""
SELECT doc_id, md5(array_to_string({TOKS}, ' ')) AS fp
FROM documents ORDER BY doc_id LIMIT 50
""",
        "ft_engine_topk": _bm25_topk_sql("spark"),
        "ft_engine_and": _bm25_and_sql("spark", "query"),
        "text_pii_redact": r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@ex.org ip 10.0.'
              || (doc_id % 256) || '.7 tel 555-010-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
  FROM documents
),
r1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '[EMAIL]', 'g') AS text
  FROM planted
),
r2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
         regexp_replace(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS text
  FROM r1
)
SELECT doc_id, n_email, n_ip,
       len(regexp_extract_all(text,
           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))::BIGINT AS n_phone,
       md5(regexp_replace(text,
           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '[PHONE]', 'g')) AS red_fp
FROM r2 ORDER BY doc_id
""",
        "text_url_dedup": r"""
WITH urls AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'http://www.' END)
         || source || '.Example.COM:80/p/' || (doc_id % 25)
         || '/?utm_source=u' || doc_id || '&q=1#frag' || doc_id AS url
  FROM documents
),
norm AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
    || regexp_replace(regexp_replace(
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
         '^www\.', ''), ':(80|443)$', '')
    || regexp_replace(
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
         '/$', '')
    || CASE WHEN len(params) > 0
            THEN '?' || array_to_string(params, '&') ELSE '' END AS norm_url
  FROM (
    SELECT doc_id, url,
           list_sort(list_filter(str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
             p -> p <> '' AND NOT regexp_matches(p,
                  '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)='))) AS params
    FROM urls
  )
)
SELECT norm_url, count(*)::BIGINT AS n_dups, min(doc_id) AS keep_id
FROM norm GROUP BY norm_url HAVING count(*) > 1 ORDER BY norm_url
""",
        "dedup_chunks_apply": f"""
WITH planted AS (
  SELECT doc_id,
         repeat('shared' || (doc_id % 7) || ' ', 10) || text AS text
  FROM documents
),
tk AS (SELECT doc_id, {TOKS} AS toks FROM planted),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ') AS chunk
  FROM tk, unnest(range((len(toks) + 9) // 10)) AS t(i)
  WHERE len(toks) > 0
),
marked AS (
  SELECT doc_id, chunk_idx, chunk,
         count(*) OVER (PARTITION BY md5(chunk)) AS n_occ,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
)
SELECT d.doc_id,
       md5(coalesce(m.clean_text, '')) AS clean_fp,
       coalesce(m.n_chunks, 0)::BIGINT AS n_chunks,
       coalesce(m.n_removed, 0)::BIGINT AS n_removed
FROM documents d LEFT JOIN (
  SELECT doc_id,
         string_agg(CASE WHEN NOT (n_occ > 1 AND rn > 1) THEN chunk END,
                    ' ' ORDER BY chunk_idx) AS clean_text,
         count(*)::BIGINT AS n_chunks,
         sum(CASE WHEN n_occ > 1 AND rn > 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_removed
  FROM marked GROUP BY doc_id
) m USING (doc_id)
ORDER BY d.doc_id
""",
        "text_decontam": f"""
WITH tk AS (SELECT doc_id, {TOKS} AS toks FROM documents),
doc_grams AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS gram
  FROM tk, unnest(range(len(toks) - 2)) AS t(i)
  WHERE len(toks) >= 3
),
bench_grams AS (
  SELECT DISTINCT gram FROM doc_grams WHERE doc_id IN (7, 123)
),
hits AS (
  SELECT doc_id, count(DISTINCT gram)::BIGINT AS n_hits
  FROM (SELECT DISTINCT doc_id, gram FROM doc_grams) g
  JOIN bench_grams USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
""",
        "ft_snippets": SQL_PRELUDE + f"""
, top AS (
  SELECT doc_id, round(score, 6) AS score FROM scores WHERE term = 'spark'
  ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
),
sn AS (
  SELECT d.doc_id, {TOKS} AS tk,
         list_aggregate(list_filter(list_transform(range(len({TOKS})),
             i -> CASE WHEN {TOKS}[i + 1] = 'spark' THEN i END),
             x -> x IS NOT NULL), 'min') AS first
  FROM documents d JOIN top USING (doc_id)
)
SELECT top.doc_id, top.score,
       CASE WHEN sn.first IS NOT NULL
            THEN array_to_string(list_slice(sn.tk,
                 greatest(sn.first - 3, 0) + 1,
                 greatest(sn.first - 3, 0) + 7), ' ')
            ELSE '' END AS snippet
FROM top JOIN sn USING (doc_id)
ORDER BY top.score DESC, top.doc_id ASC
""",
        "pipeline_clean": f"""
WITH eff AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 1 THEN doc_id - 1 ELSE doc_id END AS eff_id
  FROM documents
),
planted AS (
  SELECT e.doc_id,
         repeat('shared' || (d.doc_id % 7) || ' ', 10) || d.text
         || ' contact u' || (d.doc_id % 25) || '@ex.org' AS text
  FROM eff e JOIN documents d ON d.doc_id = e.eff_id
),
red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
             '[EMAIL]', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
             '[IP]', 'g'),
             '\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b', '[PHONE]', 'g')
           AS text
  FROM planted
),
tk AS (SELECT doc_id, {TOKS} AS toks FROM red),
owners AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(array_to_string(toks, ' ')) AS f FROM tk)
  GROUP BY f
),
surv AS (SELECT tk.doc_id, tk.toks FROM tk JOIN owners USING (doc_id)),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ') AS chunk
  FROM surv, unnest(range((len(toks) + 9) // 10)) AS t(i)
  WHERE len(toks) > 0
),
marked AS (
  SELECT doc_id, chunk_idx, chunk,
         count(*) OVER (PARTITION BY md5(chunk)) AS n_occ,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(
             CASE WHEN NOT (n_occ > 1 AND rn > 1) THEN chunk END,
             ' ' ORDER BY chunk_idx), '') AS clean_text,
         count(*)::BIGINT AS n_chunks,
         sum(CASE WHEN n_occ > 1 AND rn > 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_removed
  FROM marked GROUP BY doc_id
),
bench AS (
  SELECT DISTINCT array_to_string(list_slice(toks, i + 1, i + 5), ' ') AS gram
  FROM (SELECT {TOKS} AS toks FROM documents WHERE doc_id = 7),
       unnest(range(len(toks) - 4)) AS t(i)
),
contaminated AS (
  SELECT DISTINCT doc_id
  FROM (
    SELECT a.doc_id,
           array_to_string(list_slice(ct, i + 1, i + 5), ' ') AS gram
    FROM (SELECT doc_id,
                 list_filter(str_split(clean_text, ' '), x -> x <> '') AS ct
          FROM agg) a,
         unnest(range(len(ct) - 4)) AS t(i)
  ) g JOIN bench USING (gram)
)
SELECT a.doc_id, md5(a.clean_text) AS clean_fp, a.n_chunks, a.n_removed
FROM agg a ANTI JOIN contaminated c USING (doc_id)
ORDER BY a.doc_id
""",
        "events_gap_stats": """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       (max(us) - min(us))::BIGINT AS span_us,
       max(gap)::BIGINT AS max_gap_us
FROM g GROUP BY user_id ORDER BY user_id
""",
        "events_transitions": """
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, count(*)::BIGINT AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type ORDER BY event_type, next_type
""",
        "events_props_agg": """
SELECT event_type, count(*)::BIGINT AS n,
       sum(coalesce(json_extract_string(props, '$.k')::BIGINT, 0))::BIGINT
         AS sum_val
FROM events GROUP BY event_type ORDER BY event_type
""",
        "ft_engine_phrase": SQL_PRELUDE + f"""
, phrase_docs AS (
  SELECT doc_id FROM documents
  WHERE strpos(' ' || array_to_string({TOKS}, ' ') || ' ',
               ' spark table ') > 0
)
SELECT a.doc_id, round(a.score + b.score, 6) AS score
FROM scores a JOIN scores b USING (doc_id) JOIN phrase_docs USING (doc_id)
WHERE a.term = 'spark' AND b.term = 'table'
ORDER BY round(a.score + b.score, 6) DESC, a.doc_id ASC LIMIT 10
""",
        "ft_engine_not": _bm25_not_sql("spark", "window"),
        "ft_engine_stats": SQL_PRELUDE + "SELECT n_docs, total_tokens, avgdl FROM st",
        "ft_engine_paged": (
            SQL_PRELUDE
            + "SELECT doc_id, round(score, 6) AS score FROM scores "
            "WHERE term = 'table' "
            "ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10 OFFSET 5"
        ),
        "ft_engine_multifield": SQL_PRELUDE + f"""
, ltoks AS (
  SELECT doc_id, unnest({TOKS.replace('text', 'lang')}) AS term FROM documents
),
ltf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ltoks GROUP BY 1, 2),
ldl AS (SELECT doc_id, len({TOKS.replace('text', 'lang')})::BIGINT AS dl
        FROM documents),
lst AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
         sum(dl)::BIGINT / (SELECT count(*) FROM documents)::BIGINT AS avgdl
  FROM ldl
),
ldf AS (SELECT term, count(*)::BIGINT AS df FROM ltf GROUP BY 1),
lscores AS (
  SELECT ltf.term, ltf.doc_id,
         ln(1.0 + (lst.n_docs - ldf.df + 0.5) / (ldf.df + 0.5))
           * (ltf.tf / (ltf.tf + 1.2 * (0.25 + 0.75 * ldl.dl / lst.avgdl))) AS score
  FROM ltf JOIN ldl USING (doc_id) JOIN ldf USING (term) CROSS JOIN lst
)
SELECT a.doc_id, round(a.score + b.score, 6) AS score
FROM (SELECT doc_id, score FROM lscores WHERE term = 'en') a
JOIN (SELECT doc_id, score FROM scores WHERE term = 'spark') b USING (doc_id)
ORDER BY round(a.score + b.score, 6) DESC, a.doc_id ASC LIMIT 10
""",
        "ft_wand_topk": (
            SQL_PRELUDE
            + """
SELECT doc_id, round(sum(score), 6) AS score FROM scores
WHERE term IN ('spark', 'table') GROUP BY doc_id
ORDER BY round(sum(score), 6) DESC, doc_id ASC LIMIT 10
"""
        ),
        "ft_resin_cosine": _resin_cosine_sql("applw", k=10),
        "ft_bm25_charbag": f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
ck AS (
  SELECT doc_id,
         array_to_string(list_sort(regexp_extract_all(term, '.')), '') AS k
  FROM toks
),
tf AS (
  SELECT doc_id, count(*)::BIGINT AS tf FROM ck
  WHERE k = array_to_string(list_sort(regexp_extract_all('spark', '.')), '')
  GROUP BY doc_id
),
dl AS (SELECT doc_id, len({TOKS})::BIGINT AS dl FROM documents),
st AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(dl)::BIGINT / count(*)::BIGINT AS avgdl
  FROM dl
),
nm AS (SELECT count(*)::BIGINT AS df FROM tf)
SELECT tf.doc_id,
       round(ln(1.0 + (st.n_docs - nm.df + 0.5) / (nm.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 6)
         AS score
FROM tf JOIN dl USING (doc_id) CROSS JOIN st CROSS JOIN nm
ORDER BY score DESC, tf.doc_id ASC LIMIT 10
""",
        "dedup_ngram_jaccard": f"""
WITH {_JACCARD_CTES}
SELECT id_a, id_b, jaccard FROM jp ORDER BY id_a, id_b
""",
        # components over the same verified pairs: transitive closure by
        # recursive CTE, component = min reachable doc_id (algorithm-
        # independent twin of dedup.connected_components' star forest)
        "dedup_components": f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT id_a AS a, id_b AS b FROM jp
  UNION SELECT id_b, id_a FROM jp
),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
)
SELECT a AS doc_id, min(b) AS component, (a = min(b)) AS keep
FROM reach GROUP BY a ORDER BY doc_id
""",
        "dedup_minhash_pairs": _minhash_sql(n_hashes=16, bands=8, k=3,
                                            max_bucket=6, resplit_lanes=4,
                                            resplit_depth=2),
        "dedup_simhash_pairs": _simhash_sql(max_hamming=10),
        "emb_ann_topk": _ann_sql(dim=64, n_planes=6, k=10),
        "emb_ann_bucketed": _ann_sql(dim=64, n_planes=6, k=10),
        "dedup_emb_neardup": _neardup_sql(dim=64, n_planes=16, bands=4,
                                          threshold=0.4, max_bucket=2000),
        "emb_knn_join": """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
c AS (
  SELECT q.q_id, e.vec_id AS n_id,
         round(
           list_aggregate(list_transform(list_zip(e.embedding, q.qv),
                          z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
           / (sqrt(list_aggregate(list_transform(e.embedding,
                          x -> x::DOUBLE * x::DOUBLE), 'sum'))
              * sqrt(list_aggregate(list_transform(q.qv,
                          x -> x::DOUBLE * x::DOUBLE), 'sum'))), 6) AS cosine
  FROM embeddings e CROSS JOIN q
),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, n_id ASC) AS rank
      FROM c)
SELECT q_id, n_id, cosine, rank::BIGINT AS rank
FROM r WHERE rank <= 5 ORDER BY q_id, rank
""",
        "emb_cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT vec_id,
         list_aggregate(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                        z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
         / (sqrt(list_aggregate(list_transform(embedding,
                        x -> x::DOUBLE * x::DOUBLE), 'sum'))
            * sqrt((SELECT list_aggregate(list_transform(qv,
                        x -> x::DOUBLE * x::DOUBLE), 'sum') FROM q))) AS cosine
  FROM embeddings
)
SELECT vec_id, round(cosine, 4) AS cosine FROM c
ORDER BY round(cosine, 4) DESC, vec_id ASC LIMIT 10
""",
        # full-probe IVF == exact cosine ranking (see _q_ivf_topk): the
        # oracle is the exact scorer over query vec_id=1
        "emb_ivf_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
c AS (
  SELECT vec_id,
         list_aggregate(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                        z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
         / (sqrt(list_aggregate(list_transform(embedding,
                        x -> x::DOUBLE * x::DOUBLE), 'sum'))
            * sqrt((SELECT list_aggregate(list_transform(qv,
                        x -> x::DOUBLE * x::DOUBLE), 'sum') FROM q))) AS cosine
  FROM embeddings
)
SELECT vec_id, round(cosine, 4) AS cosine FROM c
ORDER BY round(cosine, 4) DESC, vec_id ASC LIMIT 10
""",
        # (avg(3a, a - reverse(a))) summed ascending-dim — the same
        # float64 op tree as the Spark map HOFs in _q_vec_arith
        "vec_sparse_arith": """
WITH e AS (
  SELECT vec_id, embedding AS a, list_reverse(embedding) AS b
  FROM embeddings
)
SELECT vec_id,
       round(list_aggregate(list_transform(range(1, len(a) + 1),
             i -> (3.0 * a[i]::DOUBLE
                   + (a[i]::DOUBLE - b[i]::DOUBLE)) / 2.0), 'sum'),
             4) AS comp_sum
FROM e ORDER BY vec_id
""",
        # CBOW invariant: char-bag components sum to token length, so a
        # position contributes len(left)+len(right), or len(token) when
        # neighbourless (single-token doc)
        "text_cbow": f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT doc_id, len(toks)::BIGINT AS n_vecs,
  (CASE WHEN len(toks) = 0 THEN 0
        WHEN len(toks) = 1 THEN length(toks[1])
        ELSE list_aggregate(list_transform(range(1, len(toks) + 1),
             i -> (CASE WHEN i > 1 THEN length(toks[i - 1]) ELSE 0 END)
                + (CASE WHEN i < len(toks) THEN length(toks[i + 1])
                   ELSE 0 END)), 'sum')
   END)::BIGINT AS comp_sum
FROM t ORDER BY doc_id
""",
        "vec_classify": """
WITH tr AS (SELECT embedding, label FROM embeddings WHERE vec_id < 250),
te AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 250),
sc AS (
  SELECT te.vec_id, tr.label,
         list_aggregate(list_transform(list_zip(te.embedding, tr.embedding),
                        z -> z[1]::DOUBLE * z[2]::DOUBLE), 'sum')
         / (sqrt(list_aggregate(list_transform(te.embedding,
                        x -> x::DOUBLE * x::DOUBLE), 'sum'))
            * sqrt(list_aggregate(list_transform(tr.embedding,
                        x -> x::DOUBLE * x::DOUBLE), 'sum'))) AS cos
  FROM te CROSS JOIN tr
),
best AS (
  SELECT vec_id, label AS pred_label, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, label DESC) AS rn
  FROM sc
)
SELECT vec_id, pred_label, round(cos, 4) AS cos
FROM best WHERE rn = 1 ORDER BY vec_id
""",
    }
