"""Training-data ops: dedup suite + text analysis + similarity search.
Spark implementations are checked against pure-Python twins on a
deterministic corpus with planted duplicates."""

import math

import pytest
from pyspark.sql import functions as F

from resin_spark import dedup, similarity, textops
from resin_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick brown fox jumps over the lazy dog!"),   # exact dup of 0 (normalized)
        (2, "the quick brown fox jumps over the lazy cat"),    # near dup of 0
        (3, "completely different content about spark engines"),
        (4, "spark engines process completely different content"),
        (5, "der hund und die katze sind zu haus"),            # German stopwords
        (6, "el perro y la gata es que en un una"),            # Spanish stopwords
        (7, "a tiny one"),
        (8, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 3 and g["keep_id"] == 0
    assert g["dup_ids"] == [0, 1, 8]
    kept = dedup.exact_dedup(docs).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 2, 3, 4, 5, 6, 7]


def test_shingles_parity(spark, docs):
    rows = docs.select("doc_id", dedup.shingles_col("text", 3).alias("sh")).collect()
    for r in rows:
        want = dedup.shingles_py(
            [t for d, t in [(x["doc_id"], x["text"]) for x in docs.collect()]
             if d == r["doc_id"]][0], 3)
        assert r["sh"] == want


def test_minhash_signature_parity(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = docs.select(
        "doc_id", dedup.minhash_signature_col("text", 16, 3).alias("sig")
    ).collect()
    for r in rows:
        assert r["sig"] == dedup.minhash_signature_py(texts[r["doc_id"]], 16, 3)


def test_minhash_lsh_finds_neardups(spark, docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.minhash_candidates(docs, n_hashes=16, bands=8).collect()}
    assert (0, 1) in pairs and (0, 8) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs   # near dup shares most shingles
    assert (0, 3) not in pairs


def test_jaccard_pairs(spark, docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0 and got[(0, 8)] == 1.0
    # doc2 differs in last token: shingles 7, shared 6 => j = 6/8
    assert math.isclose(got[(0, 2)], 6 / 8, abs_tol=1e-12)
    assert (0, 3) not in got
    # candidates path gives the same result on the same threshold
    cand = dedup.minhash_candidates(docs, n_hashes=16, bands=8)
    got2 = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_pairs(docs, k=3, threshold=0.5,
                                          candidates=cand).collect()}
    assert got2[(0, 1)] == 1.0
    assert set(got2) <= set(got)


def test_jaccard_df_cap_bounds_hot_shingles(spark):
    """One stopword shingle shared by every doc must not create O(n^2)
    pairs: with max_df the hot shingle is dropped before the self-join,
    while pairs backed by cold shingles survive."""
    near_a = "alpha beta gamma delta epsilon zeta eta theta"
    near_b = "alpha beta gamma delta epsilon zeta eta iota"
    hot = [(i, f"aaa bbb ccc x{i}") for i in range(2, 12)]
    df = spark.createDataFrame(
        [(0, near_a), (1, near_b)] + hot, "doc_id long, text string"
    )
    uncapped = {(r["id_a"], r["id_b"])
                for r in dedup.jaccard_pairs(df, k=3, threshold=0.3,
                                             max_df=None).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in dedup.jaccard_pairs(df, k=3, threshold=0.3,
                                           max_df=3).collect()}
    # hot docs pair up without the cap (share 'aaa bbb ccc', j = 1/3)...
    assert sum(1 for a, b in uncapped if a >= 2 and b >= 2) == 45
    # ...and are gone with it, while the genuine near-dup pair survives
    assert all(a < 2 or b < 2 for a, b in capped)
    assert (0, 1) in capped and (0, 1) in uncapped


def test_neardup_bucket_cap_bounds_dense_bucket(spark):
    """A degenerate corpus (30 identical vectors, cap 10) stays BOUNDED
    but is no longer silently dropped: identical vectors agree with every
    re-split plane, so the terminal bucket emits hub pairs — (min id,
    member), 29 pairs at cosine 1.0 — keeping the cluster connected at
    O(n) cost (the round-2 drop policy returned the empty set here)."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in similarity.cosine_neardup_pairs(
                 df, threshold=0.9, n_planes=16, bands=4, max_bucket=10,
                 dim=4).collect()}
    assert set(pairs) == {(0, i) for i in range(1, 30)}
    assert all(math.isclose(c, 1.0, abs_tol=1e-9) for c in pairs.values())
    stats = similarity.neardup_bucket_stats(df, n_planes=16, bands=4,
                                            dim=4).collect()
    assert all(r["n"] == 30 for r in stats) and len(stats) == 4
    # with a sane cap the identical vectors pair up fully
    ok = similarity.cosine_neardup_pairs(
        df, threshold=0.9, n_planes=16, bands=4, max_bucket=1000, dim=4
    ).count()
    assert ok == 30 * 29 / 2


def test_neardup_resplit_separates_diverse_dense_buckets(spark):
    """Three tight clusters, each bigger than the cap: re-split levels or
    hub pairs must keep every cluster internally connected, with zero
    cross-cluster pairs — recall does not collapse to 0 the way the
    drop-over-cap policy did.  Verified against brute-force components."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((3, 16)).astype("float32") * 4.0
    rows = []
    for ci in range(3):
        for j in range(40):
            v = centers[ci] + rng.standard_normal(16).astype("float32") * 0.05
            rows.append((ci * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = [(r["id_a"], r["id_b"])
             for r in similarity.cosine_neardup_pairs(
                 df, threshold=0.99, n_planes=16, bands=4, max_bucket=15,
                 dim=16).collect()]
    assert pairs, "dense clusters must not be dropped"
    assert all(a // 100 == b // 100 for a, b in pairs)
    # union-find over returned pairs: each 40-member cluster stays whole
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps = {}
    for i, _ in rows:
        comps.setdefault(find(i), set()).add(i)
    assert sorted(len(c) for c in comps.values()) == [40, 40, 40]


def test_neardup_bucketed_layout_parity(spark, tmp_path, embeddings):
    """cosine_neardup_pairs_bucketed over the materialized layout returns
    exactly the inline operator's pairs (keys come from storage)."""
    df, _ = embeddings
    root = str(tmp_path / "emb_layout")
    similarity.write_bucketed_embeddings(df, root, dim=8)
    inline = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
              for r in similarity.cosine_neardup_pairs(
                  df, threshold=0.95, dim=8).collect()}
    stored = {(r["id_a"], r["id_b"], round(r["cosine"], 9))
              for r in similarity.cosine_neardup_pairs_bucketed(
                  spark, root, threshold=0.95).collect()}
    assert stored == inline and inline


def test_ann_bucketed_partition_pruning_and_parity(spark, tmp_path, embeddings):
    """The materialized-layout ANN path must (a) return the inline
    ann_topk results and (b) PRUNE: the probe filter lands on the bucket
    partition column — PartitionFilters in the plan, and every file the
    scan touches lives under a probed bucket directory."""
    import os

    df, vecs = embeddings
    root = str(tmp_path / "emb_layout_ann")
    similarity.write_bucketed_embeddings(df, root, n_planes=6, dim=8)
    q = [float(x) for x in vecs[0]]
    inline = [(r["vec_id"], round(r["cosine"], 9))
              for r in similarity.ann_topk(df, q, k=5, n_planes=6).collect()]
    got_df = similarity.ann_topk_bucketed(spark, root, q, k=5)
    got = [(r["vec_id"], round(r["cosine"], 9)) for r in got_df.collect()]
    assert got == inline and got

    planes = similarity.int_planes(8, 6)
    probes = set(similarity.ann_probes(q, planes))
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # behavioral gate: files actually read ⊂ probed bucket dirs
    cand = (
        spark.read.parquet(os.path.join(root, "data"))
        .filter(F.col("bucket").isin(sorted(probes)))
    )
    touched = [r[0] for r in
               cand.select(F.input_file_name()).distinct().collect()]
    assert touched, "probed buckets must exist on disk"
    for path in touched:
        b = int(path.split("bucket=")[1].split("/")[0])
        assert b in probes
    all_buckets = {int(d.split("=")[1])
                   for d in os.listdir(os.path.join(root, "data"))
                   if d.startswith("bucket=")}
    assert len(all_buckets - probes) > 0, \
        "fixture must have unprobed buckets for the pruning claim to bite"


def test_simhash_parity_and_candidates(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = docs.select("doc_id", dedup.simhash_col("text").alias("sh")).collect()
    for r in rows:
        # simhash_py emits two's-complement int64, matching Spark directly
        assert r["sh"] == dedup.simhash_py(texts[r["doc_id"]]), r["doc_id"]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_candidates(docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0 and pairs.get((0, 8)) == 0
    assert (0, 3) not in pairs


def test_html_text_extract(spark):
    html = ("<html><head><title>T</title>"
            "<script type='x'>var a = '<div>';</script>"
            "<style>.x{color:red}</style></head>"
            "<body><p>Hello <b>world</b>!</p><br/>Second   line</body></html>")
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(textops.html_text_col("html").alias("t")).collect()[0]["t"]
    assert got == textops.html_text_py(html)
    assert "Hello world !" in got or "Hello world!" in got.replace(" !", "!")
    assert "script" not in got and "color" not in got and "var a" not in got
    assert "Second line" in got
    # a stray </style> inside <script> must NOT close the script block
    # (backreference close, YesNoParser never exits mid-element either)
    tricky = "<script>var x=1;</style>LEAKED</script><p>hi</p>"
    assert textops.html_text_py(tricky) == "hi"
    df2 = spark.createDataFrame([(tricky,)], "html string")
    got2 = df2.select(textops.html_text_col("html").alias("t")).collect()[0]["t"]
    assert got2 == "hi"


def test_token_counts(spark, docs):
    rows = docs.select(
        "doc_id", "text",
        textops.token_count_col("text").alias("n"),
        textops.bpe_ish_count_col("text").alias("nb"),
    ).collect()
    for r in rows:
        assert r["n"] == len(tokenize_py(r["text"]))
        assert r["nb"] >= r["n"]  # punctuation adds BPE-ish tokens


def test_lang_id(spark, docs):
    rows = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", textops.lang_id_col("text").alias("lang")).collect()}
    assert rows[0] == "en" and rows[5] == "de" and rows[6] == "es"


def test_quality_columns(spark, docs):
    out = textops.quality_columns(docs).filter(F.col("doc_id") == 1).collect()[0]
    toks = tokenize_py("The quick brown fox jumps over the lazy dog!")
    assert out["n_tokens"] == len(toks)
    assert 0 < out["stopword_ratio"] < 1
    assert out["punct_ratio"] > 0  # the '!'


def test_fingerprint_normalization(spark, docs):
    rows = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", textops.fingerprint_col("text").alias("fp")).collect()}
    assert rows[0] == rows[1] == rows[8]
    assert rows[0] != rows[2]


def test_rolling_fingerprints_parity(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = docs.select(
        "doc_id", textops.rolling_fingerprints_col("text", 4).alias("fps")
    ).collect()
    for r in rows:
        assert r["fps"] == textops.rolling_fingerprints_py(texts[r["doc_id"]], 4)


# ---------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 8)).astype("float32")
    vecs[1] = vecs[0] * 1.5          # same direction as 0 => cosine 1
    vecs[2] = vecs[0] + rng.standard_normal(8).astype("float32") * 0.05
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_exact(spark, embeddings):
    df, vecs = embeddings
    import numpy as np

    q = [float(x) for x in vecs[0]]
    got = similarity.cosine_topk(df, q, k=5).collect()
    sims = (vecs @ np.array(q)) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = sorted(range(50), key=lambda i: (-sims[i], i))[:5]
    assert [r["vec_id"] for r in got] == want
    assert math.isclose(got[0]["cosine"], 1.0, abs_tol=1e-6)


def test_ann_topk_recalls_neighbors(spark, embeddings):
    df, vecs = embeddings
    q = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=3).collect()]
    approx = [r["vec_id"] for r in similarity.ann_topk(df, q, k=3, n_planes=6).collect()]
    # parallel/near-identical vectors share the query's bucket
    assert set(exact[:2]) <= set(approx)


def test_ann_recall_floor(spark):
    """ann_topk must recall >=0.8 of the true top-10 on a clustered
    corpus with the tuned config (12 planes, Hamming<=2 multiprobe,
    ~1.9% scan fraction) — measured ~0.91 in bench.py."""
    import numpy as np

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((10, 32)).astype("float32") * 2.0
    pts = centers[rng.integers(0, 10, 800)] + \
        rng.standard_normal((800, 32)).astype("float32") * 0.6
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<float>",
    ).persist()
    df.count()
    hits = 0
    for qi in range(5):
        qv = [float(x) for x in pts[qi * 37 % 800]]
        exact = {r["vec_id"] for r in similarity.cosine_topk(df, qv, k=10).collect()}
        ann = {r["vec_id"] for r in similarity.ann_topk(
            df, qv, k=10, n_planes=12, probe_hamming=2).collect()}
        hits += len(exact & ann)
    df.unpersist()
    assert hits / 50 >= 0.8, hits / 50


def test_cosine_neardup_pairs(spark, embeddings):
    df, _ = embeddings
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.cosine_neardup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_connected_components_chain_and_singletons(spark):
    """A 6-node chain collapses to one component (requires multiple
    rounds), isolated nodes stay singletons, keep marks exactly the min
    doc of each cluster."""
    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    chain = [(i, i + 1) for i in range(5)]          # 0-1-2-3-4-5
    extra = [(7, 8)]
    pairs = spark.createDataFrame(chain + extra, "id_a long, id_b long")
    got = {r["doc_id"]: (r["component"], r["keep"])
           for r in dedup.connected_components(nodes, pairs).collect()}
    want = dedup.components_py(list(range(10)), chain + extra)
    assert {k: v[0] for k, v in got.items()} == want
    assert got[0] == (0, True) and got[5] == (0, False)
    assert got[6] == (6, True)
    assert got[7] == (7, True) and got[8] == (7, False)
    # exactly one keeper per component
    keepers = [k for k, (c, keep) in got.items() if keep]
    assert sorted(keepers) == sorted(set(c for c, _ in got.values()))


def test_connected_components_long_chain_logarithmic(spark):
    """The adversarial shape for min-label propagation: a 256-node path
    (diameter 255) must converge in O(log n) rounds — max_iter=12 would
    hard-fail the old diameter-bound algorithm but is ample for
    alternating large-star/small-star."""
    n = 256
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    out = dedup.connected_components(nodes, pairs, max_iter=12)
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    out.unpersist()
    assert got == {i: 0 for i in range(n)}


def test_connected_components_random_vs_union_find(spark):
    """Property check on an adversarial random graph against the pure
    union-find twin."""
    import random

    rng = random.Random(7)
    n = 120
    edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup.connected_components(nodes, pairs, max_iter=12)
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    out.unpersist()
    assert got == dedup.components_py(list(range(n)), edges)


def test_connected_components_nonconvergence_raises(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(4)],
                                  "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(nodes, pairs, max_iter=1)


def test_lang_id_twelve_languages(spark):
    """Expanded stopword profiles: one sentence per language + und +
    first-language tie precedence (en wins a 0-0... and an equal-hit tie)."""
    sents = [
        ("il problema non è che per me ma si vede", "it"),
        ("o problema não é para os outros com mais", "pt"),
        ("ik weet niet dat het een goede dag op aan met je is", "nl"),
        ("och det är inte som jag att en av den", "sv"),
        ("og det er ikke til at jeg har vi med", "da"),
        ("nie wiem co to jest ale tak jak się po", "pl"),
        ("bu bir şey ve ne için ile çok ama ben gibi", "tr"),
        ("yang itu dan di dengan untuk tidak ini dari akan", "id"),
        ("the quick brown fox is in the house", "en"),
        ("der hund und die katze sind zu haus", "de"),
        ("xyzzy qwerty", "und"),
        ("the el", "en"),   # 1-1 tie -> earlier language (en) wins
    ]
    rows = spark.createDataFrame([(s,) for s, _ in sents], "text string") \
        .select(textops.lang_id_col("text").alias("l")).collect()
    assert [r["l"] for r in rows] == [w for _, w in sents]


def test_gopher_quality_rules(spark):
    """Each Gopher rule trips on a crafted doc; a normal doc passes."""
    good = ("the quick brown fox jumps over the lazy dog and then it runs "
            "far away into the green forest where many animals live today "
            "because the weather is warm and the food is good for all of "
            "them so they stay there for a long time and play many games "
            "under the old trees near the quiet river bank")
    short = "too short to pass"
    bullets = "\n".join(f"- item {i} in the list of the day" for i in range(20))
    symbols = " ".join(["the#tag"] * 30 + ["of", "and"] * 15)
    nonalpha = " ".join(["12345"] * 60 + ["the", "of"])
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, bullets), (3, symbols), (4, nonalpha)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.gopher_quality(df).collect()}
    assert rows[0]["gopher_pass"] is True
    assert rows[1]["gopher_pass"] is False          # < 50 words
    assert rows[2]["gopher_pass"] is False          # bullet fraction 1.0
    assert rows[2]["g_bullet_frac"] == 1.0
    assert rows[3]["gopher_pass"] is False          # symbol ratio >= 0.1
    assert rows[3]["g_symbol_ratio"] >= 0.1
    assert rows[4]["gopher_pass"] is False          # alpha fraction <= 0.8
    assert rows[4]["g_alpha_frac"] <= 0.8
    assert rows[0]["g_stop_hits"] >= 2


def test_stopword_table_integrity():
    """The SQL oracle derives its stopword literals FROM textops.STOPWORDS
    (no-drift by construction), which means the oracle can no longer
    catch corruption of the lists themselves — this pin can.  If you
    changed STOPWORDS on purpose, update the digest AND re-verify the
    text_langid / text_gopher entries."""
    import hashlib
    import json

    digest = hashlib.md5(
        json.dumps(textops.STOPWORDS, sort_keys=True,
                   ensure_ascii=False).encode()
    ).hexdigest()
    assert digest == "9e7d09438043ed1b526d7be5029224fd"
    assert list(textops.STOPWORDS)[:4] == ["en", "es", "fr", "de"]
    assert all(len(v) >= 10 for v in textops.STOPWORDS.values())


# ------------------------------------------------------------------ IVF
def test_ivf_layout_pruning_recall_and_determinism(spark, tmp_path, embeddings):
    """IVF coarse-quantizer layout: (a) training + assignment are
    deterministic (same meta twice), (b) probed queries read only probed
    cell directories (partition pruning), (c) recall vs exact cosine
    top-k clears a floor at a fraction of the scan, (d) probing ALL
    cells reproduces the exact ranking (IVF is lossless at full probe)."""
    import os

    df, vecs = embeddings
    root_a = str(tmp_path / "ivf_a")
    root_b = str(tmp_path / "ivf_b")
    meta_a = similarity.write_ivf_embeddings(df, root_a, n_clusters=8,
                                             iters=3, dim=8)
    meta_b = similarity.write_ivf_embeddings(df, root_b, n_clusters=8,
                                             iters=3, dim=8)
    assert meta_a["centroids"] == meta_b["centroids"]  # deterministic

    q = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()]

    # full probe == exact (the candidate generator loses nothing when
    # every cell is probed)
    full = [r["vec_id"] for r in
            similarity.ivf_topk(spark, root_a, q, k=5,
                                n_probes=meta_a["n_clusters"]).collect()]
    assert full == exact

    got_df = similarity.ivf_topk(spark, root_a, q, k=5, n_probes=2)
    got = [r["vec_id"] for r in got_df.collect()]
    assert len(set(got) & set(exact)) >= 4  # recall@5 >= 0.8 at 2/8 cells

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cl" in plan
    probes = set(similarity.ivf_probes(q, meta_a["centroids"], 2))
    touched = [r[0] for r in
               spark.read.parquet(os.path.join(root_a, "data"))
               .filter(F.col("cl").isin(sorted(probes)))
               .select(F.input_file_name()).distinct().collect()]
    assert touched
    for path in touched:
        assert int(path.split("cl=")[1].split("/")[0]) in probes
    all_cells = {int(d.split("=")[1])
                 for d in os.listdir(os.path.join(root_a, "data"))
                 if d.startswith("cl=")}
    assert len(all_cells - probes) > 0


def test_knn_join_matches_per_query_topk(spark):
    """knn_join == one cosine_topk per query (rounded-rank contract),
    including the in-partition compaction path (many small Arrow
    batches through one partition)."""
    import numpy as np

    from resin_spark import similarity

    rng = np.random.default_rng(7)
    pts = rng.standard_normal((600, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    queries = [(int(i), [float(x) for x in pts[i]]) for i in (0, 5, 11)]

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "40")
    try:
        got = similarity.knn_join(emb.repartition(1), queries, k=7).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(got) == 3 * 7
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["n_id"], r["cosine"]))
    for qid, qv in queries:
        want = (
            similarity.cosine_topk(emb, qv, k=30)
            .select("vec_id", F.round("cosine", 6).alias("c6"))
            .orderBy(F.desc("c6"), F.asc("vec_id")).limit(7).collect()
        )
        got_q = sorted(by_q[qid])
        assert [g[1] for g in got_q] == [w["vec_id"] for w in want]
        for g, w in zip(got_q, want):
            assert abs(g[2] - w["c6"]) < 1e-9


def test_minhash_bucket_cap_bounds_boilerplate(spark):
    """A c-member boilerplate cluster agreeing on every band must not
    emit O(c^2) candidate pairs: over-cap (band, bucket)s re-split on
    fresh minhash lanes, terminal buckets emit hub pairs.  Pair count
    stays O(c * cap), every cluster member stays CONNECTED (hub pairs,
    nothing dropped), genuine near-dup pairs outside the cluster
    survive, and under-cap behavior is bit-identical to uncapped."""
    c, cap = 300, 10
    tmpl = ("the common boilerplate template header shared across "
            "every page of the site variant ")
    rows = [(i, tmpl + str(i % 3)) for i in range(c)]
    rows += [(1000, "completely different words entirely unrelated "
                    "content goes here nothing shared"),
             (1001, "alpha beta gamma delta epsilon zeta eta theta"),
             (1002, "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.minhash_candidates(df, n_hashes=16, bands=8,
                                      max_bucket=cap).collect()}
    # uncapped would emit >= 3 * C(100,2) = 14850 within-variant pairs;
    # capped must stay linear-ish in c (hub pairs + <= cap-sized fulls)
    assert len(pairs) < 3 * c
    assert (1001, 1002) in pairs
    assert not any(1000 in p for p in pairs)
    # connectivity: each variant group is one component (identical text
    # => identical keys at every depth => shared terminal hub)
    comp = dedup.components_py([r[0] for r in rows], list(pairs))
    for v in range(3):
        group = [i for i in range(c) if i % 3 == v]
        assert len({comp[i] for i in group}) == 1
    # under-cap buckets: capped result == the classic uncapped join
    small = spark.createDataFrame(rows[295:], "doc_id long, text string")
    capped = {(r["id_a"], r["id_b"]) for r in
              dedup.minhash_candidates(small, n_hashes=16, bands=8,
                                       max_bucket=2000).collect()}
    uncapped = {(r["id_a"], r["id_b"]) for r in
                dedup.minhash_candidates(small, n_hashes=16, bands=8,
                                         max_bucket=None).collect()}
    assert capped == uncapped
