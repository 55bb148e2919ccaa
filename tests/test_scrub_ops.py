"""Training-data scrub ops: PII redaction, URL canonicalization/dedup,
token-chunk exact-substring dedup, benchmark decontamination.  Each op is
twin-checked (pure-python) and plan-gated (no per-row Python, narrow ops
stay shuffle-free)."""

from resin_spark import dedup, textops


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _has_python_eval(plan: str) -> bool:
    """True when a Python ROW path runs in the plan (UDF eval nodes) —
    'applySchemaToPythonRDD' from createDataFrame test inputs is not one."""
    return any(n in plan for n in (
        "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
        "FlatMapGroupsInPandas", "PythonMapInArrow"))


PII_TEXTS = [
    "mail Bob.smith+x@Mail.Example.org or a.b@c.io now",
    "ip 10.0.0.1 and 192.168.255.254 but not 1234.5.6.7 ok",
    "call 555-010-1234 or 555.010.9999 or 555 010 0000",
    "no pii at all",
    "edge a@b.co 1.2.3.4 999-888-7777 end",
    "",
]


def test_pii_redact_twin_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.pii_counts(df).withColumn(
        "red", textops.pii_redact_col("text")).collect()}
    for i, t in enumerate(PII_TEXTS):
        assert got[i]["red"] == textops.pii_redact_py(t), t
    assert (got[0]["n_email"], got[0]["n_ip"], got[0]["n_phone"]) == (2, 0, 0)
    assert got[1]["n_ip"] == 2  # 1234.5.6.7 must NOT match (word boundary)
    assert got[2]["n_phone"] == 3
    assert got[3]["red"] == "no pii at all"
    assert "[EMAIL]" in got[4]["red"] and "[IP]" in got[4]["red"] \
        and "[PHONE]" in got[4]["red"]


URLS = [
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
    "http://example.com/a/b?a=1&b=2",
    "https://Example.com:443/a/b/?fbclid=zz&a=1&b=2",
    "https://example.com:8443/x?ref=abc&z=9",
    "http://www.site.org/",
    "not a url at all",
]


def test_url_normalize_twin(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id long, url string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", textops.url_normalize_col("url").alias("n")).collect()}
    for i, u in enumerate(URLS):
        assert got[i] == textops.url_normalize_py(u), u
    # the three tracking-differing forms canonicalize together
    assert got[0] == got[1] == "http://example.com/a/b?a=1&b=2"
    assert got[3] == "https://example.com:8443/x?z=9"  # non-default port kept
    assert got[5] == ""  # non-URL -> empty canonical form


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id long, url string")
    rows = textops.url_dedup_groups(df, "url").collect()
    assert len(rows) == 1
    assert rows[0]["norm_url"] == "http://example.com/a/b?a=1&b=2"
    assert rows[0]["n_dups"] == 2 and rows[0]["keep_id"] == 0


def test_scrub_ops_plan_narrow(spark):
    """PII redact and URL normalize are single narrow projections:
    no shuffle, no Python row path."""
    df = spark.createDataFrame([(1, "x", "http://a.b/c")],
                               "doc_id long, text string, url string")
    p = _plan(df.select(textops.pii_redact_col("text"),
                        textops.url_normalize_col("url")))
    assert "Exchange" not in p and not _has_python_eval(p)


def test_chunk_dedup_twin(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(45))),
        (2, " ".join(f"w{i}" for i in range(20)) + " tail only here"),
        (3, " ".join(f"w{i}" for i in range(20))),  # == doc1/doc2 chunk 0
        (4, ""),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chunks"], r["n_removed"])
           for r in dedup.chunk_dedup_stats(df, window=20).collect()}
    want = dedup.chunk_dedup_py(rows, window=20)
    assert got == want
    assert got[1] == (3, 0)       # first owner keeps everything
    assert got[2] == (2, 1)       # shared first chunk removed
    assert got[3] == (1, 1)       # exactly one chunk, duplicated
    assert got[4] == (0, 0)
    assert got[5] == (1, 0)
    p = _plan(dedup.chunk_dedup_stats(df, window=20))
    assert not _has_python_eval(p) and "Cartesian" not in p


def test_decontaminate_list_and_frame_forms_agree(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zeta alpha beta gamma other words"),
        (3, "nothing shared with anything here"),
        (4, "al be ga"),  # shorter than n
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = ["alpha beta gamma delta", "unseen tokens entirely"]
    a = {r["doc_id"]: (r["n_hits"], r["contaminated"])
         for r in dedup.decontaminate_flags(df, bench, n=3).collect()}
    bdf = spark.createDataFrame([(b,) for b in bench], "text string")
    b = {r["doc_id"]: (r["n_hits"], r["contaminated"])
         for r in dedup.decontaminate_flags(df, bdf, n=3).collect()}
    assert a == b
    assert a[1] == (2, True)   # 'alpha beta gamma', 'beta gamma delta'
    assert a[2] == (1, True)   # 'alpha beta gamma'
    assert a[3] == (0, False)
    assert a[4] == (0, False) and a[5] == (0, False)
    # small-bench form is join-free: one narrow projection
    p = _plan(dedup.decontaminate_flags(df, bench, n=3))
    assert "Join" not in p and not _has_python_eval(p)


def test_chunk_dedup_apply_rewrites(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(25))),
        (2, " ".join(f"w{i}" for i in range(20)) + " tail bits"),
        (3, " ".join(f"w{i}" for i in range(20))),  # nothing survives
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.chunk_dedup_apply(df, window=20).collect()}
    # doc1 owns chunk0 (w0..w19) and keeps its tail chunk
    assert got[1]["clean_text"] == " ".join(f"w{i}" for i in range(25))
    assert (got[1]["n_chunks"], got[1]["n_removed"]) == (2, 0)
    # doc2 loses the shared first chunk, keeps its tail
    assert got[2]["clean_text"] == "tail bits"
    assert (got[2]["n_chunks"], got[2]["n_removed"]) == (2, 1)
    # doc3 is entirely duplicate: rewritten to empty
    assert got[3]["clean_text"] == ""
    assert (got[3]["n_chunks"], got[3]["n_removed"]) == (1, 1)
    assert got[4]["clean_text"] == "" and got[4]["n_chunks"] == 0
    # stats form must agree with the rewrite form
    stats = {r["doc_id"]: (r["n_chunks"], r["n_removed"]) for r in
             dedup.chunk_dedup_stats(df, window=20).collect()}
    assert stats == {k: (r["n_chunks"], r["n_removed"])
                     for k, r in got.items()}


def test_clean_corpus_pipeline(spark):
    from resin_spark import pipeline

    rows = [
        (0, "alpha beta mail a@b.co " + " ".join(f"w{i}" for i in range(10))),
        (1, "alpha beta mail a@b.co " + " ".join(f"w{i}" for i in range(10))),
        (2, " ".join(f"w{i}" for i in range(10)) + " fresh tail"),
        (3, "evalgram one two three four five other things here"),
        (4, "wholly original content nothing shared anywhere at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pipeline.clean_corpus(
        df, benchmark=["evalgram one two three four five"],
        window=10, ngram=5).collect()}
    assert set(out) == {0, 2, 4}          # 1 = exact dup, 3 = contaminated
    assert "[EMAIL]" not in out[0]["clean_text"]  # tokenized placeholder
    assert "email" in out[0]["clean_text"] and "a" in out[0]["clean_text"]
    # doc2's first chunk == doc0's second chunk? boundaries differ -> kept
    assert out[2]["clean_text"].startswith("w0 w1")
    rep = pipeline.clean_corpus_report(
        df, pipeline.clean_corpus(
            df, benchmark=["evalgram one two three four five"],
            window=10, ngram=5)).collect()[0]
    assert rep["docs_in"] == 5 and rep["docs_out"] == 3
    # without a benchmark, only the exact dup drops
    out2 = pipeline.clean_corpus(df, window=10).collect()
    assert {r["doc_id"] for r in out2} == {0, 2, 3, 4}


def test_clean_corpus_near_dup_stage(spark):
    from resin_spark import pipeline

    base = " ".join(f"t{i}" for i in range(30))
    rows = [
        (0, base),
        (1, base + " extra"),          # near-dup of 0 (not exact)
        (2, "completely different tokens " + " ".join(f"z{i}" for i in range(26))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    without = {r["doc_id"] for r in pipeline.clean_corpus(
        df, window=10).collect()}
    assert without == {0, 1, 2}  # exact dedup alone keeps the near-dup
    with_nd = {r["doc_id"] for r in pipeline.clean_corpus(
        df, window=10, near_dup=True, jaccard_threshold=0.8).collect()}
    assert with_nd == {0, 2}     # cluster keeps the canonical doc only


def test_snippet_col(spark):
    from resin_spark import docops
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c HIT d e f g"),          # mid-string window
        (2, "HIT x y z"),                  # clipped left context
        (3, "p q r s t u hit"),            # clipped right context
        (4, "no match here"),
        (5, None),
        (6, "early hit and a later hit again"),  # FIRST occurrence wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id",
        docops.snippet_col("text", ["hit"], before=2, after=2).alias("s"),
    ).collect()}
    assert got[1] == "b c hit d e"
    # fixed-width window: clipping at the left edge extends rightward
    assert got[2] == "hit x y z"
    assert got[3] == "t u hit"
    assert got[4] == "" and got[5] == ""
    assert got[6] == "early hit and a later"  # FIRST occurrence anchors
    p = _plan(df.select(docops.snippet_col("text", ["hit"])))
    assert "Exchange" not in p and not _has_python_eval(p)
