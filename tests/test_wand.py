"""Block-max WAND parity: pruned top-k must equal the exhaustive top-k
exactly (docIDs and scores) — WAND is an optimization, never a semantics
change (SURVEY.md §4.2.3)."""

import math

import pytest

from resin_spark import wand


CASES = [
    (["banana"], "or"),
    (["apple", "banana"], "or"),
    (["banana", "cantalope"], "and"),
    (["hotterm"], "or"),              # skewed posting list
    (["hotterm", "apple"], "and"),
    (["the", "a", "apple"], "or"),
    (["zzznope"], "or"),              # no matches
]


@pytest.mark.parametrize("tokens,mode", CASES,
                         ids=[f"{'+'.join(t)}:{m}" for t, m in CASES])
def test_wand_equals_exact(spark, engine, tokens, mode):
    got, stats = wand.wand_topk(spark, engine.root, tokens, k=10, mode=mode)
    want, _ = wand.wand_topk(spark, engine.root, tokens, k=10, mode=mode,
                             exact=True)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-12)
    assert stats["blocks_scored"] <= stats["blocks_total"]


def test_wand_prunes_on_zipf_corpus(spark, tmp_path):
    """On a corpus with real block-bound variance (Zipf df, dl spread,
    doc_id-localized term bursts — fixtures.transcripts_df_zipf) the
    block-max bounds must actually PRUNE: fewer than half the matched
    blocks are decoded, while the top-k stays rank- and score-identical
    to the exhaustive scorer.  Mirrors the exactness contract of the
    reference's skip-tree traversal
    (/root/reference/src/Sir.VectorSpace/ColumnReader.cs:168-179)."""
    from resin_spark import build as B
    from resin_spark.fixtures import transcripts_df_zipf

    root = str(tmp_path / "zipf_idx")
    t = transcripts_df_zipf(spark, n_convs=64000, max_turns=3)
    B.build_index(spark, t, root, fields=("text",))

    for tokens, mode in ([["wandhot"], "or"],
                         [["wandhot", "wandwarm"], "or"],
                         [["wandhot", "wandwarm"], "and"]):
        got, stats = wand.wand_topk(spark, root, tokens, k=10, mode=mode)
        want, _ = wand.wand_topk(spark, root, tokens, k=10, mode=mode,
                                 exact=True)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, s1), (_, s2) in zip(got, want):
            assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-12)
        assert stats["blocks_total"] >= 16
        assert stats["blocks_scored"] < 0.5 * stats["blocks_total"], (
            tokens, mode, stats)

    # the AND block-pruned driver path on the same corpus: the burst-only
    # rare term (wandrare) seeds, so the broad term (wandhot) collects
    # only the burst-range blocks — measurably fewer postings than its
    # df — with hits identical to the unpruned engine
    from resin_spark.executor import SearchEngine

    q = {"and": {"text": "wandhot wandrare"}}
    base = SearchEngine(spark, root, fields=("text",))
    want_hits = base.topk(q, k=10)
    pruned = SearchEngine(spark, root, fields=("text",))
    pruned._DRIVER_SCORE_MAX_POSTINGS = 0
    got_hits = pruned.topk(q, k=10)
    assert got_hits == want_hits
    st = pruned.last_and_stats
    dfm = pruned._term_df_driver_map()
    hot_df = dfm[("text", "wandhot")]
    hot = st[("text", "wandhot")]
    assert hot["blocks_filter"] is not None  # scan was block-restricted
    assert hot["postings_collected"] < 0.7 * hot_df, (st, hot_df)
    assert st[("text", "wandrare")]["blocks_filter"] is None  # seed

    # block-max SINGLE-term driver path on the same corpus: blocks decode
    # in upper-bound order (the bursty tf=6 early-conv blocks first) and
    # iteration stops once the k-th hit beats every unread bound — hits
    # identical to the full-decode engine, most blocks never read
    bm = SearchEngine(spark, root, fields=("text",))
    bm._BLOCKMAX_MIN_POSTINGS = 0
    for skip in (0, 5):
        got_bm = bm.topk({"or": {"text": "wandhot"}}, k=10, skip=skip)
        want_bm = base.topk({"or": {"text": "wandhot"}}, k=10, skip=skip)
        assert got_bm == want_bm, skip
    stb = bm.last_blockmax_stats
    assert stb is not None and stb["blocks_total"] >= 16
    assert stb["blocks_scored"] < 0.5 * stb["blocks_total"], stb
    assert stb["postings_decoded"] < hot_df


def test_wand_disjunction_matches_python(spark, engine, oracle):
    """Full-disjunction semantics vs a brute-force python computation."""
    tokens = ["apple", "banana"]
    got, _ = wand.wand_topk(spark, engine.root, tokens, k=10, mode="or")

    # brute force from the oracle index (standard disjunctive BM25)
    import math as m

    scores = {}
    for t in tokens:
        plist = oracle.postings["text"].get(t, {})
        for key in plist:
            scores[key] = scores.get(key, 0.0) + oracle.weight("text", t, key)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:10]

    docs = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
            for r in engine.documents().select("conv_id", "turn_idx", "doc_id").collect()}
    want_ids = [docs[k] for k, _ in want]
    assert [d for d, _ in got] == want_ids
    for (_, s1), (_, s2) in zip(got, want):
        assert m.isclose(s1, s2, rel_tol=0, abs_tol=1e-9)
