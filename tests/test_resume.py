"""Checkpoint-resume: an interrupted multi-segment build resumed with
``resume_build`` produces the same index as an uninterrupted build
(north rule; FIXTURES.md §4.5).  Interruption is simulated by building
only the first 3 of 8 segments (each segment commits independently with a
lineage receipt)."""

from pyspark.sql import functions as F

from resin_spark import build as B
from resin_spark.build import build_index, completed_segments, resume_build
from resin_spark.executor import SearchEngine


def _postings_snapshot(spark, root):
    dec = B.decoded_postings(B.read_postings(spark, root))
    return {
        (r["field"], r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in dec.collect()
    }


def test_resume_produces_identical_index(spark, transcripts, tmp_path_factory):
    full_root = str(tmp_path_factory.mktemp("idx_full") / "c")
    part_root = str(tmp_path_factory.mktemp("idx_part") / "c")

    build_index(spark, transcripts, full_root, n_segments=8)

    # simulate a killed job: build only segments 0-2 by monkeypatching the
    # segment loop via a partial call — build each segment through the same
    # code path, then stop
    conv_dim_src = B.ids.build_conv_dim(transcripts)
    conv_dim_src.write.mode("overwrite").parquet(B.p_conv_dim(part_root))
    conv_dim = spark.read.parquet(B.p_conv_dim(part_root))
    seg_col = F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")
    for seg in range(3):
        seg_df = transcripts.withColumn("segment", seg_col).filter(
            F.col("segment") == seg
        )
        B._build_segment(spark, seg_df, conv_dim, part_root, B.DEFAULT_FIELDS, seg)

    assert completed_segments(spark, part_root) == {0, 1, 2}

    # resume: must build exactly the missing 5 segments
    resume_build(spark, transcripts, part_root, n_segments=8)
    assert completed_segments(spark, part_root) == set(range(8))

    assert _postings_snapshot(spark, part_root) == _postings_snapshot(
        spark, full_root
    )

    # and queries agree
    e1, e2 = SearchEngine(spark, full_root), SearchEngine(spark, part_root)
    q = {"and": {"text": "banana cantalope"}}
    assert e1.topk(q, k=10) == e2.topk(q, k=10)


def test_resume_is_idempotent_when_complete(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_idem") / "c")
    build_index(spark, transcripts, root, n_segments=2)
    snap = _postings_snapshot(spark, root)
    out = resume_build(spark, transcripts, root, n_segments=2)
    assert out["turns"] == 0  # nothing rebuilt
    assert _postings_snapshot(spark, root) == snap


def test_resume_preserves_conv_slots_with_new_convs(spark, tmp_path_factory):
    """A resume whose input gained conversations must NOT re-rank the
    dimension: committed segments hold doc_ids packed from the existing
    slots.  New conv_ids extend append-only above the current maximum."""
    from resin_spark.fixtures import transcripts_df

    t_all = transcripts_df(spark, n_convs=12, max_turns=3)
    first = t_all.filter(F.col("conv_id") < "conv00000008")
    root = str(tmp_path_factory.mktemp("idx_grow") / "c")
    build_index(spark, first, root, n_segments=2)
    before = {r["conv_id"]: r["conv_slot"]
              for r in spark.read.parquet(B.p_conv_dim(root)).collect()}

    out = resume_build(spark, t_all, root, n_segments=2)
    assert out["turns"] == 0  # receipts say both segments are complete
    after = {r["conv_id"]: r["conv_slot"]
             for r in spark.read.parquet(B.p_conv_dim(root)).collect()}
    # old slots untouched, new convs strictly above the old maximum
    assert all(after[c] == s for c, s in before.items())
    new = {c: s for c, s in after.items() if c not in before}
    assert new and min(new.values()) > max(before.values())
