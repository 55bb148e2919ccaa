"""Vector-space operators (SURVEY §2 T3/T4/T6/T7/S7/F4/I6) vs python twins."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from resin_spark import vectorspace as vs

VECS = [
    ({0: 1.0, 3: 2.5}, {3: 0.5, 7: -1.0}),
    ({1: -2.0}, {1: 2.0}),          # subtract -> exact-zero drop
    ({}, {5: 4.0}),
    ({2: 0.25, 9: 8.0, 11: -3.5}, {2: 0.75, 11: -3.5}),
]


def _to_rows(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(VECS)],
        "i int, a map<int,double>, b map<int,double>",
    )


def test_sparse_arithmetic_twins(spark):
    df = _to_rows(spark).select(
        "i",
        vs.vec_add("a", "b").alias("add"),
        vs.vec_subtract("a", "b").alias("sub"),
        vs.vec_multiply("a", 3.0).alias("mul"),
        vs.vec_divide("a", 4.0).alias("div"),
        vs.vec_average("a", "b").alias("avg"),
        vs.vec_shift("a", 100).alias("shift"),
        vs.vec_append("a", "b", 1000).alias("app"),
        vs.vec_cos("a", "b").alias("cos"),
        vs.map_sum("a").alias("msum"),
    )
    for r in df.collect():
        a, b = VECS[r["i"]]
        assert r["add"] == vs.vec_add_py(a, b)
        assert r["sub"] == vs.vec_subtract_py(a, b)
        assert r["mul"] == vs.vec_scale_py(a, 3.0)
        assert r["div"] == vs.vec_scale_py(a, 0.25)
        assert r["avg"] == vs.vec_average_py(a, b)
        assert r["shift"] == vs.vec_shift_py(a, 100)
        assert r["app"] == {**a, **vs.vec_shift_py(b, 1000)}
        assert r["msum"] == vs.map_sum_py(a)
        if a and b:
            assert r["cos"] == pytest.approx(vs.vec_cos_py(a, b), abs=1e-12)


def test_subtract_drops_exact_zeros(spark):
    # Vector.cs:103 CoerceZero(0): 2.0 - 2.0 vanishes from storage
    r = _to_rows(spark).filter("i = 1").select(
        vs.vec_subtract("a", "b").alias("s")).collect()[0]
    assert r["s"] == {1: -4.0}


def test_to_sparse_roundtrip(spark):
    df = spark.createDataFrame(
        [([0.0, 1.5, 0.0, -2.0],)], "arr array<float>"
    ).select(vs.to_sparse("arr").alias("m"))
    assert df.collect()[0]["m"] == {1: 1.5, 3: -2.0}


def test_charbag_and_cbow_twin(spark):
    texts = [
        "apple banana cherry",
        "solo",
        "",
        "a b a",
        "Ferriman–Gallwey score",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").select(
        "text", vs.cbow_vectors("text").alias("cb")
    )
    for r in df.collect():
        want = vs.cbow_py(r["text"])
        got = [(e["label"], dict(e["vec"])) for e in r["cb"]]
        assert got == want, r["text"]
    # semantics spot-checks (BagOfCharsModel.cs:118-141)
    cb = vs.cbow_py("apple banana cherry")
    assert cb[0][0] == "apple" and cb[0][1] == vs.vec_shift_py(
        vs.charbag_py("banana"), 2 * vs.CHAR_DIM)   # only right context
    assert cb[1][1] == {**vs.charbag_py("apple"),
                        **vs.vec_shift_py(vs.charbag_py("cherry"),
                                          2 * vs.CHAR_DIM)}
    assert vs.cbow_py("solo")[0][1] == vs.vec_shift_py(
        vs.charbag_py("solo"), vs.CHAR_DIM)          # neighbourless fallback


def test_serialize_roundtrip_and_layout():
    v = {3: 1.5, 0: -2.25, 77: 8.0}
    buf = vs.serialize_vec_py(v)
    # reference layout (Vector.cs:74-87): int32 indices asc, then float32 vals
    assert np.frombuffer(buf[:12], "<i4").tolist() == [0, 3, 77]
    assert np.frombuffer(buf[12:], "<f4").tolist() == [-2.25, 1.5, 8.0]
    assert vs.deserialize_vec_py(buf) == v


def test_streamed_cosine_matches_map_cosine(spark):
    a = {0: 1.0, 3: 2.5, 9: -1.0}
    q = {0: 0.5, 9: 2.0, 4: 1.0}
    df = spark.createDataFrame([(a,)], "m map<int,double>").select(
        vs.serialize_vec_col("m").alias("buf")
    ).select(vs.cos_serialized_col(q, "buf").alias("cos"))
    got = df.collect()[0]["cos"]
    # float32 storage: compare against the twin computed over f32-rounded vals
    a32 = {k: float(np.float32(v)) for k, v in a.items()}
    assert got == pytest.approx(vs.vec_cos_py(q, a32), abs=1e-7)


def _write_idx(tmp, images, labels):
    """Synthesize an IDX pair (big-endian headers, MnistReader.cs:25-31)."""
    n, h, w = images.shape
    ip = str(tmp / "imgs.idx3-ubyte")
    lp = str(tmp / "labs.idx1-ubyte")
    with open(ip, "wb") as fh:
        fh.write(struct.pack(">iiii", 2051, n, h, w))
        fh.write(images.astype(np.uint8).tobytes())
    with open(lp, "wb") as fh:
        fh.write(struct.pack(">ii", 2049, n))
        fh.write(np.asarray(labels, dtype=np.uint8).tobytes())
    return ip, lp


def test_mnist_source_and_image_embed(spark, tmp_path):
    rng = np.random.default_rng(7)
    n, h, w = 64, 4, 5
    images = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    labels = rng.integers(0, 10, size=n)
    ip, lp = _write_idx(tmp_path, images, labels)

    df = vs.read_mnist(spark, ip, lp, partitions=4)
    rows = {r["img_id"]: r for r in df.collect()}
    assert len(rows) == n
    for i in (0, 17, 63):
        assert rows[i]["label"] == int(labels[i])
        assert rows[i]["width"] == w and rows[i]["height"] == h
        assert bytes(rows[i]["pixels"]) == images[i].tobytes()

    emb = df.select("img_id", vs.image_embed_col("pixels").alias("e"))
    r17 = {r["img_id"]: r["e"] for r in emb.collect()}[17]
    assert r17 == [float(x) for x in images[17].reshape(-1)]
    assert len(r17) == h * w


def test_mnist_label_count_mismatch(spark, tmp_path):
    images = np.zeros((3, 2, 2), dtype=np.uint8)
    ip, lp = _write_idx(tmp_path, images, [1, 2, 3])
    with open(lp, "wb") as fh:  # rewrite with wrong count
        fh.write(struct.pack(">ii", 2049, 2))
        fh.write(bytes([1, 2]))
    with pytest.raises(ValueError, match="label count"):
        vs.read_mnist(spark, ip, lp)


def _clustered(spark, n_per=20, seed=3):
    """Three well-separated clusters -> perfectly classifiable."""
    rng = np.random.default_rng(seed)
    centers = {0: [10, 0, 0, 0], 1: [0, 10, 0, 0], 2: [0, 0, 10, 1]}
    rows = []
    i = 0
    for lab, c in centers.items():
        for _ in range(n_per):
            v = (np.asarray(c, dtype=float) + rng.normal(0, 0.3, 4)).tolist()
            rows.append((i, [float(x) for x in v], lab))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_supervised_index_and_classify(spark):
    df = _clustered(spark)
    idx = vs.supervised_index(df)
    assert idx.count() <= df.count()
    train = idx.select("embedding", "label")
    test = _clustered(spark, seed=11)
    pred = vs.classify(test, train).join(
        test.select("vec_id", "label"), "vec_id"
    )
    wrong = pred.filter(F.col("pred_label") != F.col("label")).count()
    assert wrong == 0  # separable clusters -> 100% (ValidateMnist analog)


def test_supervised_label_conflict_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0], 0), (1, [1.0, 2.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    with pytest.raises(ValueError, match="IdenticalAngle too low"):
        vs.supervised_index(df)


def test_supervised_merges_doc_ids(spark):
    df = spark.createDataFrame(
        [(5, [1.0, 2.0], 0), (2, [1.0, 2.0], 0), (9, [3.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    idx = {tuple(r["doc_ids"]): r["label"]
           for r in vs.supervised_index(df).collect()}
    assert idx == {(2, 5): 0, (9,): 1}
