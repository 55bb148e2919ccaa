"""Vector-space operators (SURVEY.md §2.3/§2.5 rows previously scoped out).

Rebuilds the reference's sparse-vector toolkit Spark-first:

* T7  sparse-vector arithmetic — Add/Subtract/Multiply/Divide/Average/
      Append/Shift on ``map<int,double>`` columns via JVM higher-order
      functions (map_zip_with / transform_keys / transform_values), no
      Python in the plan (/root/reference/src/Sir.VectorSpace/
      Vector.cs:88-158, /root/reference/src/Sir.Core/IVector.cs:14-22).
* T3  CBOW tokenize — per-token context vector: left neighbour's
      char-bag at offset 0, right neighbour's at offset 2D, the token
      itself (offset D) only when it has no neighbours
      (/root/reference/src/Sir.Search/Models/BagOfCharsModel.cs:94-144).
* T4  image embed — pixel bytes -> dense float vector, label carried
      (/root/reference/src/Sir.Search/Models/LinearClassifierImageModel
      .cs:19-25).
* F4  vector serialize — the reference's on-disk layout: int32 indices
      then float32 values, ascending index, little-endian
      (/root/reference/src/Sir.VectorSpace/Vector.cs:74-87).
* T6  streamed cosine — cosine computed straight off the serialized
      form without materializing a map (/root/reference/src/Sir.Search/
      Models/DistanceCalculator.cs:22-45).
* S7  MNIST IDX source — big-endian IDX headers, then DISTRIBUTED
      byte-range record reads: each task seeks to its own slice of the
      fixed-size record array, so a 100-GB IDX file splits across
      executors with no driver materialization (/root/reference/src/
      Sir.Mnist/MnistReader.cs:18-50, BinaryHelper.cs:9-15).
* I6  supervised insert + validate — merge vectors only under identical
      label (label conflict raises, mirroring GraphBuilder.cs:36-39's
      InvalidOperationException), classify by nearest-cosine exemplar
      (/root/reference/src/Sir.VectorSpace/GraphBuilder.cs:25-69,
      src/Sir.Mnist/ValidateMnistCommand.cs:17-60).

Determinism: float64 reductions over maps always iterate keys in
ascending order (``map_sum``), so results are bit-equal to the DuckDB
oracle and the pure-python twins.  Identity tests use exact quantized
keys, never float comparison (same policy as T9 ``chars_key``).
"""

from __future__ import annotations

import math
import struct
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tokenizer import tokenize_py, tokens_col

# CBOW base dimensionality: one slot per Unicode code point, as the
# reference's UnicodeRanges.All-sized char-bag space (BagOfCharsModel.cs:11).
CHAR_DIM = 0x110000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def empty_vec() -> Column:
    return F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<double>")
    )


# ---------------------------------------------------------------------------
# T7 — sparse vector arithmetic (map<int,double>), pure Catalyst HOFs
# ---------------------------------------------------------------------------

def vec_add(a: Column | str, b: Column | str) -> Column:
    """Vector.Add (Vector.cs:94-97): elementwise sum over the key union."""
    return F.map_zip_with(
        _c(a), _c(b),
        lambda _k, x, y: F.coalesce(x, F.lit(0.0)) + F.coalesce(y, F.lit(0.0)),
    )


def vec_subtract(a: Column | str, b: Column | str) -> Column:
    """Vector.Subtract + CoerceZero(0) (Vector.cs:99-108): exact zeros
    are dropped from the sparse storage after the subtraction."""
    diff = F.map_zip_with(
        _c(a), _c(b),
        lambda _k, x, y: F.coalesce(x, F.lit(0.0)) - F.coalesce(y, F.lit(0.0)),
    )
    return F.map_filter(diff, lambda _k, v: v != 0.0)


def vec_multiply(a: Column | str, scalar: float) -> Column:
    """Vector.Multiply(scalar) (Vector.cs:110-114)."""
    return F.transform_values(_c(a), lambda _k, v: v * F.lit(float(scalar)))


def vec_divide(a: Column | str, scalar: float) -> Column:
    """Vector.Divide(scalar) (Vector.cs:116-120)."""
    return F.transform_values(_c(a), lambda _k, v: v / F.lit(float(scalar)))


def vec_average(a: Column | str, b: Column | str) -> Column:
    """Vector.AverageInPlace (Vector.cs:122-126): (a + b) / 2."""
    return F.transform_values(vec_add(a, b), lambda _k, v: v / F.lit(2.0))


def vec_shift(a: Column | str, n: int) -> Column:
    """Vector.Shift (Vector.cs:143-158): every index moved up by n."""
    return F.transform_keys(_c(a), lambda k, _v: k + F.lit(int(n)))


def vec_append(a: Column | str, b: Column | str, dim: int) -> Column:
    """Vector.Append (Vector.cs:128-141): b's indices shifted past a's
    dimension; result lives in 2*dim dims.  Precondition: both operands'
    keys < dim (then the concat is disjoint by construction)."""
    return F.map_concat(_c(a), vec_shift(b, dim))


def map_sum(a: Column | str) -> Column:
    """Deterministic float64 sum of components: ascending-key iteration,
    so Spark, DuckDB and python twins reduce in the same order."""
    m = _c(a)
    ordered = F.transform(
        F.array_sort(F.map_keys(m)), lambda k: F.element_at(m, k)
    )
    return F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)


def vec_cos(a: Column | str, b: Column | str) -> Column:
    """T5 on the sparse form — CosAngle (DistanceCalculator.cs:13-20):
    dot(a,b) / (|a| * |b|), ascending-key reduction order."""
    prod = F.map_zip_with(
        _c(a), _c(b),
        lambda _k, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0)),
    )
    sq = lambda m: F.transform_values(_c(m), lambda _k, v: v * v)  # noqa: E731
    # nullif: a zero-norm operand yields NULL, not an ANSI divide-by-zero
    return map_sum(prod) / F.nullif(
        F.sqrt(map_sum(sq(a))) * F.sqrt(map_sum(sq(b))), F.lit(0.0)
    )


def to_sparse(arr: Column | str) -> Column:
    """Dense array<float> -> sparse map<int,double> (0-based dims, exact
    zeros dropped — sparse storage semantics)."""
    a = _c(arr)
    idx = F.sequence(F.lit(0), F.size(a) - 1)
    m = F.map_from_arrays(idx, F.transform(a, lambda x: x.cast("double")))
    return F.map_filter(m, lambda _k, v: v != 0.0)


# Pure-python twins (oracle / parity tests) -------------------------------

def vec_add_py(a: dict, b: dict) -> dict:
    return {k: a.get(k, 0.0) + b.get(k, 0.0) for k in set(a) | set(b)}


def vec_subtract_py(a: dict, b: dict) -> dict:
    out = {k: a.get(k, 0.0) - b.get(k, 0.0) for k in set(a) | set(b)}
    return {k: v for k, v in out.items() if v != 0.0}


def vec_scale_py(a: dict, s: float) -> dict:
    return {k: v * s for k, v in a.items()}


def vec_average_py(a: dict, b: dict) -> dict:
    return {k: v / 2.0 for k, v in vec_add_py(a, b).items()}


def vec_shift_py(a: dict, n: int) -> dict:
    return {k + n: v for k, v in a.items()}


def map_sum_py(a: dict) -> float:
    acc = 0.0
    for k in sorted(a):
        acc += a[k]
    return acc


def vec_cos_py(a: dict, b: dict) -> float:
    dot = map_sum_py({k: a[k] * b[k] for k in set(a) & set(b)})
    na = math.sqrt(map_sum_py({k: v * v for k, v in a.items()}))
    nb = math.sqrt(map_sum_py({k: v * v for k, v in b.items()}))
    return dot / (na * nb)


# ---------------------------------------------------------------------------
# T3 — CBOW tokenize (context window ±1, shift-concatenated, 3×D dims)
# ---------------------------------------------------------------------------

def charbag_map(token: Column | str) -> Column:
    """Char-bag of a token as map<codepoint,double> — the sparse char-count
    vector of BagOfCharsModel.Tokenize (BagOfCharsModel.cs:38-49).  Key =
    UTF-16 code unit (BMP code point) via ascii(); count = occurrences."""
    t = _c(token)
    chars = F.array_distinct(F.filter(F.split(t, ""), lambda x: x != ""))
    return F.map_from_arrays(
        F.transform(chars, lambda ch: F.ascii(ch)),
        F.transform(
            chars,
            lambda ch: (
                F.length(t) - F.length(F.replace(t, ch, F.lit("")))
            ).cast("double"),
        ),
    )


def charbag_py(token: str) -> dict:
    return {ord(c): float(n) for c, n in Counter(token).items()}


def cbow_vectors(text: Column | str, dim: int = CHAR_DIM) -> Column:
    """ContinuousBagOfWordsModel.Tokenize (BagOfCharsModel.cs:108-142):
    array<struct<label:string, vec:map<int,double>>> — for token i, the
    left neighbour's char-bag at offset 0 plus the right neighbour's at
    offset 2D; a neighbourless token falls back to itself at offset D.
    Entirely JVM HOFs — one codegen'd expression per row."""
    toks = tokens_col(text)
    n = F.size(toks)

    def one(i: Column) -> Column:
        tok = F.element_at(toks, i)
        left = F.when(i > 1, charbag_map(F.element_at(toks, i - 1))) \
            .otherwise(empty_vec())
        right = F.when(
            i < n,
            F.transform_keys(
                charbag_map(F.element_at(toks, i + 1)),
                lambda k, _v: k + F.lit(2 * dim),
            ),
        ).otherwise(empty_vec())
        ctx = F.map_concat(left, right)  # key ranges disjoint: [0,D) / [2D,3D)
        vec = F.when(
            F.size(F.map_keys(ctx)) == 0,
            F.transform_keys(charbag_map(tok), lambda k, _v: k + F.lit(dim)),
        ).otherwise(ctx)
        return F.struct(tok.alias("label"), vec.alias("vec"))

    # sequence(1, 0) would DESCEND ([1,0]) on an empty token list — guard.
    return F.when(
        n == 0,
        F.array().cast(
            "array<struct<label:string,vec:map<int,double>>>"
        ),
    ).otherwise(F.transform(F.sequence(F.lit(1), n), one))


def cbow_py(text: str, dim: int = CHAR_DIM) -> list[tuple[str, dict]]:
    """Pure-python twin of cbow_vectors."""
    toks = tokenize_py(text)
    out: list[tuple[str, dict]] = []
    for i, tok in enumerate(toks):
        vec: dict = {}
        if i - 1 >= 0:
            vec.update(charbag_py(toks[i - 1]))
        if i + 1 < len(toks):
            vec.update(vec_shift_py(charbag_py(toks[i + 1]), 2 * dim))
        if not vec:
            vec = vec_shift_py(charbag_py(tok), dim)
        out.append((tok, vec))
    return out


# ---------------------------------------------------------------------------
# F4 — vector (de)serialize: reference on-disk layout
# ---------------------------------------------------------------------------

def serialize_vec_py(vec: dict) -> bytes:
    """Vector.cs:74-87 layout: int32 indices then float32 values, both
    little-endian, ascending index order."""
    keys = sorted(vec)
    return (
        np.asarray(keys, dtype="<i4").tobytes()
        + np.asarray([vec[k] for k in keys], dtype="<f4").tobytes()
    )


def deserialize_vec_py(buf: bytes) -> dict:
    n = len(buf) // 8
    idx = np.frombuffer(buf[: 4 * n], dtype="<i4")
    val = np.frombuffer(buf[4 * n:], dtype="<f4")
    return {int(i): float(v) for i, v in zip(idx, val)}


def serialize_vec_col(vec: Column | str) -> Column:
    """Arrow-batched serializer (cold path: storage/export, not queries)."""

    @F.pandas_udf("binary")
    def _ser(maps: pd.Series) -> pd.Series:
        return maps.apply(lambda m: serialize_vec_py(m) if m is not None else None)

    return _ser(_c(vec))


# ---------------------------------------------------------------------------
# T6 — streamed cosine: score straight off the serialized bytes
# ---------------------------------------------------------------------------

def cos_serialized_col(query_vec: dict, buf: Column | str) -> Column:
    """DistanceCalculator.CosAngle(vec, offset, count, stream)
    (DistanceCalculator.cs:22-45): the stored operand is decoded from its
    packed (indices,values) form per row; the query stays in memory.
    Arrow-batched numpy — no per-row python object churn."""
    q_norm = math.sqrt(sum(v * v for v in query_vec.values())) or 1.0
    q_idx = np.asarray(sorted(query_vec), dtype=np.int64)
    q_val = np.asarray([float(query_vec[k]) for k in sorted(query_vec)])

    @F.pandas_udf("double")
    def _cos(bufs: pd.Series) -> pd.Series:
        def one(b: bytes | None) -> float | None:
            if b is None:
                return None
            n = len(b) // 8
            idx = np.frombuffer(b[: 4 * n], dtype="<i4").astype(np.int64)
            val = np.frombuffer(b[4 * n:], dtype="<f4").astype(np.float64)
            # vectorized sparse dot: binary-search stored indices against
            # the sorted query indices (no per-component python loop)
            if len(q_idx) and n:
                pos = np.clip(np.searchsorted(q_idx, idx), 0, len(q_idx) - 1)
                hit = q_idx[pos] == idx
                dot = float((q_val[pos[hit]] * val[hit]).sum())
            else:
                dot = 0.0
            nrm = math.sqrt(float((val * val).sum()))
            return dot / (q_norm * nrm) if nrm else None

        return bufs.apply(one)

    return _cos(_c(buf))


# ---------------------------------------------------------------------------
# S7 — MNIST IDX source (distributed byte-range record reads)
# ---------------------------------------------------------------------------

def _idx_header(path: str, magic_dims: int) -> tuple[int, list[int]]:
    """Big-endian IDX header (BinaryHelper.ReadInt32WithCorrectEndianness):
    magic, then one int32 per dimension."""
    with open(path, "rb") as fh:
        head = fh.read(4 * (1 + magic_dims))
    vals = struct.unpack(f">{1 + magic_dims}i", head)
    return vals[0], list(vals[1:])


def read_mnist(
    spark: SparkSession,
    images_path: str,
    labels_path: str,
    partitions: int | None = None,
) -> DataFrame:
    """S7: MNIST IDX pair -> DataFrame(img_id, label, width, height,
    pixels:binary).  The driver reads only the two headers; pixel records
    are fetched by executors seeking into their own byte ranges of the
    fixed-size record array (offset 16 + i*w*h, labels at 8 + i), so the
    scan distributes like any splittable format.  Paths must be visible
    from executors (shared FS / object store on a real cluster)."""
    _, idims = _idx_header(images_path, 3)
    _, ldims = _idx_header(labels_path, 1)
    n, h, w = idims
    if ldims[0] != n:
        raise ValueError(f"label count {ldims[0]} != image count {n}")
    rec = w * h
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(images_path, "rb") as imgs, open(labels_path, "rb") as labs:
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                if len(ids) == 0:
                    continue
                lo, hi = int(ids.min()), int(ids.max())
                imgs.seek(16 + lo * rec)
                blob = imgs.read((hi - lo + 1) * rec)
                labs.seek(8 + lo)
                lbl = np.frombuffer(labs.read(hi - lo + 1), dtype=np.uint8)
                yield pd.DataFrame(
                    {
                        "img_id": ids,
                        "label": [int(lbl[i - lo]) for i in ids],
                        "width": w,
                        "height": h,
                        "pixels": [
                            blob[(i - lo) * rec:(i - lo + 1) * rec] for i in ids
                        ],
                    }
                )

    return (
        spark.range(n).toDF("id").repartitionByRange(parts, "id")
        .mapInPandas(
            gen,
            "img_id long, label int, width int, height int, pixels binary",
        )
    )


# ---------------------------------------------------------------------------
# T4 — image embed: pixel bytes -> dense float vector
# ---------------------------------------------------------------------------

def image_embed_col(pixels: Column | str) -> Column:
    """LinearClassifierImageModel.Tokenize (LinearClassifierImageModel
    .cs:19-25): each pixel byte becomes one float component."""

    @F.pandas_udf("array<float>")
    def _embed(bufs: pd.Series) -> pd.Series:
        return bufs.apply(
            lambda b: None if b is None
            else np.frombuffer(b, dtype=np.uint8).astype(np.float32)
        )

    return _embed(_c(pixels))


# ---------------------------------------------------------------------------
# I6 — supervised insert + nearest-exemplar classify
# ---------------------------------------------------------------------------

QUANT = 1024


def _quant_key(vec: Column | str) -> Column:
    """Exact identity key for the IdenticalAngle merge: quantized
    components (integer floor at 1/QUANT resolution) — exact equality,
    no float comparison, per the repo's T9 policy."""
    q = F.transform(
        _c(vec), lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )
    return F.md5(F.to_json(F.struct(q.alias("q"))))


def supervised_index(
    df: DataFrame, label: str = "label", vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """MergeOrAddSupervised (GraphBuilder.cs:25-69): vectors that are
    identical (quantized-exact, the IdenticalAngle analog) merge their
    doc ids — but ONLY under the same label; a label conflict raises,
    mirroring the reference's InvalidOperationException
    (GraphBuilder.cs:36-39).  One shuffle on the identity key."""
    from pyspark import StorageLevel

    merged = (
        df.groupBy(_quant_key(vec).alias("vkey"))
        .agg(
            F.min_by(F.col(vec), F.col(id_col)).alias(vec),
            F.collect_set(label).alias("_labels"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        # persist: the conflict probe below materializes the merge once;
        # without it every downstream use (classify, write) would pay the
        # identity-key shuffle a second time
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bad = merged.filter(F.size("_labels") > 1).limit(1).collect()
    if bad:
        merged.unpersist()
        raise ValueError(
            "IdenticalAngle too low: identical vectors carry labels "
            f"{sorted(bad[0]['_labels'])} (GraphBuilder.cs:36-39 analog)"
        )
    return merged.select(
        "vkey", vec, F.element_at("_labels", 1).alias(label), "doc_ids"
    )


def classify(
    test_df: DataFrame, exemplars: DataFrame,
    vec: str = "embedding", label: str = "label", id_col: str = "vec_id",
) -> DataFrame:
    """ValidateMnistCommand (ValidateMnistCommand.cs:31-46): each test
    vector is scored against the supervised index and takes the label of
    its best cosine match.  The exemplar table is broadcast (it is the
    merged/deduped index, small next to the test stream); cosine is pure
    Catalyst (zip_with/aggregate); argmax via max_by with a deterministic
    (cos, label) tie-break."""
    ex = F.broadcast(
        exemplars.select(
            F.col(vec).alias("_evec"), F.col(label).alias("_elabel")
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col(vec), F.col("_evec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    cos = (dot / (nrm(vec) * nrm("_evec"))).alias("_cos")
    return (
        test_df.crossJoin(ex)
        .select(id_col, "_elabel", cos)
        .groupBy(id_col)
        .agg(
            F.max_by("_elabel", F.struct(F.col("_cos"), F.col("_elabel")))
            .alias("pred_label"),
            F.max("_cos").alias("cos"),
        )
    )
