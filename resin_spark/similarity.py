"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline; dot product via
  F.zip_with + F.aggregate (JVM-side, no Python).
* LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bits of
  dot products with D deterministic hyperplanes put each vector in a
  bucket; the query probes its own bucket (+ optional multi-probe with
  Hamming-1 neighbors), so the scan touches ~n/2^D vectors instead of n.
* embedding-cosine near-duplicate pairs — multi-band hyperplane buckets
  as the blocking key (pairs differing in a few plane bits still collide
  in some band), exact cosine verification inside buckets only, and a
  per-bucket size cap so a degenerate bucket cannot go O(n^2).  Buckets
  over the cap are recursively RE-SPLIT on extra hyperplanes (bounded
  depth); a terminal bucket that still won't split (near-identical
  vectors agree with every plane) emits hub pairs — each member paired
  with the bucket's min id — so dense duplicate clusters stay connected
  for downstream connected-components at linear, not quadratic, cost.
* materialized bucketed layout (`write_bucketed_embeddings`) — persists
  bucket as a PARTITION column (plus band/sub-bucket columns and norms),
  so `ann_topk_bucketed` probes become partition-pruned scans reading
  ~probes/2^D of the files, and `cosine_neardup_pairs_bucketed` skips
  recomputing every hyperplane dot product.  This is the 100 TB path —
  the role of Resin's persisted `.ix` column files
  (/root/reference/src/Sir.VectorSpace/ColumnReader.cs:37-69), where
  candidate pruning happens against stored structure, not per-query
  recomputation.

Hyperplane components are INTEGERS derived from md5 (`int_planes`) and
embeddings are quantized to integers (`floor(x*1024 + 0.5)`) before the
sign test, so bucket assignment is exact integer arithmetic — bit-equal
across Spark, DuckDB (the correctness oracle) and pure Python, with no
float-summation-order hazard.  Exact cosine (the verify/rank step) stays
float64 over the ORIGINAL embeddings; quantization only affects recall,
never reported scores.  Mirrors the role of Resin's cosine tree walk
(/root/reference/src/Sir.VectorSpace/PathFinder.cs:8-46) as the
approximate candidate generator in front of exact scoring.
"""

from __future__ import annotations

import hashlib
import math
from functools import reduce as _functools_reduce

import pandas as pd  # noqa: F401 - resolves pandas-UDF type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1024  # embedding quantization scale for bucket bits


def _dot(vec_col, qvec: list[float]):
    """JVM-side float64 dot product with a literal query vector."""
    lit = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(df: DataFrame, qvec: list[float], k: int = 10,
                key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: one scan + TakeOrderedAndProject."""
    qn = math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0
    cos = _dot(F.col(vec), qvec) / (_norm(F.col(vec)) * F.lit(qn))
    return (
        df.select(F.col(key), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


# --------------------------------------------------------------- LSH planes
def int_planes(dim: int, n_planes: int = 8, tag: str = "plane") -> list[list[int]]:
    """Deterministic integer hyperplanes: component (i, d) is a 16-bit
    signed int derived from md5(f"{tag}{i}_{d}") — reproducible in any
    engine without a PRNG, inlined as literals in plans and oracle SQL."""
    return [
        [
            int(hashlib.md5(f"{tag}{i}_{d}".encode()).hexdigest()[:4], 16) - 32768
            for d in range(dim)
        ]
        for i in range(n_planes)
    ]


def quantize_col(vec_col):
    """array<long> quantized embedding: floor(x*QUANT + 0.5) — exact and
    identical in Spark, DuckDB and Python for float32 inputs."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"),
    )


def quantize_py(v: list[float]) -> list[int]:
    return [int(math.floor(float(x) * QUANT + 0.5)) for x in v]


def _int_dot_col(qcol, plane: list[int]):
    lit = F.array(*[F.lit(int(p)).cast("long") for p in plane])
    return F.aggregate(
        F.zip_with(qcol, lit, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def bucket_col(vec_col, planes: list[list[int]]):
    """LSH bucket id = sign bits of integer dot(quantize(vec), plane_i)."""
    qcol = quantize_col(vec_col)
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        out = out.bitwiseOR(
            F.when(_int_dot_col(qcol, p) > 0,
                   F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return out


def bucket_py(v: list[float], planes: list[list[int]]) -> int:
    q = quantize_py(v)
    out = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(q, p)) > 0:
            out |= 1 << i
    return out


def ann_topk(df: DataFrame, qvec: list[float], k: int = 10,
             key: str = "vec_id", vec: str = "embedding",
             n_planes: int = 8,
             multiprobe: bool = True, probe_hamming: int = 1) -> DataFrame:
    """ANN top-k: probe the query's hyperplane bucket plus all buckets
    within Hamming distance `probe_hamming` (when multiprobe), with exact
    cosine re-ranking inside.  Scan fraction ~= C(D,<=H)/2^D: D=8, H=1
    scans ~3.5% of the data (recall@10 ~0.75 on clustered corpora), H=2
    scans ~14.5% (recall ~0.9) — recall/cost dial, measured in bench.py.
    At 100 TB use write_bucketed_embeddings + ann_topk_bucketed instead:
    same probe set, but the filter lands on a partition column so the
    scan reads only the probed directories."""
    planes = int_planes(len(qvec), n_planes)
    probes = ann_probes(qvec, planes, multiprobe, probe_hamming)
    bucketed = df.withColumn("bucket", bucket_col(F.col(vec), planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, qvec, k=k, key=key, vec=vec)


def neardup_bucket_stats(df: DataFrame, key: str = "vec_id",
                         vec: str = "embedding", n_planes: int = 16,
                         bands: int = 4, dim: int | None = None) -> DataFrame:
    """Per-(band, bucket) level-0 sizes for cosine_neardup_pairs — the
    operator's skew metric.  Buckets above the cap are no longer dropped
    (they re-split / fall back to hub pairs) but still show up here as
    the hotspots that paid the extra split levels."""
    bits = n_planes // bands
    planes = int_planes(dim or _dim_of(df, vec), n_planes)
    b = df.select(
        F.col(key).alias("id"),
        *_band_cols(F.col(vec), planes, bands, bits),
    )
    bb = _explode_bands(b, bands)
    return bb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))


def _dim_of(df: DataFrame, vec: str) -> int:
    """Fallback when no ``dim=`` was passed: one driver ``first()`` to
    learn the embedding width.  Pass ``dim`` to keep plan construction
    action-free."""
    first = df.select(F.col(vec).alias("v")).first()
    return len(first["v"]) if first and first["v"] is not None else 2


def resplit_planes(dim: int, bands: int, bits: int,
                   depth: int) -> list[list[list[int]]]:
    """Per-level re-split hyperplanes: level d uses ``bands*bits`` fresh
    planes tagged ``rs{d}_`` so sub-buckets are independent of the base
    band planes (and of each other across levels)."""
    return [int_planes(dim, bands * bits, tag=f"rs{d}_") for d in range(depth)]


def _band_cols(vec_col, planes: list[list[int]], bands: int, bits: int):
    """One bucket column per band: sign bits of planes [band*bits, +bits)."""
    qcol = quantize_col(vec_col)
    cols = []
    for band in range(bands):
        v = F.lit(0).cast("long")
        for j in range(bits):
            p = planes[band * bits + j]
            v = v.bitwiseOR(
                F.when(_int_dot_col(qcol, p) > 0,
                       F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        cols.append(v.alias(f"b{band}"))
    return cols


def _explode_bands(b: DataFrame, bands: int) -> DataFrame:
    structs = [
        F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("bucket"))
        for i in range(bands)
    ]
    return b.select(
        "*", F.explode(F.array(*structs)).alias("bb")
    ).select(b.columns + [F.col("bb.band").alias("band"),
                          F.col("bb.bucket").alias("bucket")])


def _sub_bucket_cols(vec_col, rs: list[list[list[int]]], bands: int,
                     bits: int):
    """Per-(level, band) re-split sub-bucket columns ``s{d}_{band}``
    (``bits`` sign bits each, from that level's fresh planes)."""
    qcol = quantize_col(vec_col)
    cols = []
    for d, planes in enumerate(rs):
        for band in range(bands):
            v = F.lit(0).cast("long")
            for j in range(bits):
                p = planes[band * bits + j]
                v = v.bitwiseOR(
                    F.when(_int_dot_col(qcol, p) > 0,
                           F.lit(1 << j).cast("long"))
                    .otherwise(F.lit(0).cast("long"))
                )
            cols.append(v.alias(f"s{d}_{band}"))
    return cols


def _explode_banded_keys(b: DataFrame, bands: int, depth: int,
                         resplit_bits: int) -> DataFrame:
    """(id, band, k0..k{depth}) rows from per-band bucket + sub-bucket
    columns.  Level keys nest: k_{d+1} = k_d * 2^bits + s_d, so two rows
    share k_{d+1} iff they shared every coarser key — counts at level
    d+1 partition counts at level d."""
    structs = []
    for band in range(bands):
        fields = [F.lit(band).alias("band"),
                  F.col(f"b{band}").alias("k0")]
        prev = F.col(f"b{band}")
        for d in range(depth):
            nxt = prev * F.lit(1 << resplit_bits) + F.col(f"s{d}_{band}")
            fields.append(nxt.alias(f"k{d + 1}"))
            prev = nxt
        structs.append(F.struct(*fields))
    bb = b.select("id", F.explode(F.array(*structs)).alias("bb"))
    return bb.select(
        "id", F.col("bb.band").alias("band"),
        *[F.col(f"bb.k{d}").alias(f"k{d}") for d in range(depth + 1)],
    )


def capped_bucket_pairs(bbk: DataFrame, depth: int,
                        max_bucket: int) -> DataFrame:
    """Within-bucket candidate pairs with a hard per-bucket work cap —
    the shared blocking core of every LSH family here (embedding
    hyperplanes AND text MinHash).

    ``bbk`` = (id, band, k0..k{depth}) banded keys, where k{d+1} is a
    REFINEMENT of k{d} (keys nest, so all members of a bucket move down
    together).  Each row's FINAL depth is the first level whose bucket
    count is <= max_bucket; full within-bucket pairs there (work per
    bucket <= max_bucket^2/2).  Rows over the cap even at the last level
    (a dense cluster whose members agree with every split key) emit HUB
    pairs — (min id of bucket, member) — keeping the cluster connected
    at O(n) cost instead of silently dropping it.  Window counts/mins
    run over slim (id, band, keys) rows only.  Returns distinct
    (id_a < id_b) pairs."""
    from pyspark.sql.window import Window

    key_type = dict(bbk.dtypes)["k0"]
    cc = bbk
    for d in range(depth + 1):
        w = Window.partitionBy("band", f"k{d}")
        cc = cc.withColumn(f"c{d}", F.count(F.lit(1)).over(w))
        if d == depth:
            cc = cc.withColumn("hub", F.min("id").over(w))

    depth_expr = F.lit(None).cast("int")
    key_expr = F.lit(None).cast(key_type)
    for d in range(depth, -1, -1):
        under = F.col(f"c{d}") <= max_bucket
        depth_expr = F.when(under, F.lit(d)).otherwise(depth_expr)
        key_expr = F.when(under, F.col(f"k{d}")).otherwise(key_expr)
    terminal = _functools_reduce(
        lambda a, b: a & b,
        [F.col(f"c{d}") > max_bucket for d in range(depth + 1)],
    )
    asg = cc.select(
        "id", "band", depth_expr.alias("depth"), key_expr.alias("keyf"),
        terminal.alias("term"), "hub",
    )

    l, r = asg.alias("l"), asg.alias("r")
    full = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.depth") == F.col("r.depth"))
            & (F.col("l.keyf") == F.col("r.keyf"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    hubp = (
        asg.filter(F.col("term") & (F.col("id") > F.col("hub")))
        .select(F.col("hub").alias("id_a"), F.col("id").alias("id_b"))
    )
    return full.unionByName(hubp).dropDuplicates(["id_a", "id_b"])


def _neardup_core(bbk: DataFrame, vdf: DataFrame, depth: int,
                  threshold: float, max_bucket: int) -> DataFrame:
    """Capped within-bucket pair generation (capped_bucket_pairs) +
    exact-cosine verify over the ORIGINAL embeddings, joined back by id.
    ``vdf`` = (id, v, nrm)."""
    cand = capped_bucket_pairs(bbk, depth, max_bucket)

    a = vdf.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                   F.col("nrm").alias("na"))
    b = vdf.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                   F.col("nrm").alias("nb"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         key: str = "vec_id", vec: str = "embedding",
                         n_planes: int = 16, bands: int = 4,
                         max_bucket: int = 2000, resplit_bits: int = 4,
                         resplit_depth: int = 2,
                         dim: int | None = None) -> DataFrame:
    """Embedding near-duplicate pairs, (a < b) ordered, exact-cosine
    verified.  Blocking: `bands` bands of n_planes/bands hyperplane sign
    bits each — a pair is a candidate if it collides in ANY band, so
    near-dups that differ in a couple of plane signs are still found
    (multi-band = Hamming-tolerant).  Buckets larger than `max_bucket`
    re-split on `resplit_bits` fresh planes per level for up to
    `resplit_depth` levels (candidate work per bucket stays
    <= max_bucket^2 / 2); a bucket still over the cap at the last level
    emits hub pairs instead of being dropped (see _neardup_core) — no
    silent recall collapse on dense duplicate clusters.  For repeated /
    large-scale runs, persist the layout once with
    write_bucketed_embeddings and use cosine_neardup_pairs_bucketed."""
    bits = n_planes // bands
    d = dim or _dim_of(df, vec)
    planes = int_planes(d, n_planes)
    rs = resplit_planes(d, bands, resplit_bits, resplit_depth)
    b = df.select(
        F.col(key).alias("id"),
        *_band_cols(F.col(vec), planes, bands, bits),
        *_sub_bucket_cols(F.col(vec), rs, bands, resplit_bits),
    )
    bbk = _explode_banded_keys(b, bands, resplit_depth, resplit_bits)
    vdf = df.select(F.col(key).alias("id"), F.col(vec).alias("v"),
                    _norm(F.col(vec)).alias("nrm"))
    return _neardup_core(bbk, vdf, resplit_depth, threshold, max_bucket)


# ------------------------------------------------- materialized layout
def write_bucketed_embeddings(df: DataFrame, root: str, n_planes: int = 8,
                              bands: int = 4, band_planes: int = 16,
                              resplit_bits: int = 4, resplit_depth: int = 2,
                              key: str = "vec_id", vec: str = "embedding",
                              dim: int | None = None) -> dict:
    """Persist the embedding table in a bucket-partitioned layout:
    ``{root}/data/bucket=B/...`` Parquet plus ``{root}/meta.json``.

    Stored per row: the key, the raw embedding, its float64 norm, the
    ANN probe bucket (``n_planes`` sign bits — the PARTITION column, so
    probe filters prune at the directory level), the near-dup band
    buckets ``b0..b{bands-1}`` and the re-split sub-buckets
    ``s{d}_{band}``.  Every hyperplane dot product is paid once at write
    time; ann_topk_bucketed / cosine_neardup_pairs_bucketed read stored
    integers.  At 100 TB add a salt to the repartition so one bucket
    spans several files; the partition-pruning contract is unchanged."""
    import json
    import os

    d = dim or _dim_of(df, vec)
    bits = band_planes // bands
    planes = int_planes(d, max(n_planes, band_planes))
    rs = resplit_planes(d, bands, resplit_bits, resplit_depth)
    out = df.select(
        F.col(key),
        F.col(vec),
        _norm(F.col(vec)).alias("nrm"),
        bucket_col(F.col(vec), planes[:n_planes]).alias("bucket"),
        *_band_cols(F.col(vec), planes[:band_planes], bands, bits),
        *_sub_bucket_cols(F.col(vec), rs, bands, resplit_bits),
    )
    (out.repartition("bucket")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(root, "data")))
    _evict_layout(root)
    meta = {"key": key, "vec": vec, "dim": d, "quant": QUANT,
            "n_planes": n_planes, "bands": bands, "band_planes": band_planes,
            "resplit_bits": resplit_bits, "resplit_depth": resplit_depth}
    # driver-side local write; on an object store route through the
    # Hadoop FS API instead
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def read_bucketed_meta(root: str) -> dict:
    import json
    import os

    with open(os.path.join(root, "meta.json")) as fh:
        return json.load(fh)


# Opened layout DataFrames, keyed by (session, data dir).  The FIRST
# read of a bucket-partitioned layout pays a partition-directory listing
# JOB — O(#bucket dirs) tasks once the dir count crosses Spark's
# parallel-discovery threshold (32), i.e. ~every real layout — measured
# at 570 listing tasks per query vs 4 pruned scan tasks on the bench
# fixture.  Reusing the DataFrame reuses its cached FileIndex, so every
# later query goes straight to the pruned scan: the same listing-reuse
# SearchEngine applies to the docs/postings tables.
_LAYOUT_DF_CACHE: dict = {}
_LAYOUT_DF_CACHE_MAX = 64  # FIFO-bounded: a long-lived server scanning
# many layouts must not pin every FileIndex it ever opened


def _layout_df(spark, root: str):
    import os

    data_dir = os.path.join(root, "data")
    # keyed on applicationId, not id(spark): id() values are reused after
    # a stopped session is garbage-collected, which could serve a new
    # session a DataFrame bound to the dead one.  applicationId itself is
    # a py4j round trip, so it is memoized ON the SparkContext object —
    # an attribute dies with the context, unlike an id()-keyed dict entry
    sc = spark.sparkContext
    app_id = getattr(sc, "_resin_app_id", None)
    if app_id is None:
        app_id = sc.applicationId
        sc._resin_app_id = app_id
    key = (app_id, data_dir)
    df = _LAYOUT_DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(data_dir)
        if len(_LAYOUT_DF_CACHE) >= _LAYOUT_DF_CACHE_MAX:
            _LAYOUT_DF_CACHE.pop(next(iter(_LAYOUT_DF_CACHE)))
        _LAYOUT_DF_CACHE[key] = df
    return df


def _evict_layout(root: str) -> None:
    """Drop cached readers of a layout (called by the writers: an
    overwritten layout must not serve a stale file listing).

    Limitation: eviction is in-process only — a layout overwritten by a
    DIFFERENT process (or another Spark session on the same path) is not
    seen here, and this process keeps serving the old file listing until
    it rewrites the layout itself or restarts.  Same contract as Spark's
    own FileIndex caching of an unmanaged path; cross-process writers
    coordinate through the engine's pointer-file snapshots instead."""
    import os

    data_dir = os.path.join(root, "data")
    for key in [k for k in _LAYOUT_DF_CACHE if k[1] == data_dir]:
        del _LAYOUT_DF_CACHE[key]


def ann_probes(qvec: list[float], planes: list[list[int]],
               multiprobe: bool = True, probe_hamming: int = 1) -> list[int]:
    """Probe bucket set for a query: its own bucket plus all buckets
    within the given Hamming distance (multi-probe)."""
    n = len(planes)
    qb = bucket_py([float(x) for x in qvec], planes)
    probes = {qb}
    if multiprobe and probe_hamming >= 1:
        probes |= {qb ^ (1 << i) for i in range(n)}
    if multiprobe and probe_hamming >= 2:
        probes |= {qb ^ (1 << i) ^ (1 << j)
                   for i in range(n) for j in range(i + 1, n)}
    return sorted(probes)


def ann_topk_bucketed(spark, root: str, qvec: list[float], k: int = 10,
                      multiprobe: bool = True,
                      probe_hamming: int = 1) -> DataFrame:
    """ANN top-k over the materialized layout: the probe filter lands on
    the PARTITION column, so the scan reads only the probed bucket
    directories (PartitionFilters in the plan — files read ∝ probed
    buckets, the 100 TB path).  Exact cosine re-rank uses the stored
    norm; no hyperplane dot product is recomputed at query time."""
    import math as _math
    import os

    meta = read_bucketed_meta(root)
    planes = int_planes(meta["dim"], max(meta["n_planes"],
                                         meta["band_planes"]))[:meta["n_planes"]]
    probes = ann_probes(qvec, planes, multiprobe, probe_hamming)
    cand = _layout_df(spark, root).filter(F.col("bucket").isin(probes))
    qn = _math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0
    cos = _dot(F.col(meta["vec"]), qvec) / (F.col("nrm") * F.lit(qn))
    return (
        cand.select(F.col(meta["key"]), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(meta["key"]))
        .limit(k)
    )


# ------------------------------------------------------------------ IVF
# The second classic ANN family next to LSH: an IVF (inverted-file) index
# with a k-means coarse quantizer.  Train centroids with distributed
# Lloyd iterations (assignment = Arrow-batched broadcast matmul on the
# executors; update = exact int64 per-dimension sums so the reduce is
# order-independent), persist the table partitioned by nearest-centroid
# cell, and answer queries by probing the n_probes nearest cells with an
# exact cosine re-rank — a partition-pruned scan reading ~n_probes/k of
# the files.  Role analog of the reference's trained vector-space tree
# (/root/reference/src/Sir.VectorSpace/GraphBuilder.cs:15-76: centroids
# emerge from IdenticalAngle/FoldAngle merges; here from k-means), which
# likewise routes a query down stored cluster representatives instead of
# scanning every vector.  K-means is iterative, so this family has no
# one-shot SQL oracle; correctness is pinned by determinism + recall
# floors + partition-pruning plan gates in tests/test_dedup_textops.py.


def _assign_cluster_udf(centroids):
    """pandas UDF: nearest-centroid id by cosine (argmax of normalized
    matmul; ties -> lowest id).  Broadcast-matmul is the scale path for
    large k — a k*dim literal expression tree would not codegen."""
    import numpy as np
    import pandas as pd  # noqa: F811 - also module-level for UDF hints

    cn = np.asarray(centroids, dtype=np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(v @ cn.T, axis=1).astype("int32"))

    return assign


def train_ivf_centroids(df: DataFrame, n_clusters: int = 16, iters: int = 5,
                        key: str = "vec_id", vec: str = "embedding",
                        dim: int | None = None) -> list[list[float]]:
    """Distributed Lloyd k-means over the embedding column, deterministic
    end to end:

    * init: the ``n_clusters`` rows with the smallest md5(key) lane — a
      seedless pseudo-random draw reproducible in any engine;
    * assignment: Arrow-batched broadcast matmul (numpy float64, ties to
      the lowest centroid id);
    * update: per-cell element-wise sums of the QUANTIZED (int64)
      embeddings — integer adds commute, so the shuffle reduce is exact
      and order-independent; centroids derive from the exact sums on the
      driver.  Only k*dim ints + k counts cross to the driver per round.

    Empty cells keep their previous centroid.  At 10^12 rows train on a
    hash-sampled subset (``df.filter(md5-lane < rate)``) — the update
    shuffle is one groupBy over k cells either way."""
    d = dim or _dim_of(df, vec)
    from resin_spark.dedup import _md5_lane_col

    seeds = (
        df.select(F.col(vec).alias("v"),
                  _md5_lane_col(F.col(key).cast("string"), 1).alias("h"))
        .orderBy("h")
        .limit(n_clusters)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in seeds]
    if len(cents) < n_clusters:
        n_clusters = len(cents)

    qv = df.select(quantize_col(F.col(vec)).alias("q"), F.col(vec).alias("v"))
    for _ in range(iters):
        assigned = qv.withColumn("cl", _assign_cluster_udf(cents)(F.col("v")))
        agg = (
            assigned.groupBy("cl")
            .agg(F.count(F.lit(1)).alias("n"),
                 *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                   for i in range(d)])
            .collect()
        )
        nxt = list(cents)
        for r in agg:
            if r["n"]:
                nxt[r["cl"]] = [r[f"s{i}"] / (r["n"] * QUANT)
                                for i in range(d)]
        cents = nxt
    return cents


def write_ivf_embeddings(df: DataFrame, root: str, n_clusters: int = 16,
                         iters: int = 5, key: str = "vec_id",
                         vec: str = "embedding",
                         dim: int | None = None) -> dict:
    """Persist the embedding table partitioned by IVF cell:
    ``{root}/data/cl=C/...`` Parquet + ``{root}/meta.json`` holding the
    trained centroids.  Stored per row: key, raw embedding, float64 norm,
    cell id.  Queries prune at the directory level (see ivf_topk)."""
    import json
    import os

    d = dim or _dim_of(df, vec)
    cents = train_ivf_centroids(df, n_clusters, iters, key, vec, dim=d)
    out = df.select(
        F.col(key), F.col(vec), _norm(F.col(vec)).alias("nrm"),
        _assign_cluster_udf(cents)(F.col(vec)).alias("cl"),
    )
    (out.repartition("cl")
        .write.mode("overwrite").partitionBy("cl")
        .parquet(os.path.join(root, "data")))
    _evict_layout(root)
    meta = {"key": key, "vec": vec, "dim": d, "n_clusters": len(cents),
            "centroids": cents}
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_probes(qvec: list[float], centroids: list[list[float]],
               n_probes: int) -> list[int]:
    """The n_probes nearest cells to the query, by cosine (driver-side:
    k*dim floats, no Spark job)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(c @ q), kind="stable")
    return sorted(int(i) for i in order[:n_probes])


def ivf_topk(spark, root: str, qvec: list[float], k: int = 10,
             n_probes: int = 4) -> DataFrame:
    """ANN top-k over the IVF layout: probe the n_probes nearest cells
    (filter on the PARTITION column -> files read ∝ probed cells), exact
    cosine re-rank with the stored norm.  recall/cost dial = n_probes/k
    cells scanned."""
    import math as _math
    import os

    meta = read_ivf_meta(root)
    probes = ivf_probes(qvec, meta["centroids"], n_probes)
    cand = _layout_df(spark, root).filter(F.col("cl").isin(probes))
    qn = _math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0
    cos = _dot(F.col(meta["vec"]), qvec) / (F.col("nrm") * F.lit(qn))
    return (
        cand.select(F.col(meta["key"]), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(meta["key"]))
        .limit(k)
    )


def read_ivf_meta(root: str) -> dict:
    import json
    import os

    with open(os.path.join(root, "meta.json")) as fh:
        return json.load(fh)


def cosine_neardup_pairs_bucketed(spark, root: str, threshold: float = 0.95,
                                  max_bucket: int = 2000) -> DataFrame:
    """cosine_neardup_pairs over the materialized layout: band and
    sub-bucket keys come from storage, so the pair-generation pass reads
    slim integer columns (column pruning keeps the embedding vectors out
    of the window shuffles entirely) and recomputes zero dot products.
    Results are identical to the inline operator at the same params."""
    import os

    meta = read_bucketed_meta(root)
    t = _layout_df(spark, root)
    bands, depth = meta["bands"], meta["resplit_depth"]
    b = t.select(
        F.col(meta["key"]).alias("id"),
        *[F.col(f"b{i}") for i in range(bands)],
        *[F.col(f"s{d}_{i}") for d in range(depth) for i in range(bands)],
    )
    bbk = _explode_banded_keys(b, bands, depth, meta["resplit_bits"])
    vdf = t.select(F.col(meta["key"]).alias("id"),
                   F.col(meta["vec"]).alias("v"), "nrm")
    return _neardup_core(bbk, vdf, depth, threshold, max_bucket)


# ------------------------------------------------------------- kNN join
def knn_join(corpus: DataFrame, queries: list[tuple], k: int = 10,
             key: str = "vec_id", vec: str = "embedding",
             round_dp: int = 6) -> DataFrame:
    """Exact k-NN JOIN: for EVERY query vector, the top-k corpus rows by
    cosine — the batch form of retrieval evaluation / hard-negative
    mining (one pass over the corpus for all queries, instead of one
    ``cosine_topk`` scan per query).

    ``queries`` is a list of (query_id, vector) pairs — the broadcast
    side, bounded by driver memory (size-gate upstream; at millions of
    queries switch to the bucketed layouts and probe per shard).

    Plan shape (the 100 TB story):
      * one ``mapInPandas`` pass over corpus partitions: each Arrow batch
        computes a normalized float64 matmul (batch_rows x dim) @
        (dim x n_queries) and keeps a RUNNING top-k per query within the
        partition — so the pass emits at most ``partitions * n_q * k``
        rows, never ``corpus * n_q``;
      * one ``row_number`` window over (query, cosine desc, id asc) picks
        the global top-k — the only shuffle, on the (small) candidate set.

    Cosine is rounded to ``round_dp`` decimals BEFORE ranking (both here
    and in the DuckDB oracle) so the rank order is engine-independent:
    float64 matmul and a sequential SQL dot product can disagree at
    ~1e-13, which must not flip a rank.  Ties break by ascending
    corpus id.  Role analog: the reference answers each query by a
    cosine walk over its vector tree (PathFinder.cs:8-46); the join form
    amortizes the corpus pass across the whole query batch.
    """
    import numpy as np
    from pyspark.sql.window import Window

    qids = [q[0] for q in queries]
    qm = np.asarray([[float(x) for x in q[1]] for q in queries],
                    dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)
    nq = len(qids)

    def part(batches):
        import pandas as pd

        ids_acc: list = []
        cos_acc: list = []

        def compact():
            # bound the running candidate pool: union of per-query top-k
            nonlocal ids_acc, cos_acc
            ids = np.concatenate(ids_acc)
            cs = np.vstack(cos_acc)
            keep: set[int] = set()
            for j in range(nq):
                order = np.lexsort((ids, -cs[:, j]))[:k]
                keep.update(order.tolist())
            keep_idx = np.asarray(sorted(keep), dtype=np.int64)
            ids_acc, cos_acc = [ids[keep_idx]], [cs[keep_idx]]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                               1e-300)
            ids_acc.append(pdf["id"].to_numpy())
            cos_acc.append(np.round(v @ qm.T, round_dp))  # (rows, nq)
            if len(ids_acc) > 8:
                compact()
        if not ids_acc:
            return
        compact()
        ids, cs = ids_acc[0], cos_acc[0]
        out_q, out_id, out_cos = [], [], []
        for j in range(nq):
            order = np.lexsort((ids, -cs[:, j]))[:k]
            out_q.extend([qids[j]] * len(order))
            out_id.extend(ids[order].tolist())
            out_cos.extend(cs[order, j].tolist())
        yield pd.DataFrame({"q_id": out_q, "n_id": out_id,
                            "cosine": out_cos})

    src = corpus.select(F.col(key).alias("id"), F.col(vec).alias("v"))
    qid_type = "string" if isinstance(qids[0], str) else "long"
    cand = src.mapInPandas(
        part, schema=f"q_id {qid_type}, n_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("cosine"), "rank")
    )
