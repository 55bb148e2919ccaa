"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline; dot product via
  F.zip_with + F.aggregate (JVM-side, no Python).
* LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bits of
  dot products with D deterministic hyperplanes put each vector in a
  bucket; the query probes its own bucket (+ optional multi-probe with
  Hamming-1 neighbors), so the scan touches ~n/2^D vectors instead of n.
* embedding-cosine near-duplicate pairs — same hyperplane buckets as the
  blocking key, exact cosine verification inside buckets only.

Hyperplanes are generated from a fixed seed (numpy PRNG) and folded into
the plan as literals, so Spark and the pure-Python twin agree exactly on
bucket assignment.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(vec_col, qvec: list[float]):
    """JVM-side dot product with a literal query vector."""
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
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0
    cos = _dot(F.col(vec), qvec) / (_norm(F.col(vec)) * F.lit(qn))
    return (
        df.select(F.col(key), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_col(vec_col, planes: np.ndarray):
    """LSH bucket id = sign bits of dot(vec, plane_i)."""
    bits = []
    for i, p in enumerate(planes):
        bits.append(
            F.when(_dot(vec_col, p.tolist()) > 0,
                   F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def bucket_py(v: list[float], planes: np.ndarray) -> int:
    out = 0
    for i, p in enumerate(planes):
        # mirror the JVM float64 op order: sum of x*y left to right
        s = 0.0
        for x, y in zip(v, p.tolist()):
            s += float(np.float64(x)) * y
        if s > 0:
            out |= 1 << i
    return out


def ann_topk(df: DataFrame, qvec: list[float], k: int = 10,
             key: str = "vec_id", vec: str = "embedding",
             n_planes: int = 8, seed: int = 42,
             multiprobe: bool = True) -> DataFrame:
    """ANN top-k: probe the query's hyperplane bucket (+ Hamming-1
    neighbors when multiprobe) with exact cosine re-ranking inside.
    At 100 TB the table is written bucketed by `bucket` so this becomes a
    partition-pruned scan of ~(1+D)/2^D of the data."""
    dim = len(qvec)
    planes = hyperplanes(dim, n_planes, seed)
    qb = bucket_py([float(x) for x in qvec], planes)
    probes = [qb] + ([qb ^ (1 << i) for i in range(n_planes)] if multiprobe else [])
    bucketed = df.withColumn("bucket", bucket_col(F.col(vec), planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, qvec, k=k, key=key, vec=vec)


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         key: str = "vec_id", vec: str = "embedding",
                         n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Embedding near-duplicate pairs: hyperplane bucket as blocking key,
    exact cosine verification within buckets, (a < b) ordered."""
    first = df.select(F.col(key).alias("id"), F.col(vec).alias("v")).first()
    dim = len(first["v"]) if first else 2
    planes = hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(key).alias("id"),
        F.col(vec).alias("v"),
        bucket_col(F.col(vec), planes).alias("bucket"),
        _norm(F.col(vec)).alias("nrm"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
    )
    dot = F.aggregate(
        F.zip_with(F.col("l.v"), F.col("r.v"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("l.nrm") * F.col("r.nrm"))
    return (
        pairs.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
