"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.  Everything is expressed as joins/aggregations
Catalyst can plan; hashing is JVM-side (crc32/md5/xxhash64) so there is no
per-row Python anywhere.  Pure-Python twins for the hash pipelines live
here too (tests assert parity), since reproducibility of the *candidate
pairs* is what makes distributed dedup auditable.

Scale notes:
* exact dedup = one shuffle on the fingerprint.
* shingle/LSH pipelines shuffle on (band, bucket) — bounded fan-out,
  no O(n^2) pair explosion; only same-bucket pairs are verified.
* all self-joins emit (a < b) ordered pairs to halve the pair space.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark.tokenizer import tokens_col
from resin_spark.textops import fingerprint_col

MERSENNE31 = (1 << 31) - 1


# ------------------------------------------------------------------ exact
def exact_duplicates(df: DataFrame, key: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """Groups of exact duplicates (normalized-token fingerprint):
    (fingerprint, n_dups, keep_id = min key, dup_ids)."""
    return (
        df.select(F.col(key).alias("id"), fingerprint_col(text).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Keep the min-key representative per fingerprint group — one shuffle."""
    w = df.select("*", fingerprint_col(text).alias("_fp"))
    keep = w.groupBy("_fp").agg(F.min(key).alias(key))
    return w.join(keep, ["_fp", key]).drop("_fp")


# ------------------------------------------------------------------ shingles
def shingles_col(text, k: int = 3):
    """Token k-shingles as strings."""
    toks = tokens_col(text)
    n = F.size(toks)
    idxs = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.expr("array()")
    )
    return F.transform(idxs, lambda i: F.array_join(F.slice(toks, i, k), " "))


def shingles_py(text: str, k: int = 3) -> list[str]:
    from resin_spark.tokenizer import tokenize_py

    toks = tokenize_py(text)
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ------------------------------------------------------------------ minhash
def _minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*crc32(x) + b) % M31.
    a < 2^20 keeps a*crc32 < 2^52 (no int64 overflow JVM-side)."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20), rng.randrange(0, MERSENNE31))
            for _ in range(n_hashes)]


def minhash_signature_col(text, n_hashes: int = 32, k: int = 3):
    """array<long> MinHash signature, fully JVM-side: crc32 each shingle,
    then per-permutation min via transform+aggregate."""
    params = _minhash_params(n_hashes)
    sh = shingles_col(text, k)
    crcs = F.transform(sh, lambda s: F.crc32(s.cast("binary")))
    def perm(a: int, b: int):
        # NOTE: Spark counts lambda params to bind HOF variables, so the
        # closure must be built by a factory, not via default args.
        return lambda c: (F.lit(a) * c + F.lit(b)) % F.lit(MERSENNE31)

    sig = [
        F.when(
            F.size(crcs) > 0,
            F.array_min(F.transform(crcs, perm(a, b))),
        ).otherwise(F.lit(MERSENNE31))
        for a, b in params
    ]
    return F.array(*sig)


def minhash_signature_py(text: str, n_hashes: int = 32, k: int = 3) -> list[int]:
    params = _minhash_params(n_hashes)
    crcs = [zlib.crc32(s.encode()) for s in shingles_py(text, k)]
    if not crcs:
        return [MERSENNE31] * n_hashes
    return [min((a * c + b) % MERSENNE31 for c in crcs) for a, b in params]


def minhash_candidates(df: DataFrame, key: str = "doc_id", text: str = "text",
                       n_hashes: int = 32, bands: int = 8, k: int = 3) -> DataFrame:
    """LSH banding: equal band-slices => candidate pair.  Returns distinct
    (id_a < id_b) pairs.  Shuffles on (band, bucket) only."""
    rows = n_hashes // bands
    sig = df.select(F.col(key).alias("id"),
                    minhash_signature_col(text, n_hashes, k).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(df: DataFrame, key: str = "doc_id", text: str = "text",
                  k: int = 3, threshold: float = 0.6,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all same-shingle
    pairs when candidates is None): (id_a, id_b, jaccard >= threshold).

    The no-candidates path joins on distinct shingles — the classic
    inverted-index join; a stopword-shingle cap would be added at 100 TB
    (drop shingles with df above a bound) to keep fan-out bounded."""
    sh = df.select(
        F.col(key).alias("id"),
        F.explode(F.array_distinct(shingles_col(text, k))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is None:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        # intersect sizes only for candidate pairs: join shingles twice
        shb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh"))
        inter = (
            candidates.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
            .join(shb, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    ja = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )
    return ja.filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------ simhash
def _hash64_col(c):
    """64-bit token hash from two crc32 views (JVM-reproducible in Python)."""
    lo = F.crc32(c.cast("binary"))
    hi = F.crc32(F.concat(c, F.lit("#")).cast("binary"))
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def _hash64_py(s: str) -> int:
    lo = zlib.crc32(s.encode())
    hi = zlib.crc32((s + "#").encode())
    return (hi << 32) | lo


def simhash_col(text):
    """64-bit SimHash over tokens: per bit, sign of the sum of ±1
    contributions.  Built-ins only; the 64 bit expressions are unrolled in
    Python (shift amounts must be int literals in Spark)."""
    toks = tokens_col(text)
    hashes = F.transform(toks, _hash64_col)

    def bit_sum(b: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    out = F.lit(0).cast("long")
    for b in range(64):
        mask = (1 << b) if b < 63 else -(1 << 63)  # avoid int64 overflow
        out = out.bitwiseOR(
            F.when(bit_sum(b) > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def simhash_py(text: str) -> int:
    from resin_spark.tokenizer import tokenize_py

    toks = tokenize_py(text)
    acc = [0] * 64
    for t in toks:
        h = _hash64_py(t)
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    # two's-complement int64, matching the Spark column's LongType (bit 63
    # set => negative) so the twins compare equal directly
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_candidates(df: DataFrame, key: str = "doc_id", text: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16, bucket-join,
    verify Hamming distance <= max_hamming."""
    sh = df.select(F.col(key).alias("id"), simhash_col(text).alias("sh"))
    # 4 bands of 16 bits, unrolled (shift amounts must be int literals)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("sh"), b * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("bucket"),
        )
        for b in range(4)
    ]
    banded = sh.select(
        "id", "sh", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
