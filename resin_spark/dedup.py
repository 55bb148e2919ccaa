"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.  Everything is expressed as joins/aggregations
Catalyst can plan; hashing is JVM-side (md5 lanes) so there is no per-row
Python anywhere.  Pure-Python twins for the hash pipelines live here too
(tests assert parity), since reproducibility of the *candidate pairs* is
what makes distributed dedup auditable.

All hash pipelines derive from md5 32-bit lanes (`_h32 lanes`), which are
computable identically in Spark (`conv(substring(md5(x),..),16,10)`),
DuckDB (`('0x'||substr(md5(x),..))::BIGINT`) and Python (`hashlib.md5`) —
so every candidate-pair query has a full SQL oracle, not just a twin.

Scale notes:
* exact dedup = one shuffle on the fingerprint.
* shingle/LSH pipelines shuffle on (band, bucket) — bounded fan-out,
  no O(n^2) pair explosion; only same-bucket pairs are verified.
* the shingle inverted-index join caps shingle document frequency
  (`max_df`) so one stopword shingle cannot create O(n^2) join rows.
* all self-joins emit (a < b) ordered pairs to halve the pair space.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resin_spark.tokenizer import tokens_col
from resin_spark.textops import fingerprint_col

MERSENNE31 = (1 << 31) - 1


def _md5_lane_col(c, start: int):
    """One 32-bit lane of md5(c) as a long: hex chars [start, start+8)."""
    return F.conv(F.substring(F.md5(c), start, 8), 16, 10).cast("long")


def _md5_lanes_py(s: str) -> tuple[int, int]:
    h = hashlib.md5(s.encode()).hexdigest()
    return int(h[0:8], 16), int(h[8:16], 16)


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
def minhash_signature_col(text, n_hashes: int = 32, k: int = 3):
    """array<long> MinHash signature, fully JVM-side.  Double hashing
    (Kirsch-Mitzenmacher): h_i(s) = (h1(s) + i*h2(s)) % M31 where h1/h2
    are the two md5 32-bit lanes of the shingle — so the same signature is
    computable in DuckDB SQL (the correctness oracle) and pure Python."""
    sh = shingles_col(text, k)
    h1s = F.transform(sh, lambda s: _md5_lane_col(s, 1))
    h2s = F.transform(sh, lambda s: _md5_lane_col(s, 9))
    zipped = F.zip_with(h1s, h2s, lambda a, b: F.struct(a.alias("h1"), b.alias("h2")))

    def perm(i: int):
        # NOTE: Spark counts lambda params to bind HOF variables, so the
        # closure must be built by a factory, not via default args.
        return lambda z: (z["h1"] + F.lit(i) * z["h2"]) % F.lit(MERSENNE31)

    sig = [
        F.when(
            F.size(zipped) > 0,
            F.array_min(F.transform(zipped, perm(i))),
        ).otherwise(F.lit(MERSENNE31))
        for i in range(n_hashes)
    ]
    return F.array(*sig)


def minhash_signature_py(text: str, n_hashes: int = 32, k: int = 3) -> list[int]:
    lanes = [_md5_lanes_py(s) for s in shingles_py(text, k)]
    if not lanes:
        return [MERSENNE31] * n_hashes
    return [min((h1 + i * h2) % MERSENNE31 for h1, h2 in lanes)
            for i in range(n_hashes)]


def minhash_candidates(df: DataFrame, key: str = "doc_id", text: str = "text",
                       n_hashes: int = 32, bands: int = 8, k: int = 3,
                       max_bucket: int | None = 2000,
                       resplit_lanes: int = 4,
                       resplit_depth: int = 2) -> DataFrame:
    """LSH banding: equal band-slices => candidate pair.  Returns distinct
    (id_a < id_b) pairs.  Shuffles on (band, bucket) only; the bucket key
    is md5 of the band slice (bounded key size, oracle-expressible).

    Per-bucket work cap (the anti-O(c^2) treatment, shared with the
    embedding near-dup family via similarity.capped_bucket_pairs): a
    (band, bucket) with more than ``max_bucket`` members — templated
    boilerplate clusters agree on EVERY band at 100 TB — is re-split on
    ``resplit_lanes`` FRESH minhash lanes per level (lane indices past
    the banded ``n_hashes``, so under-cap buckets are bit-identical to
    the uncapped layout) for up to ``resplit_depth`` levels; each level
    key is md5(parent_key | fresh-lane slice), so keys nest and bucket
    members move down together.  A bucket still over the cap at the last
    level (near-identical docs agree on every lane) emits HUB pairs —
    (min id, member) — keeping the cluster connected for downstream
    connected-components at O(c) cost instead of O(c^2), with nothing
    dropped.  ``max_bucket=None`` disables the cap (the exact classic
    banding join).  The capped semantics are mirrored in the DuckDB
    oracle (`__spark_entry__._minhash_sql`)."""
    rows = n_hashes // bands
    depth = resplit_depth if max_bucket is not None else 0
    total = n_hashes + resplit_lanes * depth
    sig = df.select(F.col(key).alias("id"),
                    minhash_signature_col(text, total, k).alias("sig"))

    def band_struct(b):
        fields = [b.alias("band")]
        kd = F.md5(F.array_join(
            F.transform(F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string")), ","))
        fields.append(kd.alias("k0"))
        for d in range(1, depth + 1):
            lane = F.array_join(
                F.transform(
                    F.slice(F.col("sig"),
                            n_hashes + (d - 1) * resplit_lanes + 1,
                            resplit_lanes),
                    lambda x: x.cast("string")), ",")
            kd = F.md5(F.concat(kd, F.lit("|"), lane))
            fields.append(kd.alias(f"k{d}"))
        return F.struct(*fields)

    banded = sig.select(
        "id",
        F.explode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
                              band_struct)).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"),
             *[F.col(f"bb.k{d}").alias(f"k{d}") for d in range(depth + 1)])

    if max_bucket is None:
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.k0") == F.col("b.k0"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    from resin_spark.similarity import capped_bucket_pairs

    return capped_bucket_pairs(banded, depth, max_bucket)


def jaccard_pairs(df: DataFrame, key: str = "doc_id", text: str = "text",
                  k: int = 3, threshold: float = 0.6,
                  candidates: DataFrame | None = None,
                  max_df: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all same-shingle
    pairs when candidates is None): (id_a, id_b, jaccard >= threshold).

    The no-candidates path joins on distinct shingles — the classic
    inverted-index join — with a document-frequency cap: shingles shared
    by more than `max_df` docs are dropped BEFORE the self-join, so one
    stopword shingle ("of the and") cannot create O(n^2) join rows at
    100 TB.  The computed jaccard is then over the sub-max_df shingle
    sets of both docs (intersection AND doc sizes use the same filtered
    universe, so j stays in [0,1] and equals true jaccard whenever no
    capped shingle is involved).  The cap is mirrored in the DuckDB
    oracle, so `dedup_ngram_jaccard` stays hash-exact either way."""
    sh = df.select(
        F.col(key).alias("id"),
        F.explode(F.array_distinct(shingles_col(text, k))).alias("sh"),
    )
    if candidates is None and max_df is not None:
        hot = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
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
def simhash_bands_col(text):
    """array<long> of 4 x 16-bit SimHash band values over tokens.

    Token hash = the two md5 32-bit lanes (lo = bits 0-31, hi = 32-63);
    per global bit b, the vote is the sign of the ±1 sum over tokens.
    Band j holds bits 16j..16j+15 as a non-negative value < 2^16 — kept
    banded (not packed into one int64) so there is no sign-bit hazard and
    the same values are computable in DuckDB list SQL for the oracle."""
    toks = tokens_col(text)
    los = F.transform(toks, lambda t: _md5_lane_col(t, 1))
    his = F.transform(toks, lambda t: _md5_lane_col(t, 9))

    def bit_sum(b: int):
        lane, off = (los, b) if b < 32 else (his, b - 32)
        return F.aggregate(
            lane,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftrightunsigned(h, off).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    bands = []
    for band in range(4):
        v = F.lit(0).cast("long")
        for j in range(16):
            v = v.bitwiseOR(
                F.when(bit_sum(band * 16 + j) > 0,
                       F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        bands.append(v)
    return F.array(*bands)


def simhash_bands_py(text: str) -> list[int]:
    from resin_spark.tokenizer import tokenize_py

    toks = tokenize_py(text)
    acc = [0] * 64
    for t in toks:
        lo, hi = _md5_lanes_py(t)
        h = (hi << 32) | lo
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    return [
        sum((1 << j) for j in range(16) if acc[band * 16 + j] > 0)
        for band in range(4)
    ]


def simhash_col(text):
    """Packed 64-bit SimHash (two's-complement int64) from the bands."""
    bands = simhash_bands_col(text)
    out = bands[0]
    for b in range(1, 4):
        out = out.bitwiseOR(F.shiftleft(bands[b], b * 16))
    return out


def simhash_py(text: str) -> int:
    out = 0
    for b, v in enumerate(simhash_bands_py(text)):
        out |= v << (b * 16)
    # two's-complement int64, matching the Spark column's LongType (bit 63
    # set => negative) so the twins compare equal directly
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_candidates(df: DataFrame, key: str = "doc_id", text: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16, bucket-join,
    verify Hamming distance <= max_hamming (sum of per-band bit_counts)."""
    sh = df.select(F.col(key).alias("id"), simhash_bands_col(text).alias("bv"))
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col("bv")[b].alias("bucket"))
        for b in range(4)
    ]
    banded = sh.select(
        "id", "bv", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "bv", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.bv").alias("bv_a"), F.col("b.bv").alias("bv_b"))
        .distinct()
    )
    ham = sum(
        (F.bit_count(F.col("bv_a")[i].bitwiseXOR(F.col("bv_b")[i])).cast("long")
         for i in range(4)),
        start=F.lit(0).cast("long"),
    )
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         key: str = "doc_id",
                         id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """Near-duplicate CLUSTERING: connected components over verified
    duplicate pairs, component id = min doc id in the component (the
    step every real dedup pipeline runs after pair generation — keep one
    canonical doc per cluster, drop the rest).

    Spark-first alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each round
    rewires edges toward the minimum of a neighbourhood —

    * large-star: every node's strictly-larger neighbours reconnect to
      the min of its closed neighbourhood;
    * small-star: every node and its smaller neighbours reconnect to the
      min of the smaller neighbours.

    Fixed points are exactly forests of stars (child → component-min),
    reached in **O(log n) rounds** regardless of component diameter —
    the property plain min-label propagation lacks (it needs
    diameter-many rounds, so a pathological duplicate *chain* used to
    hit ``max_iter``).  Each round is two aggregations + two joins on
    the EDGE list, never an all-pairs product, so it scales with
    |edges|; the convergence probe is one symmetric-difference
    emptiness check per round (bounded by ``max_iter``).

    Returns (key, component, keep): ``keep`` marks the canonical doc
    (doc_id == component).  Isolated docs form singleton components.
    """
    # canonical undirected edge set: (hi > lo), loops dropped.
    # localCheckpoint (not persist) per round: each round's plan
    # references the previous round's several times (sym reuse + the
    # symmetric-difference probe), so without lineage truncation the
    # logical plan grows exponentially and analysis itself OOMs.
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        # Γ(u) from both orientations; m = min(Γ(u) ∪ {u});
        # emit (v, m) for v ∈ Γ(u), v > u  (every edge is covered via
        # its smaller endpoint's neighbourhood)
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # per hi over its smaller neighbours N: m = min(N);
        # emit (v, m) for v ∈ N ∪ {hi}, loops dropped
        mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
        moved = (
            e.join(mins, "hi")
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
        )
        kept = mins.select(F.col("hi"), F.col("m").alias("lo"))
        return moved.union(kept).distinct()

    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        changed = (
            edges.exceptAll(new_edges)
            .union(new_edges.exceptAll(edges))
            .limit(1)
            .count()
        )
        edges = new_edges  # old checkpoint freed by the ContextCleaner
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # star forest: every non-root appears as hi with its root as lo
    roots = edges.groupBy("hi").agg(F.min("lo").alias("label"))
    labels = (
        nodes.select(F.col(key).alias("node")).distinct()
        .join(roots, F.col("node") == F.col("hi"), "left")
        .select("node", F.coalesce("label", F.col("node")).alias("label"))
    )
    # hand the caller ONE persisted frame it can .unpersist() directly
    # (materialized here, then the loop's working cache is released —
    # no orphaned cached tables left behind)
    out = labels.select(
        F.col("node").alias(key),
        F.col("label").alias("component"),
        (F.col("node") == F.col("label")).alias("keep"),
    ).persist()
    out.count()
    return out


def components_py(node_ids: list, pairs: list[tuple]) -> dict:
    """Pure-python twin (union-find) of connected_components."""
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in node_ids}


def chunk_dedup_stats(df: DataFrame, key: str = "doc_id",
                      text: str = "text", window: int = 20) -> DataFrame:
    """Exact-substring dedup at fixed-width token-chunk granularity (the
    distributed approximation of RefinedWeb/suffix-array exact-substring
    removal): the token stream is cut into consecutive ``window``-token
    chunks; a chunk whose fingerprint already appeared anywhere in the
    corpus (first occurrence = smallest (key, chunk_idx)) is marked
    removed.  Returns per-doc (key, n_chunks, n_removed).

    Scale shape: one narrow pass builds (key, chunk_idx, md5) rows —
    O(tokens/window) rows, each ~50 B — then ONE hash shuffle on the
    fingerprint finds first owners (min(struct)) and a broadcast-or-hash
    join marks the losers.  No pair explosion: duplicates of the same
    chunk meet in one reduce group, never as pairs."""
    toks = tokens_col(text)
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(window)).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * window + 1, window), " "),
        ),
    ).otherwise(F.expr("array()"))
    ex = (
        df.select(F.col(key), F.posexplode_outer(chunks)
                  .alias("chunk_idx", "chunk"))
        .select(key, "chunk_idx", F.md5(F.col("chunk")).alias("fp"))
    )
    first = (
        ex.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min(F.struct(key, "chunk_idx")).alias("first"),
             F.count(F.lit(1)).alias("n_occ"))
    )
    marked = ex.join(first, "fp", "left").select(
        F.col(key),
        F.col("chunk_idx"),
        (
            (F.col("n_occ") > 1)
            & ~((F.col(f"first.{key}") == F.col(key))
                & (F.col("first.chunk_idx") == F.col("chunk_idx")))
        ).alias("removed"),
    )
    return (
        marked.groupBy(key)
        .agg(
            F.sum(F.when(F.col("chunk_idx").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("removed"), 1).otherwise(0))
            .cast("long").alias("n_removed"),
        )
    )


def chunk_dedup_py(rows: list[tuple], window: int = 20) -> dict:
    """Pure-python twin of chunk_dedup_stats: rows = [(key, text)];
    returns {key: (n_chunks, n_removed)}."""
    from resin_spark.tokenizer import tokenize_py

    chunks: list[tuple] = []
    for key, text in rows:
        toks = tokenize_py(text or "")
        for ci in range((len(toks) + window - 1) // window):
            chunks.append((key, ci, " ".join(toks[ci * window:(ci + 1) * window])))
    first: dict = {}
    count: dict = {}
    for key, ci, ch in sorted(chunks):
        first.setdefault(ch, (key, ci))
        count[ch] = count.get(ch, 0) + 1
    out = {key: [0, 0] for key, _ in rows}
    for key, ci, ch in chunks:
        out[key][0] += 1
        if count[ch] > 1 and first[ch] != (key, ci):
            out[key][1] += 1
    return {k: tuple(v) for k, v in out.items()}


def ngrams_col(text, n: int = 5):
    """Space-joined token n-grams of a text column (JVM transform/slice,
    no Python)."""
    toks = tokens_col(text)
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.expr("array()"))


def decontaminate_flags(df: DataFrame, benchmark: "list[str] | DataFrame",
                        n: int = 5, key: str = "doc_id",
                        text: str = "text") -> DataFrame:
    """Benchmark decontamination (the eval-leak scrub every training
    pipeline runs before a data release): flag every document sharing at
    least one token ``n``-gram with the benchmark set.  Returns
    (key, n_hits, contaminated) where n_hits counts DISTINCT matched
    n-grams.

    Two physical forms by benchmark size:
    * ``list[str]`` (the common case — eval sets are small): benchmark
      n-grams become an array literal; matching is one array_intersect
      per row — narrow, codegen, no shuffle, no join.
    * ``DataFrame`` with a ``text`` column (benchmark too big to inline):
      both sides explode to (gram) rows and meet in a broadcast-or-hash
      join on the gram — the 100 TB form, one shuffle max.
    """
    from resin_spark.tokenizer import tokenize_py

    grams = F.array_distinct(ngrams_col(text, n))
    if isinstance(benchmark, DataFrame):
        bench_grams = (
            benchmark.select(F.explode(ngrams_col("text", n)).alias("gram"))
            .distinct()
        )
        ex = df.select(F.col(key), F.explode_outer(grams).alias("gram"))
        hits = (
            ex.join(bench_grams, "gram", "left_semi")
            .groupBy(key)
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        return (
            df.select(key).join(hits, key, "left")
            .select(
                key,
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
            )
        )
    bench: set[str] = set()
    for s in benchmark:
        toks = tokenize_py(s or "")
        for i in range(len(toks) - n + 1):
            bench.add(" ".join(toks[i:i + n]))
    bench_arr = F.array(*[F.lit(g) for g in sorted(bench)])
    n_hits = F.size(F.array_intersect(grams, bench_arr)).cast("long")
    return df.select(
        F.col(key), n_hits.alias("n_hits"), (n_hits > 0).alias("contaminated")
    )


def chunk_dedup_apply(df: DataFrame, key: str = "doc_id",
                      text: str = "text", window: int = 20) -> DataFrame:
    """The rewrite form of chunk_dedup_stats: duplicate chunks (any
    occurrence after the corpus-wide first, ordered by (key, chunk_idx))
    are REMOVED and the survivors reassemble into ``clean_text``
    (space-joined tokens, chunk order preserved).  Returns
    (key, clean_text, n_chunks, n_removed); docs reduced to nothing keep
    an empty clean_text.  Same scale shape as the stats form — one
    fingerprint shuffle + one per-doc regroup, no pair explosion."""
    toks = tokens_col(text)
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(window)).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * window + 1, window), " "),
        ),
    ).otherwise(F.expr("array()"))
    ex = (
        df.select(F.col(key), F.posexplode_outer(chunks)
                  .alias("chunk_idx", "chunk"))
        .withColumn("fp", F.md5(F.col("chunk")))
    )
    first = (
        ex.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min(F.struct(key, "chunk_idx")).alias("first"),
             F.count(F.lit(1)).alias("n_occ"))
    )
    marked = ex.join(first, "fp", "left").select(
        F.col(key), "chunk_idx", "chunk",
        (
            (F.col("n_occ") > 1)
            & ~((F.col(f"first.{key}") == F.col(key))
                & (F.col("first.chunk_idx") == F.col("chunk_idx")))
        ).alias("removed"),
    )
    # collect_list drops the NULLs the when() emits for removed/absent
    # chunks; sort_array restores chunk order (structs sort by chunk_idx)
    kept = F.sort_array(F.collect_list(F.when(
        ~F.coalesce(F.col("removed"), F.lit(True)),
        F.struct("chunk_idx", "chunk"))))
    return (
        marked.groupBy(key)
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s["chunk"]), " ").alias("clean_text"),
            F.sum(F.when(F.col("chunk_idx").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("removed"), 1).otherwise(0))
            .cast("long").alias("n_removed"),
        )
    )
