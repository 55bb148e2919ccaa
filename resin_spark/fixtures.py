"""Deterministic synthetic transcript fixtures (FIXTURES.md §1, seed=42).

Input-hint shape: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp).  The vocabulary embeds the reference's test
corpus verbatim (/root/reference/src/Sir.Store.Tests/IndexSessionTests.cs:16)
plus filler terms, a Zipf-style hot term in ~30% of turns (exercises skew
handling), unique planted terms (self-retrieval round trip), and the
Unicode en-dash case from TextModelTests.cs:99 ("Ferriman–Gallwey score").

Everything is seeded and pure: no wall clock, no Python string hash().
"""

from __future__ import annotations

import datetime as dt
import random

FRUIT_WORDS = [
    "apple", "apples", "apricote", "apricots", "avocado", "avocados",
    "banana", "bananas", "blueberry", "blueberries", "cantalope",
]
FILLER_WORDS = [
    "the", "a", "run", "tool", "call", "score", "search", "engine",
    "vector", "space", "index", "graph", "node", "query", "term",
    # anagram trio — exercises Resin's char-bag identity (chars_key mode)
    "listen", "silent", "enlist",
] + [f"term{i}" for i in range(100)]
HOT_TERM = "hot_term"  # note: tokenizes to ["hot", "term"] — we use hotterm
# '_' is a separator under the tokenizer, so the skewed token is one run:
HOT_TOKEN = "hotterm"
ENDASH_TEXT = "Ferriman–Gallwey score"  # en-dash U+2013
ROLES = ["user", "assistant", "tool"]

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)


def _turns(i: int, max_turns: int) -> int:
    return 1 + (i * 2654435761) % max_turns


def _stable_hash(i: int, t: int) -> int:
    # fixed arithmetic hash — NOT Python's randomized str hash
    return (i * 2654435761 + t * 40503 + 42) & 0xFFFFFFFF


def gen_transcripts(
    n_convs: int = 20,
    max_turns: int = 6,
    n_unique_terms: int = 8,
    seed: int = 42,
) -> list[dict]:
    """Deterministic transcript rows.  ``uterm{k}`` tokens are planted in
    exactly one turn each (self-retrieval invariant, FIXTURES.md §4.2)."""
    rows: list[dict] = []
    total = 0
    coords: list[tuple[int, int]] = []
    for i in range(n_convs):
        nt = _turns(i, max_turns)
        for t in range(nt):
            coords.append((i, t))
        total += nt

    # choose unique-term slots deterministically, spread over the corpus
    uniq_slots = {}
    if n_unique_terms > 0 and coords:
        step = max(1, len(coords) // n_unique_terms)
        for k in range(min(n_unique_terms, len(coords))):
            uniq_slots[coords[(k * step) % len(coords)]] = f"uterm{k}"

    vocab = FRUIT_WORDS + FILLER_WORDS
    for i, t in coords:
        rng = random.Random(_stable_hash(i, t) ^ seed)
        n_tok = rng.randint(3, 12)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n_tok)]
        if rng.random() < 0.30:
            words.insert(rng.randrange(len(words) + 1), HOT_TOKEN)
        if (i, t) in uniq_slots:
            words.append(uniq_slots[(i, t)])
        if i % 17 == 3 and t == 0:
            # deterministic overlap docs: contain BOTH 'apple' and
            # 'apples' so NOT-subtraction queries are non-vacuous
            words.extend(["apple", "apples"])
        text = " ".join(words)
        # one known turn per 1000 convs carries the en-dash string
        if i % 1000 == 0 and t == 0:
            text = text + " " + ENDASH_TEXT
        role = ROLES[(i + t) % 3]
        tool = ""
        if role == "tool" and (i + t) % 5 == 0:
            tool = "search" if (i % 2 == 0) else "calc"
        rows.append(
            {
                "conv_id": f"conv{i:08d}",
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": EPOCH + dt.timedelta(seconds=i * 3600 + t * 7),
            }
        )
    return rows


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_df_distributed(spark, n_convs: int, max_turns: int = 12,
                               words_per_turn: int = 8, partitions: int | None = None):
    """Deterministic transcript corpus generated ENTIRELY with JVM
    expressions — no driver-side row materialization, so it scales to the
    bench sizes (10^5-10^7 turns locally, arbitrarily on a cluster).
    Same schema/vocabulary/skew shape as gen_transcripts (hot token in
    ~30% of turns; en-dash row once per 1000 convs)."""
    from pyspark.sql import functions as F

    vocab = FRUIT_WORDS + FILLER_WORDS
    v = F.array(*[F.lit(w) for w in vocab])
    nv = len(vocab)

    base = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    base = base.select(
        F.col("id"),
        F.format_string("conv%08d", F.col("id")).alias("conv_id"),
        (F.lit(1) + (F.col("id") * F.lit(2654435761)) % F.lit(max_turns)).alias("n_turns"),
    )
    turns = base.select(
        "id", "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64(F.col("id"), F.col("turn_idx"))

    def word(j: int):
        return F.element_at(v, (F.pmod(F.xxhash64(F.col("id"), F.col("turn_idx"), F.lit(j)), F.lit(nv)) + 1).cast("int"))

    words = [word(j) for j in range(words_per_turn)]
    text = F.concat_ws(" ", *words)
    text = F.when(F.pmod(h, F.lit(10)) < 3, F.concat(text, F.lit(" " + HOT_TOKEN))).otherwise(text)
    text = F.when(
        (F.pmod(F.col("id"), F.lit(1000)) == 0) & (F.col("turn_idx") == 0),
        F.concat(text, F.lit(" " + ENDASH_TEXT)),
    ).otherwise(text)
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.pmod(F.col("id") + F.col("turn_idx"), F.lit(3)) + 1).cast("int"),
    )
    tool = F.when(
        (role == "tool") & (F.pmod(F.col("id") + F.col("turn_idx"), F.lit(5)) == 0),
        F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit("search")).otherwise(F.lit("calc")),
    ).otherwise(F.lit(""))
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2025-01-01 00:00:00"))
        + F.col("id") * 3600 + F.col("turn_idx") * 7
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


WAND_TOKEN = "wandhot"
WAND_TOKEN2 = "wandwarm"  # co-bursts with WAND_TOKEN (multi-term pruning)
WAND_TOKEN3 = "wandrare"  # ONLY in burst docs -> block-localized rare term
#                           (seeds the AND block-pruned driver path)


def transcripts_df_zipf(spark, n_convs: int, max_turns: int = 3,
                        partitions: int | None = None,
                        burst_every: int = 50, burst_frac: float = 1 / 3,
                        burst_rep: int = 6, hot_prob: float = 0.2):
    """Zipf-scored corpus for evidencing block-max WAND pruning.

    The uniform bench corpus gives every block the same upper bound, so
    WAND's exact pruning never engages (correct but unobservable).  This
    fixture makes block bounds DIFFER the way real corpora do:

    * word ranks are Zipf-ish (rank = floor(V^u), p(r) ~ 1/r), so df is
      skewed across the vocabulary;
    * doc lengths vary 4..16 tokens (dl spread -> per-block min_dl and
      score denominators differ);
    * the probe token ``wandhot`` appears once in ~hot_prob of all turns
      (every block matches) but BURSTS (tf=burst_rep) in a slice of early
      conversations (id % burst_every == 7, id < n_convs*burst_frac) —
      topic-burstiness concentrated in a doc_id range, exactly the shape
      block-max metadata exploits: late blocks' ub stays below the theta
      set by the bursty blocks and are pruned without decoding.

    Deterministic, generated entirely with JVM expressions (no driver
    rows) like transcripts_df_distributed."""
    from pyspark.sql import functions as F

    vocab = FRUIT_WORDS + FILLER_WORDS
    v = F.array(*[F.lit(w) for w in vocab])
    nv = len(vocab)
    max_words = 16

    base = spark.range(
        0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism
    )
    base = base.select(
        F.col("id"),
        F.format_string("conv%08d", F.col("id")).alias("conv_id"),
        (F.lit(1) + (F.col("id") * F.lit(2654435761)) % F.lit(max_turns)).alias(
            "n_turns"
        ),
    )
    turns = base.select(
        "id", "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64(F.col("id"), F.col("turn_idx"))

    def u01(j: int):
        return F.pmod(
            F.xxhash64(F.col("id"), F.col("turn_idx"), F.lit(j)), F.lit(1000000)
        ) / F.lit(1000000.0)

    def zipf_word(j: int):
        rank = F.least(
            F.floor(F.pow(F.lit(float(nv)), u01(j))).cast("int"), F.lit(nv)
        )
        return F.element_at(v, rank)

    words = F.array(*[zipf_word(j) for j in range(max_words)])
    # dl spread: 4..16 base tokens, quadratic skew toward short docs
    n_words = (F.lit(4) + F.floor(F.lit(12.0) * u01(99) * u01(99))).cast("int")
    text = F.concat_ws(" ", F.slice(words, F.lit(1), n_words))
    is_burst = (
        (F.pmod(F.col("id"), F.lit(burst_every)) == 7)
        & (F.col("id") < F.lit(int(n_convs * burst_frac)))
        & (F.col("turn_idx") == 0)
    )
    has_hot = F.pmod(h, F.lit(1000)) < F.lit(int(hot_prob * 1000))
    has_warm = F.pmod(h, F.lit(997)) < F.lit(int(hot_prob * 500))
    burst_suffix = F.concat(
        F.repeat(F.lit(" " + WAND_TOKEN), burst_rep),
        F.repeat(F.lit(" " + WAND_TOKEN2), max(1, burst_rep // 2)),
        F.lit(" " + WAND_TOKEN3),
    )
    text = (
        F.when(is_burst, F.concat(text, burst_suffix))
        .when(has_hot, F.concat(text, F.lit(" " + WAND_TOKEN)))
        .otherwise(text)
    )
    text = F.when(
        has_warm & ~is_burst, F.concat(text, F.lit(" " + WAND_TOKEN2))
    ).otherwise(text)
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.pmod(F.col("id") + F.col("turn_idx"), F.lit(3)) + 1).cast("int"),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2025-01-01 00:00:00"))
        + F.col("id") * 3600 + F.col("turn_idx") * 7
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.lit("").alias("tool"),
        ts.alias("ts"),
    )


def transcripts_df(spark, n_convs: int = 20, max_turns: int = 6, **kw):
    """Spark DataFrame of the fixture with the input-hint schema."""
    rows = gen_transcripts(n_convs=n_convs, max_turns=max_turns, **kw)
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
