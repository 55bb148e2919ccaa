"""Text-analysis operators for large-scale training-data pipelines.

These extend the engine beyond the reference's operator set (SURVEY.md
§2.8 notes the gaps): language-ID, quality scoring, token counting and
document fingerprinting over a text column.  All hot paths are JVM
built-ins (whole-stage codegen); nothing here shuffles except the stated
aggregations, so every op scales linearly with input splits.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resin_spark.tokenizer import tokens_col

# deterministic stopword profiles for the language heuristic.  Order
# matters: argmax ties resolve to the EARLIER language (lang_id_col's
# strict-> replacement), so the original four keep their precedence and
# the added languages only win on a strictly higher hit count.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "it": ["il", "di", "che", "e", "non", "per", "sono", "mi", "ma", "si"],
    "pt": ["o", "os", "do", "da", "em", "com", "não", "uma", "para", "mais"],
    "nl": ["het", "een", "van", "ik", "dat", "niet", "op", "aan", "met", "je"],
    "sv": ["och", "att", "det", "som", "en", "av", "är", "den", "inte", "jag"],
    "da": ["og", "at", "til", "er", "på", "ikke", "jeg", "har", "vi", "med"],
    "pl": ["nie", "się", "na", "co", "jest", "do", "tak", "jak", "ale", "po"],
    "tr": ["bir", "ve", "bu", "ne", "için", "ile", "çok", "ama", "ben", "gibi"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "akan"],
}

# BPE-ish pre-tokenization: letter runs, digit runs, single punct marks
BPE_ISH_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def html_text_col(html: Column | str,
                  no_tags: tuple[str, ...] = ("script", "style")) -> Column:
    """T10: visible text out of HTML — the Spark analog of the
    reference's YesNoParser('>', '<') char machine
    (/root/reference/src/Sir.HttpServer/YesNoParser.cs:16-80): text
    between tags is kept, tag bodies dropped, and `no_tags` elements
    (script/style) are dropped INCLUDING their contents.  Pure JVM
    regexes (codegen), whitespace collapsed."""
    c = F.col(html) if isinstance(html, str) else html
    alts = "|".join(no_tags)
    # close on a BACKREFERENCE (</\1>), not the alternation: a stray
    # </style> inside a <script> block must not terminate the script
    no_block = F.regexp_replace(
        c, f"(?is)<({alts})\\b[^>]*>.*?(</\\1\\s*>|$)", " "
    )
    stripped = F.regexp_replace(no_block, "(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def html_text_py(html: str, no_tags: tuple[str, ...] = ("script", "style")) -> str:
    """Pure-python twin of html_text_col (re module, same passes)."""
    import re

    alts = "|".join(no_tags)
    out = re.sub(f"(?is)<({alts})\\b[^>]*>.*?(</\\1\\s*>|$)", " ", html)
    out = re.sub("(?s)<[^>]*>", " ", out)
    return re.sub(r"\s+", " ", out).strip()


def stopword_hits_col(text: Column | str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang`` (the shared
    expression behind quality_columns, gopher_quality and the SQL
    oracle's g_stop_hits)."""
    return F.size(
        F.filter(tokens_col(text), lambda t: t.isin(STOPWORDS[lang]))
    )


def token_count_col(text: Column | str) -> Column:
    """Whitespace-free token count under the engine tokenizer."""
    return F.size(tokens_col(text))


def bpe_ish_count_col(text: Column | str) -> Column:
    """Token count under a BPE-style pre-tokenizer regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def quality_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-doc quality metrics: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio (en).  All codegen'd built-ins."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    alnum_chars = F.length(F.regexp_replace(F.col(text), r"[^\p{L}\p{N}]", ""))
    punct_chars = F.length(F.regexp_replace(F.col(text), r"[\p{L}\p{N}\s]", ""))
    stop_hits = stopword_hits_col(text)
    return df.select(
        "*",
        F.length(text).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, alnum_chars.cast("double") / n_tok).otherwise(0.0).alias("mean_token_len"),
        F.when(F.length(text) > 0, punct_chars.cast("double") / F.length(text))
        .otherwise(0.0)
        .alias("punct_ratio"),
        F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(0.0).alias("stopword_ratio"),
    )


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1 — public heuristics)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style document quality filter (the published rule set):
    word count bounds, mean word length bounds, symbol-to-word ratio
    (# and ellipsis), bullet-line fraction, alphabetic-word fraction,
    and a minimum of common-English-stopword hits.  Adds the metric
    columns plus ``gopher_pass``.  Pure Catalyst expressions — one
    narrow projection, no shuffle, scales with input splits."""
    c = F.col(text)
    words = F.split(F.coalesce(c, F.lit("")), r"\s+")
    words = F.filter(words, lambda w: w != "")
    n_words = F.size(words)
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).cast("double") / n_words,
    ).otherwise(0.0)
    n_symbols = (
        F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
        + (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
        + F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    ).otherwise(0.0)
    lines = F.filter(F.split(F.coalesce(c, F.lit("")), "\n"),
                     lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(
            lines,
            lambda l: F.trim(l).startswith("-") | F.trim(l).startswith("*")
            | F.trim(l).startswith("•"),
        )).cast("double") / n_lines,
    ).otherwise(0.0)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
        .cast("double") / n_words,
    ).otherwise(0.0)
    stop_hits = stopword_hits_col(text)
    ok = (
        (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
        & (mean_wlen >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wlen <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio < GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac < GOPHER_MAX_BULLET_FRAC)
        & (alpha_frac > GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return df.select(
        "*",
        n_words.cast("long").alias("g_n_words"),
        F.round(mean_wlen, 6).alias("g_mean_word_len"),
        F.round(symbol_ratio, 6).alias("g_symbol_ratio"),
        F.round(bullet_frac, 6).alias("g_bullet_frac"),
        F.round(alpha_frac, 6).alias("g_alpha_frac"),
        stop_hits.cast("long").alias("g_stop_hits"),
        ok.alias("gopher_pass"),
    )


def lang_id_col(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits per language, 'und'
    when nothing matches.  Deterministic tie-break = language order
    (earlier language wins a tie).

    Shape matters: a fold of nested when() chains duplicates every
    earlier sub-expression twice per step (2^n blow-up — codegen OOMs
    near a dozen languages); array_max over (score, -order, lang)
    structs is linear and picks the same first-argmax winner."""
    toks = tokens_col(text)

    def hits(words: list[str]):
        # factory, not default-arg lambda: Spark counts lambda params
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    entries = [
        F.struct(
            hits(words).alias("s"),
            F.lit(-i).alias("o"),       # ties -> max(-i) = first language
            F.lit(lang).alias("l"),
        )
        for i, (lang, words) in enumerate(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint_col(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 over the canonical token stream.
    Two docs with equal fingerprints are exact duplicates modulo
    whitespace/punctuation/case (the exact-dedup key)."""
    return F.md5(F.array_join(tokens_col(text), " "))


def rolling_fingerprints_py(text: str, window: int = 4,
                            mod: int = (1 << 31) - 1) -> list[int]:
    """Winnowing-style rolling hashes of token n-grams (pure-Python twin
    used by tests; the Spark path is rolling_fingerprints_col)."""
    from resin_spark.tokenizer import tokenize_py

    toks = tokenize_py(text)
    out = []
    for i in range(max(0, len(toks) - window + 1)):
        h = 0
        for t in toks[i : i + window]:
            h = (h * 1000003 + zlib.crc32(t.encode())) % mod
        out.append(h)
    return out


def rolling_fingerprints_col(text: Column | str, window: int = 4) -> Column:
    """Rolling token-n-gram hashes, JVM-side: crc32 per token, polynomial
    combine per window via transform+aggregate (no Python in the loop)."""
    # mod kept < 2^31 so acc*1000003+crc32 stays within int64 JVM-side
    mod = (1 << 31) - 1
    toks = tokens_col(text)
    crcs = F.transform(toks, lambda t: F.crc32(t.cast("binary")))
    n = F.size(crcs)
    idxs = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
        F.expr("array()")
    )
    return F.transform(
        idxs,
        lambda i: F.aggregate(
            F.slice(crcs, i + 1, window),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 1000003 + c) % F.lit(mod),
        ),
    )


# ------------------------------------------------------------------ PII
# Redaction patterns, chosen to parse identically under Java regex
# (Spark, JVM-side) and RE2 (the DuckDB oracle): character classes,
# bounded repetition and \b only — no lookarounds, no backreferences.
# Order matters: emails first (an email's local part could otherwise be
# half-eaten by the phone pattern), then IPs (dotted digits would match
# inside no other pattern), then phones.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


def pii_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-doc PII match counts (n_email / n_ip / n_phone), counted in
    redaction order so overlapping classes are attributed the way
    pii_redact_col rewrites them.  Pure JVM regexp (codegen), narrow."""
    c = F.col(text)
    out = df
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(c, F.lit(pat)).cast("long"))
        c = F.regexp_replace(c, pat, token)
    return out


def pii_redact_col(text: Column | str) -> Column:
    """Replace emails, IPv4 addresses and phone numbers with typed
    placeholder tokens ([EMAIL]/[IP]/[PHONE]) — the standard scrub pass
    of a training-data pipeline.  Chained JVM regexp_replace: one
    projection, no shuffle, linear in input bytes."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_redact_py(text: str) -> str:
    """Pure-python twin of pii_redact_col (same patterns, same order)."""
    import re

    for _name, pat, token in PII_PATTERNS:
        text = re.sub(pat, token, text)
    return text


# ------------------------------------------------------------------ URLs
# Tracking query parameters dropped by url_normalize_col.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def url_normalize_col(url: Column | str) -> Column:
    """Canonical URL form for dedup joins (the crawl-pipeline analog of
    the reference's url splitting in its WAT source,
    /root/reference/src/Sir.CommonCrawl/CCHelper.cs:68-152):

    * scheme and host lowercased; leading ``www.`` and default ports
      (``:80``/``:443``) stripped off the host
    * fragment dropped
    * query split on ``&``: tracking params (utm_*/fbclid/gclid/msclkid/
      ref) dropped, the rest SORTED and rejoined (param order never
      distinguishes documents)
    * trailing ``/`` stripped

    All array/regexp built-ins — codegen, no Python, no shuffle."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(
        c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qnorm = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))
                   ).otherwise(F.lit(""))
    # non-URL input (no scheme://host prefix) canonicalizes to ''
    return F.when(host != F.lit(""),
                  F.concat(scheme, F.lit("://"), host, path, qnorm)
                  ).otherwise(F.lit(""))


def url_normalize_py(url: str) -> str:
    """Pure-python twin of url_normalize_col (same rule set)."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)", url)
    if not m:
        return ""
    scheme = m.group(1).lower()
    host = re.sub(r":(80|443)$", "", re.sub(r"^www\.", "", m.group(2).lower()))
    path = re.sub(r"/$", "", m.group(3))
    qm = re.search(r"\?([^#]*)", url)
    params = sorted(
        p for p in (qm.group(1).split("&") if qm else [])
        if p and not re.match(TRACKING_PARAM_RE, p)
    )
    return f"{scheme}://{host}{path}" + ("?" + "&".join(params) if params else "")


def url_dedup_groups(df: DataFrame, url: str = "url",
                     key: str = "doc_id") -> DataFrame:
    """Duplicate groups under the canonical URL: (norm_url, n_dups,
    keep_id) for every normalized URL fetched more than once, keeping the
    smallest key.  One hash shuffle on norm_url — the same scale shape as
    exact_duplicates (dedup.py)."""
    return (
        df.select(F.col(key), url_normalize_col(url).alias("norm_url"))
        .groupBy("norm_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dups"),
             F.min(key).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )
