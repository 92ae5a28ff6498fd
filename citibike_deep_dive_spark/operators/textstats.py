"""Text analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID
(stopword heuristic), quality scoring, token counting, and document
fingerprinting — all built-in column expressions (no UDFs), so they run
vectorized on 100 TB and have exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fanout import fan_out

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: deterministic argmax tie-break is list order.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}

# BPE-ish segmentation: letter runs, digit runs, or single non-space symbol.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _words(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def _stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    toks = _words(text)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return fan_out(docs).select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_REGEX)).cast("long").alias("bpe_tokens"),
    )


def quality_score_col(text: Column) -> Column:
    """The composite quality score as a single (rounded, 4dp) Column —
    usable directly in a filter, so a quality GATE is a pushable
    predicate on the scan instead of a join against the scored frame."""
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(_words(text)).cast("double")
    punct_ratio = F.regexp_count(text, F.lit("[^a-zA-Z0-9 ]")).cast("double") / n_chars
    stop_ratio = _stopword_hits(text, STOPWORDS["en"]).cast("double") / n_tokens
    return F.round(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2,
        4,
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score.

    Features: char length, whitespace-token count, mean token length,
    punctuation ratio, English-stopword ratio. The composite is a simple
    monotone blend — the point is the pattern (pure column math, one
    pass), not the exact weights.
    """
    text = F.col("text")
    n_chars = F.length(text).cast("double")
    toks = _words(text)
    n_tokens = F.size(toks).cast("double")
    mean_tok_len = n_chars / n_tokens
    punct = F.regexp_count(text, F.lit("[^a-zA-Z0-9 ]")).cast("double")
    punct_ratio = punct / n_chars
    stop_ratio = _stopword_hits(text, STOPWORDS["en"]).cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality_score_col(text).alias("quality_score"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language ID: hit count per language, argmax with
    deterministic tie-break (language declaration order)."""
    hit_cols = {
        lang: _stopword_hits(F.col("text"), words).alias(f"hits_{lang}")
        for lang, words in STOPWORDS.items()
    }
    scored = fan_out(docs).select("doc_id", "lang", *hit_cols.values())
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties → fold from the back
        pred = F.when(F.col(f"hits_{lang}") == best, lang).otherwise(pred)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"hits_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of punctuation-normalized text (exact
    content identity) + min shingle hash (rolling-hash-style locality)."""
    from .dedup import shingles

    normalized = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    return fan_out(docs).select(
        "doc_id",
        F.md5(normalized).alias("content_fp"),
        F.array_min(F.transform(shingles(F.col("text")), F.md5)).alias("min_shingle_fp"),
    )


def boilerplate_prefix_scrub(
    docs: DataFrame, width: int = 8, min_docs: int = 5
) -> DataFrame:
    """Strip repeated leading boilerplate: when a document's first
    ``width`` whitespace tokens occur as the prefix of ≥ ``min_docs``
    documents from the same source, drop that prefix from the text.

    The flat-text analogue of frequent-line boilerplate removal
    (headers, nav bars, license banners): boilerplate is whatever leading
    content repeats across a source's documents far more often than
    organic text would.

    Scale: one (source, prefix) hash aggregation over the corpus (keys
    uniform — prefixes are near-unique outside boilerplate), then the
    frequent-prefix set — tiny by construction — broadcasts back; no
    corpus reshuffle.
    """
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, width), " ")
    with_prefix = docs.select(
        "doc_id", "source", "text", prefix.alias("prefix")
    )
    frequent = (
        with_prefix.groupBy("source", "prefix")
        .count()
        .filter(F.col("count") >= min_docs)
        .select("source", "prefix")
        .withColumn("is_boiler", F.lit(1))
    )
    joined = with_prefix.join(F.broadcast(frequent), ["source", "prefix"], "left")
    hit = F.col("is_boiler").isNotNull()
    return joined.select(
        "doc_id",
        "source",
        hit.cast("int").alias("has_boilerplate"),
        F.when(hit, F.substring(F.col("text"), F.length("prefix") + 2, 1 << 30))
        .otherwise(F.col("text"))
        .alias("text_clean"),
    )
