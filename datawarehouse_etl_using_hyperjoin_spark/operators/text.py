"""Text-analysis operators for a training-data pipeline.

Beyond the reference surface (BASELINE.json north_star): language ID,
quality scoring, token counting, document fingerprinting — all pure
``pyspark.sql.functions`` column expressions (JVM-side, codegen'd, no
Python in the hot path), so they run at 100 TB without serialization cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny English stopword list — enough signal for an n-gram/stopword
# heuristic language gate; a production list would be per-language config.
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation — the
# classic GPT-2-style pre-split shape, minus unicode categories.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization (fixture text is single-space separated)."""
    return F.split(F.trim(text), r"\s+")


def ws_token_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def approx_token_count(n_chars: Column) -> Column:
    """The ubiquitous chars/4 LLM token estimate."""
    return F.ceil(n_chars / F.lit(4.0)).cast("long")


def stopword_count(text: Column) -> Column:
    return F.size(
        F.filter(words(text), lambda w: w.isin(*EN_STOPWORDS))
    ).cast("long")


def stopword_ratio(text: Column) -> Column:
    return stopword_count(text) / ws_token_count(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1].

    Length signal (saturating at 100 words) + cleanliness (low punctuation
    density) + naturalness (stopword presence, saturating at 10%) — the
    standard cheap pre-filter shape for LLM corpus curation.
    """
    length_signal = F.least(ws_token_count(text) / F.lit(100.0), F.lit(1.0))
    clean_signal = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    natural_signal = F.least(stopword_ratio(text) * 10, F.lit(1.0))
    return 0.4 * length_signal + 0.3 * clean_signal + 0.3 * natural_signal


def lang_id(text: Column) -> Column:
    """Stopword-density language gate: 'en' when English stopwords exceed
    3% of tokens, else 'und' (undetermined)."""
    return F.when(stopword_ratio(text) >= 0.03, "en").otherwise("und")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))
