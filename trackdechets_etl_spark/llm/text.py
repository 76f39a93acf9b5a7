"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (no Python UDFs): language-ID by marker
-word counts, quality scoring, token counting (whitespace + BPE-ish
regex), and document fingerprinting (position-weighted rolling hash +
md5). Each has an exact ANSI-SQL twin used by the DuckDB oracle; the
dual definitions live in queries/llm.py.

Scale: every op is a narrow map over the text column — no shuffle, no
driver collection; whole-stage codegen applies throughout. At 100 TB
these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPEISH_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "de"],
    "de": ["der", "und", "die", "das"],
}

STOPWORDS = ["a", "the", "and", "of", "is"]

FINGERPRINT_MOD = 1_000_000_007


def words(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def n_tokens_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def n_tokens_bpeish(text: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, and single
    non-alnum symbols — the standard pre-tokenizer shape."""
    return F.regexp_count(text, F.lit(BPEISH_TOKEN_PATTERN))


def marker_count(ws: Column, markers: list[str]) -> Column:
    """Number of tokens that appear in a marker list (JVM-side
    ``filter`` higher-order function, no UDF)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language marker counts,
    'und' when no marker hits. Ties resolve in LANG_MARKERS declaration
    order (deterministic)."""
    ws = words(text)
    counts = {lang: marker_count(ws, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # declaration order = priority order
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, word count, mean word length,
    stopword ratio, and a [0,1] composite score."""
    ws = words(text)
    n_words = F.size(ws)
    n_chars = F.length(text)
    n_chars_nospace = F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_stop = marker_count(ws, STOPWORDS)
    stop_ratio = F.round(n_stop / n_words, 4)
    score = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - n_stop / n_words) * 0.5,
        4,
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.round(n_chars_nospace / n_words, 4),
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def fingerprint_rolling(text: Column) -> Column:
    """Position-weighted rolling hash over whitespace tokens:
    ``sum(i * (31*len(w_i) + ascii(w_i[0]))) mod 1e9+7``. Pure integer
    arithmetic → bit-identical across engines, order-independent sum."""
    ws = words(text)
    weighted = F.zip_with(
        ws,
        F.sequence(F.lit(1), F.size(ws)),
        lambda w, i: i.cast("long") * (F.length(w) * 31 + F.ascii(w)),
    )
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (total % FINGERPRINT_MOD).alias("fingerprint")


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key at scale (16-byte key vs full text)."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


# PII patterns shared with the DuckDB oracle — RE2/Java-regex common
# subset only (no lookarounds, no backrefs).
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUMBER_PATTERN = r"\b\d{6,}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails and long digit runs (phone/account numbers) —
    the standard pre-training privacy scrub. Pure regexp_replace
    chain: JVM-side, codegen-friendly, no UDF."""
    scrubbed = F.regexp_replace(text, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(scrubbed, PII_NUMBER_PATTERN, "<NUM>")


def pii_count(text: Column) -> Column:
    """Number of redactions :func:`scrub_pii` performs on ``text``."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL_PATTERN))
        + F.regexp_count(
            F.regexp_replace(text, PII_EMAIL_PATTERN, "<EMAIL>"),
            F.lit(PII_NUMBER_PATTERN),
        )
    ).cast("long")
