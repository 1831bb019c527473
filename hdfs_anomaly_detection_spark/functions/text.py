"""Text canonicalization + lightweight text metrics, all Catalyst-native.

The canonicalization invariant reproduces the reference's template
normalization semantics — mask timestamps / IPs / hex ids / numbers,
lowercase, collapse whitespace — from
``cloud-deployment/hdfs_production_log_processor.py:43-118`` (12-pattern
regex battery + whitespace collapse) and
``embedding_service/app.py:18-23`` (``<TS>/<IP>/<HEX>/<NUM>`` masking +
lowercase). Implemented as a chained ``regexp_replace`` so it stays
inside whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: timestamps before bare numbers, hex before numbers
_CANON_PATTERNS: list[tuple[str, str]] = [
    (r"\d{4}-\d{2}-\d{2}[ t_]\d{2}:\d{2}:\d{2}(\.\d+)?", " <ts> "),
    (r"\b\d{1,3}(\.\d{1,3}){3}(:\d+)?\b", " <ip> "),
    (r"\b(0x[0-9a-f]+|[0-9a-f]{8,})\b", " <hex> "),
    (r"(?<![a-z0-9])[-+]?\d+(\.\d+)?(?![a-z0-9])", " <num> "),
    (r"\s+", " "),
]


def canonicalize(col: Column | str) -> Column:
    """Canonical text form used by the per-turn text-equality invariant."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    for pat, repl in _CANON_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def token_count(col: Column | str) -> Column:
    """Whitespace/punctuation token count (BPE-ish regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"[\s\p{Punct}]+")
    return F.size(F.filter(toks, lambda t: t != F.lit("")))


# --------------------------------------------------------------- analysis

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "des", "une", "dans"],
}


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(col)), r"[\s\p{Punct}]+"), lambda t: t != F.lit("")
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-ratio language ID over {en, es, de, fr}; 'und' when no
    profile matches (pure Catalyst: split + array_intersect + greatest)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = _tokens(c)
    def contains(words: list[str]):
        # NOTE: pyspark higher-order lambdas must take exactly the lambda
        # variables — close over the wordlist, never pass it as a default arg
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = {
        lang: F.size(F.filter(toks, contains(words))).cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double")
        for lang, words in _STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(scores)):  # earlier languages win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: penalize extreme length,
    high punctuation/digit density, and missing stopwords (the classic
    pretraining-corpus filters, expressed as one Catalyst expression)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    toks = _tokens(c)
    n_tok = F.size(toks).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    stop_hits = F.size(
        F.filter(
            toks,
            lambda t: F.array_contains(
                F.array(*[F.lit(w) for w in _STOPWORDS["en"]]), t
            ),
        )
    ).cast("double")
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.3)
    punct_ok = 1.0 - F.least(punct / F.greatest(n_chars, F.lit(1.0)) * 4.0, F.lit(1.0))
    digit_ok = 1.0 - F.least(digits / F.greatest(n_chars, F.lit(1.0)) * 3.0, F.lit(1.0))
    stop_ok = F.least(stop_hits / F.greatest(n_tok, F.lit(1.0)) * 5.0, F.lit(1.0))
    return F.round(
        0.3 * len_ok + 0.25 * punct_ok + 0.2 * digit_ok + 0.25 * stop_ok, 4
    )


def doc_fingerprint(col: Column | str, canonical: bool = True) -> Column:
    """64-bit content fingerprint of the (canonicalized) text — the
    dedup/cache key (reference: md5 keying,
    ``anomaly_detection_service.py:269-271``; point-id synthesis,
    ``cloud-deployment/spark_job.py:160``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(canonicalize(c) if canonical else c)
