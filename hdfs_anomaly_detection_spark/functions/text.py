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

from functools import reduce

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


# Buzhash constants: Knuth multiplicative + a salt XORed in after the
# xorshift so mix(0) != 0 (the empty-string split yields code 0)
_BUZ_MULT = 2654435761
_BUZ_SALT = 0x27D4EB2F165667C5


def _buzhash_mix(code):
    """64-bit mix of one char code: multiply + xorshift + salt. The
    product is ≤ 0x10FFFF × 2654435761 < 2^52, so ANSI-mode bigint
    arithmetic never overflows; later rotations wrap bitwise (exempt
    from ANSI checks)."""
    v = code.cast("bigint") * F.lit(_BUZ_MULT)
    v = v.bitwiseXOR(F.shiftright(v, 29))
    return v.bitwiseXOR(F.lit(_BUZ_SALT))


def _rotl64(v, r: int):
    if r == 0:
        return v
    return F.shiftleft(v, r).bitwiseOR(F.shiftrightunsigned(v, 64 - r))


def _buzhash_grams(codes, k: int):
    """Array of cyclic-polynomial k-gram hashes from a BOUND mixed-code
    array column: gram i = XOR of rotated mixed codes. ``codes`` must be
    a plain column reference (projection boundary), not the mixing
    expression itself — referencing an expression k times per gram
    would inline the split+mix subtree k× (the ``shingle_frame``
    trap). Out-of-range positions (texts shorter than k) contribute a
    fixed pad via null-safe ``F.get`` + coalesce, mirroring the md5
    path's truncated-substring behavior for short texts."""
    n_grams = F.greatest(F.size(codes) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: reduce(
            lambda acc, j: acc.bitwiseXOR(
                _rotl64(F.coalesce(F.get(codes, i + F.lit(j)), F.lit(0)), k - 1 - j)
            ),
            range(k),
            F.lit(0).cast("bigint"),
        ),
    )


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    dialect_common: bool = False,
):
    """Winnowing document fingerprints (the MOSS scheme): hash every
    char k-gram (rolling across the doc), then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive k-grams — a position-
    robust fingerprint set that overlaps for documents sharing any
    run >= k+window-1 chars. Returns (id, fp bigint) exploded, distinct
    per doc.

    All Catalyst. Two hash families:

    * ``dialect_common=True`` — md5-hex-prefix of each k-gram substring,
      exactly replayable by a SQL oracle (DuckDB). O(n·k) string work.
    * default — Buzhash (cyclic-polynomial), the classic ROLLING hash
      family: each character is mixed to a 64-bit value ONCE (an O(n)
      pass over a split-to-chars array), and gram i is
      ``XOR_j rotl64(mix(c[i+j]), k-1-j)`` — O(n·k) register-only
      shift/xor ops, zero per-gram string allocation or hashing. The
      O(1)-per-position sliding update Buzhash is known for needs a
      scan/prefix primitive Catalyst doesn't expose; the direct form
      keeps the same mixed-char reuse, stays inside whole-stage
      codegen, and is embarrassingly parallel (no cross-row state).

    Window minima via slice/array_min over the pre-bound hash array
    (projection boundary — see ``operators/dedup.shingle_frame`` for
    the inlining trap).

    Reference analogue: whole-doc md5 keying
    (``anomaly_detection_service.py:269-271``) — winnowing generalizes
    it to partial-overlap detection."""
    c = F.col(text_col)
    t = F.lower(c)
    if dialect_common:
        n_grams = F.greatest(F.length(t) - (k - 1), F.lit(1))
        kh = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(t, i, k)), 1, 8), 16, 10
            ).cast("bigint"),
        )
        base = df.filter(c.isNotNull()).select(
            F.col(id_col).alias("id"), kh.alias("__kh")
        )
    else:
        # slice the char array to exactly length(t) elements (min 1 so an
        # empty doc keeps its single sentinel gram): pre-SPARK-40194
        # (Spark < 3.4) split(t, '') appends a trailing '' element, which
        # would silently add one pad gram per document and change every
        # default fingerprint — the slice makes the production hash family
        # stable across Spark versions instead of relying on 3.4+ semantics
        chars = F.slice(F.split(t, ""), 1, F.greatest(F.length(t), F.lit(1)))
        mixed = F.transform(chars, lambda ch: _buzhash_mix(F.ascii(ch)))
        base = df.filter(c.isNotNull()).select(
            F.col(id_col).alias("id"), mixed.alias("__codes")
        )
        base = base.select("id", _buzhash_grams(F.col("__codes"), k).alias("__kh"))
    h = F.col("__kh")
    m = F.size(h)
    fps = F.when(
        m >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m - (window - 1)),
                lambda j: F.array_min(F.slice(h, j, window)),
            )
        ),
    ).otherwise(F.array(F.array_min(h)))
    return base.select("id", F.explode(fps).alias("fp"))


def doc_fingerprint(col: Column | str, canonical: bool = True) -> Column:
    """64-bit content fingerprint of the (canonicalized) text — the
    dedup/cache key (reference: md5 keying,
    ``anomaly_detection_service.py:269-271``; point-id synthesis,
    ``cloud-deployment/spark_job.py:160``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(canonicalize(c) if canonical else c)
