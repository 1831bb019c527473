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
    (r"\b0x[0-9a-f]+\b", " <hex> "),
    (r"\b[0-9a-f]{8,}\b", " <hex> "),
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
