"""Stratified seeded sampling and class rebalancing.

Reference analogue: per-class controlled-rate sampling with a fixed seed
(``training/hdfs_line_level_loader_v2.py:175-187`` — normal/anomaly rows
sampled at independent fractions, ``random_state=42``), the anomaly-ratio
corpora builder (``evaluation/hdfs_anomaly_injection_loader.py:176-185``)
and majority-class downsampling for imbalance control
(``train_line_level_ensemble_v1.py:100-121``).

Two sampling families, both distributed (no driver-side row movement):

* ``stratified_sample`` — Spark's native ``sampleBy`` (per-stratum
  Bernoulli, seeded). Fast and unbiased, but the draw depends on the
  physical partition layout, so the CONTENT of the sample changes when
  the file split or cluster size changes (only the rates are stable).
* ``stratified_sample_hash`` / ``rebalance_downsample`` — deterministic
  hash-gated sampling: keep a row iff ``uniform01(md5(key)) < fraction``
  for its stratum. The sample is a pure function of the DATA, identical
  on 1 executor or 1000 (the same reasoning as the engine's data-
  attribute part_id), at the cost of one md5 per row (whole-stage
  codegen, no shuffle — the predicate pushes into the scan stage).

At 100 TB all of these are map-only operators: no shuffle, no skew
surface; ``rebalance_downsample`` adds one tiny counts aggregate that is
broadcast back as a literal CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^8: the hash-uniform resolution (first 8 hex chars of md5)
_HEX_SPAN = float(1 << 32)

# Unambiguous key-part separator: composite keys like (12, 3) and
# (1, 23) must hash differently, so parts are joined with \x01 (a byte
# that never appears in the key columns). DuckDB oracles mirror it as
# chr(1). ADVICE r2: bare concatenation correlated draws across rows.
_SEP = "\x01"


def _key(key_cols: tuple[str, ...], *extra: Column) -> Column:
    return F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols], *extra)


def uniform01(key: Column) -> Column:
    """Deterministic uniform [0,1) from a key column: first 8 hex chars
    of md5 parsed base-16. Dialect-common (DuckDB: ('0x'||substr(md5(k),
    1,8))::BIGINT / 2^32), so oracles can replay the exact draw."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) / F.lit(_HEX_SPAN)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling via native ``sampleBy`` (seeded).
    Strata absent from ``fractions`` are dropped (rate 0) — matching the
    reference's per-class ``df[df.label==c].sample(frac_c)`` semantics."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_cols: tuple[str, ...],
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff
    ``uniform01(concat(key_cols)) < fractions[stratum]``. Cluster-stable:
    the kept row set is a pure function of the data."""
    u = uniform01(_key(key_cols))
    frac = F.lit(0.0)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def seeded_shuffle_key(key_cols: tuple[str, ...], seed: int = 42) -> Column:
    """Deterministic shuffle ORDER KEY: ``md5(keys || seed)`` — the
    distributed analogue of the reference's ``df.sample(frac=1,
    random_state=42)`` epoch shuffle
    (``train_line_level_ensemble_v1.py:97``). The permutation is a pure
    function of the data + seed (cluster-stable).

    Deliberately NOT a global contiguous rank: a global ``row_number``
    window moves every row to one task. ``orderBy(key)`` gives a
    distributed range-partitioned sort, and shard boundaries come from
    hash BANDS (``seeded_shard``) rather than rank ranges."""
    return F.md5(_key(key_cols, F.lit(str(seed))))


def seeded_shard(
    df: DataFrame,
    key_cols: tuple[str, ...],
    shard: int,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Shard ``shard``/``n_shards`` of the seeded permutation, selected
    by uniform hash band — a map-only filter (no sort, no shuffle), so a
    training loader can pull epoch shards independently at any scale."""
    u = uniform01(_key(key_cols, F.lit(str(seed))))
    lo, hi = shard / n_shards, (shard + 1) / n_shards
    return df.filter((u >= F.lit(lo)) & (u < F.lit(hi)))


def rebalance_downsample(
    df: DataFrame,
    label_col: str,
    key_cols: tuple[str, ...],
    target_ratio: float = 1.0,
) -> DataFrame:
    """Downsample majority classes so every class ends at ≈
    ``target_ratio × min-class count`` (ratio 1.0 = fully balanced), the
    reference's imbalance-control step
    (``train_line_level_ensemble_v1.py:100-121``) as a deterministic
    hash gate.

    One pass computes per-class counts (tiny aggregate, collected as a
    literal CASE — O(classes) on the driver); the second pass filters
    map-side. Classes at or under the target keep every row."""
    counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
    if not counts:
        return df
    target = target_ratio * min(counts.values())
    fractions = {k: min(1.0, target / n) for k, n in counts.items()}
    return stratified_sample_hash(df, label_col, fractions, key_cols)
