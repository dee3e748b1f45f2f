"""Deterministic splitting / sampling for training-data pipelines.

``df.randomSplit`` / ``df.sample`` are seed-dependent AND
partitioning-dependent — rerun the job with a different file layout
and a document silently hops from train to test. At corpus scale the
split must be a pure function of a stable key, so membership survives
re-ingestion, backfills, and engine changes (any engine that can md5 a
string reproduces it — that's what makes these oracle-checkable).

Mechanics: md5's leading hex chars are uniform over [0, 16^k); a split
is a pair of LEXICOGRAPHIC thresholds on the hex prefix (strings
compare like the numbers they encode because the width is fixed).
Nothing here shuffles — both ops are narrow projections/filters that
Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, width: int = 2) -> Column:
    """Uniform hex bucket from a stable key: 2 hex chars = 256 cells,
    plenty for percent-granularity splits."""
    return F.substring(F.md5(key.cast("string")), 1, width)


def _hex_threshold(t: int, width: int) -> str:
    """Fixed-width hex threshold for a lexicographic compare. The full
    range t == 16**width would overflow the width ('100' > '2f' is
    FALSE lexicographically) — return 'g', which sorts after every hex
    digit, so `bucket < threshold` is always true."""
    if t >= 16**width:
        return "g"
    return f"{t:0{width}x}"


def split_thresholds(train_frac: float, val_frac: float) -> tuple[str, str]:
    """Fractions → 2-hex-char lexicographic thresholds (floor to the
    256-cell grid; e.g. 0.8/0.1 → 'cc'/'e6'). Full-range boundaries
    (train==1.0, or train+val==1.0) map to the 'g' sentinel."""
    t = int(train_frac * 256)
    v = int((train_frac + val_frac) * 256)
    if not 0 <= t <= v <= 256:
        raise ValueError(f"bad split fractions: {train_frac}, {val_frac}")
    return _hex_threshold(t, 2), _hex_threshold(v, 2)


def hash_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Assign each row to train/val/test by hashed key. Adds
    ``bucket`` (the 2-hex-char cell, kept for audit) and ``split``."""
    t, v = split_thresholds(train_frac, val_frac)
    b = _bucket(F.col(key_col))
    return df.withColumns(
        {
            "bucket": b,
            "split": F.when(b < t, F.lit("train"))
            .when(b < v, F.lit("val"))
            .otherwise(F.lit("test")),
        }
    )


def stratum_threshold(frac: float) -> str:
    """Fraction → 4-hex-char lexicographic threshold (or the 'g'
    sentinel at frac == 1.0) on the 65536-cell grid."""
    t = int(frac * 0x10000)
    if not 0 <= t <= 0x10000:
        raise ValueError(f"bad stratum fraction: {frac}")
    return _hex_threshold(t, 4)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fracs: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (the language/source
    rebalancing step of a corpus pipeline): stratum s keeps ~fracs[s]
    of its rows by md5-threshold on the key, so the kept set is stable
    across runs/partitionings/engines and NESTED across fractions
    (raising a stratum's share keeps every previously kept row —
    df.sampleBy has neither property). Strata absent from ``fracs``
    are dropped. One narrow filter, no shuffle."""
    cond = None
    b = _bucket(F.col(key_col), width=4)
    for s, f in fracs.items():
        c = (F.col(strata_col) == s) & (b < F.lit(stratum_threshold(f)))
        cond = c if cond is None else cond | c
    if cond is None:
        raise ValueError("fracs must name at least one stratum")
    return df.filter(cond)


def deterministic_sample(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Keep a stable ~frac subset: rows whose hash bucket falls below
    the threshold. Unlike ``df.sample`` this is reproducible across
    runs, partitionings, and engines — the property a held-out eval
    slice needs."""
    t = int(frac * 0x10000)
    if not 0 <= t <= 0x10000:
        raise ValueError(f"bad sample fraction: {frac}")
    return df.filter(_bucket(F.col(key_col), width=4) < F.lit(_hex_threshold(t, 4)))
