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

from pyspark.sql import Column, DataFrame, Window
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


def corpus_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    shares_ppm: dict[str, int],
    salt: str = "mix:",
) -> DataFrame:
    """Rebalance a corpus to TARGET output proportions (the
    domain-mixing step of a pretraining pipeline: "the mix should be
    40% en / 30% de / 30% zh" regardless of what the crawl delivered).

    Unlike :func:`stratified_sample` the keep rates are DERIVED FROM
    THE DATA: the largest total consistent with the target shares is
    T = min_s(count_s · 1e6 / share_s) — the scarcest stratum is kept
    whole and every other stratum is downsampled to match. All rate
    arithmetic is integer (ppm), and membership is the usual md5-hex
    threshold, so the kept set is deterministic across runs,
    partitionings, and engines, and NESTED under share changes that
    only raise a stratum's rate.

    Plan shape: one tiny aggregate over ``strata_col`` (stratum
    cardinality, not corpus rows) broadcast back onto the scan; the
    corpus side is a narrow filter — the only full-data shuffle is
    none. Strata absent from ``shares_ppm`` are dropped.

    Returns the kept rows plus ``keep_ppm`` (audit: the applied rate).
    """
    if not shares_ppm:
        raise ValueError("shares_ppm must name at least one stratum")
    if sum(shares_ppm.values()) != 1_000_000:
        raise ValueError(f"shares must sum to 1e6 ppm, got {shares_ppm}")
    share_expr = None
    for s, ppm in shares_ppm.items():
        if not 0 < ppm <= 1_000_000:
            raise ValueError(f"bad share for {s!r}: {ppm}")
        cond = F.col(strata_col) == s
        val = F.lit(ppm).cast("bigint")
        share_expr = (
            F.when(cond, val)
            if share_expr is None
            else share_expr.when(cond, val)
        )
    in_scope = df.filter(F.col(strata_col).isin(*shares_ppm))
    counts = (
        in_scope.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share_ppm", share_expr)
    )
    # a requested stratum with ZERO rows makes the target mix
    # unachievable (T = min_s(count_s/share_s) = 0); silently min-ing
    # over only the present strata would instead ship a wrong mix.
    # The counts relation is stratum-sized (tiny) — one bounded
    # driver action to fail loud (the graph.py scalar-action
    # precedent).
    present = {r[0] for r in counts.select(strata_col).collect()}
    missing = sorted(set(shares_ppm) - present)
    if missing:
        raise ValueError(
            f"corpus_mix: requested strata have no rows: {missing}; "
            "the target mix is unachievable (T would be 0)"
        )
    # implied max total per stratum; global min is the achievable total
    w_all = Window.partitionBy(F.lit(0))
    counts = counts.withColumn(
        "t_total",
        F.min(F.expr("(cnt * 1000000) div share_ppm")).over(w_all),
    )
    counts = counts.withColumn(
        "keep_ppm",
        F.least(
            F.lit(1_000_000).cast("bigint"),
            F.expr("(((t_total * share_ppm) div 1000000) * 1000000) div cnt"),
        ),
    )
    # 6-hex-char threshold on the 16^6 grid; full-rate strata get the
    # 'g' sentinel (hex('1000000') would be 7 chars and lpad truncates)
    counts = counts.select(
        strata_col,
        "keep_ppm",
        F.when(F.col("keep_ppm") >= 1_000_000, F.lit("g"))
        .otherwise(
            F.lower(
                F.lpad(
                    F.hex(F.expr("(keep_ppm * 16777216) div 1000000")),
                    6,
                    "0",
                )
            )
        )
        .alias("__thr"),
    )
    kept = in_scope.join(F.broadcast(counts), strata_col).filter(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 6
        )
        < F.col("__thr")
    )
    return kept.drop("__thr")


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    salt: str = "temp:",
) -> DataFrame:
    """Temperature-based corpus rebalancing at α = 0.5 (the multilingual
    pretraining recipe — XLM-R/mT5 sample language s with probability
    ∝ n_s^α to up-weight low-resource strata without the α=0 uniform
    extreme): output proportions q_s ∝ n_s^α, scarcest stratum kept
    whole, so the keep rate is (n_min/n_s)^(1-α) = sqrt(n_min/n_s).

    α is FIXED at 1/2 because sqrt is IEEE-correctly-rounded in every
    engine while pow(x, α) is not — the keep-ppm integers (and so the
    md5-threshold kept set) stay bit-identical across Spark and the SQL
    oracle. A general-α variant would need rational-exponent integer
    arithmetic to keep that property.

    Plan shape: one stratum-cardinality aggregate broadcast back onto
    the scan; the corpus side is a narrow filter (same shape as
    :func:`corpus_mix`). Returns kept rows plus ``keep_ppm``.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy(F.lit(0))
    counts = counts.withColumn("n_min", F.min("cnt").over(w_all))
    counts = counts.withColumn(
        "keep_ppm",
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(F.col("n_min").cast("double") / F.col("cnt"))
        ).cast("bigint"),
    )
    counts = counts.select(
        strata_col,
        "keep_ppm",
        F.when(F.col("keep_ppm") >= 1_000_000, F.lit("g"))
        .otherwise(
            F.lower(
                F.lpad(
                    F.hex(F.expr("(keep_ppm * 16777216) div 1000000")),
                    6,
                    "0",
                )
            )
        )
        .alias("__thr"),
    )
    kept = df.join(F.broadcast(counts), strata_col).filter(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 6
        )
        < F.col("__thr")
    )
    return kept.drop("__thr")


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    n_salt: int = 8,
    salt: str = "res:",
) -> DataFrame:
    """Fixed-size deterministic sample per group: the ``k`` rows with
    the smallest md5(salt || key) in each group — a reproducible
    reservoir (same members across runs/engines, unlike an actual
    streaming reservoir whose members depend on arrival order).

    Scale shape: a single ``row_number`` over ``partitionBy(group)``
    puts an entire group in one task — a mega-group (one language
    dominating a crawl) stalls the stage. So the top-k runs TWO-LEVEL:
    rank within (group, hash-salt cell) and keep k per cell (bounded
    fan-in, n_salt× parallel), then re-rank the surviving n_salt·k
    rows per group. The global top-k by hash is a subset of the union
    of per-cell top-k's, so the result is EXACTLY the single-window
    answer — the oracle checks against the naive form.

    Output: the input row plus ``rn`` (1-based rank by hash order).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    cell = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt))
    w1 = Window.partitionBy(F.col(group_col), cell).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    survivors = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )
