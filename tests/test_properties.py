"""Property-based tests (hypothesis) for the sequential/sorting
operators, batched through single Spark jobs to keep runtime sane.

The year-impute oracle here is an INDEPENDENT pure-Python model of the
reference semantics (BatchUpdate.py:327-413) written against the spec
in SURVEY.md §2e — not shared code with the engine's pandas
implementation, so a port bug can't cancel out.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from journal_batch_processer_spark.operators.year_impute import (
    YEAR_ERR,
    year_impute_exact,
)

_LEAD = re.compile(r"^(\d+)")


def _model_impute(chron: list[str]) -> tuple[list[str], list[str]]:
    """Spec model: sequential pass, repaired rows become anchors for
    later backward scans; forward scans see not-yet-repaired rows."""
    vals = list(chron)
    notes = [""] * len(vals)
    for i, v in enumerate(vals):
        m = _LEAD.match(v)
        if not m or len(m.group(1)) >= 4:
            continue
        year = m.group(1)
        prev = next_ = None
        for j in range(i - 1, -1, -1):
            mm = _LEAD.match(vals[j])
            if mm and len(mm.group(1)) == 4:
                prev = mm.group(1)
                break
        for j in range(i + 1, len(vals)):
            mm = _LEAD.match(vals[j])
            if mm and len(mm.group(1)) == 4:
                next_ = mm.group(1)
                break
        if prev and next_:
            d = 4 - len(year)
            if int(prev) <= int(prev[:d] + year) <= int(next_):
                vals[i] = prev[:d] + vals[i]
            elif int(prev) <= int(next_[:d] + year) <= int(next_):
                vals[i] = next_[:d] + vals[i]
            else:
                cents = [int(prev[:2]) - 1, int(prev[:2]), int(prev[:2]) + 1]
                avg = (int(prev) + int(next_)) / 2
                diffs = [abs(avg - (c * 100 + int(year))) for c in cents]
                vals[i] = str(cents[diffs.index(min(diffs))]) + vals[i]
        elif next_:
            nd, cur = int(next_[-2:]), int(year)
            vals[i] = str(
                int(next_) - nd - 100 + cur if cur > nd else int(next_) - nd + cur
            )
        elif prev:
            pd_, cur = int(prev[-2:]), int(year)
            vals[i] = str(
                int(prev) - pd_ + 100 + cur if pd_ > cur else int(prev) - pd_ + cur
            )
        else:
            notes[i] = YEAR_ERR
    return vals, notes


chron_entry = st.one_of(
    st.integers(1900, 2099).map(str),                      # 4-digit anchor
    st.integers(0, 99).map(lambda v: f"{v:02d}"),          # 2-digit year
    st.integers(1900, 2099).map(lambda v: f"{v}-{v + 1}"), # range
    st.just(""),                                            # no year
    st.just("n.s."),                                        # junk
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(chron_entry, min_size=1, max_size=8), min_size=1, max_size=6
    )
)
def test_year_impute_matches_spec_model(spark, groups):
    rows = []
    expected = {}
    for g, chron in enumerate(groups):
        vals, notes = _model_impute(chron)
        for k, (v_in, v_out, note) in enumerate(zip(chron, vals, notes)):
            rows.append((g, k, v_in, ""))
            expected[(g, k)] = (v_out, note)
    df = spark.createDataFrame(rows, "g int, k int, chron_i string, note string")
    out = year_impute_exact(
        df, group_col="g", order_cols=("k",), chron_col="chron_i", notes_col="note"
    )
    got = {(r["g"], r["k"]): (r["chron_i"], r["note"]) for r in out.collect()}
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),            # mms group
            st.integers(0, 2),            # series number (0 → none)
            st.integers(1, 120),          # volume number
        ),
        min_size=1,
        max_size=30,
    )
)
def test_natural_sort_total_order(spark, items):
    from journal_batch_processer_spark.operators.natural_sort import natural_sort

    rows = []
    for i, (g, ser, vol) in enumerate(items):
        desc = (f"ser. {ser} " if ser else "") + f"v.{vol} no.{i}"
        rows.append((str(g), desc, i))
    df = spark.createDataFrame(rows, "`MMS ID` string, Description string, idx int")
    out = natural_sort(df, extra_tiebreakers=["idx"]).collect()

    def key(r):
        m = re.match(r"^(?:ser\.\s*(\d+)\s*)?v\.(\d+)", r["Description"])
        return (r["MMS ID"], int(m.group(1) or 0), int(m.group(2)),
                r["Description"], r["idx"])

    assert [r["idx"] for r in out] == [r["idx"] for r in sorted(out, key=key)]


def test_month_normalize_idempotent_on_canonical(spark):
    from journal_batch_processer_spark.functions.text import month_normalize

    canon = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
             "Sep", "Oct", "Nov", "Dec", "Spr", "Sum", "Fal", "Win"]
    df = spark.createDataFrame([(c,) for c in canon], "c string")
    once = df.select(month_normalize(F.col("c")).alias("c"))
    twice = once.select(month_normalize(F.col("c")).alias("c"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()] == canon


@given(
    fracs=st.lists(
        st.floats(min_value=0.01, max_value=0.99), min_size=2, max_size=4
    ),
    n=st.integers(min_value=50, max_value=300),
)
@settings(max_examples=10, deadline=None)
def test_deterministic_sample_nested_and_stable(spark, fracs, n):
    """Hash-threshold sampling is NESTED (sample(f1) ⊆ sample(f2) for
    f1 ≤ f2 — growing an eval slice never swaps membership) and
    partitioning-independent. Neither property holds for df.sample."""
    from journal_batch_processer_spark.operators.sampling import (
        deterministic_sample,
    )

    df = spark.range(0, n).withColumnRenamed("id", "k")
    sets = []
    for f in sorted(fracs):
        got = {r["k"] for r in deterministic_sample(df, "k", f).collect()}
        re_got = {
            r["k"]
            for r in deterministic_sample(df.repartition(5), "k", f).collect()
        }
        assert got == re_got
        sets.append(got)
    for small, big in zip(sets, sets[1:]):
        assert small <= big


def test_split_boundaries_full_range(spark):
    """ADVICE r01: t == 16**width overflowed the fixed hex width
    ('100' compares before '2f'), so frac sums of 1.0 silently broke —
    hash_split(0.9, 0.1) must put every non-train row in val (empty
    test), and deterministic_sample(frac=1.0) must keep ALL rows."""
    from journal_batch_processer_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
        split_thresholds,
    )

    n = 400
    df = spark.range(0, n).withColumnRenamed("id", "k")

    assert split_thresholds(1.0, 0.0) == ("g", "g")
    assert split_thresholds(0.9, 0.1)[1] == "g"

    counts = {
        r["split"]: r["n"]
        for r in hash_split(df, "k", 0.9, 0.1).groupBy("split").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert counts.get("test", 0) == 0
    assert counts.get("val", 0) > 0  # 10% of 400 ≈ 40, never zero
    assert sum(counts.values()) == n

    assert deterministic_sample(df, "k", 1.0).count() == n
    # train==1.0: everything lands in train
    all_train = hash_split(df, "k", 1.0, 0.0).groupBy("split").count().collect()
    assert len(all_train) == 1 and all_train[0]["split"] == "train"


def test_stratified_sample_nested_and_exclusive(spark):
    """Per-stratum keeps are nested across fractions (raising a share
    keeps every previously kept row), frac 1.0 keeps the whole
    stratum, and strata absent from fracs are dropped entirely."""
    from journal_batch_processer_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "k long, s string")

    def kept(fracs):
        return {
            (r["k"], r["s"]) for r in stratified_sample(df, "k", "s", fracs).collect()
        }

    small = kept({"a": 0.2, "b": 1.0})
    big = kept({"a": 0.6, "b": 1.0})
    assert small <= big  # nested per stratum
    assert all(s != "c" for _, s in big)  # unlisted stratum dropped
    assert {k for k, s in big if s == "b"} == {k for k, s_ in rows if s_ == "b"}
    n_a = sum(1 for _, s in kept({"a": 0.5}) if s == "a")
    assert abs(n_a / 200 - 0.5) < 0.15  # ~frac within md5 tolerance


def test_portable_hash64_matches_duckdb(spark):
    """The md5-derived 60-bit hash must be BIT-IDENTICAL across
    engines — it is the foundation of the minhash/simhash full
    oracles. Pin the contract on ASCII, unicode, empty, and long
    inputs."""
    import duckdb

    from journal_batch_processer_spark.operators.dedup import portable_hash64
    from pyspark.sql import functions as F

    strs = ["", "a", "hello world", "naïve café 東京", "x" * 10_000,
            "0", " leading space", "tab\tsep"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in strs:
        want = con.execute(
            "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == want, s


# ---------------------------------------------------------------------------
# capped PPJoin: exact threshold-Jaccard over rarest-N capped sets
# ---------------------------------------------------------------------------


def _capped_jaccard_model(texts: dict[int, str], cap: int | None, t: float):
    """Independent pure-Python model of ngram_jaccard_pairs_prefix with
    max_shingles_per_doc: distinct 3-word shingles, per-doc truncation
    to the cap rarest (ties on the shingle string), exact Jaccard."""
    from collections import Counter

    sets = {}
    for d, txt in texts.items():
        toks = txt.lower().split(" ")
        sets[d] = (
            {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )
    df = Counter(s for ss in sets.values() for s in ss)
    if cap is not None:
        sets = {
            d: set(sorted(ss, key=lambda s: (df[s], s))[:cap])
            for d, ss in sets.items()
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= t:
                out[(a, b)] = (inter, len(sa), len(sb))
    return out


def test_ppjoin_cap_matches_model(spark):
    """Capped PPJoin == the naive capped-set model, on a corpus with a
    mega-document whose shingle count far exceeds the cap."""
    from journal_batch_processer_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    texts = {
        1: base,
        2: base + " today",                      # near-dup of 1
        3: "completely different words appear in this other document body",
        4: "completely different words appear in this other document text",
        # mega-doc: 60x repetition + unique tail -> way over the cap
        5: " ".join(
            f"w{i} w{i + 1} common phrase block" for i in range(60)
        ),
        6: " ".join(
            f"w{i} w{i + 1} common phrase block" for i in range(60)
        ) + " extra tail words here",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    for cap in (8, 25, None):
        got = {
            (r["doc_a"], r["doc_b"]): (r["inter"], r["sz_a"], r["sz_b"])
            for r in ngram_jaccard_pairs_prefix(
                df, "doc_id", "text", n=3, threshold=0.3,
                max_shingles_per_doc=cap,
            ).collect()
        }
        want = _capped_jaccard_model(texts, cap, 0.3)
        assert got == want, f"cap={cap}: {got} != {want}"


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    cap=st.integers(3, 12),
)
def test_ppjoin_cap_property(spark, seed, cap):
    """Random small corpora: capped operator == capped model for any
    cap; docs under the cap behave exactly like the uncapped operator."""
    import random

    from journal_batch_processer_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        for d in range(1, 7)
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["sz_a"], r["sz_b"])
        for r in ngram_jaccard_pairs_prefix(
            df, "doc_id", "text", n=3, threshold=0.2, max_shingles_per_doc=cap
        ).collect()
    }
    assert got == _capped_jaccard_model(texts, cap, 0.2)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20 * 24), st.integers(1, 90)),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 20 * 24), st.integers(1, 120)),
        min_size=1,
        max_size=8,
    ),
)
def test_interval_overlap_join_equals_theta(spark, lefts, rights):
    """Banded interval join == naive theta join on arbitrary interval
    sets (hour-granular starts/durations over a 3-week range, so
    single-bucket, multi-day and boundary-touching intervals all
    occur)."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.joins import (
        interval_overlap_join,
    )

    base = _dt.datetime(2024, 3, 1)

    def mk(rows, pref):
        data = [
            (
                f"{pref}{i}",
                base + _dt.timedelta(hours=h),
                base + _dt.timedelta(hours=h + d),
            )
            for i, (h, d) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, f"{pref}id string, {pref}lo timestamp, {pref}hi timestamp"
        )

    L, R = mk(lefts, "l"), mk(rights, "r")
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            L, R, "llo", "lhi", "rlo", "rhi"
        ).collect()
    }
    want = {
        (r["lid"], r["rid"])
        for r in L.join(
            R, (F.col("llo") <= F.col("rhi")) & (F.col("rlo") <= F.col("lhi"))
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["en", "de", "fr", "es", "zh"]),
        st.integers(1, 999_999),
        min_size=2,
        max_size=5,
    )
)
def test_corpus_mix_matches_python_model(spark, raw_shares):
    """corpus_mix's kept set and keep rates must equal an independent
    python recomputation (same integer ppm arithmetic, same md5
    thresholds) for arbitrary share mixes."""
    import hashlib

    from journal_batch_processer_spark.operators.sampling import corpus_mix

    # normalize to exactly 1e6 ppm (give the remainder to the first key)
    ks = sorted(raw_shares)
    total = sum(raw_shares.values())
    shares = {k: raw_shares[k] * 1_000_000 // total for k in ks}
    shares[ks[0]] += 1_000_000 - sum(shares.values())
    shares = {k: v for k, v in shares.items() if v > 0}

    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = [(r["doc_id"], r["lang"]) for r in docs.collect()]
    counts = {}
    for _, lang in rows:
        if lang in shares:
            counts[lang] = counts.get(lang, 0) + 1
    if set(shares) - set(counts):
        return  # unachievable mix: operator raises (covered by unit test)

    t_total = min(counts[s] * 1_000_000 // shares[s] for s in shares)
    expected = set()
    expected_ppm = {}
    for s in shares:
        target = t_total * shares[s] // 1_000_000
        keep_ppm = min(1_000_000, target * 1_000_000 // counts[s])
        expected_ppm[s] = keep_ppm
        thr = (
            "g"
            if keep_ppm >= 1_000_000
            else format(keep_ppm * 16_777_216 // 1_000_000, "06x")
        )
        for doc_id, lang in rows:
            if lang == s:
                h = hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:6]
                if h < thr:
                    expected.add((doc_id, s))

    got_rows = corpus_mix(docs, "doc_id", "lang", shares).collect()
    got = {(r["doc_id"], r["lang"]) for r in got_rows}
    got_ppm = {r["lang"]: r["keep_ppm"] for r in got_rows}
    assert got == expected
    for s, p in got_ppm.items():
        assert expected_ppm[s] == p


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    w=st.integers(9, 40),
    h=st.integers(8, 32),
    shift=st.integers(1, 60),
)
def test_dhash_brightness_invariant_and_deterministic(seed, w, h, shift):
    """dHash properties that hold EXACTLY under the integer pipeline:
    (a) a global brightness offset never changes the hash (every box
    mean shifts by the same integer, comparisons are unchanged);
    (b) the hash is a pure function of pixels (determinism)."""
    import numpy as np

    from journal_batch_processer_spark.operators.multimodal import (
        dhash64_words,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256 - shift, size=(h, w, 3)).astype(np.uint8)
    base = dhash64_words(img)
    assert dhash64_words(img.copy()) == base
    brighter = (img.astype(np.int64) + shift).astype(np.uint8)
    assert dhash64_words(brighter) == base
