"""Text analysis for training-data pipelines: token stats, quality
scoring, language id, fingerprinting.

Everything is built from dialect-portable primitives (split on a
literal space, list filters, md5, integer ratios) so the DuckDB
oracles compute the same bits — and everything stays in whole-stage
codegen; no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def bigram_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc, bg) rows — one row per adjacent token pair, space-joined,
    in document order, built with ``zip_with`` over two shifted
    ``slice``s of the token array. r13 measurement: the old
    ``transform(sequence(1, n-1), i -> element_at(t, i) || ...)``
    build ran 3.0 s at sf0.1 (per-index ``element_at`` random access,
    interpreted) vs 0.33 s for this shape — zip_with's linear co-walk
    of the two slices is as fast as the posexplode+lead window WITHOUT
    the window's doc-partitioned exchange (§2.4: remove the shuffle
    outright). Per-row build, so duplicate ids are harmless.
    Multiset-identical to the transform build — pinned in
    tests/test_round13_gram_shapes.py."""
    t = _tokens(F.col(text_col))
    n = F.size(t)
    grams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        *extra_cols,
        F.explode(grams).alias("bg"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    # total non-space chars / token count — integer-derived, exact
    avg_len = (n_chars - (n_tokens - 1)) / n_tokens
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        avg_len.alias("avg_token_len"),
    )


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length + stopword-ratio heuristic quality score in [0, 1]."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stop = _count_in(toks, STOPWORDS)
    stop_ratio = stop / n
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    score = F.lit(0.5) * len_score + F.lit(0.5) * stop_ratio
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language id (n-gram-free heuristic): argmax of
    marker hits with a fixed tie order; zero hits → 'und'."""
    toks = _tokens(F.col(text_col))
    counts = {lang: _count_in(toks, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # fixed order: later wins only on strict >
        c = counts[lang]
        is_better = c > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, c).otherwise(best_n)
    return df.select(
        F.col(id_col),
        *[counts[lang].alias(f"n_{lang}") for lang in LANG_MARKERS],
        best.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization + md5 content fingerprint — the join key for
    cross-corpus exact dedup at scale (16-byte shuffle key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# ---------------------------------------------------------------------------
# PII scrub / repetition signals / quality gate — the filter battery a
# pretraining corpus sweep runs before tokenization. All pure
# expressions (narrow, codegen, no shuffle except repetition's
# per-doc token group) and RE2-safe regex (no lookaround, no
# backreferences) so DuckDB oracles replay them bit-for-bit.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # category -> (RE2-safe pattern, replacement token)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    "phone": (r"\+\d{1,3} \d{3} \d{3,6}", "<PHONE>"),
}

# email first: an email's host part would otherwise survive as an
# IP-ish dotted token after a partial scrub.
PII_ORDER = ("email", "ip", "phone")


def pii_scrub(
    df: DataFrame, id_col: str, text_col: str, append: bool = False
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers, with per-category match
    counts (counted BEFORE replacement so overlapping categories are
    attributed to the first pass that claims them).

    ``append=True`` keeps every input column, REPLACES ``text_col``
    with the scrubbed text, and adds the counts — the composition
    shape (no join-back)."""
    text = F.col(text_col)
    counts = {}
    scrubbed = text
    for cat in PII_ORDER:
        pat, repl = PII_PATTERNS[cat]
        counts[cat] = F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    if append:
        return df.withColumns(
            {text_col: scrubbed, **{f"n_{c}": counts[c] for c in PII_ORDER}}
        )
    return df.select(
        F.col(id_col),
        *[counts[c].alias(f"n_{c}") for c in PII_ORDER],
        scrubbed.alias("scrubbed"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition signals (Gopher-style): distinct-token ratio, the
    most frequent token's share (ties break to the lexicographically
    smallest token, so the answer is deterministic), and the duplicate
    bigram fraction. One shuffle: the per-(doc, token) count."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    cnt = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("c"))
    # top token = min over (-count, token): count desc then token asc —
    # one partially-aggregated groupBy instead of a per-doc window sort
    top = F.min(F.struct((-F.col("c")).alias("nc"), F.col("tok").alias("t")))
    per_doc = cnt.groupBy("doc").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        top.alias("top"),
    ).select(
        "doc", "n_tokens", "n_distinct",
        F.col("top.t").alias("top_token"),
        (-F.col("top.nc")).alias("top_c"),
    )
    # bigram duplication is a pure per-row expression — no second
    # explode pass; short texts (<2 tokens) have no bigrams → 0.0
    t = _tokens(F.col(text_col))
    n = F.size(t)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = df.select(
        F.col(id_col).alias("doc"),
        F.size(grams).alias("n_bi"),
        F.size(F.array_distinct(grams)).alias("n_bi_distinct"),
    )
    return (
        per_doc.join(bi, "doc")
        .select(
            F.col("doc").alias(id_col),
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
            "top_token",
            F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_token_frac"),
            F.round(
                F.when(F.col("n_bi") > 0, (F.col("n_bi") - F.col("n_bi_distinct")) / F.col("n_bi"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("dup_bigram_frac"),
        )
    )


def ngram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the perplexity
    proxy quality filters use (CCNet/RedPajama train a KenLM and drop
    low-likelihood docs). Here the model IS the corpus: for every
    bigram (w1, w2) the conditional probability p(w2|w1) =
    c(w1,w2)/c(w1·) is expressed as an INTEGER in parts-per-million
    (``(1_000_000 * c2) div c1`` — floor division of exact counts), so
    the per-doc sum is a bigint and the only float op is one final
    IEEE division, bit-identical across engines. High mean → the doc's
    transitions are typical of the corpus; low mean → rare/gibberish
    transitions. Reference analog: the description-keyword extraction
    is the only text scoring in BatchUpdate.py (:648); this is its
    corpus-statistical generalization.

    Scale shape: bigram generation is a per-row expression (no
    self-join); model training is two key-partial groupBys over the
    (bounded-by-data) distinct-bigram set; scoring is one equi-join of
    doc-bigrams against the model on the bigram key. Stop-bigram skew
    on that join is AQE-split; nothing collects to the driver."""
    from ..cache import pin

    # r13: bigram emission via the lead-window shape (bigram_rows) —
    # the transform-lambda array build ran interpreted, 9× slower
    doc_bi = pin(bigram_rows(df, id_col, text_col))
    c2 = doc_bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    w1 = F.element_at(F.split(F.col("bg"), " "), 1)
    c1 = c2.groupBy(w1.alias("w1")).agg(F.sum("c2").alias("c1"))
    model = (
        c2.withColumn("w1", w1)
        .join(c1, "w1")
        .select("bg", F.expr("(1000000 * c2) div c1").alias("p_ppm"))
    )
    scored = (
        doc_bi.join(model, "bg")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppm").alias("sum_ppm"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_ppm", F.lit(0)).cast("long").alias("sum_ppm"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("sum_ppm").cast("double") / F.col("n_bigrams"),
            ).alias("mean_cond_ppm"),
        )
    )


def quality_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stop_ratio: float = 0.02,
    max_symbol_ratio: float = 0.1,
    append: bool = False,
) -> DataFrame:
    """Gopher-style quality gate: length, mean token length, stopword
    ratio, symbol ratio → per-rule booleans + the conjunctive keep
    flag. Narrow (no shuffle); the thresholds are the documented
    Gopher defaults scaled to this corpus.

    ``append=True`` keeps every input column and adds the flags —
    the shape pipeline composition wants (no join-back needed)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n = F.size(toks)
    n_chars = F.length(text)
    mean_len = (n_chars - (n - 1)) / n
    stop_ratio = _count_in(toks, STOPWORDS) / n
    symbol_ratio = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")) / n_chars
    ok_len = (n >= min_tokens) & (n <= max_tokens)
    ok_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    ok_stop = stop_ratio >= min_stop_ratio
    ok_sym = symbol_ratio <= max_symbol_ratio
    keep = ok_len & ok_mean & ok_stop & ok_sym
    if append:
        return df.withColumns(
            {
                "n_tokens": n,
                "ok_length": ok_len,
                "ok_mean_len": ok_mean,
                "ok_stopwords": ok_stop,
                "ok_symbols": ok_sym,
                "keep": keep,
            }
        )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        ok_len.alias("ok_length"),
        ok_mean.alias("ok_mean_len"),
        ok_stop.alias("ok_stopwords"),
        ok_sym.alias("ok_symbols"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization (web-corpus dedup key)
# ---------------------------------------------------------------------------


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for dedup grouping — the web-corpus
    staple where the same page arrives as http/https, with/without
    ``www.``, with tracking params, fragments, or a trailing slash.

    Rules (all expression-only, whole-stage codegen; each is a
    deliberate, documented normalization — canonicalization is policy,
    not parsing):
    - scheme stripped (``http://``/``https://``/any RFC-3986 scheme)
    - fragment (``#...``) stripped
    - host lowercased, leading ``www.`` stripped (paths stay
      case-sensitive per RFC 3986)
    - ``utm_*`` tracking params removed; ``?`` dropped if none remain
      (param ORDER is preserved — reordering params can change
      semantics on some sites, so it is not normalized away)
    - trailing slashes on the path stripped

    Reference: BatchUpdate.py has no URL surface (EXT per SURVEY §2i).
    """
    u0 = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    u = F.regexp_replace(u0, r"#.*$", "")
    host_raw = F.regexp_extract(u, r"^([^/?]*)", 1)
    host = F.regexp_replace(F.lower(host_raw), r"^www\.", "")
    tail = F.substr(u, F.length(host_raw) + F.lit(1))
    path_raw = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.regexp_replace(path_raw, r"/+$", "")
    qs = F.substr(tail, F.length(path_raw) + F.lit(2))
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (~p.startswith("utm_")) & (p != F.lit("")),
    )
    q2 = F.array_join(kept, "&")
    return F.concat(
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Group rows by canonical URL: one shuffle on the canonical key
    (min-id winner + count, the deterministic dedup contract used by
    dedup_exact). At 100 TB the canonical key is also the right
    bucketing/partition column for the crawl store."""
    return (
        df.withColumn("canonical", canonical_url(F.col(url_col)))
        .groupBy("canonical")
        .agg(
            F.min(id_col).alias("first_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


BPE_SEP = "\x1f"  # unit separator: cannot occur in natural text


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    sep: str = BPE_SEP,
) -> list[tuple[int, str, str, str, int]]:
    """Byte-pair-encoding merge training (the real tokenizer-training
    loop, not the BPE-ish regex tokenizer in ``bpe_token_count``):
    start from characters, repeatedly count adjacent symbol pairs
    weighted by word frequency and merge the most frequent pair
    (ties → lexicographically smallest). Returns the learned merge
    table [(round, left, right, merged, freq)].

    Distribution shape — why this scales: the iterated state is the
    WORD-FREQUENCY table (vocabulary), which aggregation collapses to
    ~|vocab| rows however big the corpus is; the corpus itself is
    scanned exactly once. Each round is one pair-count aggregate over
    the vocab plus one narrow `replace`, with the winning pair pulled
    to the driver (a 1-row action, the graph.py scalar-action
    precedent) because round r+1's plan needs it as a literal.
    localCheckpoint after each round keeps the 8-round lineage flat.

    r08 rework (was: 8 sequential Spark jobs, ~2 s of pure job
    latency at sf0.1): since the iterated state is MODEL-sized, the
    word-frequency table is collected once and the serial merge loop
    runs on the driver — exactly how production BPE trainers
    distribute (HuggingFace tokenizers / SentencePiece: distributed
    word counting, local merge training), and the same
    model-sized-collect precedent as embed_pca_power's gramian. True
    BPE is inherently serial (round r+1's pair counts depend on round
    r's merge), so in-plan rounds bought nothing but latency; the
    driver loop reproduces the identical merges because every step —
    pair counting, (cnt DESC, l, r) tie-break, leftmost-greedy
    replace — is exact integer/string arithmetic with the same
    semantics in Python, Spark, and DuckDB.

    Exactness: pair application is leftmost-greedy non-overlapping —
    exactly the semantics of string `replace` over the
    separator-joined symbol string (replace consumes matches left to
    right and continues AFTER the replacement, so "A A A" merges to
    "AA A", not "AA AA") — and both engines' `replace` agree, which is
    what makes the unrolled SQL oracle hash-exact. Words containing
    the separator (impossible in natural text) are dropped, loudly.
    """
    w = F.col("__w")
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("__w")
        )
        .filter((w != "") & (~w.contains(sep)))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = [
        (int(row["freq"]), sep + sep.join(row["__w"]) + sep)
        for row in words.collect()  # |vocab| rows — model-sized
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for freq, s in vocab:
            syms = s.split(sep)[1:-1]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:  # vocabulary fully merged — nothing left to learn
            break
        # max by (cnt DESC, l, r): Python str compares by code point,
        # matching Spark/DuckDB binary string ordering
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, l + r, cnt))
        # str.replace is leftmost-greedy non-overlapping and continues
        # AFTER the replacement — the same contract as Spark replace /
        # DuckDB replace the oracle relies on
        old, new = sep + l + sep + r + sep, sep + l + r + sep
        vocab = [(freq, s.replace(old, new)) for freq, s in vocab]
    return merges


def train_langid_profiles(
    parquet_path: str, top_n: int = 20
) -> dict[str, list[str]]:
    """Cavnar–Trenkle (1994, "N-Gram-Based Text Categorization")
    language profiles: per language, the ``top_n`` most frequent
    character TRIGRAMS of the lowercased text, rank-ordered by
    (count desc, trigram asc) — fully deterministic, so the profiles
    inline as literals into BOTH the Spark plan and the DuckDB oracle
    (the IVF-centroid training pattern). Training reads the labeled
    corpus driver-side once and is memoized per file identity."""
    from journal_batch_processer_spark.operators.similarity import _train_memo

    def compute():
        from collections import Counter

        import duckdb

        rows = duckdb.sql(
            f"SELECT lang, lower(text) FROM read_parquet('{parquet_path}') "
            f"WHERE length(text) >= 3 ORDER BY lang"
        ).fetchall()
        by_lang: dict[str, Counter] = {}
        for lang, t in rows:
            c = by_lang.setdefault(lang, Counter())
            for i in range(len(t) - 2):
                c[t[i:i + 3]] += 1
        return {
            lang: [
                g
                for g, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
                    :top_n
                ]
            ]
            for lang, c in sorted(by_lang.items())
        }

    return _train_memo(parquet_path, "langid", (top_n,), compute)


def langid_ngram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: dict[str, list[str]],
    top_n: int = 20,
) -> DataFrame:
    """Cavnar–Trenkle out-of-place language classification: rank the
    document's own top-``top_n`` trigrams, compare against each
    language profile — a profiled trigram contributes |doc_rank −
    profile_rank|, an unprofiled one the max penalty ``top_n + 1`` —
    and the smallest total distance wins (ties to the alphabetically
    first language). All-integer and deterministic, so the whole
    classifier carries a value oracle.

    r13 shape: one ``mapInPandas`` pass over ``(id, lower(text))``.
    The decision is strictly per-document and the profiles are a tiny
    literal closure, so nothing about it needs a shuffle — the prior
    plan exploded one row PER CODEPOINT through a lead window plus a
    groupBy/rank/score pipeline (3 exchanges over ~300× the input
    rows). Trigram slicing, counting, ranking, and the integer
    distance argmin all happen batch-side in Python; every step is
    exact integer / codepoint-order arithmetic, so results are
    bit-identical to the expression spec (``langid_ngram_expr``, kept
    below and pinned equal in tests/test_round13_gram_shapes.py):
    Python str sort == Spark UTF8String binary sort (UTF-8 byte order
    preserves codepoint order), ``t[i:i+3]`` == the split('')/lead
    trigram, min-by-(dist, lang) == row_number over (dist, lang)."""
    import pandas as pd

    prof_rank = {
        lang: {g: rp + 1 for rp, g in enumerate(grams)}
        for lang, grams in profiles.items()
    }
    langs = sorted(profiles)
    penalty = top_n + 1

    def classify(batches):
        for pdf in batches:
            ids: list = []
            preds: list[str] = []
            dists: list[int] = []
            for doc, t in zip(pdf["__id"], pdf["__t"]):
                counts: dict[str, int] = {}
                for i in range(len(t) - 2):
                    g = t[i:i + 3]
                    counts[g] = counts.get(g, 0) + 1
                top = sorted(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )[:top_n]
                best_lang, best_dist = None, None
                for lang in langs:
                    pr = prof_rank[lang]
                    d = 0
                    for r, (g, _) in enumerate(top, 1):
                        rp = pr.get(g)
                        d += abs(r - rp) if rp is not None else penalty
                    if best_dist is None or d < best_dist:
                        best_lang, best_dist = lang, d
                ids.append(doc)
                preds.append(best_lang)
                dists.append(best_dist)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pred_lang": pd.Series(preds, dtype="object"),
                    "dist": pd.Series(dists, dtype="int64"),
                }
            )

    t = F.lower(F.col(text_col))
    src = df.filter(F.length(t) >= 3).select(
        F.col(id_col).alias("__id"), t.alias("__t")
    )
    return src.mapInPandas(
        classify, "doc_id long, pred_lang string, dist long"
    )


def langid_ngram_expr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: dict[str, list[str]],
    top_n: int = 20,
) -> DataFrame:
    """Expression-form spec of :func:`langid_ngram` (the shape the
    DuckDB oracle mirrors): trigram explode per row, doc ranking one
    window over (doc, count), profiles a broadcast literal table,
    distance one aggregation. Kept executable so equivalence with the
    mapInPandas path stays pinned by test."""
    t = F.lower(F.col(text_col))
    # r13: character trigrams via posexplode + lead window (the
    # shingle_table shape) — the transform/substring lambda runs
    # INTERPRETED per character (1.12 s vs 0.83 s at sf0.1, and the
    # gap widens with corpus size since the lambda is per-codepoint).
    # split(t, '') yields one codepoint per element; concat of three
    # consecutive codepoints == substring(lower(text), i, 3).
    chars = df.filter(F.length(t) >= 3).select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(t, "")).alias("pos", "c"),
    )
    w_ch = Window.partitionBy("doc").orderBy("pos")
    c2 = F.lead("c", 1).over(w_ch)
    c3 = F.lead("c", 2).over(w_ch)
    grams = chars.select(
        "doc",
        F.when(c3.isNotNull(), F.concat("c", c2, c3)).alias("g"),
    ).filter(F.col("g").isNotNull())
    w_rank = Window.partitionBy("doc").orderBy(
        F.col("n").desc(), F.col("g").asc()
    )
    doc_ranks = (
        grams.groupBy("doc", "g")
        .agg(F.count("*").alias("n"))
        .withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= top_n)
        .select("doc", "g", "r")
    )
    spark = df.sparkSession
    prof_rows = [
        (lang, g, rp + 1)
        for lang, grams_ in profiles.items()
        for rp, g in enumerate(grams_)
    ]
    prof = spark.createDataFrame(prof_rows, "lang string, g string, rp int")
    langs = spark.createDataFrame(
        [(lang,) for lang in sorted(profiles)], "lang string"
    )
    penalty = F.lit(top_n + 1)
    scored = (
        doc_ranks.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "g"], "left")
        .withColumn(
            "d",
            F.when(
                F.col("rp").isNotNull(), F.abs(F.col("r") - F.col("rp"))
            ).otherwise(penalty),
        )
        .groupBy("doc", "lang")
        .agg(F.sum("d").alias("dist"))
    )
    w_best = Window.partitionBy("doc").orderBy(
        F.col("dist").asc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("doc").alias("doc_id"),
            F.col("lang").alias("pred_lang"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
