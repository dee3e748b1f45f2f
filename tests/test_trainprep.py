"""Semantic tests for queries/trainprep.py: each operator is checked
against an independent pure-Python recomputation at sf0.001 (the
DuckDB oracle sweep is the cross-engine gate; these tests pin the
SEMANTICS — packing invariants, exact chunk reconstruction, integer
PageRank mass — against a model written without Spark or SQL)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from tests.conftest import SF_DIR


def _docs_rows(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "source")
        .collect()
    )


def test_chunk_sliding_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        q_chunk_sliding,
    )

    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_len, r.chunk_text)
        for r in q_chunk_sliding(spark, SF_DIR).collect()
    }
    expected = {}
    for row in _docs_rows(spark):
        toks = row.text.split(" ")
        for idx, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            seg = toks[start : start + CHUNK_WINDOW]
            expected[(row.doc_id, idx)] = (start, len(seg), " ".join(seg))
    assert got == expected


def test_seq_pack_invariants_and_model(spark):
    from journal_batch_processer_spark.queries.trainprep import PACK_CAP, q_seq_pack

    rows = q_seq_pack(spark, SF_DIR).collect()
    docs = {r.doc_id: r for r in _docs_rows(spark)}

    # every token of every doc is packed exactly once
    per_doc = defaultdict(int)
    for r in rows:
        assert r.seg_len > 0
        per_doc[r.doc_id] += r.seg_len
    for doc_id, row in docs.items():
        assert per_doc[doc_id] == len(row.text.split(" "))

    # every bin except the last of its source holds exactly PACK_CAP
    per_bin = defaultdict(int)
    for r in rows:
        per_bin[(r.source, r.bin_id)] += r.seg_len
    last_bin = {}
    for (source, bin_id), _ in per_bin.items():
        last_bin[source] = max(last_bin.get(source, -1), bin_id)
    for (source, bin_id), total in per_bin.items():
        if bin_id != last_bin[source]:
            assert total == PACK_CAP, (source, bin_id, total)
        else:
            assert 0 < total <= PACK_CAP

    # exact segment model: lay docs end-to-end per source in id order
    expected = set()
    offsets = defaultdict(int)
    for row in sorted(docs.values(), key=lambda r: (r.source, r.doc_id)):
        n = len(row.text.split(" "))
        start = offsets[row.source]
        for b in range(start // PACK_CAP, (start + n - 1) // PACK_CAP + 1):
            lo = max(start, b * PACK_CAP)
            hi = min(start + n, (b + 1) * PACK_CAP)
            expected.add((row.source, b, row.doc_id, lo - start, hi - lo))
        offsets[row.source] = start + n
    assert {
        (r.source, r.bin_id, r.doc_id, r.seg_start, r.seg_len) for r in rows
    } == expected


def test_tfidf_topk_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import q_tfidf_topk

    rows = q_tfidf_topk(spark, SF_DIR).collect()
    counts = {}
    dfreq = Counter()
    for row in _docs_rows(spark):
        k = Counter(row.text.split(" "))
        counts[row.doc_id] = k
        dfreq.update(k.keys())
    expected = set()
    for doc_id, k in counts.items():
        scored = sorted(
            ((tok, c, (c * 1_000_000_000) // dfreq[tok]) for tok, c in k.items()),
            key=lambda t: (-t[2], t[0]),
        )
        for rnk, (tok, c, score) in enumerate(scored[:5], start=1):
            expected.add((doc_id, tok, c, dfreq[tok], score, rnk))
    assert {
        (r.doc_id, r.tok, r.k, r.df_cnt, r.score_scaled, r.rnk) for r in rows
    } == expected


def test_text_bigrams_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import q_text_bigrams

    rows = q_text_bigrams(spark, SF_DIR).collect()
    totals = Counter()
    docsets = defaultdict(set)
    for row in _docs_rows(spark):
        toks = row.text.split(" ")
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            totals[bg] += 1
            docsets[bg].add(row.doc_id)
    expected = {
        (bg, n, len(docsets[bg])) for bg, n in totals.items() if n >= 3
    }
    assert {(r.bigram, r.n_total, r.n_docs) for r in rows} == expected


def test_embed_quantize_bounds_and_model(spark):
    import math

    from journal_batch_processer_spark.queries.trainprep import q_embed_quantize

    embs = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    rows = q_embed_quantize(spark, SF_DIR).collect()
    assert set(embs) == {r.vec_id for r in rows}
    for r in rows:
        v = [float(x) for x in embs[r.vec_id]]
        maxabs = max(abs(x) for x in v)
        assert r.maxabs == maxabs
        expect_q = [math.floor(x / maxabs * 127 + 0.5) for x in v]
        # the vector is a comma-joined string since r06 (driver shape)
        got_q = [int(x) for x in r.q_str.split(",")]
        assert got_q == expect_q
        assert all(-127 <= x <= 127 for x in got_q)
        assert r.q_sum == sum(expect_q)


def test_graph_pagerank_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import (
        PR_ITERS,
        PR_TOTAL,
        q_graph_pagerank,
    )

    nodes = sorted(r.doc_id for r in _docs_rows(spark))
    n = len(nodes)
    edges = []
    for i in nodes:
        for a, c in ((3, 1), (7, 11), (1, 1)):
            edges.append((i, (i * a + c) % n))
    ranks = {i: PR_TOTAL for i in nodes}
    for _ in range(PR_ITERS):
        insum = defaultdict(int)
        for src, dst in edges:
            insum[dst] += ranks[src] // 3
        ranks = {
            i: (PR_TOTAL * 15) // (100 * n) + (85 * insum[i]) // 100
            for i in nodes
        }
    got = {r.node_id: r.pr_mass for r in q_graph_pagerank(spark, SF_DIR).collect()}
    assert got == ranks


def test_funnel_events_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import q_funnel_events
    from journal_batch_processer_spark.session import load_events

    ev = load_events(spark, SF_DIR).select("user_id", "event_type", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_type))
    expected = {}
    for user, evs in by_user.items():
        views = [t for t, ty in evs if ty == "view"]
        if not views:
            continue
        t1 = min(views)
        clicks = [t for t, ty in evs if ty == "click" and t > t1]
        t2 = min(clicks) if clicks else None
        t3 = None
        if t2 is not None:
            buys = [t for t, ty in evs if ty == "purchase" and t > t2]
            t3 = min(buys) if buys else None
        stage = 1 + (t2 is not None) + (t3 is not None)
        expected[user] = (t1, t2, t3, stage)

    def us(ts):
        import calendar

        if ts is None:
            return None
        return (
            calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
            if ts.tzinfo is None
            else int(ts.timestamp() * 1_000_000)
        )

    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.stage)
        for r in q_funnel_events(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for user, (t1, t2, t3, stage) in expected.items():
        assert got[user] == (us(t1), us(t2), us(t3), stage), user


def test_dedup_chunks_matches_python_model(spark):
    from journal_batch_processer_spark.queries.trainprep import (
        DEDUP_CHUNK_TOKENS,
        q_dedup_chunks,
    )

    occurrences = defaultdict(list)
    for row in _docs_rows(spark):
        toks = row.text.split(" ")
        for start in range(0, len(toks), DEDUP_CHUNK_TOKENS):
            seg = " ".join(toks[start : start + DEDUP_CHUNK_TOKENS])
            occurrences[hashlib.md5(seg.encode()).hexdigest()].append(row.doc_id)
    expected = {
        (h, len(set(ids)), len(ids), min(ids))
        for h, ids in occurrences.items()
        if len(set(ids)) > 1
    }
    got = {
        (r.chunk_hash, r.n_docs, r.n_occurrences, r.first_doc)
        for r in q_dedup_chunks(spark, SF_DIR).collect()
    }
    assert got == expected


def test_bpe_train_matches_python_model(spark):
    """The learned merge table must equal a pure-Python BPE trainer
    (dict counting, leftmost-greedy merge application) run on the same
    corpus."""
    import os
    from collections import Counter

    from journal_batch_processer_spark.operators.text_analysis import (
        bpe_train,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = bpe_train(docs, "text", n_merges=6)

    freq = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    expected = []
    for rnd in range(1, 7):
        pc = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rnd, l, r, l + r, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    assert got == expected
    assert len(got) == 6


def test_bpe_merge_is_leftmost_greedy(spark):
    """'A A A' must merge to 'AA A' (left pair wins, no overlap)."""
    from journal_batch_processer_spark.operators.text_analysis import (
        bpe_train,
    )

    docs = spark.createDataFrame([("a a a aaa",)], "text string")
    # words: 'a' ×3 (single char, no pairs), 'aaa' (pairs (a,a)×2)
    merges = bpe_train(docs, "text", n_merges=2)
    assert merges[0][1:] == ("a", "a", "aa", 2)
    # after merging: 'aaa' -> [aa, a]; next best pair is (aa, a)
    assert merges[1][1:] == ("aa", "a", "aaa", 1)


def test_bpe_encode_counts_match_python_model(spark):
    """Per-doc BPE token counts after 6 merges must equal the python
    model's encode (train with the model, apply leftmost-greedy)."""
    import os
    from collections import Counter

    from journal_batch_processer_spark.queries.trainprep import (
        q_tokenizer_encode,
    )
    from tests.conftest import SF_DIR

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in q_tokenizer_encode(spark, SF_DIR).collect()
    }

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rows = docs.select("doc_id", "text").collect()
    freq = Counter()
    for r in rows:
        for w in r["text"].split(" "):
            if w:
                freq[w] += 1

    def apply(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    vocab = {tuple(w): f for w, f in freq.items()}
    merges = []
    for _ in range(8):
        pc = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r))
        # re-derive vocab by applying all merges so far to raw words
        vocab = {}
        for w, f in freq.items():
            syms = tuple(w)
            for ml, mr in merges:
                syms = apply(syms, ml, mr)
            vocab[syms] = vocab.get(syms, 0) + f

    enc_cache = {}
    for w in freq:
        syms = tuple(w)
        for ml, mr in merges:
            syms = apply(syms, ml, mr)
        enc_cache[w] = len(syms)
    want = {}
    for r in rows:
        ws = [w for w in r["text"].split(" ") if w]
        want[r["doc_id"]] = (len(ws), sum(enc_cache[w] for w in ws))
    assert got == want


def test_curriculum_order_stages_and_positions(spark):
    """Stages are length-ordered quartiles (earlier stage => shorter
    docs at the boundary) and positions are a permutation 1..|stage|."""
    import os

    from journal_batch_processer_spark.queries.trainprep import (
        CURRICULUM_STAGES,
        q_curriculum_order,
    )
    from tests.conftest import SF_DIR

    out = q_curriculum_order(spark, SF_DIR)
    rows = out.collect()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lens = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert len(rows) == len(lens)
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == set(range(CURRICULUM_STAGES))
    # positions form 1..n per stage
    for stage, rs in by_stage.items():
        assert sorted(x["position"] for x in rs) == list(
            range(1, len(rs) + 1)
        )
    # stage boundaries respect length order: max length of stage s
    # <= min length of stage s+2 is too weak; use quantile ordering:
    # every stage's MEDIAN length must be nondecreasing
    meds = []
    for stage in range(CURRICULUM_STAGES):
        ls = sorted(lens[x["doc_id"]] for x in by_stage[stage])
        meds.append(ls[len(ls) // 2])
    assert meds == sorted(meds)
