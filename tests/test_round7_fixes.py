"""Regression tests for the round-7 ADVICE fixes.

- GIF LZW table freezes at the 4096-entry limit on deferred-clear
  streams (ADVICE r06 #1: unbounded table growth).
- ngram dedup operators register their persisted relations in the
  cache scope so drivers can release them (ADVICE r06 #2).
- JPEG baseline entropy slicing scans FORWARD to the first real
  marker instead of rfind-ing the last FFD9, so trailing garbage
  containing FF D9 cannot extend the slice (ADVICE r06 #3).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


# ---------------------------------------------------------------- GIF


def _lzw_raw(mcs: int, codes: list[tuple[int, int]]) -> bytes:
    """Pack (code, width) pairs LSB-first into GIF LZW bytes."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_table_freezes_at_4096_on_deferred_clear():
    """A deferred-clear stream (no clear code after the initial one)
    that runs past the 4096-entry table limit must (a) decode
    correctly and (b) NOT grow the table past 4096 — giflib freezes
    the table and keeps decoding with the codes that exist."""
    from journal_batch_processer_spark.operators.gif import _lzw_decode

    mcs = 8  # 256 roots, clear=256, eoi=257, first dynamic code 258
    clear, eoi = 256, 257

    # Emit root codes 0,1,0,1,... Each pair appends one table entry, so
    # after ~3840 emissions the table hits 4096 and must freeze; we then
    # keep emitting roots (legal under a frozen table) and finish.
    codes: list[tuple[int, int]] = [(clear, 9)]
    width = 9
    table_len = 258
    n_pix = 0
    expected: list[int] = []
    for i in range(6000):
        codes.append((i & 1, width))
        expected.append(i & 1)
        n_pix += 1
        # decoder appends a table entry after every code EXCEPT the
        # first one following a clear; width for the NEXT read grows
        # when the table reaches 2^width (frozen at 4096)
        if i > 0 and table_len < 4096:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
    codes.append((eoi, width))

    out = _lzw_decode(mcs, _lzw_raw(mcs, codes), n_pix)
    assert out == expected


def test_lzw_still_grows_and_resets_normally():
    """Sanity: dictionary growth + mid-stream clear still decode (the
    freeze guard must not break the normal path)."""
    from journal_batch_processer_spark.operators.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    pixels = ([3, 1, 4, 1, 5, 9, 2, 6] * 200)[:1500]
    data = _lzw_encode(4, pixels)
    assert _lzw_decode(4, data, len(pixels)) == pixels


# -------------------------------------------------------- cache scope


def test_dedup_persists_are_scope_released(spark):
    from journal_batch_processer_spark import cache
    from journal_batch_processer_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    cache.release_all()  # clean slate
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    out = ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9)
    out.count()
    # the operator pinned its shingle table; the scope releases it
    assert cache.release_all() >= 1
    # idempotent and empty afterwards
    assert cache.release_all() == 0


def test_driver_queries_release_previous_pins(spark):
    """__spark_entry__.queries() wraps fns so each entry releases the
    PREVIOUS key's pins — the driver sweep must not accumulate ~170
    keys of pinned shingle tables."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from journal_batch_processer_spark import cache

    cache.release_all()
    qs = entrymod.queries()
    qs["dedup_containment"](spark, SF_DIR).count()
    pinned_after_first = len(cache._PINNED)
    assert pinned_after_first >= 1
    # entering ANY next query releases the prior key's pins first
    qs["row_count"](spark, SF_DIR).count()
    assert len(cache._PINNED) == 0
    cache.release_all()


# --------------------------------------------------------------- JPEG


def test_jpeg_trailing_garbage_with_fake_eoi():
    """Bytes after the real EOI that contain FF D9 must not affect the
    decode: rfind(FFD9) picked the LAST one and dragged garbage into
    the entropy slice; the forward scan stops at the real EOI."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    clean = encode_jpeg_solid_gray(16, 16, 128)
    ref = decode_jpeg_baseline(clean)
    # trailing garbage that itself contains a fake EOI marker
    padded = clean + b"\x00garbage\xff\xd9more\xff\xd9"
    got = decode_jpeg_baseline(padded)
    assert got == ref


def test_jpeg_trailing_garbage_with_restarts():
    """Same with a DRI/RSTn stream: RSTn markers inside entropy data
    are skipped by the forward scan, the real EOI still bounds it."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    clean = encode_jpeg_solid_gray(
        32, 16, 128, subsampling="420", restart_interval=1
    )
    ref = decode_jpeg_baseline(clean)
    padded = clean + b"\xff\xd9\xff\xd9"
    assert decode_jpeg_baseline(padded) == ref


def test_jpeg_truncated_entropy_fails_loud():
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    clean = encode_jpeg_solid_gray(16, 16, 128)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_baseline(clean[:-3])  # EOI (and some entropy) gone


# ----------------------------------- asymmetric containment prefix


def test_containment_prefix_equals_exact(spark):
    """The asymmetric prefix filter must produce EXACTLY the plain
    containment join's output (no false negatives at the threshold;
    verification removes false positives) — including the doc-in-doc
    case where a tiny doc is contained in a huge one."""
    from journal_batch_processer_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_containment_pairs_prefix,
    )

    rows = [
        # 0 contained in 1 (1 = 0 + lots of extra text)
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta " + " ".join(
            f"w{i} x{i} y{i}" for i in range(40))),
        # 2/3 heavy mutual overlap (both directions pass)
        (2, "one two three four five six seven eight nine ten"),
        (3, "one two three four five six seven eight nine eleven"),
        # 4 unrelated
        (4, "completely different content with nothing shared at all"),
        # 5 shares a common stop-ish phrase with several docs
        (5, "alpha beta gamma unrelated trailing content here now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.4, 0.6, 0.9):
        exact = {
            tuple(r)
            for r in ngram_containment_pairs(
                docs, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        pref = {
            tuple(r)
            for r in ngram_containment_pairs_prefix(
                docs, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        assert pref == exact, f"t={t}: {pref ^ exact}"
    # the doc-in-doc direction is present at a high threshold
    got = {
        (r.doc_a, r.doc_b)
        for r in ngram_containment_pairs_prefix(
            docs, "doc_id", "text", n=3, threshold=0.9
        ).collect()
    }
    assert (0, 1) in got and (1, 0) not in got


# --------------------------------------------------- new r07 operators


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF-PQ with generous probes + exact re-rank recovers most
    brute-force neighbors; ranks are contiguous per query."""
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    embs = spark.read.parquet(path)
    queries = embs.filter(F.col("vec_id") < 5)
    cents = train_ivf_centroids(path, n_centroids=8)
    books = train_pq_codebooks(path, m=16, ksub=16)
    exact = cosine_topk(embs, queries, k=3).collect()
    approx = ivfpq_topk(
        embs, queries, cents, books, dim=64, k=3, n_probe=4, refine=20
    ).collect()
    pe = {(r["query_id"], r["neighbor_id"]) for r in exact}
    pa = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert pe and pa
    assert len(pe & pa) >= len(pe) // 2
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_labelprop_communities_respect_blocks(spark):
    """Labels never cross the 50-node blocks of the synthetic graph,
    and propagation actually merges labels (fewer communities than
    nodes)."""
    from journal_batch_processer_spark.queries.trainprep import (
        q_graph_labelprop,
    )

    rows = q_graph_labelprop(spark, SF_DIR).collect()
    assert rows
    n_nodes = len(rows)
    comms = {r["community"] for r in rows}
    assert len(comms) < n_nodes
    for r in rows:
        assert r["community"] // 50 == r["node_id"] // 50


def test_bm25_model(spark):
    """BM25 scores match an independent pure-Python recomputation on a
    tiny corpus."""
    import math

    from journal_batch_processer_spark.operators.ranking import bm25_scores

    corpus = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cats and dogs and cats"),
        (3, "completely unrelated text here"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    queries = [(0, "cat sat"), (1, "dogs")]
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(docs, "doc_id", "text", queries).collect()
    }

    # independent model
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    expected = {}
    for qid, qtext in queries:
        terms = set(qtext.lower().split())
        for d, tk in toks.items():
            s = 0.0
            matched = False
            for term in sorted(terms):
                tf = tk.count(term)
                if tf == 0:
                    continue
                matched = True
                df = sum(1 for v in toks.values() if term in v)
                idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1), 6)
                s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl)))
            if matched:
                expected[(qid, d)] = round(s, 6)
    assert got == expected


def test_gramian_matches_numpy(spark):
    """embed_gramian equals the single-machine numpy gramian of the
    quantized matrix regardless of partitioning."""
    import numpy as np

    from journal_batch_processer_spark.operators.linalg import (
        quantized_gramian,
    )

    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).repartition(7)  # force multiple partials
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in quantized_gramian(embs, "embedding").collect()
    }
    vs = np.stack(
        [np.array(r["embedding"]) for r in embs.select("embedding").collect()]
    ).astype(np.float64)
    q = np.floor(vs / np.abs(vs).max(axis=1, keepdims=True) * 127.0 + 0.5).astype(
        np.int64
    )
    g = q.T @ q
    iu = np.triu_indices(g.shape[0])
    expected = {(int(i), int(j)): int(g[i, j]) for i, j in zip(*iu)}
    assert got == expected


# ------------------------------------- progressive JPEG with restarts


def _prog_gray_header(w, h):
    """SOI + DQT + SOF2 (1 component) + DC/AC luma DHTs."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        STD_AC_LUMA,
        STD_DC_LUMA,
        STD_LUMA_QT,
        ZIGZAG,
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">H", 67) + bytes([0])
    out += bytes(STD_LUMA_QT[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
    ):
        out += b"\xff\xc4" + _struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
    return out


def _sos1(ss, se, ah, al, tables=0x00):
    import struct as _struct

    return b"\xff\xda" + _struct.pack(">HB", 8, 1) + bytes(
        [1, tables, ss, se, (ah << 4) | al]
    )


def test_progressive_restart_resets_dc_predictor():
    """Hand-built 3-block progressive DC scan with DRI=1: every
    segment codes the SAME diff from a freshly-reset predictor, so a
    correct decoder produces a UNIFORM plane. A decoder that ignores
    the reset accumulates 1x, 2x, 3x the DC — the mean test would
    pass only on block one."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        STD_DC_LUMA,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_planes,
    )

    dcq = 4
    out = _prog_gray_header(24, 8)
    out += b"\xff\xdd" + _struct.pack(">HH", 4, 1)  # DRI = 1
    out += _sos1(0, 0, 0, 0)
    dc_l = _huff_codes(*STD_DC_LUMA)
    for blk in range(3):
        if blk:
            out += bytes([0xFF, 0xD0 + (blk - 1)])
        bw = _BitWriter()
        cat = _category(dcq)
        c, ln = dc_l[cat]
        bw.put(c, ln)
        bw.put(dcq, cat)
        bw.flush()
        out += bytes(bw.buf)
    out += b"\xff\xd9"

    w, h, planes = decode_jpeg_planes(bytes(out))
    assert (w, h) == (24, 8)
    vals = {px for row in planes[0] for px in row}
    # uniform: DC-only block decodes to 128 + dcq*Q00/8 = 136 everywhere
    assert vals == {136}, vals


def test_progressive_eob_run_crossing_restart_fails_loud():
    """An EOBn run spanning a restart boundary violates G.1.2.2 —
    the decoder must reject it, not silently absorb it."""
    import struct as _struct

    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        STD_DC_LUMA,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_planes,
    )

    out = _prog_gray_header(24, 8)
    out += b"\xff\xdd" + _struct.pack(">HH", 4, 1)  # DRI = 1

    # DC scan (valid, with restarts)
    out += _sos1(0, 0, 0, 0)
    dc_l = _huff_codes(*STD_DC_LUMA)
    for blk in range(3):
        if blk:
            out += bytes([0xFF, 0xD0 + (blk - 1)])
        bw = _BitWriter()
        cat = _category(2)
        c, ln = dc_l[cat]
        bw.put(c, ln)
        bw.put(2, cat)
        bw.flush()
        out += bytes(bw.buf)

    # custom AC table id 1 holding the 15 EOBn symbols (the standard
    # AC tables are sequential-only and lack them)
    eobn_bits = [0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    eobn_vals = [r << 4 for r in range(15)]
    out += b"\xff\xc4" + _struct.pack(">H", 19 + len(eobn_vals))
    out += bytes([(1 << 4) | 1]) + bytes(eobn_bits[1:17]) + bytes(eobn_vals)

    # AC scan: EOB2 run covering 2 blocks — crosses the DRI=1 boundary
    out += _sos1(1, 63, 0, 0, tables=0x01)
    eobn = _huff_codes(eobn_bits, eobn_vals)
    bw = _BitWriter()
    c, ln = eobn[1 << 4]  # EOBn with r=1: run = 2 + extra
    bw.put(c, ln)
    bw.put(0, 1)  # extra bits: run length exactly 2
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"

    with _pytest.raises(ValueError, match="restart"):
        decode_jpeg_planes(bytes(out))


def test_progressive_restart_desync_fails_loud():
    """DRI=2 declared but a restart marker arrives after 1 MCU — the
    decoder hits it mid-entropy and must fail, not resync silently."""
    import struct as _struct

    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        STD_DC_LUMA,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_planes,
    )

    out = _prog_gray_header(24, 8)
    out += b"\xff\xdd" + _struct.pack(">HH", 4, 2)  # DRI = 2
    out += _sos1(0, 0, 0, 0)
    dc_l = _huff_codes(*STD_DC_LUMA)
    for blk in range(3):
        if blk:  # markers every block, but DRI says every 2
            out += bytes([0xFF, 0xD0 + (blk - 1)])
        bw = _BitWriter()
        cat = _category(4)
        c, ln = dc_l[cat]
        bw.put(c, ln)
        bw.put(4, cat)
        bw.flush()
        out += bytes(bw.buf)
    out += b"\xff\xd9"

    with _pytest.raises(ValueError):
        decode_jpeg_planes(bytes(out))


def test_progressive_fixture_encoder_restarts_roundtrip():
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray_progressive,
    )

    ref = decode_jpeg_baseline(encode_jpeg_solid_gray_progressive(32, 24, 90))
    for ri in (1, 3, 7):
        got = decode_jpeg_baseline(
            encode_jpeg_solid_gray_progressive(32, 24, 90, restart_interval=ri)
        )
        assert got == ref


# --------------------------------------------------------- 12-bit JPEG


def test_jpeg_12bit_roundtrip_and_range():
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray12,
    )

    for v in (0, 2, 2048, 4094):
        got = decode_jpeg_baseline(encode_jpeg_solid_gray12(16, 8, v))
        assert got == {
            "width": 16, "height": 8, "channels": 3,
            "mean_r": float(v), "mean_g": float(v), "mean_b": float(v),
        }, (v, got)


def test_jpeg_12bit_planes_level_shift():
    """Per-pixel: a solid 12-bit gray decodes to exactly v in the Y
    plane (2048 level shift + 0..4095 clamp) and 2048 in both chroma
    planes."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_solid_gray12,
    )

    w, h, planes = decode_jpeg_planes(encode_jpeg_solid_gray12(8, 8, 3000))
    assert {px for row in planes[0] for px in row} == {3000}
    assert {px for row in planes[1] for px in row} == {2048}
    assert {px for row in planes[2] for px in row} == {2048}


def test_jpeg_baseline_sof0_rejects_12bit():
    """SOF0 is 8-bit by definition; a 12-bit SOF0 is malformed."""
    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray12,
    )

    data = bytearray(encode_jpeg_solid_gray12(8, 8, 100))
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC0  # rewrite SOF1 -> SOF0, precision still 12
    with _pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_baseline(bytes(data))


# ------------------------------------------- plan shapes for r07 keys


def test_r07_new_keys_plan_shapes(spark):
    """Scale-critical plan pins for the round-7 keys: no cartesian
    products anywhere; BM25's term join broadcasts; the gramian's
    shuffle moves only d(d+1)/2-cell partials (one exchange)."""
    from journal_batch_processer_spark.plans import plan_stats
    from journal_batch_processer_spark.queries.llmops import (
        q_dedup_containment_prefix,
        q_text_bm25,
    )
    from journal_batch_processer_spark.queries.trainprep import (
        q_embed_gramian,
        q_graph_labelprop,
    )

    sf = "/root/testdata/sf0.001"

    bm25 = plan_stats(q_text_bm25(spark, sf))
    assert bm25.cartesian == 0, bm25.plan
    # query terms, df, scalars: all broadcast onto the token stream
    assert bm25.broadcast_hash_joins >= 2, bm25.plan

    gram = plan_stats(q_embed_gramian(spark, sf))
    assert gram.cartesian == 0 and gram.nested_loop_joins == 0, gram.plan
    # partial gramians -> ONE exchange on (i, j) + AQE read
    assert gram.shuffles <= 2, gram.plan

    cont = plan_stats(q_dedup_containment_prefix(spark, sf))
    assert cont.cartesian == 0, cont.plan

    lpa = plan_stats(q_graph_labelprop(spark, sf))
    assert lpa.cartesian == 0, lpa.plan


def test_pca_power_matches_independent_model_and_improves(spark):
    """The integer power iterate must equal an INDEPENDENT numpy
    model of the same algorithm exactly (the bit-portability claim),
    and its alignment with numpy's true dominant eigenvector must
    improve monotonically-in-aggregate over the start vector (the
    convergence claim — the synthetic corpus is near-isotropic,
    λ2/λ1 ≈ 0.94, so full convergence takes more rounds than the
    plan runs; the rate, not the destination, is what this corpus
    can witness)."""
    import numpy as np

    from journal_batch_processer_spark.queries.trainprep import (
        PCA_ITERS,
        PCA_SCALE,
        q_embed_pca_power,
    )

    rows = q_embed_pca_power(spark, SF_DIR).collect()
    v = np.zeros(64)
    for r in rows:
        v[r["dim"]] = r["v"]
    vs = np.stack([
        np.array(r["embedding"])
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("embedding").collect()
    ]).astype(np.float64)
    q = np.floor(vs / np.abs(vs).max(axis=1, keepdims=True) * 127.0 + 0.5)
    G = (q.T @ q).astype(np.int64)

    vm = np.full(64, PCA_SCALE, dtype=np.int64)
    for _ in range(PCA_ITERS):
        w = G @ vm
        d = max(1, int(np.abs(w).max()) // PCA_SCALE)
        vm = np.fix(w / d).astype(np.int64)
    assert np.array_equal(v, vm), "engine iterate != independent model"

    top = np.linalg.eigh(G)[1][:, -1]

    def cos(x):
        return abs(x @ top) / (np.linalg.norm(x) * np.linalg.norm(top))

    assert cos(v) > 2 * cos(np.full(64, 1.0)), (cos(v), cos(np.ones(64)))


# --------------------------------------------------- MJPEG-in-AVI


def test_avi_mjpeg_roundtrip_mixed_codecs():
    """The container roundtrips with frames using ALL THREE JPEG
    coding modes, odd-length payloads included (word alignment)."""
    from journal_batch_processer_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from journal_batch_processer_spark.operators.jpeg import (
        encode_jpeg_solid_gray,
        encode_jpeg_solid_gray_arith,
        encode_jpeg_solid_gray_progressive,
    )

    frames = [
        encode_jpeg_solid_gray(16, 8, 20),
        encode_jpeg_solid_gray_progressive(16, 8, 60),
        encode_jpeg_solid_gray_arith(16, 8, 110),
    ]
    avi = encode_avi_mjpeg(16, 8, frames, us_per_frame=50000)
    d = decode_avi_mjpeg(avi)
    assert (d["width"], d["height"], d["n_frames"]) == (16, 8, 3)
    assert d["us_per_frame"] == 50000
    assert [f["mean_r"] for f in d["frames"]] == [20.0, 60.0, 110.0]


def test_avi_rejects_malformed():
    import pytest as _pytest

    from journal_batch_processer_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from journal_batch_processer_spark.operators.jpeg import (
        encode_jpeg_solid_gray,
    )

    avi = bytearray(
        encode_avi_mjpeg(8, 8, [encode_jpeg_solid_gray(8, 8, 100)])
    )
    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"XIFF" + bytes(avi[4:]))
    with _pytest.raises(ValueError, match="AVI"):
        decode_avi_mjpeg(bytes(avi[:8]) + b"WAVE" + bytes(avi[12:]))
    # non-MJPG codec fourcc in strh fails loud
    i = bytes(avi).find(b"vids") + 4
    bad = bytearray(avi)
    bad[i : i + 4] = b"H264"
    with _pytest.raises(ValueError, match="codec"):
        decode_avi_mjpeg(bytes(bad))
    # frame-count mismatch (header says 2, movi has 1)
    j = bytes(avi).find(b"avih") + 8 + 16
    bad2 = bytearray(avi)
    bad2[j : j + 4] = (2).to_bytes(4, "little")
    with _pytest.raises(ValueError, match="mismatch"):
        decode_avi_mjpeg(bytes(bad2))


def test_jpeg_dnl_height_from_marker():
    """A frame with HEIGHT 0 takes its line count from the DNL segment
    after the first scan (T.81 B.2.5 — the streaming-encoder shape);
    height 0 without a DNL fails loud."""
    import struct as _struct

    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    base = encode_jpeg_solid_gray(16, 24, 128)
    ref = decode_jpeg_baseline(base)
    i = base.find(b"\xff\xc0")
    mod = bytearray(base)
    mod[i + 5 : i + 7] = b"\x00\x00"  # SOF height := 0
    dnl = b"\xff\xdc" + _struct.pack(">HH", 4, 24)
    with_dnl = bytes(mod[:-2]) + dnl + b"\xff\xd9"
    assert decode_jpeg_baseline(with_dnl) == ref
    with _pytest.raises(ValueError, match="DNL"):
        decode_jpeg_baseline(bytes(mod))


# --------------------------------------------------- lossless JPEG


def test_jpeg_lossless_roundtrips_all_predictors():
    """SOF3 is LOSSLESS: random images round-trip bit-exactly through
    every predictor x precision x restart combination."""
    import random

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_gray,
    )

    rng = random.Random(3)
    for prec in (8, 12, 16):
        for pred in range(1, 8):
            for ri in (0, 3):
                w, h = rng.randint(1, 13), rng.randint(1, 9)
                img = [
                    [rng.randrange(1 << prec) for _ in range(w)]
                    for _ in range(h)
                ]
                data = encode_jpeg_lossless_gray(
                    img, precision=prec, predictor=pred, restart_interval=ri
                )
                W, H, planes = decode_jpeg_planes(data)
                assert (W, H) == (w, h) and planes[0] == img, (prec, pred, ri)


def test_jpeg_lossless_ssss16_edge():
    """diff = 32768 uses category 16 with NO appended bits
    (H.1.2.2.1): prec 16, first sample 0 against the 32768 default."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_gray,
    )

    img = [[0, 32768, 0], [65535, 1, 32769]]
    data = encode_jpeg_lossless_gray(img, precision=16, predictor=1)
    _w, _h, planes = decode_jpeg_planes(data)
    assert planes[0] == img


def test_jpeg_lossless_rejects_out_of_scope():
    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_gray,
    )

    data = bytearray(encode_jpeg_lossless_gray([[1, 2], [3, 4]]))
    # component count 1 -> 3 in SOF3 (multi-component gated)
    i = bytes(data).find(b"\xff\xc3")
    bad = bytearray(data)
    bad[i + 9] = 3
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg_planes(bytes(bad))
    # truncated entropy
    with _pytest.raises(ValueError):
        decode_jpeg_planes(bytes(data[:-4]))


def test_asof_nearest_model(spark):
    """Nearest-in-time as-of vs a brute-force model, tie cases
    included (equal distance -> earlier right row; duplicate right
    timestamps -> smaller id)."""
    from datetime import datetime

    from journal_batch_processer_spark.operators.joins import (
        asof_join_nearest,
    )

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s // 1000000, s % 1000000)

    left = [(1, 100, t(5_000_000)), (1, 101, t(500)), (2, 102, t(10)),
            (3, 103, t(7))]
    right = [(1, 900, t(4_000_000)), (1, 901, t(6_000_000)),  # tie ±1s
             (1, 902, t(400)), (2, 903, t(10)), (2, 904, t(10)),  # dup ts
             (2, 905, t(900))]
    ldf = spark.createDataFrame(left, ["user_id", "event_id", "ts"])
    rdf = spark.createDataFrame(
        [(u, ts, e) for (u, e, ts) in right], ["user_id", "ts", "event_id"])
    out = {
        r["event_id"]: r["event_id_nearest"]
        for r in asof_join_nearest(
            ldf, rdf, key="user_id", left_ts="ts", right_ts="ts",
            carry_col="event_id",
        ).collect()
    }
    # brute force
    expect = {}
    for u, e, ts in left:
        cands = [(abs((ts - rts).total_seconds()), rts, rid)
                 for (ru, rid, rts) in right if ru == u]
        expect[e] = min(cands)[2] if cands else None
    assert out == expect, (out, expect)
    assert out[100] == 900  # equal 1s distance -> EARLIER purchase
    assert out[102] == 903  # duplicate right ts -> smaller id
    assert out[103] is None  # no purchases for user 3


def test_jpeg_lossless_multicomponent_roundtrips():
    """1..4-component interleaved lossless: random planes round-trip
    bit-exactly; 3-component feature means are PER-PLANE (lossless
    carries no color transform — never BT.601)."""
    import random

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless,
    )

    rng = random.Random(11)
    for nc in (1, 2, 3, 4):
        for pred in (1, 4, 7):
            for ri in (0, 2):
                w, h = rng.randint(1, 11), rng.randint(1, 7)
                planes = [
                    [[rng.randrange(256) for _ in range(w)]
                     for _ in range(h)]
                    for _ in range(nc)
                ]
                data = encode_jpeg_lossless(
                    planes, predictor=pred, restart_interval=ri
                )
                W, H, got = decode_jpeg_planes(data)
                assert (W, H) == (w, h) and got == planes, (nc, pred, ri)

    rgb = [[[10] * 4] * 2, [[200] * 4] * 2, [[55] * 4] * 2]
    f = decode_jpeg_baseline(encode_jpeg_lossless(rgb))
    assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (10.0, 200.0, 55.0)
    assert f["channels"] == 3
