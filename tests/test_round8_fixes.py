"""Round-8 additions: dedup generator auto-selection (VERDICT r07 #5)
— routing is pure and unit-tested; both routes must stay
output-identical for identical semantics (threshold + caps), including
the df cap newly supported on the prefix path."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _pairs_key(rows):
    return sorted(
        (r.doc_a, r.doc_b, r.inter, r.sz_a, r.sz_b, round(r.jaccard, 9))
        for r in rows
    )


def test_generator_routing_pure():
    from journal_batch_processer_spark.operators.dedup import (
        PREFIX_CROSSOVER_THRESHOLD,
        select_jaccard_generator,
    )

    assert select_jaccard_generator(0.05) == "naive"
    assert select_jaccard_generator(0.2) == "naive"  # measured loser for prefix
    assert select_jaccard_generator(0.5) == "prefix"  # measured winner
    assert select_jaccard_generator(PREFIX_CROSSOVER_THRESHOLD) == "prefix"
    # the mega-doc cap exists only on the prefix path → forced routing
    assert select_jaccard_generator(0.05, max_shingles_per_doc=40) == "prefix"


def test_auto_output_identical_across_crossover(spark):
    from journal_batch_processer_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_auto,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # below crossover: auto routes naive; prefix must agree anyway
    # (equality is the invariant that MAKES routing safe)
    for t in (0.2, 0.5):
        naive = _pairs_key(
            ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        prefix = _pairs_key(
            ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        auto = _pairs_key(
            ngram_jaccard_pairs_auto(
                docs, "doc_id", "text", threshold=t, max_shingle_df=20
            ).collect()
        )
        assert naive == prefix, f"t={t}: paths diverge"
        assert auto == naive, f"t={t}: auto diverges"
        assert naive, f"t={t}: fixture produced no pairs (vacuous test)"


# ------------------------------------------------ JPEG gates removed (r08)


def test_jpeg_12bit_progressive_roundtrip():
    """SOF2 at precision 12 (Pq=1 quantizers, 2048 level shift): the
    last precision×process cell that was gated. Solid even gray
    decodes bit-for-bit, with and without per-scan restarts."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray_progressive,
    )

    for v in (0, 2048, 3000, 4094):
        d = decode_jpeg_baseline(
            encode_jpeg_solid_gray_progressive(16, 24, v, precision=12)
        )
        assert (d["width"], d["height"], d["channels"]) == (16, 24, 3)
        assert d["mean_r"] == d["mean_g"] == d["mean_b"] == v
    d = decode_jpeg_baseline(
        encode_jpeg_solid_gray_progressive(
            32, 16, 3000, restart_interval=3, precision=12
        )
    )
    assert d["mean_r"] == 3000


def test_jpeg_dnl_with_arithmetic():
    """DNL height resolution now works for arithmetic scans too: the
    QM coder byte-stuffs 0x00 after 0xFF exactly like the Huffman
    coder, so the forward marker scan finds FF DC identically."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray_arith,
    )

    base = encode_jpeg_solid_gray_arith(16, 24, 128)
    ref = decode_jpeg_baseline(base)
    i = base.find(b"\xff\xc9")
    mod = bytearray(base)
    mod[i + 5 : i + 7] = b"\x00\x00"  # SOF9 height := 0
    dnl = b"\xff\xdc" + _struct.pack(">HH", 4, 24)
    assert decode_jpeg_baseline(bytes(mod[:-2]) + dnl + b"\xff\xd9") == ref


def test_jpeg_progressive_rejects_other_precisions():
    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg import (
        encode_jpeg_solid_gray_progressive,
    )

    data = bytearray(encode_jpeg_solid_gray_progressive(8, 8, 100))
    i = data.find(b"\xff\xc2")
    data[i + 4] = 10  # precision byte := 10
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )

    with raises(NotImplementedError, match="10-bit"):
        decode_jpeg_baseline(bytes(data))


def test_ngram_lm_score_hand_computed(spark):
    """Bigram-LM ppm scoring on a 3-doc corpus computed by hand:
    c2 = {"a b": 2, "b a": 1, "a c": 1}, c1 = {a: 3, b: 1} →
    p_ppm(a b) = 2_000_000 div 3 = 666_666, p_ppm(b a) = 1_000_000,
    p_ppm(a c) = 333_333. Single-token docs score (0, 0, NULL)."""
    from journal_batch_processer_spark.operators.text_analysis import (
        ngram_lm_score,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_lm_score(df, "doc_id", "text").collect()}
    assert len(rows) == 3
    assert (rows[1].n_bigrams, rows[1].sum_ppm) == (3, 666_666 + 1_000_000 + 333_333)
    assert rows[1].mean_cond_ppm == 1_999_999 / 3
    assert (rows[2].n_bigrams, rows[2].sum_ppm, rows[2].mean_cond_ppm) == (
        1, 666_666, 666_666.0,
    )
    assert (rows[3].n_bigrams, rows[3].sum_ppm, rows[3].mean_cond_ppm) == (
        0, 0, None,
    )


def test_duplicated_substring_spans_hand_computed(spark):
    """k=3 window dedup on a 3-doc corpus: docs 1 and 2 share the run
    "a b c d" (windows at offsets 0,1 in both -> one merged span of
    len 4); doc 3 repeats "x y z" WITHIN itself (offsets 0 and 4 ->
    two islands, the gap at offsets 1..3 is unique); unique text never
    appears."""
    from journal_batch_processer_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d q r s"),
            (2, "p a b c d"),
            (3, "x y z k x y z"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        duplicated_substring_spans(df, "doc_id", "text", k=3).collect(),
        key=lambda r: (r.doc_id, r.span_start),
    )
    got = [(r.doc_id, r.span_start, r.span_len, r.n_dup_windows) for r in rows]
    assert got == [
        (1, 0, 4, 2),  # "a b c d" at head
        (2, 1, 4, 2),  # "a b c d" after the unique "p"
        (3, 0, 3, 1),  # first "x y z"
        (3, 4, 3, 1),  # second "x y z" — NOT merged across the gap
    ]


def test_count_min_one_sided_and_exact_for_top(spark):
    """Count-min never underestimates (min over d rows of bucket sums
    that each include the key's own count), and with 150 keys in 256
    buckets most top users are collision-free (est == exact for at
    least half the top-20)."""
    from journal_batch_processer_spark.queries.relational import q_heavy_hitters
    from tests.conftest import SF_DIR

    rows = q_heavy_hitters(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20  # min(20, n_users) — SF_DIR is tiny
    assert all(r.est_count >= r.exact_count for r in rows)
    assert sum(r.est_count == r.exact_count for r in rows) >= len(rows) // 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(rows) + 1)
    )


def test_leakage_safe_split_is_constant_per_component(spark):
    """Every near-dup component lands wholly in one split — the
    property that distinguishes this from hash_split."""
    from pyspark.sql import functions as F

    from journal_batch_processer_spark.queries.llmops import (
        q_split_leakage_safe,
    )
    from tests.conftest import SF_DIR

    out = q_split_leakage_safe(spark, SF_DIR)
    bad = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_sof11_lossless_arith_roundtrips_random():
    """SOF11 (lossless arithmetic, H.1.2.2 model + QM coder):
    bit-exact roundtrips of RANDOM images across precision x predictor
    x restart, and agreement with the independently-validated Huffman
    lossless path on the same pixels (the DPCM layer is shared; this
    pins the arithmetic entropy layer against it)."""
    import random

    from journal_batch_processer_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        decode_jpeg_lossless_arith,
        encode_jpeg_lossless,
        encode_jpeg_lossless_arith,
    )

    rng = random.Random(808)
    for prec in (2, 8, 12, 16):
        for predictor in (1, 4, 7):
            for ri in (0, 5):
                maxv = (1 << prec) - 1
                img = [
                    [rng.randint(0, maxv) for _ in range(11)] for _ in range(6)
                ]
                a = encode_jpeg_lossless_arith(
                    [img], precision=prec, predictor=predictor,
                    restart_interval=ri,
                )
                hf = encode_jpeg_lossless(
                    [img], precision=prec, predictor=predictor,
                    restart_interval=ri,
                )
                wa, ha, _ca, pa, _preca = decode_jpeg_lossless_arith(a)
                wh, hh, _ch, ph, _prech = decode_jpeg_lossless(hf)
                assert pa[0] == img and ph[0] == img
                assert (wa, ha) == (wh, hh) == (11, 6)


def test_sof11_dispatch_and_multicomponent():
    """decode_jpeg_planes routes SOF11 via the frame marker; 3-plane
    lossless-arithmetic roundtrips and reports per-plane content."""
    import random

    from journal_batch_processer_spark.operators.jpeg import (
        _decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_arith,
    )

    rng = random.Random(11)
    pls = [
        [[rng.randint(0, 255) for _ in range(7)] for _ in range(5)]
        for _ in range(3)
    ]
    data = encode_jpeg_lossless_arith(pls, predictor=5, restart_interval=4)
    w, h, comps, planes, prec = _decode_jpeg_planes(data)
    assert (w, h, prec, len(comps)) == (7, 5, 8, 3)
    assert planes == pls


def test_differential_arith_sofs_fail_loud():
    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg import (
        _decode_jpeg_planes,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_arith,
    )

    data = bytearray(encode_jpeg_lossless_arith([[[1, 2], [3, 4]]]))
    assert data[3] == 0xCB
    for sof in (0xCD, 0xCE, 0xCF):
        data[3] = sof
        with raises(NotImplementedError, match="differential"):
            _decode_jpeg_planes(bytes(data))


def test_qm_coder_random_decision_roundtrips():
    """ArithEncoder/ArithDecoder symmetry pinned DIRECTLY: random
    decision sequences over a shared adaptive context bank (plus the
    fixed 0.5 bin) decode back exactly, including skewed streams that
    drive c==0 at flush (the r08 divergence guard) and single-decision
    segments."""
    import random

    from journal_batch_processer_spark.operators.jpeg_arith import (
        FIXED_BIN,
        ArithDecoder,
        ArithEncoder,
        Stats,
    )

    rng = random.Random(1181)
    for trial in range(40):
        n = rng.choice([1, 2, 17, 300])
        p_one = rng.choice([0.0, 0.02, 0.5, 0.98])
        n_ctx = rng.choice([1, 3, 8])
        decisions = [
            (rng.randrange(n_ctx), 1 if rng.random() < p_one else 0)
            for _ in range(n)
        ]
        enc = ArithEncoder()
        es = Stats(n_ctx)
        for s, d in decisions:
            enc.encode(es, s, d)
        payload = enc.flush() + b"\xff\xd9"
        dec = ArithDecoder(payload, 0)
        ds = Stats(n_ctx)
        got = [(s, dec.decode(ds, s)) for s, _d in decisions]
        assert got == decisions, (trial, n, p_one, n_ctx)


def test_fractional_sampling_decodes_exact_and_libjpeg_rejects():
    """Sequential frames with FRACTIONAL sampling ratios (factors not
    dividing the frame max) decode to exact solid means under the
    nearest-sample upsampling — a file family the system libjpeg
    rejects outright (verified by the crossval harness when built:
    'Fractional sampling not implemented yet')."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray_samp,
    )

    for samps in (
        ((3, 1), (2, 1), (1, 1)),
        ((3, 3), (2, 2), (1, 1)),
        ((4, 1), (3, 1), (2, 1)),
        ((2, 3), (3, 2), (1, 1)),
    ):
        hmax = max(h for h, _ in samps)
        vmax = max(v for _, v in samps)
        w, h = 8 * hmax * 2, 8 * vmax * 3
        for ri in (0, 3):
            d = decode_jpeg_baseline(
                encode_jpeg_solid_gray_samp(w, h, 130, samps,
                                            restart_interval=ri)
            )
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
            assert d["mean_r"] == d["mean_g"] == d["mean_b"] == 130


def test_fractional_sampling_progressive_decodes_exact():
    """PROGRESSIVE frames with fractional sampling ratios decode too
    (r08 s3 — the last sampling gate): interleaved DC scans address
    the padded MCU grid, per-component AC scans the component's own
    grid, and the shared nearest-sample color stage does the rest.
    Per-pixel planes must agree with the independently validated
    SEQUENTIAL fractional path on identical geometry; restarts,
    12-bit, and mixed Hi/Vi included."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        decode_jpeg_planes,
        encode_jpeg_solid_gray_progressive,
        encode_jpeg_solid_gray_samp,
    )

    for samps in (
        ((3, 1), (2, 1), (1, 1)),
        ((3, 2), (2, 3), (1, 1)),
        ((4, 2), (3, 1), (2, 2)),
    ):
        hmax = max(h for h, _ in samps)
        vmax = max(v for _, v in samps)
        w, h = 8 * hmax * 2, 8 * vmax * 2
        for ri in (0, 3):
            b = encode_jpeg_solid_gray_progressive(
                w, h, 130, restart_interval=ri, samps=samps
            )
            d = decode_jpeg_baseline(b)
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
            assert d["mean_r"] == d["mean_g"] == d["mean_b"] == 130
        # plane-exact agreement with the sequential fractional decode
        assert decode_jpeg_planes(
            encode_jpeg_solid_gray_progressive(w, h, 130, samps=samps)
        ) == decode_jpeg_planes(
            encode_jpeg_solid_gray_samp(w, h, 130, samps)
        )
    # 12-bit fractional progressive
    d = decode_jpeg_baseline(
        encode_jpeg_solid_gray_progressive(
            48, 16, 1024, precision=12, samps=((3, 1), (2, 1), (1, 1))
        )
    )
    assert d["mean_r"] == 1024 and d["channels"] == 3


def test_hierarchical_jpeg_pyramids_decode_exact():
    """Annex-K pyramids: half-res SOF0 stage -> EXP(1,1) -> SOF5
    differential correction (positive AND negative, with and without
    restarts) reconstruct the exact solid mean. Before the DHP
    dispatch existed, such a stream silently decoded to its FIRST
    frame only."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray,
    )

    for (w, h) in ((16, 16), (48, 32)):
        for v in (60, 220):
            for ri in (0, 3):
                d = decode_jpeg_baseline(
                    encode_jpeg_hierarchical_solid_gray(
                        w, h, v, restart_interval=ri
                    )
                )
                assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
                assert d["mean_r"] == v
    # negative correction: stage1 ABOVE the target
    d = decode_jpeg_baseline(
        encode_jpeg_hierarchical_solid_gray(16, 16, 60, v_stage1=100)
    )
    assert d["mean_r"] == 60


def test_hierarchical_jpeg_fails_loud_on_structural_damage():
    import struct as _struct

    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray,
    )

    base = encode_jpeg_hierarchical_solid_gray(16, 16, 128)
    # truncate: drop everything from the EXP on -> half-res result
    # must NOT be silently returned
    i = base.find(b"\xff\xdf")
    with raises(ValueError, match="DHP declared"):
        decode_jpeg_baseline(base[:i] + b"\xff\xd9")
    # remove ONLY the EXP segment: the differential frame no longer
    # matches the (unexpanded) reference
    no_exp = base[:i] + base[i + 5 :]
    with raises(ValueError, match="missing EXP"):
        decode_jpeg_baseline(no_exp)
    # EVERY differential process decodes since late r08 (SOF5/13
    # sequential, SOF6/14 progressive, SOF7/15 lossless — see the
    # pyramid tests), and since r08 s3 DCT differential frames accept
    # ANY sampling: patching this SINGLE-component frame's sampling
    # byte to 2x2 is dimensionless under the A.1.1 non-interleaved
    # rule, so the stream still decodes to the exact mean
    j = base.find(b"\xff\xc5")
    mod = bytearray(base)
    mod[j + 11] = 0x22  # component sampling byte 1x1 -> 2x2
    d = decode_jpeg_baseline(bytes(mod))
    assert d["mean_r"] == 128 and (d["width"], d["height"]) == (16, 16)


def test_hierarchical_sof13_arithmetic_refinement():
    """SOF13 — differential sequential ARITHMETIC refinement: the QM
    entropy layer under PRED=0 spatial corrections, positive and
    negative, with restarts."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray,
    )

    for v, v1, ri in ((220, None, 0), (60, 100, 0), (128, None, 3)):
        d = decode_jpeg_baseline(
            encode_jpeg_hierarchical_solid_gray(
                32, 16, v, v_stage1=v1, restart_interval=ri,
                diff_arith=True,
            )
        )
        assert (d["width"], d["height"], d["channels"]) == (32, 16, 1)
        assert d["mean_r"] == v


def test_hierarchical_lossless_pyramid_roundtrips_random_images():
    """SOF7 / SOF15 — differential LOSSLESS refinement (Ss=0, modulo
    2^16 addition): a pyramid whose stages are all lossless must
    reconstruct RANDOM images bit-exactly across precision, component
    count, entropy coder, and restarts — the strongest validation
    available for a mode no system library has ever implemented."""
    import random

    from journal_batch_processer_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical_lossless,
    )

    rng = random.Random(81)
    for prec in (2, 8, 12, 16):
        hi = 32767 if prec == 16 else (1 << prec) - 1
        for nc in (1, 3):
            for arith in (False, True):
                for ri in (0, 5):
                    w, h = 10, 6
                    planes = [
                        [[rng.randint(0, hi) for _ in range(w)]
                         for _ in range(h)]
                        for _ in range(nc)
                    ]
                    data = encode_jpeg_hierarchical_lossless(
                        planes, precision=prec, diff_arith=arith,
                        restart_interval=ri,
                    )
                    ww, hh, comps, out, p2 = decode_jpeg_hierarchical(data)
                    assert (ww, hh, p2) == (w, h, prec)
                    assert out == planes, (prec, nc, arith, ri)


def test_hierarchical_lossless_scan_requires_ss0():
    """A differential lossless scan with Ss != 0 is malformed (Table
    H.1 reserves predictor 0 for differential frames) — fail loud,
    never decode with a predictor."""
    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical_lossless,
    )

    base = bytearray(
        encode_jpeg_hierarchical_lossless([[[5] * 4 for _ in range(4)]])
    )
    # the SECOND SOS is the differential frame's (the first belongs to
    # the SOF3 stage); its Ss byte sits 3 bytes before the entropy data
    j = base.find(b"\xff\xda", base.find(b"\xff\xc7"))
    ss_at = j + 4 + 2 * base[j + 4]  # len(2) + ns + 2*ns comps -> Ss
    base[ss_at + 1] = 1
    with raises(ValueError, match="Ss=0"):
        decode_jpeg_hierarchical(bytes(base))


def test_hierarchical_differential_progressive_refinement():
    """SOF6 / SOF14 — differential PROGRESSIVE refinement: three real
    scans (DC first at Al=1 with PRED=0, DC refinement, all-zero AC
    band), Huffman and QM-arithmetic, positive and negative
    corrections, with restarts. Closes the last differential-process
    gate: every SOF5-7/13-15 family member now decodes."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray,
    )

    for arith in (False, True):
        for v, v1, ri in ((220, None, 0), (60, 100, 0), (128, None, 3)):
            d = decode_jpeg_baseline(
                encode_jpeg_hierarchical_solid_gray(
                    32, 16, v, v_stage1=v1, restart_interval=ri,
                    diff_arith=arith, diff_progressive=True,
                )
            )
            assert (d["width"], d["height"], d["channels"]) == (32, 16, 1)
            assert d["mean_r"] == v, (arith, v, v1, ri)


def test_hierarchical_pyramids_with_sampling_decode_exact():
    """Differential DCT frames accept ANY 1..4 sampling since r08 s3
    (the last sampling gate): three-component pyramids — subsampled
    AND fractional-ratio chroma — reconstruct exact solid means under
    every differential DCT process (SOF5 Huffman, SOF13 arithmetic,
    SOF6 progressive), with and without restarts. The Hi×Vi data-unit
    raster inside each MCU reuses the exact loop convention of the
    libjpeg-cross-validated sequential decoder, so the interleave
    order is inherited from a third-party-validated path."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray_samp,
    )

    for samps in (
        ((2, 2), (1, 1), (1, 1)),
        ((3, 1), (2, 1), (1, 1)),  # fractional ratios inside a pyramid
        ((2, 2), (2, 1), (1, 2)),
    ):
        hmax = max(h for h, _ in samps)
        vmax = max(v for _, v in samps)
        w, h = 16 * hmax, 16 * vmax
        for arith, prog in ((False, False), (True, False), (False, True)):
            for ri in (0, 2):
                d = decode_jpeg_baseline(
                    encode_jpeg_hierarchical_solid_gray_samp(
                        w, h, 128, samps=samps, restart_interval=ri,
                        diff_arith=arith, diff_progressive=prog,
                    )
                )
                assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
                assert d["mean_r"] == d["mean_g"] == d["mean_b"] == 128, (
                    samps, arith, prog, ri, d,
                )


def test_hierarchical_sampling_change_across_frames_fails_loud():
    """A differential frame that re-declares a component at DIFFERENT
    sampling than the reference cannot be added per-sample — fails by
    name instead of mis-adding mismatched grids."""
    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_solid_gray_samp,
    )

    # swap Y and Cb factors in the DIFFERENTIAL frame only: hmax/vmax
    # and the per-MCU data-unit counts are unchanged, so the entropy
    # layer decodes cleanly — the mismatch must be caught by the NAMED
    # per-component sampling-consistency check, not by luck downstream
    base = bytearray(
        encode_jpeg_hierarchical_solid_gray_samp(
            32, 32, 128, samps=((2, 1), (1, 2), (1, 1))
        )
    )
    j = base.find(b"\xff\xc5")
    assert j > 0
    base[j + 11] = 0x12  # Y: 2x1 -> 1x2
    base[j + 14] = 0x21  # Cb: 1x2 -> 2x1
    with raises(NotImplementedError, match="sampling changed"):
        decode_jpeg_baseline(bytes(base))
    # a geometry-BREAKING sampling change still fails loud too (as a
    # truncation/structure error from the shifted entropy layout)
    base2 = bytearray(
        encode_jpeg_hierarchical_solid_gray_samp(
            32, 32, 128, samps=((2, 2), (1, 1), (1, 1))
        )
    )
    j2 = base2.find(b"\xff\xc5")
    base2[j2 + 11] = 0x11  # Y in the DIFFERENTIAL frame: 2x2 -> 1x1
    with raises(ValueError):
        decode_jpeg_baseline(bytes(base2))


def test_lossless_non_interleaved_scans_roundtrip_exact():
    """Multi-scan (one component per scan) LOSSLESS decode — the last
    lossless scan-layout gate (r08 s3), the layout some DICOM RGB
    encoders emit: random images roundtrip bit-exactly through BOTH
    entropy coders (SOF3 Huffman, SOF11 QM-arithmetic), with per-scan
    restart/predictor/statistics state and DIFFERENT predictors per
    scan (the encoder cycles them to prove per-scan parameter
    honoring). A component coded twice, or never, fails loud."""
    import random

    from pytest import raises

    from journal_batch_processer_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        decode_jpeg_lossless_arith,
        encode_jpeg_lossless,
        encode_jpeg_lossless_arith,
    )

    rng = random.Random(11)
    for nc in (1, 3, 4):
        for prec, mx in ((8, 256), (12, 4096)):
            for ri in (0, 3):
                pls = [
                    [[rng.randrange(mx) for _ in range(9)] for _ in range(5)]
                    for _ in range(nc)
                ]
                for enc, dec in (
                    (encode_jpeg_lossless, decode_jpeg_lossless),
                    (encode_jpeg_lossless_arith, decode_jpeg_lossless_arith),
                ):
                    b = enc(
                        pls, precision=prec, predictor=4,
                        restart_interval=ri, non_interleaved=True,
                    )
                    assert dec(b)[3] == pls, (enc.__name__, nc, prec, ri)
    # structural: duplicate-scan and missing-scan detection
    pls = [[[7] * 4 for _ in range(3)] for _ in range(2)]
    b = bytearray(encode_jpeg_lossless(pls, non_interleaved=True))
    i = b.find(b"\xff\xda")
    j = b.find(b"\xff\xda", i + 2)
    dup = bytes(b[:j + 5]) + bytes([1]) + bytes(b[j + 6:])  # scan 2 -> comp 1
    with raises(ValueError, match="two scans"):
        decode_jpeg_lossless(bytes(dup))
    trunc = bytes(b[:j]) + b"\xff\xd9"  # drop component 2's scan
    with raises(ValueError, match="never coded"):
        decode_jpeg_lossless(trunc)


def test_lossless_sampling_roundtrips_random_both_coders():
    """Non-1x1 (incl. fractional-ratio) sampling in LOSSLESS frames —
    the last T.81 gate (r08 s4): interleaved scans code h×v-sample
    MCUs on the padded grid, single-component scans the natural
    raster; random images round-trip bit-exactly through BOTH entropy
    coders across sampling/precision/restart/layout."""
    import random

    from journal_batch_processer_spark.operators.jpeg_lossless import (
        _comp_dims,
        decode_jpeg_lossless,
        decode_jpeg_lossless_arith,
        encode_jpeg_lossless,
        encode_jpeg_lossless_arith,
    )

    rng = random.Random(77)
    cases = [
        ([(2, 2), (1, 1), (1, 1)], (13, 9)),
        ([(3, 1), (2, 1), (1, 1)], (11, 5)),  # fractional-style ratios
        ([(4, 4), (1, 1)], (10, 10)),
        ([(2, 2), (2, 1), (1, 2), (1, 1)], (9, 7)),
    ]
    for samp, size in cases:
        comps = [(i + 1, 0, sh, sv) for i, (sh, sv) in enumerate(samp)]
        _h, _v, _x, _y, dims = _comp_dims(size[0], size[1], comps)
        for prec, pred, ri, ni in (
            (8, 1, 0, False),
            (12, 4, 3, False),
            (4, 7, 0, True),
            (8, 2, 2, True),
        ):
            planes = [
                [[rng.randrange(1 << prec) for _ in range(cw)]
                 for _ in range(ch)]
                for (cw, ch, _pw, _ph) in dims
            ]
            for enc, dec in (
                (encode_jpeg_lossless, decode_jpeg_lossless),
                (encode_jpeg_lossless_arith, decode_jpeg_lossless_arith),
            ):
                b = enc(
                    planes, precision=prec, predictor=pred,
                    restart_interval=ri, non_interleaved=ni,
                    sampling=samp, size=size,
                )
                w, h, cc, out, pp = dec(b)
                assert (w, h) == size and pp == prec
                assert [(c[2], c[3]) for c in cc] == samp
                assert out == planes


def test_lossless_subsampled_pyramid_roundtrips():
    """Differential-LOSSLESS frames (SOF7/SOF15) over a SUBSAMPLED
    reference: per-component correction grids on the padded MCU
    layout reconstruct random images bit-exactly through the whole
    DHP pyramid — the last derivative of the lossless-sampling
    gate."""
    import random

    from journal_batch_processer_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical_lossless,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        _comp_dims,
    )

    rng = random.Random(31)
    for samp, size, arith, ri in (
        ([(2, 2), (1, 1), (1, 1)], (16, 8), False, 0),
        ([(2, 1), (1, 1), (1, 2)], (16, 16), True, 5),
        ([(4, 2), (2, 1), (1, 1)], (16, 8), True, 0),
    ):
        comps = [(i + 1, 0, sh, sv) for i, (sh, sv) in enumerate(samp)]
        _h, _v, _x, _y, dims = _comp_dims(size[0], size[1], comps)
        planes = [
            [[rng.randrange(256) for _ in range(cw)] for _ in range(ch)]
            for (cw, ch, _pw, _ph) in dims
        ]
        b = encode_jpeg_hierarchical_lossless(
            planes, diff_arith=arith, restart_interval=ri, sampling=samp
        )
        w, h, _cc, out, _pp = decode_jpeg_hierarchical(b)
        assert (w, h) == size
        assert out == planes


def test_lossless_subsampled_features_per_plane_means():
    """The feature layer's multi-component lossless branch divides
    each component's sum by ITS OWN sample count — a subsampled solid
    image reports exactly the solid value on every channel."""
    from journal_batch_processer_spark.operators.jpeg import (
        _decode_jpeg_baseline,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        _comp_dims,
        encode_jpeg_lossless,
    )

    samp = [(2, 1), (1, 2), (1, 1)]
    size = (12, 10)
    comps = [(i + 1, 0, sh, sv) for i, (sh, sv) in enumerate(samp)]
    _h, _v, _x, _y, dims = _comp_dims(size[0], size[1], comps)
    planes = [
        [[88] * cw for _ in range(ch)] for (cw, ch, _pw, _ph) in dims
    ]
    feat = _decode_jpeg_baseline(
        encode_jpeg_lossless(planes, sampling=samp, size=size)
    )
    assert feat["width"] == 12 and feat["height"] == 10
    assert feat["channels"] == 3
    assert feat["mean_r"] == feat["mean_g"] == feat["mean_b"] == 88.0
