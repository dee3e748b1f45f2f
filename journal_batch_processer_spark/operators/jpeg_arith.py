"""T.81 arithmetic entropy coding (QM coder) for JPEG.

The arithmetic-coded JPEG variant (SOF9 extended sequential): the QM
binary arithmetic coder of ITU T.81 Annex D with the adaptive
probability state machine of Table D.3, driven by the DC/AC decision
trees of Annex F.1.4 / F.2.4 and the conditioning bounds from the DAC
marker segment.

Interval conventions (T.81 D.1.3): the MPS subinterval sits at the
BOTTOM of the current interval ([0, A-Qe)), the LPS at the top (size
Qe); when renormalization makes A-Qe smaller than Qe the subintervals
are conditionally exchanged. The entropy byte stream uses FF00 byte
stuffing exactly like the Huffman mode (verified against the system
libjpeg's output — every 0xFF in its arithmetic streams is followed by
0x00), and a decoder that runs out of data at a marker supplies zero
bytes (F.2.2.5).

Validation (tests/test_jpeg_crossval.py): the decoder reads arithmetic
JPEGs produced by the SYSTEM libjpeg — an independent implementation —
and the quantized coefficients are compared block-exact against the
same image's Huffman encoding read by our (already cross-validated)
Huffman decoder; our encoder's files are decoded by libjpeg. The coder
is therefore checked against a third party in both directions, not
merely self-roundtripped.
"""

from __future__ import annotations

# ITU T.81 Table D.3 — Qe values and probability estimation state
# machine: (Qe, NMPS, NLPS, SWITCH) per state index. Index 113 is the
# non-adaptive 0.5-probability state used for AC sign decisions (it
# transitions to itself and never switches).
QE_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed 0.5 bin
]

FIXED_BIN = 113  # non-adaptive context index (AC signs)


class Stats:
    """A bank of adaptive contexts: per slot, state index + MPS sense.

    Stored as two flat bytearrays (the spec packs both into one byte;
    two arrays keep the hot path branch-free in Python).
    """

    __slots__ = ("idx", "mps")

    def __init__(self, n: int) -> None:
        self.idx = bytearray(n)
        self.mps = bytearray(n)

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


class ArithDecoder:
    """QM decoder: 16-bit interval register A, 16-bit code window
    ``code`` refilled one bit at a time from the destuffed byte
    stream; zero bits are supplied once a marker is reached."""

    __slots__ = ("data", "bp", "marker_pos", "a", "code", "_bits", "_nbits")

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.bp = start
        self.marker_pos: int | None = None
        self._bits = 0
        self._nbits = 0
        self.a = 0x10000
        code = 0
        for _ in range(16):
            code = (code << 1) | self._bit()
        self.code = code

    def _byte(self) -> int:
        if self.marker_pos is not None:
            return 0
        d = self.data
        i = self.bp
        if i >= len(d):
            raise ValueError("jpeg: arithmetic data ran past EOF")
        b = d[i]
        if b != 0xFF:
            self.bp = i + 1
            return b
        j = i + 1
        while j < len(d) and d[j] == 0xFF:
            j += 1
        if j < len(d) and d[j] == 0x00:
            self.bp = j + 1
            return 0xFF
        self.marker_pos = i
        return 0

    def _bit(self) -> int:
        if self._nbits == 0:
            self._bits = self._byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._bits >> self._nbits) & 1

    def decode(self, stats: Stats, s: int) -> int:
        qe, nmps, nlps, switch = QE_TABLE[stats.idx[s]]
        a = self.a - qe
        code = self.code
        if code < a:
            if a & 0x8000:
                self.a = a
                return stats.mps[s]
            # MPS renorm path (conditional exchange)
            if a < qe:
                d = 1 - stats.mps[s]
                if switch:
                    stats.mps[s] = d
                stats.idx[s] = nlps
            else:
                d = stats.mps[s]
                stats.idx[s] = nmps
        else:
            code -= a
            # LPS path (conditional exchange against the reduced A)
            if a < qe:
                d = stats.mps[s]
                stats.idx[s] = nmps
            else:
                d = 1 - stats.mps[s]
                if switch:
                    stats.mps[s] = d
                stats.idx[s] = nlps
            a = qe
        while True:
            a <<= 1
            code = (code << 1) | self._bit()
            if a & 0x8000:
                break
        self.a = a
        # the interval invariant keeps code < a < 0x10000 on any valid
        # stream; a violation means corrupt data — fail loud rather
        # than silently wrapping
        if code >= a:
            raise ValueError("jpeg: arithmetic code out of interval")
        self.code = code
        return d


class ArithEncoder:
    """QM encoder mirroring :class:`ArithDecoder`. C is an arbitrary-
    precision integer, so carry propagation is native; BYTEOUT's
    stacked-FF machinery is unnecessary and the final byte string is
    produced at flush (with FF00 stuffing)."""

    __slots__ = ("a", "c", "nbits")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.nbits = 0

    def encode(self, stats: Stats, s: int, d: int) -> None:
        qe, nmps, nlps, switch = QE_TABLE[stats.idx[s]]
        a = self.a - qe
        if d == stats.mps[s]:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top
                self.c += a
                a = qe
            stats.idx[s] = nmps
        else:
            if a < qe:  # exchange: LPS takes the bottom (size a)
                pass
            else:
                self.c += a
                a = qe
            if switch:
                stats.mps[s] = 1 - stats.mps[s]
            stats.idx[s] = nlps
        while True:
            a <<= 1
            self.c <<= 1
            self.nbits += 1
            if a & 0x8000:
                break
        self.a = a & 0xFFFF

    def encode_fixed(self, d: int) -> None:
        """One decision in the non-adaptive 0.5 bin."""
        qe = QE_TABLE[FIXED_BIN][0]
        a = self.a - qe
        if d == 0:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:
                self.c += a
                a = qe
        else:
            if a >= qe:
                self.c += a
                a = qe
        while True:
            a <<= 1
            self.c <<= 1
            self.nbits += 1
            if a & 0x8000:
                break
        self.a = a & 0xFFFF

    def flush(self) -> bytes:
        """Terminate the interval and emit the stuffed byte string.

        The decoder reads a 16-bit initial window and then one bit per
        renormalization, zero-filling past the end — so any value V in
        [C, C+A) whose trailing bits are zero works. Take the smallest
        multiple of 2^k ≥ C inside the interval for a short tail."""
        total = self.nbits + 16  # bits of precision in C's scale
        c, a = self.c, self.a
        if c == 0:
            # V=0 is in [0, a) and the decoder zero-fills past the end
            # of the segment, so NOTHING needs to be emitted. Without
            # this guard the largest-k search below diverges (0 is a
            # multiple of every 2^k) — reachable only by segments of
            # pure no-add MPS decisions, which the DCT encoders never
            # produce but tiny-precision lossless restart segments
            # (SOF11, r08) do.
            return b""
        # largest k with a single multiple of 2^k in [c, c+a)
        k = 0
        while True:
            step = 1 << (k + 1)
            lo = -(-c // step) * step  # ceil to multiple
            if lo >= c + a:
                break
            k += 1
        step = 1 << k
        v = -(-c // step) * step
        bits = total
        out = bytearray()
        # emit v MSB-first over `total` bits, byte at a time
        nbytes = (bits + 7) // 8
        v <<= nbytes * 8 - bits  # left-align to byte boundary
        raw = v.to_bytes(nbytes, "big")
        # drop trailing zero bytes (decoder zero-fills)
        raw = raw.rstrip(b"\x00") or b"\x00"
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


# ---------------------------------------------------------------------------
# sequential DCT decode/encode decision trees (T.81 F.1.4 / F.2.4)
# ---------------------------------------------------------------------------

# context layout within a DC stats bank (Table F.4): 4 slots per
# conditioning category (zero/S0/SS/SP/SN...), X1 chain at 20,
# magnitude-bit chain at X+14. AC bank: 3 slots per k (S0/SE/S0+SS'),
# low/high X chains at 189/217.
DC_STAT_SLOTS = 64
AC_STAT_SLOTS = 256


def decode_dc_diff(dec, stats: Stats, ctx: int, ll: int, uu: int):
    """Decode one DC difference (F.2.4.1); returns (diff, new_ctx)."""
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(stats, st)
    if m != 0:
        st = 20  # X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg: arithmetic DC magnitude overflow")
            st += 1
    if m < (1 << ll) >> 1:
        new_ctx = 0
    elif m > (1 << uu) >> 1:
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), new_ctx


def decode_ac_coefs(dec, stats: Stats, fixed: Stats, kx: int, coef, zigzag, qt):
    """Decode the 63 AC coefficients of one block (F.2.4.2) into
    ``coef`` (natural order), dequantizing with ``qt``."""
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(stats, st):  # EOB
            break
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("jpeg: arithmetic AC index overrun")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m != 0:
            if dec.decode(stats, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg: arithmetic AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        if sign:
            v = -v
        nat = zigzag[k]
        coef[nat] = v * qt[nat]
        k += 1


def encode_dc_diff(enc, stats: Stats, ctx: int, ll: int, uu: int, diff: int):
    """Encode one DC difference (F.1.4.1); returns the next context."""
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return 0
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    v = -diff if sign else diff
    v -= 1
    st = ctx + 2 + sign
    if v == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while v >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    if m < (1 << ll) >> 1:
        new_ctx = 0
    elif m > (1 << uu) >> 1:
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(stats, st, 1 if v & mm else 0)
    return new_ctx


def encode_ac_coefs(enc, stats: Stats, kx: int, zz: list[int]):
    """Encode the 63 AC coefficients of one block (F.1.4.2): ``zz`` is
    the QUANTIZED coefficient list in zigzag order, indices 1..63."""
    ke = 63
    while ke >= 1 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        if sign:
            v = -v
        v -= 1
        st += 2
        if v == 0:
            enc.encode(stats, st, 0)
            m = 0
        else:
            enc.encode(stats, st, 1)
            if v == 1:
                enc.encode(stats, st, 0)
                m = 1
            else:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while v >= (m << 1):
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(stats, st, 0)
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(stats, st, 1 if v & mm else 0)
        k += 1
    if ke < 63:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# progressive (SOF10) decision trees — T.81 G.2 arithmetic variants
# ---------------------------------------------------------------------------


def decode_ac_first(dec, stats: Stats, fixed: Stats, kx: int, coefq,
                    zigzag, ss: int, se: int, al: int) -> None:
    """First AC pass of a band (G.2: spectral selection + point
    transform): same decision tree as the sequential AC decode, band-
    bounded, storing (v << Al) QUANTIZED into ``coefq`` (natural
    order) — dequantization happens once at EOI."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):  # EOB
            break
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg: arithmetic AC index overrun")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m != 0:
            if dec.decode(stats, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg: arithmetic AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        if sign:
            v = -v
        coefq[zigzag[k]] = v << al
        k += 1


def decode_dc_refine(dec, fixed: Stats, coefq, al: int) -> None:
    """DC refinement pass: ONE fixed-bin decision per block — the next
    two's-complement bit of the DC value (G.2.2)."""
    if dec.decode(fixed, 0):
        coefq[0] |= 1 << al


def decode_ac_refine(dec, stats: Stats, fixed: Stats, coefq, zigzag,
                     ss: int, se: int, al: int) -> None:
    """AC refinement pass (G.2.3, the jdarith decode_mcu_AC_refine
    shape): correction bits for previously-nonzero coefficients,
    newly-nonzero insertions via the fixed sign bin, EOB flag decided
    only beyond the previous stage's end-of-block index."""
    p1 = 1 << al
    m1 = -(1 << al)
    kex = se
    while kex > 0 and coefq[zigzag[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):  # EOB
                break
        while True:
            nat = zigzag[k]
            c = coefq[nat]
            if c != 0:  # history: correction bit
                if dec.decode(stats, st + 2):
                    coefq[nat] = c + (m1 if c < 0 else p1)
                break
            if dec.decode(stats, st + 1):  # newly nonzero
                coefq[nat] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg: arithmetic AC refine overrun")
        k += 1
