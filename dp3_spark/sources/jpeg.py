"""Pure-python/numpy baseline JPEG codec (ITU-T T.81 public spec) — the
last multimodal format to get REAL pixel decode (BMP/PNG/GIF/WAV already
round-trip; reference parity: the dp3 reference stores camera topics as
JPEG/PNG blobs and never decodes them server-side, so any decode here is
beyond-reference capability for the pipeline operators).

Scope: baseline sequential DCT and PROGRESSIVE (SOF2) DCT, 8-bit,
Huffman (generic DHT — both standard and custom tables), 1 or 3
components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
intervals.  Progressive decode covers spectral selection + successive
approximation (DC/AC first and refinement scans, EOB runs, correction
bits — T.81 G.1/G.2); a progressive encoder with a configurable scan
script exists so round-trips can pin every scan type against the
baseline decode (identical quantized coefficients => identical pixels).
Arithmetic and lossless/hierarchical modes return None (documented: the
resize/feature paths then use the deterministic stub).

Determinism contract: every rounding in both encoder and decoder is
floor(x + 0.5) — NOT numpy banker's rounding — so the DC-only path
(solid-color blocks) is closed-form reproducible in SQL, which is what
lets the mm_jpeg_decode driver gate hash-match an arithmetic oracle.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (quality 50 operating point)
QTAB_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QTAB_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _round_half_up(x):
    """floor(x + 0.5) — the single rounding used everywhere (numpy
    np.round would banker's-round, which SQL can't cheaply mirror)."""
    return np.floor(x + 0.5)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: D @ block @ D.T transforms."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    d[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return d


_DCT = _dct_matrix()


# ------------------------------------------------------------------ huffman

def build_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman: {symbol: (code, length)} from the DHT
    BITS/HUFFVAL lists (T.81 Annex C code assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


# Custom flat-ish tables (valid canonical Huffman; the decoder is generic
# so nothing depends on the standard Annex K tables): 12 DC symbols at
# length 5, 162 AC symbols at length 9 — simple, spec-conformant, and no
# code is the all-ones prefix at its length.
_DC_SYMS = list(range(12))
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # marker: treat as end-of-entropy padding (caller handles
                # restart markers explicitly)
                self.pos -= 1
                b = 0
                raise _MarkerHit()
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        self.acc = 0
        self.n = 0


class _MarkerHit(Exception):
    pass


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Inverse of EXTEND: (size, t-bit code) for signed v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# ------------------------------------------------------------------ encode

def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r = a[..., 0].astype(np.float64)
    g = a[..., 1].astype(np.float64)
    b = a[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(p: np.ndarray) -> np.ndarray:
    y = p[..., 0].astype(np.float64)
    cb = p[..., 1].astype(np.float64) - 128.0
    cr = p[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def _encode_block(bw, block, qtab, pred, comp, dc_tab, ac_tab):
    """DCT + quantize + Huffman-code one 8x8 block; returns new DC pred."""
    coef = _DCT @ block @ _DCT.T
    # the DC term is algebraically sum/8 — compute it exactly (integer
    # sum, /8 exact in binary) instead of through the irrational basis
    # products, so exact-half quantization boundaries round
    # deterministically (the mm_jpeg gate's closed-form oracle depends
    # on this)
    coef[0, 0] = float(block.sum()) / 8.0
    q = _round_half_up(coef / qtab).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[comp]
    pred[comp] = int(zz[0])
    t, code = _magnitude(diff)
    hc, hl = dc_tab[t]
    bw.put(hc, hl)
    if t:
        bw.put(code, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            hc, hl = ac_tab[0xF0]
            bw.put(hc, hl)
            run -= 16
        t, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | t]
        bw.put(hc, hl)
        bw.put(code, t)
        run = 0
    if run:
        hc, hl = ac_tab[0x00]
        bw.put(hc, hl)


def encode_jpeg(arr, *, subsample: str = "444", restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes: Annex-K quant tables,
    custom canonical Huffman tables (emitted in DHT, so any conformant
    decoder reads them).

    subsample: '444' (one 8x8 block per component per MCU) or '420'
    (16x16 MCU: 4 luma blocks + 2x2-averaged chroma — exercises the
    decoder's upsample path; solid frames stay closed-form because an
    average of a constant is the constant).
    restart_interval: emit DRI + RSTn markers every N MCUs (0 = none).
    """
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    ycc = _rgb_to_ycbcr(a)
    mcu = 8 if subsample == "444" else 16
    H = (h + mcu - 1) // mcu * mcu
    W = (w + mcu - 1) // mcu * mcu
    full = np.empty((H, W, 3), dtype=np.uint8)
    full[:h, :w] = ycc
    full[h:, :w] = ycc[h - 1 : h, :]
    full[:, w:] = full[:, w - 1 : w]
    if subsample == "420":
        cf = full.astype(np.float64)
        sub = np.clip(_round_half_up(
            (cf[0::2, 0::2, 1:] + cf[0::2, 1::2, 1:]
             + cf[1::2, 0::2, 1:] + cf[1::2, 1::2, 1:]) / 4.0
        ), 0, 255)

    dc_tab = build_canonical(_DC_BITS, _DC_SYMS)
    ac_tab = build_canonical(_AC_BITS, _AC_SYMS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    qt = [QTAB_LUMA, QTAB_CHROMA, QTAB_CHROMA]
    mcu_i = 0
    rst = 0
    for by in range(0, H, mcu):
        for bx in range(0, W, mcu):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            if subsample == "444":
                for comp in range(3):
                    block = full[by : by + 8, bx : bx + 8, comp].astype(np.float64) - 128.0
                    _encode_block(bw, block, qt[comp], pred, comp, dc_tab, ac_tab)
            else:
                for dy in (0, 8):
                    for dx in (0, 8):
                        block = full[by + dy : by + dy + 8, bx + dx : bx + dx + 8, 0]
                        _encode_block(
                            bw, block.astype(np.float64) - 128.0, qt[0], pred, 0,
                            dc_tab, ac_tab,
                        )
                for comp in (1, 2):
                    block = sub[by // 2 : by // 2 + 8, bx // 2 : bx // 2 + 8, comp - 1]
                    _encode_block(
                        bw, block.astype(np.float64) - 128.0, qt[comp], pred, comp,
                        dc_tab, ac_tab,
                    )
            mcu_i += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tab.reshape(-1)[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    ly = 0x11 if subsample == "444" else 0x22
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, ly, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, QTAB_LUMA) + dqt(1, QTAB_CHROMA)
        + dht(0, 0, _DC_BITS, _DC_SYMS) + dht(1, 0, _AC_BITS, _AC_SYMS)
        + dri + sof + sos + bytes(bw.buf)
        + b"\xff\xd9"
    )


# ------------------------------------------------------------------ decode

def decode_jpeg(data: bytes):
    """Baseline OR progressive JFIF -> (h, w, 3) uint8 RGB (grayscale
    replicated), or None for non-JPEG / arithmetic / hierarchical /
    unsupported shapes.  Generic DHT/DQT/SOF0/SOF1/SOF2/SOS/DRI parsing;
    sampling factors 1-2.  Progressive (SOF2): spectral-selection +
    successive-approximation scans (T.81 G.1/G.2 — DC first/refine, AC
    first/refine with EOB runs), coefficients accumulated across scans,
    single reconstruction at EOI."""
    try:
        return _decode_jpeg_inner(data)
    except Exception:
        return None


def _decode_jpeg_inner(data: bytes):
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None  # list of (cid, hs, vs, qid)
    h = w = None
    restart = 0
    progressive = False
    prog = None  # _ProgState once SOF2 seen
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            if progressive and prog is not None:
                return prog.reconstruct(qtabs)
            return None
        if pos + 4 > len(data):
            return None
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tid = body[bpos] >> 4, body[bpos] & 0x0F
                n = 128 if pq else 64
                raw = body[bpos + 1 : bpos + 1 + n]
                vals = (
                    np.frombuffer(raw, ">u2") if pq else np.frombuffer(raw, np.uint8)
                ).astype(np.int32)
                tab = np.zeros(64, np.int32)
                tab[ZIGZAG] = vals
                qtabs[tid] = tab.reshape(8, 8)
                bpos += 1 + n
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                fw = build_canonical(bits, vals)
                htabs[(cls, tid)] = {(c, l): s for s, (c, l) in fw.items()}
                bpos += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
            if marker == 0xC2:
                progressive = True
                prog = _ProgState(h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if comps is None or h is None or not h or not w:
                return None
            ns = body[0]
            if progressive:
                scan_comps = [
                    (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                    for i in range(ns)
                ]
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                pos = prog.decode_scan(
                    data, pos + 2 + ln, scan_comps, ss, se,
                    ahal >> 4, ahal & 0x0F, htabs, restart,
                )
                continue
            scan = {}
            for i in range(ns):
                scan[body[1 + 2 * i]] = (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
            return _decode_scan(
                data, pos + 2 + ln, h, w, comps, scan, qtabs, htabs, restart
            )
        pos += 2 + ln
    return None


def _decode_scan(data, pos, h, w, comps, scan, qtabs, htabs, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if mcux * mcuy > 4 * 1024 * 1024:
        return None
    planes = []
    for cid, hs, vs, qid in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                # RSTn marker: aligned, two bytes
                br.align()
                p = br.pos
                while p + 1 < len(data) and data[p] == 0xFF and data[p + 1] == 0xFF:
                    p += 1
                if p + 1 < len(data) and data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                    br.pos = p + 2
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                dct, act = scan.get(cid, (0, 0))
                dtab = htabs.get((0, dct))
                atab = htabs.get((1, act))
                q = qtabs.get(qid)
                if dtab is None or atab is None or q is None:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        try:
                            zz = _decode_block(br, dtab, atab)
                        except _MarkerHit:
                            zz = np.zeros(64, np.int64)
                        pred[ci] += int(zz[0])
                        coefs = np.zeros(64, np.int64)
                        coefs[ZIGZAG] = zz
                        coefs[ZIGZAG[0]] = pred[ci]
                        blk = (coefs.reshape(8, 8) * q).astype(np.float64)
                        # mirror the encoder's exact-DC path: IDCT the AC
                        # part through the basis, add DC/8 exactly
                        dc = blk[0, 0]
                        blk[0, 0] = 0.0
                        px = _DCT.T @ blk @ _DCT + dc / 8.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_i += 1
    out = []
    for ci, (cid, hs, vs, qid) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    ycc = np.stack(out if len(out) == 3 else [out[0]] * 3, axis=-1)
    ycc = np.clip(_round_half_up(ycc + 128.0), 0, 255).astype(np.uint8)
    if len(comps) == 1:
        return np.repeat(ycc[..., :1], 3, axis=-1)
    return _ycbcr_to_rgb(ycc)


def _decode_block(br, dtab, atab):
    zz = np.zeros(64, np.int64)
    t = _decode_symbol(br, dtab)
    zz[0] = _extend(br.bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = _decode_symbol(br, atab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz


# -------------------------------------------------------- progressive decode

def _consume_rst(br: _BitReader, data: bytes) -> None:
    """Byte-align and step over an RSTn marker (fill bytes tolerated)."""
    br.align()
    p = br.pos
    while p + 1 < len(data) and data[p] == 0xFF and data[p + 1] == 0xFF:
        p += 1
    if p + 1 < len(data) and data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
        br.pos = p + 2


class _ProgState:
    """Coefficient accumulator for progressive (SOF2) decode: scans write
    into per-component zigzag-order coefficient planes; reconstruction
    happens once at EOI.  Algorithms per T.81 G.1/G.2 (DC first/refine,
    AC first/refine with EOB runs and correction bits — the standard
    successive-approximation state machine, libjpeg-interoperable)."""

    def __init__(self, h: int, w: int, comps):
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if not (1 <= self.hmax <= 2 and 1 <= self.vmax <= 2):
            raise ValueError("unsupported sampling")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        if self.mcux * self.mcuy > 4 * 1024 * 1024:
            raise ValueError("image too large")
        self.coef = []
        self.nblocks = []  # per-comp (bw, bh) of the non-interleaved grid
        for cid, hs, vs, qid in comps:
            self.coef.append(
                np.zeros((self.mcuy * vs, self.mcux * hs, 64), np.int64)
            )
            cw = -(-(w * hs) // self.hmax)
            ch = -(-(h * vs) // self.vmax)
            self.nblocks.append((-(-cw // 8), -(-ch // 8)))
        self.eobrun = 0

    def _ci(self, cid: int) -> int:
        for i, c in enumerate(self.comps):
            if c[0] == cid:
                return i
        raise ValueError("unknown scan component")

    def decode_scan(self, data, pos, scan_comps, ss, se, ah, al, htabs, restart):
        """Consume one scan's entropy data; return the position of the
        next marker."""
        br = _BitReader(data, pos)
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            self._dc_scan(br, data, scan_comps, ah, al, htabs, restart)
        else:
            if len(scan_comps) != 1:
                raise ValueError("AC scans are non-interleaved")
            self._ac_scan(br, data, scan_comps[0], ss, se, ah, al, htabs, restart)
        p = br.pos
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] != 0x00:
                m = data[p + 1]
                if m == 0xFF:
                    p += 1
                    continue
                if 0xD0 <= m <= 0xD7:
                    p += 2
                    continue
                return p
            p += 1
        return p

    # ---- DC scans (interleaved MCU order, or single-component raster)

    def _dc_unit(self, br, ci, by, bx, cid, dct, ah, al, htabs, pred):
        blk = self.coef[ci][by, bx]
        if ah == 0:
            tab = htabs.get((0, dct))
            if tab is None:
                raise ValueError("missing DC table")
            t = _decode_symbol(br, tab)
            diff = _extend(br.bits(t), t) if t else 0
            pred[cid] += diff
            blk[0] = pred[cid] << al
        elif br.bit():
            # two's-complement |= reconstructs the next magnitude bit for
            # either sign (the DC point transform is an arithmetic shift)
            blk[0] |= 1 << al

    def _dc_scan(self, br, data, scan_comps, ah, al, htabs, restart):
        pred = {cid: 0 for cid, _, _ in scan_comps}
        unit = 0
        if len(scan_comps) > 1:
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if restart and unit and unit % restart == 0:
                        _consume_rst(br, data)
                        pred = {k: 0 for k in pred}
                    for cid, dct, _act in scan_comps:
                        ci = self._ci(cid)
                        _, hs, vs, _ = self.comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                self._dc_unit(
                                    br, ci, my * vs + by, mx * hs + bx,
                                    cid, dct, ah, al, htabs, pred,
                                )
                    unit += 1
        else:
            cid, dct, _act = scan_comps[0]
            ci = self._ci(cid)
            bw_, bh_ = self.nblocks[ci]
            for by in range(bh_):
                for bx in range(bw_):
                    if restart and unit and unit % restart == 0:
                        _consume_rst(br, data)
                        pred = {cid: 0}
                    self._dc_unit(br, ci, by, bx, cid, dct, ah, al, htabs, pred)
                    unit += 1

    # ---- AC scans (always single-component, block raster order)

    def _ac_scan(self, br, data, sc, ss, se, ah, al, htabs, restart):
        cid, _dct, act = sc
        ci = self._ci(cid)
        tab = htabs.get((1, act))
        if tab is None:
            raise ValueError("missing AC table")
        bw_, bh_ = self.nblocks[ci]
        self.eobrun = 0
        unit = 0
        for by in range(bh_):
            for bx in range(bw_):
                if restart and unit and unit % restart == 0:
                    _consume_rst(br, data)
                    self.eobrun = 0
                blk = self.coef[ci][by, bx]
                if ah == 0:
                    self._ac_first(br, blk, ss, se, al, tab)
                else:
                    self._ac_refine(br, blk, ss, se, al, tab)
                unit += 1

    def _ac_first(self, br, blk, ss, se, al, tab):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_symbol(br, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += br.bits(r)
                    break
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC run overflow")
            blk[k] = _extend(br.bits(s), s) * (1 << al)
            k += 1

    def _ac_refine(self, br, blk, ss, se, al, tab):
        p1 = 1 << al
        m1 = -(1 << al)
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _decode_symbol(br, tab)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += br.bits(r)
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement size")
                    newval = p1 if br.bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0 and br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            self.eobrun -= 1

    # ---- final reconstruction (shared math with the baseline path)

    def reconstruct(self, qtabs):
        planes = []
        for ci, (cid, hs, vs, qid) in enumerate(self.comps):
            q = qtabs.get(qid)
            if q is None:
                raise ValueError("missing quant table")
            bw_, bh_ = self.nblocks[ci]
            plane = np.zeros((self.mcuy * vs * 8, self.mcux * hs * 8), np.float64)
            for by in range(bh_):
                for bx in range(bw_):
                    zz = self.coef[ci][by, bx]
                    coefs = np.zeros(64, np.int64)
                    coefs[ZIGZAG] = zz
                    blk = (coefs.reshape(8, 8) * q).astype(np.float64)
                    dc = blk[0, 0]
                    blk[0, 0] = 0.0
                    px = _DCT.T @ blk @ _DCT + dc / 8.0
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
            planes.append(plane)
        out = []
        for ci, (cid, hs, vs, qid) in enumerate(self.comps):
            p = planes[ci]
            p = np.repeat(np.repeat(p, self.vmax // vs, axis=0), self.hmax // hs, axis=1)
            out.append(p[: self.h, : self.w])
        ycc = np.stack(out if len(out) == 3 else [out[0]] * 3, axis=-1)
        ycc = np.clip(_round_half_up(ycc + 128.0), 0, 255).astype(np.uint8)
        if len(self.comps) == 1:
            return np.repeat(ycc[..., :1], 3, axis=-1)
        return _ycbcr_to_rgb(ycc)


# -------------------------------------------------------- progressive encode

# AC table for progressive scans: adds the EOBn symbols (r<<4, r=1..14)
# the baseline table never needs (EOB runs span blocks only in
# progressive scans)
_AC_SYMS_PROG = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]
    + [0xF0]
)
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]

# Default scan script: exercises interleaved DC with successive
# approximation, spectral-selection bands, two-stage AC approximation,
# and EOB runs — every decoder path.
DEFAULT_PROG_SCANS = [
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, Al=1 (interleaved)
    ((0,), 1, 5, 0, 2),        # luma AC 1-5 first, Al=2
    ((2,), 1, 63, 0, 1),       # Cr AC first, Al=1
    ((1,), 1, 63, 0, 1),       # Cb AC first, Al=1
    ((0,), 6, 63, 0, 2),       # luma AC 6-63 first, Al=2
    ((0, 1, 2), 0, 0, 1, 0),   # DC refine -> Al=0
    ((0,), 1, 63, 2, 1),       # luma AC refine 2 -> 1
    ((2,), 1, 63, 1, 0),       # Cr AC refine -> 0
    ((1,), 1, 63, 1, 0),       # Cb AC refine -> 0
    ((0,), 1, 63, 1, 0),       # luma AC refine 1 -> 0
]


class _ProgScanWriter:
    """Entropy writer for one progressive scan (shared restart plumbing)."""

    def __init__(self, restart: int):
        self.bw = _BitWriter()
        self.restart = restart
        self.unit = 0
        self.rst = 0

    def maybe_restart(self, on_restart) -> None:
        if self.restart and self.unit and self.unit % self.restart == 0:
            on_restart()
            self.bw.flush()
            self.bw.buf += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8


def _emit_dc_first(w, blocks, scan_comps, al, dc_tab, bh, bw_):
    pred = {c: 0 for c in scan_comps}

    def reset():
        nonlocal pred
        pred = {c: 0 for c in pred}

    for by in range(bh):
        for bx in range(bw_):
            w.maybe_restart(reset)
            for c in scan_comps:
                v = int(blocks[c][by, bx, 0]) >> al  # arithmetic shift
                diff = v - pred[c]
                pred[c] = v
                t, code = _magnitude(diff)
                hc, hl = dc_tab[t]
                w.bw.put(hc, hl)
                if t:
                    w.bw.put(code, t)
            w.unit += 1


def _emit_dc_refine(w, blocks, scan_comps, al, bh, bw_):
    for by in range(bh):
        for bx in range(bw_):
            w.maybe_restart(lambda: None)
            for c in scan_comps:
                w.bw.put((int(blocks[c][by, bx, 0]) >> al) & 1, 1)
            w.unit += 1


def _emit_eobrun(w, state, ac_tab):
    eobrun = state["eobrun"]
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        hc, hl = ac_tab[r << 4]
        w.bw.put(hc, hl)
        if r:
            w.bw.put(eobrun - (1 << r), r)
        state["eobrun"] = 0
    for b in state["bits"]:
        w.bw.put(b, 1)
    state["bits"] = []


def _emit_ac_first(w, comp_blocks, ss, se, al, ac_tab, bh, bw_):
    state = {"eobrun": 0, "bits": []}

    def reset():
        _emit_eobrun(w, state, ac_tab)

    for by in range(bh):
        for bx in range(bw_):
            w.maybe_restart(reset)
            zz = comp_blocks[by, bx]
            band = [
                (int(zz[k]) // (1 << al)) if zz[k] >= 0
                else -((-int(zz[k])) >> al)
                for k in range(ss, se + 1)
            ]
            if not any(band):
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(w, state, ac_tab)
                w.unit += 1
                continue
            _emit_eobrun(w, state, ac_tab)
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i, v in enumerate(band):
                if i > last_nz:
                    state["eobrun"] += 1
                    break
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    hc, hl = ac_tab[0xF0]
                    w.bw.put(hc, hl)
                    run -= 16
                t, code = _magnitude(v)
                hc, hl = ac_tab[(run << 4) | t]
                w.bw.put(hc, hl)
                w.bw.put(code, t)
                run = 0
            w.unit += 1
    _emit_eobrun(w, state, ac_tab)


def _emit_ac_refine(w, comp_blocks, ss, se, al, ac_tab, bh, bw_):
    """T.81 G.1.2.3 correction-bit encoder (the libjpeg-interoperable
    state machine): newly-significant coefficients (|v|>>Al == 1) get
    run/size-1 codes + sign bit; history coefficients contribute one
    buffered correction bit each, appended after the next emitted symbol;
    all-zero-news blocks join the EOB run."""
    state = {"eobrun": 0, "bits": []}

    def reset():
        _emit_eobrun(w, state, ac_tab)

    for by in range(bh):
        for bx in range(bw_):
            w.maybe_restart(reset)
            zz = comp_blocks[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i
            run = 0
            pending: list[int] = []
            for i, a in enumerate(absv):
                if a == 0:
                    run += 1
                    continue
                # ZRL folding happens at EVERY nonzero (history included) —
                # it decides where buffered correction bits land in the
                # stream, so doing it only at newly-significant positions
                # desyncs the decoder (found by the SA-chain round-trip)
                while run > 15 and i <= eob:
                    _emit_eobrun(w, state, ac_tab)
                    hc, hl = ac_tab[0xF0]
                    w.bw.put(hc, hl)
                    run -= 16
                    for b in pending:
                        w.bw.put(b, 1)
                    pending = []
                if a > 1:
                    pending.append(a & 1)
                    continue
                _emit_eobrun(w, state, ac_tab)
                hc, hl = ac_tab[(run << 4) | 1]
                w.bw.put(hc, hl)
                w.bw.put(1 if zz[ss + i] > 0 else 0, 1)
                for b in pending:
                    w.bw.put(b, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                state["eobrun"] += 1
                state["bits"].extend(pending)
                if state["eobrun"] == 0x7FFF or len(state["bits"]) > 900:
                    _emit_eobrun(w, state, ac_tab)
            w.unit += 1
    _emit_eobrun(w, state, ac_tab)


def encode_jpeg_progressive(arr, *, scans=None, restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes, 4:4:4.

    Same quantized coefficients as the baseline encoder (identical DCT /
    exact-DC / quant path), re-ordered into progressive scans — so a
    correct progressive decode is pixel-identical to decoding the
    baseline encoding of the same image (the round-trip tests pin this).
    scans: list of (component_ids, Ss, Se, Ah, Al); default exercises
    every scan type."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    ycc = _rgb_to_ycbcr(a)
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    full = np.empty((H, W, 3), dtype=np.uint8)
    full[:h, :w] = ycc
    full[h:, :w] = ycc[h - 1 : h, :]
    full[:, w:] = full[:, w - 1 : w]
    bh, bw_ = H // 8, W // 8
    qt = [QTAB_LUMA, QTAB_CHROMA, QTAB_CHROMA]
    blocks = []
    for comp in range(3):
        zzb = np.zeros((bh, bw_, 64), np.int64)
        for by in range(bh):
            for bx in range(bw_):
                block = (
                    full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp].astype(
                        np.float64
                    )
                    - 128.0
                )
                coef = _DCT @ block @ _DCT.T
                coef[0, 0] = float(block.sum()) / 8.0
                q = _round_half_up(coef / qt[comp]).astype(np.int64)
                zzb[by, bx] = q.reshape(-1)[ZIGZAG]
        blocks.append(zzb)

    dc_tab = build_canonical(_DC_BITS, _DC_SYMS)
    ac_tab = build_canonical(_AC_BITS_PROG, _AC_SYMS_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tab.reshape(-1)[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, QTAB_LUMA) + dqt(1, QTAB_CHROMA)
    out += dht(0, 0, _DC_BITS, _DC_SYMS) + dht(1, 0, _AC_BITS_PROG, _AC_SYMS_PROG)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += sof
    for comp_ids, ss, se, ah, al in scans or DEFAULT_PROG_SCANS:
        ns = len(comp_ids)
        hdr = bytes([ns])
        for c in comp_ids:
            hdr += bytes([c + 1, 0x00])  # DC table 0, AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, hdr)
        wtr = _ProgScanWriter(restart_interval)
        if ss == 0:
            if ah == 0:
                _emit_dc_first(wtr, blocks, list(comp_ids), al, dc_tab, bh, bw_)
            else:
                _emit_dc_refine(wtr, blocks, list(comp_ids), al, bh, bw_)
        else:
            if ns != 1:
                raise ValueError("AC scans are non-interleaved")
            if ah == 0:
                _emit_ac_first(wtr, blocks[comp_ids[0]], ss, se, al, ac_tab, bh, bw_)
            else:
                _emit_ac_refine(wtr, blocks[comp_ids[0]], ss, se, al, ac_tab, bh, bw_)
        wtr.bw.flush()
        out += bytes(wtr.bw.buf)
    out += b"\xff\xd9"
    return bytes(out)
