"""[EXT] JPEG codec (ITU-T T.81: baseline sequential DCT encode/decode,
PROGRESSIVE decode) in pure numpy — closes the last compressed-image
boundary behind `multimodal.decode_image`'s seam.

Scope, declared precisely:

* ENCODE: 8-bit RGB/greyscale → baseline JFIF: BT.601 YCbCr, 8×8
  orthonormal DCT, IJG quality-scaled quantization, canonical Huffman
  tables EMBEDDED IN THE FILE (fixed-length canonical sets — legal
  baseline JPEG; Annex K's tables are merely the spec's *example*), MSB
  bitstream with 0xFF byte stuffing.  ``subsampling="444"`` (default,
  the lossless-chroma choice) or ``"420"`` (2×2 box-averaged chroma —
  the web-corpus default); optional ``restart_interval`` emits DRI +
  RSTn markers with byte-aligned 1-padding and DC-predictor resets.
  No progressive.
* DECODE: any baseline sequential JPEG with integer-ratio sampling
  factors — 4:4:4, 4:2:0, 4:2:2, 4:4:0, both interleaved (one scan)
  and non-interleaved (one scan per component, each walking its own
  data-unit grid per A.2.2) layouts decode; chroma is
  box-replicated back to full resolution (the standard simple
  upsampling).  DRI/RSTn restart intervals are honored: the bit reader
  byte-aligns at each interval, verifies the RSTn modulo-8 sequence,
  and resets the DC predictors (T.81 §F.2.1.3.1).  Tables are read
  from the file as the spec requires, so files from other encoders
  decode too.  PROGRESSIVE (SOF2) inputs decode via coefficient
  accumulation across scans — DC first/refine, AC spectral-selection
  bands with EOB runs, AC successive-approximation refinement (Annex
  G; VERDICT r8 #7: the majority encoding of modern web JPEGs).
  SOF1 extended-sequential frames decode through the baseline path
  (at 8-bit precision the two differ only in the table-count limits
  baseline imposes), 16-bit DQT entries (Pq=1, big-endian per
  B.2.4.1) are read for real, and 12-bit sample precision decodes
  under SOF1/SOF2 (level shift 2048, samples presented raw at file
  depth as uint16 — the 16-bit-PNG convention; SOF0 claiming 12-bit
  is a spec violation and a ValueError).
  SOF3 LOSSLESS (Annex H) decodes for real: Huffman-coded prediction
  differences mod 2^16 over the seven predictors, point transform,
  precisions 2..16, interleaved or one-scan-per-component — components
  present RAW (T.81 defines no color transform for lossless), uint8/
  uint16 at file depth.  Arithmetic-coded and hierarchical inputs
  raise ``NotImplementedError`` with the boundary named; lossless
  limits: 1x1 sampling factors and no restart intervals (both named).

Conformance evidence: GIF's decoder is pinned to a public byte vector;
JPEG is pinned to a SPEC-DERIVED vector instead — a byte-literal file
hand-assembled in tests/test_multimodal.py from ITU-T T.81 Annex K's
published example tables (K.1 quantization, K.3 DC / K.5 AC Huffman)
whose entropy stream and exact integer decode are derived step-by-step
in the test, so the decoder is checked against spec-published tables,
not against this module's own encoder.  On top of that: (a) strict
structural parsing of the marker stream, (b) encode→decode round-trip
error bounded by the quantization step (tested: ≤1 grey level on
constant blocks at quality 95, small RMSE on smooth gradients), and
(c) the driver gate comparing decoded means against the lossless PPM
path within the lossy tolerance.  JPEG is LOSSY by design — bit-exact
pixel recovery is not a correct expectation and is not claimed.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → the base table, higher → finer."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * s + 50) / 100)
    return np.clip(q, 1, 255)


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_C = _dct_matrix()

# Canonical fixed-length Huffman sets (embedded in the file — legal
# baseline tables; simpler than Annex K's examples and equally valid):
# DC: the 12 size categories as 4-bit codes; AC: all 162 (run, size)
# symbols plus EOB/ZRL as 8-bit codes, ascending symbol order.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # twelve 4-bit codes
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # 162 8-bit codes


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's canonical generation."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def restart(self, n: int) -> None:
        """Byte-align with 1-padding and emit RSTn (the pad byte is
        entropy data, so a resulting 0xFF is still stuffed; the marker
        bytes themselves are raw)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.ravel()[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = _DC_CODES[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = _AC_CODES[0xF0]  # ZRL: sixteen zeros
            bw.write(zc, zl)
            run -= 16
        size, bits = _magnitude(int(v))
        ac, al = _AC_CODES[(run << 4) | size]
        bw.write(ac, al)
        bw.write(bits, size)
        run = 0
    if run:
        ec, el = _AC_CODES[0x00]  # EOB
        bw.write(ec, el)
    return dc


def _dht_segment(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (RGB HxWx3 or greyscale HxW).

    ``subsampling``: ``"444"`` (chroma at full resolution) or ``"420"``
    (chroma 2×2 box-averaged, luma sampling factor 2×2 — the MCU walk
    interleaves 4 luma + 1 Cb + 1 Cr blocks per 16×16 MCU).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that many MCUs (byte-aligned, DC predictors reset).
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected HxW or HxWx3 uint8 array, got {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    sub = subsampling == "420" and not grey
    h, w = arr.shape[:2]
    if grey:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    q_luma = _quality_scale(_Q_LUMA, quality)
    q_chroma = _quality_scale(_Q_CHROMA, quality)
    qtables = [q_luma] if grey else [q_luma, q_chroma]
    # pad to MCU multiples by edge replication (8 for 1x1, 16 for 2x2 luma)
    mcu = 16 if sub else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    if sub:
        # chroma: 2x2 box average over the padded plane (dims ph/2 x pw/2,
        # 8-multiples by construction)
        planes[1:] = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]
    # per-component (blocks-per-MCU-y, blocks-per-MCU-x, qtable)
    layout = [(2, 2, q_luma), (1, 1, q_chroma), (1, 1, q_chroma)] if sub else [
        (1, 1, q_luma if ci == 0 else q_chroma) for ci in range(len(planes))
    ]
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_idx = 0
    for my in range(0, ph // mcu):
        for mx in range(0, pw // mcu):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.restart(mcu_idx // restart_interval - 1)
                preds = [0] * len(planes)
            for ci, plane in enumerate(planes):
                vi, hi, q = layout[ci]
                for v in range(vi):
                    for hh in range(hi):
                        y0 = my * 8 * vi + v * 8
                        x0 = mx * 8 * hi + hh * 8
                        preds[ci] = _encode_block(
                            bw, plane[y0 : y0 + 8, x0 : x0 + 8], q, preds[ci]
                        )
            mcu_idx += 1
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for ti, q in enumerate(qtables):
        zz = q.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + zz
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sampling = 0x22 if (sub and ci == 0) else 0x11
        sof += bytes([ci + 1, sampling, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(0x10, _AC_BITS, _AC_SYMBOLS)
    if not grey:
        out += _dht_segment(0x01, _DC_BITS, _DC_SYMBOLS)
        out += _dht_segment(0x11, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # a restart marker is only legal AT a declared interval
                # boundary, where consume_restart eats it proactively
                raise ValueError(
                    "unexpected RSTn inside entropy data (marker not at the "
                    "declared DRI interval, or DRI segment missing)"
                )
            else:
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def consume_restart(self) -> int:
        """Discard pad bits to the byte boundary, consume the expected
        RSTn marker, and return n (T.81 §F.2.1.3.1: entropy data is
        1-padded to a byte boundary before each restart marker)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker at restart interval")
        n = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return n


def _decode_huffman(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_block(
    br: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    q: np.ndarray,
    pred: int,
    mid: float = 128.0,
) -> tuple[int, np.ndarray]:
    """Decode one 8×8 block; returns (new DC predictor, spatial block).
    ``mid`` is the inverse level shift — 2^(P−1) for sample precision P."""
    zz = np.zeros(64, dtype=np.float64)
    size = _decode_huffman(br, dc_tab)
    diff = _extend(br.read_bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _decode_huffman(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        run, s = sym >> 4, sym & 0x0F
        if sym == 0xF0:
            k += 16
            continue
        k += run
        if k >= 64:
            raise ValueError("JPEG AC index overrun")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros(64)
    coef[_ZIGZAG] = zz
    return pred, _C.T @ (coef.reshape(8, 8) * q) @ _C + mid


def _decode_dc_first(br, dc_tab, pred, al):
    size = _decode_huffman(br, dc_tab)
    pred += _extend(br.read_bits(size), size)
    return pred  # coefficient is pred << al, applied by the caller


def _decode_ac_first(br, ac_tab, zz, ss, se, al, eobrun):
    """AC first scan for one block's band (T.81 §G.1.2.2); returns the
    updated EOB run (an EOBn symbol ends 2^r-1+bits FOLLOWING blocks'
    bands too, so the run must thread across block calls)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _decode_huffman(br, ac_tab)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overrun")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_nonzero(br, zz, k, p1, m1):
    """Refinement bit for an already-nonzero coefficient (§G.1.2.3):
    a 1-bit adds 2^Al toward the coefficient's sign if that bit is not
    already set."""
    if br.read_bit():
        if zz[k] > 0 and not (zz[k] & p1):
            zz[k] += p1
        elif zz[k] < 0 and not (-zz[k] & p1):
            zz[k] += m1


def _decode_ac_refine(br, ac_tab, zz, ss, se, al, eobrun):
    """AC refinement scan for one block's band (T.81 §G.1.2.3)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_huffman(br, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r < 15:  # EOBn: refine the rest of the band, then run
                    # NOT pre-decremented (unlike the first-scan rule):
                    # the tail below refines the CURRENT block's
                    # remainder and consumes one unit of the run
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                newval = p1 if br.read_bit() else m1
            # advance past r zero-history coefficients, emitting a
            # refinement bit for every nonzero-history one passed over
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(br, zz, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(br, zz, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_image(
    planes: list, comps, hmax: int, vmax: int, h: int, w: int,
    precision: int = 8,
) -> np.ndarray:
    """Shared decoder tail: replicate subsampled planes to full
    resolution, crop the MCU padding, and color-convert — ONE copy of
    the upsample/crop/BT.601 constants, so the baseline and progressive
    paths stay bit-identical by construction (r9 self-review)."""
    full = []
    for pi, (_cid, hi, vi, _tq) in enumerate(comps):
        p = planes[pi]
        if vi != vmax:
            p = p.repeat(vmax // vi, axis=0)
        if hi != hmax:
            p = p.repeat(hmax // hi, axis=1)
        full.append(p[:h, :w])
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype)
    y, cb, cr = full
    r = y + 1.402 * (cr - mid)
    g = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = y + 1.772 * (cb - mid)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype)


def _decode_progressive_scan(
    data: bytes,
    frame,
    coef_store: dict[int, np.ndarray],
    huff,
    scan_order: list[int],
    scan_tables: dict[int, tuple[int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan's entropy data into the coefficient
    store; returns the number of entropy bytes consumed.

    T.81 Annex G scan taxonomy, all four decoded:
    * DC first (Ss=Se=0, Ah=0) — interleaved or single-component; the
      predictor chain runs in the successive-approximation domain and
      the stored coefficient is ``pred << Al``;
    * DC refinement (Ss=0, Ah>0) — one appended bit per block;
    * AC first (Ss>0, Ah=0) — single-component band [Ss..Se] with
      EOB-run symbols spanning blocks;
    * AC refinement (Ss>0, Ah>0) — correction bits (§G.1.2.3).

    Restart intervals reset DC predictors AND the EOB run, and count
    MCUs in interleaved scans / blocks in single-component scans.
    """
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se=0")
    if not is_dc and len(scan_order) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    if (not is_dc and ss > se) or se > 63:
        raise ValueError("bad spectral selection band")

    br = _BitReader(data)
    preds = {cid: 0 for cid in scan_order}
    eobrun = 0

    interleaved = len(scan_order) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        cid0 = scan_order[0]
        hi, vi, _ = comp_by_id[cid0]
        # single-component scans cover the COMPONENT's blocks (no MCU
        # padding): ceil(comp_size / 8) per axis (T.81 §A.2.2)
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        n_units = bw * bh

    for idx in range(n_units):
        if restart_interval and idx and idx % restart_interval == 0:
            n = br.consume_restart()
            expect = (idx // restart_interval - 1) % 8
            if n != expect:
                raise ValueError(
                    f"RST{n} out of sequence (expected RST{expect})"
                )
            preds = {cid: 0 for cid in scan_order}
            eobrun = 0
        if interleaved:  # DC scan over full MCUs
            my, mx = divmod(idx, mcux)
            for cid in scan_order:
                hi, vi, _tq = comp_by_id[cid]
                td, _ta = scan_tables[cid]
                arr = coef_store[cid]
                for v in range(vi):
                    for hh in range(hi):
                        by, bx = my * vi + v, mx * hi + hh
                        if ah == 0:
                            preds[cid] = _decode_dc_first(
                                br, huff[(0, td)], preds[cid], al
                            )
                            arr[by, bx, 0] = preds[cid] << al
                        else:
                            if br.read_bit():
                                arr[by, bx, 0] |= 1 << al
        else:
            cid = scan_order[0]
            arr = coef_store[cid]
            by, bx = divmod(idx, bw)
            if is_dc:
                td, _ta = scan_tables[cid]
                if ah == 0:
                    preds[cid] = _decode_dc_first(
                        br, huff[(0, td)], preds[cid], al
                    )
                    arr[by, bx, 0] = preds[cid] << al
                else:
                    if br.read_bit():
                        arr[by, bx, 0] |= 1 << al
            else:
                _td, ta = scan_tables[cid]
                zz = arr[by, bx]  # 1-D int32 view; in-place updates land
                if ah == 0:
                    eobrun = _decode_ac_first(
                        br, huff[(1, ta)], zz, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_ac_refine(
                        br, huff[(1, ta)], zz, ss, se, al, eobrun
                    )
    return br.pos


def _reconstruct_progressive(
    frame, coef_store: dict[int, np.ndarray], qtables: dict[int, np.ndarray],
    precision: int = 8,
) -> np.ndarray:
    """Dequantize + inverse-zigzag + IDCT the accumulated coefficient
    store and assemble the image — one vectorized einsum per component
    (the per-block loop of the sequential path would be numpy-slow at
    the block counts progressive web images carry)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for cid, _hi, _vi, tq in comps:
        arr = coef_store[cid].astype(np.float64)
        by, bx = arr.shape[:2]
        nat = np.zeros_like(arr)
        nat[..., _ZIGZAG] = arr  # zigzag index k -> natural position
        blocks = nat.reshape(by, bx, 8, 8) * qtables[tq]
        # broadcast matmul, SAME associativity as the sequential path's
        # per-block `_C.T @ (coef*q) @ _C` — bit-identical floats, so a
        # baseline and a progressive encoding of the same coefficients
        # decode to the same pixels
        spatial = _C.T @ blocks @ _C + float(1 << (precision - 1))
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _finish_image(planes, comps, hmax, vmax, h, w, precision)


def _decode_lossless_samples(
    data: bytes,
    scan_comps: list[tuple[int, int]],
    huff: dict,
    w: int,
    h: int,
    precision: int,
    predictor: int,
    pt: int,
    planes: dict[int, np.ndarray],
) -> int:
    """T.81 Annex H lossless-process scan (1×1 sampling): Huffman-coded
    prediction differences, one sample per component per MCU in scan
    order.  Reconstruction is modulo 2^16 regardless of precision (H.1.2.1);
    the size-16 category carries no extra bits and means diff = 32768.
    First sample of the scan predicts from the default 2^(P−1−Pt); the
    rest of the first line from Ra, first column from Rb, everything
    else from the scan's selected predictor.  Returns entropy bytes
    consumed; reconstructed (pre-point-transform) samples land in
    ``planes``."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"lossless predictor {predictor} out of range 1..7")
    br = _BitReader(data)
    default = 1 << (precision - 1 - pt)
    for y in range(h):
        for x in range(w):
            for cid, td in scan_comps:
                size = _decode_huffman(br, huff[(0, td)])
                if size == 16:  # no appended bits (H.2, Table H.2)
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(size), size)
                plane = planes[cid]
                if y == 0 and x == 0:
                    p = default
                elif y == 0:
                    p = int(plane[0, x - 1])
                elif x == 0:
                    p = int(plane[y - 1, 0])
                else:
                    ra = int(plane[y, x - 1])
                    rb = int(plane[y - 1, x])
                    rc = int(plane[y - 1, x - 1])
                    p = (
                        ra, rb, rc,
                        ra + rb - rc,
                        ra + ((rb - rc) >> 1),
                        rb + ((ra - rc) >> 1),
                        (ra + rb) >> 1,
                    )[predictor - 1]
                plane[y, x] = (p + diff) % 65536
    return br.pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential AND progressive decoder → uint8 HxWx3 (or HxW
    grey); any integer-ratio sampling factors (4:4:4 / 4:2:0 / 4:2:2 /
    4:4:0), DRI/RSTn restart intervals honored.  Progressive (SOF2,
    the majority encoding of modern web JPEGs — VERDICT r8 #7) decodes
    via per-component coefficient accumulation across scans: DC
    first/refine, AC spectral-selection bands with EOB-run tracking, AC
    successive-approximation refinement (T.81 Annex G), reconstructed
    once at EOI with the same dequantize + IDCT + upsample path as
    baseline.  SOF3 lossless decodes via Annex-H predictive coding
    (components raw, no color transform).  Arithmetic-coded and
    hierarchical inputs still raise ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    progressive = False
    sample_bits = 8
    coef_store: dict[int, np.ndarray] = {}  # cid -> (BY, BX, 64) int32
    n_scans = 0
    seq_planes: dict[int, np.ndarray] = {}  # non-interleaved sequential
    seq_done: set[int] = set()
    lossless = False
    ll_planes: dict[int, np.ndarray] = {}  # lossless reconstructed samples
    ll_done: set[int] = set()
    ll_pt: dict[int, int] = {}
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them or a spec-legal file from another
        # encoder misparses (the real marker byte would be consumed as
        # the segment-length high byte)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and n_scans:
                return _reconstruct_progressive(
                    frame, coef_store, qtables, sample_bits
                )
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision field {pq}")
                tbl = np.zeros(64)
                if pq == 1:  # 16-bit table entries, big-endian (T.81 B.2.4.1)
                    tbl[_ZIGZAG] = np.frombuffer(
                        body, ">u2", count=64, offset=off + 1
                    )
                    off += 129
                else:
                    tbl[_ZIGZAG] = np.frombuffer(
                        body, np.uint8, count=64, offset=off + 1
                    )
                    off += 65
                qtables[tq] = tbl.reshape(8, 8).astype(np.float64)
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                symbols = list(body[off + 17 : off + 17 + n])
                codes = _canonical_codes(bits, symbols)
                huff[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                off += 17 + n
        elif marker == 0xC3:  # SOF3 lossless (Huffman, Annex H)
            lossless = True
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if not 2 <= precision <= 16:
                raise ValueError(
                    f"lossless precision {precision} out of range 2..16"
                )
            sample_bits = precision
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG (non-1x1 factors)"
                    )
                comps.append((cid, 1, 1, tq))
            frame = (h, w, comps)
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive.
            # At 8-bit precision SOF1 decodes identically to baseline
            # (T.81 just lifts the 2-table/255-value limits baseline adds).
            progressive = marker == 0xC2
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"{precision}-bit JPEG sample precision (8/12 decode)"
                )
            if precision == 12 and marker == 0xC0:
                raise ValueError(
                    "baseline (SOF0) is 8-bit only; 12-bit data requires "
                    "SOF1/SOF2 (T.81 Table B.2)"
                )
            sample_bits = precision
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if any(hmax % c[1] or vmax % c[2] for c in comps):
                raise NotImplementedError(
                    "non-integer subsampling ratio between components"
                )
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "arithmetic-coded or hierarchical JPEG"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ncomp_scan = body[0]
            scan_tables: dict[int, tuple[int, int]] = {}
            scan_order: list[int] = []
            for ci in range(ncomp_scan):
                cid, tdta = body[1 + 2 * ci : 3 + 2 * ci]
                scan_tables[cid] = (tdta >> 4, tdta & 0x0F)
                scan_order.append(cid)
            h, w, comps = frame
            if lossless:
                if restart_interval:
                    raise NotImplementedError(
                        "restart intervals in lossless JPEG"
                    )
                predictor = body[1 + 2 * ncomp_scan]  # Ss selects P1..P7
                pt = body[3 + 2 * ncomp_scan] & 0x0F  # Al = point transform
                if not ll_planes:
                    for cid2, _hi2, _vi2, _tq2 in comps:
                        ll_planes[cid2] = np.zeros((h, w), np.int64)
                scan_comps = [
                    (cid, scan_tables[cid][0]) for cid in scan_order
                ]
                consumed = _decode_lossless_samples(
                    payload[pos + seg_len :], scan_comps, huff, w, h,
                    sample_bits, predictor, pt, ll_planes,
                )
                for cid in scan_order:
                    ll_done.add(cid)
                    ll_pt[cid] = pt  # Al is per scan
                pos = pos + seg_len + consumed
                while pos + 1 < len(payload) and not (
                    payload[pos] == 0xFF
                    and payload[pos + 1] != 0x00
                    and not 0xD0 <= payload[pos + 1] <= 0xD7
                ):
                    pos += 1
                if ll_done == {c[0] for c in comps}:
                    # T.81 defines NO color transform for lossless —
                    # components present raw at file depth/order.
                    dtype = np.uint8 if sample_bits <= 8 else np.uint16
                    out = [
                        (ll_planes[c[0]] << ll_pt[c[0]]).astype(dtype)
                        for c in comps
                    ]
                    return out[0] if len(out) == 1 else np.stack(out, axis=2)
                continue
            if progressive:
                ss = body[1 + 2 * ncomp_scan]
                se = body[2 + 2 * ncomp_scan]
                ahal = body[3 + 2 * ncomp_scan]
                if not coef_store:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    for cid, hi, vi, _tq in comps:
                        coef_store[cid] = np.zeros(
                            (mcuy * vi, mcux * hi, 64), dtype=np.int32
                        )
                consumed = _decode_progressive_scan(
                    payload[pos + seg_len :],
                    frame,
                    coef_store,
                    huff,
                    scan_order,
                    scan_tables,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0x0F,
                    restart_interval,
                )
                n_scans += 1
                pos = pos + seg_len + consumed
                # resync: skip pad bytes to the next true marker (not a
                # stuffed 0xFF00, not a stray RSTn)
                while pos + 1 < len(payload) and not (
                    payload[pos] == 0xFF
                    and payload[pos + 1] != 0x00
                    and not 0xD0 <= payload[pos + 1] <= 0xD7
                ):
                    pos += 1
                continue
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            if ncomp_scan != len(comps) or seq_planes:
                # Non-interleaved sequential: each scan carries ONE
                # component whose data units walk the component's OWN
                # block grid in raster order (T.81 A.2.2 — ceil of the
                # scaled dimensions, NOT padded to MCU multiples), and
                # the MCU is a single data unit, so DRI counts blocks.
                # Planes accumulate across scans; the image reconstructs
                # once every frame component has been seen.
                if ncomp_scan != 1:
                    raise NotImplementedError(
                        "partially-interleaved sequential scan (1 < Ns < Nf)"
                    )
                if not seq_planes:
                    for cid2, hi2, vi2, _tq2 in comps:
                        seq_planes[cid2] = np.zeros(
                            (mcuy * 8 * vi2, mcux * 8 * hi2), dtype=np.float64
                        )
                cid = scan_order[0]
                hi, vi, tq = next(
                    (c[1], c[2], c[3]) for c in comps if c[0] == cid
                )
                bx = -(-(-(-w * hi // hmax)) // 8)  # ceil(ceil(w*hi/hmax)/8)
                by = -(-(-(-h * vi // vmax)) // 8)
                td, ta = scan_tables[cid]
                br = _BitReader(payload[pos + seg_len :])
                pred = 0
                plane = seq_planes[cid]
                for unit in range(by * bx):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        n = br.consume_restart()
                        expect = (unit // restart_interval - 1) % 8
                        if n != expect:
                            raise ValueError(
                                f"RST{n} out of sequence (expected RST{expect})"
                            )
                        pred = 0  # T.81 §F.2.1.3.1
                    pred, block = _decode_block(
                        br, huff[(0, td)], huff[(1, ta)], qtables[tq], pred,
                        float(1 << (sample_bits - 1)),
                    )
                    y0, x0 = (unit // bx) * 8, (unit % bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = block
                seq_done.add(cid)
                pos = pos + seg_len + br.pos
                # resync: skip pad bits/bytes to the next true marker
                while pos + 1 < len(payload) and not (
                    payload[pos] == 0xFF
                    and payload[pos + 1] != 0x00
                    and not 0xD0 <= payload[pos + 1] <= 0xD7
                ):
                    pos += 1
                if seq_done == {c[0] for c in comps}:
                    planes = [seq_planes[c[0]] for c in comps]
                    return _finish_image(
                        planes, comps, hmax, vmax, h, w, sample_bits
                    )
                continue
            planes = [
                np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
                for (_cid, hi, vi, _tq) in comps
            ]
            br = _BitReader(payload[pos + seg_len :])
            preds = [0] * len(comps)
            mcu_idx = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_idx
                        and mcu_idx % restart_interval == 0
                    ):
                        n = br.consume_restart()
                        expect = (mcu_idx // restart_interval - 1) % 8
                        if n != expect:
                            raise ValueError(
                                f"RST{n} out of sequence (expected RST{expect})"
                            )
                        preds = [0] * len(comps)  # T.81 §F.2.1.3.1
                    for ci, (cid, hi, vi, tq) in enumerate(comps):
                        td, ta = scan_tables[cid]
                        for v in range(vi):
                            for hh in range(hi):
                                preds[ci], block = _decode_block(
                                    br, huff[(0, td)], huff[(1, ta)],
                                    qtables[tq], preds[ci],
                                    float(1 << (sample_bits - 1)),
                                )
                                y0 = my * 8 * vi + v * 8
                                x0 = mx * 8 * hi + hh * 8
                                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                    mcu_idx += 1
            return _finish_image(planes, comps, hmax, vmax, h, w, sample_bits)
        pos += seg_len
    if seq_planes or ll_planes:
        raise ValueError(
            "scans ended before every frame component was coded"
        )
    raise ValueError("JPEG payload contains no scan")
