"""Baseline JFIF/JPEG codec in pure numpy + stdlib — no PIL, no
libjpeg. Closes the last "honest stub" in the multimodal tier: PPM and
PNG already decode real pixels; this adds the DCT-compressed codec.

Scope (and honest limits, enforced with NotImplementedError):
- encode: 8-bit RGB, baseline sequential (SOF0), 4:4:4 (no chroma
  subsampling), standard Annex-K quantization + Huffman tables with
  libjpeg quality scaling. Deterministic — no RNG, pure float DCT.
- decode: baseline sequential (SOF0) ONLY, 8-bit, 1 or 3 components,
  all sampling factors 1x1 (4:4:4), no restart intervals. Progressive
  (SOF2), arithmetic coding, subsampled or DRI streams raise
  NotImplementedError — a wrong-but-silent decode would be worse.

Round-trip accuracy is quantization-bounded (tested in
tests/test_multimodal.py): at quality 95 a smooth gradient reconstructs
within a few grey levels per pixel. The lossy-ness is REAL JPEG
behavior, which is exactly what the perceptual-hash dedup path needs to
be exercised against.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

QUANT_LUM = np.array(
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
    dtype=np.int32,
)

QUANT_CHROM = np.array(
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
    dtype=np.int32,
)

# zigzag scan: ZIGZAG[i] = (row, col) of the i-th coefficient
_Z = []
for s in range(15):
    idx = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
    _Z.extend(idx if s % 2 else idx[::-1])
ZIGZAG = _Z  # 64 (row, col) pairs

# Huffman table specs: (bits[1..16], values). Encoder and decoder build
# the SAME canonical codes from these, so round-trip correctness does
# not depend on table choice; the values below are the Annex-K ones so
# typical external baseline files decode too.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II matrix: DCT = M @ B @ M.T, IDCT = M.T @ C @ M
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)


def _canonical_codes(bits, vals):
    """symbol -> (code, length) from a (bits, values) Huffman spec."""
    codes = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(code, length) -> symbol lookup for the decoder."""
    return {cl: sym for sym, cl in _canonical_codes(bits, vals).items()}


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


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
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError("entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            else:
                raise EOFError("marker inside entropy stream")
        self.acc = (self.acc << 8) | b
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


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _blocks(channel: np.ndarray):
    """Pad to multiples of 8 by edge replication, yield (by, bx, block)."""
    h, w = channel.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(channel, ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(ph // 8):
        for bx in range(pw // 8):
            yield by, bx, padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def ycbcr_to_rgb(yc: np.ndarray) -> np.ndarray:
    y, cb, cr = yc[..., 0], yc[..., 1] - 128.0, yc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_jpeg(
    px: np.ndarray, quality: int = 95, scan_order: tuple = (0, 1, 2)
) -> bytes:
    """Baseline sequential 4:4:4 JFIF bytes for an (h, w, 3) uint8 RGB
    array. Deterministic; quality uses the libjpeg scaling curve.
    ``scan_order`` permutes the SOS component listing (and, per T.81, the
    per-MCU data-unit interleave that must follow it) — a legal baseline
    stream need not scan components in SOF order, and the decoder must
    pair tables by component id, not position."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    if sorted(scan_order) != [0, 1, 2]:
        raise ValueError("scan_order must be a permutation of (0, 1, 2)")
    h, w = px.shape[:2]
    qlum = _scale_quant(QUANT_LUM, quality)
    qchrom = _scale_quant(QUANT_CHROM, quality)
    yc = rgb_to_ycbcr(px)

    dc_codes = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
                _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
                _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    # quantized zigzag coefficients per component, in MCU scan order
    comp_blocks: list[list[np.ndarray]] = []
    for ci in range(3):
        qt = qlum if ci == 0 else qchrom
        coeffs = []
        for _, _, block in _blocks(yc[..., ci]):
            d = DCT_M @ (block - 128.0) @ DCT_M.T
            qd = np.round(d / qt).astype(np.int32)
            coeffs.append(np.array([qd[r, c] for r, c in ZIGZAG], dtype=np.int32))
        comp_blocks.append(coeffs)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for bi in range(len(comp_blocks[0])):
        for ci in scan_order:
            ti = 0 if ci == 0 else 1
            zz = comp_blocks[ci][bi]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size = _category(diff)
            code, length = dc_codes[ti][size]
            bw.write(code, length)
            if size:
                bw.write(_encode_magnitude(diff, size), size)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k]:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[ti][0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = ac_codes[ti][(run << 4) | size]
                bw.write(code, length)
                bw.write(_encode_magnitude(v, size), size)
                run = 0
            if last_nz != 63:
                code, length = ac_codes[ti][0x00]  # EOB
                bw.write(code, length)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in ((0, qlum), (1, qchrom)):
        zz = bytes(int(qt[r, c]) for r, c in ZIGZAG)
        out += seg(0xFFDB, bytes([tid]) + zz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
        (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
        (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for ci in scan_order:
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential 4:4:4 (or grayscale) JPEG bytes to an
    (h, w, 3) uint8 RGB array. Raises NotImplementedError for
    progressive/arithmetic/subsampled/DRI streams and ValueError for
    malformed ones."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, KeyError, IndexError, EOFError) as exc:
        # truncated length fields, missing Huffman/quant tables, short
        # segment bodies: malformed, not merely unsupported — surface as
        # ValueError so tolerant callers (_try_decode_jpeg) can route the
        # payload to the stub path instead of crashing the task
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) is supported, got SOF marker 0x{marker:02X}"
            )
        (length,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                vals = body[i + 1 : i + 65]
                qt = np.zeros((8, 8), dtype=np.int32)
                for j, (r, c) in enumerate(ZIGZAG):
                    qt[r, c] = vals[j]
                qtables[tq] = qt
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htables[tc_th] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("only 1 or 3 components supported")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tables = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append((cid, tables >> 4, tables & 0x0F))
            # entropy data runs until the next real marker (EOI)
            entropy_start = pos
            i = pos
            while i + 1 < len(payload):
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,):
                    if 0xD0 <= payload[i + 1] <= 0xD7:
                        raise NotImplementedError("restart markers unsupported")
                    break
                i += 1
            entropy = payload[entropy_start:i]
            pos = i
            break
        # APPn / COM / others: skipped via the length field
    if frame is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    h, w, comps = frame
    ncomp = len(comps)
    # The entropy stream interleaves data units in SOS order, and each scan
    # entry names its frame component by id — a legal baseline stream may
    # list SOS components in a different order than SOF. Resolve each scan
    # entry to its frame component index by id so Huffman/quant tables are
    # never paired positionally (wrong-but-silent colors otherwise).
    if len(scan) != ncomp:
        raise NotImplementedError(
            "non-interleaved multi-scan baseline unsupported"
        )
    comp_idx_by_cid = {cid: i for i, (cid, _) in enumerate(comps)}
    scan_resolved = []
    for cid, dc_id, ac_id in scan:
        if cid not in comp_idx_by_cid:
            raise ValueError(f"SOS component id {cid} not declared in SOF")
        scan_resolved.append((comp_idx_by_cid[cid], dc_id, ac_id))
    mcus_y, mcus_x = (h + 7) // 8, (w + 7) // 8
    br = _BitReader(entropy)
    planes = [np.zeros((mcus_y * 8, mcus_x * 8)) for _ in range(ncomp)]
    pred = [0] * ncomp

    def read_symbol(table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, dc_id, ac_id in scan_resolved:
                dc_tab = htables[dc_id]  # Tc=0 -> key 0x0t
                ac_tab = htables[0x10 | ac_id]
                zz = np.zeros(64, dtype=np.int64)
                size = read_symbol(dc_tab)
                diff = _extend(br.read_bits(size), size) if size else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = read_symbol(ac_tab)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = rs >> 4, rs & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC run overflow")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                qt = qtables[comps[ci][1]]
                block = np.zeros((8, 8))
                for j, (r, c) in enumerate(ZIGZAG):
                    block[r, c] = zz[j] * qt[r, c]
                spatial = DCT_M.T @ block @ DCT_M + 128.0
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = spatial
    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    yc = np.stack(planes, axis=2)
    return ycbcr_to_rgb(np.clip(yc, -128.0, 383.0))
