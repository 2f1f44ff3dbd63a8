"""GIF87a/89a codec in pure stdlib/numpy — the LZW image lane.

Scope (same honesty policy as ops/jpeg.py — wrong-but-silent is worse
than unsupported):

- encode: single-frame GIF87a, global color table only, for images
  with <= 256 unique colors (a real quantizer is a model choice, not a
  codec concern — ValueError otherwise), real variable-width LZW with
  clear-code resets at dictionary overflow;
- decode: first image of a GIF87a/89a stream — header + logical screen
  descriptor + global/local color table + full LZW decompression with
  deferred-clear handling; extensions (0x21) are skipped by sub-block
  walking; interlaced images and missing color tables raise
  NotImplementedError; truncated/corrupt streams raise ValueError.

Reference scope note: the reference pipeline has no codec code at all
(its media columns are opaque); this module exists so the multimodal
tier's decode/resize/perceptual-hash operators exercise a third REAL
compressed format (after PNG's zlib lane and JPEG's DCT lane, the LZW
lane) instead of a stub.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_BITS = 12  # GIF caps LZW codes at 12 bits


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, clear/end codes, 12-bit cap)
# --------------------------------------------------------------------------


class _LsbBitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._pos >= len(self._data):
                raise EOFError("LZW stream exhausted mid-code")
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return v


def lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit clear, build the string table, reset at
    4096 entries; code width grows when the next code would not fit."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return {}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    prev = -1
    for k in map(int, indices):
        if prev < 0:
            prev = k
            continue
        key = (prev, k)
        cur = table.get(key)
        if cur is not None:
            prev = cur
            continue
        bw.write(prev, width)
        table[key] = next_code
        next_code += 1
        # the code that first NEEDS width+1 bits (value 1<<width) must
        # exist in both tables before any code that wide is written —
        # the encoder therefore bumps one assignment AFTER capacity
        # (next == cap+1), while the decoder bumps at capacity (it
        # runs one table entry behind); verified against the GIF89a
        # spec-appendix sample stream in tests
        if next_code == (1 << width) + 1 and width < _MAX_CODE_BITS:
            width += 1
        elif next_code == (1 << _MAX_CODE_BITS):
            bw.write(clear, width)
            table, next_code, width = reset()
        prev = k
    if prev >= 0:
        bw.write(prev, width)
    bw.write(end, width)
    return bw.flush()


def lzw_decompress(data: bytes, min_code_size: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    br = _LsbBitReader(data)

    def reset():
        return {i: (i,) for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out.extend(entry)
        if prev is not None and next_code < (1 << _MAX_CODE_BITS):
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # decoder bumps at capacity — one table entry before the
            # encoder does (see lzw_compress); at 4096 it stops adding
            # and waits for a clear (deferred-clear streams are legal)
            if next_code == (1 << width) and width < _MAX_CODE_BITS:
                width += 1
        prev = entry
    return np.asarray(out, dtype=np.uint16)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def encode_gif(px: np.ndarray) -> bytes:
    """Single-frame GIF87a for an (h, w, 3) uint8 RGB array with at
    most 256 unique colors (palette = lexicographically sorted unique
    colors — deterministic; quantization is the caller's job)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(
            f"encode_gif: {n_colors} unique colors > 256 (quantize first)"
        )
    # global color table size: 2^(gct_bits+1) entries
    gct_bits = 0
    while (2 << gct_bits) < n_colors:
        gct_bits += 1
    table_len = 2 << gct_bits
    gct = np.zeros((table_len, 3), dtype=np.uint8)
    gct[:n_colors] = palette

    out = bytearray(b"GIF87a")
    # logical screen descriptor: GCT present, color resolution 8-bit
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x07 << 4) | gct_bits, 0, 0)
    out += gct.tobytes()
    # image descriptor: full frame, no local table, not interlaced
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, (n_colors - 1).bit_length())
    out.append(min_code_size)
    comp = lzw_compress(inverse.astype(np.uint16), min_code_size)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a stream to (h, w, 3)
    uint8 RGB. Raises NotImplementedError for interlaced images or a
    missing color table, ValueError for malformed streams."""
    try:
        return _decode_gif_inner(payload)
    except (struct.error, IndexError, EOFError) as exc:
        raise ValueError(f"malformed GIF stream: {exc!r}") from exc


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension block")
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected block marker 0x{marker:02X}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        table = gct
        if iflags & 0x80:  # local color table overrides
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if len(table) != 3 * n:
                raise ValueError("truncated local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise NotImplementedError("GIF without a color table unsupported")
        if pos >= len(payload):
            raise ValueError("truncated before LZW minimum code size")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW minimum code size {min_code_size}")
        comp = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image sub-blocks")
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            comp += payload[pos : pos + size]
            pos += size
        idx = lzw_decompress(bytes(comp), min_code_size)
        if len(idx) < w * h:
            raise ValueError(f"LZW yielded {len(idx)} pixels, expected {w * h}")
        idx = idx[: w * h]
        if idx.max(initial=0) >= len(table):
            raise ValueError("pixel index beyond color table")
        return table[idx.astype(np.int64)].reshape(h, w, 3)
    raise ValueError("truncated GIF (no trailer, no image)")
