"""GIF89a codec — pure stdlib+numpy, written from the public spec
(CompuServe GIF89a, 1990; LZW per the spec's variable-width variant).

Closes the round-3 "entropy-coded codecs remain honest gates" item for
GIF: this is a REAL entropy coder (LZW with a growing dictionary,
variable code widths 3..12 bits, Clear/EOI codes), not a stand-in.

Decoder (foreign-input path):
* header + logical screen descriptor, global/local color tables;
* extension blocks skipped (graphic-control transparency index is read
  but composited as its palette color — we produce opaque RGB);
* FIRST image descriptor decoded (animated GIFs: frame 0), including
  INTERLACED images (the spec's 4-pass row order);
* full LZW decode: KwKwK case, width growth at 2^width, Clear resets,
  max code 0xFFF.

Encoder: exact-palette GIFs for images with ≤ 256 distinct colors
(lossless roundtrip, gated in tests); > 256 colors raises — honest about
what a palette format can hold, the pipeline's lossy path is qimg/PNG.

The reference validates GIF by magic bytes only
(``/root/reference/src/cinescrapers/__main__.py:260-281``); decode parity
is beyond it. Sequential-by-construction parts (the LZW code stream is a
data-dependent scan like PNG's Paeth filter) run as a Python loop over
CODES (each code covers a pixel run, so cost is per-run, not per-pixel);
see images/_native.py for the pattern if a GIF-heavy corpus ever makes
this the harvest hot path.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAX_CODE = 0xFFF  # 12-bit code space
_GIF_MAX_PIXELS = 64_000_000  # decompression-bomb cap (foreign-input path)


# --------------------------------------------------------------------------
# LZW (GIF variant: variable width, Clear/EOI, 12-bit cap)
# --------------------------------------------------------------------------
def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF LZW code stream → index bytes. Stops at EOI or when n_expected
    indices are produced (some writers omit EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary: list of bytes; entries 0..clear-1 are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out: list[bytes] = []
    produced = 0
    prev: bytes | None = None

    # LSB-first chunked bit reader (O(1)/code; a whole-stream bigint is
    # O(stream) per shift → quadratic on real images)
    acc = accbits = i = 0
    n = len(data)
    while True:
        while accbits < width and i < n:
            acc |= data[i] << accbits
            accbits += 8
            i += 1
        if accbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table {len(table)}")
        out.append(entry)
        produced += len(entry)
        prev = entry
        # width grows when the NEXT code could reference the next free slot
        if len(table) == (1 << width) and width < 12:
            width += 1
        if produced >= n_expected:
            break
    got = b"".join(out)
    if len(got) < n_expected:
        raise ValueError(f"GIF LZW: stream ended at {len(got)}/{n_expected} px")
    return got[:n_expected]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Index bytes → GIF LZW code stream (real dictionary compression,
    mirror of _lzw_decode's growth rule; emits Clear on table overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += w
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh():
        # key: (prefix_code << 8) | next_byte → code
        return {}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    prev = -1
    for b in indices:
        if prev < 0:
            prev = b
            continue
        key = (prev << 8) | b
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        # width sync: the decoder defines entry e_k only after reading the
        # (k+1)-th data code, so its table runs ONE entry behind ours at
        # each read. It bumps width when ITS size reaches 2^width — which
        # is our size BEFORE adding this entry. Check first, then add
        # (classic compress()-era ordering; one-late here desyncs the
        # stream at every 2^width boundary).
        if next_code == (1 << width) and width < 12:
            width += 1
        table[key] = next_code
        next_code += 1
        if next_code > _GIF_MAX_CODE:  # 0xFFF was the last legal entry
            emit(clear, width)
            table, next_code, width = fresh()
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into GIF sub-blocks (≤255 B + terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) per pass


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------
def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → GIF89a bytes. Exact palette (≤ 256 distinct
    colors — raises beyond; GIF is a palette format, the lossy path in
    this pipeline is qimg). Non-interlaced, single frame, real LZW."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    packed = (
        arr[:, :, 0].astype(np.uint32) << 16
        | arr[:, :, 1].astype(np.uint32) << 8
        | arr[:, :, 2].astype(np.uint32)
    )
    colors, inverse = np.unique(packed, return_inverse=True)
    if colors.size > 256:
        raise NotImplementedError(
            f"GIF palette overflow: {colors.size} distinct colors > 256 "
            "(use png/qimg for continuous-tone images)"
        )
    # palette table size must be a power of two ≥ 2
    ct_bits = max(1, int(colors.size - 1).bit_length())
    ct_size = 1 << ct_bits
    palette = np.zeros((ct_size, 3), dtype=np.uint8)
    palette[: colors.size, 0] = colors >> 16
    palette[: colors.size, 1] = (colors >> 8) & 0xFF
    palette[: colors.size, 2] = colors & 0xFF
    mcs = max(2, ct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (ct_bits - 1))  # GCT present, size 2^(n+1)
    out += b"\x00\x00"  # bg color index, aspect
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # image desc
    out.append(mcs)
    # hot path: the C LZW encode kernel (byte-identical, gated in tests);
    # None → the pure-Python reference scan
    from cinescrapers_spark.images._native import gif_lzw_encode

    idx_bytes = inverse.astype(np.uint8).tobytes()
    stream = gif_lzw_encode(idx_bytes, mcs)
    if stream is None:
        stream = _lzw_encode(idx_bytes, mcs)
    out += _sub_blocks(stream)
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 (first frame). Handles global + local
    color tables, interlace, extension blocks, and frames smaller than
    the logical screen (composited onto the background color).
    Foreign-input contract (fuzz-gated): crafted bytes either decode or
    raise ValueError — short-buffer/index errors never escape raw."""
    try:
        return _decode_gif(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"malformed GIF: {type(e).__name__}: {e}") from e


def _decode_gif(data: bytes) -> np.ndarray:
    assert data[:6] in (b"GIF87a", b"GIF89a"), "not a gif"
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x} at {pos - 1}")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        iflags = data[pos + 8]
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image with no color table")
        # foreign-input guards: a crafted descriptor can otherwise drive
        # a ~4 GB allocation (w*h) or overflow the C kernel's fixed
        # 4096-entry LZW tables (mcs >= 12 writes 2^mcs init entries)
        if w * h > _GIF_MAX_PIXELS:
            raise ValueError(f"GIF frame {w}x{h} exceeds pixel cap")
        mcs = data[pos]
        if not 2 <= mcs <= 11:
            raise ValueError(f"GIF LZW min code size {mcs} out of range 2..11")
        pos += 1
        stream, pos = _read_sub_blocks(data, pos)
        # hot path: the C LZW kernel (images/_native.py, equality-gated
        # vs the Python scan in tests); None → pure-Python reference
        from cinescrapers_spark.images._native import gif_lzw_decode

        raw = gif_lzw_decode(stream, mcs, w * h)
        if raw is None:
            raw = _lzw_decode(stream, mcs, w * h)
        idx = np.frombuffer(raw, np.uint8).reshape(h, w)
        if idx.max(initial=0) >= ct.shape[0]:
            raise ValueError("GIF index beyond color table")
        if iflags & 0x40:
            idx = _deinterlace(idx)
        frame = ct[idx]
        if (left, top, w, h) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        # the background color index refers to the GLOBAL color table
        bg_ct = gct if gct is not None else ct
        canvas = np.broadcast_to(
            bg_ct[min(bg_index, bg_ct.shape[0] - 1)], (sh, sw, 3)
        ).copy()
        canvas[top : top + h, left : left + w] = frame
        return canvas
    raise ValueError("GIF contains no image data")
