"""Numpy-only image codecs + magic-byte sniffing.

No PIL/cv2 in this environment (SURVEY §7.0), so the images table uses
three self-describing formats whose codecs are pure stdlib+numpy:

* ``ppm``  — binary P6 (real, interoperable, lossless);
* ``png``  — real PNG (8-bit truecolor, zlib DEFLATE + per-row filters;
  decoder handles all five filter types + RGBA, encoder emits Sub-filtered
  RGB) — a genuinely COMPRESSED interoperable format, so the compressed-
  codec path is exercised for real, not just via the error gate;
* ``qimg`` — our quantized lossy format (uniform step Q per channel), so the
  input_hint's "PSNR ≥ 40 dB for lossy" invariant is genuinely exercised:
  step Q=4 bounds per-pixel error to ≤2 → PSNR ≥ ~46 dB.

GIF, JPEG and WebP are REAL too: ``images/gif.py`` (LZW entropy coder
per the GIF89a spec, interlace + local-color-table decode, exact-palette
encode), ``images/jpeg.py`` (ITU-T T.81: baseline AND progressive SOF2,
Huffman entropy coder, batched 8×8 DCT, 4:4:4/4:2:0, restart intervals)
and ``images/webp.py`` (lossless VP8L: transforms, LZ77, color cache,
meta-Huffman; compressing encoder). Only lossy VP8 (RFC 6386 arithmetic
coder) remains an honest ``NotImplementedError`` gate.

Magic-byte sniffing clones the reference's validator semantics
(``/root/reference/src/cinescrapers/__main__.py:260-281``: JPEG/PNG/GIF/
WebP-inside-RIFF/ICO/BMP signatures) and adds our two formats.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QIMG_MAGIC = b"QIMG"
QIMG_STEP = 4


# --------------------------------------------------------------------------
# PPM (P6 binary)
# --------------------------------------------------------------------------
def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Fuzz-gated foreign-input boundary: ValueError on malformed."""
    try:
        return _decode_ppm_impl(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed PPM: {type(e).__name__}: {e}") from e


def _decode_ppm_impl(data: bytes) -> np.ndarray:
    assert data[:2] == b"P6", "not a P6 ppm"
    # header: three whitespace-separated tokens after magic, then one ws
    # byte. Every scan loop is bounds-checked — a truncated header
    # previously spun forever on the empty-slice sentinel (b"".isspace()
    # is False), caught by the decoder fuzz.
    pos = 2
    n = len(data)
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= n:
            raise ValueError("PPM: truncated header")
        if data[pos : pos + 1] == b"#":  # comment line
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    assert maxval == 255
    if w * h > 64_000_000:
        raise ValueError(f"PPM frame {w}x{h} exceeds pixel cap")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


# --------------------------------------------------------------------------
# QIMG (quantized lossy)
# layout: magic | u16 w | u16 h | u8 step | quantized bytes (v // step)
# --------------------------------------------------------------------------
def encode_qimg(arr: np.ndarray, step: int = QIMG_STEP) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    q = (arr.astype(np.uint16) // step).astype(np.uint8)
    return QIMG_MAGIC + struct.pack("<HHB", w, h, step) + q.tobytes()


def decode_qimg(data: bytes) -> np.ndarray:
    """Fuzz-gated foreign-input boundary: ValueError on malformed."""
    try:
        return _decode_qimg_impl(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed QIMG: {type(e).__name__}: {e}") from e


def _decode_qimg_impl(data: bytes) -> np.ndarray:
    assert data[:4] == QIMG_MAGIC, "not a qimg"
    w, h, step = struct.unpack_from("<HHB", data, 4)
    q = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=9)
    # dequantize to bin centre (min(step*q + step//2, 255)) — halves max error
    out = np.minimum(q.astype(np.uint16) * step + step // 2, 255).astype(np.uint8)
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# PNG (ISO/IEC 15948 — 8-bit truecolor subset, no interlace)
# --------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 → PNG bytes. Color type 2 (truecolor), bit depth 8,
    every scanline Sub-filtered (filter 1): the horizontal-gradient corpus
    compresses well under Sub and the filter is one vectorized np.diff."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    # Sub filter: first pixel verbatim, then per-channel left deltas mod 256
    deltas = np.empty_like(arr)
    deltas[:, 0, :] = arr[:, 0, :]
    deltas[:, 1:, :] = arr[:, 1:, :] - arr[:, :-1, :]  # uint8 wraps mod 256
    raw = np.concatenate(
        [np.full((h, 1), 1, dtype=np.uint8), deltas.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter_row(ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One scanline of RFC-2083 §6 reconstruction. cur/prev are uint8 rows
    (filtered current, reconstructed previous); returns reconstructed cur."""
    if ft == 0:  # None
        return cur
    if ft == 2:  # Up
        return cur + prev  # uint8 wraps mod 256
    if ft == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp] → cumsum per lane
        lanes = cur.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
    # Average/Paeth are strict per-element scans (each byte depends on the
    # reconstructed byte bpp to the left), so numpy cannot vectorize along
    # the row — SIMD decoders parallelize only across channels for the same
    # reason. This Python fallback runs as plain-list scans with local
    # variables (~3× the old per-element numpy indexing); the hot path is
    # the C kernel in _native.py (~100×), tried first by decode_png.
    n = cur.shape[0]
    c_l = cur.tolist()
    p_l = prev.tolist()
    out = [0] * n
    if ft == 3:  # Average
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (c_l[x] + ((left + p_l[x]) >> 1)) & 0xFF
        return np.array(out, dtype=np.uint8)
    if ft == 4:  # Paeth
        for x in range(n):
            if x >= bpp:
                a = out[x - bpp]
                c = p_l[x - bpp]
            else:
                a = 0
                c = 0
            b = p_l[x]
            p = a + b - c
            pa = p - a if p >= a else a - p
            pb = p - b if p >= b else b - p
            pc = p - c if p >= c else c - p
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            out[x] = (c_l[x] + pred) & 0xFF
        return np.array(out, dtype=np.uint8)
    raise ValueError(f"bad PNG filter type {ft}")


def decode_png(data: bytes) -> np.ndarray:
    """Fuzz-gated foreign-input boundary: ValueError on malformed."""
    try:
        return _decode_png_impl(data)
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"malformed PNG: {type(e).__name__}: {e}") from e


def _decode_png_impl(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Foreign-input contract (fuzz-gated):
    crafted bytes either decode or raise ValueError/NotImplementedError —
    zlib/struct/index errors never escape raw, inflation is bounded to
    the declared image size, and pixel count is capped.
    Supports bit depth 8, color types 2
    (RGB) and 6 (RGBA — alpha dropped), no interlace; verifies chunk CRCs
    and handles all five scanline filters (so PNGs from ANY encoder in this
    subset decode, not just ours)."""
    assert data[:8] == _PNG_SIG, "not a png"
    pos, idat, meta = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    assert meta is not None, "PNG missing IHDR"
    w, h, depth, ctype_n, comp, filt, interlace = meta
    if depth != 8 or ctype_n not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG subset: depth=8, color in (2,6), no interlace "
            f"(got depth={depth} color={ctype_n} interlace={interlace})"
        )
    bpp = 3 if ctype_n == 2 else 4
    if w * h > 64_000_000:
        raise ValueError(f"PNG frame {w}x{h} exceeds pixel cap")
    stride = w * bpp
    # bounded inflate: the filtered image is exactly h*(1+stride) bytes;
    # a crafted IDAT must not decompress past it (zlib bombs reach
    # ~1000:1, enough to OOM an executor from a small blob)
    need = h * (1 + stride)
    dec = zlib.decompressobj()
    raw_b = dec.decompress(b"".join(idat), need + 1)
    if len(raw_b) > need:
        raise ValueError("PNG: IDAT inflates beyond the image size")
    raw = np.frombuffer(raw_b, dtype=np.uint8)
    if raw.size != need:
        raise ValueError(
            f"PNG: IDAT inflates to {raw.size} B, expected {need}"
        )
    raw = raw.reshape(h, 1 + stride)
    # fast path: the whole-image C unfilter kernel (compiled lazily, see
    # _native.py); None → pure-Python per-row reconstruction, same bytes
    from cinescrapers_spark.images._native import png_unfilter_image

    out = png_unfilter_image(raw, h, stride, bpp)
    if out is None:
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            prev = _png_unfilter_row(int(raw[y, 0]), raw[y, 1:].copy(), prev, bpp)
            out[y] = prev
    img = out.reshape(h, w, bpp)
    return np.ascontiguousarray(img[:, :, :3])


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Format-dispatched encode — the single place the writable set lives."""
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qimg":
        return encode_qimg(arr)
    if fmt == "gif":
        from cinescrapers_spark.images.gif import encode_gif

        return encode_gif(arr)
    if fmt == "jpeg":
        from cinescrapers_spark.images.jpeg import encode_jpeg

        return encode_jpeg(arr)
    if fmt == "jpeg_prog":
        from cinescrapers_spark.images.jpeg import encode_jpeg_progressive

        return encode_jpeg_progressive(arr)
    if fmt == "webp":
        from cinescrapers_spark.images.webp import encode_webp

        return encode_webp(arr)
    raise NotImplementedError(f"no encoder for fmt={fmt!r} in sandbox")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    kind = fmt or sniff_format(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "png":
        return decode_png(data)
    if kind == "qimg":
        return decode_qimg(data)
    if kind == "gif":
        from cinescrapers_spark.images.gif import decode_gif

        return decode_gif(data)
    if kind in ("jpeg", "jpeg_prog"):  # one decoder: it reads the SOF marker
        from cinescrapers_spark.images.jpeg import decode_jpeg

        return decode_jpeg(data)
    if kind == "webp":
        from cinescrapers_spark.images.webp import decode_webp

        return decode_webp(data)
    raise NotImplementedError(
        f"decoder for {kind!r} needs an image library not present in this "
        "environment; the Spark plumbing (schema/batching) is format-agnostic"
    )


# --------------------------------------------------------------------------
# magic-byte sniffing (ref __main__.py:260-281 + our formats)
# --------------------------------------------------------------------------
_SIGNATURES = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"\x00\x00\x01\x00", "ico"),
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (QIMG_MAGIC, "qimg"),
]


def sniff_format(data: bytes) -> str | None:
    """First-match signature sniff; RIFF needs the WEBP tag at offset 8
    (the reference's special case)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    for sig, name in _SIGNATURES:
        if data[: len(sig)] == sig:
            return name
    return None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
