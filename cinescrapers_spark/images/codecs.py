"""Numpy-only image codecs + magic-byte sniffing.

No PIL/cv2 in this environment (SURVEY §7.0), so the images table uses two
self-describing formats whose codecs are pure numpy:

* ``ppm``  — binary P6 (real, interoperable, lossless);
* ``qimg`` — our quantized lossy format (uniform step Q per channel), so the
  input_hint's "PSNR ≥ 40 dB for lossy" invariant is genuinely exercised:
  step Q=4 bounds per-pixel error to ≤2 → PSNR ≥ ~46 dB.

Magic-byte sniffing clones the reference's validator semantics
(``/root/reference/src/cinescrapers/__main__.py:260-281``: JPEG/PNG/GIF/
WebP-inside-RIFF/ICO/BMP signatures) and adds our two formats.
"""

from __future__ import annotations

import struct

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
    assert data[:2] == b"P6", "not a P6 ppm"
    # header: three whitespace-separated tokens after magic, then one ws byte
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            while data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    assert maxval == 255
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
    assert data[:4] == QIMG_MAGIC, "not a qimg"
    w, h, step = struct.unpack_from("<HHB", data, 4)
    q = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=9)
    # dequantize to bin centre (min(step*q + step//2, 255)) — halves max error
    out = np.minimum(q.astype(np.uint16) * step + step // 2, 255).astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    kind = fmt or sniff_format(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "qimg":
        return decode_qimg(data)
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
