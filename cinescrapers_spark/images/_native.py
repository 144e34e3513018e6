"""Optional C fast path for the two sequentially-dependent decode scans
(VERDICT r3 #5: per-element Python on FOREIGN-input decode paths — PNG
Average/Paeth unfiltering and IMA ADPCM — would crawl at harvest scale).

Both recurrences are strict per-element scans (each output depends on the
previous reconstructed element), so numpy cannot vectorize them along the
scan axis — SIMD PNG decoders parallelize only across channels for the
same reason. The honest fast path is a ~60-line C kernel: compiled lazily
with the system ``cc`` into a per-process temp dir and loaded via ctypes,
it decodes ~100× faster than the Python loop. EVERYTHING degrades
gracefully: no compiler, a failed compile, or ``CINESCRAPERS_NO_NATIVE=1``
falls back to the pure-Python implementations in ``codecs.py`` /
``multimodal.py``, which remain the reference semantics (equality gated in
``tests/test_images.py``). No third-party packages involved.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <string.h>

static int iabs(int v) { return v < 0 ? -v : v; }

/* RFC 2083 section 6 scanline reconstruction, whole image in one call.
   raw: h rows of (1 + stride) bytes (leading filter-type byte).
   Returns 0, or 1 + index of the first row with a bad filter type. */
long png_unfilter(const unsigned char *raw, long h, long stride, int bpp,
                  unsigned char *out) {
    const unsigned char *prev = 0;
    for (long y = 0; y < h; y++) {
        const unsigned char *row = raw + y * (stride + 1);
        const unsigned char *cur = row + 1;
        unsigned char *o = out + y * stride;
        long x;
        switch (row[0]) {
        case 0:
            memcpy(o, cur, (size_t)stride);
            break;
        case 1: /* Sub */
            for (x = 0; x < stride; x++)
                o[x] = (unsigned char)(cur[x] + (x >= bpp ? o[x - bpp] : 0));
            break;
        case 2: /* Up */
            for (x = 0; x < stride; x++)
                o[x] = (unsigned char)(cur[x] + (prev ? prev[x] : 0));
            break;
        case 3: /* Average */
            for (x = 0; x < stride; x++) {
                int a = x >= bpp ? o[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                o[x] = (unsigned char)(cur[x] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (x = 0; x < stride; x++) {
                int a = x >= bpp ? o[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                int p = a + b - c;
                int pa = iabs(p - a), pb = iabs(p - b), pc = iabs(p - c);
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                o[x] = (unsigned char)(cur[x] + pred);
            }
            break;
        default:
            return y + 1;
        }
        prev = o;
    }
    return 0;
}

/* IMA/DVI ADPCM nibble-stream decode (1992 IMA spec / RFC 3551 DVI4
   tables), mirroring multimodal.decode_adpcm exactly. */
static const int IMA_INDEX[16] = {-1, -1, -1, -1, 2, 4, 6, 8,
                                  -1, -1, -1, -1, 2, 4, 6, 8};
static const int IMA_STEP[89] = {
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767};

void adpcm_decode(const unsigned char *body, long n, int pred, int idx,
                  short *out) {
    for (long i = 0; i < n; i++) {
        int byte = body[i >> 1];
        int code = (i & 1) ? (byte & 0xF) : (byte >> 4);
        int step = IMA_STEP[idx];
        int diff = step >> 3;
        if (code & 4) diff += step;
        if (code & 2) diff += step >> 1;
        if (code & 1) diff += step >> 2;
        pred += (code & 8) ? -diff : diff;
        if (pred > 32767) pred = 32767;
        if (pred < -32768) pred = -32768;
        idx += IMA_INDEX[code];
        if (idx < 0) idx = 0;
        if (idx > 88) idx = 88;
        out[i] = (short)pred;
    }
}
"""

_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    workdir = tempfile.mkdtemp(prefix="cinescrapers-native-")
    src = os.path.join(workdir, "kernels.c")
    so = os.path.join(workdir, "kernels.so")
    with open(src, "w") as fh:
        fh.write(_C_SRC)
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=60,
        )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        shutil.rmtree(workdir, ignore_errors=True)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.png_unfilter.restype = ctypes.c_long
    lib.png_unfilter.argtypes = [
        u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int, u8p,
    ]
    lib.adpcm_decode.restype = None
    lib.adpcm_decode.argtypes = [
        u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
    ]
    return lib


def native_lib() -> ctypes.CDLL | None:
    """The compiled kernel library, or None (no compiler / disabled) —
    compiled at most once per process; executor Python workers are reused
    so the ~100 ms compile amortizes across every image in the partition."""
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("CINESCRAPERS_NO_NATIVE") != "1":
            _lib = _build()
    return _lib


def png_unfilter_image(raw: np.ndarray, h: int, stride: int, bpp: int):
    """raw (h, 1+stride) uint8 → reconstructed (h, stride) uint8, or None
    when the native path is unavailable (caller falls back to Python)."""
    lib = native_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    rc = lib.png_unfilter(raw.reshape(-1), h, stride, bpp, out.reshape(-1))
    if rc:
        raise ValueError(f"bad PNG filter type in row {rc - 1}")
    return out


def adpcm_decode(body: bytes, n: int, pred0: int, idx0: int):
    """ADPCM nibble body → int16[n], or None when unavailable."""
    lib = native_lib()
    if lib is None:
        return None
    buf = np.frombuffer(body, dtype=np.uint8)
    out = np.empty(n, dtype=np.int16)
    lib.adpcm_decode(np.ascontiguousarray(buf), n, pred0, idx0, out)
    return out
