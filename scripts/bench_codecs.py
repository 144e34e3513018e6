"""Micro-bench for the foreign-input decode paths (VERDICT r3 #5 recorded
before/after): decodes a Paeth-filtered PNG and an ADPCM clip through
(a) the round-3 per-element numpy loops (reconstructed here verbatim),
(b) the optimized pure-Python list scans (the round-4 fallback), and
(c) the lazily-compiled C kernels (the round-4 hot path).
Prints one JSON line; recorded under bench_runs/round4/.
Run: python scripts/bench_codecs.py"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cinescrapers_spark.images._native import native_lib, png_unfilter_image  # noqa: E402
from cinescrapers_spark.images.codecs import _png_unfilter_row  # noqa: E402
from cinescrapers_spark.images.multimodal import (  # noqa: E402
    _IMA_INDEX,
    _IMA_STEP,
    _decode_adpcm_py,
    _ima_reconstruct,
    encode_adpcm,
)
from cinescrapers_spark.images._native import adpcm_decode as native_adpcm  # noqa: E402


def r3_unfilter_row(ft, cur, prev, bpp):
    """The round-3 implementation, verbatim (per-element numpy indexing)."""
    if ft == 0:
        return cur
    if ft == 2:
        return cur + prev
    if ft == 1:
        lanes = cur.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
    out = np.zeros_like(cur)
    n = cur.shape[0]
    if ft == 3:
        for x in range(n):
            left = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        return out
    if ft == 4:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (int(cur[x]) + pred) & 0xFF
        return out
    raise ValueError(ft)


def r3_adpcm(body, n, pred, idx):
    out = np.empty(n, dtype=np.int16)
    for i in range(n):
        byte = body[i >> 1]
        code = (byte >> 4) if i % 2 == 0 else (byte & 0xF)
        step = _IMA_STEP[idx]
        pred = max(-32768, min(32767, pred + _ima_reconstruct(step, code)))
        idx = max(0, min(88, idx + _IMA_INDEX[code]))
        out[i] = pred
    return out


def via_rows(unfilter_row, raw, h, stride, bpp):
    prev = np.zeros(stride, dtype=np.uint8)
    rows = []
    for y in range(h):
        prev = unfilter_row(int(raw[y, 0]), raw[y, 1:].copy(), prev, bpp)
        rows.append(prev)
    return np.stack(rows)


def bench(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    rng = np.random.default_rng(7)
    h, w, bpp = 256, 512, 3
    stride = w * bpp
    raw = rng.integers(0, 256, (h, 1 + stride), dtype=np.uint8)
    raw[:, 0] = 4  # every row Paeth — the worst foreign-input case

    t_r3, want = bench(lambda: via_rows(r3_unfilter_row, raw, h, stride, bpp), 2)
    t_py, got_py = bench(lambda: via_rows(_png_unfilter_row, raw, h, stride, bpp), 3)
    assert np.array_equal(want, got_py)
    res = {
        "fixture": f"{h}x{w} rgb, all rows Paeth, random filtered bytes",
        "png_r3_numpy_loop_sec": round(t_r3, 4),
        "png_py_scan_sec": round(t_py, 4),
        "png_py_speedup": round(t_r3 / t_py, 2),
    }
    if native_lib() is not None:
        t_c, got_c = bench(lambda: png_unfilter_image(raw, h, stride, bpp), 10)
        assert np.array_equal(want, got_c)
        res["png_c_kernel_sec"] = round(t_c, 5)
        res["png_c_speedup"] = round(t_r3 / t_c, 1)

    sr = 16000
    pcm = (np.sin(np.arange(sr) / 10.0) * 12000 + rng.integers(-500, 500, sr)).astype(
        np.int16
    )
    blob = encode_adpcm(pcm)
    body, n = blob[11:], sr
    import struct

    pred0, idx0, _ = struct.unpack_from("<hBI", blob, 4)
    t_r3a, want_a = bench(lambda: r3_adpcm(body, n, pred0, idx0), 2)
    t_pya, got_a = bench(lambda: _decode_adpcm_py(body, n, pred0, idx0), 3)
    assert np.array_equal(want_a, got_a)
    res.update(
        {
            "adpcm_fixture": "1 s @16 kHz sine+noise",
            "adpcm_r3_loop_sec": round(t_r3a, 4),
            "adpcm_py_scan_sec": round(t_pya, 4),
        }
    )
    if native_lib() is not None:
        t_ca, got_ca = bench(lambda: native_adpcm(body, n, pred0, idx0), 10)
        assert np.array_equal(want_a, got_ca)
        res["adpcm_c_kernel_sec"] = round(t_ca, 5)
        res["adpcm_c_speedup"] = round(t_r3a / t_ca, 1)

    # --- round-4 entropy decoders: GIF LZW + baseline JPEG scan --------
    from cinescrapers_spark.images import jpeg as jpeg_mod
    from cinescrapers_spark.images._native import gif_lzw_decode as native_lzw
    from cinescrapers_spark.images.gif import (
        _lzw_decode,
        decode_gif,
        encode_gif,
    )
    from cinescrapers_spark.images.jpeg import decode_jpeg, encode_jpeg

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    gimg = pal[rng.integers(0, 16, (256, 512))]
    gblob = encode_gif(gimg)
    # isolate the LZW stage (container parse is trivial)
    from cinescrapers_spark.images.gif import _read_sub_blocks

    # image descriptor offset: header(6) + LSD(7) + global color table
    pos = 13 + 3 * (2 << (gblob[10] & 0x07))
    assert gblob[pos] == 0x2C
    mcs = gblob[pos + 10]
    stream, _ = _read_sub_blocks(gblob, pos + 11)
    npx = 256 * 512
    t_lzw_py, want_g = bench(lambda: _lzw_decode(stream, mcs, npx), 3)
    res.update(
        {
            "gif_fixture": "256x512, 16-color noise (dictionary saturates)",
            "gif_lzw_py_sec": round(t_lzw_py, 4),
            "gif_stream_bytes": len(stream),
        }
    )
    if native_lib() is not None:
        t_lzw_c, got_g = bench(lambda: native_lzw(stream, mcs, npx), 10)
        assert got_g == want_g
        res["gif_lzw_c_sec"] = round(t_lzw_c, 5)
        res["gif_lzw_c_speedup"] = round(t_lzw_py / t_lzw_c, 1)
        t_gif_full, _ = bench(lambda: decode_gif(gblob), 5)
        res["gif_decode_c_images_per_sec_1core"] = round(1.0 / t_gif_full, 1)

    yy, xx = np.mgrid[0:256, 0:512]
    jimg = np.clip(
        np.stack([xx * 255 / 512, yy * 255 / 256, (xx + yy) * 255 / 768], axis=-1)
        + rng.integers(-15, 15, (256, 512, 3)),
        0,
        255,
    ).astype(np.uint8)
    jblob = encode_jpeg(jimg, 85)
    real_native = jpeg_mod._native_scan

    def decode_py():
        jpeg_mod._native_scan = lambda *a, **k: None
        try:
            return decode_jpeg(jblob)
        finally:
            jpeg_mod._native_scan = real_native

    t_j_py, want_j = bench(decode_py, 2)
    res.update(
        {
            "jpeg_fixture": "256x512 q85 4:4:4, gradient+noise",
            "jpeg_bytes": len(jblob),
            "jpeg_scan_py_sec": round(t_j_py, 4),
        }
    )
    if native_lib() is not None:
        t_j_c, got_j = bench(lambda: decode_jpeg(jblob), 5)
        assert np.array_equal(want_j, got_j)
        res["jpeg_decode_c_sec"] = round(t_j_c, 5)
        res["jpeg_scan_c_speedup"] = round(t_j_py / t_j_c, 1)
        res["jpeg_decode_c_images_per_sec_1core"] = round(1.0 / t_j_c, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
