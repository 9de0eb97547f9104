"""Lossy WebP (VP8 keyframe) codec tests.

Two validation axes, mirroring tests/test_webp.py's VP8L strategy:

- cross-validation against the SYSTEM libwebp where present (the
  authoritative implementation): libwebp-ENCODED streams across
  sizes / content classes / qualities must decode to byte-identical
  Y/U/V planes, and OUR encoder's streams must decode identically
  under libwebp — pinning both directions of the codec. Skipped
  gracefully where libwebp is absent.
- library-free closed loop (always runs): decode(encode(x)) equals
  the encoder's own reconstruction exactly, across quantizer and
  loop-filter settings — the property the registered
  image_features_webp_lossy query is hash-checked with.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from big_data_processing_spark.functions.vp8 import (
    _rgb_to_yuv420,
    decode_vp8,
    encode_vp8,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.7.dylib", "webp"):
        try:
            if name.startswith("lib"):
                return ctypes.CDLL(name)
            path = ctypes.util.find_library(name)
            if path:
                return ctypes.CDLL(path)
        except OSError:
            continue
    return None


_LIBWEBP = _load_libwebp()
if _LIBWEBP is not None:
    _LIBWEBP.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIBWEBP.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIBWEBP.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIBWEBP.WebPDecodeYUV.argtypes = (
        [ctypes.c_char_p, ctypes.c_size_t]
        + [ctypes.POINTER(ctypes.c_int)] * 2
        + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
        + [ctypes.POINTER(ctypes.c_int)] * 2
    )


def _vp8_chunk(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _libwebp_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    s, us = ctypes.c_int(), ctypes.c_int()
    y = _LIBWEBP.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(s),
        ctypes.byref(us),
    )
    if not y:
        return None
    W, H, S, US = w.value, h.value, s.value, us.value
    ch, cw = (H + 1) // 2, (W + 1) // 2
    return (
        np.ctypeslib.as_array(y, shape=(H, S))[:, :W].copy(),
        np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy(),
        np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy(),
    )


def _test_images():
    rng = np.random.RandomState(3)
    out = []
    for w, h, kind in (
        (16, 16, "grad"), (32, 32, "grad"), (48, 40, "grad"),
        (37, 23, "grad"), (64, 16, "noise"), (80, 48, "noise"),
        (64, 32, "stripes"), (128, 96, "stripes"),
    ):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        if kind == "grad":
            img = np.stack(
                [(xx * 3 + yy * 5) % 256, (xx * 7) % 256,
                 (yy * 9) % 256], -1
            ).astype(np.uint8)
            img[h // 4 : h // 2, w // 4 : w // 2] = [255, 0, 0]
        elif kind == "noise":
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        else:
            img = np.full((h, w, 3), 128, np.uint8)
            img[: h // 2] = [40, 200, 90]
            img[::3] = [200, 30, 250]
        out.append(img)
    return out


@pytest.mark.skipif(_LIBWEBP is None, reason="system libwebp absent")
def test_decoder_matches_libwebp_on_its_own_streams():
    """Every libwebp-encoded lossy stream (segmentation, prob
    updates, B_PRED, Y2, loop filter, odd dims) must decode to
    byte-identical YUV planes. Exercises the bmode-tree numbering,
    the 127/129 border conventions and the deblocking filter — each
    of which produced real divergences during bring-up."""
    for img in _test_images():
        for q in (30.0, 75.0, 92.0):
            h, w, _ = img.shape
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = _LIBWEBP.WebPEncodeRGB(
                img.tobytes(), w, h, w * 3, q, ctypes.byref(out)
            )
            assert n > 0
            data = bytes(
                bytearray(
                    ctypes.cast(
                        out, ctypes.POINTER(ctypes.c_uint8 * n)
                    ).contents
                )
            )
            ref = _libwebp_yuv(data)
            got = decode_vp8(_vp8_chunk(data))
            for a, b in zip(ref, got):
                assert a.shape == b.shape and (a == b).all(), (
                    w, h, q,
                )


@pytest.mark.skipif(_LIBWEBP is None, reason="system libwebp absent")
def test_libwebp_decodes_our_encoder_streams():
    """Our keyframe encoder must produce spec-compliant streams:
    libwebp decodes them to exactly the reconstruction our encoder
    reports (which the closed-loop test pins to our own decoder)."""
    for img in _test_images()[:5]:
        y, u, v = _rgb_to_yuv420(img)
        for q, fl in ((20, 0), (45, 24), (85, 63)):
            data, recon = encode_vp8(y, u, v, q_index=q, filter_level=fl)
            ref = _libwebp_yuv(data)
            assert ref is not None, "libwebp rejected our stream"
            for a, b in zip(ref, recon):
                assert a.shape == b.shape and (a == b).all(), (q, fl)


def test_closed_loop_decode_equals_encoder_recon():
    """Library-free: decode(encode(x)) == the encoder's own
    reconstruction, exactly, across quantizers and filter levels —
    the invariant the registered query's oracle is built on."""
    for img in _test_images()[:4]:
        y, u, v = _rgb_to_yuv420(img)
        for q, fl in ((10, 0), (40, 20), (100, 63)):
            data, recon = encode_vp8(y, u, v, q_index=q, filter_level=fl)
            got = decode_vp8(_vp8_chunk(data))
            for a, b in zip(got, recon):
                assert a.shape == b.shape and (a == b).all(), (q, fl)


def test_decode_webp_dispatches_lossy_vp8_to_rgb():
    """The container-level entry point must route VP8 chunks
    through the new decoder and return an RGB raster (the
    multimodal decode_media_stats path the registered query
    uses)."""
    from big_data_processing_spark.functions.webp import decode_webp

    img = _test_images()[2]
    y, u, v = _rgb_to_yuv420(img)
    data, recon = encode_vp8(y, u, v, q_index=40, filter_level=12)
    rgb = decode_webp(data)
    assert rgb.shape == img.shape
    # lossy but sane: within a coarse distance of the source
    err = np.abs(rgb.astype(int) - img.astype(int)).mean()
    assert err < 40, err


def test_vp8_tables_regenerate_identically():
    """The frozen constant tables must match a fresh extraction from
    the system library (when present) — guards against accidental
    edits to _vp8_tables.py."""
    import os
    import subprocess
    import sys

    if not os.path.exists("/lib/x86_64-linux-gnu/libwebp.so.7"):
        pytest.skip("extraction source library absent")
    before = open(
        "big_data_processing_spark/functions/_vp8_tables.py"
    ).read()
    r = subprocess.run(
        [sys.executable, "tools/extract_vp8_tables.py"],
        capture_output=True, text=True,
    )
    after = open(
        "big_data_processing_spark/functions/_vp8_tables.py"
    ).read()
    assert r.returncode == 0, r.stderr
    assert after == before
