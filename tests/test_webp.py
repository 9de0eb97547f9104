"""WebP-lossless (VP8L) codec tests: exact round-trips through every
encoder feature combination, cross-validation of our pure-Python
streams against the SYSTEM libwebp (the authoritative decoder —
skipped where the shared library is absent), per-entry verification
of the 120-entry 2D distance map, and the malformed/unsupported
honesty contract."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from big_data_processing_spark.functions.webp import (
    _DISTANCE_MAP,
    _Vp8lBitWriter,
    _emit_prefix_code,
    _huff_lengths,
    _lz77_prefix_encode,
    _plane_code_to_distance,
    decode_webp,
    make_webp_lossless,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.7.dylib", "webp"):
        try:
            path = name if "." in name else ctypes.util.find_library(name)
            if not path:
                continue
            lib = ctypes.CDLL(path)
            lib.WebPDecodeRGBA.restype = ctypes.c_void_p
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
        except OSError:
            continue
    return None


_LIBWEBP = _load_libwebp()


def _libwebp_decode(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIBWEBP.WebPDecodeRGBA(
        data, len(data), ctypes.byref(w), ctypes.byref(h)
    )
    if not p:
        return None
    buf = ctypes.cast(
        p, ctypes.POINTER(ctypes.c_uint8 * (w.value * h.value * 4))
    ).contents
    arr = (
        np.frombuffer(bytes(buf), dtype=np.uint8)
        .reshape(h.value, w.value, 4)
        .copy()
    )
    _LIBWEBP.WebPFree(p)
    return arr


VARIANTS = [
    dict(),
    dict(cache_bits=4),
    dict(use_lz77=True),
    dict(use_lz77=True, cache_bits=6),
    dict(subtract_green=True),
    dict(predictor=True),  # all 14 modes via (bx+by) % 14 blocks
    dict(subtract_green=True, predictor=True, use_lz77=True,
         cache_bits=5),
    dict(color_transform=True),
    dict(subtract_green=True, predictor=True, color_transform=True),
    dict(meta_bits=2),  # two meta prefix-code groups
    dict(meta_bits=3, use_lz77=True, cache_bits=4),
]


def _texture(w=24, h=16, seed=3):
    from big_data_processing_spark.functions.multimodal import (
        texture_raster,
    )

    return texture_raster(w, h, seed)


def test_roundtrip_all_variants():
    t = _texture()
    for kw in VARIANTS:
        out = decode_webp(make_webp_lossless(t, **kw))
        assert out.shape == t.shape and (out == t).all(), kw


def test_roundtrip_palette_and_bundling():
    for ncol in (2, 4, 12, 40):  # 1/2/4/8-bit index packing
        idx = (np.arange(16 * 20) * 7) % ncol
        pal = np.stack(
            [(np.arange(ncol) * 53) % 256,
             (np.arange(ncol) * 97) % 256,
             (np.arange(ncol) * 31) % 256],
            axis=-1,
        ).astype(np.uint8)
        img = pal[idx].reshape(16, 20, 3)
        out = decode_webp(make_webp_lossless(img, palette=True))
        assert (out == img).all(), ncol


def test_roundtrip_alpha():
    t = _texture().copy()
    rgba = np.dstack([t, ((np.arange(16)[:, None] * 16 + 7) % 256
                          * np.ones((1, 24))).astype(np.uint8)])
    out = decode_webp(make_webp_lossless(rgba, use_lz77=True))
    assert out.shape == (16, 24, 4)
    assert (out == rgba).all()


def test_odd_sizes_and_single_pixel():
    for w, h in ((1, 1), (3, 1), (1, 5), (7, 3), (33, 9)):
        img = (
            (np.arange(w * h * 3) * 11 + 5) % 256
        ).astype(np.uint8).reshape(h, w, 3)
        for kw in (dict(), dict(predictor=True, use_lz77=True)):
            out = decode_webp(make_webp_lossless(img, **kw))
            assert (out == img).all(), (w, h, kw)


def test_vp8x_container_and_errors():
    import struct

    t = _texture()
    data = make_webp_lossless(t)
    # re-wrap the VP8L chunk inside a VP8X extended container
    vp8l = data[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    body = b"WEBP" + vp8x + vp8l
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    assert (decode_webp(wrapped) == t).all()

    with pytest.raises(ValueError):
        decode_webp(b"nonsense")
    with pytest.raises(ValueError):  # container with no image chunk
        decode_webp(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8)
    with pytest.raises(ValueError):  # truncated lossy VP8 payload
        # (lossy VP8 now has a REAL decoder — functions/vp8.py — so a
        # malformed chunk is a ValueError, not a codec gap)
        decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
        )
    with pytest.raises(ValueError):  # bad VP8L signature byte
        decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8L\x04\x00\x00\x00\x30\x00\x00\x00"
        )


@pytest.mark.skipif(_LIBWEBP is None, reason="system libwebp absent")
def test_streams_decode_identically_under_libwebp():
    """Authoritative cross-check: every feature combination our
    encoder can emit decodes to the SAME pixels under the system
    libwebp — machine-verifying the predictor formulas, cross-color
    element layout, canonical code order, meta grouping and cache
    hashing against the reference implementation."""
    t = _texture()
    for kw in VARIANTS:
        out = _libwebp_decode(make_webp_lossless(t, **kw))
        assert out is not None, f"libwebp rejected {kw}"
        assert (out[:, :, :3] == t).all() and (out[:, :, 3] == 255).all()
    for ncol in (2, 4, 12, 40):
        idx = (np.arange(16 * 20) * 7) % ncol
        pal = np.stack(
            [(np.arange(ncol) * 53) % 256,
             (np.arange(ncol) * 97) % 256,
             (np.arange(ncol) * 31) % 256],
            axis=-1,
        ).astype(np.uint8)
        img = pal[idx].reshape(16, 20, 3)
        out = _libwebp_decode(make_webp_lossless(img, palette=True))
        assert out is not None and (out[:, :, :3] == img).all()


def _craft_distance_stream(code: int, w: int = 16, h: int = 10) -> bytes:
    """Minimal VP8L stream whose pixel at (0, 9) is a length-1
    backward reference with distance PREFIX value `code` — decoding
    it reveals which source pixel the 2D map selects."""
    import struct

    n = w * h
    p0 = (h - 1) * w  # first pixel of the last row
    bwr = _Vp8lBitWriter()
    bwr.write_bits(0x2F, 8)
    bwr.write_bits(w - 1, 14)
    bwr.write_bits(h - 1, 14)
    bwr.write_bits(0, 1)
    bwr.write_bits(0, 3)
    bwr.write_bits(0, 1)  # no transforms
    bwr.write_bits(0, 1)  # no color cache
    bwr.write_bits(0, 1)  # no meta prefix codes

    # green: literals 0..p0-1 + the two length codes; red/blue/alpha
    # constant; distance: the probe code + distance-1 for the tail
    tail_lcode = _lz77_prefix_encode(w - 1)[0]
    green_freq = {i: 1 for i in range(p0)}
    green_freq[256] = 1  # probe copy: length 1 -> code 0
    green_freq[256 + tail_lcode] = (
        green_freq.get(256 + tail_lcode, 0) + 1
    )
    writers = []
    dcode, dnb, dx = _lz77_prefix_encode(code)
    for freq, alphabet in (
        (green_freq, 256 + 24),
        ({7: 1}, 256),
        ({9: 1}, 256),
        ({255: 1}, 256),
        ({dcode: 1, _lz77_prefix_encode(1)[0]: 1}, 40),
    ):
        writers.append(
            _emit_prefix_code(bwr, _huff_lengths(freq, 15), alphabet)
        )
    gw, rw, bw_, aw, dw = writers

    for i in range(p0):  # unique literals fill rows 0..h-2
        gw.write(bwr, i)
        rw.write(bwr, 7)
        bw_.write(bwr, 9)
        aw.write(bwr, 255)
    # probe: length-1 copy at distance code `code`
    gw.write(bwr, 256)  # length prefix code 0 -> length 1
    dw.write(bwr, dcode)
    if dnb:
        bwr.write_bits(dx, dnb)
    # tail: length-(w-1) copy at distance 1 fills the rest of the row
    lcode, lnb, lx = _lz77_prefix_encode(w - 1)
    gw.write(bwr, 256 + lcode)
    if lnb:
        bwr.write_bits(lx, lnb)
    d1code, d1nb, d1x = _lz77_prefix_encode(1)
    dw.write(bwr, d1code)
    if d1nb:
        bwr.write_bits(d1x, d1nb)

    payload = bwr.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_distance_map_self_consistent():
    """Our decoder resolves every crafted probe stream to the pixel
    the table predicts (and premap > 120 to literal distances)."""
    w, h = 16, 10
    p0 = (h - 1) * w
    for code in list(range(1, 121)) + [121, 130, 120 + w]:
        stream = _craft_distance_stream(code)
        out = decode_webp(stream)
        assert out.shape == (h, w, 3)
        got_green = int(out[h - 1, 0, 1])
        dist = _plane_code_to_distance(w, code)
        assert dist <= p0
        expect_green = (
            int(out[(p0 - dist) // w, (p0 - dist) % w, 1])
        )
        assert got_green == expect_green, code


@pytest.mark.skipif(_LIBWEBP is None, reason="system libwebp absent")
def test_distance_map_matches_libwebp():
    """Entry-by-entry verification of _DISTANCE_MAP against the
    authoritative libwebp: each probe stream's copied pixel must be
    the same under both decoders, for all 120 mapped codes and a
    few literal (premap > 120) codes."""
    assert len(_DISTANCE_MAP) == 120
    for code in list(range(1, 121)) + [121, 136]:
        stream = _craft_distance_stream(code)
        ours = decode_webp(stream)
        ref = _libwebp_decode(stream)
        assert ref is not None, f"libwebp rejected probe {code}"
        assert (ref[:, :, :3] == ours).all(), f"code {code} diverges"
