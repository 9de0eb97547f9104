"""GIF codec tests: exact closed-loop round-trips through every
encoder feature (palette sizes, interlace, local palettes,
transparency, animation with all disposal methods, LZW table
overflow + mid-stream CLEAR), LZW bitstream vectors checked against
hand-computed codes, an independently-hand-assembled container
decoded byte-for-byte, a reference numpy compositor for animations,
and the malformed-stream honesty contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_processing_spark.functions.gif import (
    _interlace_order,
    decode_gif,
    decode_gif_frames,
    lzw_decode,
    lzw_encode,
    make_gif,
)


def grid(w: int, h: int, seed: int, ncolors: int = 16) -> np.ndarray:
    """Deterministic RGB raster drawing from exactly <= ncolors
    distinct colors (GIF palettes hold 256)."""
    y, x = np.mgrid[0:h, 0:w]
    idx = (seed + 3 * x + 7 * y) % ncolors
    i = np.arange(ncolors)
    pal = np.stack(
        [(seed + 5 * i) % 256, (seed + 11 * i) % 256, (seed + 23 * i) % 256],
        axis=-1,
    ).astype(np.uint8)
    return pal[idx]


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_all_min_code_sizes():
    rng = np.random.default_rng(7)
    for mcs in range(2, 9):
        data = rng.integers(0, 1 << mcs, size=5000, dtype=np.uint8)
        enc = lzw_encode(data.tobytes(), mcs)
        dec = lzw_decode(enc, mcs, len(data))
        assert dec == data.tobytes()


def test_lzw_hand_computed_vector():
    """mcs=2: clear=4, eoi=5, width starts at 3. Encoding [0, 1]
    must emit exactly CLEAR(4), 0, 1, EOI(5) at width 3, packed
    LSB-first: 4 | 0<<3 | 1<<6 ... -> bytes 0x44, 0x0b."""
    enc = lzw_encode(bytes([0, 1]), 2)
    # codes: 100, 000, 001, 101 (LSB-first)
    acc = 4 | (0 << 3) | (1 << 6) | (5 << 9)
    expect = bytes([acc & 0xFF, (acc >> 8) & 0xFF])
    assert enc == expect
    assert lzw_decode(enc, 2, 2) == bytes([0, 1])


def test_lzw_kwkwk_case():
    """'aaaa...' forces the code == next_code (KwKwK) decoder path."""
    data = bytes([3] * 400)
    enc = lzw_encode(data, 2)
    assert lzw_decode(enc, 2, len(data)) == data


def test_lzw_table_overflow_emits_clear_and_recovers():
    """A long non-repeating stream of 256-value symbols drives the
    table past 4096 entries, forcing the encoder's mid-stream CLEAR;
    the decoder must resynchronize exactly."""
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
    enc = lzw_encode(data, 8)
    assert lzw_decode(enc, 8, len(data)) == data


def test_lzw_rejects_truncation_and_bad_first_code():
    enc = lzw_encode(bytes(range(16)) * 10, 4)
    with pytest.raises(ValueError):
        lzw_decode(enc[: len(enc) // 2], 4, 160)
    # first code after clear must be a literal: craft clear, then a
    # high code (width 5 after clear for mcs=4: clear=16)
    acc = 16 | (20 << 5)
    with pytest.raises(ValueError):
        lzw_decode(bytes([acc & 0xFF, acc >> 8]), 4, 4)


# ---------------------------------------------------------------------------
# static round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ncolors", [2, 4, 16, 250])
def test_static_roundtrip_palette_sizes(ncolors):
    img = grid(37, 23, seed=ncolors, ncolors=ncolors)
    out = decode_gif(make_gif(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_static_roundtrip_interlaced():
    img = grid(31, 29, seed=5, ncolors=64)
    blob = make_gif(img, interlace=True)
    assert (decode_gif(blob) == img).all()
    # interlacing actually reorders rows on the wire: the same image
    # written flat must differ in the image-data section
    assert blob != make_gif(img)


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 3, 7, 8, 29, 64):
        order = _interlace_order(h)
        assert sorted(order) == list(range(h))


def test_static_roundtrip_gif87a():
    img = grid(16, 16, seed=1, ncolors=8)
    blob = make_gif(img, version=b"GIF87a")
    assert blob[:6] == b"GIF87a"
    assert (decode_gif(blob) == img).all()


def test_roundtrip_256_color_noise():
    """Full 8-bit palette + noisy content: code width reaches 12 and
    the table fills inside a real image stream."""
    rng = np.random.default_rng(3)
    pal = np.stack(
        [np.arange(256), (np.arange(256) * 7) % 256,
         (np.arange(256) * 31) % 256], axis=-1,
    ).astype(np.uint8)
    img = pal[rng.integers(0, 256, size=(80, 90))]
    assert (decode_gif(make_gif(img)) == img).all()


# ---------------------------------------------------------------------------
# hand-assembled container (decoder pinned to the spec layout,
# independent of our encoder)
# ---------------------------------------------------------------------------


def test_decode_hand_assembled_stream():
    """2x2 image, 2-entry palette [black, white], pixels
    [[0, 1], [1, 0]], assembled field-by-field from the GIF89a spec
    (not via make_gif)."""
    lzw = lzw_encode(bytes([0, 1, 1, 0]), 2)
    blob = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 0x00, 0, 0)  # GCT, 2 entries
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # LZW min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(blob)
    expect = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    assert (out == expect).all()


def test_decoder_skips_comment_and_application_extensions():
    img = grid(8, 8, seed=2, ncolors=4)
    blob = bytearray(make_gif(img))
    # splice a comment extension right after the header+GCT
    hdr_end = 13 + 3 * 4  # screen descriptor + padded 4-entry GCT
    comment = b"\x21\xfe\x05hello\x00"
    spliced = bytes(blob[:hdr_end]) + comment + bytes(blob[hdr_end:])
    assert (decode_gif(spliced) == img).all()


# ---------------------------------------------------------------------------
# animation: compositing, disposal, transparency
# ---------------------------------------------------------------------------


def reference_composite(canvas_wh, frames, offsets, disposal,
                        transparent_color, bg_rgb):
    """Independent numpy re-statement of GIF compositing semantics."""
    cw, ch = canvas_wh
    canvas = np.tile(np.asarray(bg_rgb, np.uint8), (ch, cw, 1))
    out = []
    for i, frame in enumerate(frames):
        prev = canvas.copy()
        h, w = frame.shape[:2]
        left, top = offsets[i]
        rect = canvas[top : top + h, left : left + w]
        if transparent_color is not None:
            opaque = ~(frame == np.asarray(transparent_color)).all(axis=2)
            rect[opaque] = frame[opaque]
        else:
            rect[:] = frame
        out.append(canvas.copy())
        if disposal[i] == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal[i] == 3:
            canvas = prev
    return np.stack(out)


@pytest.mark.parametrize("disposal_mode", [0, 1, 2, 3])
def test_animation_compositing_each_disposal(disposal_mode):
    base = grid(20, 14, seed=9, ncolors=8)
    patches = [grid(6, 5, seed=30 + i, ncolors=8) for i in range(3)]
    frames = [base] + patches
    offsets = [(0, 0), (2, 3), (9, 6), (13, 1)]
    disposal = [0] + [disposal_mode] * 3
    blob = make_gif(
        frames,
        offsets=offsets,
        canvas=(20, 14),
        disposal=disposal,
        delays_cs=[4, 4, 4, 4],
    )
    delays, got = decode_gif_frames(blob)
    assert delays == [4, 4, 4, 4]
    # encoder palette entry 0 becomes the background color
    pal0 = np.frombuffer(blob[13:16], dtype=np.uint8)
    expect = reference_composite(
        (20, 14), frames, offsets, disposal, None, pal0
    )
    assert got.shape == expect.shape
    assert (got == expect).all()


def test_animation_transparency_preserves_canvas():
    trans = (1, 2, 3)
    base = grid(12, 10, seed=4, ncolors=6)
    overlay = base.copy()[:6, :6]
    overlay[...] = trans
    overlay[1:3, 1:4] = [200, 40, 90]
    blob = make_gif(
        [base, overlay],
        offsets=[(0, 0), (3, 2)],
        canvas=(12, 10),
        transparent_color=trans,
    )
    _d, got = decode_gif_frames(blob)
    # frame 2: only the opaque patch changed
    expect = base.copy()
    expect[2 + 1 : 2 + 3, 3 + 1 : 3 + 4] = [200, 40, 90]
    assert (got[1] == expect).all()
    # base frame itself untouched
    assert (got[0] == base).all()


def test_animation_local_palettes_and_loop():
    f1 = grid(10, 8, seed=1, ncolors=5)
    f2 = grid(10, 8, seed=77, ncolors=9)
    blob = make_gif([f1, f2], local_palettes=True, loop=3)
    assert b"NETSCAPE2.0" in blob
    _d, got = decode_gif_frames(blob)
    assert (got[0] == f1).all()
    assert (got[1] == f2).all()


def test_decode_gif_returns_first_frame():
    f1 = grid(9, 9, seed=2, ncolors=4)
    f2 = grid(9, 9, seed=8, ncolors=4)
    assert (decode_gif(make_gif([f1, f2])) == f1).all()


# ---------------------------------------------------------------------------
# honesty contract
# ---------------------------------------------------------------------------


def test_malformed_streams_raise_value_error():
    img = grid(8, 8, seed=3, ncolors=4)
    blob = make_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + blob[6:12])  # truncated header
    with pytest.raises(ValueError):
        decode_gif(blob[:-2])  # missing trailer
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + blob[6:])
    bad = bytearray(blob)
    bad[10] = 0xFF  # nonsense packed field => huge GCT claim
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_encoder_rejects_over_256_colors():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        make_gif(img)


def test_media_stats_routes_gif():
    from big_data_processing_spark.functions.multimodal import (
        decode_image_real,
    )

    img = grid(15, 11, seed=6, ncolors=12)
    out = decode_image_real(make_gif(img, interlace=True))
    assert (out == img).all()
