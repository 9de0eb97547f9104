"""Pure stdlib+numpy GIF codec (GIF87a/GIF89a): decoder and a
closed-loop encoder.

GIF is, with JPEG/PNG/WebP, one of the four image containers that
dominate web-crawl corpora — a 100 TB multimodal pipeline sees it
constantly (and it is the only one of the four that carries cheap
animation). Reference parity note: the reference system
(Nihar-SANTOKI/big-data-processing) has no media handling at all;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 "multimodal"), same contract as functions/webp.py and
the JPEG/PNG decoders in functions/multimodal.py: decode REAL bytes
executor-side with no codec library, never shuffle media, and keep
every step deterministic so a DuckDB oracle can pin exact values.

Decoder coverage (everything a real static/animated GIF needs):
 - header + logical screen descriptor, global color table
 - image descriptors with LOCAL color tables and frame offsets
 - variable-width LSB-first LZW with CLEAR / EOI handling, code
   width growth to 12 bits, deferred-clear streams (table full and
   the encoder just keeps emitting 12-bit codes), and the
   first-code-after-clear corner
 - 4-pass GIF interlacing
 - GIF89a extensions: Graphic Control (transparency index, frame
   delay, disposal methods 0-3), Application (NETSCAPE loop),
   Comment and Plain Text blocks (skipped per spec)
 - full animation COMPOSITING: frames are placed on the logical
   canvas honoring per-frame transparency, then disposal
   none/keep (0/1), restore-to-background (2) and
   restore-to-previous (3) between frames

Encoder coverage (the fixture/closed-loop side): single- or
multi-frame, global or per-frame local palettes, optional
interlacing, optional transparency, per-frame delay + disposal,
NETSCAPE loop extension, LZW with mid-stream CLEAR when the code
table fills. ``decode_gif_frames(make_gif(frames, ...))``
reproduces the composited frames bit-for-bit (GIF is lossless),
which is what the registered queries' oracles pin.

No code here derives from the reference repo (it contains no codec
work); the format layout follows the public GIF89a specification.
"""

from __future__ import annotations

import struct

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width 3..12)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Decode a GIF LZW stream (already de-sub-blocked) into
    ``expected`` palette indices. Implements clear/EOI codes, code
    width growth at table-size boundaries, the KwKwK
    (code == next_code) case, and deferred clear (a full 4096-entry
    table keeps decoding with 12-bit codes until a CLEAR arrives)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # table as list of bytes; indices 0..clear-1 are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # Truncated streams are common in crawls; emit what
                # we have if the raster is already complete.
                if len(out) >= expected:
                    return bytes(out[:expected])
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} out of range")
        out += entry
        prev = entry
        # grow code width when the NEXT code would not fit; at 12
        # bits the width pins until a clear (deferred-clear mode)
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # Spec says an EOI follows, but many writers omit it;
            # the raster is complete either way.
            return bytes(out[:expected])
    if len(out) < expected:
        raise ValueError(
            f"LZW underrun: {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (the exact inverse
    of :func:`lzw_decode`): leading CLEAR, greedy longest-match
    table build, width growth mirroring the decoder, CLEAR + reset
    when the table hits 4096, trailing EOI."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # the decoder grows width when ITS table size reaches
            # 1 << width; its table size equals next_code here
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container helpers
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int):
    """Row output order of GIF 4-pass interlacing."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap a byte stream into <=255-byte GIF data sub-blocks plus
    the zero-length terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos : pos + n]
        if pos + n > len(buf):
            raise ValueError("truncated GIF sub-block payload")
        pos += n


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif_frames(content: bytes):
    """Decode every frame of a GIF into composited RGB rasters.

    Returns ``(delays_cs, frames)`` where ``frames`` is an
    (n_frames, canvas_h, canvas_w, 3) uint8 array of the COMPOSITED
    logical screen after each image block (what a viewer shows), and
    ``delays_cs`` the per-frame delay in centiseconds (0 when no
    Graphic Control Extension precedes the frame). Disposal methods:
    0/1 leave the canvas, 2 restores the frame rect to the
    background color, 3 restores the pre-frame canvas. Transparent
    pixels never overwrite the canvas."""
    import numpy as np

    if content[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF stream")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    cw, ch, packed, bg_idx, _aspect = struct.unpack_from(
        "<HHBBB", content, 6
    )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            content[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    # canvas starts as the background color (opaque compositing —
    # the common viewer behavior; transparency below never punches
    # holes, it preserves what is already on the canvas)
    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (ch, cw, 1)).astype(np.uint8)
        bg_rgb = gct[bg_idx].copy()
    else:
        canvas = np.zeros((ch, cw, 3), dtype=np.uint8)
        bg_rgb = np.zeros(3, dtype=np.uint8)

    frames = []
    delays = []
    # pending graphic-control state for the NEXT image block
    transparent = -1
    disposal = 0
    delay = 0
    while True:
        if pos >= len(content):
            raise ValueError("GIF missing trailer")
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            payload, pos = _read_sub_blocks(content, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, delay = struct.unpack_from("<BH", payload, 0)
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else -1
            # 0xFF application (loop), 0xFE comment, 0x01 plain
            # text: skipped per spec
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from(
            "<HHHHB", content, pos
        )
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                content[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            if table.shape[0] != n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image block with no color table")
        if w == 0 or h == 0 or left + w > cw or top + h > ch:
            raise ValueError("GIF frame rect outside canvas")
        if pos >= len(content):
            raise ValueError("truncated GIF image data")
        mcs = content[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(content, pos)
        idx = np.frombuffer(
            lzw_decode(lzw, mcs, w * h), dtype=np.uint8
        ).reshape(h, w)
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF pixel index outside color table")
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            deinterlaced = np.empty_like(idx)
            deinterlaced[_interlace_order(h)] = idx
            idx = deinterlaced

        previous = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + h, left : left + w]
        if transparent >= 0:
            opaque = idx != transparent
            rect[opaque] = table[idx[opaque]]
        else:
            rect[:] = table[idx]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and previous is not None:
            canvas = previous
        transparent = -1
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return delays, np.stack(frames)


def decode_gif(content: bytes):
    """Decode a GIF to its FIRST composited frame as an
    (h, w, 3) uint8 RGB raster — the static-image view, matching the
    (h, w[, c]) contract of ``decode_image_real``'s other formats."""
    _delays, frames = decode_gif_frames(content)
    return frames[0]


# ---------------------------------------------------------------------------
# encoder (fixtures / closed loop)
# ---------------------------------------------------------------------------


def _build_palette(rasters) -> "object":
    """Collect the distinct colors across rasters (<=256) into a
    deterministic palette, sorted by packed RGB."""
    import numpy as np

    flat = np.concatenate([r.reshape(-1, 3) for r in rasters])
    packed = (
        flat[:, 0].astype(np.int64) << 16
    ) | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2].astype(np.int64)
    colors = np.unique(packed)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors: GIF palettes hold 256 "
            "(quantize first)"
        )
    pal = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF],
        axis=-1,
    ).astype(np.uint8)
    return pal


def _index_raster(raster, palette):
    import numpy as np

    packed = (
        raster[:, :, 0].astype(np.int64) << 16
    ) | (raster[:, :, 1].astype(np.int64) << 8) | raster[
        :, :, 2
    ].astype(np.int64)
    pal_packed = (
        palette[:, 0].astype(np.int64) << 16
    ) | (palette[:, 1].astype(np.int64) << 8) | palette[:, 2].astype(
        np.int64
    )
    order = np.argsort(pal_packed)
    found = np.searchsorted(pal_packed[order], packed)
    idx = order[np.clip(found, 0, len(order) - 1)]
    if not (pal_packed[idx] == packed).all():
        raise ValueError("raster color missing from palette")
    return idx.astype(np.uint8)


def _palette_block(palette) -> tuple[bytes, int]:
    """Pad a palette to a power-of-two size >= 2; return (bytes,
    size_field) where size_field encodes 2 << field entries."""
    import numpy as np

    n = len(palette)
    field = 0
    while (2 << field) < max(n, 2):
        field += 1
    padded = np.zeros((2 << field, 3), dtype=np.uint8)
    padded[:n] = palette
    return padded.tobytes(), field


def make_gif(
    frames,
    *,
    interlace: bool = False,
    transparent_color=None,
    delays_cs=None,
    disposal=None,
    loop: int | None = 0,
    local_palettes: bool = False,
    offsets=None,
    canvas=None,
    version: bytes = b"GIF89a",
) -> bytes:
    """Serialize one raster or a list of rasters as a GIF.

    ``frames``: (h, w, 3) uint8 array or list of them (each frame
    may be a smaller rect when ``offsets``/``canvas`` place it).
    ``transparent_color``: an (r, g, b) that, where present in a
    frame, is written as the transparent index (the closed-loop
    decoder then leaves the canvas unchanged there).
    ``disposal``: per-frame list of 0..3. ``local_palettes`` writes
    a per-frame color table instead of one global table.
    ``offsets``: per-frame (left, top); ``canvas``: (w, h) logical
    screen (defaults to the first frame's size)."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("frames must be (h, w, 3) uint8 RGB")
    n_frames = len(frames)
    offsets = list(offsets or [(0, 0)] * n_frames)
    if canvas is None:
        canvas = (frames[0].shape[1], frames[0].shape[0])
    cw, ch = canvas
    delays_cs = list(delays_cs or [0] * n_frames)
    disposal = list(disposal or [0] * n_frames)
    if version not in (b"GIF87a", b"GIF89a"):
        raise ValueError("version must be GIF87a or GIF89a")

    trans_rgb = None
    if transparent_color is not None:
        trans_rgb = np.asarray(transparent_color, dtype=np.uint8)

    def palette_for(rs):
        pal = _build_palette(rs)
        if trans_rgb is not None:
            packed = (
                (pal[:, 0].astype(int) << 16)
                | (pal[:, 1].astype(int) << 8)
                | pal[:, 2].astype(int)
            )
            tp = (int(trans_rgb[0]) << 16) | (int(trans_rgb[1]) << 8) | int(
                trans_rgb[2]
            )
            if tp not in set(packed.tolist()):
                if len(pal) >= 256:
                    raise ValueError("no palette slot for transparency")
                pal = np.vstack([pal, trans_rgb[None, :]])
        return pal

    out = bytearray()
    out += version
    gpal = None
    if not local_palettes:
        gpal = palette_for(frames)
        pal_bytes, field = _palette_block(gpal)
        out += struct.pack("<HHBBB", cw, ch, 0x80 | field, 0, 0)
        out += pal_bytes
    else:
        out += struct.pack("<HHBBB", cw, ch, 0, 0, 0)

    if loop is not None and n_frames > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += _sub_blocks(struct.pack("<BH", 1, loop))[:-1]
        # _sub_blocks appends the terminator; keep exactly one
        out += b"\x00"

    for i, frame in enumerate(frames):
        pal = palette_for([frame]) if local_palettes else gpal
        h, w = frame.shape[:2]
        left, top = offsets[i]
        trans_idx = -1
        if trans_rgb is not None:
            match = (pal == trans_rgb[None, :]).all(axis=1)
            trans_idx = int(np.argmax(match)) if match.any() else -1
        needs_gce = (
            version == b"GIF89a"
            and (trans_idx >= 0 or delays_cs[i] or disposal[i])
        )
        if needs_gce:
            flags = (disposal[i] & 0x07) << 2
            if trans_idx >= 0:
                flags |= 0x01
            out += b"\x21\xf9"
            out += _sub_blocks(
                struct.pack(
                    "<BHB", flags, delays_cs[i], max(trans_idx, 0)
                )
            )
        ipacked = 0x40 if interlace else 0
        idx = _index_raster(frame, pal)
        if interlace:
            idx = idx[_interlace_order(h)]
        mcs = 2
        while (1 << mcs) < len(pal):
            mcs += 1
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        if local_palettes:
            pal_bytes, field = _palette_block(pal)
            out = out[:-1] + bytes([0x80 | ipacked | field])
            out += pal_bytes
        else:
            out = out[:-1] + bytes([ipacked])
        out.append(mcs)
        out += _sub_blocks(lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)
