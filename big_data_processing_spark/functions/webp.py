"""WebP-lossless (VP8L) codec — pure stdlib + numpy, no codec
library, the :mod:`multimodal` JPEG/PNG sibling (r9 verdict #8).

Decoder (:func:`decode_webp`) implements the full VP8L bitstream:
RIFF/VP8X container walk, LSB-first bit reading, simple and normal
(code-length-coded) canonical prefix codes with the 16/17/18 repeat
alphabet and the max-symbol short-circuit, optional color cache,
meta prefix-code groups selected per block, LZ77 backward
references over the 2D distance map (the 120-entry neighborhood
table) and the four transforms — PREDICTOR (all 14 modes), COLOR
(cross-color), SUBTRACT_GREEN and COLOR_INDEXING (including
sub-byte pixel bundling) — applied inverse in reverse read order.

Encoder (:func:`make_webp_lossless`) serializes a raster to a real
VP8L stream: canonical Huffman codes built per channel (simple
two-symbol codes where they fit, length-limited normal codes
elsewhere, zero-run 17/18 + repeat-16 compressed code lengths),
optional greedy LZ77 with mapped 2D distances, optional color
cache, and optional SUBTRACT_GREEN / PREDICTOR / COLOR /
COLOR_INDEXING transforms. Lossless: decode(encode(x)) == x
exactly, which tests assert pixel-for-pixel and cross-validate
against the SYSTEM libwebp when present (tests only — the engine
path never links it).

Spec: "WebP Lossless Bitstream Specification" (Google, public).
Reference parity note: the reference repo (ref: src/main.py) has no
image codecs at all; this exists for the multimodal ingest surface
of the training-data pipeline."""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Bit I/O (LSB-first within bytes, DEFLATE-style)
# ---------------------------------------------------------------------------


class _Vp8lBitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("VP8L bitstream exhausted")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _Vp8lBitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        """LSB-first field write (headers, extra bits)."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code write: the tree walks MSB-of-code first, so
        emit the code's bits from MSB down, each as one stream bit."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with canonical assignment: codes
    count up within a length, shift left when the length grows —
    the DEFLATE/VP8L convention."""
    code = 0
    out: dict[int, tuple[int, int]] = {}
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        length = lengths[sym]
        if length == 0:
            continue
        code <<= length - prev_len
        out[sym] = (code, length)
        code += 1
        prev_len = length
    return out


class _PrefixDecoder:
    """Tree-walk decoder over canonical (length, code) -> symbol.
    A single-symbol code reads ZERO bits (VP8L's degenerate case)."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths: dict[int, int]):
        used = {s: n for s, n in lengths.items() if n > 0}
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = next(iter(used))
            self.table = {}
            self.max_len = 0
            return
        # Kraft check: over-subscribed codes are malformed streams
        if sum(1 << (15 - n) for n in used.values() if n <= 15) > (
            1 << 15
        ) or any(n > 15 for n in used.values()):
            raise ValueError("VP8L prefix code over-subscribed")
        self.single = None
        self.table = {
            (length, code): sym
            for sym, (code, length) in _canonical_codes(used).items()
        }
        self.max_len = max(used.values())

    def read(self, br: _Vp8lBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)


def _read_prefix_code(br: _Vp8lBitReader, alphabet: int) -> _PrefixDecoder:
    """One prefix code: the 1-bit simple form (1-2 literal symbols)
    or the normal form whose symbol lengths are themselves coded
    with the 19-symbol code-length alphabet (16=repeat-prev,
    17/18=zero runs) plus the optional max-symbol short-circuit."""
    if br.read_bits(1):  # simple
        num_symbols = br.read_bits(1) + 1
        first8 = br.read_bits(1)
        s0 = br.read_bits(8 if first8 else 1)
        lengths = {s0: 1}
        if num_symbols == 2:
            s1 = br.read_bits(8)
            if s1 == s0:
                raise ValueError("VP8L simple code repeats a symbol")
            lengths[s1] = 1
        if max(lengths) >= alphabet:
            raise ValueError("VP8L simple code symbol out of range")
        return _PrefixDecoder(lengths)

    num_codes = br.read_bits(4) + 4
    if num_codes > 19:
        raise ValueError("VP8L code-length code count out of range")
    cl_lengths: dict[int, int] = {}
    for i in range(num_codes):
        n = br.read_bits(3)
        if n:
            cl_lengths[_CODE_LENGTH_ORDER[i]] = n
    cl = _PrefixDecoder(cl_lengths)

    if br.read_bits(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.read(br)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        else:
            use_prev = code_len == 16
            slot = code_len - 16
            repeat = br.read_bits((2, 3, 7)[slot]) + (3, 3, 11)[slot]
            if symbol + repeat > alphabet:
                raise ValueError("VP8L code-length repeat overruns")
            if use_prev:
                for _ in range(repeat):
                    lengths[symbol] = prev_len
                    symbol += 1
            else:
                symbol += repeat
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D distance map
# ---------------------------------------------------------------------------


def _lz77_prefix_decode(br: _Vp8lBitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """value >= 1 -> (code, extra_bit_count, extra_bits)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    e = x.bit_length() - 2
    base = x >> e  # 2 or 3
    return 2 * e + base, e, x - (base << e)


# 120-entry (dx, dy) neighborhood map for distance codes 1..120
# (codes > 120 are literal distances minus 120). Table from the
# public WebP Lossless Bitstream Specification, DERIVED entry-by-
# entry from the system libwebp with two-width probe streams
# (dist = dy*w + dx solved at w=16 and w=21) and re-verified on
# every run of tests/test_webp.py::test_distance_map_matches_libwebp.
_DISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DISTANCE_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Color cache
# ---------------------------------------------------------------------------

_CACHE_MULT = 0x1E35A7BD


class _ColorCache:
    __slots__ = ("bits", "slots")

    def __init__(self, bits: int):
        self.bits = bits
        self.slots = [0] * (1 << bits)

    def key(self, argb: int) -> int:
        return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - self.bits)

    def insert(self, argb: int) -> None:
        self.slots[self.key(argb)] = argb

    def lookup(self, idx: int) -> int:
        return self.slots[idx]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_entropy_image(
    br: _Vp8lBitReader, w: int, h: int, is_main: bool
):
    """One spatially-coded VP8L image: optional color cache, (main
    only) meta prefix groups, per-group 5 prefix codes, then the
    literal/backref/cache pixel loop. Returns a flat list of ARGB
    ints in row-major order."""
    cache = None
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color-cache bits out of range")
        cache = _ColorCache(cache_bits)

    meta_bits = 0
    meta_pixels = None
    meta_w = 0
    if is_main and br.read_bits(1):
        meta_bits = br.read_bits(3) + 2
        meta_w = -(-w // (1 << meta_bits))
        meta_h = -(-h // (1 << meta_bits))
        meta_pixels = _decode_entropy_image(br, meta_w, meta_h, False)
        num_groups = (
            max(((p >> 8) & 0xFFFF) for p in meta_pixels) + 1
        )
    else:
        num_groups = 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache else 0)
    alphabets = (green_alpha, 256, 256, 256, 40)
    groups = [
        [_read_prefix_code(br, a) for a in alphabets]
        for _ in range(num_groups)
    ]

    n = w * h
    out = [0] * n
    pos = 0
    while pos < n:
        if meta_pixels is not None:
            x, y = pos % w, pos // w
            mp = meta_pixels[
                (y >> meta_bits) * meta_w + (x >> meta_bits)
            ]
            group = groups[(mp >> 8) & 0xFFFF]
        else:
            group = groups[0]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.read(br)
        if s < 256:  # literal
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache:
                cache.insert(px)
        elif s < 280:  # backward reference
            length = _lz77_prefix_decode(br, s - 256)
            dist_premap = _lz77_prefix_decode(br, d_code.read(br))
            dist = _plane_code_to_distance(w, dist_premap)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache:
                    cache.insert(px)
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without a cache")
            idx = s - 280
            out[pos] = cache.lookup(idx)
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    return sum(
        ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) // 2) << sh
        for sh in (24, 16, 8, 0)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        line = ((left >> sh) & 0xFF)
        t = ((top >> sh) & 0xFF)
        tl = ((topleft >> sh) & 0xFF)
        p = line + t - tl
        p_l += abs(p - line)
        p_t += abs(p - t)
    return left if p_l < p_t else top


def _clamp_add_full(a: int, b: int, c: int) -> int:
    return sum(
        _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF))
        << sh
        for sh in (24, 16, 8, 0)
    )


def _clamp_add_half(a: int, b: int) -> int:
    # a = Average2(L, T) per channel, b = TL; C-style trunc division
    out = 0
    for sh in (24, 16, 8, 0):
        av = (a >> sh) & 0xFF
        bv = (b >> sh) & 0xFF
        d = av - bv
        v = av + (d // 2 if d >= 0 else -((-d) // 2))
        out |= _clamp(v) << sh
    return out


def _apply_inverse_predictor(
    pixels: list[int], w: int, h: int, modes: list[int],
    size_bits: int, blocks_w: int,
) -> None:
    """In-place inverse predictor: residual + prediction mod 256
    per channel. Edge rules per spec: (0,0) predicts opaque black,
    the top row predicts L, the left column predicts T; TR of the
    last column is the leftmost pixel of the current row (the
    contiguous-memory rule the spec normativizes)."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = modes[
                    (y >> size_bits) * blocks_w + (x >> size_bits)
                ]
                left = pixels[i - 1]
                top = pixels[i - w]
                tl = pixels[i - w - 1]
                tr = pixels[i - w + 1]  # x=w-1 wraps to (0, y): i+1-w
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_half(_avg2(left, top), tl)
                else:
                    raise ValueError(f"VP8L predictor mode {mode}")
            px = pixels[i]
            pixels[i] = (
                (((px >> 24) + (pred >> 24)) & 0xFF) << 24
                | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF)
                << 16
                | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF)
                << 8
                | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
            )


def _cdelta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 with arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_inverse_color(
    pixels: list[int], w: int, h: int, ctes: list[int],
    size_bits: int, blocks_w: int,
) -> None:
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = ctes[(y >> size_bits) * blocks_w + (x >> size_bits)]
            g2r = cte & 0xFF  # blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            px = pixels[i]
            g = (px >> 8) & 0xFF
            red = ((px >> 16) & 0xFF) + _cdelta(g2r, g)
            red &= 0xFF
            blue = (px & 0xFF) + _cdelta(g2b, g) + _cdelta(r2b, red)
            blue &= 0xFF
            pixels[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _decode_vp8l(data: bytes):
    """VP8L payload -> (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when
    any pixel's alpha < 255."""
    import numpy as np

    br = _Vp8lBitReader(data)
    if br.read_bits(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint (informative)
    if br.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []  # (type, payload...) in read order
    seen = set()
    img_w = w  # COLOR_INDEXING bundling shrinks the coded width
    while br.read_bits(1):
        ttype = br.read_bits(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype in (0, 1):  # PREDICTOR / COLOR
            size_bits = br.read_bits(3) + 2
            bw_ = -(-img_w // (1 << size_bits))
            bh_ = -(-h // (1 << size_bits))
            sub = _decode_entropy_image(br, bw_, bh_, False)
            transforms.append((ttype, size_bits, bw_, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2,))
        else:  # COLOR_INDEXING
            n_colors = br.read_bits(8) + 1
            pal_deltas = _decode_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for d in pal_deltas:
                cur = 0
                for sh in (24, 16, 8, 0):
                    cur |= (
                        (((d >> sh) & 0xFF) + ((prev >> sh) & 0xFF))
                        & 0xFF
                    ) << sh
                palette.append(cur)
                prev = cur
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, width_bits, palette))
            img_w = -(-img_w // (1 << width_bits))

    pixels = _decode_entropy_image(br, img_w, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            _, size_bits, bw_, sub = t
            modes = [(p >> 8) & 0xFF for p in sub]
            _apply_inverse_predictor(
                pixels, img_w, h, modes, size_bits, bw_
            )
        elif t[0] == 1:
            _, size_bits, bw_, sub = t
            _apply_inverse_color(pixels, img_w, h, sub, size_bits, bw_)
        elif t[0] == 2:
            for i, px in enumerate(pixels):
                g = (px >> 8) & 0xFF
                red = (((px >> 16) & 0xFF) + g) & 0xFF
                blue = ((px & 0xFF) + g) & 0xFF
                pixels[i] = (px & 0xFF00FF00) | (red << 16) | blue
        else:
            _, width_bits, palette = t
            if width_bits == 0:
                unpacked = []
                for px in pixels:
                    idx = (px >> 8) & 0xFF
                    if idx >= len(palette):
                        raise ValueError("VP8L palette index range")
                    unpacked.append(palette[idx])
                pixels = unpacked
            else:
                per = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                unpacked = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        px = pixels[y * img_w + (x >> width_bits)]
                        idx = ((px >> 8) >> (
                            (x & (per - 1)) * bits
                        )) & mask
                        if idx >= len(palette):
                            raise ValueError("VP8L palette index range")
                        row.append(palette[idx])
                    unpacked.extend(row)
                pixels = unpacked
            img_w = w

    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.stack(
        [
            (arr >> 16) & 0xFF,
            (arr >> 8) & 0xFF,
            arr & 0xFF,
            (arr >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)
    if (rgba[:, :, 3] == 255).all():
        return rgba[:, :, :3]
    return rgba


def decode_webp(content: bytes):
    """RIFF walk: VP8L (lossless) chunks decode through this
    module's VP8L decoder; lossy ``VP8 `` chunks through the full
    keyframe decoder in :mod:`.vp8` (boolean coder, intra
    prediction, iDCT, in-loop deblocking — bit-exact vs libwebp on
    its YUV output), converted to RGB with the deterministic BT.601
    upsample. VP8X-extended containers holding either chunk walk to
    it."""
    import struct

    if (
        len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"WEBP"
    ):
        raise ValueError("not a RIFF/WEBP stream")
    pos, end = 12, len(content)
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"chunk {cid!r} overruns buffer")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            return _decode_vp8l(body)
        if cid == b"VP8 ":
            from big_data_processing_spark.functions.vp8 import (
                decode_vp8,
                yuv420_to_rgb,
            )

            return yuv420_to_rgb(*decode_vp8(body))
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L image chunk in WEBP container")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _CodeWriter:
    """symbol -> (code, length) emitter; a single-symbol code costs
    ZERO bits (both this decoder and libwebp special-case it)."""

    __slots__ = ("codes",)

    def __init__(self, lengths: dict[int, int]):
        used = {s: n for s, n in lengths.items() if n > 0}
        if len(used) == 1:
            self.codes = {next(iter(used)): (0, 0)}
        else:
            self.codes = _canonical_codes(used)

    def write(self, bwr: _Vp8lBitWriter, sym: int) -> None:
        code, length = self.codes[sym]
        if length:
            bwr.write_code(code, length)


def _huff_lengths(freq: dict[int, int], max_len: int) -> dict[int, int]:
    """Huffman code lengths from frequencies; falls back to a
    uniform-depth code if the optimal tree exceeds max_len (rare at
    fixture sizes, but the cap is normative: 15 for symbol codes,
    7 for the code-length code)."""
    import heapq
    import itertools

    syms = sorted(s for s, f in freq.items() if f > 0)
    if not syms:
        raise ValueError("empty histogram")
    if len(syms) == 1:
        return {syms[0]: 1}
    counter = itertools.count()
    heap = [(freq[s], next(counter), s) for s in syms]
    heapq.heapify(heap)
    parent: dict = {}
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        node = ("i", next(counter))
        parent[n1] = node
        parent[n2] = node
        heapq.heappush(heap, (f1 + f2, next(counter), node))
    lengths = {}
    for s in syms:
        d = 0
        n = s
        while n in parent:
            n = parent[n]
            d += 1
        lengths[s] = d
    if max(lengths.values()) > max_len:
        depth = max(1, (len(syms) - 1).bit_length())
        if depth > max_len:
            raise ValueError("alphabet too large for uniform code")
        lengths = {s: depth for s in syms}
    return lengths


def _emit_prefix_code(
    bwr: _Vp8lBitWriter, lengths: dict[int, int], alphabet: int
) -> _CodeWriter:
    """Serialize one prefix code: the simple form when <= 2 symbols
    all fit in a byte, else the normal code-length-coded form with
    17/18 zero runs, repeat-16, and the max-symbol short-circuit
    for the trailing-zero tail."""
    used = sorted(s for s, n in lengths.items() if n > 0)
    if 1 <= len(used) <= 2 and used[-1] <= 255:
        bwr.write_bits(1, 1)  # simple
        bwr.write_bits(len(used) - 1, 1)
        first8 = 1 if used[0] > 1 else 0
        bwr.write_bits(first8, 1)
        bwr.write_bits(used[0], 8 if first8 else 1)
        if len(used) == 2:
            bwr.write_bits(used[1], 8)
        return _CodeWriter(dict.fromkeys(used, 1))
    bwr.write_bits(0, 1)  # normal

    seq = [lengths.get(s, 0) for s in range(alphabet)]
    last_nz = max(s for s in range(alphabet) if seq[s] > 0)
    span = last_nz + 1

    # token stream over the code-length alphabet
    tokens: list[tuple[int, int, int]] = []  # (sym, nbits, extra)
    i = 0
    while i < span:
        if seq[i] == 0:
            j = i
            while j < span and seq[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, 3, r - 3))
                run -= r
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            v = seq[i]
            tokens.append((v, 0, 0))
            i += 1
            rep = 0
            while i + rep < span and seq[i + rep] == v:
                rep += 1
            while rep >= 3:
                r = min(rep, 6)
                tokens.append((16, 2, r - 3))
                rep -= r
                i += r
            # leftover 1-2 repeats emit literally on later passes

    # the max-symbol short-circuit counts TOKENS read, not symbols
    # covered (one repeat token fills many symbols): emit the exact
    # token count, or cover the whole alphabet with zero-run tokens
    # when the short-circuit doesn't apply
    use_length = span < alphabet and len(tokens) >= 2
    if span < alphabet and not use_length:
        tail = alphabet - span
        while tail >= 11:
            r = min(tail, 138)
            tokens.append((18, 7, r - 11))
            tail -= r
        while tail >= 3:
            r = min(tail, 10)
            tokens.append((17, 3, r - 3))
            tail -= r
        tokens.extend((0, 0, 0) for _ in range(tail))

    cl_freq: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freq[sym] = cl_freq.get(sym, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, 7)
    # emit the 19 3-bit code-length-code lengths in wire order,
    # trimmed to the minimal prefix covering every nonzero entry
    order_pos = {s: i for i, s in enumerate(_CODE_LENGTH_ORDER)}
    num_codes = max(
        [4] + [order_pos[s] + 1 for s in cl_lengths]
    )
    bwr.write_bits(num_codes - 4, 4)
    for i in range(num_codes):
        bwr.write_bits(cl_lengths.get(_CODE_LENGTH_ORDER[i], 0), 3)

    if use_length:  # max-symbol short-circuit for the zero tail
        bwr.write_bits(1, 1)
        t = len(tokens)
        nbits = max(2, (t - 2).bit_length())
        nbits = min(((nbits + 1) // 2) * 2, 16)  # 2 + 2*ReadBits(3)
        bwr.write_bits((nbits - 2) // 2, 3)
        bwr.write_bits(t - 2, nbits)
    else:
        bwr.write_bits(0, 1)

    cw = _CodeWriter(cl_lengths)
    for sym, nbits, extra in tokens:
        cw.write(bwr, sym)
        if nbits:
            bwr.write_bits(extra, nbits)
    return _CodeWriter(lengths)


def _map_distance(dist: int, xsize: int) -> int:
    """Distance -> premap code: the 2D neighborhood code when the
    offset is in the 120-entry map, else dist + 120."""
    for i, (dx, dy) in enumerate(_DISTANCE_MAP):
        if dy * xsize + dx == dist:
            return i + 1
    return dist + 120


def _tokenize(
    pixels: list[int], w: int, cache_bits: int, use_lz77: bool
) -> list[tuple]:
    """Greedy run/row-copy LZ77 + color-cache tokenizer."""
    tokens: list[tuple] = []
    cache = _ColorCache(cache_bits) if cache_bits else None
    n = len(pixels)
    pos = 0
    while pos < n:
        if use_lz77 and pos >= 1:
            run = 0
            while (
                pos + run < n
                and pixels[pos + run] == pixels[pos - 1]
                and run < 4096
            ):
                run += 1
            up = 0
            if pos >= w:
                while (
                    pos + up < n
                    and pixels[pos + up] == pixels[pos - w + up]
                    and up < 4096
                ):
                    up += 1
            best, dist = (run, 1) if run >= up else (up, w)
            if best >= 3:
                tokens.append(("copy", best, _map_distance(dist, w)))
                if cache:
                    for k in range(best):
                        cache.insert(pixels[pos + k])
                pos += best
                continue
        px = pixels[pos]
        if cache is not None and cache.lookup(cache.key(px)) == px and pos:
            tokens.append(("cache", cache.key(px)))
        else:
            tokens.append(
                (
                    "lit",
                    (px >> 24) & 0xFF,
                    (px >> 16) & 0xFF,
                    (px >> 8) & 0xFF,
                    px & 0xFF,
                )
            )
        if cache:
            cache.insert(px)
        pos += 1
    return tokens


def _write_image_payload(
    bwr: _Vp8lBitWriter,
    pixels: list[int],
    w: int,
    h: int,
    *,
    is_main: bool,
    cache_bits: int = 0,
    use_lz77: bool = False,
    meta_bits: int = 0,
) -> None:
    """One spatially-coded image: cache info, optional meta prefix
    groups (block-checkerboard assignment when meta_bits > 0),
    per-group prefix codes, token stream."""
    bwr.write_bits(1 if cache_bits else 0, 1)
    if cache_bits:
        bwr.write_bits(cache_bits, 4)

    def group_of(pos: int) -> int:
        if not meta_bits:
            return 0
        x, y = pos % w, pos // w
        return ((x >> meta_bits) + (y >> meta_bits)) % 2

    num_groups = 1
    if is_main:
        if meta_bits:
            bwr.write_bits(1, 1)
            bwr.write_bits(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            meta_px = [
                0xFF000000 | ((((bx + by) % 2) & 0xFF) << 8)
                for by in range(mh)
                for bx in range(mw)
            ]
            _write_image_payload(
                bwr, meta_px, mw, mh, is_main=False
            )
            num_groups = 2
        else:
            bwr.write_bits(0, 1)

    tokens = _tokenize(pixels, w, cache_bits, use_lz77)

    # histograms per group (token group = position of its FIRST pixel)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    hists = [
        [
            dict(), dict(), dict(), dict(), dict(),
        ]
        for _ in range(num_groups)
    ]

    def bump(g: int, tree: int, sym: int) -> None:
        d = hists[g][tree]
        d[sym] = d.get(sym, 0) + 1

    token_syms: list[tuple] = []  # (group, kind, payload...)
    pos = 0
    for t in tokens:
        g = group_of(pos)
        if t[0] == "lit":
            _, a, r, gg, b = t
            bump(g, 0, gg)
            bump(g, 1, r)
            bump(g, 2, b)
            bump(g, 3, a)
            token_syms.append((g, t))
            pos += 1
        elif t[0] == "cache":
            bump(g, 0, 280 + t[1])
            token_syms.append((g, t))
            pos += 1
        else:
            _, length, premap = t
            lcode, _, _ = _lz77_prefix_encode(length)
            dcode, _, _ = _lz77_prefix_encode(premap)
            bump(g, 0, 256 + lcode)
            bump(g, 4, dcode)
            token_syms.append((g, t))
            pos += length

    alphabets = (green_alpha, 256, 256, 256, 40)
    writers = []
    for g in range(num_groups):
        ws = []
        for tree in range(5):
            freq = hists[g][tree]
            if not freq:
                freq = {0: 1}  # unused tree: 1-symbol placeholder
            ws.append(
                _emit_prefix_code(
                    bwr, _huff_lengths(freq, 15), alphabets[tree]
                )
            )
        writers.append(ws)

    for g, t in token_syms:
        gw, rw, bw_, aw, dw = writers[g]
        if t[0] == "lit":
            _, a, r, gg, b = t
            gw.write(bwr, gg)
            rw.write(bwr, r)
            bw_.write(bwr, b)
            aw.write(bwr, a)
        elif t[0] == "cache":
            gw.write(bwr, 280 + t[1])
        else:
            _, length, premap = t
            lcode, lnb, lx = _lz77_prefix_encode(length)
            gw.write(bwr, 256 + lcode)
            if lnb:
                bwr.write_bits(lx, lnb)
            dcode, dnb, dx = _lz77_prefix_encode(premap)
            dw.write(bwr, dcode)
            if dnb:
                bwr.write_bits(dx, dnb)


def _forward_predictor(
    pixels: list[int], w: int, h: int, size_bits: int,
) -> tuple[list[int], list[int], int]:
    """Residualize with per-block mode (bx + by) mod 14 — every
    predictor mode exercised in one image. Returns (residuals,
    block modes, blocks_w)."""
    blocks_w = -(-w // (1 << size_bits))
    blocks_h = -(-h // (1 << size_bits))
    modes = [
        ((bx + by) % 14)
        for by in range(blocks_h)
        for bx in range(blocks_w)
    ]
    res = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = modes[
                    (y >> size_bits) * blocks_w + (x >> size_bits)
                ]
                left, top = pixels[i - 1], pixels[i - w]
                tl, tr = pixels[i - w - 1], pixels[i - w + 1]
                pred = (
                    0xFF000000, left, top, tr, tl,
                    _avg2(_avg2(left, tr), top),
                    _avg2(left, tl), _avg2(left, top),
                    _avg2(tl, top), _avg2(top, tr),
                    _avg2(_avg2(left, tl), _avg2(top, tr)),
                    _select(left, top, tl),
                    _clamp_add_full(left, top, tl),
                    _clamp_add_half(_avg2(left, top), tl),
                )[mode]
            px = pixels[i]
            res[i] = (
                ((((px >> 24) - (pred >> 24)) & 0xFF) << 24)
                | ((((px >> 16) - (pred >> 16)) & 0xFF) << 16)
                | ((((px >> 8) - (pred >> 8)) & 0xFF) << 8)
                | (((px - pred) & 0xFF))
            )
    return res, modes, blocks_w


_CTE = (0x10, 0x08, 0xF0)  # (green_to_red, green_to_blue, red_to_blue)


def _forward_color_transform(
    pixels: list[int], w: int, h: int, size_bits: int,
) -> tuple[list[int], int, int]:
    """Apply the fixed cross-color element to every block."""
    blocks_w = -(-w // (1 << size_bits))
    blocks_h = -(-h // (1 << size_bits))
    g2r, g2b, r2b = _CTE
    out = [0] * (w * h)
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        new_red = (red - _cdelta(g2r, g)) & 0xFF
        new_blue = (blue - _cdelta(g2b, g) - _cdelta(r2b, red)) & 0xFF
        out[i] = (px & 0xFF00FF00) | (new_red << 16) | new_blue
    cte_pixel = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    return out, blocks_w * blocks_h, cte_pixel


def make_webp_lossless(
    raster,
    *,
    cache_bits: int = 0,
    use_lz77: bool = False,
    subtract_green: bool = False,
    predictor: bool = False,
    color_transform: bool = False,
    palette: bool = False,
    meta_bits: int = 0,
) -> bytes:
    """Serialize an (h, w, 3|4) uint8 raster to a REAL WebP-lossless
    file. Feature flags choose which bitstream paths the stream
    exercises; every combination round-trips exactly through
    :func:`decode_webp` (and through the system libwebp — see
    tests/test_webp.py)."""
    import struct

    import numpy as np

    arr = np.asarray(raster, dtype=np.int64)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("raster must be (h, w, 3|4)")
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    alpha = arr[:, :, 3] if arr.shape[2] == 4 else np.full((h, w), 255)
    pixels = [
        int(
            (alpha[y, x] << 24)
            | (arr[y, x, 0] << 16)
            | (arr[y, x, 1] << 8)
            | arr[y, x, 2]
        )
        for y in range(h)
        for x in range(w)
    ]

    bwr = _Vp8lBitWriter()
    bwr.write_bits(0x2F, 8)
    bwr.write_bits(w - 1, 14)
    bwr.write_bits(h - 1, 14)
    bwr.write_bits(int((alpha != 255).any()), 1)
    bwr.write_bits(0, 3)

    img_w = w
    if palette:
        if subtract_green or predictor or color_transform:
            raise ValueError("palette is an exclusive transform here")
        colors = sorted(set(pixels))
        if len(colors) > 256:
            raise ValueError("too many colors for palette mode")
        index = {c: i for i, c in enumerate(colors)}
        n = len(colors)
        bwr.write_bits(1, 1)
        bwr.write_bits(3, 2)  # COLOR_INDEXING
        bwr.write_bits(n - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((((c >> sh) - (prev >> sh)) & 0xFF)) << sh
            deltas.append(d)
            prev = c
        _write_image_payload(bwr, deltas, n, 1, is_main=False)
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            img_w = -(-w // per)
            packed = []
            for y in range(h):
                for bx in range(img_w):
                    v = 0
                    for k in range(per):
                        x = bx * per + k
                        if x < w:
                            v |= index[pixels[y * w + x]] << (k * bits)
                    packed.append(0xFF000000 | (v << 8))
            pixels = packed
        else:
            pixels = [
                0xFF000000 | (index[px] << 8) for px in pixels
            ]
    else:
        if subtract_green:
            bwr.write_bits(1, 1)
            bwr.write_bits(2, 2)
            pixels = [
                (px & 0xFF00FF00)
                | (((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16)
                | (((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF)
                for px in pixels
            ]
        if predictor:
            size_bits = 2
            bwr.write_bits(1, 1)
            bwr.write_bits(0, 2)
            bwr.write_bits(size_bits - 2, 3)
            pixels, modes, bw_ = _forward_predictor(
                pixels, img_w, h, size_bits
            )
            mode_px = [0xFF000000 | (m << 8) for m in modes]
            _write_image_payload(
                bwr, mode_px, bw_, -(-h // (1 << size_bits)),
                is_main=False,
            )
        if color_transform:
            size_bits = 3
            bwr.write_bits(1, 1)
            bwr.write_bits(1, 2)
            bwr.write_bits(size_bits - 2, 3)
            pixels, n_blocks, cte_pixel = _forward_color_transform(
                pixels, img_w, h, size_bits
            )
            bw_ = -(-img_w // (1 << size_bits))
            bh_ = -(-h // (1 << size_bits))
            _write_image_payload(
                bwr, [cte_pixel] * (bw_ * bh_), bw_, bh_,
                is_main=False,
            )
    bwr.write_bits(0, 1)  # no more transforms

    _write_image_payload(
        bwr, pixels, img_w, h, is_main=True,
        cache_bits=cache_bits, use_lz77=use_lz77, meta_bits=meta_bits,
    )
    payload = bwr.finish()

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
