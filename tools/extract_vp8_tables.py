"""Locate the VP8 keyframe probability/dequant tables inside the
SYSTEM libwebp shared object and freeze them into
``big_data_processing_spark/functions/_vp8_tables.py``.

These constants are public specification content — RFC 6386 ("VP8
Data Format and Decoding Guide") publishes them verbatim in its
reference-code appendix, and every VP8 implementation carries the
same values byte-for-byte. The container has no libvpx/RFC sources,
but it does ship libwebp (the authoritative decoder the WebP test
suite already cross-validates against), whose .rodata embeds the
identical tables. We find them by structural signature:

- ``CoeffsProba0[4][8][3][11]``  (1056 uint8) — anchored on the
  well-known row {253,136,254,255,228,219,128,...}. That row is
  type 0 BAND 1 (band 0 of type 0 — luma-without-DC, first coeff
  index 1 — is never read and the table fills it with neutral
  128s), so the object starts 33 bytes before the anchor; the
  128x33 prefix and every type-block boundary (Y2 at row 24,
  chroma at 48, luma-with-DC at 72) are validated.
- ``CoeffsUpdateProba[4][8][3][11]`` (1056 uint8) — anchored on its
  own structure: the same 3 never-read rows hold 255s, followed by
  the well-known first real row {176, 246, ...}; validated
  all-nonzero and >=850 bytes of 255.
- ``kBModesProba[10][10][9]`` (900 uint8) — anchored on the DC/DC
  context row {231,120,48,89,115,113,120,152,112}; the decoder and
  encoder copies must agree byte-for-byte.
- ``kAcTable[128]`` (uint16 LE) — the only monotone-nondecreasing
  128-entry uint16 run starting 4,5,6,7 and ending 284;
  ``kDcTable[128]`` fits in uint8 (max 157) and libwebp stores it
  so — the only monotone 128-byte run starting 4,5,6,7,8,9,10,10
  and ending 157.

Every candidate is validated against those invariants before
anything is written; ambiguity (zero or multiple matches) aborts.
The emitted module is then machine-verified end-to-end by
tests/test_vp8.py: our decoder must reproduce libwebp's own YUV
output bit-for-bit on libwebp-encoded lossy streams, which would be
impossible with a single wrong byte in any of these tables.
"""

from __future__ import annotations

import sys

LIB = "/lib/x86_64-linux-gnu/libwebp.so.7"
OUT = "big_data_processing_spark/functions/_vp8_tables.py"

COEFFS_ANCHOR = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128,
                       128, 128])
BMODES_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])


def find_all(data: bytes, pat: bytes) -> list[int]:
    out, i = [], data.find(pat)
    while i != -1:
        out.append(i)
        i = data.find(pat, i + 1)
    return out


def find_u16_table(data: bytes, last: int) -> list[int]:
    """128 little-endian uint16, monotone nondecreasing, starting
    4,5,6,7 and ending ``last``."""
    import struct

    hits = []
    start_pat = struct.pack("<4H", 4, 5, 6, 7)
    for pos in find_all(data, start_pat):
        vals = list(struct.unpack_from("<128H", data, pos))
        if vals[-1] != last:
            continue
        if all(b >= a for a, b in zip(vals, vals[1:])):
            hits.append((pos, vals))
    # dedupe identical contents at different offsets
    uniq = {tuple(v) for _, v in hits}
    if len(uniq) != 1:
        raise SystemExit(
            f"dequant table ending {last}: {len(uniq)} distinct "
            f"candidates at {[p for p, _ in hits]}"
        )
    return hits[0][1]


def main() -> None:
    data = open(LIB, "rb").read()

    cp = find_all(data, COEFFS_ANCHOR)
    starts = sorted({p - 33 for p in cp})
    coeff_cands = set()
    for st in starts:
        blk = data[st : st + 1056]
        if (
            len(blk) == 1056
            and blk[:33] == bytes([128] * 33)
            and 0 not in blk
            # type-block boundaries: Y2 / chroma / luma-with-DC
            and blk[24 * 11 : 24 * 11 + 3] == bytes([198, 35, 237])
            and blk[48 * 11 : 48 * 11 + 3] == bytes([253, 9, 248])
            and blk[72 * 11 : 72 * 11 + 3] == bytes([202, 24, 213])
        ):
            coeff_cands.add(bytes(blk))
    if len(coeff_cands) != 1:
        raise SystemExit(
            f"CoeffsProba0: {len(coeff_cands)} validated candidates"
        )
    coeffs = next(iter(coeff_cands))

    up = find_all(data, bytes([255] * 33 + [176, 246]))
    upd_cands = set()
    for st in up:
        blk = data[st : st + 1056]
        if len(blk) == 1056 and 0 not in blk and blk.count(255) >= 850:
            upd_cands.add(bytes(blk))
    if len(upd_cands) != 1:
        raise SystemExit(
            f"CoeffsUpdateProba: {len(upd_cands)} validated candidates "
            f"at {up}"
        )
    update = next(iter(upd_cands))

    bm = find_all(data, BMODES_ANCHOR)
    bm_cands = {bytes(data[p : p + 900]) for p in bm}
    if len(bm_cands) != 1:  # decoder+encoder carry identical copies
        raise SystemExit(f"kBModesProba: {len(bm_cands)} contents {bm}")
    bmodes = next(iter(bm_cands))
    if 0 in bmodes:
        raise SystemExit("kBModesProba candidate contains 0")

    ac = find_u16_table(data, 284)
    dc_hits = {
        bytes(data[p : p + 128])
        for p in find_all(data, bytes([4, 5, 6, 7, 8, 9, 10, 10]))
        if len(data[p : p + 128]) == 128
        and data[p + 127] == 157
        and all(
            data[p + i + 1] >= data[p + i] for i in range(127)
        )
    }
    if len(dc_hits) != 1:
        raise SystemExit(f"kDcTable: {len(dc_hits)} candidates")
    dc = list(next(iter(dc_hits)))

    def fmt_u8(name: str, blob: bytes, dims: str) -> str:
        rows = [
            ", ".join(str(b) for b in blob[i : i + 16])
            for i in range(0, len(blob), 16)
        ]
        body = ",\n    ".join(rows)
        return (
            f"# {dims}, flat, row-major\n{name} = bytes([\n    "
            + body + ",\n])\n"
        )

    def fmt_u16(name: str, vals: list[int]) -> str:
        rows = [
            ", ".join(str(v) for v in vals[i : i + 12])
            for i in range(0, len(vals), 12)
        ]
        body = ",\n    ".join(rows)
        return f"{name} = (\n    " + body + ",\n)\n"

    with open(OUT, "w") as fh:
        fh.write(
            '"""VP8 keyframe constant tables (RFC 6386 appendix '
            "values),\nextracted from the system libwebp .rodata by "
            "tools/extract_vp8_tables.py\n(see its docstring for the "
            "signature-based location + validation) and\nverified "
            "end-to-end by tests/test_vp8.py against libwebp's own "
            'decodes."""\n\n'
        )
        fh.write(fmt_u8("COEFFS_PROBA0", coeffs, "[4][8][3][11]"))
        fh.write("\n")
        fh.write(fmt_u8("COEFFS_UPDATE_PROBA", update, "[4][8][3][11]"))
        fh.write("\n")
        fh.write(fmt_u8("KF_BMODES_PROBA", bmodes, "[10][10][9]"))
        fh.write("\n# quantizer index -> step size (RFC 6386 §14.1)\n")
        fh.write(fmt_u16("DC_TABLE", dc))
        fh.write("\n")
        fh.write(fmt_u16("AC_TABLE", ac))
    print(
        f"wrote {OUT}: CoeffsProba0 anchor @{cp}, "
        f"CoeffsUpdateProba @{up}, kBModesProba @{bm[0]}"
    )


if __name__ == "__main__":
    main()
