"""Minimal TrueType (sfnt) writer: a font program whose ONLY payload is a
format-4 ``cmap`` table (OpenType spec §cmap) — the fixture side of the
Type0-without-/ToUnicode dialect (kernels/pdf.py recovers text by inverting
the embedded font's unicode→GID cmap, the fallback real PDF consumers use
when a subsetted composite font omits /ToUnicode; reference capability via
MuPDF, /root/reference/pdf_extractor/extractors/text_extractor.py:51-53).

Generator/parser honesty: this writer builds the binary from the spec's
field layout with struct.pack; the parser (kernels/pdf.py
_parse_truetype_cmap) implements the spec's LOOKUP algorithm (segment
search, idDelta vs idRangeOffset/glyphIdArray indirection) — no shared code.
To exercise both parser paths from generated fixtures, every second segment
is emitted through the glyphIdArray indirection even when an idDelta would
encode it more compactly (real subsetters do the same).
"""

from __future__ import annotations

import struct

__all__ = ["build_truetype_cmap"]


def _segments(mapping: dict[int, int]) -> list[tuple[int, int, list[int]]]:
    """Group a unicode→GID map into (startCode, endCode, gids) runs of
    consecutive codepoints (GIDs inside a run may be arbitrary)."""
    segs: list[tuple[int, int, list[int]]] = []
    for code in sorted(mapping):
        gid = mapping[code]
        if segs and code == segs[-1][1] + 1:
            s, _, gids = segs[-1]
            gids.append(gid)
            segs[-1] = (s, code, gids)
        else:
            segs.append((code, code, [gid]))
    return segs


def _format4(mapping: dict[int, int]) -> bytes:
    segs = _segments(mapping)
    # the spec-required terminator segment: 0xFFFF/0xFFFF, idDelta=1
    end_codes: list[int] = []
    start_codes: list[int] = []
    id_deltas: list[int] = []
    # idRangeOffset values are in BYTES from the position of the
    # idRangeOffset[i] slot itself into glyphIdArray; compute after layout.
    use_array: list[bool] = []
    glyph_array: list[int] = []
    array_pos: list[int] = []  # index into glyph_array per array-segment

    for i, (s, e, gids) in enumerate(segs):
        start_codes.append(s)
        end_codes.append(e)
        # a run encodes via idDelta only when GIDs are consecutive too
        delta_ok = all(g == gids[0] + k for k, g in enumerate(gids))
        if delta_ok and i % 2 == 0:
            id_deltas.append((gids[0] - s) & 0xFFFF)
            use_array.append(False)
            array_pos.append(-1)
        else:
            id_deltas.append(0)
            use_array.append(True)
            array_pos.append(len(glyph_array))
            glyph_array.extend(gids)
    start_codes.append(0xFFFF)
    end_codes.append(0xFFFF)
    id_deltas.append(1)
    use_array.append(False)
    array_pos.append(-1)

    seg_count = len(end_codes)
    # idRangeOffset[i] slot position (bytes from subtable start):
    # 14 header + 2*segCount (endCode) + 2 (pad) + 2*segCount (startCode)
    # + 2*segCount (idDelta) + 2*i
    iro_base = 14 + 2 * seg_count + 2 + 2 * seg_count + 2 * seg_count
    glyph_base = iro_base + 2 * seg_count
    id_range_offsets: list[int] = []
    for i in range(seg_count):
        if use_array[i]:
            target = glyph_base + 2 * array_pos[i]
            id_range_offsets.append(target - (iro_base + 2 * i))
        else:
            id_range_offsets.append(0)

    length = glyph_base + 2 * len(glyph_array)
    search_range = 2
    entry_selector = 0
    while search_range * 2 <= 2 * seg_count:
        search_range *= 2
        entry_selector += 1
    body = struct.pack(
        ">7H", 4, length, 0, 2 * seg_count, search_range, entry_selector,
        2 * seg_count - search_range,
    )
    body += struct.pack(f">{seg_count}H", *end_codes)
    body += b"\x00\x00"  # reservedPad
    body += struct.pack(f">{seg_count}H", *start_codes)
    body += struct.pack(f">{seg_count}H", *id_deltas)
    body += struct.pack(f">{seg_count}H", *id_range_offsets)
    body += struct.pack(f">{len(glyph_array)}H", *glyph_array)
    assert len(body) == length
    return body


def _checksum(data: bytes) -> int:
    if len(data) % 4:
        data += b"\x00" * (4 - len(data) % 4)
    return sum(struct.unpack(f">{len(data) // 4}I", data)) & 0xFFFFFFFF


def build_truetype_cmap(mapping: dict[int, int]) -> bytes:
    """unicode codepoint -> glyph id  =>  minimal sfnt bytes (one ``cmap``
    table, one (3,1) windows-unicode format-4 subtable)."""
    if not mapping:
        raise ValueError("empty cmap mapping")
    sub = _format4(mapping)
    # cmap header: version 0, one encoding record (platform 3, encoding 1)
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    # sfnt: version 1.0, numTables=1
    header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    record = struct.pack(">4sIII", b"cmap", _checksum(cmap), 28, len(cmap))
    return header + record + cmap
