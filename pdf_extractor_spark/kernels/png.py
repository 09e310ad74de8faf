"""From-scratch stdlib PNG codec + deterministic pixel ops (SURVEY OP-63;
reference image_extractor.py:131-140 PNG-normalize, simple_extract.py:52-78
enhance/thumbnail).

No Pillow ships in this container, and library resampling is
version-dependent anyway — so the codec is built here on ``zlib`` + pure
integer math, making every output byte a deterministic function of the
input:

* ``encode_png`` / ``encode_png_palette`` / ``decode_png`` — 8-bit gray /
  gray+alpha / RGB / RGBA / indexed-palette (PLTE + optional tRNS → RGBA),
  sequential or Adam7-interlaced; row-filter None on encode, all five PNG
  filters understood on decode (same filter algebra as the PDF xref-stream
  predictor, kernels/pdf.py);
* ``enhance`` — contrast x1.3 around the 128 midpoint then a 3x3 unsharp
  pass (x1.5), the reference's ImageEnhance recipe restated as exact
  integer math;
* ``thumbnail`` — aspect-preserving box-filter downscale bounded to
  max_side x max_side (the reference's 600x600 LANCZOS seam; box filter is
  chosen because it is exactly reproducible everywhere).

These power operators/multimodal.py's REAL codec path for the payload
formats the corpus actually carries (raw RGB from PDF XObjects, PNG);
DCT/JPX (JPEG) stays a declared out-of-scope seam.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "PngError",
    "encode_png",
    "encode_png_palette",
    "decode_png",
    "enhance",
    "thumbnail",
]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


class PngError(ValueError):
    """Malformed or out-of-scope PNG input."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _pass_dims(width: int, height: int):
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        yield (x0, y0, dx, dy, pw, ph)


def _serialize_rows(pixels: bytes, width: int, height: int, spp: int,
                    interlace: bool) -> bytes:
    """Pixels -> filtered scanline stream (filter 0), sequential or Adam7."""
    stride = width * spp
    raw = bytearray()
    if not interlace:
        for y in range(height):
            raw.append(0)
            raw += pixels[y * stride:(y + 1) * stride]
        return bytes(raw)
    for (x0, y0, dx, dy, pw, ph) in _pass_dims(width, height):
        if pw == 0 or ph == 0:
            continue
        for py in range(ph):
            raw.append(0)
            sy = y0 + py * dy
            for px in range(pw):
                sx = x0 + px * dx
                off = (sy * width + sx) * spp
                raw += pixels[off:off + spp]
    return bytes(raw)


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3,
               interlace: bool = False) -> bytes:
    """8-bit image -> PNG bytes (filter 0 rows, one zlib IDAT; optional
    Adam7 interlacing).  ``pixels`` is row-major packed samples,
    len == width*height*channels.  channels: 1=gray, 2=gray+alpha, 3=RGB,
    4=RGBA."""
    if channels not in (1, 2, 3, 4):
        raise PngError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise PngError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = _serialize_rows(pixels, width, height, channels, interlace)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlace else 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(width: int, height: int, indices: bytes,
                       palette: list[tuple[int, int, int]],
                       trns: list[int] | None = None,
                       interlace: bool = False) -> bytes:
    """Indexed-color PNG (color type 3): ``indices`` is one byte per pixel
    into ``palette`` (RGB triples); ``trns`` optionally gives per-entry
    alpha (shorter than the palette = remaining entries opaque)."""
    if width <= 0 or height <= 0:
        raise PngError("zero-area image")
    if len(indices) != width * height:
        raise PngError("index buffer size mismatch")
    if not 1 <= len(palette) <= 256 or max(indices) >= len(palette):
        raise PngError("palette size / index out of range")
    raw = _serialize_rows(indices, width, height, 1, interlace)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0,
                       1 if interlace else 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return out


def _unfilter(data: bytes, width: int, height: int, channels: int,
              pos: int = 0) -> tuple[bytes, int]:
    """Unfilter ``height`` scanlines of ``width``-pixel rows starting at
    ``pos``; returns (pixels, position after the last row) so interlace
    passes can share one IDAT stream."""
    bpp = channels
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    for _ in range(height):
        if pos >= len(data):
            raise PngError("truncated IDAT")
        tag = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + stride])
        if len(row) < stride:
            raise PngError("short row")
        if tag == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif tag != 0:
            raise PngError(f"unknown row filter {tag}")
        out += row
        prev = row
        pos += 1 + stride
    return bytes(out), pos


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, packed 8-bit samples).
    8-bit gray / gray+alpha / RGB / RGBA / PALETTE (PLTE, optional tRNS ->
    RGBA), sequential or Adam7-interlaced; 16-bit stays out of scope."""
    if not data.startswith(_SIG):
        raise PngError("missing PNG signature")
    pos = len(_SIG)
    width = height = None
    channels = None
    ctype = None
    interlaced = False
    idat = bytearray()
    plte: bytes = b""
    trns: bytes = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        if tag == b"IHDR":
            if len(body) != 13:
                raise PngError(f"bad IHDR length {len(body)}")
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"bit depth {depth} out of scope (8 only)")
            channels = 1 if ctype == 3 else _CHANNELS.get(ctype)
            if channels is None:
                raise PngError(f"color type {ctype} out of scope")
            interlaced = bool(ilace)
        elif tag == b"PLTE":
            if length % 3:
                raise PngError("bad PLTE length")
            plte = bytes(body)
        elif tag == b"tRNS":
            trns = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or channels is None:
        raise PngError("no IHDR")
    # Bomb guard: the decoded size is fully determined by IHDR (pixels +
    # one filter tag per row; Adam7's seven sub-images add < 2*height rows
    # total), so decompress STREAMING up to that bound + 1 and error-route
    # beyond — hostile IDAT can never materialize more than the header
    # declares.  A hostile IHDR is bounded by the absolute pixel cap.
    if width * height * channels > 256 << 20:
        raise PngError(f"declared image too large: {width}x{height}")
    cap = width * height * channels + 2 * (height + 8) + 1024
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), cap + 1)
        if len(raw) <= cap:
            raw += d.flush(cap + 1 - len(raw))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) > cap:
        raise PngError("IDAT inflates beyond the declared geometry")

    if not interlaced:
        px, _ = _unfilter(raw, width, height, channels)
    else:
        # Adam7: seven independently-filtered sub-images share the IDAT
        # stream; scatter each pass into the full-resolution grid
        out = bytearray(width * height * channels)
        p = 0
        for (x0, y0, dx, dy, pw, ph) in _pass_dims(width, height):
            if pw == 0 or ph == 0:
                continue
            sub, p = _unfilter(raw, pw, ph, channels, p)
            for py in range(ph):
                sy = y0 + py * dy
                for pxi in range(pw):
                    sx = x0 + pxi * dx
                    src = (py * pw + pxi) * channels
                    dst = (sy * width + sx) * channels
                    out[dst:dst + channels] = sub[src:src + channels]
        px = bytes(out)

    if ctype == 3:  # palette -> RGB, or RGBA when tRNS present
        if not plte:
            raise PngError("palette PNG without PLTE")
        n_entries = len(plte) // 3
        out_ch = 4 if trns else 3
        rgb = bytearray(width * height * out_ch)
        for i, idx in enumerate(px):
            if idx >= n_entries:
                raise PngError(f"palette index {idx} out of range")
            o = i * out_ch
            rgb[o:o + 3] = plte[3 * idx:3 * idx + 3]
            if trns:
                rgb[o + 3] = trns[idx] if idx < len(trns) else 255
        return width, height, out_ch, bytes(rgb)
    return width, height, channels, px


# --------------------------------------------------------------------------
# Deterministic pixel operations (integer math only)
# --------------------------------------------------------------------------
def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def enhance(width: int, height: int, channels: int, pixels: bytes,
            contrast_num: int = 13, contrast_den: int = 10,
            sharp_num: int = 15, sharp_den: int = 10) -> bytes:
    """Reference recipe (simple_extract.py:64-68): contrast x1.3 then
    sharpness x1.5 — as exact rational integer math.

    Contrast: p' = 128 + (p - 128) * 13/10 (floor division — rounds toward
    negative infinity, which differs from truncation for pixels below 128;
    the SQL oracle states the same floor semantics — clamped).  Sharpness: unsharp mask against the 3x3 box blur,
    p'' = blur + (p' - blur) * 15/10, edge pixels use clamped neighbors."""
    stride = width * channels
    con = bytearray(len(pixels))
    for i, p in enumerate(pixels):
        con[i] = _clamp(128 + ((p - 128) * contrast_num) // contrast_den)
    out = bytearray(len(pixels))
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                acc = 0
                for dy in (-1, 0, 1):
                    yy = min(max(y + dy, 0), height - 1)
                    for dx in (-1, 0, 1):
                        xx = min(max(x + dx, 0), width - 1)
                        acc += con[yy * stride + xx * channels + c]
                blur = acc // 9
                p = con[y * stride + x * channels + c]
                out[y * stride + x * channels + c] = _clamp(
                    blur + ((p - blur) * sharp_num) // sharp_den
                )
    return bytes(out)


def thumbnail(width: int, height: int, channels: int, pixels: bytes,
              max_side: int = 600) -> tuple[int, int, bytes]:
    """Aspect-preserving box-filter downscale so max(w, h) <= max_side
    (never upscales — the PIL .thumbnail contract the reference relies on).
    Each output pixel is the integer mean of its source box."""
    if width <= max_side and height <= max_side:
        return width, height, pixels
    if width >= height:
        tw = max_side
        th = max(1, (height * max_side) // width)
    else:
        th = max_side
        tw = max(1, (width * max_side) // height)
    stride = width * channels
    out = bytearray(tw * th * channels)
    for ty in range(th):
        y0, y1 = (ty * height) // th, max(((ty + 1) * height) // th, (ty * height) // th + 1)
        for tx in range(tw):
            x0, x1 = (tx * width) // tw, max(((tx + 1) * width) // tw, (tx * width) // tw + 1)
            n = (y1 - y0) * (x1 - x0)
            for c in range(channels):
                acc = 0
                for y in range(y0, y1):
                    base = y * stride
                    for x in range(x0, x1):
                        acc += pixels[base + x * channels + c]
                out[(ty * tw + tx) * channels + c] = acc // n
    return tw, th, bytes(out)
