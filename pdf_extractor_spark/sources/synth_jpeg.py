"""Generator-side JPEG ENCODERS (fixture writer, ITU-T T.81).

Exists only to exercise the decoder kernel (kernels/jpeg.py) — shares no
code or table constants with it (generator/parser honesty rule;
kernels/jpeg.py reads every table from the DHT/DQT segments this writer
emits).  Dialects: baseline sequential (SOF0 — 4:4:4 or 4:2:0, optional
DRI/RST restart markers) and progressive (SOF2 — spectral selection and
the full successive-approximation scan script with EOBn run coding), all
8-bit, flat quantization tables, simple canonical Huffman tables (all DC
symbols at 4 bits, all AC symbols at 8 bits — valid, merely suboptimal).

Deterministic: same pixels in -> same bytes out.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_baseline", "encode_jpeg_progressive", "QUANT_STEP"]

QUANT_STEP = 8  # flat quant table value (both components)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# canonical tables: 12 DC symbols at length 4; 162 AC symbols at length 8
_DC_SYMS = list(range(12))
_AC_SYMS = [16 * r + s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
_AC_SYMS.sort()


def _canonical(bits_len: int, syms: list[int]) -> dict[int, tuple[int, int]]:
    return {sym: (bits_len, i) for i, sym in enumerate(syms)}


_DC_CODES = _canonical(4, _DC_SYMS)
_AC_CODES = _canonical(8, _AC_SYMS)


def _dct_mat() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    m[0, :] = 0.5 / np.sqrt(2)
    return m


_M = _dct_mat()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # keep only the unemitted low bits — otherwise the accumulator grows
        # without bound and big-int shifts make encoding quadratic
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _put_coeff(bw: _BitWriter, codes: dict, sym: int, v: int, s: int) -> None:
    length, code = codes[sym]
    bw.put(code, length)
    if s:
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _dht_segment(tc_th: int, bits_len: int, syms: list[int]) -> bytes:
    bits = [0] * 16
    bits[bits_len - 1] = len(syms)
    body = bytes([tc_th]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _pad_replicate(p: np.ndarray, ph: int, pw: int,
                   height: int, width: int) -> np.ndarray:
    pp = np.empty((ph, pw), dtype=np.float64)
    pp[:height, :width] = p
    pp[height:, :width] = p[-1:, :]  # replicate edges
    pp[:, width:] = pp[:, width - 1:width]
    return pp


def _zz_blocks(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Vectorized DCT + quantize + zigzag for ALL blocks of one plane (the
    per-block matrix products dominated corpus staging); the entropy
    bit-writer stays per-block/per-nonzero."""
    blocks = (
        p.reshape(bh, 8, bw, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _M, blocks, _M)
    zq = np.round(coef / QUANT_STEP).astype(np.int64).reshape(-1, 64)
    return zq[:, np.array(_ZZ)]


def encode_jpeg_baseline(width: int, height: int, pixels: bytes,
                         channels: int = 3,
                         subsampling: str = "444",
                         restart_interval: int = 0,
                         interleaved: bool = True) -> bytes:
    """8-bit pixels (packed, row-major) -> baseline JPEG bytes.

    ``subsampling='444'``: all components 1x1 (one block per MCU each).
    ``subsampling='420'`` (3-channel only): luma 2x2, chroma 1x1 with 2x2
    box-mean downsampling — the generic-MCU dialect the decoder's
    interleaved path must reassemble.
    ``restart_interval``: emit a DRI segment and an RSTn marker (cycling
    0-7, predictors reset, 1-padded byte alignment) every N MCUs.
    ``interleaved=False`` (3-channel only): emit one SOS per component,
    each rastering that component's TRUE block grid one data unit per MCU
    (T.81 A.2.2 non-interleaved baseline) — the dialect where a decoder
    that wrongly walks the padded interleaved grid desyncs."""
    if channels not in (1, 3):
        raise ValueError("1 or 3 channels only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    if subsampling == "420" and channels != 3:
        raise ValueError("420 needs 3 channels")
    if not interleaved and restart_interval:
        raise ValueError("non-interleaved variant does not emit DRI")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    arr = arr.astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [arr[..., 0]]

    # per-component sampling factors + block grids
    if subsampling == "420":
        sampf = [(2, 2), (1, 1), (1, 1)]
        mcus_x = (width + 15) // 16
        mcus_y = (height + 15) // 16
        comp_planes = []
        for ci, p in enumerate(planes):
            h, v = sampf[ci]
            full = _pad_replicate(p, mcus_y * 16, mcus_x * 16, height, width)
            if (h, v) == (1, 1):
                # 2x2 box-mean chroma downsample of the padded plane
                full = full.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
            comp_planes.append(full)
    else:
        sampf = [(1, 1)] * len(planes)
        mcus_x = (width + 7) // 8
        mcus_y = (height + 7) // 8
        comp_planes = [
            _pad_replicate(p, mcus_y * 8, mcus_x * 8, height, width)
            for p in planes
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT: one flat table used by all components
    q = bytes([QUANT_STEP] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        h, v = sampf[cid - 1]
        sof += bytes([cid, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: DC table 0, AC table 0 (shared by all components)
    out += _dht_segment(0x00, 4, _DC_SYMS)
    out += _dht_segment(0x10, 8, _AC_SYMS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI

    grids = []
    zz_all: list[np.ndarray] = []
    for (h, v), p in zip(sampf, comp_planes):
        bh, bw_ = mcus_y * v, mcus_x * h
        grids.append((bh, bw_))
        zz_all.append(_zz_blocks(p, bh, bw_))

    hmax = max(h for h, _ in sampf)
    vmax = max(v for _, v in sampf)

    def emit_block(bw: _BitWriter, zz: np.ndarray, pred_val: int) -> int:
        diff = int(zz[0]) - pred_val
        s = _category(diff)
        _put_coeff(bw, _DC_CODES, s, diff, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for i in range(1, last_nz + 1):
            val = int(zz[i])
            if val == 0:
                run += 1
                continue
            while run > 15:
                _put_coeff(bw, _AC_CODES, 0xF0, 0, 0)
                run -= 16
            s = _category(val)
            _put_coeff(bw, _AC_CODES, 16 * run + s, val, s)
            run = 0
        if last_nz < 63:
            _put_coeff(bw, _AC_CODES, 0x00, 0, 0)  # EOB
        return int(zz[0])

    if interleaved:
        # SOS: all components in one interleaved scan
        sos = bytes([ncomp])
        for cid in range(1, ncomp + 1):
            sos += bytes([cid, 0x00])
        sos += b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        bw = _BitWriter()
        pred = [0] * ncomp
        mcu_idx = 0
        for mby in range(mcus_y):
            for mbx in range(mcus_x):
                if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                    bw.flush()
                    out_rst = (mcu_idx // restart_interval - 1) % 8
                    bw.out += b"\xff" + bytes([0xD0 + out_rst])
                    pred = [0] * ncomp
                mcu_idx += 1
                for ci in range(ncomp):
                    h, v = sampf[ci]
                    _, bw_blocks = grids[ci]
                    for by in range(v):
                        for bx in range(h):
                            bi = (mby * v + by) * bw_blocks + (mbx * h + bx)
                            pred[ci] = emit_block(bw, zz_all[ci][bi], pred[ci])
        bw.flush()
        out += bw.out
    else:
        # One SOS per component; each rasters its TRUE block grid (T.81
        # A.2.2 non-interleaved: one data unit per MCU), NOT the padded
        # interleaved grid — a fresh DC predictor per scan.
        for ci in range(ncomp):
            h, v = sampf[ci]
            _, bw_blocks = grids[ci]
            tbw = (-(-width * h // hmax) + 7) // 8
            tbh = (-(-height * v // vmax) + 7) // 8
            sos = bytes([1, ci + 1, 0x00]) + b"\x00\x3f\x00"
            out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
            bw = _BitWriter()
            pred_val = 0
            for by in range(tbh):
                for bx in range(tbw):
                    pred_val = emit_block(bw, zz_all[ci][by * bw_blocks + bx],
                                          pred_val)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — spectral selection + successive approximation
# ---------------------------------------------------------------------------
# AC table for progressive scans additionally needs the EOBn symbols
# (r<<4 for r=1..14); still one canonical all-8-bit table (176 < 255 codes).
_AC_SYMS_PROG = sorted(set(_AC_SYMS + [r << 4 for r in range(1, 15)]))
_AC_CODES_PROG = _canonical(8, _AC_SYMS_PROG)


def _plan_components(width, height, pixels, channels, subsampling):
    """Shared front half of both encoders: color transform, sampling plan,
    padded planes, per-component quantized zigzag blocks + grids."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    arr = arr.astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [arr[..., 0]]
    if subsampling == "420":
        sampf = [(2, 2), (1, 1), (1, 1)]
        mcus_x, mcus_y = (width + 15) // 16, (height + 15) // 16
        comp_planes = []
        for ci, p in enumerate(planes):
            full = _pad_replicate(p, mcus_y * 16, mcus_x * 16, height, width)
            if sampf[ci] == (1, 1):
                full = full.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
            comp_planes.append(full)
    else:
        sampf = [(1, 1)] * len(planes)
        mcus_x, mcus_y = (width + 7) // 8, (height + 7) // 8
        comp_planes = [
            _pad_replicate(p, mcus_y * 8, mcus_x * 8, height, width)
            for p in planes
        ]
    grids, zz_all = [], []
    for (h, v), p in zip(sampf, comp_planes):
        bh, bw_ = mcus_y * v, mcus_x * h
        grids.append((bh, bw_))
        zz_all.append(_zz_blocks(p, bh, bw_))
    return sampf, mcus_x, mcus_y, grids, zz_all


def _headers(width, height, ncomp, sampf, sof_marker: bytes) -> bytearray:
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([QUANT_STEP] * 64)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        h, v = sampf[cid - 1]
        sof += bytes([cid, (h << 4) | v, 0])
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, 4, _DC_SYMS)
    return out


def _sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(scan_comps)])
    for cid in scan_comps:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_progressive(width: int, height: int, pixels: bytes,
                            channels: int = 3, subsampling: str = "444",
                            successive: bool = True) -> bytes:
    """Progressive (SOF2) baseline-huffman JPEG.

    ``successive=False``: pure spectral selection — DC scan then one full
    AC band scan per component.  ``successive=True``: a libjpeg-style
    script exercising BOTH progressive mechanisms — shifted DC first scan +
    DC refinement, split AC bands at Al=1, then an AC refinement pass to
    Al=0 (EOBn run coding with interleaved correction bits throughout)."""
    if channels not in (1, 3):
        raise ValueError("1 or 3 channels only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    if subsampling == "420" and channels != 3:
        raise ValueError("420 needs 3 channels")
    sampf, mcus_x, mcus_y, grids, zz_all = _plan_components(
        width, height, pixels, channels, subsampling)
    ncomp = len(grids)
    # true (non-interleaved) grids for AC scans
    hmax = max(h for h, _ in sampf)
    vmax = max(v for _, v in sampf)
    true_grids = []
    for (h, v) in sampf:
        tbw = (-(-width * h // hmax) + 7) // 8
        tbh = (-(-height * v // vmax) + 7) // 8
        true_grids.append((tbh, tbw))

    out = _headers(width, height, ncomp, sampf,
                   b"\xff\xc2")
    out += _dht_segment(0x10, 8, _AC_SYMS_PROG)

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        pred = [0] * ncomp
        for mby in range(mcus_y):
            for mbx in range(mcus_x):
                for ci in range(ncomp):
                    h, v = sampf[ci]
                    _, bwb = grids[ci]
                    for by in range(v):
                        for bx in range(h):
                            dc = int(zz_all[ci][(mby * v + by) * bwb
                                                + (mbx * h + bx)][0])
                            if refine:
                                bw.put((dc >> al) & 1, 1)
                            else:
                                val = dc >> al  # arithmetic shift per G.1.2.1
                                diff = val - pred[ci]
                                pred[ci] = val
                                s = _category(diff)
                                _put_coeff(bw, _DC_CODES, s, diff, s)
        bw.flush()
        return bytes(bw.out)

    def pt(v: int, al: int) -> int:
        """AC point transform: magnitude shift (truncation toward zero)."""
        return (abs(v) >> al) * (1 if v >= 0 else -1)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        tbh, tbw = true_grids[ci]
        _, bwb = grids[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                length, code = _AC_CODES_PROG[r << 4]
                bw.put(code, length)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(tbh):
            for bx in range(tbw):
                zz = zz_all[ci][by * bwb + bx]
                vals = [pt(int(zz[k]), al) for k in range(ss, se + 1)]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals[:last_nz + 1]):
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        _put_coeff(bw, _AC_CODES_PROG, 0xF0, 0, 0)
                        r -= 16
                    s = _category(v)
                    _put_coeff(bw, _AC_CODES_PROG, 16 * r + s, v, s)
                    r = 0
                if last_nz < len(vals) - 1:
                    eobrun += 1
        flush_eob()
        bw.flush()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        bw = _BitWriter()
        tbh, tbw = true_grids[ci]
        _, bwb = grids[ci]
        # Two correction-bit buffers (the jcphuff discipline): ``be_bits``
        # ride with the pending EOB-run symbol (corrections of blocks that
        # JOINED the run); ``br_bits`` ride with the current block's next
        # emitted symbol.  A single flush-everything buffer would emit a
        # block's leading corrections with an earlier EOB flush, outside
        # the decoder's advance window for them.
        eobrun = 0
        be_bits: list[int] = []
        br_bits: list[int] = []

        def emit_bits(buf: list[int]) -> None:
            for b in buf:
                bw.put(b, 1)
            buf.clear()

        def flush_eobrun_symbol():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                length, code = _AC_CODES_PROG[r << 4]
                bw.put(code, length)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0
                emit_bits(be_bits)

        for by in range(tbh):
            for bx in range(tbw):
                zz = zz_all[ci][by * bwb + bx]
                band = [int(zz[k]) for k in range(ss, se + 1)]
                # EOB cut: index of the last NEWLY-significant coefficient
                last_new = -1
                for i, v in enumerate(band):
                    if (abs(v) >> al) == 1:
                        last_new = i
                r = 0
                emitted = False
                for i, v in enumerate(band):
                    m = abs(v) >> al
                    if m == 0:
                        r += 1
                        continue
                    # ZRLs flush BEFORE any nonzero temp once r > 15 (but
                    # trailing runs fold into the EOB): otherwise correction
                    # bits land in the wrong decoder advance window
                    while r > 15 and i <= last_new:
                        flush_eobrun_symbol()
                        length, code = _AC_CODES_PROG[0xF0]
                        bw.put(code, length)
                        r -= 16
                        emit_bits(br_bits)
                        emitted = True
                    if m > 1:  # history nonzero -> correction bit
                        br_bits.append(m & 1)
                        continue
                    # newly significant (m == 1)
                    flush_eobrun_symbol()
                    length, code = _AC_CODES_PROG[(r << 4) | 1]
                    bw.put(code, length)
                    bw.put(1 if v > 0 else 0, 1)
                    emit_bits(br_bits)
                    r = 0
                    emitted = True
                if r > 0 or br_bits or not emitted:
                    # block tail (or whole block) joins the EOB run; its
                    # correction bits transfer to the run's buffer
                    eobrun += 1
                    be_bits.extend(br_bits)
                    br_bits.clear()
                    if eobrun == 0x7FFF:
                        flush_eobrun_symbol()
        flush_eobrun_symbol()
        bw.flush()
        return bytes(bw.out)

    all_ids = list(range(1, ncomp + 1))
    if successive:
        out += _sos(all_ids, 0, 0, 0, 1) + dc_scan(1, refine=False)
        for ci in range(ncomp):
            out += _sos([ci + 1], 1, 5, 0, 2) + ac_first_scan(ci, 1, 5, 2)
            out += _sos([ci + 1], 6, 63, 0, 2) + ac_first_scan(ci, 6, 63, 2)
        for ci in range(ncomp):
            out += _sos([ci + 1], 1, 63, 2, 1) + ac_refine_scan(ci, 1, 63, 2, 1)
            out += _sos([ci + 1], 1, 63, 1, 0) + ac_refine_scan(ci, 1, 63, 1, 0)
        out += _sos(all_ids, 0, 0, 1, 0) + dc_scan(0, refine=True)
    else:
        out += _sos(all_ids, 0, 0, 0, 0) + dc_scan(0, refine=False)
        for ci in range(ncomp):
            out += _sos([ci + 1], 1, 63, 0, 0) + ac_first_scan(ci, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
