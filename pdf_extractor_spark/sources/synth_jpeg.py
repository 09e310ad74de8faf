"""Generator-side baseline JPEG ENCODER (fixture writer, ITU-T T.81).

Exists only to exercise the decoder kernel (kernels/jpeg.py) — shares no
code or table constants with it (generator/parser honesty rule;
kernels/jpeg.py reads every table from the DHT/DQT segments this writer
emits).  Dialect: baseline sequential, 8-bit, 4:4:4 YCbCr (or grayscale),
flat quantization tables, simple canonical Huffman tables (all DC symbols
at 4 bits, all AC symbols at 8 bits — valid, merely suboptimal).

Deterministic: same pixels in -> same bytes out.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_baseline", "QUANT_STEP"]

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
                         restart_interval: int = 0) -> bytes:
    """8-bit pixels (packed, row-major) -> baseline JPEG bytes.

    ``subsampling='444'``: all components 1x1 (one block per MCU each).
    ``subsampling='420'`` (3-channel only): luma 2x2, chroma 1x1 with 2x2
    box-mean downsampling — the generic-MCU dialect the decoder's
    interleaved path must reassemble.
    ``restart_interval``: emit a DRI segment and an RSTn marker (cycling
    0-7, predictors reset, 1-padded byte alignment) every N MCUs."""
    if channels not in (1, 3):
        raise ValueError("1 or 3 channels only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    if subsampling == "420" and channels != 3:
        raise ValueError("420 needs 3 channels")
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
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    grids = []
    zz_all: list[np.ndarray] = []
    for (h, v), p in zip(sampf, comp_planes):
        bh, bw_ = mcus_y * v, mcus_x * h
        grids.append((bh, bw_))
        zz_all.append(_zz_blocks(p, bh, bw_))

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
                        zz = zz_all[ci][bi]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
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
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
