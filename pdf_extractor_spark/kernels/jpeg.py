"""From-scratch JPEG (ITU-T T.81) DECODER — stdlib + numpy.

Scope: sequential baseline (SOF0) AND huffman progressive (SOF2 —
spectral selection and successive approximation, incl. EOBn run coding
and AC refinement correction bits), 8-bit, YCbCr or grayscale, with
4:4:4 (1x1), 4:2:0 (luma 2x2 + chroma 1x1 — the most common real-world
shape) and 4:2:2 (luma 2x1) sampling via generic MCU interleaving and
nearest-neighbor chroma upsampling — the dialects the fixture encoders
(sources/synth_jpeg.py) emit and the common output of real encoders.
Restart markers (DRI/RSTn, with sequence checking and predictor reset)
are supported; arithmetic coding, hierarchical mode, and 12-bit
precision raise ``JpegError`` (the error side-channel route, same
policy as the PDF kernel).

All Huffman and quantization tables are read FROM THE FILE's DHT/DQT
segments (as the spec requires), so this decoder shares no table constants
— and no code — with the generator-side encoder (generator/parser honesty
rule).  The entropy layer is exact: re-deriving the encoder's quantized
coefficients is lossless; only the DCT/color math is approximate, bounded
by the quantization step.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg_baseline"]


class JpegError(ValueError):
    """Malformed or out-of-scope JPEG input."""


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    d[0, :] = np.sqrt(1 / 8)
    return d


_D = _dct_matrix()

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


class _BitReader:
    """MSB-first entropy-coded segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("entropy data exhausted")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else None
            if nxt == 0x00:
                self.pos += 1
            elif nxt is None:
                raise JpegError("entropy data ends mid-marker (0xFF at EOF)")
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02x} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        # drop consumed high bits: an unmasked accumulator grows by 8 bits
        # per scan byte and turns entropy decoding quadratic
        self.acc &= (1 << self.n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def sync_restart(self, expect: int) -> None:
        """Byte-align, consume the RSTn marker, check the modulo-8 index
        (T.81 E.1.4: entropy data between restarts is 1-padded to a byte
        boundary; the marker sequence number cycles 0-7)."""
        self.acc = 0
        self.n = 0  # discard pad bits of the finished restart interval
        d = self.data
        # an all-ones pad byte is 0xFF and carries a stuffed 0x00 the bit
        # reader may not have consumed — step over any such pairs
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
            self.pos += 2
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF:
            raise JpegError(f"expected RST marker at {self.pos}")
        m = d[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise JpegError(f"expected RST marker, got 0xff{m:02x}")
        if m - 0xD0 != expect % 8:
            raise JpegError(
                f"RST sequence error: got {m - 0xD0}, want {expect % 8}")
        self.pos += 2


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical per spec Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if idx >= len(vals):
                raise JpegError("DHT: short value list")
            table[(length, code)] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    if table is None:
        raise JpegError("missing Huffman table for scan component")
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude value (spec F.12 EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _ScanState:
    """Mutable state shared by the per-block scan decoders."""

    __slots__ = ("pred", "eobrun")

    def __init__(self, ncomp: int) -> None:
        self.pred = [0] * ncomp
        self.eobrun = 0

    def reset(self) -> None:
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _decode_block_full(br, st, ci, dc_t, ac_t, zz) -> None:
    """Sequential (baseline) block: DC diff + full AC run-length band."""
    s = _huff_decode(br, dc_t)
    if s > 11:
        raise JpegError("bad DC category")
    diff = _extend(br.bits(s), s) if s else 0
    st.pred[ci] += diff
    zz[0] = st.pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_t)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC index overrun")
        zz[k] = _extend(br.bits(size), size)
        k += 1


def _decode_block_dc(br, st, ci, dc_t, zz, ah: int, al: int) -> None:
    """Progressive DC scan (G.1.2.1): first pass decodes shifted diffs;
    refinement passes add one bit per block."""
    if ah == 0:
        s = _huff_decode(br, dc_t)
        if s > 11:
            raise JpegError("bad DC category")
        diff = _extend(br.bits(s), s) if s else 0
        st.pred[ci] += diff
        zz[0] = st.pred[ci] << al
    else:
        if br.bit():
            zz[0] |= 1 << al


def _decode_block_ac_first(br, st, ac_t, zz, ss, se, al) -> None:
    """Progressive AC first scan (G.1.2.2): run-length band with EOBn run
    coding; values arrive shifted left by the point transform."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_t)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            st.eobrun = (1 << r) - 1
            if r:
                st.eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise JpegError("AC index overrun")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1


def _refine_nonzero(br, zz, k, al) -> None:
    if br.bit() and not (abs(zz[k]) & (1 << al)):
        zz[k] += (1 << al) if zz[k] >= 0 else -(1 << al)


def _decode_block_ac_refine(br, st, ac_t, zz, ss, se, al) -> None:
    """Progressive AC refinement scan (G.1.2.3): correction bits for known
    coefficients interleaved with newly-significant ±1 insertions."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_t)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # FULL run count here: the unified tail below refines the
                    # current block's remainder and decrements once for it
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refine symbol with size > 1")
                val = p1 if br.bit() else m1
            # advance: refine nonzero-history coeffs, count down r zeros
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(br, zz, k, al)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if st.eobrun > 0:
        # inside an EOB run every remaining nonzero coefficient still
        # receives its correction bit
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(br, zz, k, al)
            k += 1
        st.eobrun -= 1


def decode_jpeg_baseline(data: bytes) -> tuple[int, int, int, bytes]:
    """JPEG bytes -> (width, height, channels, packed 8-bit samples).

    Sequential baseline (SOF0) and progressive (SOF2 — spectral selection
    AND successive approximation, the full huffman-progressive feature set)
    both decode through a shared coefficient-domain core: scans accumulate
    quantized coefficients, one vectorized dequantize+IDCT finishes."""
    if not data.startswith(b"\xff\xd8"):
        raise JpegError("missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    progressive = False
    restart_interval = 0
    coefs: list[np.ndarray] = []  # per comp: (blocks, 64) zigzag-order int32
    dims: tuple | None = None

    def init_buffers():
        nonlocal coefs, dims
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
        for c in comps:
            # padded (interleaved) grid and true (non-interleaved) grid
            c["bw"] = mcus_x * c["h"]
            c["bh"] = mcus_y * c["v"]
            c["tbw"] = (-(-width * c["h"] // hmax) + 7) // 8
            c["tbh"] = (-(-height * c["v"] // vmax) + 7) // 8
        coefs = [
            np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32) for c in comps
        ]
        dims = (hmax, vmax, mcus_x, mcus_y)

    def decode_scan(body: bytes, scan_start: int) -> int:
        ns = body[0]
        scan_comps = []
        for c in range(ns):
            cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
            scan_comps.append({"id": cs, "dc": tabs >> 4, "ac": tabs & 0xF})
        ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
        ah, al = a >> 4, a & 0xF
        if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
            raise JpegError("spectral/approximation bits in a baseline scan")
        by_id = {c["id"]: i for i, c in enumerate(comps)}
        br = _BitReader(data, scan_start)
        st = _ScanState(len(comps))
        hmax, vmax, mcus_x, mcus_y = dims

        def block_zz(ci, by, bx):
            return coefs[ci][by * comps[ci]["bw"] + bx]

        def maybe_restart(unit_idx: int) -> None:
            if restart_interval and unit_idx and unit_idx % restart_interval == 0:
                br.sync_restart(unit_idx // restart_interval - 1)
                st.reset()

        if ns == 1:
            # Non-interleaved scan: raster over the component's TRUE grid,
            # one data unit per MCU (T.81 A.2.2).  This applies to baseline
            # Ns=1 scans in multi-component files too — a per-component
            # baseline scan must NOT walk the padded interleaved MCU grid
            # (h*v blocks per MCU), which would decode the wrong blocks for
            # any subsampled component and desync the Huffman stream.
            ci = by_id[scan_comps[0]["id"]]
            sc = scan_comps[0]
            comp = comps[ci]
            unit = 0
            for by in range(comp["tbh"]):
                for bx in range(comp["tbw"]):
                    maybe_restart(unit)
                    unit += 1
                    zz = block_zz(ci, by, bx)
                    if ss == 0 and se == 0:
                        _decode_block_dc(br, st, ci, dc_tabs.get(sc["dc"]),
                                         zz, ah, al)
                    elif ss == 0:
                        dc_t = dc_tabs.get(sc["dc"])
                        ac_t = ac_tabs.get(sc["ac"])
                        if dc_t is None or ac_t is None or qt.get(comp["tq"]) is None:
                            raise JpegError("missing table for scan component")
                        _decode_block_full(br, st, ci, dc_t, ac_t, zz)
                    elif ah == 0:
                        _decode_block_ac_first(br, st, ac_tabs.get(sc["ac"]),
                                               zz, ss, se, al)
                    else:
                        _decode_block_ac_refine(br, st, ac_tabs.get(sc["ac"]),
                                                zz, ss, se, al)
        else:
            if progressive and ss != 0:
                raise JpegError("interleaved AC scan is not allowed")
            unit = 0
            for mby in range(mcus_y):
                for mbx in range(mcus_x):
                    maybe_restart(unit)
                    unit += 1
                    for sc in scan_comps:
                        ci = by_id[sc["id"]]
                        comp = comps[ci]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                zz = block_zz(ci, mby * comp["v"] + by,
                                              mbx * comp["h"] + bx)
                                if progressive:
                                    _decode_block_dc(
                                        br, st, ci, dc_tabs.get(sc["dc"]),
                                        zz, ah, al)
                                else:
                                    dc_t = dc_tabs.get(sc["dc"])
                                    ac_t = ac_tabs.get(sc["ac"])
                                    q = qt.get(comp["tq"])
                                    if dc_t is None or ac_t is None or q is None:
                                        raise JpegError(
                                            "missing table for scan component")
                                    _decode_block_full(br, st, ci, dc_t,
                                                       ac_t, zz)
        # bit reader stops inside the entropy data; resume marker parsing at
        # the next marker byte (skipping any stuffed FF00 pairs / pad bytes)
        p = br.pos
        while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] != 0x00
        ):
            p += 1
        return p

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise JpegError("truncated marker segment")
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables out of scope")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise JpegError(f"precision {precision} out of scope")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                h, v = samp >> 4, samp & 0xF
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise JpegError(f"sampling factors {h}x{v} out of scope")
                comps.append({"id": cid, "tq": tq, "h": h, "v": v})
            if len(comps) not in (1, 3):
                raise JpegError(f"{len(comps)} components out of scope")
            init_buffers()
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF 0x{marker:02x} out of scope")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                vals = body[i + 17:i + 17 + nvals]
                tab = _build_huffman(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            if seg_len != 4:
                raise JpegError("bad DRI length")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if width is None:
                raise JpegError("SOS before SOF")
            pos = decode_scan(body, pos + 2 + seg_len)
            continue
        pos += 2 + seg_len

    if width is None or not coefs:
        raise JpegError("missing SOF/SOS")

    # one vectorized dequantize + IDCT per component
    hmax, vmax, mcus_x, mcus_y = dims
    planes = []
    for c, zzc in zip(comps, coefs):
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing quant table")
        blocks = np.zeros((zzc.shape[0], 64), dtype=np.int32)
        blocks[:, _ZIGZAG] = zzc
        coef = blocks.reshape(-1, 8, 8) * q
        pix = np.einsum("ji,njk,kl->nil", _D, coef.astype(np.float64), _D) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        planes.append(plane)

    # upsample subsampled components to full resolution (sample replication
    # — the T.81 default reconstruction), then crop to the declared size
    up = []
    for c, p in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        up.append(p[:height, :width])
    planes = up
    if len(comps) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()
