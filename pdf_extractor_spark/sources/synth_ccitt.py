"""Generator-side CCITT Group 4 (ITU-T T.6) and Group 3 1-D (T.4) encoder.

Code-disjoint from the decoder (kernels/ccitt.py): the modified-Huffman
tables below are transcribed from the published spec SEPARATELY and in a
different representation (run -> bit-string), so a transcription error on
either side fails the encode->decode round-trip tests loudly instead of
cancelling out.

Input: 8-bit grayscale bytes (0x00 black, 0xff white — anything < 0x80
counts as black), width, height.  Output: the CCITTFaxDecode-encoded
payload a PDF image XObject carries (BlackIs1 false semantics).
"""

from __future__ import annotations

# run length -> bit string; terminal codes 0-63 then makeup codes
_WHITE_BITS = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

_BLACK_BITS = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_BITS = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MAKEUPS = sorted(
    [r for r in _WHITE_BITS if r >= 64] + list(_EXT_BITS), reverse=True)


def _run_bits(run: int, white: bool) -> str:
    """MH encoding of one run: greedy makeup codes, then the terminal."""
    table = _WHITE_BITS if white else _BLACK_BITS
    bits = []
    while run >= 64:
        # greedy largest makeup <= run always leaves 0..63 or >= 64
        m = next(m for m in _MAKEUPS if m <= run)
        bits.append(_EXT_BITS[m] if m in _EXT_BITS else table[m])
        run -= m
    bits.append(table[run])
    return "".join(bits)


def _row_transitions(gray: bytes, width: int, y: int) -> list[int]:
    """Changing-element positions of row y (white -> black at even
    indices), from 8-bit grayscale (< 0x80 = black)."""
    base = y * width
    trans = []
    color = 0  # white
    for x in range(width):
        black = gray[base + x] < 0x80
        if (1 if black else 0) != color:
            trans.append(x)
            color ^= 1
    return trans


class _BitWriter:
    def __init__(self) -> None:
        self.chunks: list[str] = []

    def write(self, bits: str) -> None:
        self.chunks.append(bits)

    def tobytes(self) -> bytes:
        s = "".join(self.chunks)
        pad = (-len(s)) % 8
        s += "0" * pad
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def encode_g4(gray: bytes, width: int, height: int,
              with_eofb: bool = True) -> bytes:
    """Pure T.6 (Group 4) encoding of an 8-bit grayscale bilevel image."""
    if len(gray) != width * height:
        raise ValueError("gray buffer does not match width*height")
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(height):
        cur = _row_transitions(gray, width, y)
        a0 = -1
        color = 0
        ci = 0  # index into cur of the next changing element a1
        while a0 < width:
            a1 = cur[ci] if ci < len(cur) else width
            # b1/b2 against the reference line
            j = 0
            while j < len(ref) and ref[j] <= a0:
                j += 1
            if (j & 1) != color:
                j += 1
            b1 = ref[j] if j < len(ref) else width
            b2 = ref[j + 1] if j + 1 < len(ref) else width
            if b2 < a1:
                bw.write("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                d = a1 - b1  # vertical
                bw.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                          -1: "010", -2: "000010", -3: "0000010"}[d])
                a0, color = a1, color ^ 1
                ci += 1
            else:
                # horizontal: two runs from max(a0, 0)
                a2 = cur[ci + 1] if ci + 1 < len(cur) else width
                base = a0 if a0 > 0 else 0
                bw.write("001")
                bw.write(_run_bits(a1 - base, white=color == 0))
                bw.write(_run_bits(a2 - a1, white=color != 0))
                a0 = a2
                ci += 2
        ref = cur
    if with_eofb:
        bw.write("000000000001" * 2)
    return bw.tobytes()


def encode_g3_1d(gray: bytes, width: int, height: int) -> bytes:
    """T.4 one-dimensional (K = 0) encoding: each row is MH runs starting
    with a (possibly zero-length) white run."""
    if len(gray) != width * height:
        raise ValueError("gray buffer does not match width*height")
    bw = _BitWriter()
    for y in range(height):
        trans = _row_transitions(gray, width, y) + [width]
        pos = 0
        color = 0
        for t in trans:
            bw.write(_run_bits(t - pos, white=color == 0))
            pos = t
            color ^= 1
            if pos >= width:
                break
    return bw.tobytes()


def bilevel_gradient(width: int, height: int, seed: bytes) -> bytes:
    """Deterministic bilevel test raster as 8-bit gray (0x00 / 0xff), so
    CCITT twins can be compared pixel-for-pixel with a Flate-gray
    serialization.  The pattern is DOCUMENT-LIKE — thresholded smooth
    ramps with seed-dependent 16x16-block offsets giving multi-pixel
    runs — because run-length formats exist for scans with long runs; a
    per-pixel noise term would make every run ~2 px and the decode cost
    pathological rather than representative (it also left makeup codes
    under-exercised)."""
    import numpy as np

    n = len(seed)
    sarr = np.frombuffer(seed, dtype=np.uint8).astype(np.int64)
    xs = np.arange(width, dtype=np.int64)
    ys = np.arange(height, dtype=np.int64)
    row_base = sarr[(ys >> 3) % n][:, None]
    blk = sarr[(((xs[None, :] >> 4) + (ys[:, None] >> 4)) % n)]
    v = (xs[None, :] * 7 + ys[:, None] * 13 + row_base + blk) & 0xFF
    return np.where(v >= 0x80, 0xFF, 0).astype(np.uint8).tobytes()
