"""Baseline JPEG codec: generator-side encoder (sources/synth_jpeg.py) vs
the independent kernel decoder (kernels/jpeg.py)."""

import numpy as np
import pytest

from pdf_extractor_spark.kernels.jpeg import JpegError, decode_jpeg_baseline
from pdf_extractor_spark.sources.synth_jpeg import QUANT_STEP, encode_jpeg_baseline


def _gradient(w, h, ch):
    return bytes(((x * 3 + y * 7 + c * 11) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ch", [(8, 8, 1), (16, 8, 3), (17, 13, 3),
                                    (64, 48, 3), (31, 7, 1)])
def test_roundtrip_bounded_by_quantization(w, h, ch):
    data = encode_jpeg_baseline(w, h, _gradient(w, h, ch), ch)
    w2, h2, ch2, out = decode_jpeg_baseline(data)
    assert (w2, h2, ch2) == (w, h, ch)
    a = np.frombuffer(_gradient(w, h, ch), np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert np.abs(a - b).max() <= 3 * QUANT_STEP + 8


def test_block_constant_grayscale_is_exact():
    """DC-only blocks: a block-constant grayscale image survives the whole
    entropy + DCT path exactly (the entropy layer is lossless; the DCT of a
    constant block is a single DC coefficient)."""
    w = h = 32
    px = bytes(32 * ((x // 8 + (y // 8) * 4) % 8) + 16
               for y in range(h) for x in range(w))
    _, _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(w, h, px, 1))
    assert out == px


def test_deterministic():
    px = _gradient(24, 16, 3)
    assert encode_jpeg_baseline(24, 16, px, 3) == encode_jpeg_baseline(24, 16, px, 3)


def test_hostile_inputs_raise_jpeg_error():
    good = encode_jpeg_baseline(16, 16, _gradient(16, 16, 3), 3)
    bad_inputs = [
        b"",
        b"\xff\xd8\xff",
        good[: len(good) // 2],            # truncated mid-scan
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF
    ]
    for bad in bad_inputs:
        with pytest.raises(JpegError):
            decode_jpeg_baseline(bad)


def test_pdf_dct_images_decode_end_to_end():
    """Generator PDFs now embed /DCTDecode XObjects; the kernel extracts them
    with format 'jpeg' and the real codec decodes them to declared dims."""
    import random

    from pdf_extractor_spark.kernels.pdf import parse_pdf
    from pdf_extractor_spark.operators.multimodal import decode_image_real
    from pdf_extractor_spark.sources.synth import make_pdf

    n_jpeg = 0
    for doc_id in range(40):
        pdf_bytes, _ = make_pdf(random.Random((5 << 32) ^ doc_id), doc_id)
        for page in parse_pdf(pdf_bytes)["pages"]:
            for img in page["images"]:
                if img["format"] != "jpeg":
                    continue
                dec = decode_image_real(img["payload"])
                assert (dec["width"], dec["height"]) == (img["width"], img["height"])
                assert dec["channels"] == 3
                n_jpeg += 1
    assert n_jpeg >= 3  # ~25% of embedded images are JPEG


# --------------------------------------------------------------------------
# 4:2:0 chroma subsampling (round-3 item 3)
# --------------------------------------------------------------------------
def test_420_roundtrip_within_tolerance():
    import numpy as np

    for (w, h) in [(16, 16), (17, 19), (8, 8), (33, 2), (2, 33), (48, 31)]:
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = np.stack([2 * x + y, x + 2 * y, 30 + x + y], axis=-1).astype(
            np.uint8)
        data = encode_jpeg_baseline(w, h, img.tobytes(), 3, subsampling="420")
        w2, h2, ch, px = decode_jpeg_baseline(data)
        assert (w2, h2, ch) == (w, h, 3)
        dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
        assert np.abs(dec - img.astype(int)).max() <= 8


def test_420_sof_declares_2x2_luma():
    import numpy as np

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = encode_jpeg_baseline(16, 16, img.tobytes(), 3, subsampling="420")
    i = data.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1) then per-comp (id, samp, tq)
    assert data[i + 4 + 7] == 0x22  # luma 2x2
    assert data[i + 4 + 10] == 0x11 and data[i + 4 + 13] == 0x11  # chroma 1x1


def test_420_smaller_than_444():
    """Chroma subsampling must actually shrink the payload on chroma-heavy
    content (that's the point of the dialect)."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    d444 = encode_jpeg_baseline(64, 64, img.tobytes(), 3, subsampling="444")
    d420 = encode_jpeg_baseline(64, 64, img.tobytes(), 3, subsampling="420")
    assert len(d420) < len(d444)


def test_unsupported_sampling_factors_error_route():
    import numpy as np

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = bytearray(
        encode_jpeg_baseline(16, 16, img.tobytes(), 3, subsampling="420"))
    i = data.find(b"\xff\xc0")
    data[i + 4 + 7] = 0x41  # 4:1:1 luma — out of scope
    with pytest.raises(JpegError, match="sampling"):
        decode_jpeg_baseline(bytes(data))


def test_encoder_rejects_bad_subsampling_args():
    import numpy as np

    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, img.tobytes(), 1, subsampling="420")
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, img.tobytes(), 1, subsampling="422")


# --------------------------------------------------------------------------
# Restart markers (DRI/RSTn) — round-3 extension
# --------------------------------------------------------------------------
def test_restart_interval_roundtrip_identical_to_plain():
    import numpy as np

    x = np.arange(33)[None, :]
    y = np.arange(21)[:, None]
    img = np.stack(
        [np.minimum(2 * x + y, 255), np.minimum(x + 2 * y, 255),
         np.minimum(30 + x + y, 255)], axis=-1).astype(np.uint8)
    for sub in ("444", "420"):
        _, _, _, base = decode_jpeg_baseline(
            encode_jpeg_baseline(33, 21, img.tobytes(), 3, subsampling=sub))
        for ri in (1, 4, 9):
            data = encode_jpeg_baseline(33, 21, img.tobytes(), 3,
                                        subsampling=sub, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI present
            _, _, _, px = decode_jpeg_baseline(data)
            assert px == base  # restarts change framing, never pixels


def test_restart_sequence_error_detected():
    import numpy as np

    img = np.zeros((24, 24, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(24, 24, img.tobytes(), 3,
                                          restart_interval=1))
    # find the first RST0 marker in the scan and corrupt its index
    i = data.find(b"\xff\xd0")
    assert i > 0
    data[i + 1] = 0xD5
    with pytest.raises(JpegError, match="RST sequence"):
        decode_jpeg_baseline(bytes(data))


# --------------------------------------------------------------------------
# Progressive (SOF2) — round-3 extension
# --------------------------------------------------------------------------
def test_progressive_equals_sequential_decode():
    """Progressive scans carry the SAME quantized coefficients, so decoded
    pixels must be byte-identical to the sequential encoding's decode —
    both scan scripts, both subsamplings, color + grayscale."""
    import numpy as np

    from pdf_extractor_spark.sources.synth_jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    for (w, h) in [(16, 16), (37, 23), (8, 8), (17, 2)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            _, _, _, seq = decode_jpeg_baseline(
                encode_jpeg_baseline(w, h, img.tobytes(), 3, subsampling=sub))
            for succ in (False, True):
                prog = encode_jpeg_progressive(
                    w, h, img.tobytes(), 3, subsampling=sub, successive=succ)
                i = prog.find(b"\xff\xc2")
                assert 0 < i < 120  # SOF2 header present
                _, _, _, px = decode_jpeg_baseline(prog)
                assert px == seq
    gray = rng.integers(0, 256, (25, 9), dtype=np.uint8)
    _, _, _, seq = decode_jpeg_baseline(encode_jpeg_baseline(9, 25, gray.tobytes(), 1))
    for succ in (False, True):
        _, _, _, px = decode_jpeg_baseline(
            encode_jpeg_progressive(9, 25, gray.tobytes(), 1, successive=succ))
        assert px == seq


def test_progressive_long_eob_runs():
    """A large near-flat image produces multi-block EOB runs with interleaved
    correction bits — the G.1.2.3 paths that are easy to get subtly wrong."""
    import numpy as np

    from pdf_extractor_spark.sources.synth_jpeg import encode_jpeg_progressive

    img = np.full((96, 96, 3), 128, dtype=np.uint8)
    img[40, 40] = [255, 0, 255]  # one sharp impulse amid flat blocks
    _, _, _, seq = decode_jpeg_baseline(
        encode_jpeg_baseline(96, 96, img.tobytes(), 3))
    prog = encode_jpeg_progressive(96, 96, img.tobytes(), 3, successive=True)
    _, _, _, px = decode_jpeg_baseline(prog)
    assert px == seq


def test_unsupported_jpeg_modes_error_route():
    import numpy as np

    from pdf_extractor_spark.sources.synth_jpeg import encode_jpeg_progressive

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_progressive(16, 16, img.tobytes(), 3))
    i = data.find(b"\xff\xc2")
    data[i + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(JpegError, match="out of scope"):
        decode_jpeg_baseline(bytes(data))


def test_noninterleaved_baseline_equals_interleaved():
    """Baseline Ns=1 per-component scans (T.81 A.2.2 non-interleaved) must
    raster the component's TRUE block grid, not the padded interleaved MCU
    grid — for subsampled components the grids differ, so a decoder that
    takes the interleaved branch desyncs the Huffman stream (ADVICE r3,
    kernels/jpeg.py ns==1 branch).  The encoder emits one SOS per component
    independently; decode must be byte-identical to the interleaved twin."""
    rng = np.random.default_rng(7)
    for (w, h, sub) in [(24, 17, "420"), (16, 16, "420"), (19, 13, "444"),
                        (33, 9, "420")]:
        px = (rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) // 4 * 4)
        inter = decode_jpeg_baseline(
            encode_jpeg_baseline(w, h, px.tobytes(), 3, sub))
        nonint = decode_jpeg_baseline(
            encode_jpeg_baseline(w, h, px.tobytes(), 3, sub,
                                 interleaved=False))
        assert inter == nonint


def test_noninterleaved_rejects_restart():
    img = bytes(8 * 8 * 3)
    with pytest.raises(ValueError, match="non-interleaved"):
        encode_jpeg_baseline(8, 8, img, 3, "444", restart_interval=2,
                             interleaved=False)
