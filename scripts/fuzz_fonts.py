"""Structural-mutation fuzz campaign over every PDF font route.

The kernel totality contract: ``parse_pdf`` returns a result or raises
``PdfError`` — no other exception type may escape, on ANY input (the
error side-channel depends on it, SURVEY.md OP-32).  This script is the
reproducible form of the round-5 campaign that found and fixed seven
escape sites (hex-string garbage, invalid name #-escapes, \\8/\\9 octal
misparse, non-dict /Encoding //Info/trailer/page-tree objects, content
operands of the wrong type, /Length reference cycles, /Kids cycles —
each pinned in tests/test_pdf_kernel.py::test_round5_fuzz_findings_*).

Mutations per (route, dialect, [encryption]) document: 4 truncations,
70 random splices (1-24 bytes), 70 single-bit flips, 1 cross-document
splice.  Deterministic given --seeds.

Usage: python scripts/fuzz_fonts.py [--seeds 2025,777,...] [--quick]
Exit status 0 iff zero escapes.
"""

from __future__ import annotations

import random
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import PdfError, parse_pdf  # noqa: E402
from pdf_extractor_spark.sources.synth import make_pdf  # noqa: E402

ROUTES = [
    ("cid-rksj", "ja"), ("cid-gbk", "zh-hans"), ("cid-b5", "zh-hant"),
    ("cid-uhc", "ko"), ("cid-utf16", "ja"), ("cid-mixed", "ja"),
    ("cid-usecmap", "ja"), ("simple-winansi", "win"),
    ("simple-macroman", "win"), ("simple-diff", "ja"), ("simple-tu", "win"),
    ("cid", "latin"), ("cid-fontfile", "latin"), ("cid-ucs2", "zh-hans"),
    ("simple", "latin"), ("cid-cmap", "latin"),
    ("simple-standard", "std"),
]

#: a share of fuzz docs additionally wrap their pages in Form XObjects
WRAP_FORM_SHARE = 3  # every 3rd route index


def mutations(pdf: bytes, other: bytes, rng: random.Random,
              n_splice: int, n_flip: int) -> list[bytes]:
    muts = [pdf[:int(len(pdf) * f)] for f in (0.2, 0.5, 0.8, 0.97)]
    for _ in range(n_splice):
        j = rng.randrange(len(pdf))
        w = rng.randrange(1, 24)
        muts.append(pdf[:j] + bytes(rng.randrange(256) for _ in range(w))
                    + pdf[j + w:])
    for _ in range(n_flip):
        j = rng.randrange(len(pdf))
        muts.append(pdf[:j] + bytes([pdf[j] ^ (1 << rng.randrange(8))])
                    + pdf[j + 1:])
    muts.append(pdf[:len(pdf) // 2] + other[len(other) // 2:])
    return muts


def main() -> int:
    seeds = [2025, 777, 31337, 4242, 99999, 13, 555, 808, 1618, 2718]
    quick = "--quick" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--seeds":
            seeds = [int(x) for x in sys.argv[i + 1].split(",")]
    if quick:
        seeds = seeds[:2]
    n_splice = n_flip = 20 if quick else 70
    n = 0
    escapes: dict[str, int] = {}
    for seed in seeds:
        rng = random.Random(seed)
        for i, (font, cs) in enumerate(ROUTES):
            for dialect in ("classic", "modern"):
                encs = (None, "aes-128") if seed % 3 == 0 else (None,)
                for enc in encs:
                    pdf, _ = make_pdf(
                        random.Random(f"fuzz:{seed}:{font}:{dialect}:{enc}"),
                        i, dialect=dialect, font=font, charset=cs,
                        encrypt=enc,
                        wrap_form=(i % WRAP_FORM_SHARE == 0))
                    other, _ = make_pdf(
                        random.Random(f"fuzzb:{seed}:{i}"), i + 1,
                        dialect=dialect, font="simple")
                    for m in mutations(pdf, other, rng, n_splice, n_flip):
                        n += 1
                        try:
                            parse_pdf(m)
                        except PdfError:
                            pass
                        except Exception:
                            tb = traceback.format_exc().splitlines()
                            key = tb[-3].strip()[:110] + " | " + tb[-1][:60]
                            escapes[key] = escapes.get(key, 0) + 1
    print(f"{n} mutations, {sum(escapes.values())} escapes, "
          f"{len(escapes)} sites")
    for k, v in escapes.items():
        print(f"  {v} x {k}")
    return 1 if escapes else 0


if __name__ == "__main__":
    sys.exit(main())
