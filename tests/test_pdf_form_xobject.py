"""Form XObjects (PDF 32000-1 §8.10): the `Do` operator on a /Subtype
/Form stream.  Real pages carry much of their text inside form XObjects
(letterheads, stamped content, generated reports); until round 5 the
kernel ignored `Do`, silently DROPPING that text — worse than an
error-route.  The reference extracts it via MuPDF (get_text walks the
full display list, text_extractor.py:51-53).

Load-bearing generator design (sources/synth.py wrap_form): odd-indexed
lines live inside the form, rendered _FORM_DY=500 units below their
final position and translated back by the form /Matrix, INTERLEAVED with
the direct lines — reading order is only correct if the parser executes
Do AND composes the Matrix; the form's text uses /F2 from the FORM's own
/Resources, so resource scoping is exercised too; page images move into
the form's resources, so the image walk must recurse.
"""

import random
import sys
import zlib
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extractor_spark.kernels.pdf import PdfError, parse_pdf
from pdf_extractor_spark.sources.synth import make_pdf

_PAIRS = [("simple", "latin"), ("cid-ucs2", "ja"), ("simple-winansi", "win"),
          ("cid-mixed", "ja"), ("cid", "latin")]


class TestFormTwins:
    @pytest.mark.parametrize("font,charset", _PAIRS)
    @pytest.mark.parametrize("dialect", ["classic", "modern"])
    def test_twin_text_identical(self, font, charset, dialect):
        doc_id = zlib.crc32(f"{font}:{charset}:{dialect}".encode()) % 1000
        ru = parse_pdf(make_pdf(
            random.Random(f"form-twin:{font}:{doc_id}"), doc_id,
            dialect=dialect, font=font, charset=charset)[0])
        rf = parse_pdf(make_pdf(
            random.Random(f"form-twin:{font}:{doc_id}"), doc_id,
            dialect=dialect, font=font, charset=charset, wrap_form=True)[0])
        assert [p["text"] for p in ru["pages"]] == \
               [p["text"] for p in rf["pages"]]
        assert ru["n_pages"] == rf["n_pages"]
        assert ru["metadata"] == rf["metadata"]

    def test_form_images_found(self):
        # every serialized /Subtype /Image must surface even though it
        # lives inside the form's own /Resources
        found_any = False
        for doc_id in range(8):
            pdf, _ = make_pdf(random.Random(f"formimg:{doc_id}"), doc_id,
                              n_pages=3, wrap_form=True)
            r = parse_pdf(pdf)
            n_found = sum(len(p["images"]) for p in r["pages"])
            assert n_found == pdf.count(b"/Subtype /Image")
            found_any = found_any or n_found > 0
        assert found_any  # the check is not vacuous

    def test_matrix_is_load_bearing(self):
        # zero the /Matrix translation (same byte length): form text drops
        # 500 units and the interleave breaks — parse must still succeed
        # but the text ORDER must differ from the unwrapped twin
        pdf, lines = make_pdf(random.Random("formmx:1"), 1, n_pages=1,
                              with_images=False, wrap_form=True)
        assert b"/Matrix [1 0 0 1 0 500.0]" in pdf
        flat = pdf.replace(b"/Matrix [1 0 0 1 0 500.0]",
                           b"/Matrix [1 0 0 1 0 000.0]")
        r = parse_pdf(flat)
        expected = "\n".join(lines[0])
        assert r["pages"][0]["text"] != expected
        # all the words are still there — only the order moved
        assert sorted(r["pages"][0]["text"].split()) == \
               sorted(expected.split())

    def test_do_without_form_is_ignored(self):
        # Do naming an IMAGE XObject (or nothing) must not disturb text
        pdf, lines = make_pdf(random.Random("formdo:2"), 2, n_pages=1)
        r = parse_pdf(pdf)
        assert r["pages"][0]["text"] == "\n".join(lines[0])

    def test_self_referencing_form_error_routes(self):
        # a form whose content invokes itself must hit the depth cap, not
        # recurse forever
        content = b"q /Fm0 Do Q"
        fz = zlib.compress(content)
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Contents 4 0 R /Resources << /XObject << /Fm0 5 0 R >> "
               b">> >>",
            4: b"<< /Length %d >>\nstream\n%s\nendstream"
               % (len(content), content),
            5: b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
               b"/Resources << /XObject << /Fm0 5 0 R >> >> "
               b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(fz)
               + fz + b"\nendstream",
        }
        out = [b"%PDF-1.4\n"]
        pos = len(out[0])
        offs = {}
        for n in sorted(objs):
            blob = b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
            offs[n] = pos
            out.append(blob)
            pos += len(blob)
        xref = [b"xref\n0 6\n0000000000 65535 f \n"]
        for n in sorted(objs):
            xref.append(b"%010d 00000 n \n" % offs[n])
        out.append(b"".join(xref))
        out.append(b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n"
                   b"%%%%EOF" % pos)
        with pytest.raises(PdfError):
            parse_pdf(b"".join(out))

    def test_encrypted_form(self):
        pdf, lines = make_pdf(random.Random("formenc:3"), 3,
                              dialect="classic", wrap_form=True,
                              encrypt="rc4-128")
        r = parse_pdf(pdf)
        assert [p["text"] for p in r["pages"]] == \
               ["\n".join(ls) for ls in lines]
