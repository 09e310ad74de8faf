"""OP-64 DOM boilerplate-stripper kernel tests (FIXTURES.md dialect A)."""

from pdf_extractor_spark.kernels.dom import parse_html

ARTICLE = b"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>T1</title>
<script>var x = "<p>script junk</p>";</script><style>p { color: red }</style>
</head><body>
<nav><a href="/h">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<h1>Real Headline Here</h1>
<p>This opening paragraph carries the actual article body with plenty of words
to clear the content-word threshold easily.</p>
<p>Short bridge.</p>
<p>The closing paragraph also has enough words to be classified as genuine
main content by the density heuristics.</p>
<footer>Copyright <a href="/legal">Legal</a></footer>
</body></html>"""


def test_main_text_keeps_content_drops_boilerplate():
    r = parse_html(ARTICLE)
    assert "Real Headline Here" in r["text"]
    assert "actual article body" in r["text"]
    assert "Short bridge." in r["text"]  # sandwiched-block smoothing
    assert "Home" not in r["text"]
    assert "Copyright" not in r["text"]
    assert "script junk" not in r["text"]
    assert r["title"] == "T1"


def test_links_harvested_including_boilerplate():
    # link harvesting keeps every href (reference extract_cam_followers.py:96-99)
    r = parse_html(ARTICLE)
    assert r["links"] == ["/h", "/a", "/c", "/legal"]


def test_link_density_classification():
    page = (b"<html><body>"
            b"<div><a href='/1'>one two three four five six seven eight nine ten</a></div>"
            b"<div>plain text block with exactly enough words to pass the content bar"
            b" one two three</div>"
            b"</body></html>")
    r = parse_html(page)
    by_text = {b["text"][:10]: b for b in r["blocks"]}
    assert by_text["one two th"]["is_content"] is False  # pure-link block
    assert by_text["plain text"]["is_content"] is True


def test_tables_ragged_with_none_cells():
    page = (b"<html><body><table>"
            b"<tr><th>h1</th><th>h2</th></tr>"
            b"<tr><td>a  b</td><td></td></tr>"
            b"<tr><td>c</td></tr>"
            b"</table></body></html>")
    r = parse_html(page)
    assert r["tables"] == [[["h1", "h2"], ["a  b", None], ["c"]]]


def test_nested_table():
    page = (b"<html><body><table><tr><td>outer"
            b"<table><tr><td>inner</td></tr></table>"
            b"</td><td>x</td></tr></table></body></html>")
    r = parse_html(page)
    assert len(r["tables"]) == 2  # inner emitted first (closes first)
    assert ["inner"] in r["tables"][0]


def test_entities_decoded():
    page = "<html><body><p>R&amp;D caf&eacute; &#8212; words words words words words words.</p></body></html>".encode()
    r = parse_html(page)
    assert "R&D café —" in r["text"]


def test_charset_meta_latin1():
    page = '<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9 words words words words words words words</p></body></html>'.encode("latin-1")
    r = parse_html(page)
    assert r["encoding"] == "latin-1"
    assert "café" in r["text"]


def test_utf16_bom_html():
    page = "<html><body><p>unicode content words words words words words words words</p></body></html>".encode("utf-16")
    r = parse_html(page)
    assert "unicode content" in r["text"]


def test_empty_body_and_all_boiler():
    assert parse_html(b"<html><body></body></html>")["text"] == ""
    r = parse_html(b"<html><body><nav><a href='/a'>a</a></nav></body></html>")
    assert r["text"] == ""
    assert r["links"] == ["/a"]


def test_deterministic():
    assert parse_html(ARTICLE) == parse_html(ARTICLE)


def test_crawl_meta_harvest():
    page = (b"<html><head>"
            b"<meta name='robots' content=' NoIndex ,  NOFOLLOW '>"
            b"<link rel='canonical' href=' https://ex.org/a '>"
            b"<meta name='robots' content='all'>"              # first wins
            b"<link rel='canonical' href='https://ex.org/b'>"  # first wins
            b"</head><body><p>words words words words words words words words"
            b"</p></body></html>")
    r = parse_html(page)
    assert r["canonical"] == "https://ex.org/a"
    assert r["robots"] == "noindex, nofollow"


def test_crawl_meta_absent_is_none():
    r = parse_html(b"<html><head><meta charset='utf-8'><link rel='stylesheet'"
                   b" href='/x.css'><meta name='viewport' content='w'></head>"
                   b"<body><p>words words words words words words words words"
                   b"</p></body></html>")
    assert r["canonical"] is None and r["robots"] is None


def test_crawl_meta_empty_values_ignored():
    r = parse_html(b"<html><head><meta name='robots' content=' , '>"
                   b"<link rel='canonical' href='  '></head><body></body></html>")
    assert r["canonical"] is None and r["robots"] is None
