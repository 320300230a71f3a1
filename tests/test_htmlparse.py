"""HTML extraction C1-C6 semantics (reference: src/parsers/html.go,
src/parsers/text.go, src/utils/utils.go:123-141)."""

from grawler.htmlparse import normalize_text, parse_html

HTML = """
<html><head>
<title>My  Title</title>
<meta name="description" content="first desc">
<meta property="og:description" content="second desc">
<meta property="og:site_name" content="SiteName">
<link rel="icon" href="/fav.ico">
<link rel="icon" href="/fav2.ico">
</head><body>
<a href="http://a.example/1">one</a>
<p>visible text</p>
<a href="/rel/2">two</a>
<script>var hidden = 1;</script>
<noscript>also hidden</noscript>
<img src="/img/img-000001-0.png" alt="alt cap">
<figure><img src="/img/img-000002-1.rgb8"><figcaption>fig cap</figcaption></figure>
<a href="#frag">three</a>
</body></html>
"""


def test_links_in_document_order():
    d = parse_html(HTML, "http://h.example", "h.example")
    assert d["child_urls"] == ["http://a.example/1", "/rel/2", "#frag"]


def test_metadata_first_wins_and_icon_absolutized():
    d = parse_html(HTML, "http://h.example", "h.example")
    assert d["title"] == "My Title"
    assert d["description"] == "first desc"
    assert d["site_name"] == "SiteName"
    assert d["icon"] == "http://h.example/fav.ico"


def test_visible_text_skips_script_noscript():
    d = parse_html(HTML, "http://h.example", "h.example")
    assert "hidden" not in d["content"]
    assert "visible text" in d["content"]


def test_images_alt_and_figcaption():
    d = parse_html(HTML, "http://h.example", "h.example")
    assert d["images"] == [
        {"src": "/img/img-000001-0.png", "caption": "alt cap"},
        {"src": "/img/img-000002-1.rgb8", "caption": "fig cap"},
    ]


def test_defaults_from_content():
    d = parse_html("<html><body>" + "x" * 300 + "</body></html>",
                   "http://h.example", "h.example")
    assert d["title"] == "x" * 60
    assert d["description"] == "x" * 160
    assert d["site_name"] == "h.example"


def test_normalize_text():
    assert normalize_text("  a\nb\r c  ") == "a b c"
    assert normalize_text(None) == ""


def test_malformed_html_no_crash():
    d = parse_html("<a href='x'><<<>><img src=", "http://h.example", "h")
    assert d["child_urls"] == ["x"]
