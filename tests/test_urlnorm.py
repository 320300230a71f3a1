"""Canonicalization F1/F6 semantics (reference: src/utils/utils.go:47-62,
161-183; src/crawler.go:204-220)."""

from grawler.urlnorm import canonicalize_one


def c(raw, base=None):
    return canonicalize_one(raw, base)


def test_absolute_passthrough():
    url, scheme, host, path, valid = c("http://a.example/p/1")
    assert (url, scheme, host, path, valid) == (
        "http://a.example/p/1", "http", "a.example", "/p/1", "1")


def test_fragment_dropped_query_kept():
    assert c("http://a.example/p/1#sec")[0] == "http://a.example/p/1"
    assert c("http://a.example/p/1?x=2")[0] == "http://a.example/p/1?x=2"


def test_reject_fragment_and_query_only():
    assert c("#top")[4] == "0"
    assert c("?sort=asc")[4] == "0"
    assert c("")[4] == "0"
    assert c(None)[4] == "0"


def test_relative_resolves_against_base():
    url, _, host, path, valid = c("/p/7", "http://b.example")
    assert url == "http://b.example/p/7" and valid == "1"
    assert host == "b.example" and path == "/p/7"


def test_relative_without_base_invalid():
    assert c("/p/7")[4] == "0"


def test_percent_decode():
    assert c("http://a.example/%70/3")[0] == "http://a.example/p/3"


def test_case_normalization():
    url, scheme, host, _, _ = c("HTTP://A.Example/Path")
    assert scheme == "http" and host == "a.example"
    assert url == "http://a.example/Path"  # path case preserved


def test_non_http_scheme_still_parsed_but_filterable():
    _, scheme, host, _, valid = c("mailto:a@b.c")
    assert valid == "0"  # no netloc
    _, scheme2, _, _, valid2 = c("ftp://x.example/f")
    assert valid2 == "1" and scheme2 == "ftp"  # F2 allowlist rejects later
