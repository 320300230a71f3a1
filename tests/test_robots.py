"""Robots matcher F5 semantics (Google-matcher subset as exercised by the
reference via grobotstxt, src/crawler.go:249)."""

from grawler.robots import agent_allowed_one, parse_rules, rules_allow


def test_empty_allows_all():
    assert agent_allowed_one("", "/anything")
    assert agent_allowed_one(None, "/anything")


def test_wildcard_group_disallow():
    txt = "User-agent: *\nDisallow: /private/\n"
    assert not agent_allowed_one(txt, "/private/x")
    assert agent_allowed_one(txt, "/public/x")


def test_specific_agent_overrides_wildcard():
    txt = (
        "User-agent: grawler\nDisallow: /\n\n"
        "User-agent: *\nAllow: /\n"
    )
    assert not agent_allowed_one(txt, "/p/1", "grawler")
    assert rules_allow(parse_rules(txt, "otherbot"), "/p/1")


def test_longest_match_wins_allow_over_disallow():
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
    assert not agent_allowed_one(txt, "/private/secret")
    assert agent_allowed_one(txt, "/private/open/doc")


def test_tie_allow_wins():
    txt = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert agent_allowed_one(txt, "/dir/x")


def test_wildcard_and_anchor_patterns():
    txt = "User-agent: *\nDisallow: /*.pdf$\n"
    assert not agent_allowed_one(txt, "/docs/file.pdf")
    assert agent_allowed_one(txt, "/docs/file.pdf.html")


def test_multiple_agents_one_group():
    txt = "User-agent: a\nUser-agent: grawler\nDisallow: /x\n"
    assert not agent_allowed_one(txt, "/x/1", "grawler")
    assert agent_allowed_one(txt, "/y", "grawler")


def test_comments_and_case():
    txt = "USER-AGENT: *  # group\nDISALLOW: /a  # rule\n"
    assert not agent_allowed_one(txt, "/a/b")
