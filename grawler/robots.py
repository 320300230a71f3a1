"""robots.txt matcher + freshness predicate (operators F5/S4/S5/C9).

Reimplements the subset of the Google robots matcher the reference exercises
via grobotstxt (/root/reference/src/crawler.go:249): user-agent group
selection (specific agent overrides '*'), Allow/Disallow longest-match-wins
with Allow winning ties, '*' wildcards and '$' end anchors in rule paths.
Staleness: fetched_ts older than ~45 days -> refetch
(/root/reference/src/crawler.go:230, AddDate(0,-1,-15)).

Vectorized: one pandas UDF over (robots_txt, path); parsed rule sets are
memoized per distinct robots_txt within each Arrow batch, so the per-batch
cost is ~O(distinct hosts), not O(rows).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


def parse_rules(robots_txt: str | None, agent: str = "grawler"):
    """-> list of (allow: bool, pattern: str) for the best-matching UA group."""
    if not robots_txt:
        return []
    groups: dict[str, list] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw_line in robots_txt.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            for a in current_agents:
                if value:
                    groups.setdefault(a, []).append((key == "allow", value))
                # empty Disallow == allow everything: no rule needed
        else:
            last_was_agent = False
    agent = agent.lower()
    for name in (agent, "*"):
        if name in groups:
            return groups[name]
    # longest-prefix agent match (e.g. 'grawler/1.0' group matches 'grawler')
    best = None
    for name, rules in groups.items():
        if name != "*" and (agent.startswith(name) or name.startswith(agent)):
            if best is None or len(name) > len(best[0]):
                best = (name, rules)
    return best[1] if best else []


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


def rules_allow(rules, path: str) -> bool:
    """Longest-match wins; Allow wins ties; no match -> allowed."""
    if not path.startswith("/"):
        path = "/" + path
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if _pattern_re(pattern).match(path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len, best_allow = plen, allow
    return best_allow


def agent_allowed_one(
    robots_txt: str | None, path: str, agent: str = "grawler"
) -> bool:
    return rules_allow(parse_rules(robots_txt, agent), path or "/")


def make_agent_allowed_udf(agent: str = "grawler"):
    @pandas_udf(BooleanType())
    def agent_allowed(robots_txt: pd.Series, path: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for txt, p in zip(robots_txt, path):
            key = txt
            rules = cache.get(key)
            if rules is None:
                rules = parse_rules(txt, agent)
                cache[key] = rules
            out.append(rules_allow(rules, p or "/"))
        return pd.Series(out, dtype=bool)

    return agent_allowed
