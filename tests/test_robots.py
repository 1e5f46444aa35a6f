"""robots.txt parsing + admission vs urllib.robotparser and RFC 9309 cases."""

import pytest

from arkouda_njit_spark.sources import parse_robots, robots_allowed

ROBOTS_A = """
# comments and blank lines are ignored
User-agent: *
Disallow: /private/
Allow: /private/public$
Disallow: /tmp*.bak
Disallow:

User-agent: megabot
Disallow: /
Allow: /welcome/
"""

ROBOTS_B = """
User-agent: alpha
User-agent: beta
Disallow: /shared/
"""


def _rules(spark, agent="*"):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)], "host string, body string"
    )
    return parse_robots(df, agent=agent)


def _verdicts(spark, urls, agent="*"):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    rows = robots_allowed(u, _rules(spark, agent)).collect()
    return {r["url"]: r["allowed"] for r in rows}


def test_wildcard_group_longest_match_and_anchors(spark):
    got = _verdicts(
        spark,
        [
            "https://a.example/",                      # no rule -> allowed
            "https://a.example/private/x",             # disallowed prefix
            "https://a.example/private/public",        # $-anchored allow wins (longer)
            "https://a.example/private/public/deeper", # $ does not match -> disallow
            "https://a.example/tmp123.bak",            # * wildcard
            "https://a.example/tmpdir/ok",             # .bak pattern misses
            "https://unlisted.example/anything",       # host without robots
        ],
    )
    assert got == {
        "https://a.example/": True,
        "https://a.example/private/x": False,
        "https://a.example/private/public": True,
        "https://a.example/private/public/deeper": False,
        "https://a.example/tmp123.bak": False,
        "https://a.example/tmpdir/ok": True,
        "https://unlisted.example/anything": True,
    }


def test_exact_agent_group_beats_star(spark):
    got = _verdicts(
        spark,
        ["https://a.example/private/x", "https://a.example/welcome/hi",
         "https://a.example/anything"],
        agent="megabot",
    )
    # megabot obeys ONLY its own group: / disallowed except /welcome/
    assert got == {
        "https://a.example/private/x": False,
        "https://a.example/welcome/hi": True,
        "https://a.example/anything": False,
    }


def test_multi_agent_group_and_unknown_agent(spark):
    for agent in ("alpha", "beta"):
        got = _verdicts(spark, ["https://b.example/shared/f"], agent=agent)
        assert got["https://b.example/shared/f"] is False, agent
    # no exact group and no * group on b.example for "gamma": allowed
    got = _verdicts(spark, ["https://b.example/shared/f"], agent="gamma")
    assert got["https://b.example/shared/f"] is True


def test_parity_with_urllib_robotparser(spark):
    import urllib.robotparser

    rp = urllib.robotparser.RobotFileParser()
    rp.parse(ROBOTS_A.splitlines())
    # urllib implements the 1997 first-match draft with NO $/* wildcard
    # semantics, so parity holds only on plain-prefix paths; the
    # wildcard/anchor cases are covered by the RFC 9309 tests above
    paths = ["/", "/private/x", "/private/sub/deep", "/docs/a", "/tmp/"]
    got = _verdicts(spark, [f"https://a.example{p}" for p in paths])
    for p in paths:
        assert got[f"https://a.example{p}"] == rp.can_fetch("somebot", p), p


def test_empty_disallow_matches_nothing(spark):
    rules = _rules(spark).collect()
    assert all(r["pattern"] != "^" for r in rules)
