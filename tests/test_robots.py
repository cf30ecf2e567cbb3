"""robots.txt parsing (RFC 9309) and corpus-wide politeness filtering."""

from __future__ import annotations

from webpagesgraphdatabase_spark import robots as R

ROBOTS = """
# comments are ignored
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Allow: /tmp/public*
Disallow: /*.pdf$
Allow: /

User-agent: badbot
Disallow: /
"""


def test_parse_robots_group_selection():
    # fallback group
    star = R.parse_robots(ROBOTS, "somecrawler")
    assert (False, "/tmp/") in star and (True, "/tmp/public*") in star
    assert (False, "/*.pdf$") in star and (True, "/") in star
    # most specific matching token wins
    assert R.parse_robots(ROBOTS, "googlebot-images") == [(False, "/private/")]
    assert R.parse_robots(ROBOTS, "badbot") == [(False, "/")]
    # empty / commentary-only file: no rules
    assert R.parse_robots("# nothing here") == []
    # empty Disallow means allow-all: produces no rules
    assert R.parse_robots("User-agent: *\nDisallow:") == []


def test_matching_groups_combine():
    """RFC 9309 §2.2.1: multiple groups matching the same product token
    combine into one rule set (file order); the most specific token
    still wins over *, and combining never mixes tokens."""
    body = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: bot\nDisallow: /only-bot\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert R.parse_robots(body, "somecrawler") == [
        (False, "/a"), (False, "/b"),
    ]
    assert R.parse_robots(body, "bot") == [(False, "/only-bot")]
    # two groups for the same specific token also combine
    body2 = (
        "User-agent: bot\nDisallow: /x\n\n"
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: bot\nAllow: /x/ok\n"
    )
    assert R.parse_robots(body2, "bot/1.0") == [
        (False, "/x"), (True, "/x/ok"),
    ]
    # crawl-delay: across the combined groups, the MAX (most
    # conservative) valid occurrence wins — position-independent, the
    # same max() discipline crawl_frontier applies per host (r9 advice)
    body3 = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 4\n"
    )
    assert R.parse_crawl_delay(body3) == 4.0
    body3b = (
        "User-agent: *\nCrawl-delay: 2\n\n"
        "User-agent: *\nCrawl-delay: 9\n\n"
        "User-agent: *\nCrawl-delay: 5\n"
    )
    assert R.parse_crawl_delay(body3b) == 9.0
    # invalid occurrences never count toward the max
    body3c = (
        "User-agent: *\nCrawl-delay: nope\n\n"
        "User-agent: *\nCrawl-delay: 3\n"
    )
    assert R.parse_crawl_delay(body3c) == 3.0


def test_non_group_directives_do_not_split_ua_runs():
    """RFC 9309 §2.2.4: records other than allow/disallow (Sitemap,
    unknown extensions) must not interfere with group parsing — a
    Sitemap line between two User-agent lines leaves them stacked on
    the same rule block."""
    body = (
        "User-agent: a\n"
        "Sitemap: https://h.example/s.xml\n"
        "User-agent: b\n"
        "Disallow: /x\n"
    )
    assert R.parse_robots(body, "a") == [(False, "/x")]
    assert R.parse_robots(body, "b") == [(False, "/x")]
    # unknown extension directives are equally transparent
    body2 = "User-agent: a\nNoindex: /y\nUser-agent: b\nDisallow: /z\n"
    assert R.parse_robots(body2, "a") == [(False, "/z")]
    # ...but group-member records still end the header run
    body3 = "User-agent: a\nDisallow: /only-a\nUser-agent: b\nDisallow: /only-b\n"
    assert R.parse_robots(body3, "a") == [(False, "/only-a")]
    assert R.parse_robots(body3, "b") == [(False, "/only-b")]
    # crawl-delay is de-facto per-group: it also ends the run
    body4 = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /w\n"
    assert R.parse_robots(body4, "a") == []
    assert R.parse_crawl_delay(body4, "a") == 1.0
    assert R.parse_robots(body4, "b") == [(False, "/w")]


def test_pattern_to_regex():
    assert R._pattern_to_regex("/a/*.pdf$") == "^/a/.*\\.pdf$"
    assert R._pattern_to_regex("/plain") == "^/plain"


def test_robots_filter_longest_match_and_ties(spark):
    rules = R.robots_rules(
        spark.createDataFrame([("site.example", ROBOTS)], ["host", "body"])
    )
    urls = spark.createDataFrame(
        [
            ("https://site.example/ok.html",),        # Allow: /
            ("https://site.example/tmp/x",),          # Disallow: /tmp/ (len 5 > 1)
            ("https://site.example/tmp/public/y",),   # Allow: /tmp/public* (len 12)
            ("https://site.example/doc.pdf",),        # Disallow: /*.pdf$
            ("https://site.example/doc.pdfx",),       # $ anchor: not matched -> Allow: /
            ("https://other.example/anything",),      # no rules for host -> allowed
            ("https://site.example",),                # empty path treated as /
        ],
        ["url"],
    )
    got = {r.url for r in R.robots_filter(urls, rules).collect()}
    assert got == {
        "https://site.example/ok.html",
        "https://site.example/tmp/public/y",
        "https://site.example/doc.pdfx",
        "https://other.example/anything",
        "https://site.example",
    }


def test_robots_filter_preserves_extra_columns(spark):
    rules = R.robots_rules(
        spark.createDataFrame([("s.example", "User-agent: *\nDisallow: /no")], ["host", "body"])
    )
    urls = spark.createDataFrame(
        [("https://s.example/yes", 1), ("https://s.example/no/x", 2)],
        ["url", "k"],
    )
    got = [(r.url, r.k) for r in R.robots_filter(urls, rules).collect()]
    assert got == [("https://s.example/yes", 1)]


def test_robots_spec_example_table(spark):
    """The REP specification's worked precedence examples (longest
    match wins; allow wins exact-length ties; $ anchors)."""

    def allowed(allow, disallow, path):
        body = f"User-agent: *\nAllow: {allow}\nDisallow: {disallow}"
        rules = R.robots_rules(
            spark.createDataFrame([("h.example", body)], ["host", "body"])
        )
        urls = spark.createDataFrame([(f"https://h.example{path}",)], ["url"])
        return R.robots_filter(urls, rules).count() == 1

    # (allow, disallow, path) -> expected
    table = [
        ("/p", "/", "/page", True),            # longest match /p
        ("/folder", "/folder", "/folder/page", True),   # tie -> allow
        ("/page", "/*.htm", "/page.htm", False),  # /*.htm is longer
        ("/$", "/", "/", True),                # $ anchor beats /
        ("/$", "/", "/page.htm", False),       # anchor doesn't match
    ]
    for allow, disallow, path, want in table:
        assert allowed(allow, disallow, path) is want, (allow, disallow, path)


def test_sitemap_directives_extraction(spark):
    """Sitemap: lines extract group-independently (before, inside, and
    after user-agent groups), case-insensitively, with comments
    stripped; hosts without directives contribute nothing."""
    from webpagesgraphdatabase_spark import robots as R

    body = (
        "Sitemap: https://a.example/s1.xml\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "SITEMAP: https://a.example/s2.xml  # trailing comment\n"
        "# sitemap: https://a.example/commented.xml\n"
        "User-agent: bot\n"
        "sitemap:https://a.example/s3.xml\n"
    )
    frames = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nAllow: /\n")],
        ["host", "body"],
    )
    got = {
        (r.host, r.sitemap_url)
        for r in R.sitemap_directives(frames).collect()
    }
    assert got == {
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
        ("a.example", "https://a.example/s3.xml"),
    }


def test_crawl_delay_parsing_and_frame(spark):
    """Crawl-delay: group-scoped (the governing group's value wins),
    float-parsed, invalid/negative ignored; the frame extractor emits
    only hosts that declare one."""
    from webpagesgraphdatabase_spark import robots as R

    body = (
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
        "User-agent: fastbot\nCrawl-delay: 0.5\n"
    )
    assert R.parse_crawl_delay(body) == 2.5
    assert R.parse_crawl_delay(body, "FastBot/2.0") == 0.5
    assert R.parse_crawl_delay("User-agent: *\nCrawl-delay: nope\n") is None
    assert R.parse_crawl_delay("User-agent: *\nCrawl-delay: -3\n") is None
    assert R.parse_crawl_delay("User-agent: *\nDisallow: /\n") is None
    got = {
        (r.host, r.crawl_delay)
        for r in R.crawl_delays(
            spark.createDataFrame(
                [("a.example", body), ("b.example", "User-agent: *\n")],
                ["host", "body"],
            )
        ).collect()
    }
    assert got == {("a.example", 2.5)}


def test_merge_rules_per_host_whole_host_precedence(spark):
    """merge_rules_per_host: a host covered by the primary table keeps
    its rule set WHOLE (no row mixing between two robots.txt versions);
    the fallback contributes only hosts the primary lacks."""
    from webpagesgraphdatabase_spark import robots as R

    primary = R.robots_rules(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /new\n")],
            ["host", "body"],
        )
    )
    fallback = R.robots_rules(
        spark.createDataFrame(
            [
                ("a.example", "User-agent: *\nDisallow: /old\n"),
                ("b.example", "User-agent: *\nDisallow: /b\n"),
            ],
            ["host", "body"],
        )
    )
    got = {
        (r.host, r.pattern)
        for r in R.merge_rules_per_host(primary, fallback).collect()
    }
    # a.example's old rule must NOT survive alongside the new one
    assert got == {("a.example", "/new"), ("b.example", "/b")}


def test_robots_filter_non_broadcast_path(spark):
    """broadcast=False: a rule memory grown past the broadcast budget
    adjudicates via a shuffled equi-join — identical results, no
    broadcast of the rules side."""
    from webpagesgraphdatabase_spark import robots as R

    urls = spark.createDataFrame(
        [("https://a.example/private/x",), ("https://a.example/ok",),
         ("https://norules.example/p",)],
        ["url"],
    )
    rules = R.robots_rules(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /private\n")],
            ["host", "body"],
        )
    )
    want = {r.url for r in R.robots_filter(urls, rules).collect()}
    got_df = R.robots_filter(urls, rules, broadcast=False)
    assert {r.url for r in got_df.collect()} == want == {
        "https://a.example/ok", "https://norules.example/p"
    }
    # the pin is the HINT's absence in the logical plan — the planner
    # (AQE included) stays free to broadcast a genuinely small side by
    # stats, which is exactly the point: broadcast=False removes the
    # unconditional force, it does not forbid the strategy
    lp = got_df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in lp.lower()
    lp_forced = (
        R.robots_filter(urls, rules)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "broadcast" in lp_forced.lower()


def test_fits_broadcast_probe_is_threshold_exact(spark):
    """fits_broadcast: a limit-bounded row probe against the budget —
    exactly at the threshold fits, one past it does not."""
    from webpagesgraphdatabase_spark import robots as R

    rules = R.robots_rules(
        spark.createDataFrame(
            [
                (f"h{i}.example", "User-agent: *\nDisallow: /p\n")
                for i in range(4)
            ],
            ["host", "body"],
        )
    )
    assert R.fits_broadcast(rules, max_rows=4)
    assert not R.fits_broadcast(rules, max_rows=3)


def test_robots_filter_auto_selects_join_by_budget(spark, monkeypatch):
    """broadcast=None (auto): a rule table within the budget keeps the
    broadcast hint, one past it adjudicates via the shuffled equi-join
    — identical results either way (r11 verdict item 1)."""
    from webpagesgraphdatabase_spark import robots as R

    urls = spark.createDataFrame(
        [("https://h0.example/private/x",), ("https://h0.example/ok",),
         ("https://norules.example/p",)],
        ["url"],
    )
    rules = R.robots_rules(
        spark.createDataFrame(
            [
                (f"h{i}.example", "User-agent: *\nDisallow: /private\n")
                for i in range(5)
            ],
            ["host", "body"],
        )
    )
    want = {r.url for r in R.robots_filter(urls, rules).collect()}

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    over = R.robots_filter(urls, rules, broadcast=None)
    assert "broadcast" not in (
        over._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {r.url for r in over.collect()} == want

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100)
    under = R.robots_filter(urls, rules, broadcast=None)
    assert "broadcast" in (
        under._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {r.url for r in under.collect()} == want


def test_effective_rules_freshest_first_fold(spark):
    """effective_rules: left fold of merge_rules_per_host — each host
    governed by the FRESHEST table covering it, whole rule set; None
    entries skip; all-None returns None (r11 verdict item 7)."""
    from webpagesgraphdatabase_spark import robots as R

    def tbl(*host_pattern):
        return R.robots_rules(
            spark.createDataFrame(
                [
                    (h, f"User-agent: *\nDisallow: {p}\n")
                    for h, p in host_pattern
                ],
                ["host", "body"],
            )
        )

    own = tbl(("a.example", "/own"))
    caller = tbl(("a.example", "/caller"), ("b.example", "/caller-b"))
    stored = tbl(
        ("a.example", "/old"),
        ("b.example", "/old-b"),
        ("c.example", "/stored-c"),
    )
    got = {
        (r.host, r.pattern)
        for r in R.effective_rules(own, caller, stored).collect()
    }
    assert got == {
        ("a.example", "/own"),
        ("b.example", "/caller-b"),
        ("c.example", "/stored-c"),
    }
    assert R.effective_rules(None, None) is None
    only = R.effective_rules(None, caller, None)
    assert {
        (r.host, r.pattern) for r in only.collect()
    } == {("a.example", "/caller"), ("b.example", "/caller-b")}


def test_merge_rules_per_host_oversize_primary_goes_shuffled(
    spark, monkeypatch
):
    """r12: merge_rules_per_host's anti-join build side (the primary's
    host-key set) follows the same budget — an over-budget primary
    merges via a plain shuffled anti-join, same whole-host precedence."""
    from webpagesgraphdatabase_spark import robots as R

    def tbl(n, pat):
        return R.robots_rules(
            spark.createDataFrame(
                [(f"h{i}.example", f"User-agent: *\nDisallow: {pat}\n")
                 for i in range(n)],
                ["host", "body"],
            )
        )

    primary, fallback = tbl(5, "/new"), tbl(7, "/old")
    want = {
        (r.host, r.pattern)
        for r in R.merge_rules_per_host(primary, fallback).collect()
    }
    assert want == {(f"h{i}.example", "/new") for i in range(5)} | {
        (f"h{i}.example", "/old") for i in range(5, 7)
    }

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    over = R.merge_rules_per_host(primary, fallback)
    assert "broadcast" not in (
        over._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {(r.host, r.pattern) for r in over.collect()} == want

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100)
    under = R.merge_rules_per_host(primary, fallback)
    assert "broadcast" in (
        under._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {(r.host, r.pattern) for r in under.collect()} == want
