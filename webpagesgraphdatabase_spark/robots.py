"""robots.txt (RFC 9309) parsing and crawl-politeness filtering.

The reference fetches URLs with no politeness layer (``main.py:85-98``
calls ``requests.get`` directly); a 100 TB crawl pipeline must be able
to answer "may I fetch / keep this URL?" corpus-wide. This module
parses robots.txt bodies (e.g. harvested from a WARC archive's own
``text/plain`` responses) into per-host rule tables and applies them
to URL sets as a join — no per-URL Python.

Semantics implemented (RFC 9309 §2):

- group selection: the group(s) whose ``User-agent`` most specifically
  matches the product token, falling back to ``*``; multiple
  user-agent lines stack onto the following rule block.
- rule matching: longest-``path``-match wins; on a tie between an
  allow and a disallow of equal length, allow wins.
- ``*`` wildcards inside a path and the ``$`` end anchor are
  supported (translated to an RE2-safe regex); an empty Disallow
  means "allow everything" per the RFC.
- a URL whose host has no rules (or no robots.txt at all) is allowed.

Scale shape: rule tables are tiny (a few hundred rows per host) —
they broadcast; matching is codegen ``startswith``/``rlike`` against
the URL path; the per-URL winner is a ``max_by`` over (plen, allow) —
partial-aggregatable, no window over a hot host key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$"

#: broadcast budget for rule tables, in ROWS. A rule row is a few
#: hundred bytes (host + pattern + regex), so 100k rows is tens of MB —
#: the conventional explicit-broadcast comfort zone. A single archive's
#: parsed robots tables never approach this; a corpus-lifetime rule
#: MEMORY (:meth:`.crawl_state.CrawlState.rules` over millions of
#: hosts) crosses it, and past it the adjudication join must go
#: shuffled instead of building a driver-sized broadcast every round.
BROADCAST_RULES_MAX_ROWS = 100_000


def fits_broadcast(rules: DataFrame, max_rows: int | None = None) -> bool:
    """Cheap size probe: does this rule table fit the broadcast budget?
    ``limit(n+1).count()`` short-circuits the scan at the threshold —
    the probe's cost is bounded by the budget, never by the table. The
    crawl call sites use this to AUTO-pick the
    :func:`robots_filter` join strategy when the caller didn't
    (r11 verdict item 1)."""
    n = BROADCAST_RULES_MAX_ROWS if max_rows is None else int(max_rows)
    return rules.select("host").limit(n + 1).count() <= n


def _select_group(txt: str, agent: str) -> list[tuple[str, str]]:
    """The (directive, value) lines of the robots group that governs
    ``agent`` — RFC 9309 group selection: the most specific matching
    ``User-agent`` token wins (substring match, case-insensitive),
    ``*`` is the fallback. Comments (#) strip; directives the callers
    don't know stay in the list (they filter)."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_group_header = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, colon, value = line.partition(":")
        if not colon:
            continue
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not in_group_header:
                groups.append((agents, rules))
                agents, rules = [], []
            in_group_header = True
            agents.append(value.lower())
        else:
            # RFC 9309 §2.2.4: only group-member records (allow/disallow,
            # plus the de-facto per-group crawl-delay) end a run of
            # stacked User-agent lines; other records (Sitemap, unknown
            # extensions) must not interfere with group parsing.
            if name in ("allow", "disallow", "crawl-delay"):
                in_group_header = False
            rules.append((name, value))
    if agents:
        groups.append((agents, rules))

    tok = agent.lower()
    best_tok: str | None = None
    best_len = -1
    for group_agents, _ in groups:
        for a in group_agents:
            if a != "*" and a in tok and len(a) > best_len:
                best_tok, best_len = a, len(a)
    if best_tok is None and any("*" in ga for ga, _ in groups):
        best_tok = "*"
    if best_tok is None:
        return []
    # RFC 9309 §2.2.1: when more than one group matches the product
    # token, their rules MUST be combined into one group — so every
    # group carrying the winning token contributes, in file order
    out: list[tuple[str, str]] = []
    for group_agents, group_rules in groups:
        if best_tok in group_agents:
            out.extend(group_rules)
    return out


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Rules for ``agent`` as (allow, path_pattern) pairs — the
    RFC 9309 group selection of :func:`_select_group`, filtered to
    Allow/Disallow. An empty Disallow means "allow everything"
    (§2.2.2); an empty pattern matches nothing, so it is skipped."""
    return [
        (name == "allow", value)
        for name, value in _select_group(txt, agent)
        if name in ("allow", "disallow") and value
    ]


def parse_crawl_delay(txt: str, agent: str = "*") -> float | None:
    """The governing group's ``Crawl-delay`` (de-facto extension, not
    in RFC 9309 — which is why :func:`parse_robots` ignores it) as
    seconds, or None when absent/unparseable/negative. §2.2.1 group
    combining can merge several groups declaring different delays;
    the MAX (most conservative) of the valid occurrences wins — the
    same discipline ``crawl_frontier`` applies when aggregating
    per-host delay rows, so the two layers can't disagree."""
    best: float | None = None
    for name, value in _select_group(txt, agent):
        if name == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0 and (best is None or d > best):
                best = d
    return best


def _pattern_to_regex(pattern: str) -> str:
    """robots path pattern → anchored RE2 regex (* → .*, $ → end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + out + ("$" if anchored else "")


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, allow, pattern, rx, plen) rule table from (host, body)
    robots.txt rows — the parse runs once per host on the driver-free
    path via a small Arrow batch (rule tables are KB-sized per host;
    this frame broadcasts)."""
    import pandas as pd

    def explode_rules(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                for allow, pattern in parse_robots(body or "", agent):
                    rows.append(
                        {
                            "host": host,
                            "allow": allow,
                            "pattern": pattern,
                            "rx": _pattern_to_regex(pattern),
                            "plen": len(pattern),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["host", "allow", "pattern", "rx", "plen"]
            ) if rows else pd.DataFrame(
                columns=["host", "allow", "pattern", "rx", "plen"]
            )

    return robots.select("host", "body").mapInPandas(
        explode_rules,
        schema="host string, allow boolean, pattern string, rx string, plen int",
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url",
    broadcast: bool | None = True,
) -> DataFrame:
    """Filter a URL frame to the crawl-allowed subset: longest-match
    rule per URL (allow wins length ties), hosts without rules pass.

    The rules side broadcasts by default — a single archive's parsed
    robots tables are KB-sized per host. A corpus-wide rule MEMORY
    (:meth:`.crawl_state.CrawlState.rules` after millions of hosts)
    outgrows the broadcast budget: pass ``broadcast=False`` and the
    adjudication becomes a plain shuffled equi-join on host — same
    result, one hash exchange per side instead of a driver-sized
    build. ``broadcast=None`` AUTO-selects by the
    :func:`fits_broadcast` size probe (the crawl loop's hot gates pass
    their resolved choice instead, so the probe never repeats per
    site — r11 verdict item 1). The winner either way is
    ``max_by(allow, (plen, allow))`` — a partial-aggregatable
    struct-max, no per-host window. Set semantics: the adjudicating
    groupBy collapses exact duplicate input rows (a URL frontier is a
    set anyway)."""
    if broadcast is None:
        broadcast = fits_broadcast(rules)
    u = urls.withColumn("_host", F.regexp_extract(F.col(url_col), _HOST_RE, 1)).withColumn(
        "_path", F.coalesce(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("/"))
    ).withColumn("_path", F.when(F.col("_path") == "", "/").otherwise(F.col("_path")))
    rules_side = F.broadcast(rules) if broadcast else rules
    matched = (
        u.join(rules_side, u["_host"] == rules["host"], "left")
        .withColumn(
            "_hit",
            F.col("rx").isNotNull() & F.expr("_path RLIKE rx"),
        )
        .groupBy(*[F.col(c) for c in urls.columns])
        .agg(
            F.max(
                F.when(
                    F.col("_hit"),
                    F.struct(
                        F.col("plen").alias("plen"),
                        F.col("allow").cast("int").alias("allow_i"),
                    ),
                )
            ).alias("winner")
        )
    )
    return matched.filter(
        F.col("winner").isNull() | (F.col("winner.allow_i") == 1)
    ).select(*urls.columns)


def sitemap_directives(robots: DataFrame) -> DataFrame:
    """(host, sitemap_url) from (host, body) robots.txt rows: the
    ``Sitemap:`` directive (Sitemaps protocol; RFC 9309 treats unknown
    lines as extensions) is GROUP-INDEPENDENT — it applies regardless
    of user-agent sections, so extraction is a flat line scan, not a
    group parse. Pure codegen: comments strip with one multiline
    regexp_replace, directives extract with one regexp_extract_all —
    no Python, no shuffle."""
    no_comments = F.regexp_replace(F.col("body"), r"(?m)#.*$", "")
    urls = F.regexp_extract_all(
        no_comments, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), 1
    )
    return (
        robots.select("host", F.explode(urls).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


#: the :func:`robots_rules` row shape — what rule tables carry between
#: the parser, the filter join, and the scheduler-state rule memory
RULE_COLUMNS = ("host", "allow", "pattern", "rx", "plen")


def merge_rules_per_host(
    primary: DataFrame, fallback: DataFrame, broadcast: bool | None = None
) -> DataFrame:
    """One effective rule table from two: every host keeps its
    ``primary`` rule set whole, and ``fallback`` contributes ONLY hosts
    ``primary`` does not cover. Whole-host precedence — never a row
    union — because :func:`robots_filter`'s longest-match adjudication
    is only meaningful within ONE version of a host's robots.txt;
    mixing rows from two versions could resurrect a rule the newer
    file dropped. Used to lay stored rule memory
    (:meth:`.crawl_state.CrawlState.rules`) under a fresher table (an
    archive's own robots bodies, a caller-supplied live set).

    The anti-join's build side is the PRIMARY's host-key set —
    broadcast when the primary fits the budget (the common case: the
    fresher table is a single archive's parse), a plain shuffled
    anti-join when a caller lays a corpus-lifetime table on top
    (``broadcast=None`` auto-probes, same discipline as
    :func:`robots_filter` — r12)."""
    if broadcast is None:
        broadcast = fits_broadcast(primary)
    p = primary.select(*RULE_COLUMNS)
    keys = p.select("host").distinct()
    return p.unionByName(
        fallback.select(*RULE_COLUMNS).join(
            F.broadcast(keys) if broadcast else keys, "host", "left_anti"
        )
    )


def effective_rules(
    *tables: DataFrame | None, broadcast: bool | None = None
) -> DataFrame | None:
    """The ONE effective rule table from a freshest-first sequence of
    optional tables — e.g. ``(archive_own, caller_supplied,
    stored_memory)``: a left fold of :func:`merge_rules_per_host`, so
    every host is governed by the FRESHEST table that covers it, whole
    rule set, never a row mix. ``None`` entries skip; all-``None``
    returns ``None``. Extracted (r11 verdict item 7) so the two
    stored+caller merge sites — ``crawl_round_resumable``'s frontier
    gate and :meth:`.crawl_state.CrawlState.next_fetch_plan` — share
    one precedence implementation and cannot diverge.

    ``broadcast`` threads the caller's ALREADY-RESOLVED adjudication
    choice into every fold step (ADVICE r12 low): the crawl gates
    probe their tables exactly once for the gate decision, and the
    merge must not re-probe per step — a resolved ``False`` (any
    input past the budget) keeps every anti-join shuffled (the safe
    direction), a resolved ``True`` broadcasts the accumulated
    primary's host-KEY set (strictly smaller than the rule tables the
    caller already probed). ``None`` keeps the per-step auto-probe for
    callers outside the gates."""
    out: DataFrame | None = None
    for t in tables:
        if t is None:
            continue
        out = (
            t
            if out is None
            else merge_rules_per_host(out, t, broadcast=broadcast)
        )
    return out


def crawl_delays(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, crawl_delay) for hosts whose governing group declares
    one — the same small-Arrow-batch shape as :func:`robots_rules`;
    the result is per-host tiny and broadcasts."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                d = parse_crawl_delay(body or "", agent)
                if d is not None:
                    rows.append({"host": host, "crawl_delay": d})
            yield pd.DataFrame(
                rows, columns=["host", "crawl_delay"]
            ) if rows else pd.DataFrame(columns=["host", "crawl_delay"])

    return robots.select("host", "body").mapInPandas(
        extract, schema="host string, crawl_delay double"
    )
