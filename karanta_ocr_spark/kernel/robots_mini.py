"""robots.txt interpreter (RFC 9309, pure stdlib).

The third leg of the crawl-policy trio next to the UT1-style domain
blocklist and the robots-META flags (``operators/corpus_filters.py``):
a compliant training-data pipeline drops pages whose host's
robots.txt disallowed them for its crawler. The reference consumes
already-crawled inputs and so inherits the crawler's policy; at
corpus scale the check is re-run as a filter because blanket-allow
crawls and policy changes both happen.

Semantics implemented per RFC 9309 (and the Google REP reference
implementation's public documentation):

* groups: consecutive ``User-agent`` lines share the following
  ``Allow``/``Disallow`` rules;
* group selection: the group whose user-agent token is the LONGEST
  case-insensitive prefix of the product token wins; ``*`` is the
  fallback; all groups matching equally specifically merge;
* rule matching: ``*`` matches any octet sequence, ``$`` anchors the
  pattern end; the matching rule with the LONGEST pattern wins;
  an allow/disallow tie at equal length resolves to ALLOW;
* empty ``Disallow:`` = allow-all; no matching group = allowed;
* unknown directives and comments (``#``) are ignored.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RuleGroup:
    agents: list[str] = field(default_factory=list)
    #: (allow?, raw pattern) in file order
    rules: list[tuple[bool, str]] = field(default_factory=list)
    #: Crawl-delay seconds (non-standard but universally honored;
    #: group-scoped like the rules). None = not declared.
    delay: float | None = None


def parse_robots(text: str) -> list[RuleGroup]:
    groups: list[RuleGroup] = []
    cur: RuleGroup | None = None
    in_agent_run = False  # consecutive User-agent lines open ONE group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur = RuleGroup()
                groups.append(cur)
                in_agent_run = True
            cur.agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur is None:
                continue  # rules before any User-agent line: ignored
            cur.rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_agent_run = False
            if cur is not None and cur.delay is None:
                try:
                    cur.delay = float(val)
                except ValueError:
                    pass  # junk value: treat as undeclared
        else:
            # sitemap / unknown: close the agent run but keep the
            # group open for later allow/disallow lines. (Sitemap
            # lines are group-INDEPENDENT per the protocol and are
            # collected separately by sitemap_urls.)
            in_agent_run = False
    return groups


#: Sitemap: lines are not part of any group (sitemaps.org protocol:
#: they apply to the whole host, wherever they appear in the file).
_SITEMAP_LINE_RE = re.compile(r"^[ \t]*sitemap[ \t]*:[ \t]*(\S+)", re.I | re.M)


def sitemap_urls(robots_text: str | None) -> list[str]:
    """All Sitemap: declarations, in file order (absolute URLs per
    the protocol; values taken verbatim, comments stripped)."""
    if not robots_text:
        return []
    stripped = "\n".join(
        line.split("#", 1)[0] for line in robots_text.splitlines()
    )
    return _SITEMAP_LINE_RE.findall(stripped)


def crawl_delay(robots_text: str | None, agent: str) -> float | None:
    """The Crawl-delay for *agent*: from the most-specific matching
    group(s), exactly like rule selection; when equally-specific
    groups disagree, the MINIMUM delay wins (the conservative
    reading is the larger delay, but merged groups historically mean
    "any of these lines applies" — we take the smallest declared
    value and document the choice). None = not declared."""
    if not robots_text:
        return None
    groups = parse_robots(robots_text)
    agent = agent.lower()
    best_len = -1
    delays: list[float] = []
    for g in groups:
        specificity = -1
        for a in g.agents:
            if a == "*":
                specificity = max(specificity, 0)
            elif agent.startswith(a):
                specificity = max(specificity, len(a))
        if specificity < 0:
            continue
        if specificity > best_len:
            best_len = specificity
            delays = [g.delay] if g.delay is not None else []
        elif specificity == best_len and g.delay is not None:
            delays.append(g.delay)
    return min(delays) if delays else None


def _pattern_re(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


def _select_rules(groups: list[RuleGroup], agent: str) -> list[tuple[bool, str]]:
    agent = agent.lower()
    best_len = -1
    rules: list[tuple[bool, str]] = []
    for g in groups:
        specificity = -1
        for a in g.agents:
            if a == "*":
                specificity = max(specificity, 0)
            elif agent.startswith(a):
                specificity = max(specificity, len(a))
        if specificity < 0:
            continue
        if specificity > best_len:
            best_len = specificity
            rules = list(g.rules)
        elif specificity == best_len:
            rules.extend(g.rules)  # equally specific groups merge
    return rules


def allowed_by_rules(rules: list[tuple[bool, str]], path: str) -> bool:
    """Verdict for *path* under an already-selected rule list (see
    :func:`_select_rules`) — the per-row hot path when rules are
    cached per (robots text, agent)."""
    if not path.startswith("/"):
        path = "/" + path
    best: tuple[int, bool] | None = None  # (pattern length, allow?)
    for allow, pattern in rules:
        if pattern == "":
            # "Disallow:" (empty) historically means allow-all; it can
            # never out-rank a real match (length 0).
            continue
        if _pattern_re(pattern).match(path):
            key = len(pattern)
            if best is None or key > best[0] or (key == best[0] and allow):
                best = (key, allow)
    return True if best is None else best[1]


def is_allowed(robots_text: str | None, agent: str, path: str) -> bool:
    """Verdict for *path* (must start with ``/``) under *robots_text*.
    None/empty robots.txt (404 in practice) allows everything."""
    if not robots_text:
        return True
    return allowed_by_rules(
        _select_rules(parse_robots(robots_text), agent), path
    )
