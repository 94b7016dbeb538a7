"""RFC 9309 robots.txt evaluation, from scratch (network-free).

The reference gates every fetch through the third-party ``robots``
package (``publishers/base_objects.py:10,88-106`` CustomRobotFileParser
.can_fetch / .crawl_delay, consulted at ``scraping/html.py:127-167``).
That package implements RFC 9309: group selection by most-specific
user-agent token, rule matching by LONGEST matched pattern with
``allow`` winning ties, ``*`` wildcards and ``$`` end anchors. This
module reimplements those semantics over STORED robots.txt payloads —
the batch analogue of the reference's live gate, with the same
decisions.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlsplit

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*(?:#.*)?$")


class RobotsGroup:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self) -> None:
        self.agents: List[str] = []
        self.rules: List[Tuple[bool, str]] = []  # (allow, pattern)
        self.crawl_delay: Optional[float] = None


class RobotsMatcher:
    """Parsed robots.txt; ``can_fetch``/``crawl_delay`` mirror the
    reference's gate semantics."""

    def __init__(self, text: str) -> None:
        self.groups: List[RobotsGroup] = []
        current: Optional[RobotsGroup] = None
        agents_open = False  # consecutive user-agent lines share a group
        for raw in (text or "").splitlines():
            m = _LINE_RE.match(raw)
            if not m:
                continue
            field, value = m.group(1).lower(), m.group(2)
            if field == "user-agent":
                if current is None or not agents_open:
                    current = RobotsGroup()
                    self.groups.append(current)
                    agents_open = True
                if value:
                    current.agents.append(value.lower())
            elif field in ("allow", "disallow") and current is not None:
                agents_open = False
                if value:  # an empty "Disallow:" records no rule (allow-all)
                    current.rules.append((field == "allow", value))
            elif field == "crawl-delay" and current is not None:
                agents_open = False
                try:
                    current.crawl_delay = float(value)
                except ValueError:
                    pass

    def _group_for(self, user_agent: str) -> Optional[RobotsGroup]:
        """Most-specific matching group: longest agent token that is a
        substring of the product token (RFC 9309 §2.2.1); '*' last."""
        ua = user_agent.lower()
        best: Optional[RobotsGroup] = None
        best_len = -1
        for group in self.groups:
            for agent in group.agents:
                if agent != "*" and agent in ua and len(agent) > best_len:
                    best, best_len = group, len(agent)
        if best is not None:
            return best
        for group in self.groups:
            if "*" in group.agents:
                return group
        return None

    @staticmethod
    def _match_len(pattern: str, path: str) -> Optional[int]:
        """Length of the pattern if it matches the path per RFC 9309
        ('*' any sequence, '$' end anchor), else None. Longer pattern =
        higher precedence."""
        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern
        regex = ".*".join(re.escape(part) for part in core.split("*"))
        regex = "^" + regex + ("$" if anchored else "")
        return len(pattern) if re.match(regex, path) else None

    @staticmethod
    def _path_of(url: str) -> str:
        parts = urlsplit(url)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        return path

    def can_fetch(self, user_agent: str, url: str) -> bool:
        group = self._group_for(user_agent)
        if group is None:
            return True
        path = self._path_of(url)
        best_len = -1
        best_allow = True
        for allow, pattern in group.rules:
            matched = self._match_len(pattern, path)
            if matched is None:
                continue
            # longest match wins; on a tie, allow wins (RFC 9309 §2.3.2)
            if matched > best_len or (matched == best_len and allow and not best_allow):
                best_len, best_allow = matched, allow
        return True if best_len < 0 else best_allow

    def crawl_delay(self, user_agent: str) -> Optional[float]:
        group = self._group_for(user_agent)
        return group.crawl_delay if group is not None else None
