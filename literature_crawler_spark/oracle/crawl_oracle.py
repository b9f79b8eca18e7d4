"""Single-threaded crawl oracle — the reference loop semantics in ~150 lines.

Mirrors the reference's sequential crawl (FIFO within host, skip-if-seen,
budget-gated — ``protocol_io_crawl.py:97-116``, ``nature_protocol_crawl.py:93-103``)
against the same synthetic corpus the Spark engine crawls, producing the
expected final seen-set and exact crawl order. The CrawlEngine must
reproduce both (FIXTURES.md §5 invariants 1-2).

The canonicalizer here is an independent Python re-derivation of
functions.urls.canonicalize (same spec, different implementation) so a bug
in the Spark expression can't hide in the oracle.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit


def canonicalize(url: str) -> str | None:
    """Spec mirror of functions.urls.canonicalize; None for relative URLs."""
    u = url.strip()
    if u.startswith("//"):
        u = "https:" + u
    u = u.split("#", 1)[0].split("?", 1)[0]
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    if not parts.scheme or not parts.netloc:
        return None
    host = parts.netloc.lower()
    for suffix in (":80", ":443"):
        if host.endswith(suffix):
            host = host[: -len(suffix)]
    path = parts.path.rstrip("/") or "/"
    return f"{parts.scheme.lower()}://{host}{path}"


def host_of(canon_url: str) -> str:
    return canon_url.split("://", 1)[1].split("/", 1)[0]


def resolve_relative(url: str, base_host: str) -> str:
    u = url.strip()
    if u.startswith("//"):
        return "https:" + u
    if "://" in u.split("?", 1)[0].split("/", 1)[0] or u.startswith(("http:", "https:")):
        return u
    if not u.startswith("/"):
        u = "/" + u
    return f"https://{base_host}{u}"


def _rule_regex(pattern: str) -> re.Pattern:
    """RFC 9309 §2.2.3 pattern -> regex (spec mirror of
    operators.frontier.robots_rule_regex): '*' wildcard, trailing '$'
    end-anchor, '/'-prefixed patterns anchored after scheme://host,
    other patterns are substring-anywhere (reference blocklist form)."""
    esc = re.escape(pattern).replace(r"\*", ".*")
    if esc.endswith(r"\$"):
        esc = esc[:-2] + "$"
    if pattern.startswith("/"):
        return re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*" + esc)
    return re.compile(esc)


def _denied(canon_url: str, host: str, robots: list[tuple[str, str, bool]]) -> bool:
    """Longest-match precedence, Allow wins ties, no match = allowed."""
    best_len, best_allow = -1, True
    for r_host, pattern, allow in robots:
        if r_host != "*" and r_host != host:
            continue
        if _rule_regex(pattern).search(canon_url):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len, best_allow = ln, allow
    return not best_allow


def run_oracle(
    corpus: dict[int, dict],
    seeds: list[str],
    robots: list[tuple[str, str, bool]],
    budgets: dict[str, int],
    default_budget: int = 10,
    max_waves: int = 10,
) -> dict:
    """Returns {'seen': set[url], 'order': [(wave, seq, url)], 'metrics': [...]}.

    corpus: {index: {'url', 'host', 'links'}} from sources.synthetic.python_corpus.
    """
    by_url = {v["url"]: v for v in corpus.values()}
    seen: set[str] = set()
    pending: list[dict] = []  # {url, host, priority, seq}
    order: list[tuple[int, int, str]] = []
    metrics = []
    next_seq = 0

    # ---- wave 0: seed bootstrap (canonicalize, robots, first-seen dedup) ----
    for raw in seeds:
        cu = canonicalize(raw)
        if cu is None or cu in seen:
            continue
        h = host_of(cu)
        if _denied(cu, h, robots):
            continue
        seen.add(cu)
        pending.append({"url": cu, "host": h, "priority": 0, "seq": next_seq})
        next_seq += 1

    # ---- waves ----
    for wave in range(1, max_waves + 1):
        if not pending:
            break
        # per-host quota over (priority, seq) order
        by_host: dict[str, list[dict]] = {}
        for row in sorted(pending, key=lambda r: (r["priority"], r["seq"])):
            by_host.setdefault(row["host"], []).append(row)
        scheduled: list[dict] = []
        for h, rows in by_host.items():
            scheduled.extend(rows[: budgets.get(h, default_budget)])
        scheduled.sort(key=lambda r: r["seq"])
        sched_urls = {r["url"] for r in scheduled}
        pending = [r for r in pending if r["url"] not in sched_urls]
        for r in scheduled:
            order.append((wave, r["seq"], r["url"]))

        # fetch + extract in parent-seq order; enqueue unseen links
        n_fetched = n_new = 0
        for r in scheduled:
            page = by_url.get(r["url"])
            if page is None:
                continue
            n_fetched += 1
            for link in page["links"]:
                cu = canonicalize(resolve_relative(link, page["host"]))
                if cu is None or cu in seen:
                    continue
                h = host_of(cu)
                if _denied(cu, h, robots):
                    continue
                seen.add(cu)
                pending.append({"url": cu, "host": h, "priority": wave, "seq": next_seq})
                next_seq += 1
                n_new += 1
        metrics.append(
            {"wave": wave, "scheduled": len(scheduled), "fetched": n_fetched,
             "new_urls": n_new, "pending_next": len(pending)}
        )
        if not pending:
            break
    return {"seen": seen, "order": order, "metrics": metrics}
