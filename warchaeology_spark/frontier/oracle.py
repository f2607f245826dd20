"""Sequential reference-faithful crawl simulator (FIXTURES.md §6).

Single-threaded, dictionary-based, zero Spark — the independent
implementation the engine's parity tests compare against (the analogue of
the reference's ``--deterministic`` mode: one worker, sorted inputs,
/root/reference/cmd/dedup/dedup.go:143-147, 249-253).

Implements the EXACT contracts of frontier/scheduler.py:
- canonicalization: functions/urls.canonicalize_py (the Python twin of the
  JVM column implementation, test-pinned to agree);
- url_hash = xxhash64(surt), seed 42 (functions/urls.xxhash64_py,
  test-pinned bit-for-bit against Spark's builtin);
- link extraction: links.LINK_RE / TRAIL_STRIP_RE in (span_offset,
  match_idx) order, media_ref for media spans;
- crawl priority (depth, url_canon); per-host budget per round (default
  2); same-round duplicate discovery resolves to the first in
  (src_depth, src_url, span_offset, link_idx) order;
- robots: denied URLs enter seen but never pending; seeds are gated too;
- seen insert at discovery time (first-wins = DigestIndex.IsRevisit
  semantics, digestindex.go:45-68).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from warchaeology_spark.frontier.links import LINK_RE, TRAIL_STRIP_RE
from warchaeology_spark.functions.urls import canonicalize_py, xxhash64_py

_LINK = re.compile(LINK_RE)
_TRAIL = re.compile(TRAIL_STRIP_RE)


@dataclass
class OracleResult:
    fetch_log: list[dict] = field(default_factory=list)  # round, seq, url_canon, surt, url_hash, host, depth, src_doc_id
    seen: dict = field(default_factory=dict)  # surt -> (url_hash, url_canon)
    metrics: list[dict] = field(default_factory=list)


def _extract_links(spans: list[dict]) -> list[tuple[int, int, str]]:
    """[(span_offset, link_idx, raw_url)] in document order."""
    out = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] == "media":
            urls = [span["media_ref"]] if span.get("media_ref") else []
        else:
            urls = _LINK.findall(span.get("text") or "")
        for k, u in enumerate(urls):
            out.append((span["offset"], k, _TRAIL.sub("", u)))
    return out


def _denied(robots_rules: dict, host: str, url_canon: str) -> bool:
    prefs = robots_rules.get(host)
    if not prefs:
        return False
    m = re.match(r"^[a-z]+://[^/]+(/[^?#]*)", url_canon)
    path = m.group(1) if m else ""
    return any(path.startswith(p) for p in prefs)


def simulate_crawl(
    docs: list[dict],
    seeds: list[dict],
    robots: list[dict],
    politeness: list[dict],
    max_rounds: int = 10,
    default_budget: int = 2,
) -> OracleResult:
    """docs rows: {doc_id, url, spans:[{kind,text,media_ref,offset}]};
    seeds rows: {url, seed_rank}; robots rows: {host, path_pref, allow};
    politeness rows: {host, max_per_round, ...}."""
    docs_by_url = {d["url"]: d for d in docs}
    robots_rules: dict[str, list[str]] = {}
    for r in robots:
        if not r["allow"]:
            robots_rules.setdefault(r["host"], []).append(r["path_pref"])
    budgets = {p["host"]: p["max_per_round"] for p in politeness}

    res = OracleResult()
    seen = res.seen
    pending: dict[str, dict] = {}  # surt -> entry

    # --- seeds: first-wins per surt by seed_rank, robots-gated ---
    for s in sorted(seeds, key=lambda x: x["seed_rank"]):
        c = canonicalize_py(s["url"])
        if c is None:
            continue
        url_canon, surt, host = c
        if surt in seen:
            continue
        h = xxhash64_py(surt)
        seen[surt] = (h, url_canon)
        if not _denied(robots_rules, host, url_canon):
            pending[surt] = dict(
                surt=surt, url_canon=url_canon, url_hash=h, host=host,
                depth=0, src_doc_id=None,
            )

    seq = 0
    for rnd in range(max_rounds):
        if not pending:
            break
        # deterministic priority order + per-host budget
        order = sorted(pending.values(), key=lambda e: (e["depth"], e["url_canon"]))
        host_taken: dict[str, int] = {}
        scheduled = []
        for e in order:
            b = budgets.get(e["host"], default_budget)
            if host_taken.get(e["host"], 0) < b:
                host_taken[e["host"]] = host_taken.get(e["host"], 0) + 1
                scheduled.append(e)
        if not scheduled:
            break
        n_novel = 0
        n_denied = 0
        for e in scheduled:
            del pending[e["surt"]]
            res.fetch_log.append(dict(round=rnd, seq=seq, **e))
            seq += 1
        # discovery happens for the whole round batch, in crawl order —
        # identical to the engine's min_by over (src_depth, src_url,
        # span_offset, link_idx) because we iterate in exactly that order
        for e in scheduled:
            doc = docs_by_url.get(e["url_canon"])
            if doc is None:
                continue  # 404: URL exists in the graph but has no document
            for span_offset, k, raw in _extract_links(list(doc["spans"])):
                c = canonicalize_py(raw)
                if c is None:
                    continue
                url_canon, surt, host = c
                if surt in seen:
                    continue
                h = xxhash64_py(surt)
                seen[surt] = (h, url_canon)
                n_novel += 1
                if _denied(robots_rules, host, url_canon):
                    n_denied += 1
                    continue
                pending[surt] = dict(
                    surt=surt, url_canon=url_canon, url_hash=h, host=host,
                    depth=e["depth"] + 1, src_doc_id=doc["doc_id"],
                )
        res.metrics.append(
            dict(round=rnd, scheduled=len(scheduled), novel=n_novel,
                 robots_denied=n_denied, pending_after=len(pending))
        )
    return res
