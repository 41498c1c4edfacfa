"""Pure-Python oracle: the reference's semantics, no Spark.

A ≤200-LoC reimplementation of yuanyb/search-engine's index+query core used
only to generate golden outputs for the pytest suite (SURVEY §5). Every
function cites the Go source it mirrors. Intentional divergences
(SURVEY §7.4.4): intended AND semantics; deterministic doc_id-asc tiebreak.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass


def _url_host(u: str) -> str:
    """Host for the site: filter, mirroring operators/search.host_of
    (reference util.UrlToHost, util.go:34-44, with the documented
    bare-value-is-a-host divergence)."""
    m = re.match(r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/]*)", u)
    return re.sub(r":[^:]*$", "", m.group(1) if m else "")


def is_indexed_char(ch: str) -> bool:  # token.go:17-27
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FA5
        or 0x41 <= cp <= 0x5A
        or 0x61 <= cp <= 0x7A
        or 0x30 <= cp <= 0x39
    )


def ngram_split(text: str, n: int = 2) -> list[tuple[str, int]]:  # token.go:30-45
    out, left, chars = [], 0, list(text)
    for i, ch in enumerate(chars):
        if not is_indexed_char(ch):
            left = i + 1
        elif i - left + 1 == n:
            out.append(("".join(chars[left : i + 1]), left))
            left += 1
    return out


_TITLE_RE = re.compile(r"<title.*?>(.*?)</title>", re.I | re.S | re.M)
_TRIM_TAG_RE = re.compile(
    r"<!--.*?-->|<script.*?>.*?</script>|<style.*?>.*?</style>|<title.*?>.*?</title>|<.+?>",
    re.I | re.S | re.M,
)
_TRIM_SPACE_RE = re.compile(r"\s+", re.M)


def parse_document(document: str) -> tuple[str, str] | None:  # parser.go:22-37
    m = _TITLE_RE.search(document)
    if m is None:
        return None
    title = m.group(1).strip()
    body = _TRIM_SPACE_RE.sub(" ", _TRIM_TAG_RE.sub(" ", document)).strip()
    return title, body


@dataclass
class Posting:  # indexer.go:42-48
    doc_id: int
    positions: list[int]  # title offsets then body offsets, each 0-based
    title_end: int


class OracleIndex:
    """In-memory inverted index + searcher (indexer.go / search.go)."""

    def __init__(self) -> None:
        self.postings: dict[str, dict[int, Posting]] = {}
        self.urls: dict[int, str] = {}
        self.n_docs = 0

    def add_document(self, doc_id: int, url: str, title: str, body: str) -> None:
        self.urls[doc_id] = url
        self.n_docs += 1
        for is_title, text in ((True, title), (False, body)):
            for term, pos in ngram_split(text):
                p = self.postings.setdefault(term, {}).setdefault(
                    doc_id, Posting(doc_id, [], 0)
                )
                p.positions.append(pos)
                if is_title:
                    p.title_end += 1

    # -- query side ---------------------------------------------------------
    def _query_tokens(self, keyword: str) -> list[tuple[str, list[int]]]:
        items: dict[str, list[int]] = {}  # indexer.go:97-107
        for term, pos in ngram_split(keyword):
            items.setdefault(term, []).append(pos)
        return list(items.items())

    def _phrase_count(self, qtokens, posting_of, title: bool) -> int:
        # search.go:278-339 — |∩_j (positions_f(t_j) - base_j)|
        sets = []
        for term, bases in qtokens:
            p = posting_of[term]
            fpos = p.positions[: p.title_end] if title else p.positions[p.title_end :]
            for b in bases:
                sets.append({x - b for x in fpos})
        inter = set.intersection(*sets) if sets else set()
        return len(inter)

    def search_docs(self, keyword: str, site: str = "") -> dict[int, float]:
        """One keyword → {doc_id: score} (search.go:187-273)."""
        qtokens = self._query_tokens(keyword)
        if not qtokens:
            return {}
        for term, _ in qtokens:
            if term not in self.postings:
                return {}
        # sort by df asc (search.go:193-196); term tiebreak for determinism
        qtokens.sort(key=lambda kv: (len(self.postings[kv[0]]), kv[0]))
        doc_sets = [set(self.postings[t].keys()) for t, _ in qtokens]
        cand = sorted(set.intersection(*doc_sets))
        out: dict[int, float] = {}
        for doc_id in cand:
            if site and not _url_host(self.urls[doc_id]).endswith(site):
                continue
            posting_of = {t: self.postings[t][doc_id] for t, _ in qtokens}
            s = 0.0  # calcTfIdf, search.go:419-429
            for term, _ in qtokens:
                tf = len(posting_of[term].positions)
                s += (1 + math.log(tf)) * math.log(self.n_docs / len(self.postings[term]))
            score = 0.0
            for in_title in (True, False):  # search.go:248-267
                pc = self._phrase_count(qtokens, posting_of, in_title)
                part = s
                if pc > 0:
                    part *= 3 + math.log(pc)
                if in_title:
                    part *= 3
                score += part
            out[doc_id] = score
        return out

    # -- highlight side (search.go:102-166, 342-403) ------------------------
    def _cursor_positions(self, keyword: str, doc_id: int, title: bool) -> list[list[int]]:
        """One position-list per phrase cursor — per (token, query-base)
        occurrence, duplicated like Go's phraseSearchCursor array
        (search.go:285-301)."""
        out = []
        for term, bases in self._query_tokens(keyword):
            p = self.postings[term][doc_id]
            fpos = p.positions[: p.title_end] if title else p.positions[p.title_end :]
            for _ in bases:
                out.append(list(fpos))
        return out

    @staticmethod
    def find_highlight(cursor_positions: list[list[int]]) -> list[list[int]]:
        """Verbatim findHighlight (search.go:344-403): width-2 intervals,
        in-place merge loop, max-length window with the actual >100
        expansion condition."""
        if sum(len(c) for c in cursor_positions) == 0:
            return []
        intervals = [[pos, pos + 1] for c in cursor_positions for pos in c]
        intervals.sort(key=lambda iv: iv[0])
        pos = 0
        for i in range(1, len(intervals)):
            if intervals[i][0] - intervals[i - 1][1] <= 1:
                intervals[pos][1] = intervals[i][1]
            else:
                pos += 1
                intervals[pos] = intervals[i][:]
        intervals = intervals[: pos + 1]

        def LEN(i: int, j: int) -> int:
            return intervals[j][1] - intervals[i][0] + 1

        max_len = max_idx = 0
        for i in range(len(intervals)):
            if max_len < LEN(i, i):
                max_len, max_idx = LEN(i, i), i
        i = j = max_idx
        while LEN(i, j) > 100 and (i > 0 or j < len(intervals) - 1):
            len1 = LEN(i - 1, i - 1) if i > 0 else 0
            len2 = LEN(j + 1, j + 1) if j < len(intervals) - 1 else 0
            if len1 > len2:
                i -= 1
            else:
                j += 1
        return intervals[i : j + 1]

    def apply_highlight(
        self, keyword: str, doc_id: int, title: str, body: str
    ) -> tuple[str, str]:
        """applyHighlight for one item (search.go:108-166) →
        (title_highlighted, abstract). Rune-slice fallback divergence
        (§7.4.4c)."""
        pre, suf = "<span style='color:red'>", "</span>"

        def inject(text: str, hls: list[list[int]]) -> str:
            b, p = [], 0
            for h0, h1 in hls:
                b += [text[p:h0], pre, text[h0 : h1 + 1], suf]
                p = h1 + 1
            if p < len(text):
                b.append(text[p:])
            return "".join(b)

        bh = self.find_highlight(self._cursor_positions(keyword, doc_id, False))
        if bh:
            start, end = bh[0][0], bh[-1][1]
            span = end - start + 1
            padding = (100 - span) // 2 if span <= 100 else -((span - 100) // 2)
            start = max(start - padding, 0)
            if start - padding >= 0:
                end = min(len(body), end + padding)
            else:
                end = min(len(body), end + padding - start)
            abstract = inject(body[start:end], [[a - start, b_ - start] for a, b_ in bh])
        else:
            abstract = body[: min(100, len(body))]
        th = self.find_highlight(self._cursor_positions(keyword, doc_id, True))
        title_out = inject(title, th) if th else title
        return title_out, abstract

    def search(
        self, query: str, per_shard: int = 50, num_shards: int = 1
    ) -> list[tuple[int, float]]:
        """Full pipeline → [(doc_id, score)] ranked (engine.go:43-69 +
        web/service/search.go:192-203, intended AND semantics).

        ``num_shards`` emulates the reference's multi-index-server
        deployment: docs route to shard ``doc_id % num_shards``, EACH
        server truncates to its 50 lowest docIds (engine.go:64-65), the
        web layer concatenates and rank-sorts the union
        (web/service/search.go:147-151,192-203)."""
        from ..operators.search import parse_query  # same parse, no Spark dep

        pq = parse_query(query)
        if not pq.keywords:
            return []
        base = self.search_docs(pq.keywords[0], pq.site)
        for kw in pq.keywords[1:]:
            if not base:
                return []
            keep = set(self.search_docs(kw, pq.site))
            base = {d: sc for d, sc in base.items() if d in keep}
        for ex in pq.exclusions:
            if not base:
                return []
            drop = set(self.search_docs(ex, pq.site))
            base = {d: sc for d, sc in base.items() if d not in drop}
        shard: list[int] = []
        for s in range(num_shards):  # engine.go:65 — 50 lowest docIds EACH
            shard += sorted(d for d in base if d % num_shards == s)[:per_shard]
        ranked = sorted(((d, base[d]) for d in shard), key=lambda x: (-x[1], x[0]))
        return ranked
