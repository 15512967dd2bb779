"""Slow, obviously-correct pure-Python reference implementation of the
query semantics + BM25/TFIDF formulas (SURVEY §2.2-2.5). Used as the
oracle for differential tests — mirrors the reference's fixture-driven
filter tests (`tests/search/*_tests.cpp`)."""

from __future__ import annotations

import collections
import math
import re

from iresearch_spark.analysis import get_analyzer
from iresearch_spark.search import ast


class PyIndex:
    def __init__(self, rows, analyzer="simple"):
        self.analyzer = get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        self.postings = collections.defaultdict(dict)  # term -> doc -> positions
        self.dl = {}
        for doc_id, text in rows:
            terms, positions = self.analyzer.analyze(text)
            if not terms:
                continue
            self.dl[doc_id] = len(terms)
            per = collections.defaultdict(list)
            for t, p in zip(terms, positions):
                per[t].append(p)
            for t, ps in per.items():
                self.postings[t][doc_id] = ps
        self.n_docs = len(self.dl)
        self.total_tf = sum(self.dl.values())
        self.avg_dl = self.total_tf / self.n_docs if self.n_docs else 0.0

    # ---- scoring ----
    def idf_bm25(self, df):
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(self, tf, dl, df, boost=1.0, k=1.2, b=0.75):
        c0 = boost * (k + 1.0) * self.idf_bm25(df)
        c1 = k * (1 - b) + (k * b / self.avg_dl if self.avg_dl else 0.0) * dl
        return c0 * tf / (c1 + tf)

    # ---- evaluation: node -> {doc: score} ----
    def eval(self, node, boost=1.0, scored_terms_limit=1024):
        stl = scored_terms_limit
        if isinstance(node, ast.Empty):
            return {}
        if isinstance(node, ast.AllDocs):
            return {d: node.boost * boost for d in self.dl}
        if isinstance(node, ast.Term):
            return self._score_terms([node.term], boost * node.boost, set([node.term]))
        if isinstance(node, ast.Terms):
            terms = [t for t in dict.fromkeys(node.terms)]
            scored = self._top_terms(terms, stl)
            return self._score_terms(terms, boost * node.boost, scored)
        if isinstance(node, ast.Prefix):
            terms = sorted(t for t in self.postings if t.startswith(node.prefix))
            scored = self._top_terms(terms, min(node.scored_terms_limit, stl))
            return self._score_terms(terms, boost * node.boost, scored)
        if isinstance(node, ast.Wildcard):
            rx = re.compile(
                "^" + "".join(
                    ".*" if c == "%" else "." if c == "_" else re.escape(c)
                    for c in node.pattern
                ) + "$"
            )
            terms = sorted(t for t in self.postings if rx.match(t))
            scored = self._top_terms(terms, min(node.scored_terms_limit, stl))
            return self._score_terms(terms, boost * node.boost, scored)
        if isinstance(node, ast.Range):
            def ok(t):
                if node.min_term is not None:
                    if node.include_min:
                        if t < node.min_term:
                            return False
                    elif t <= node.min_term:
                        return False
                if node.max_term is not None:
                    if node.include_max:
                        if t > node.max_term:
                            return False
                    elif t >= node.max_term:
                        return False
                return True

            terms = sorted(t for t in self.postings if ok(t))
            scored = self._top_terms(terms, min(node.scored_terms_limit, stl))
            return self._score_terms(terms, boost * node.boost, scored)
        if isinstance(node, ast.Fuzzy):
            cand = [
                (t, _lev(node.term, t))
                for t in self.postings
                if abs(len(t) - len(node.term)) <= node.distance
            ]
            cand = [(t, d) for t, d in cand if d <= node.distance]
            cand.sort(key=lambda td: (td[1], -len(self.postings[td[0]]), td[0]))
            terms = [t for t, _ in cand[: node.max_terms]]
            return self._score_terms(terms, boost * node.boost, set(terms))
        if isinstance(node, ast.Phrase):
            return self._eval_phrase(node, boost)
        if isinstance(node, ast.And):
            return self._eval_bool(node, boost, required=None)
        if isinstance(node, ast.Or):
            return self._eval_bool(node, boost, required=node.min_match)
        raise TypeError(node)

    def _top_terms(self, terms, limit):
        have = [t for t in terms if t in self.postings]
        have.sort(key=lambda t: (-len(self.postings[t]), t))
        return set(have[:limit])

    def _score_terms(self, terms, boost, scored):
        out = collections.defaultdict(float)
        for t in terms:
            d = self.postings.get(t)
            if not d:
                continue
            df = len(d)
            for doc, ps in d.items():
                s = (
                    self.bm25(len(ps), self.dl[doc], df, boost)
                    if t in scored
                    else 0.0
                )
                out[doc] += s
        return dict(out)

    def _eval_bool(self, node, boost, required):
        boost = boost * node.boost
        positives = [c for c in node.children if not isinstance(c, ast.Not)]
        negatives = [c.child for c in node.children if isinstance(c, ast.Not)]
        need = len(positives) if required is None else required
        counts = collections.defaultdict(int)
        scores = collections.defaultdict(float)
        for c in positives:
            res = self.eval(c, boost)
            for doc, s in res.items():
                counts[doc] += 1
                scores[doc] += s
        excl = set()
        for c in negatives:
            excl |= set(self.eval(c, 1.0))
        return {
            d: scores[d]
            for d in counts
            if counts[d] >= need and d not in excl
        }

    def _eval_phrase(self, node, boost):
        boost = boost * node.boost
        terms = list(node.terms)
        if any(t not in self.postings for t in terms):
            return {}
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        c0_sum = sum(
            (1.2 + 1.0) * self.idf_bm25(len(self.postings[t])) for t in terms
        ) * boost
        out = {}
        for doc in docs:
            cand = set(self.postings[terms[0]][doc])
            for i, t in enumerate(terms[1:], start=1):
                cand &= {p - i for p in self.postings[t][doc]}
            if cand:
                tf = len(cand)
                dl = self.dl[doc]
                k, b = 1.2, 0.75
                c1 = k * (1 - b) + (k * b / self.avg_dl) * dl
                out[doc] = c0_sum * tf / (c1 + tf)
        return out

    def topk(self, node, k=10):
        res = self.eval(node)
        return sorted(res.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]
