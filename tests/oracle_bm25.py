"""NumPy textbook BM25 oracle — the operative reference engine.

/root/reference/ is empty (SURVEY.md §0), so "rank-identical to the reference
engine" (BASELINE.json:14) operationally means rank-identical to THIS ~80-line
textbook implementation, exactly as the driver's DuckDB oracle is the
reference for relational operators.

Pinned definitions (shared with sparksearch.* and the DuckDB oracle SQL):
  tokens(text) = maximal runs of [a-z0-9_] in lower(text)
  idf(t)       = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
  score(q, d)  = Σ_t qtf_t · idf_t · tf_td·(k1+1) / (tf_td + k1·(1-b+b·dl_d/avgdl))
  k1 = 1.2, b = 0.75; ranking order = (score DESC, doc_id ASC)

Deliberately independent code: plain dicts + math, no Spark, no shared helpers
beyond the regex constant.
"""

from __future__ import annotations

import math
import re
from collections import Counter

K1 = 1.2
B = 0.75
_TOKEN = re.compile(r"[a-z0-9_]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


class Bm25Oracle:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: [(doc_id, text)] — the whole corpus, driver-side (test scale)."""
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        df: Counter = Counter()
        for doc_id, text in docs:
            toks = tokenize(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            df.update(c.keys())
        self.df = dict(df)
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, query: str, doc_id: int) -> float:
        qtf = Counter(tokenize(query))
        s = 0.0
        for term, w in qtf.items():
            tf = self.tf[doc_id].get(term, 0)
            if tf == 0 or term not in self.df:
                continue
            dl = self.dl[doc_id]
            s += w * self.idf(term) * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / self.avgdl)
            )
        return s

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), disjunctive semantics, ties by doc_id ASC.
        Docs matching no known query term are excluded (score 0 ⇒ no match)."""
        qterms = set(tokenize(query)) & set(self.df)
        cand = {d for d in self.tf if qterms & set(self.tf[d])}
        scored = [(d, self.score(query, d)) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_batch(self, queries: list[tuple[int, str]], k: int = 10):
        """[(query_id, rank, doc_id, score)] for the whole query set."""
        out = []
        for qid, text in queries:
            for rank, (doc_id, score) in enumerate(self.topk(text, k), 1):
                out.append((qid, rank, doc_id, score))
        return out
