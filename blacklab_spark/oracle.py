"""Pure-Python/numpy oracle: tokenizer + postings + brute-force BM25.

The reference scores through Lucene's BM25Similarity (k1=1.2, b=0.75 —
its default since Lucene 6; BlackLab opens a plain IndexSearcher,
reference: engine/src/main/java/nl/inl/blacklab/search/BlackLabIndexAbstract.java:521).
This oracle implements the same Okapi/Lucene formula with *exact* doc
lengths (no lossy 1-byte norm quantization — see SURVEY.md §5):

    idf      = ln(1 + (N − df + 0.5)/(df + 0.5))
    tf_norm  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score    = Σ_terms idf·tf_norm      (ties broken by doc_id asc)

No Spark anywhere in this module — it is the independent referee the
engine must be rank- and score-identical to (1e-6), per FIXTURES.md §4.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from blacklab_spark.config import K1, B
from blacklab_spark.tokenizer import py_tokens_insensitive


@dataclass
class OracleIndex:
    doc_ids: list[int]
    tokens: dict[int, list[str]]                 # doc_id -> token list
    postings: dict[str, dict[int, list[int]]]    # term -> doc_id -> positions
    dl: dict[int, int]
    meta: dict[int, dict] = field(default_factory=dict)  # doc_id -> row meta

    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / max(1, self.n_docs)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(len(p) for p in self.postings.get(term, {}).values())


def build_oracle_index(rows: list[dict]) -> OracleIndex:
    """rows: transcript dicts with conv_id/turn_idx/text (+role/tool).

    doc_id = dense rank by (conv_id, turn_idx) — same contract as the
    engine (SURVEY.md §1.1 Document row).
    """
    ordered = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    idx = OracleIndex(doc_ids=[], tokens={}, postings={}, dl={})
    for doc_id, r in enumerate(ordered):
        toks = py_tokens_insensitive(r["text"])
        idx.doc_ids.append(doc_id)
        idx.tokens[doc_id] = toks
        idx.dl[doc_id] = len(toks)
        idx.meta[doc_id] = r
        for pos, t in enumerate(toks):
            idx.postings.setdefault(t, {}).setdefault(doc_id, []).append(pos)
    return idx


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score(idx: OracleIndex, terms: list[str], doc_id: int,
               k1: float = K1, b: float = B) -> float:
    avgdl = idx.avgdl
    dl = idx.dl[doc_id]
    s = 0.0
    # canonical summation order: sorted terms == engine's term_id order
    # (term ids are assigned in sorted-term order) — ties then resolve
    # bit-identically between oracle and engine (SURVEY.md §7 part 4)
    for t in sorted(set(terms)):
        plist = idx.postings.get(t, {})
        if doc_id not in plist:
            continue
        tf = len(plist[doc_id])
        idf = bm25_idf(idx.n_docs, len(plist))
        s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return s


def brute_topk(idx: OracleIndex, terms: list[str], k: int = 10,
               predicate=None, k1: float = K1, b: float = B) -> list[tuple[int, float]]:
    """Brute-force: score every doc containing ≥1 query term; top-k.

    ``predicate(meta_row) -> bool`` restricts the candidate set
    (filter-then-score; corpus stats stay global, like a Lucene filter).
    """
    cands: set[int] = set()
    for t in terms:
        cands.update(idx.postings.get(t, {}).keys())
    if predicate is not None:
        cands = {d for d in cands if predicate(idx.meta[d])}
    scored = [(d, bm25_score(idx, terms, d, k1, b)) for d in cands]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def phrase_hits(idx: OracleIndex, terms: list[str]) -> list[tuple[int, int, int]]:
    """Exact phrase matches → sorted (doc_id, start, end) half-open."""
    if not terms:
        return []
    first = idx.postings.get(terms[0], {})
    hits = []
    for doc_id, starts in first.items():
        toks = idx.tokens[doc_id]
        for s in starts:
            if s + len(terms) <= len(toks) and toks[s:s + len(terms)] == terms:
                hits.append((doc_id, s, s + len(terms)))
    hits.sort()
    return hits


def term_frequencies(idx: OracleIndex) -> dict[str, int]:
    """Corpus-wide collection frequency per term (insensitive)."""
    return {t: idx.cf(t) for t in idx.postings}


def collocations(idx: OracleIndex, term: str, window: int = 10) -> dict[str, int]:
    """Token frequencies in ±window around hits of ``term``, excluding
    the hit token itself (reference: search/results/Contexts.java:247-292)."""
    out: dict[str, int] = {}
    for doc_id, positions in idx.postings.get(term, {}).items():
        toks = idx.tokens[doc_id]
        for p in positions:
            lo = max(0, p - window)
            hi = min(len(toks), p + window + 1)
            for q in range(lo, hi):
                if q == p:
                    continue
                out[toks[q]] = out.get(toks[q], 0) + 1
    return out
