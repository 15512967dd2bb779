"""Query AST — the filter tree of the reference
(`core/search/filter.hpp:38-99`; catalog README.md:445-462) as plain
Python dataclasses. `prepare`/`execute` live in executor.py; rewrite
rules in planner.py."""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    boost: float = 1.0


@dataclass(frozen=True)
class Term(Node):
    """Exact term match (reference `by_term`, term_filter.cpp:92-128)."""

    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class Terms(Node):
    """Match any of a set of terms (reference `by_terms`)."""

    terms: tuple[str, ...]
    boost: float = 1.0

    def __init__(self, terms, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Prefix(Node):
    """Terms starting with a prefix (reference `by_prefix`)."""

    prefix: str
    boost: float = 1.0
    scored_terms_limit: int = 1024


@dataclass(frozen=True)
class Wildcard(Node):
    """SQL-style pattern, %=any run, _=one char (reference `by_wildcard`;
    the bench harness converts * ? to % _, utils/index-search.cpp:379-397)."""

    pattern: str
    boost: float = 1.0
    scored_terms_limit: int = 1024


@dataclass(frozen=True)
class Fuzzy(Node):
    """Levenshtein distance <= d (reference `by_edit_distance`,
    levenshtein_filter.cpp:171-263; bench uses max_terms=50)."""

    term: str
    distance: int = 1
    max_terms: int = 50
    boost: float = 1.0


@dataclass(frozen=True)
class Range(Node):
    """Term byte-range (reference `by_range`). None = unbounded."""

    min_term: str | None = None
    max_term: str | None = None
    include_min: bool = True
    include_max: bool = True
    boost: float = 1.0
    scored_terms_limit: int = 1024


@dataclass(frozen=True)
class Phrase(Node):
    """Positional phrase (reference `by_phrase`, phrase_query.cpp:49-113).
    `terms` are already-analyzed tokens at consecutive positions."""

    terms: tuple[str, ...]
    boost: float = 1.0

    def __init__(self, terms, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class SamePosition(Node):
    """All terms at the identical position (reference
    `by_same_position`, same_position_filter.cpp) — a Phrase with zero
    offsets."""

    terms: tuple[str, ...]
    boost: float = 1.0

    def __init__(self, terms, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class NgramSimilarity(Node):
    """Ngram-sequence similarity >= threshold (reference
    `by_ngram_similarity`, ngram_similarity_filter.hpp:33-49): `terms`
    is the target's analyzed ngram sequence; a doc matches when the
    longest common subsequence of (query ngrams, doc ngram stream) /
    len(terms) reaches `threshold`; score = boost * that ratio
    (ngram_similarity_query.cpp scores by match ratio)."""

    terms: tuple[str, ...]
    threshold: float = 0.7
    boost: float = 1.0

    def __init__(self, terms, threshold: float = 0.7, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "threshold", float(threshold))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class AllDocs(Node):
    """Match all docs with constant score = boost (reference `all`)."""

    boost: float = 1.0


@dataclass(frozen=True)
class Empty(Node):
    """Match nothing (reference `filter.hpp:160-164`)."""

    boost: float = 1.0


@dataclass(frozen=True)
class Not(Node):
    """Negation — only meaningful inside And/Or (reference
    boolean_filter.cpp:314-336)."""

    child: Node
    boost: float = 1.0


@dataclass(frozen=True)
class And(Node):
    """Conjunction, scores summed (reference boolean_filter.cpp:140-212)."""

    children: tuple[Node, ...]
    boost: float = 1.0

    def __init__(self, children, boost: float = 1.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Or(Node):
    """Disjunction with min_match (reference boolean_filter.cpp:221-312)."""

    children: tuple[Node, ...]
    min_match: int = 1
    boost: float = 1.0

    def __init__(self, children, min_match: int = 1, boost: float = 1.0):
        object.__setattr__(self, "children", tuple(children))
        object.__setattr__(self, "min_match", min_match)
        object.__setattr__(self, "boost", boost)
