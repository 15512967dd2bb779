"""Round-5: Czech light stemmer (Dolamic & Savoy, "Indexing and
stemming approaches for the Czech language", IP&M 45(6), 2009 — the
standard published Czech IR stemmer; Czech has no official Snowball
algorithm). Goldens below are hand-traced through the paper's rule
tables (case-ending tiers + palatalization + possessives), not
derived from this implementation.
"""

import warnings

import pytest

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.snowball import get_stemmer, stem_cs


GOLDENS = {
    # palatalization at the case boundary
    "matice": "matik",     # -e ending, c+e -> k  (matka/matice family)
    "praze": "prah",       # -e ending, z+e -> h  (locative of Praha)
    "matčin": "matk",      # possessive -in, č+i -> k
    # plain case-ending tiers
    "ženami": "žen",       # instr. pl. -ami
    "pánové": "pán",       # nom. pl. -ové
    "anglických": "anglick",  # gen. pl. adj. -ých
    "dívkám": "dívk",      # dat. pl. -ám
    "studentech": "student",  # loc. pl. -ech (no palatal group at t)
    "městech": "měst",
    "tělem": "těl",        # instr. sg. -em
    "divadle": "divadl",   # loc. sg. -e
    "divadlo": "divadl",   # nom. sg. -o (conflates with the above)
    "soudcích": "soudc",   # -ích keeps í out of the i-palatal groups
    # neuter -at- paradigm: both forms meet at the same stem
    "zvířata": "zvíř",
    "zvířatech": "zvíř",
    "hrabětem": "hrab",    # -ětem tier
    # minimum-length guards: short words untouched
    "pes": "pes",
    "les": "les",
    "dům": "dům",
}


def test_czech_goldens():
    for w, expect in GOLDENS.items():
        assert stem_cs(w) == expect, (w, stem_cs(w), expect)


def test_paradigm_conflation():
    # one noun paradigm -> one stem (the point of the stemmer)
    forms = ["žena", "ženy", "ženě", "ženu", "ženo", "ženou", "ženami"]
    stems = {stem_cs(w) for w in forms}
    assert stems == {"žen"}, stems


def test_registered_and_no_fallback_warning():
    assert get_stemmer("cs") is stem_cs
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning fails
        a = get_analyzer("text", locale="cs_CZ.UTF-8", stopwords="default")
    terms, _ = a.analyze("Studentech se učí v Praze")
    # "učí" is length 3 — below the final tier's >3 guard, unchanged
    assert terms == ["student", "učí", "prah"]


def test_flat_fast_path_differential():
    """The Arrow dictionary fast path must stem identically to the
    per-doc chain (no stopwords/accent so the flat path engages)."""
    a = get_analyzer("text_cs")
    texts = [
        "Zvířata v městech", "Matice a soudcích", "pánové ženami",
        "divadle divadlo hrabětem", "", "pes les dům",
    ]
    assert a._flat_fn is not None
    ft = a.analyze_flat(texts)
    fast = [ft.uniques[c] for c in ft.codes]
    slow_docs = a.analyze_batch(texts)
    slow = [t for terms, _ in slow_docs for t in terms]
    assert fast == slow
    assert list(ft.n_tokens) == [len(t[0]) for t in slow_docs]
