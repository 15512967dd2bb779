"""Snowball stemmers beyond English, pure Python, from the published
algorithm descriptions (snowballstem.org/algorithms/): German, Swedish,
Dutch, French, Spanish, Portuguese, Italian, Russian, Danish,
Norwegian, Finnish, Romanian, Hungarian, Turkish, Indonesian,
Hindi — plus Arabic via the published Light10 light stemmer (Larkey
et al. 2007, the algorithm Lucene deploys; see the Arabic section for
why it stands in for the Snowball Arabic algorithm).

Capability parity with the reference's locale-driven stemmer selection
(`core/analysis/text_token_stream.cpp:509` — `make_stemmer_ptr(
options.locale.getLanguage(), ...)` instantiates the libstemmer
algorithm for ANY locale). These are from-scratch implementations of
the public algorithm specs — no code shared with the reference or with
libstemmer/Snowball-generated sources (which are machine-generated C;
nothing here is derived from them).

Each `stem_xx(word)` expects a lowercase word and returns its stem.
The index-build hot path applies them through `MemoTable` (dict-memo
over the token dictionary — once per DISTINCT term per Arrow batch,
never per token), same discipline as `porter2.MemoStemmer`.

Spec-fidelity notes (documented deviations, all low-frequency):
  * French: the "ë -> He / ï -> Hi" pre-pass of the latest revision is
    implemented; "Hi" counts as non-vowel context for final-s removal.
  * Russian: operates on lowercase Cyrillic; ё is mapped to е first,
    as the algorithm prescribes.
"""

from __future__ import annotations

__all__ = [
    "STEMMERS", "MemoTable", "get_stemmer",
    "stem_de", "stem_sv", "stem_nl", "stem_fr", "stem_es", "stem_pt",
    "stem_it", "stem_ru", "stem_da", "stem_no", "stem_fi", "stem_ro",
    "stem_hu", "stem_tr", "stem_id", "stem_hi", "stem_ar",
]


# --------------------------------------------------------------- regions

def _r1_r2(word: str, vowels: frozenset[str]) -> tuple[int, int]:
    """Standard Snowball R1/R2: R1 = region after the first non-vowel
    following a vowel; R2 = same rule applied within R1. Returned as
    start indices (len(word) when the region is empty)."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _longest(word: str, sufs) -> str | None:
    """Longest suffix of `sufs` (pre-sorted longest-first) that `word`
    ends with — Snowball's 'search for the longest among' semantics:
    conditions are tested ONLY against this match, never a shorter one."""
    for s in sufs:
        if word.endswith(s):
            return s
    return None


def _longest_in(word: str, sufs, lim: int) -> str | None:
    """Longest suffix that lies WHOLLY within the region starting at
    `lim` — the semantics of Snowball's `setlimit tomark pV for
    ([substring] among(...))`: suffixes extending beyond the region are
    invisible to the match (a shorter in-region suffix can then win),
    but a matched suffix whose CONDITION fails still ends the step."""
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= lim:
            return s
    return None


def _rv_romance(word: str, vowels: frozenset[str]) -> int:
    """RV for Spanish/Portuguese/Italian: if the second letter is a
    consonant, RV is after the next following vowel; if the first two
    letters are vowels, after the next consonant; otherwise
    (consonant-vowel) after the third letter; end of word if not
    found."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


# ================================================================ German

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")


def stem_de(word: str) -> str:
    """Snowball German stemmer (snowballstem.org/algorithms/german/)."""
    word = word.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper-case flags)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and word[i - 1] in _DE_VOWELS
            and word[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    def regions(w: str) -> tuple[int, int]:
        r1, r2 = _r1_r2(w, _DE_VOWELS)
        return (min(max(3, r1), len(w)), r2)

    r1, r2 = regions(word)

    # Step 1: (a) e em en ern er es  (b) s after a valid s-ending
    step1a = ("ern", "em", "er", "en", "es", "e")
    done1 = False
    for suf in step1a:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                # "nisse" -> "niss" -> drop the extra s -> "nis"
                if word.endswith("niss"):
                    word = word[:-1]
            done1 = True
            break
    if not done1 and word.endswith("s"):
        if len(word) - 1 >= r1 and len(word) >= 2 and word[-2] in _DE_S_END:
            word = word[:-1]

    r1, r2 = regions(word)

    # Step 2: en er est ; st after a valid st-ending preceded by >=3 letters
    done2 = False
    for suf in ("est", "en", "er"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
            done2 = True
            break
    if not done2 and word.endswith("st"):
        if (
            len(word) - 2 >= r1
            and len(word) >= 6  # st-ending letter preceded by >= 3 letters
            and word[-3] in _DE_ST_END
        ):
            word = word[:-2]

    r1, r2 = regions(word)

    # Step 3: d-suffixes
    if word.endswith("end") or word.endswith("ung"):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
    elif word.endswith("isch"):
        if len(word) - 4 >= r2 and (len(word) < 5 or word[-5] != "e"):
            word = word[:-4]
    elif word.endswith("ig") or word.endswith("ik"):
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif word.endswith("lich") or word.endswith("heit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            for pre in ("er", "en"):
                if word.endswith(pre) and len(word) - 2 >= r1:
                    word = word[:-2]
                    break
    elif word.endswith("keit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            if word.endswith("lich") and len(word) - 4 >= r2:
                word = word[:-4]
            elif word.endswith("ig") and len(word) - 2 >= r2:
                word = word[:-2]

    word = word.replace("U", "u").replace("Y", "y")
    return (
        word.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# =============================================================== Swedish

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = sorted(
    [
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
        "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
        "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
        "het", "ast",
    ],
    key=len,
    reverse=True,
)
_SV_STEP3 = ("lig", "ig", "els")


def stem_sv(word: str) -> str:
    """Snowball Swedish stemmer (snowballstem.org/algorithms/swedish/)."""
    r1, _ = _r1_r2(word, _SV_VOWELS)
    r1 = min(max(3, r1), len(word))

    # Step 1: longest suffix of the list, delete if in R1; or s after a
    # valid s-ending
    for suf in _SV_STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    else:
        if (
            word.endswith("s")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _SV_S_END
        ):
            word = word[:-1]

    # Step 2: shorten dd gd nn dt gt kt tt by one (suffix in R1)
    for suf in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if word.endswith(suf) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # Step 3: longest among lig/ig/els (delete if in R1), löst -> lös,
    # fullt -> full (suffix must start in R1)
    if word.endswith("fullt") and len(word) - 5 >= r1:
        return word[:-1]
    if word.endswith("löst") and len(word) - 4 >= r1:
        return word[:-1]
    for suf in _SV_STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            return word[: -len(suf)]
    return word


# ================================================================ Danish

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = sorted(
    [
        "erendes", "erende", "hedens", "ethed", "erede", "heden",
        "heder", "endes", "ernes", "erens", "erets", "ered", "ende",
        "erne", "eren", "erer", "heds", "enes", "eres", "eret", "hed",
        "ene", "ere", "ens", "ers", "ets", "en", "er", "es", "et",
        "e",
    ],
    key=len,
    reverse=True,
)


def stem_da(word: str) -> str:
    """Snowball Danish stemmer (snowballstem.org/algorithms/danish/)."""
    r1, _ = _r1_r2(word, _DA_VOWELS)
    r1 = min(max(3, r1), len(word))

    # Step 1 (matching limited to R1, as the reference setlimit does)
    suf = _longest_in(word, _DA_STEP1, r1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _DA_S_END
    ):
        word = word[:-1]

    # Step 2: gd dt gt kt -> drop last letter (suffix in R1)
    for s2 in ("gd", "dt", "gt", "kt"):
        if word.endswith(s2) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # Step 3: igst -> drop the st (unrestricted); then, in R1:
    # (a) elig lig els ig delete + repeat step 2; (b) løst -> løs
    if word.endswith("igst"):
        word = word[:-2]
    suf = _longest_in(word, ("løst", "elig", "lig", "els", "ig"), r1)
    if suf == "løst":
        word = word[:-1]
    elif suf is not None:
        word = word[: -len(suf)]
        for s2 in ("gd", "dt", "gt", "kt"):
            if word.endswith(s2) and len(word) - 2 >= r1:
                word = word[:-1]
                break
    return word


# ============================================================= Norwegian

_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = sorted(
    [
        "hetenes", "hetene", "hetens", "heten", "heter", "endes",
        "ande", "ende", "edes", "enes", "erte", "ede",
        "ane", "ene", "ens", "ers", "ets", "het", "ast", "ert", "en",
        "ar", "er", "as", "es", "et", "a", "e",
    ],
    key=len,
    reverse=True,
)
_NO_STEP3 = sorted(
    ["hetslov", "eleg", "elov", "slov", "elig", "leg", "eig", "lig",
     "els", "lov", "ig"],
    key=len,
    reverse=True,
)


def stem_no(word: str) -> str:
    """Snowball Norwegian stemmer
    (snowballstem.org/algorithms/norwegian/)."""
    r1, _ = _r1_r2(word, _NO_VOWELS)
    r1 = min(max(3, r1), len(word))

    # Step 1 (R1-limited matching): longest suffix; erte/ert -> er;
    # s needs a valid s-ending (or k not preceded by a vowel)
    suf = _longest_in(word, _NO_STEP1, r1)
    if suf is not None:
        if suf in ("erte", "ert"):
            word = word[: -len(suf)] + "er"
        else:
            word = word[: -len(suf)]
    elif word.endswith("s") and len(word) - 1 >= r1 and len(word) >= 2:
        prev = word[-2]
        ok = prev in _NO_S_END or (
            prev == "k"
            and (len(word) < 3 or word[-3] not in _NO_VOWELS)
        )
        if ok:
            word = word[:-1]

    # Step 2: dt / vt -> drop t (suffix in R1)
    if (word.endswith("dt") or word.endswith("vt")) and len(word) - 2 >= r1:
        word = word[:-1]

    # Step 3: delete in R1
    suf = _longest_in(word, _NO_STEP3, r1)
    if suf is not None:
        word = word[: -len(suf)]
    return word


# ================================================================ Dutch

_NL_VOWELS = frozenset("aeiouyè")


def _nl_undouble(word: str) -> str:
    if word[-2:] in ("kk", "dd", "tt"):
        return word[:-1]
    return word


def stem_nl(word: str) -> str:
    """Snowball Dutch stemmer (snowballstem.org/algorithms/dutch/)."""
    # de-accent (umlauts and acutes map to the plain letter)
    table = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    word = word.translate(table)
    # uppercase-flag initial y, y after a vowel, and i between vowels
    chars = list(word)
    n = len(chars)
    if n and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, n):
        if chars[i] == "y" and word[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and i + 1 < n
            and word[i - 1] in _NL_VOWELS
            and word[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    r1, r2 = _r1_r2(word, _NL_VOWELS)
    r1 = min(max(3, r1), len(word))

    # Step 1
    if word.endswith("heden"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif word.endswith("ene") or word.endswith("en"):
        suf = "ene" if word.endswith("ene") else "en"
        base = word[: -len(suf)]
        if (
            len(word) - len(suf) >= r1
            and base
            and base[-1] not in _NL_VOWELS
            and not base.endswith("gem")
        ):
            word = _nl_undouble(base)
    elif word.endswith("se") or word.endswith("s"):
        suf = "se" if word.endswith("se") else "s"
        base = word[: -len(suf)]
        if (
            len(word) - len(suf) >= r1
            and base
            and base[-1] not in _NL_VOWELS
            and base[-1] != "j"
        ):
            word = base

    # Step 2: final e after a non-vowel, in R1; record for step 3b
    e_removed = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _NL_VOWELS
    ):
        word = _nl_undouble(word[:-1])
        e_removed = True

    # Step 3a: heid
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if word.endswith("en"):
            base = word[:-2]
            if (
                len(word) - 2 >= r1
                and base
                and base[-1] not in _NL_VOWELS
                and not base.endswith("gem")
            ):
                word = _nl_undouble(base)

    # Step 3b: d-suffixes
    if word.endswith("end") or word.endswith("ing"):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
            else:
                word = _nl_undouble(word)
    elif word.endswith("ig"):
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif word.endswith("lijk"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            # repeat step 2
            if (
                word.endswith("e")
                and len(word) - 1 >= r1
                and len(word) >= 2
                and word[-2] not in _NL_VOWELS
            ):
                word = _nl_undouble(word[:-1])
    elif word.endswith("baar"):
        if len(word) - 4 >= r2:
            word = word[:-4]
    elif word.endswith("bar"):
        if len(word) - 3 >= r2 and e_removed:
            word = word[:-3]

    # Step 4: undouble vowel — C v v C (C-final not I) with v in aa ee oo uu
    if len(word) >= 4:
        a, b, c, d = word[-4], word[-3], word[-2], word[-1]
        if (
            a not in _NL_VOWELS
            and b == c
            and b in "aeou"
            and d not in _NL_VOWELS
            and d != "I"
        ):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# =============================================================== Spanish

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_PRON_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")   # remove accent
_ES_PRON_PRE_B = ("iendo", "ando", "ar", "er", "ir")   # plain

_ES_ACCENT_FIX = str.maketrans("áéíóú", "aeiou")

# step 1: (suffix, action) pairs, ONE longest-match across all groups
_ES_STEP1 = sorted(
    [
        *[
            (s, "del_r2")
            for s in (
                "amientos", "imientos", "amiento", "imiento", "anzas",
                "ismos", "ables", "ibles", "istas", "anza", "icos",
                "icas", "ismo", "able", "ible", "ista", "osos", "osas",
                "ico", "ica", "oso", "osa",
            )
        ],
        *[
            (s, "ador")
            for s in (
                "aciones", "adoras", "adores", "ancias", "adora",
                "ación", "antes", "ancia", "ador", "ante",
            )
        ],
        ("logías", "log"), ("logía", "log"),
        ("uciones", "u"), ("ución", "u"),
        ("encias", "ente"), ("encia", "ente"),
        ("amente", "amente"), ("mente", "mente"),
        ("idades", "idad"), ("idad", "idad"),
        ("ivas", "iv"), ("ivos", "iv"), ("iva", "iv"), ("ivo", "iv"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_ES_STEP2A = sorted(
    [
        "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
        "ya", "ye", "yo", "yó",
    ],
    key=len,
    reverse=True,
)
# suffixes whose deletion also strips a preceding gu's u
_ES_STEP2B_GU = frozenset(["en", "es", "éis", "emos"])
_ES_STEP2B_ALL = sorted(
    [
        "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
        "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
        "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
        "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
        "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
        "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
        "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
        "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
        "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
        "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
        "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
        "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
        "ís", "emos", "éis", "en", "es",
    ],
    key=len,
    reverse=True,
)


def stem_es(word: str) -> str:
    """Snowball Spanish stemmer (snowballstem.org/algorithms/spanish/)."""
    r1, r2 = _r1_r2(word, _ES_VOWELS)
    rv = _rv_romance(word, _ES_VOWELS)

    # Step 0: attached pronoun after a gerund/infinitive, in RV
    pron = _longest_in(word, _ES_PRON, rv)
    if pron is not None:
        base = word[: -len(pron)]
        pre_a = _longest(base, _ES_PRON_PRE_A)
        if pre_a is not None and len(base) - len(pre_a) >= rv:
            # delete pronoun, un-accent the preceding gerund/infinitive
            word = base[: -len(pre_a)] + pre_a.translate(_ES_ACCENT_FIX)
        else:
            pre_b = _longest(base, _ES_PRON_PRE_B)
            if pre_b is not None and len(base) - len(pre_b) >= rv:
                word = base
            elif (
                base.endswith("yendo")
                and len(base) - 5 >= rv
                and base[:-5].endswith("u")
            ):
                word = base

    r1, r2 = _r1_r2(word, _ES_VOWELS)
    rv = _rv_romance(word, _ES_VOWELS)
    n0 = word

    # Step 1: standard suffix removal — single longest-match table
    hit1 = None
    for suf, act in _ES_STEP1:
        if word.endswith(suf):
            hit1 = (suf, act)
            break
    if hit1 is not None:
        suf, act = hit1
        k = len(suf)
        if len(word) - k >= (r1 if act == "amente" else r2):
            base = word[:-k]
            if act == "del_r2":
                word = base
            elif act == "ador":
                word = base
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
            elif act == "log":
                word = base + "log"
            elif act == "u":
                word = base + "u"
            elif act == "ente":
                word = base + "ente"
            elif act == "amente":
                word = base
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
            elif act == "mente":
                word = base
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
            elif act == "idad":
                word = base
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
            elif act == "iv":
                word = base
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]

    changed1 = word != n0

    # Step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    if not changed1:
        rv = _rv_romance(word, _ES_VOWELS)
        n1 = word
        suf = _longest_in(word, _ES_STEP2A, rv)
        if suf is not None and word[: -len(suf)].endswith("u"):
            word = word[: -len(suf)]
        # Step 2b: other verb suffixes (only if 2a removed nothing)
        if word == n1:
            suf = _longest_in(word, _ES_STEP2B_ALL, rv)
            if suf is not None:
                word = word[: -len(suf)]
                if suf in _ES_STEP2B_GU and word.endswith("gu"):
                    word = word[:-1]

    # Step 3: residual suffix
    rv = _rv_romance(word, _ES_VOWELS)
    suf = _longest_in(word, ("os", "a", "o", "á", "í", "ó", "e", "é"), rv)
    if suf is not None:
        if suf in ("e", "é"):
            word = word[:-1]
            if word.endswith("gu") and len(word) - 1 >= rv:
                word = word[:-1]
        else:
            word = word[: -len(suf)]

    return word.translate(_ES_ACCENT_FIX)


# =============================================================== Italian

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_PRON = sorted(
    [
        "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
        "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
        "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
        "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
        "lo", "mi", "ne", "si", "ti", "vi",
    ],
    key=len,
    reverse=True,
)
_IT_STEP1 = sorted(
    [
        *[
            (s, "del_r2")
            for s in (
                "amento", "amenti", "imento", "imenti", "azione",
                "azioni", "anza", "anze", "ico", "ici", "ica", "ice",
                "iche", "ichi", "ismo", "ismi", "abile", "abili",
                "ibile", "ibili", "ista", "iste", "isti", "istà",
                "istè", "istì", "oso", "osi", "osa", "ose", "atore",
                "atori",
            )
        ],
        ("logia", "log"), ("logie", "log"),
        ("uzione", "u"), ("uzioni", "u"), ("usione", "u"), ("usioni", "u"),
        ("enza", "ente"), ("enze", "ente"),
        ("amente", "amente"), ("mente", "mente"),
        ("ità", "ita"),
        ("ivo", "iv"), ("ivi", "iv"), ("iva", "iv"), ("ive", "iv"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_IT_STEP2 = sorted(
    [
        "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
        "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
        "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
        "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
        "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
        "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo",
        "enda", "ende", "endi", "endo", "erai", "erei", "iamo", "immo",
        "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
        "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
        "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
        "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
        "uti", "uto", "ar", "ir",
    ],
    key=len,
    reverse=True,
)


def stem_it(word: str) -> str:
    """Snowball Italian stemmer (snowballstem.org/algorithms/italian/)."""
    # acute accents -> grave; mark u/i between vowels, u after q
    word = word.translate(str.maketrans("áéíóú", "àèìòù"))
    chars = list(word)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in "ui" and word[i - 1] in _IT_VOWELS and word[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    for i in range(1, n):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    word = "".join(chars)

    r1, r2 = _r1_r2(word, _IT_VOWELS)
    rv = _rv_romance(word, _IT_VOWELS)

    # Step 0: attached pronoun after ando/endo (delete) or ar/er/ir
    # (replace with e), in RV
    pron = _longest_in(word, _IT_PRON, rv)
    if pron is not None:
        base = word[: -len(pron)]
        pre = _longest(base, ("ando", "endo"))
        if pre is not None and len(base) - len(pre) >= rv:
            word = base
        else:
            pre = _longest(base, ("ar", "er", "ir"))
            if pre is not None and len(base) - len(pre) >= rv:
                word = base + "e"

    r1, r2 = _r1_r2(word, _IT_VOWELS)
    rv = _rv_romance(word, _IT_VOWELS)
    n0 = word

    # Step 1: standard suffixes
    hit1 = None
    for suf, act in _IT_STEP1:
        if word.endswith(suf):
            hit1 = (suf, act)
            break
    if hit1 is not None:
        suf, act = hit1
        k = len(suf)
        if act == "amente":
            if len(word) - k >= r1:
                word = word[:-k]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if (
                            word.endswith(pre)
                            and len(word) - len(pre) >= r2
                        ):
                            word = word[: -len(pre)]
                            break
        elif len(word) - k >= r2:
            base = word[:-k]
            if act == "del_r2":
                word = base
                if word.endswith("ic") and len(word) - 2 >= r2 and suf in (
                    "azione", "azioni", "atore", "atori"
                ):
                    word = word[:-2]
            elif act == "log":
                word = base + "log"
            elif act == "u":
                word = base + "u"
            elif act == "ente":
                word = base + "ente"
            elif act == "mente":
                word = base
            elif act == "ita":
                word = base
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
            elif act == "iv":
                word = base
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]

    # Step 2: verb suffixes (only if step 1 removed nothing)
    if word == n0:
        rv = _rv_romance(word, _IT_VOWELS)
        suf = _longest_in(word, _IT_STEP2, rv)
        if suf is not None:
            word = word[: -len(suf)]

    # Step 3a: final vowel (a e i o à è ì ò) in RV; then a second final
    # i in RV
    rv = _rv_romance(word, _IT_VOWELS)
    if word and word[-1] in "aeioàèìò" and len(word) - 1 >= rv:
        word = word[:-1]
        if word and word[-1] == "i" and len(word) - 1 >= rv:
            word = word[:-1]
    # Step 3b: ch -> c, gh -> g (suffix in RV)
    if (word.endswith("ch") or word.endswith("gh")) and len(word) - 2 >= rv:
        word = word[:-1]

    return word.replace("U", "u").replace("I", "i")


# ============================================================ Portuguese

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

_PT_STEP1 = sorted(
    [
        *[
            (s, "del_r2")
            for s in (
                "amentos", "imentos", "amento", "imento", "adoras",
                "adores", "aço~es", "antes", "ância", "adora", "ador",
                "aça~o", "ante", "ezas", "icos", "icas", "ismos",
                "áveis", "íveis", "istas", "eza", "ico", "ica", "ismo",
                "ável", "ível", "ista", "osos", "osas", "oso", "osa",
            )
        ],
        ("logias", "log"), ("logia", "log"),
        ("uço~es", "u"), ("uça~o", "u"),
        ("ências", "ente"), ("ência", "ente"),
        ("amente", "amente"), ("mente", "mente"),
        ("idades", "idad"), ("idade", "idad"),
        ("ivas", "iv"), ("ivos", "iv"), ("iva", "iv"), ("ivo", "iv"),
        ("iras", "ira"), ("ira", "ira"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_PT_STEP2 = sorted(
    [
        "aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
        "íssemos", "aríeis", "eríeis", "iríeis", "ásseis", "ésseis",
        "ísseis", "áramos", "éramos", "íramos", "ávamos", "aremos",
        "eremos", "iremos", "ariam", "eriam", "iriam", "assem",
        "essem", "issem", "arias", "erias", "irias", "ardes", "erdes",
        "irdes", "asses", "esses", "isses", "astes", "estes", "istes",
        "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "áveis",
        "íamos", "armos", "ermos", "irmos", "aria", "eria", "iria",
        "asse", "esse", "isse", "aste", "este", "iste", "arei", "erei",
        "irei", "aram", "eram", "iram", "avam", "arem", "erem", "irem",
        "ando", "endo", "indo", "adas", "idas", "arás", "aras", "erás",
        "eras", "irás", "avas", "ares", "eres", "ires", "íeis", "ados",
        "idos", "ámos", "amos", "emos", "imos", "iras", "ada", "ida",
        "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado", "ido",
        "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar", "er",
        "ir", "as", "es", "is", "eu", "iu", "ou",
    ],
    key=len,
    reverse=True,
)


def stem_pt(word: str) -> str:
    """Snowball Portuguese stemmer
    (snowballstem.org/algorithms/portuguese/)."""
    # nasalized vowels become vowel + consonant marker
    word = word.replace("ã", "a~").replace("õ", "o~")

    r1, r2 = _r1_r2(word, _PT_VOWELS)
    rv = _rv_romance(word, _PT_VOWELS)
    n0 = word

    # Step 1: standard suffix removal
    hit1 = None
    for suf, act in _PT_STEP1:
        if word.endswith(suf):
            hit1 = (suf, act)
            break
    if hit1 is not None:
        suf, act = hit1
        k = len(suf)
        if act == "amente":
            if len(word) - k >= r1:
                word = word[:-k]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif act == "ira":
            if len(word) - k >= rv and word[: -k].endswith("e"):
                word = word[:-k] + "ir"
        elif len(word) - k >= r2:
            base = word[:-k]
            if act == "del_r2":
                word = base
                if suf in (
                    "adoras", "adores", "aço~es", "antes", "ância",
                    "adora", "ador", "aça~o", "ante",
                ) and word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
            elif act == "log":
                word = base + "log"
            elif act == "u":
                word = base + "u"
            elif act == "ente":
                word = base + "ente"
            elif act == "mente":
                word = base
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
            elif act == "idad":
                word = base
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
            elif act == "iv":
                word = base
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]

    step1_changed = word != n0

    # Step 2: verb suffixes (only if step 1 made no change)
    step2_changed = False
    if not step1_changed:
        rv = _rv_romance(word, _PT_VOWELS)
        suf = _longest_in(word, _PT_STEP2, rv)
        if suf is not None:
            word = word[: -len(suf)]
            step2_changed = True

    # Step 3: delete final i preceded by c (if steps 1/2 changed)
    if step1_changed or step2_changed:
        rv = _rv_romance(word, _PT_VOWELS)
        if word.endswith("ci") and len(word) - 1 >= rv:
            word = word[:-1]
    else:
        # Step 4: residual suffix
        rv = _rv_romance(word, _PT_VOWELS)
        suf = _longest_in(word, ("os", "a", "i", "o", "á", "í", "ó"), rv)
        if suf is not None:
            word = word[: -len(suf)]

    # Step 5: residual form
    rv = _rv_romance(word, _PT_VOWELS)
    if word and word[-1] in "eéê" and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("gu") and len(word) - 1 >= rv:
            word = word[:-1]
        elif word.endswith("ci") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


# ================================================================ French

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_STEP1 = sorted(
    [
        *[
            (s, "del_r2")
            for s in (
                "ances", "iqUes", "ismes", "ables", "istes", "ance",
                "iqUe", "isme", "able", "iste", "eux",
            )
        ],
        *[
            (s, "ateur")
            for s in (
                "atrices", "ateurs", "ations", "atrice", "ateur",
                "ation",
            )
        ],
        ("logies", "log"), ("logie", "log"),
        ("usions", "u"), ("utions", "u"), ("usion", "u"), ("ution", "u"),
        ("ences", "ent"), ("ence", "ent"),
        ("ements", "ement"), ("ement", "ement"),
        ("ités", "ite"), ("ité", "ite"),
        ("ifs", "if"), ("ives", "if"), ("if", "if"), ("ive", "if"),
        ("eaux", "eaux"), ("aux", "aux"),
        ("euses", "euse"), ("euse", "euse"),
        ("issements", "issement"), ("issement", "issement"),
        ("amment", "amment"), ("emment", "emment"),
        ("ments", "ment"), ("ment", "ment"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_FR_STEP2A = sorted(
    [
        "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
        "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
        "irions", "irons", "iront", "is", "issaIent", "issais",
        "issait", "issant", "issante", "issantes", "issants", "isse",
        "issent", "isses", "issez", "issiez", "issions", "issons", "it",
    ],
    key=len,
    reverse=True,
)
_FR_STEP2B_ER = sorted(
    [
        "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
        "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
        "erons", "eront", "ez", "iez",
    ],
    key=len,
    reverse=True,
)
_FR_STEP2B_A = sorted(
    [
        "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
        "ante", "antes", "ants", "as", "asse", "assent", "asses",
        "assiez", "assions",
    ],
    key=len,
    reverse=True,
)
_FR_STEP2B_ALL = sorted(
    ["ions"] + _FR_STEP2B_ER + _FR_STEP2B_A, key=len, reverse=True
)


def stem_fr(word: str) -> str:
    """Snowball French stemmer (snowballstem.org/algorithms/french/)."""
    # pre-pass: mark u/i between vowels, y next to a vowel, u after q;
    # ë -> He, ï -> Hi (the revised spec's hiatus markers)
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c in "ui" and 0 < i < n - 1 and (
            word[i - 1] in _FR_VOWELS and word[i + 1] in _FR_VOWELS
        ):
            chars[i] = c.upper()
        elif c == "y" and (
            (i > 0 and word[i - 1] in _FR_VOWELS)
            or (i < n - 1 and word[i + 1] in _FR_VOWELS)
        ):
            chars[i] = "Y"
        elif c == "u" and i > 0 and word[i - 1] == "q":
            chars[i] = "U"
    word = "".join(chars).replace("ë", "He").replace("ï", "Hi")

    def _rv_fr(w: str) -> int:
        m = len(w)
        if m >= 3 and (
            (w[0] in _FR_VOWELS and w[1] in _FR_VOWELS)
            or w[:3] in ("par", "col", "tap")
        ):
            return 3
        for i in range(1, m):
            if w[i] in _FR_VOWELS:
                return i + 1
        return m

    r1, r2 = _r1_r2(word, _FR_VOWELS)
    rv = _rv_fr(word)
    n0 = word

    # ---- Step 1: standard suffix removal
    step1_matched_ment = False  # amment/emment/ment(s) need step 2 too
    hit1 = None
    for suf, act in _FR_STEP1:
        if word.endswith(suf):
            hit1 = (suf, act)
            break
    if hit1 is not None:
        suf, act = hit1
        k = len(suf)
        base = word[:-k]
        if act == "del_r2":
            if len(word) - k >= r2:
                word = base
        elif act == "ateur":
            if len(word) - k >= r2:
                word = base
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif act == "log":
            if len(word) - k >= r2:
                word = base + "log"
        elif act == "u":
            if len(word) - k >= r2:
                word = base + "u"
        elif act == "ent":
            if len(word) - k >= r2:
                word = base + "ent"
        elif act == "ement":
            if len(word) - k >= rv:
                word = base
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= r2:
                        word = word[:-3]
                    elif len(word) - 3 >= r1:
                        word = word[:-3] + "eux"
                elif word.endswith("abl") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("iqU") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
                elif word.endswith("Ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif act == "ite":
            if len(word) - k >= r2:
                word = base
                if word.endswith("abil"):
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif act == "if":
            if len(word) - k >= r2:
                word = base
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        if len(word) - 2 >= r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif act == "eaux":
            word = base + "eau"
        elif act == "aux":
            if len(word) - k >= r1:
                word = base + "al"
        elif act == "euse":
            if len(word) - k >= r2:
                word = base
            elif len(word) - k >= r1:
                word = base + "eux"
        elif act == "issement":
            if len(word) - k >= r1 and base and base[-1] not in _FR_VOWELS:
                word = base
        elif act == "amment":
            if len(word) - k >= rv:
                word = base + "ant"
                step1_matched_ment = True
        elif act == "emment":
            if len(word) - k >= rv:
                word = base + "ent"
                step1_matched_ment = True
        elif act == "ment":
            # delete if preceded by a vowel in RV (the vowel stays)
            if base and base[-1] in _FR_VOWELS and len(word) - k - 1 >= rv:
                word = base
            step1_matched_ment = True

    step1_changed = word != n0

    # ---- Step 2a: verb suffixes beginning i (if step 1 left the word
    # unchanged, or matched one of the ment suffixes)
    step2_changed = False
    if (not step1_changed) or step1_matched_ment:
        rv = _rv_fr(word)
        n1 = word
        suf = _longest_in(word, _FR_STEP2A, rv)
        if (
            suf is not None
            and len(word) - len(suf) - 1 >= rv
            and word[-len(suf) - 1] not in _FR_VOWELS
            and word[-len(suf) - 1] != "H"
        ):
            word = word[: -len(suf)]
        # ---- Step 2b (only if 2a removed nothing)
        if word == n1:
            suf = _longest_in(word, _FR_STEP2B_ALL, rv)
            if suf is not None:
                if suf == "ions":
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                elif suf in _FR_STEP2B_ER:
                    word = word[: -len(suf)]
                else:  # the a-group
                    word = word[: -len(suf)]
                    if word.endswith("e") and len(word) - 1 >= rv:
                        word = word[:-1]
        step2_changed = word != n1

    # ---- Step 3 (if a previous step changed the word) else step 4
    if step1_changed or step2_changed:
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # Step 4
        rv = _rv_fr(word)
        # final s falls unless preceded by a i o u è s — but an i that
        # is itself the i of a Hi marker (original ï) does NOT protect
        if word.endswith("s") and len(word) >= 2 and (
            word[-2] not in "aiouès" or word.endswith("His")
        ):
            word = word[:-1]
        rv = _rv_fr(word)
        suf = _longest_in(
            word, ("ière", "Ière", "ion", "ier", "Ier", "e"), rv
        )
        if suf == "ion":
            if len(word) - 3 >= r2 and len(word) - 4 >= rv and len(
                word
            ) >= 4 and word[-4] in "st":
                word = word[:-3]
        elif suf in ("ière", "Ière", "ier", "Ier"):
            word = word[: -len(suf)] + "i"
        elif suf == "e":
            word = word[:-1]

    # ---- Step 5: undouble
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(suf):
            word = word[:-1]
            break

    # ---- Step 6: un-accent é/è before a final non-vowel run
    m = len(word)
    i = m - 1
    while i >= 0 and word[i] not in _FR_VOWELS:
        i -= 1
    if 0 <= i < m - 1 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1 :]

    return (
        word.replace("I", "i").replace("U", "u").replace("Y", "y")
        .replace("He", "ë").replace("Hi", "ï").replace("H", "")
    )


# =============================================================== Russian

_RU_VOWELS = frozenset("аеиоуыэюя")

# families merge their а/я-context group (1) and plain group (2) into
# ONE longest-match list, as the reference among() does; group-1 hits
# additionally require а/я immediately before (left in place), and a
# failed context check ENDS the family (no retry of a shorter suffix)
_RU_PERF_GERUND = sorted(
    [("вшись", 1), ("вши", 1), ("в", 1)]
    + [(s, 2) for s in ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")],
    key=lambda p: len(p[0]),
    reverse=True,
)
_RU_ADJECTIVE = sorted(
    [
        "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые",
        "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
        "ых", "ую", "юю", "ая", "яя", "ою", "ею",
    ],
    key=len,
    reverse=True,
)
_RU_PARTICIPLE = sorted(
    [("ем", 1), ("нн", 1), ("вш", 1), ("ющ", 1), ("щ", 1)]
    + [(s, 2) for s in ("ивш", "ывш", "ующ")],
    key=lambda p: len(p[0]),
    reverse=True,
)
_RU_VERB = sorted(
    [
        (s, 1)
        for s in (
            "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
            "но", "ет", "ют", "ны", "ть", "ешь", "нно",
        )
    ]
    + [
        (s, 2)
        for s in (
            "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
            "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
            "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить",
            "ыть", "ишь", "ую", "ю",
        )
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_RU_NOUN = sorted(
    [
        "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья",
        "ия", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
        "ям", "ем", "ам", "ом", "ах", "ях", "ы", "ь", "ью", "ю", "а",
        "е", "и", "й", "о", "у", "я",
    ],
    key=len,
    reverse=True,
)


def stem_ru(word: str) -> str:
    """Snowball Russian stemmer (snowballstem.org/algorithms/russian/);
    ё is treated as е, as the algorithm prescribes."""
    word = word.replace("ё", "е")
    n = len(word)
    rv = n
    for i, c in enumerate(word):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = _r1_r2(word, _RU_VOWELS)

    def ends_in_rv(w: str, suf: str) -> bool:
        return w.endswith(suf) and len(w) - len(suf) >= rv

    def family(w: str, pairs) -> str | None:
        """Longest suffix (within RV) over a merged 1/2 family; a
        group-1 match additionally needs а/я before it (also in RV)."""
        for suf, grp in pairs:
            if ends_in_rv(w, suf):
                if grp == 2:
                    return w[: -len(suf)]
                k = len(suf)
                if len(w) - k - 1 >= rv and w[-k - 1] in "ая":
                    return w[:-k]
                return None  # context failed -> family fails
        return None

    # Step 1: perfective gerund, else [reflexive] + adjectival / verb
    # / noun
    out = family(word, _RU_PERF_GERUND)
    if out is not None:
        word = out
    else:
        for suf in ("ся", "сь"):
            if ends_in_rv(word, suf):
                word = word[: -len(suf)]
                break
        adj = _longest_in(word, _RU_ADJECTIVE, rv)
        if adj is not None:
            word = word[: -len(adj)]
            out = family(word, _RU_PARTICIPLE)  # optional participle
            if out is not None:
                word = out
        else:
            out = family(word, _RU_VERB)
            if out is not None:
                word = out
            else:
                suf = _longest_in(word, _RU_NOUN, rv)
                if suf is not None:
                    word = word[: -len(suf)]

    # Step 2: final и
    if ends_in_rv(word, "и"):
        word = word[:-1]

    # Step 3: derivational ост/ость in R2
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # Step 4: (a) undouble нн; or (b) ейш(е) then undouble нн;
    # (c) final ь
    if ends_in_rv(word, "нн"):
        word = word[:-1]
    else:
        for suf in ("ейше", "ейш"):
            if ends_in_rv(word, suf):
                word = word[: -len(suf)]
                if ends_in_rv(word, "нн"):
                    word = word[:-1]
                break
        else:
            if ends_in_rv(word, "ь"):
                word = word[:-1]

    return word


# ================================================================ Finnish

_FI_VOWELS = frozenset("aeiouyäö")
_FI_STEP1 = sorted(
    ["kään", "kaan", "sti", "kin", "han", "hän", "ko", "kö", "pa", "pä"],
    key=len,
    reverse=True,
)
_FI_STEP2 = sorted(
    ["nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en"],
    key=len,
    reverse=True,
)
# step 3 (case endings); hXn entries carry the vowel X the suffix must
# follow, per the spec's "preceded by X" condition
_FI_HXN = {
    "han": "a", "hen": "e", "hin": "i", "hon": "o",
    "hän": "ä", "hön": "ö", "hun": "u", "hyn": "y",
}
_FI_STEP3_PLAIN = frozenset(
    ["ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
     "ltä", "lle", "na", "nä", "ksi", "ine"]
)
_FI_STEP3 = sorted(
    ["siin", "den", "tten", "seen", "a", "ä", "tta", "ttä", "n",
     *_FI_HXN, *_FI_STEP3_PLAIN],
    key=len,
    reverse=True,
)
_FI_STEP4 = sorted(
    ["impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä",
     "mpi", "mpa", "mpä", "mmi", "mma", "mmä"],
    key=len,
    reverse=True,
)


def _fi_ends_lv(word: str, lim: int) -> bool:
    """Word ends with a doubled vowel whose first letter is >= lim
    (Snowball's LV test under `setlimit tomark p1`)."""
    return (
        len(word) >= 2
        and len(word) - 2 >= lim
        and word[-1] == word[-2]
        and word[-1] in _FI_VOWELS
    )


def stem_fi(word: str) -> str:
    """Snowball Finnish stemmer (snowballstem.org/algorithms/finnish/).

    All positive context tests honour the R1/R2 `setlimit` the spec
    wraps each step in (context outside the region fails the test);
    negative tests ("not preceded by ...") succeed when the context
    falls outside the region, matching Snowball's `not` semantics.
    """
    r1, r2 = _r1_r2(word, _FI_VOWELS)

    # Step 1 (particles etc): longest in R1; the particle group needs
    # n, t or a vowel before it; 'sti' needs R2.
    suf = _longest_in(word, _FI_STEP1, r1)
    if suf is not None:
        k = len(word) - len(suf)
        if suf == "sti":
            if k >= r2:
                word = word[:-3]
        elif k - 1 >= r1 and word[k - 1] in _FI_VOWELS | {"n", "t"}:
            word = word[:k]

    # Step 2 (possessives): longest in R1.
    suf = _longest_in(word, _FI_STEP2, r1)
    if suf is not None:
        k = len(word) - len(suf)
        if suf == "si":
            if word[k - 1 : k] != "k":  # not preceded by k
                word = word[:k]
        elif suf == "ni":
            word = word[:k]
            if word.endswith("kse"):
                word = word[:-1] + "i"
        elif suf == "an":
            if any(
                word.endswith(p, 0, k) and k - len(p) >= r1
                for p in ("ta", "ssa", "sta", "lla", "lta", "na")
            ):
                word = word[:k]
        elif suf == "än":
            if any(
                word.endswith(p, 0, k) and k - len(p) >= r1
                for p in ("tä", "ssä", "stä", "llä", "ltä", "nä")
            ):
                word = word[:k]
        elif suf == "en":
            if any(
                word.endswith(p, 0, k) and k - len(p) >= r1
                for p in ("lle", "ine")
            ):
                word = word[:k]
        else:  # nsa nsä mme nne
            word = word[:k]

    # Step 3 (cases): longest in R1; sets the ending_removed flag the
    # plural step keys off.
    ending_removed = False
    suf = _longest_in(word, _FI_STEP3, r1)
    if suf is not None:
        k = len(word) - len(suf)
        if suf in _FI_HXN:
            x = _FI_HXN[suf]
            if k - 1 >= r1 and word[k - 1] == x:
                word = word[:k]
                ending_removed = True
        elif suf in ("siin", "den", "tten"):
            # preceded by Vi: vowel then i
            if (
                k - 2 >= r1
                and word[k - 1] == "i"
                and word[k - 2] in _FI_VOWELS
            ):
                word = word[:k]
                ending_removed = True
        elif suf == "seen":
            # preceded by LV (doubled vowel)
            if (
                k - 2 >= r1
                and word[k - 1] == word[k - 2]
                and word[k - 1] in _FI_VOWELS
            ):
                word = word[:k]
                ending_removed = True
        elif suf in ("a", "ä"):
            # preceded by cv (consonant then vowel)
            if (
                k - 2 >= r1
                and word[k - 1] in _FI_VOWELS
                and word[k - 2] not in _FI_VOWELS
            ):
                word = word[:k]
                ending_removed = True
        elif suf in ("tta", "ttä"):
            if k - 1 >= r1 and word[k - 1] == "e":
                word = word[:k]
                ending_removed = True
        elif suf == "n":
            word = word[:k]
            ending_removed = True
            # if preceded by LV or ie, delete one more letter
            if _fi_ends_lv(word, r1) or (
                word.endswith("ie") and len(word) - 2 >= r1
            ):
                word = word[:-1]
        else:  # the plain delete list
            word = word[:k]
            ending_removed = True

    # Step 4 (other endings): longest in R2; comparative mp*/mm* group
    # only when NOT preceded by po.
    suf = _longest_in(word, _FI_STEP4, r2)
    if suf is not None:
        k = len(word) - len(suf)
        if len(suf) == 3 and suf not in ("eja", "ejä"):
            if not word.endswith("po", 0, k):
                word = word[:k]
        else:
            word = word[:k]

    # Step 5 (plurals)
    if ending_removed:
        if word[-1:] in ("i", "j") and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (
            word.endswith("t")
            and len(word) - 1 >= r1
            and len(word) - 2 >= r1
            and word[-2] in _FI_VOWELS
        ):
            word = word[:-1]
            if word.endswith("imma") and len(word) - 4 >= r2:
                word = word[:-4]
            elif (
                word.endswith("mma")
                and len(word) - 3 >= r2
                and not word.endswith("pomma")
            ):
                word = word[:-3]

    # Step 6 (tidying): sub-steps applied in turn, each at most once.
    # (a) final doubled vowel in R1
    if _fi_ends_lv(word, r1):
        word = word[:-1]
    # (b) final cX, c consonant, X in {a ä e i}, both in R1
    if (
        len(word) >= 2
        and len(word) - 2 >= r1
        and word[-1] in "aäei"
        and word[-2] not in _FI_VOWELS
    ):
        word = word[:-1]
    # (c) final oj / uj in R1
    if word[-2:] in ("oj", "uj") and len(word) - 2 >= r1:
        word = word[:-1]
    # (d) final jo in R1
    if word[-2:] == "jo" and len(word) - 2 >= r1:
        word = word[:-1]
    # (e) undouble: double consonant followed by zero or more vowels
    i = len(word)
    while i > 0 and word[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and word[i - 1] == word[i - 2] and word[i - 1] not in _FI_VOWELS:
        word = word[: i - 1] + word[i:]

    return word


# =============================================================== Romanian

_RO_VOWELS = frozenset("aăâeiîou")
# step 0 (plural/article removal): suffix -> replacement (None=delete)
_RO_STEP0 = sorted(
    [
        ("iilor", "i"), ("ului", None), ("iile", "i"), ("elor", "e"),
        ("ilor", "i"), ("atei", "at"), ("ație", "ați"), ("ația", "ați"),
        ("aua", "a"), ("ele", "e"), ("iua", "i"), ("iei", "i"),
        ("ile", "i"),  # condition: not preceded by ab
        ("ul", None), ("ea", "e"), ("ii", "i"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
# step 1 (combining suffixes; repeated until no change)
_RO_STEP1 = sorted(
    [
        ("abilitate", "abil"), ("abilitati", "abil"),
        ("abilităi", "abil"), ("abilități", "abil"),
        ("ibilitate", "ibil"),
        ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
        ("ivități", "iv"),
        ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
        ("icități", "ic"), ("icator", "ic"), ("icatori", "ic"),
        ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"),
        ("icivi", "ic"), ("icivă", "ic"),
        ("ical", "ic"), ("icala", "ic"), ("icale", "ic"),
        ("icali", "ic"), ("icală", "ic"),
        ("ativ", "at"), ("ativa", "at"), ("ative", "at"),
        ("ativi", "at"), ("ativă", "at"), ("ațiune", "at"),
        ("atoare", "at"), ("ator", "at"), ("atori", "at"),
        ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
        ("itiv", "it"), ("itiva", "it"), ("itive", "it"),
        ("itivi", "it"), ("itivă", "it"), ("ițiune", "it"),
        ("itoare", "it"), ("itor", "it"), ("itori", "it"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_RO_STEP2_DELETE = frozenset(
    [
        "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
        "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
        "ici", "ică", "abil", "abila", "abile", "abili", "abilă",
        "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă",
        "oase", "os", "osi", "oși", "ant", "anta", "ante", "anti",
        "antă", "ator", "atori", "itate", "itati", "ităi", "ități",
        "iv", "iva", "ive", "ivi", "ivă",
    ]
)
_RO_STEP2_IST = frozenset(
    ["ism", "isme", "ist", "ista", "iste", "isti", "istă", "iști"]
)
_RO_STEP2 = sorted(
    ["iune", "iuni", *_RO_STEP2_DELETE, *_RO_STEP2_IST],
    key=len,
    reverse=True,
)
# step 3 (verb suffixes, RV-limited): group A needs a consonant or u
# immediately before (in RV); group B deletes unconditionally
_RO_VERB_A = frozenset(
    [
        "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându",
        "înd", "îndu",
        "eze", "ează", "ez", "ezi", "ească", "esc", "ești", "ește",
        "ăsc", "ăști", "ăște", "am", "ai", "au", "eam", "eai", "eau",
        "iam", "iai", "iau", "ui", "ași", "arăm", "arăți", "ară",
        "uși", "urăm", "urăți", "ură", "iși", "irăm", "irăți", "iră",
        "âi", "âși", "ârăm", "ârăți", "âră", "asem", "aseși", "ase",
        "aserăm", "aserăți", "aseră", "isem", "iseși", "ise",
        "iserăm", "iserăți", "iseră", "âsem", "âseși", "âse",
        "âserăm", "âserăți", "âseră", "usem", "useși", "use",
        "userăm", "userăți", "useră",
    ]
)
_RO_VERB_B = frozenset(
    [
        "ăm", "ați", "em", "eți", "im", "iți", "âm", "âți", "seși",
        "serăm", "serăți", "seră", "sei", "se", "sesem", "seseși",
        "sese", "seserăm", "seserăți", "seseră",
    ]
)
_RO_STEP3 = sorted(_RO_VERB_A | _RO_VERB_B, key=len, reverse=True)
_RO_STEP4 = ("ie", "a", "e", "i", "ă")


def stem_ro(word: str) -> str:
    """Snowball Romanian stemmer
    (snowballstem.org/algorithms/romanian/). Cedilla forms ş/ţ are
    normalized to the correct comma-below ș/ț first (the current
    algorithm revision treats them as equivalent); i/u between vowels
    are marked as consonants (uppercase) for region computation, as
    the spec's preliminary step prescribes. The gerund/verb rows carry
    both the modern word-internal â spellings (-ând/-ându) and the
    pre-1993 î forms (-înd/-îndu) so either orthography stems."""
    word = word.replace("ş", "ș").replace("ţ", "ț")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "iu"
            and chars[i - 1] in _RO_VOWELS
            and chars[i + 1] in _RO_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1, r2 = _r1_r2(word, _RO_VOWELS)
    rv = _rv_romance(word, _RO_VOWELS)

    # Step 0: removal of plurals (and other simplifications), in R1
    hit = _longest_in(word, [s for s, _ in _RO_STEP0], r1)
    if hit is not None:
        rep = dict(_RO_STEP0)[hit]
        if hit != "ile" or not word.endswith("abile"):
            # 'ile' deletes only when not preceded by 'ab'
            word = word[: -len(hit)] + (rep or "")

    # Step 1: reduction of combining suffixes, in R1, repeated
    standard_removed = False
    while True:
        hit = _longest_in(word, [s for s, _ in _RO_STEP1], r1)
        if hit is None:
            break
        word = word[: -len(hit)] + dict(_RO_STEP1)[hit]
        standard_removed = True

    # Step 2: removal of standard suffixes, in R2
    hit = _longest_in(word, _RO_STEP2, r2)
    if hit is not None:
        k = len(word) - len(hit)
        if hit in ("iune", "iuni"):
            if k - 1 >= r2 and word[k - 1] == "ț":
                word = word[: k - 1] + "t"
                standard_removed = True
        elif hit in _RO_STEP2_IST:
            word = word[:k] + "ist"
            standard_removed = True
        else:
            word = word[:k]
            standard_removed = True

    # Step 3: verb suffixes (only when steps 1-2 removed nothing), RV
    if not standard_removed:
        hit = _longest_in(word, _RO_STEP3, rv)
        if hit is not None:
            k = len(word) - len(hit)
            if hit in _RO_VERB_B:
                word = word[:k]
            elif k - 1 >= rv and (
                word[k - 1] not in _RO_VOWELS or word[k - 1] == "u"
            ):
                # group A: preceded in RV by a consonant or u
                word = word[:k]

    # Step 4: final vowel (a e i ă / ie), in RV
    hit = _longest_in(word, _RO_STEP4, rv)
    if hit is not None:
        word = word[: -len(hit)]

    return word.replace("I", "i").replace("U", "u")


# =============================================================== Hungarian

_HU_VOWELS = frozenset("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)
_HU_STEP2 = sorted(
    [
        "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val",
        "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz",
        "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt",
        "ért", "képp", "képpen", "kor", "ul", "ül", "vá", "vé",
        "onként", "enként", "anként", "ként", "en", "on", "an",
        "ön", "n", "t",
    ],
    key=len,
    reverse=True,
)
_HU_STEP6 = sorted(
    [
        ("oké", None), ("öké", None), ("aké", None), ("eké", None),
        ("áké", "a"), ("éké", "e"), ("ké", None),
        ("áéi", "a"), ("ééi", "e"), ("éi", None), ("é", None),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_HU_STEP7 = sorted(
    [
        ("ünk", None), ("unk", None), ("ánk", "a"), ("énk", "e"),
        ("nk", None),
        ("ájuk", "a"), ("éjük", "e"), ("juk", None), ("jük", None),
        ("uk", None), ("ük", None),
        ("em", None), ("om", None), ("am", None), ("ám", "a"),
        ("ém", "e"), ("m", None),
        ("od", None), ("ed", None), ("ad", None), ("öd", None),
        ("ád", "a"), ("éd", "e"), ("d", None),
        ("ja", None), ("je", None),
        ("a", None), ("e", None), ("o", None), ("á", "a"), ("é", "e"),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_HU_STEP8 = sorted(
    [
        ("jaim", None), ("jeim", None), ("áim", "a"), ("éim", "e"),
        ("aim", None), ("eim", None), ("im", None),
        ("jaid", None), ("jeid", None), ("áid", "a"), ("éid", "e"),
        ("aid", None), ("eid", None), ("id", None),
        ("jai", None), ("jei", None), ("ái", "a"), ("éi", "e"),
        ("ai", None), ("ei", None), ("i", None),
        ("jaink", None), ("jeink", None), ("áink", "a"),
        ("éink", "e"), ("aink", None), ("eink", None), ("ink", None),
        ("jaitok", None), ("jeitek", None), ("áitok", "a"),
        ("éitek", "e"), ("aitok", None), ("eitek", None),
        ("itok", None), ("itek", None),
        ("jaik", None), ("jeik", None), ("áik", "a"), ("éik", "e"),
        ("aik", None), ("eik", None), ("ik", None),
    ],
    key=lambda p: len(p[0]),
    reverse=True,
)
_HU_STEP9 = sorted(
    [("ák", "a"), ("ék", "e"), ("ök", None), ("ok", None),
     ("ek", None), ("ak", None), ("k", None)],
    key=lambda p: len(p[0]),
    reverse=True,
)


def _hu_r1(word: str) -> int:
    """Hungarian R1: after the first consonant-or-digraph when the word
    begins with a vowel (the digraph counts as one unit); after the
    first vowel when it begins with a consonant."""
    n = len(word)
    if not n:
        return n
    if word[0] in _HU_VOWELS:
        for i in range(1, n):
            if word[i] not in _HU_VOWELS:
                for dg in _HU_DIGRAPHS:
                    if word.startswith(dg, i):
                        return i + len(dg)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_undouble(word: str) -> str:
    """Remove one letter of a final double consonant (doubled digraphs
    are written tripled — ssz, ggy, ... — so dropping the first letter
    leaves the digraph)."""
    for d in _HU_DOUBLES:
        if word.endswith(d):
            return word[: -len(d)] + d[1:]
    return word


def _hu_ends_double(word: str, lim: int) -> bool:
    for d in _HU_DOUBLES:
        if word.endswith(d) and len(word) - len(d) >= lim:
            return True
    return False


def _hu_apply(word: str, table, r1: int) -> str:
    """Longest in-R1 suffix of a (suffix, replacement|None) table —
    delete or replace; no backtracking on longer matches."""
    suf = _longest_in(word, [s for s, _ in table], r1)
    if suf is not None:
        word = word[: -len(suf)] + (dict(table)[suf] or "")
    return word


def stem_hu(word: str) -> str:
    """Snowball Hungarian stemmer
    (snowballstem.org/algorithms/hungarian/)."""
    r1 = _hu_r1(word)

    # Step 1: instrumental case — al/el after a double consonant,
    # delete and undouble
    for suf in ("al", "el"):
        if (
            word.endswith(suf)
            and len(word) - 2 >= r1
            and _hu_ends_double(word[:-2], r1)
        ):
            word = _hu_undouble(word[:-2])
            break

    # Step 2: frequent cases; then a final á -> a, é -> e
    suf = _longest_in(word, _HU_STEP2, r1)
    if suf is not None:
        word = word[: -len(suf)]
        if word.endswith("á"):
            word = word[:-1] + "a"
        elif word.endswith("é"):
            word = word[:-1] + "e"

    # Step 3: special cases: ánként -> a, án -> a, én -> e
    for suf, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + rep
            break

    # Step 4: other cases: astul/estül/stul/stül delete,
    # ástul -> a, éstül -> e
    for suf, rep in (
        ("ástul", "a"), ("éstül", "e"), ("astul", ""), ("estül", ""),
        ("stul", ""), ("stül", ""),
    ):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + rep
            break

    # Step 5: factive case — á/é after a double consonant, delete and
    # undouble
    for suf in ("á", "é"):
        if (
            word.endswith(suf)
            and len(word) - 1 >= r1
            and _hu_ends_double(word[:-1], r1)
        ):
            word = _hu_undouble(word[:-1])
            break

    # Steps 6-9: owned, singular owner, plural owner, plural
    word = _hu_apply(word, _HU_STEP6, r1)
    word = _hu_apply(word, _HU_STEP7, r1)
    word = _hu_apply(word, _HU_STEP8, r1)
    word = _hu_apply(word, _HU_STEP9, r1)
    return word


# =============================================================== Turkish
#
# From the published Snowball Turkish algorithm (Evren (Kapusuz)
# Çilden, "Stemming Turkish Words Using Snowball",
# snowballstem.org/algorithms/turkish/) — suffix-stripping over two
# suffix families (nominal-verb, then noun) with per-suffix vowel
# harmony checks, optional buffer consonants (y/n/s) and the optional
# U vowel of possessives, the recursive "-ki" suffix chain, and the
# post-pass that restores devoiced final consonants (b→p, c→ç, d→t,
# ğ→k) and appends the harmonizing U vowel to stems left ending in
# d/g. Words with fewer than two vowels are never stemmed. The
# Snowball 2.x revision the reference bundles (external/snowball,
# v2.2.0) dropped the old ad/soyad reserved-word hack, so it is not
# reproduced here. One ordering the published description leaves
# ambiguous (consonant restoration vs. the d/g vowel append — they
# overlap only on stems ending in 'd') is resolved here as
# restoration first; both post-rules are single-character touches on
# rare stems.

_TR_VOWELS = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
# suffix vowel -> allowed preceding (stem-side) vowels
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
    "o": "ou", "ö": "öü", "u": "ou", "ü": "öü",
}


def _tr_harmony(w: str, c: int) -> bool:
    """check_vowel_harmony at cursor c (backwards): the last vowel of
    w[:c] (the suffix's own vowel) must harmonize with the vowel before
    it."""
    i = c - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    v = w[i]
    i -= 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    return w[i] in _TR_HARMONY[v]


def _tr_opt_cons(w: str, c: int, ch: str) -> int | None:
    """mark_suffix_with_optional_{y,n,s}_consonant: either the buffer
    consonant precedes (and a vowel precedes it — consume it), or it
    does not (and the character two back must be a vowel)."""
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and w[c - 2] in _TR_VOWELS:
        return c
    return None


def _tr_opt_U(w: str, c: int) -> int | None:
    """mark_suffix_with_optional_U_vowel: either a U vowel precedes
    (followed leftwards by a non-vowel — consume it), or the character
    two back must be a non-vowel."""
    if c >= 1 and w[c - 1] in _TR_U:
        if c >= 2 and w[c - 2] not in _TR_VOWELS:
            return c - 1
        return None
    if c >= 2 and w[c - 2] not in _TR_VOWELS:
        return c
    return None


def _tr_mark(w, c, sufs, harmony=True, opt=None):
    """Generic suffix marker: optional harmony check at c, longest
    suffix of w[:c] from `sufs` (pre-sorted longest-first), then the
    optional buffer rule. Returns the new cursor or None."""
    if c <= 0:
        return None
    if harmony and not _tr_harmony(w, c):
        return None
    head = w[:c]
    for s in sufs:
        if head.endswith(s):
            c2 = c - len(s)
            if opt is None:
                return c2
            return opt(w, c2)
    return None


# noun-family markers
def _tr_possessives(w, c):
    return _tr_mark(
        w, c,
        ("mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz", "m", "n"),
        opt=_tr_opt_U,
    )


def _tr_sU(w, c):
    return _tr_mark(w, c, ("ı", "i", "u", "ü"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "s"))


def _tr_lArI(w, c):
    return _tr_mark(w, c, ("ları", "leri"), harmony=False)


def _tr_yU(w, c):
    return _tr_mark(w, c, ("ı", "i", "u", "ü"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_nU(w, c):
    return _tr_mark(w, c, ("nı", "ni", "nu", "nü"))


def _tr_nUn(w, c):
    return _tr_mark(w, c, ("ın", "in", "un", "ün"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "n"))


def _tr_yA(w, c):
    return _tr_mark(w, c, ("a", "e"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_nA(w, c):
    return _tr_mark(w, c, ("na", "ne"))


def _tr_DA(w, c):
    return _tr_mark(w, c, ("da", "de", "ta", "te"))


def _tr_nDA(w, c):
    return _tr_mark(w, c, ("nda", "nde"))


def _tr_DAn(w, c):
    return _tr_mark(w, c, ("dan", "den", "tan", "ten"))


def _tr_nDAn(w, c):
    return _tr_mark(w, c, ("ndan", "nden"))


def _tr_ylA(w, c):
    return _tr_mark(w, c, ("la", "le"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_ki(w, c):
    return _tr_mark(w, c, ("ki",), harmony=False)


def _tr_ncA(w, c):
    return _tr_mark(w, c, ("ca", "ce"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "n"))


# nominal-verb markers
def _tr_yUm(w, c):
    return _tr_mark(w, c, ("ım", "im", "um", "üm"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_sUn(w, c):
    return _tr_mark(w, c, ("sın", "sin", "sun", "sün"))


def _tr_yUz(w, c):
    return _tr_mark(w, c, ("ız", "iz", "uz", "üz"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_sUnUz(w, c):
    return _tr_mark(w, c, ("sınız", "siniz", "sunuz", "sünüz"))


def _tr_lAr(w, c):
    return _tr_mark(w, c, ("lar", "ler"))


def _tr_nUz(w, c):
    return _tr_mark(w, c, ("nız", "niz", "nuz", "nüz"))


def _tr_DUr(w, c):
    return _tr_mark(
        w, c, ("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"))


def _tr_cAsInA(w, c):
    return _tr_mark(w, c, ("casına", "cesine"), harmony=False)


def _tr_yDU(w, c):
    return _tr_mark(w, c, ("dı", "di", "du", "dü", "tı", "ti", "tu", "tü"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_ysA(w, c):
    return _tr_mark(w, c, ("sa", "se"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_ymUs(w, c):
    return _tr_mark(w, c, ("mış", "miş", "muş", "müş"),
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_yken(w, c):
    return _tr_mark(w, c, ("ken",), harmony=False,
                    opt=lambda w_, c_: _tr_opt_cons(w_, c_, "y"))


def _tr_first(w, c, *marks):
    for m in marks:
        r = m(w, c)
        if r is not None:
            return r
    return None


def _tr_nominal_verb(w: str) -> tuple[str, bool]:
    """stem_nominal_verb_suffixes: strips one nominal-verb suffix group
    from the end of `w`; returns (word, continue_with_noun_suffixes)."""
    n = len(w)
    # 1. -(y)mUş / -(y)DU / -(y)sA / -(y)ken
    c = _tr_first(w, n, _tr_ymUs, _tr_yDU, _tr_ysA, _tr_yken)
    if c is not None:
        return w[:c], True
    # 2. -cAsInA, optionally preceded by a person marker, then
    #    a REQUIRED -(y)mUş
    c = _tr_cAsInA(w, n)
    if c is not None:
        c2 = _tr_first(w, c, _tr_sUnUz, _tr_lAr, _tr_yUm, _tr_sUn, _tr_yUz)
        c3 = _tr_ymUs(w, c2 if c2 is not None else c)
        if c3 is not None:
            return w[:c3], True
    # 3. -lAr (delete), then optionally -DUr/-(y)DU/-(y)sA/-(y)mUş;
    #    noun stemming does NOT continue after this branch
    c = _tr_lAr(w, n)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_first(w2, len(w2), _tr_DUr, _tr_yDU, _tr_ysA, _tr_ymUs)
        if c2 is not None:
            w2 = w2[:c2]
        return w2, False
    # 4. -nUz followed by a REQUIRED -(y)DU / -(y)sA
    c = _tr_nUz(w, n)
    if c is not None:
        c2 = _tr_first(w, c, _tr_yDU, _tr_ysA)
        if c2 is not None:
            return w[:c2], True
    # 5. person markers (delete), then optionally -(y)mUş
    c = _tr_first(w, n, _tr_sUnUz, _tr_yUz, _tr_sUn, _tr_yUm)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_ymUs(w2, len(w2))
        if c2 is not None:
            w2 = w2[:c2]
        return w2, True
    # 6. -DUr (delete), then optionally (person marker or nothing)
    #    followed by a REQUIRED -(y)mUş
    c = _tr_DUr(w, n)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_first(w2, len(w2), _tr_sUnUz, _tr_lAr, _tr_yUm, _tr_sUn,
                       _tr_yUz)
        c3 = _tr_ymUs(w2, c2 if c2 is not None else len(w2))
        if c3 is not None:
            w2 = w2[:c3]
        return w2, True
    return w, True


def _tr_chain_ki(w: str) -> str | None:
    """stem_suffix_chain_before_ki: strips '-ki' plus the case suffix
    in front of it (and any stack continuing leftwards). Returns the
    stripped word or None when no '-ki' chain matches."""
    n = len(w)
    c = _tr_ki(w, n)
    if c is None:
        return None
    # ... -DA ki
    c2 = _tr_DA(w, c)
    if c2 is not None:
        w2 = w[:c2]
        c3 = _tr_lAr(w2, len(w2))
        if c3 is not None:
            w3 = w2[:c3]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        c3 = _tr_possessives(w2, len(w2))
        if c3 is not None:
            w3 = w2[:c3]
            c4 = _tr_lAr(w3, len(w3))
            if c4 is not None:
                w4 = w3[:c4]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        return w2
    # ... -nUn ki
    c2 = _tr_nUn(w, c)
    if c2 is not None:
        w2 = w[:c2]
        c3 = _tr_lArI(w2, len(w2))
        if c3 is not None:
            return w2[:c3]
        c3 = _tr_first(w2, len(w2), _tr_possessives, _tr_sU)
        if c3 is not None:
            w3 = w2[:c3]
            c4 = _tr_lAr(w3, len(w3))
            if c4 is not None:
                w4 = w3[:c4]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # ... -nDA ki
    c2 = _tr_nDA(w, c)
    if c2 is not None:
        c3 = _tr_lArI(w, c2)
        if c3 is not None:
            return w[:c3]
        c3 = _tr_sU(w, c2)
        if c3 is not None:
            w2 = w[:c3]
            c4 = _tr_lAr(w2, len(w2))
            if c4 is not None:
                w3 = w2[:c4]
                r = _tr_chain_ki(w3)
                return r if r is not None else w3
            return w2
        w2 = w[:c2]
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    return None


def _tr_noun(w: str) -> str:
    """stem_noun_suffixes: strips one noun suffix group (case /
    possessive / plural stacks, with the '-ki' chain where the
    published algorithm recurses into it)."""
    n = len(w)
    # -lAr [ki-chain]
    c = _tr_lAr(w, n)
    if c is not None:
        w2 = w[:c]
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # -(n)cA [lArI | possessive/sU [lAr [ki]] | lAr [ki]]
    c = _tr_ncA(w, n)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_lArI(w2, len(w2))
        if c2 is not None:
            return w2[:c2]
        c2 = _tr_first(w2, len(w2), _tr_possessives, _tr_sU)
        if c2 is not None:
            w3 = w2[:c2]
            c3 = _tr_lAr(w3, len(w3))
            if c3 is not None:
                w4 = w3[:c3]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        c2 = _tr_lAr(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        return w2
    # -nDA / -nA with what precedes them
    c = _tr_first(w, n, _tr_nDA, _tr_nA)
    if c is not None:
        c2 = _tr_lArI(w, c)
        if c2 is not None:
            return w[:c2]
        c2 = _tr_sU(w, c)
        if c2 is not None:
            w2 = w[:c2]
            c3 = _tr_lAr(w2, len(w2))
            if c3 is not None:
                w3 = w2[:c3]
                r = _tr_chain_ki(w3)
                return r if r is not None else w3
            return w2
        w2 = w[:c]
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # -nDAn / -nU with a possessive or -lArI in front
    c = _tr_first(w, n, _tr_nDAn, _tr_nU)
    if c is not None:
        c2 = _tr_sU(w, c)
        if c2 is not None:
            w2 = w[:c2]
            c3 = _tr_lAr(w2, len(w2))
            if c3 is not None:
                w3 = w2[:c3]
                r = _tr_chain_ki(w3)
                return r if r is not None else w3
            return w2
        c2 = _tr_lArI(w, c)
        if c2 is not None:
            return w[:c2]
    # -DAn [possessive [lAr [ki]] | lAr [ki] | ki]
    c = _tr_DAn(w, n)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_possessives(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            c3 = _tr_lAr(w3, len(w3))
            if c3 is not None:
                w4 = w3[:c3]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        c2 = _tr_lAr(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # -(n)Un / -(y)lA
    c = _tr_first(w, n, _tr_nUn, _tr_ylA)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_lAr(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        c2 = _tr_first(w2, len(w2), _tr_possessives, _tr_sU)
        if c2 is not None:
            w3 = w2[:c2]
            c3 = _tr_lAr(w3, len(w3))
            if c3 is not None:
                w4 = w3[:c3]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # -lArI
    c = _tr_lArI(w, n)
    if c is not None:
        return w[:c]
    # bare '-ki' chain
    r = _tr_chain_ki(w)
    if r is not None:
        return r
    # -DA / -(y)U / -(y)A [possessive/sU [lAr [ki]] | lAr [ki] | ki]
    c = _tr_first(w, n, _tr_DA, _tr_yU, _tr_yA)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_lAr(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        c2 = _tr_first(w2, len(w2), _tr_possessives, _tr_sU)
        if c2 is not None:
            w3 = w2[:c2]
            c3 = _tr_lAr(w3, len(w3))
            if c3 is not None:
                w4 = w3[:c3]
                r = _tr_chain_ki(w4)
                return r if r is not None else w4
            return w3
        r = _tr_chain_ki(w2)
        return r if r is not None else w2
    # bare possessive [lAr [ki]]
    c = _tr_possessives(w, n)
    if c is not None:
        w2 = w[:c]
        c2 = _tr_lAr(w2, len(w2))
        if c2 is not None:
            w3 = w2[:c2]
            r = _tr_chain_ki(w3)
            return r if r is not None else w3
        return w2
    return w


def stem_tr(word: str) -> str:
    """Snowball Turkish stemmer
    (snowballstem.org/algorithms/turkish/)."""
    if sum(1 for ch in word if ch in _TR_VOWELS) < 2:
        return word  # more_than_one_syllable_word
    word, continue_noun = _tr_nominal_verb(word)
    if continue_noun:
        word = _tr_noun(word)
    # post_process_last_consonants: restore the devoiced final
    if word:
        last = word[-1]
        if last == "b":
            word = word[:-1] + "p"
        elif last == "c":
            word = word[:-1] + "ç"
        elif last == "d":
            word = word[:-1] + "t"
        elif last == "ğ":
            word = word[:-1] + "k"
    # append_U_to_stems_ending_with_d_or_g, harmonizing with the last
    # vowel (after restoration this fires for 'g'-final stems)
    if word and word[-1] in ("d", "g"):
        i = len(word) - 1
        while i >= 0 and word[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            v = word[i]
            if v in "aı":
                word += "ı"
            elif v in "ei":
                word += "i"
            elif v in "ou":
                word += "u"
            else:
                word += "ü"
    return word


# ============================================================ Indonesian
#
# Confix-stripping stemmer per the published algorithm Snowball adopted
# (Asian, Williams & Tahaghoghi 2005, "Stemming Indonesian";
# snowballstem.org/algorithms/indonesian/): particles (-kah/-lah/-pun)
# and possessive pronouns (-ku/-mu/-nya), then first-order derivational
# prefixes (meng-/meny-/men-/mem-/me-, peng-/peny-/pen-/pem-, di-,
# ter-, ke-) with the paper's nasal-assimilation recodings (meny+V ->
# s+V, men+V -> t+V, mem+V -> p+V, and the pen-/pem-/peny- parallels),
# derivational suffixes (-kan/-an/-i) under the prefix-compatibility
# table (no -kan after ke-/peng-, no -an after di-/me-/ter-, no -i
# after ber-/ke-/peng- or a preceding 's'), and second-order prefixes
# (ber-, bel- of belajar, be- before consonant+'er', per-, pel- of
# pelajar, pe-). Every removal step requires the word to retain more
# than two syllables (= vowels). Suffix matching is longest-first with
# NO fallback to a shorter suffix when the constraint blocks (among
# semantics).

_ID_VOWELS = frozenset("aeiou")


def _id_first_prefix(w: str) -> tuple[str, str | None]:
    """Remove one first-order prefix; returns (word, prefix_class) with
    class in {'me','peng','di','ter','ke'} or None."""
    if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], "me"
    if w.startswith("meng"):
        return w[4:], "me"
    if w.startswith("mem"):
        if len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], "me"
        return w[3:], "me"
    if w.startswith("men"):
        if len(w) > 3 and w[3] in _ID_VOWELS:
            return "t" + w[3:], "me"
        return w[3:], "me"
    if w.startswith("me"):
        return w[2:], "me"
    if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], "peng"
    if w.startswith("peng"):
        return w[4:], "peng"
    if w.startswith("pem"):
        if len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], "peng"
        return w[3:], "peng"
    if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
        # pen+V: elided 't' restored; pen+consonant is second-order
        # pe- + n-initial root territory, leave it
        return "t" + w[3:], "peng"
    if w.startswith("di"):
        return w[2:], "di"
    if w.startswith("ter"):
        return w[3:], "ter"
    if w.startswith("ke"):
        return w[2:], "ke"
    return w, None


def _id_second_prefix(w: str) -> tuple[str, str | None]:
    """Remove one second-order prefix; class in {'ber','pe'} or None."""
    if w.startswith("belajar"):
        return w[3:], "ber"
    if w.startswith("ber"):
        return w[3:], "ber"
    if (
        w.startswith("be") and len(w) > 4
        and w[2] not in _ID_VOWELS and w[3:5] == "er"
    ):
        return w[2:], "ber"
    if w.startswith("pelajar"):
        return w[3:], "pe"
    if w.startswith("per"):
        return w[3:], "pe"
    if w.startswith("pe"):
        return w[2:], "pe"
    return w, None


def _id_suffix(w: str, cls: str | None) -> tuple[str, bool]:
    """Remove one derivational suffix under the prefix-compatibility
    table; longest match decides, a blocked match does NOT fall back."""
    if w.endswith("kan"):
        if cls not in ("ke", "peng"):
            return w[:-3], True
        return w, False
    if w.endswith("an"):
        if cls not in ("di", "me", "ter"):
            return w[:-2], True
        return w, False
    if w.endswith("i"):
        if cls not in ("ber", "ke", "peng") and len(w) >= 2 and w[-2] != "s":
            return w[:-1], True
        return w, False
    return w, False


def stem_id(word: str) -> str:
    """Snowball Indonesian stemmer
    (snowballstem.org/algorithms/indonesian/)."""
    measure = sum(1 for ch in word if ch in _ID_VOWELS)
    if measure <= 2:
        return word
    for s in ("kah", "lah", "pun"):
        if word.endswith(s):
            word = word[: -len(s)]
            measure -= 1
            break
    if measure <= 2:
        return word
    for s in ("nya", "ku", "mu"):
        if word.endswith(s):
            word = word[: -len(s)]
            measure -= 1
            break
    if measure <= 2:
        return word
    w2, cls = _id_first_prefix(word)
    if cls is not None:
        word = w2
        measure -= 1
        if measure > 2:
            w3, removed = _id_suffix(word, cls)
            if removed:
                word = w3
                measure -= 1
                if measure > 2:
                    word, _ = _id_second_prefix(word)
        return word
    # no first-order prefix: second-order prefix first, then suffix
    w2, cls2 = _id_second_prefix(word)
    if cls2 is not None:
        word = w2
        measure -= 1
    if measure > 2:
        word, removed = _id_suffix(word, cls2)
        if removed:
            measure -= 1
    return word


# ================================================================= Hindi
#
# "A Lightweight Stemmer for Hindi" (Ramanathan & Rao 2003) — the
# algorithm Snowball adopted (snowballstem.org/algorithms/hindi/):
# delete the LONGEST suffix from the published list (number / gender /
# case matra endings plus verbal tense-aspect paradigms), requiring at
# least one character to precede it; applied once, no recoding. The
# suffixes are Devanagari codepoint sequences (matras are combining
# characters — length is counted in codepoints, as the reference
# implementation does).

_HI_SUFFIXES = (
    # length 5 (codepoints)
    "ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां",
    # length 4
    "ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
    "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
    "ियों", "ियां",
    # length 3
    "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
    "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
    "ुआं",
    # length 2
    "कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
    "ता", "ाँ", "ां", "ों", "ें",
    # length 1
    "ो", "े", "ू", "ु", "ी", "ि", "ा",
)
# longest-match semantics: ensure descending codepoint length
_HI_SUFFIXES = tuple(sorted(_HI_SUFFIXES, key=len, reverse=True))


def stem_hi(word: str) -> str:
    """Snowball Hindi stemmer (snowballstem.org/algorithms/hindi/)."""
    for s in _HI_SUFFIXES:
        if word.endswith(s) and len(word) > len(s):
            return word[: -len(s)]
    return word


# ================================================================ Arabic
#
# Light10 light stemmer (Larkey, Ballesteros & Connell, "Light
# Stemming for Arabic Information Retrieval", 2007) — the most widely
# deployed public Arabic stemmer (it is what Lucene's
# ArabicNormalizer + ArabicStemmer implement). Chosen deliberately:
# Light10's full rule set (normalization + one prefix removal + an
# ordered suffix sweep) is published precisely and hand-checkable,
# and the reference's requirement is a locale-driven stemmer behind
# the text analyzer (text_token_stream.cpp:509) — light stemming is
# the standard IR treatment for Arabic (it outperformed root
# stemming in the paper's retrieval evaluation).
#
# Steps (prefix/suffix conditions count NORMALIZED letters):
#   normalize  drop tatweel + harakat (fathatan..sukun) + superscript
#              alef; hamza-carrying alef forms -> bare alef; alef
#              maksura -> yeh; teh marbuta -> heh
#   prefix     first matching prefix of {ال وال بال كال فال لل و} is
#              removed — ONE removal; the 1-letter waw needs >= 3
#              letters left, the articles >= 2 (a match whose length
#              condition fails does not stop the scan)
#   suffixes   sweep {ها ان ات ون ين يه ية ه ة ي} IN ORDER, removing
#              each match that leaves >= 2 letters — several can come
#              off one word (e.g. …اتها loses ها then ات)

_AR_DIAC = frozenset(
    "ـ"                    # tatweel
    "ًٌٍ"        # fathatan dammatan kasratan
    "َُِ"        # fatha damma kasra
    "ّْٰ"        # shadda sukun superscript-alef
)
_AR_CHAR_MAP = {
    "آ": "ا",  # alef madda -> alef
    "أ": "ا",  # alef hamza above -> alef
    "إ": "ا",  # alef hamza below -> alef
    "ى": "ي",  # alef maksura -> yeh
    "ة": "ه",  # teh marbuta -> heh
}

_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
# the ية/ة entries are the pre-normalization spellings (kept so the
# stemmer is also correct on un-normalized input); after _ar_normalize
# they surface as يه/ه
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def _ar_normalize(word: str) -> str:
    out = []
    for ch in word:
        if ch in _AR_DIAC:
            continue
        out.append(_AR_CHAR_MAP.get(ch, ch))
    return "".join(out)


def stem_ar(word: str) -> str:
    """Light10 Arabic light stemmer (Larkey et al. 2007)."""
    w = _ar_normalize(word)
    for p in _AR_PREFIXES:
        if w.startswith(p):
            keep = len(w) - len(p)
            if keep >= 3 if len(p) == 1 else keep >= 2:
                w = w[len(p):]
                break
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) - len(s) >= 2:
            w = w[: -len(s)]
    return w


# ================================================================ Czech
#
# Dolamic & Savoy light stemmer ("Indexing and stemming approaches
# for the Czech language", IP&M 45(6), 2009) — the standard published
# Czech IR stemmer (also the one Lucene ships as CzechStemmer).
# Czech has no official Snowball algorithm; the reference's
# locale-driven requirement (text_token_stream.cpp:509) is met the
# same way Arabic/Hindi were: with the published light stemmer for
# the language. Two passes over a lowercased word:
#
#   remove_case   longest-first noun/adjective case endings, with a
#                 minimum remaining-length guard per tier; endings
#                 whose removal exposes a palatalized stem consonant
#                 go through `_cs_palatalize`, which KEEPS one letter
#                 of the ending as context, rewrites the consonant
#                 group (c/č+e/i -> k, z/ž+e/i -> h, čt+ě/i/í -> ck,
#                 št+ě/i/í -> sk) and then drops that context letter
#   remove_possessives   -ov/-ův dropped, -in palatalized, on words
#                        longer than 5 letters

_CS_PALATAL_2 = {"ci": "k", "ce": "k", "či": "k", "če": "k",
                 "zi": "h", "ze": "h", "ži": "h", "že": "h"}
_CS_PALATAL_3 = {"čtě": "ck", "čti": "ck", "čtí": "ck",
                 "ště": "sk", "šti": "sk", "ští": "sk"}


def _cs_palatalize(w: str) -> str:
    # w still carries one letter of the removed ending as context;
    # rewrite the exposed consonant group, then drop that letter.
    if w[-2:] in _CS_PALATAL_2:
        return w[:-2] + _CS_PALATAL_2[w[-2:]]
    if w[-3:] in _CS_PALATAL_3:
        return w[:-3] + _CS_PALATAL_3[w[-3:]]
    return w[:-1]


def _cs_remove_case(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith("atech"):
        return w[:-5]
    if n > 6:
        if w.endswith("ětem"):
            return _cs_palatalize(w[:-3])
        if w.endswith("atům"):
            return w[:-4]
    if n > 5:
        if w[-3:] in ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
                      "ete", "eti", "iho", "ího", "ími", "imu"):
            return _cs_palatalize(w[:-2])
        if w[-3:] in ("ách", "ata", "aty", "ých", "ama", "ami",
                      "ové", "ovi", "ými"):
            return w[:-3]
    if n > 4:
        if w.endswith("em"):
            return _cs_palatalize(w[:-1])
        if w[-2:] in ("es", "ém", "ím"):
            return _cs_palatalize(w[:-1])
        if w.endswith("ům"):
            return w[:-2]
        if w[-2:] in ("at", "ám", "os", "us", "ým", "mi", "ou"):
            return w[:-2]
    if n > 3:
        if w[-1] in "eiíě":
            return _cs_palatalize(w)
        if w[-1] in "uyůaoáéý":
            return w[:-1]
    return w


def stem_cs(word: str) -> str:
    """Dolamic-Savoy Czech light stemmer (IP&M 2009)."""
    w = _cs_remove_case(word)
    n = len(w)
    if n > 5:
        if w.endswith("ov") or w.endswith("ův"):
            return w[:-2]
        if w.endswith("in"):
            return _cs_palatalize(w[:-1])
    return w


# ================================================================ Greek
#
# Light inflectional stemmer for Modern Greek. DOCUMENTED
# SIMPLIFICATION: this is NOT the full Ntais (2006) / Snowball Greek
# algorithm — that rule set hangs on long word-exception lists that
# cannot be faithfully reproduced here. Instead, the same light
# treatment used for Arabic (Light10) and Hindi (suffix list) is
# applied: fold accents + final sigma the way every Greek IR chain
# does, then strip the single longest REGULAR inflectional ending
# (the standard noun/adjective/verb paradigms of reference grammars:
# masc -ος/-ης/-ας, fem -η/-α, -ση/-ξη plurals in -εις/-εων, neuter
# -ο/-ι/-μα, active ω/εις/ει/ουμε/ετε/ουν + past α/ες/ε/αμε/ατε/αν +
# -ησ- aorists, mediopassive ομαι/εσαι/εται/ομαστε/εστε/ονται and
# imperfect ομουν/οσουν/οταν/ονταν), then strip an exposed
# comparative/superlative marker (the οτερ/οτατ/υτερ/υτατ/ωτερ/ωτατ/
# εστερ/εστατ set). Guards: a strip must leave >= 3 letters.

_EL_ACCENT_MAP = {
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ",
    "ώ": "ω", "ϊ": "ι", "ΐ": "ι", "ϋ": "υ", "ΰ": "υ", "ς": "σ",
}

# normalized spellings (σ for final ς), longest-first
_EL_SUFFIXES = tuple(sorted((
    # neuter -μα paradigm
    "ματων", "ματοσ", "ματα", "μα",
    # nominal endings (masc/fem/neut, sg+pl)
    "ουσ", "ουν", "ουμε", "ετε", "εισ", "εων", "ιων", "ιουσ", "ιου",
    "ιοσ", "ιοι", "ιο", "ια",
    "ων", "οσ", "ου", "οι", "εσ", "ησ", "ασ", "αν", "αμε",
    "ατε", "ει", "ε", "α", "η", "ο", "ι", "ω",
    # -ησ- aorist forms
    "ησα", "ησεσ", "ησε", "ησαμε", "ησατε", "ησαν",
    # mediopassive
    "ομαι", "εσαι", "εται", "ομαστε", "εστε", "ονται",
    "ομουν", "οσουν", "οταν", "ονταν",
), key=lambda s: (-len(s), s)))

# comparative/superlative markers exposed after ending removal
# (Ntais's degree-suffix set)
_EL_DEGREE = ("εστερ", "εστατ", "οτερ", "οτατ",
              "υτερ", "υτατ", "ωτερ", "ωτατ")


def stem_el(word: str) -> str:
    """Greek light stemmer: accent/final-sigma fold + longest regular
    inflectional ending + exposed degree marker (>=3-letter stem)."""
    w = "".join(_EL_ACCENT_MAP.get(ch, ch) for ch in word)
    for s in _EL_SUFFIXES:
        if w.endswith(s) and len(w) - len(s) >= 3:
            w = w[: -len(s)]
            break
    for s in _EL_DEGREE:
        if w.endswith(s) and len(w) - len(s) >= 3:
            w = w[: -len(s)]
            break
    return w


# ================================================================ Polish
#
# Light inflectional stemmer. DOCUMENTED SIMPLIFICATION: Polish has
# no official Snowball algorithm (the standard tool, Stempel, is a
# trained statistical table that cannot be reproduced here), so the
# Arabic/Hindi/Greek light treatment applies: strip the single
# longest REGULAR inflectional ending from the standard declension/
# conjugation paradigms (noun cases incl. -ach/-ami/-om/-ów/-owi/
# -em, adjective -ego/-emu/-ych/-ymi/-ym/-ej, present-tense
# -esz/-emy/-ecie/-asz/-amy/-acie, past -ał/-ała/-ało/-ali/-ały and
# the -ić/-yć/-ać/-eć infinitives). Consonant mutations at the stem
# boundary (kobiecie vs kobieta) are NOT undone — the documented
# light-stemmer trade-off. Guard: >= 3 letters must remain.

_PL_SUFFIXES = tuple(sorted((
    # noun case endings
    "ach", "ami", "owie", "owi", "om", "ów", "em", "ie",
    "i", "y", "e", "a", "ę", "ą", "o", "u",
    # adjective endings
    "ego", "emu", "ych", "ymi", "ym", "ej",
    # verb endings: present, past, infinitive
    "esz", "emy", "ecie", "asz", "amy", "acie",
    "ał", "ała", "ało", "ali", "ały",
    "ił", "iła", "iło", "ili", "iły",
    "ać", "ić", "yć", "eć",
), key=lambda s: (-len(s), s)))


def stem_pl(word: str) -> str:
    """Polish light stemmer: longest regular inflectional ending,
    >= 3-letter stem guard."""
    for s in _PL_SUFFIXES:
        if word.endswith(s) and len(word) - len(s) >= 3:
            return word[: -len(s)]
    return word


# ================================================================ Ukrainian
#
# Light inflectional stemmer, same basis and caveats as Polish
# (no official Snowball algorithm; regular declension/conjugation
# endings only, boundary mutations like книзі not undone).

_UK_SUFFIXES = tuple(sorted((
    # noun case endings
    "ами", "ями", "ові", "еві", "ах", "ях", "ам", "ям",
    "ів", "їв", "ей", "ою", "ею", "єю", "ом", "ем",
    "і", "ї", "и", "у", "ю", "а", "я", "е", "о",
    # adjective endings
    "ого", "ому", "ими", "іми", "их", "їх", "ий", "ій", "им",
    # verb endings (present + infinitive + past)
    "ють", "ать", "ять", "уть", "ємо", "имо", "ете", "ите",
    "єш", "еш", "иш", "є", "ти", "ла", "ло", "ли",
), key=lambda s: (-len(s), s)))


def stem_uk(word: str) -> str:
    """Ukrainian light stemmer: longest regular inflectional ending,
    >= 3-letter stem guard."""
    for s in _UK_SUFFIXES:
        if word.endswith(s) and len(word) - len(s) >= 3:
            return word[: -len(s)]
    return word


# ================================================================ Hebrew
#
# Light stemmer — Hebrew, like Polish/Ukrainian/Greek, has no official
# Snowball algorithm, and the published dictionary-based analyzers
# (HebMorph / MILA) need a full morphological lexicon that cannot be
# reproduced in-sandbox. Same documented basis as the other light
# stemmers here, shaped like Arabic's Light10 (normalize + ONE prefix
# + ordered suffix sweep) adapted to Hebrew morphology:
#
#   normalize  drop Hebrew points + cantillation (niqqud/teamim; the
#              in-range punctuation maqaf/paseq/sof-pasuq/nun-hafukha
#              is NOT dropped — it never reaches the stemmer anyway,
#              the tokenizer splits on it); fold the five final-letter
#              forms to their regular forms (ך ם ן ף ץ -> כ מ נ פ צ)
#              so a stem exposed by suffix removal is byte-equal to
#              the free-standing surface form (שולחנות - ות == שולחן)
#   prefix     first matching prefixed particle is removed — ONE
#              removal; a 1-letter particle needs >= 3 letters left,
#              a stack >= 2 (a match whose failing length condition
#              does not stop the scan, as in Light10). The particle
#              set is deliberately the ARTICLE family only: bare ה
#              (the), bare ו (and), the ה-final stacks (וה שה מה כשה
#              ושה ומה וכשה) and כש/וכש. Bare prepositions ב כ ל מ ש
#              are NOT stripped — lexicon-free stripping of those is
#              wrong more often than right (שולחן would lose its ש,
#              מלכות its מ, splitting a word family apart) — the same
#              discipline as Light10, which strips only the ال family
#              and و, never bare ب ل ك. The cost (בבית does not
#              conflate with בית) is the documented light-stemming
#              trade-off; the benefit is that a family always gets
#              the same treatment whatever its number/possessor.
#   suffixes   ordered sweep over the regular pronominal-possessive,
#              plural/dual and feminine endings (normalized
#              spellings); several can come off one word
#              (מידותיו loses יו then ות); each multi-letter strip
#              keeps >= 2 letters, a single-letter strip >= 3
#
# Deliberately light: construct-state changes, irregular plurals and
# root-internal vowel changes are not undone (they need the lexicon),
# and even article stripping keeps a residue of ambiguity (a noun
# genuinely starting with ה loses it) — the standard, documented
# light-stemming trade-off (cf. Light10's identical ambiguity for و).

# points + cantillation only — U+05BE/U+05C0/U+05C3/U+05C6 are
# punctuation and excluded
_HE_MARKS = frozenset(
    chr(c) for c in range(0x0591, 0x05C8)
    if c not in (0x05BE, 0x05C0, 0x05C3, 0x05C6)
)
_HE_FINALS = {"ך": "כ", "ם": "מ", "ן": "נ", "ף": "פ", "ץ": "צ"}

_HE_PREFIXES = (
    "וכשה",
    "כשה", "ושה", "ומה", "וכש",
    "שה", "מה", "וה", "כש",
    "ו", "ה",
)
# normalized spellings (יך -> יכ, יהם -> יהמ, ...); order = pronominal
# plurals, his/her-over-plural, singular-stem pronominals, -iyot/dual,
# plain plurals, then the single letters
_HE_SUFFIXES = (
    "יהמ", "יהנ", "יכמ", "יכנ", "ינו", "יכ",
    "יו", "יה",
    "המ", "הנ", "כמ", "כנ", "נו",
    "יות", "יימ",
    "ות", "ימ",
    "ה", "י", "ו",
)


def _he_normalize(word: str) -> str:
    out = []
    for ch in word:
        if ch in _HE_MARKS:
            continue
        out.append(_HE_FINALS.get(ch, ch))
    return "".join(out)


def stem_he(word: str) -> str:
    """Hebrew light stemmer (documented light-stemming basis above)."""
    w = _he_normalize(word)
    for p in _HE_PREFIXES:
        if w.startswith(p):
            keep = len(w) - len(p)
            if keep >= 3 if len(p) == 1 else keep >= 2:
                w = w[len(p):]
                break
    for s in _HE_SUFFIXES:
        if w.endswith(s):
            keep = len(w) - len(s)
            if keep >= 3 if len(s) == 1 else keep >= 2:
                w = w[: -len(s)]
    return w


# ---------------------------------------------------------------- memo

class MemoTable:
    """Dict-memoized wrapper over a stem function (applied once per
    distinct token; vocabulary << token count)."""

    __slots__ = ("_fn", "_cache")

    def __init__(self, fn) -> None:
        self._fn = fn
        self._cache: dict[str, str] = {}

    def __call__(self, token: str) -> str:
        out = self._cache.get(token)
        if out is None:
            out = self._fn(token)
            self._cache[token] = out
        return out


def _porter2():
    from iresearch_spark.analysis.porter2 import stem

    return stem


STEMMERS: dict[str, object] = {
    "de": stem_de,
    "sv": stem_sv,
    "nl": stem_nl,
    "fr": stem_fr,
    "es": stem_es,
    "pt": stem_pt,
    "it": stem_it,
    "ru": stem_ru,
    "da": stem_da,
    "no": stem_no,
    "fi": stem_fi,
    "ro": stem_ro,
    "hu": stem_hu,
    "tr": stem_tr,
    "id": stem_id,
    "hi": stem_hi,
    "ar": stem_ar,
    "cs": stem_cs,
    "el": stem_el,
    "pl": stem_pl,
    "uk": stem_uk,
    "he": stem_he,
}


def get_stemmer(lang: str):
    """lang (ISO 639-1) -> stem function; raises on unknown."""
    if lang == "en":
        return _porter2()
    try:
        return STEMMERS[lang]
    except KeyError:
        raise ValueError(
            f"no stemmer for language {lang!r}; available: "
            f"{sorted(STEMMERS) + ['en']}"
        ) from None
