"""Unicode text normalization + per-stratum corpus report."""

import unicodedata

from pyspark.sql import functions as F

from iresearch_spark.ops.textstats import corpus_report, normalize_text


def test_normalize_text(spark):
    rows = [
        (0, "Café …done"),                 # composed é, ellipsis
        (1, "Café “quoted” — yes"),  # decomposed é
        (2, "tabs\tand\x00ctrl\x1fchars"),
        (3, "  multi   space nbsp  "),
        (4, None),
    ]
    out = {
        r["id"]: r["text"]
        for r in normalize_text(
            spark.createDataFrame(rows, "id long, text string")
        ).collect()
    }
    assert out[0] == "Café ...done"
    assert out[1] == 'Café "quoted" - yes'
    assert unicodedata.is_normalized("NFC", out[1])
    assert out[2] == "tabs andctrlchars"
    assert out[3] == "multi space nbsp"
    assert out[4] is None


def test_corpus_report_closed_form(spark):
    rows = [
        (0, "a bb ccc", "en", "s1"),
        (1, "dd ee", "en", "s1"),
        (2, "x", "de", "s2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {
        (r["lang"], r["source"]): r for r in corpus_report(df).collect()
    }
    en = out[("en", "s1")]
    assert en["n_docs"] == 2
    assert en["total_tokens"] == 5
    assert en["mean_tokens"] == 2.5
    assert en["total_chars"] == len("a bb ccc") + len("dd ee")
    assert en["total_subwords_est"] == 2 + 2  # ceil(8/4) + ceil(5/4)
    de = out[("de", "s2")]
    assert (de["n_docs"], de["total_tokens"], de["total_chars"]) == (1, 1, 1)
