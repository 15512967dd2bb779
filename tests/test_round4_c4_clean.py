"""C4 cleaning rules (ops/textstats.c4_clean): terminal-punctuation +
min-words line filter, min-kept-lines + marker document filter."""

from iresearch_spark.ops.textstats import c4_clean

DOCS = [
    (0, "This is a good sentence.|Another proper long sentence here!|"
        "short one.|no punct at all here|Third fine sentence with words?"),
    (1, "Only one good sentence right here.|bad|bad2"),
    (2, "Has lorem ipsum placeholder text in it.|This would be fine one.|"
        "This would be fine sentence two.|This would be fine sentence three."),
    (3, 'Quoted sentence line number one."|Quoted sentence line number two."'
        '|Quoted sentence line number three."'),
    (4, "Contains a { curly brace code marker.|Fine sentence number two "
        "here.|Fine sentence number three here.|Fine sentence number four."),
]


def _run(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r["text"] for r in c4_clean(df, sep="|", **kw).collect()}


def test_c4_rules(spark):
    out = _run(spark)
    assert out == {
        0: "This is a good sentence.|Another proper long sentence here!"
           "|Third fine sentence with words?",
        3: 'Quoted sentence line number one."|Quoted sentence line number '
           'two."|Quoted sentence line number three."',
    }


def test_thresholds_configurable(spark):
    out = _run(spark, min_kept_lines=1, min_words_per_line=3)
    # doc 1 now passes with its single proper sentence; markers still drop
    assert 1 in out and out[1] == "Only one good sentence right here."
    assert 2 not in out and 4 not in out


def test_markers_configurable(spark):
    out = _run(spark, markers=("lorem ipsum",))
    # '{' no longer a marker: doc 4 keeps its 3 well-formed lines
    assert 4 in out and out[4].count("|") == 2
    assert 2 not in out
