"""Round-4 fixes: ngram_jaccard exact-by-default + skew-guard audit
surface (VERDICT r3 items 1 and 6)."""

import pytest
from pyspark.sql import SparkSession

from iresearch_spark.ops import dedup


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round4-fixes")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def boiler_df(spark):
    # docs 0,1 near-identical; everyone shares the c1..c3 boilerplate
    rows = [
        (i, "c1 c2 c3 " + ("x y z" if i < 2 else f"u{i} v{i} w{i}"))
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_default_is_exact(boiler_df):
    """The naive call computes true Jaccard — the skew guard is opt-in
    (round-3 VERDICT: a silent default accuracy cap for library
    callers). Docs 0,1 share ALL 4 shingles incl. the boilerplate one."""
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in dedup.ngram_jaccard_pairs(
            boiler_df, n=3, threshold=0.9
        ).collect()
    }
    assert got == {(0, 1): 1.0}


def _has_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_real_decoder_branch_with_pil(spark):
    """Exercises the production decode path when Pillow is present:
    a real PNG round-trips through feature_extract and resize_images."""
    import io

    from PIL import Image

    from iresearch_spark.ops import multimodal

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), (10, 200, 30)).save(buf, format="PNG")
    rows = [(1, "image", buf.getvalue(), "image/png", 4, 4, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.feature_extract(media, use_real_decoder=True).collect()
    assert feat[0]["ok"]
    assert [round(x) for x in feat[0]["feature"]] == [10, 200, 30]
    resized = multimodal.resize_images(
        media, 2, 2, use_real_decoder=True
    ).collect()
    assert resized[0]["ok"]
    with Image.open(io.BytesIO(resized[0]["payload"])) as im:
        assert im.size == (2, 2)


@pytest.mark.skipif(_has_pil(), reason="Pillow installed")
def test_real_decoder_raises_clearly_without_pil(spark):
    from iresearch_spark.ops import multimodal

    rows = [(1, "image", b"0123456789abcdef", "image/x-raw", 4, 4, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="Pillow"):
        multimodal.feature_extract(media, use_real_decoder=True).collect()
    with pytest.raises(Exception, match="Pillow"):
        multimodal.resize_images(media, 2, 2, use_real_decoder=True).collect()


def test_skew_guard_report(boiler_df):
    """The audit surface returns the dropped-shingle count as a metric:
    with max_shingle_df=5 exactly one shingle ('c1 c2 c3', df=30) is
    dropped, accounting for 30 (doc, shingle) rows."""
    rep = dedup.skew_guard_report(boiler_df, n=3, max_shingle_df=5)
    assert rep["n_dropped_shingles"] == 1
    assert rep["dropped_occurrences"] == 30
    assert rep["max_df"] == 30
    # distinct shingles: the shared boilerplate + 3 shared by docs 0,1
    # + 3 unique per doc 2..29
    assert rep["n_shingles"] == 1 + 3 + 28 * 3
    # guard wide enough -> nothing dropped
    rep2 = dedup.skew_guard_report(boiler_df, n=3, max_shingle_df=1000)
    assert rep2["n_dropped_shingles"] == 0
    assert rep2["dropped_occurrences"] == 0
