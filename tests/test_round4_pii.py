"""PII scrubbing (ops/textstats.scrub_pii): email / IPv4 / phone-shape
redaction with fixed placeholder tokens."""

from iresearch_spark.ops.textstats import scrub_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    return {r["id"]: r["text"] for r in scrub_pii(df).collect()}


def test_email_ip_phone_redacted(spark):
    out = _run(spark, [
        "contact john.doe+spam@example.co.uk for details",
        "server at 192.168.1.254 responded",
        "call 555 123-4567 or +1 (800) 555-0199 now",
        "clean text with numbers 42 and 7",
    ])
    assert out[0] == "contact <EMAIL> for details"
    assert out[1] == "server at <IP> responded"
    assert "<PHONE>" in out[2] and "555" not in out[2]
    assert out[3] == "clean text with numbers 42 and 7"


def test_email_wins_over_phone_shape(spark):
    # digits inside an email must not leave half-redacted phone bits
    out = _run(spark, ["mail 555-123-4567@digits.example please"])
    assert out[0] == "mail <EMAIL> please"


def test_dashed_dates_not_matched(spark):
    # the phone shape needs 3-then-3/4 digit groups, so ISO dates
    # (4-2-2) pass through — pinned so the precision bound is visible
    out = _run(spark, ["on 2024-01-02 it rained"])
    assert out[0] == "on 2024-01-02 it rained"
