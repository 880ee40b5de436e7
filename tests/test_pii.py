"""PII scrub / URL extraction unit tests (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_orc_sink_spark.functions import pii


def test_scrub_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            ("mail me at bob.smith+x@sub.example.co.uk today",),
            ("call +1 555-000-1234 or +44 555-111-2222 now",),
            ("server 192.168.0.1 and 10.0.0.255 are up",),
            ("clean text with no pii at all",),
            ("a@b.io visits 1.2.3.4",),
        ],
        ["t"],
    )
    out = df.select(
        pii.scrub_pii(F.col("t")).alias("s"),
        pii.count_emails(F.col("t")).alias("e"),
        pii.count_phones(F.col("t")).alias("p"),
        pii.count_ipv4(F.col("t")).alias("i"),
    ).collect()
    assert out[0].s == "mail me at <EMAIL> today"
    assert (out[0].e, out[0].p, out[0].i) == (1, 0, 0)
    assert out[1].s == "call <PHONE> or <PHONE> now"
    assert out[1].p == 2
    assert out[2].s == "server <IP> and <IP> are up"
    assert out[2].i == 2
    assert out[3].s == out[3].t if hasattr(out[3], "t") else True
    assert (out[3].e, out[3].p, out[3].i) == (0, 0, 0)
    assert out[4].s == "<EMAIL> visits <IP>"


def test_url_domain_extracts_host(spark):
    df = spark.createDataFrame(
        [
            ("read https://docs.example.org/a/b?q=1 now",),
            ("http://plain.net",),
            ("no links here",),
        ],
        ["t"],
    )
    got = [r.d for r in df.select(pii.url_domain(F.col("t")).alias("d")).collect()]
    assert got == ["docs.example.org", "plain.net", ""]


def test_tokenize_emails_substring_identities(spark):
    """One matched email embedded in another (a@x.com inside
    tea@x.com) must tokenize BOTH identities distinctly — a
    shortest-first fold would corrupt the longer match before its own
    replacement runs and fuse the two identities."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.functions.pii import (
        email_token,
        tokenize_emails,
    )

    df = spark.createDataFrame(
        [("a@x.com wrote to tea@x.com",)], "t string"
    )
    out = df.select(
        tokenize_emails(F.col("t"), "k1").alias("t2"),
        email_token(F.lit("a@x.com"), "k1").alias("tok_a"),
        email_token(F.lit("tea@x.com"), "k1").alias("tok_tea"),
    ).first()
    assert out.t2 == f"{out.tok_a} wrote to {out.tok_tea}"
