"""PII redaction + URL canonicalization unit tests (oracle parity is
covered by tests/test_oracle.py via the suite registry)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.webcorpus import (
    canonicalize_url,
    canonicalize_urls,
    scan_pii,
    synthetic_pages,
)


def _one_url(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonicalize_url(F.lit(url)).alias("u"))
        .collect()[0][0]
    )


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.b@x.io and c@d.org, call 555-123-4567, "
                "host 192.168.0.1 up"),
            (1, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = scan_pii(df).orderBy("doc_id").toPandas()
    assert out.loc[0, ["n_emails", "n_phones", "n_ipv4"]].tolist() == [
        2, 1, 1,
    ]
    assert out.loc[0, "redacted"] == (
        "mail [EMAIL] and [EMAIL], call [PHONE], host [IP] up"
    )
    assert out.loc[1, ["n_emails", "n_phones", "n_ipv4"]].tolist() == [
        0, 0, 0,
    ]
    assert out.loc[1, "redacted"] == "nothing sensitive here"


def test_email_redacted_before_ip_pattern(spark):
    # the host part of an address must never be half-eaten by the
    # IPv4 pattern
    out = (
        scan_pii(
            spark.createDataFrame(
                [(0, "u@10.1.2.3.example.com here")],
                "doc_id long, text string",
            )
        ).collect()[0]
    )
    assert out["n_emails"] == 1
    assert "[EMAIL]" in out["redacted"]
    assert "[IP]" not in out["redacted"]


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/a/b#frag", "http://example.com/a/b"),
        ("https://X.org:443/?utm_source=a&q=1", "https://x.org/?q=1"),
        ("https://x.org/p/?utm_a=1&utm_b=2", "https://x.org/p"),
        ("http://x.org:8080/p", "http://x.org:8080/p"),  # non-default port kept
        ("http://x.org", "http://x.org/"),
        ("http://x.org/?utm_only=1", "http://x.org/"),
    ],
)
def test_canonicalize_url_cases(spark, raw, canon):
    assert _one_url(spark, raw) == canon


def test_canonicalize_urls_hosts_and_domains(spark):
    out = canonicalize_urls(synthetic_pages(spark, 10)).toPandas()
    assert (out["host"] == "www.site" + (out["doc_id"] % 50).astype(str)
            + ".com").all()
    assert (out["domain"] == "site" + (out["doc_id"] % 50).astype(str)
            + ".com").all()
    assert not out["canonical_url"].str.contains("utm_|#|:443|:80").any()


def test_host_quota_keeps_lowest_ids(spark):
    from magmapandas_spark.operators.webcorpus import enforce_host_quota

    rows = [(i, f"h{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = enforce_host_quota(df, quota=3).toPandas()
    kept = out.groupby("host")["doc_id"].apply(sorted).to_dict()
    assert kept == {"h0": [0, 2, 4], "h1": [1, 3, 5]}


def test_scan_pii_null_text_propagates(spark):
    """NULL text propagates to null counts/redaction (documented
    contract; the SQL twin behaves identically by construction)."""
    df = spark.createDataFrame(
        [(0, None), (1, "a@b.io")], "doc_id long, text string"
    )
    out = scan_pii(df).orderBy("doc_id").toPandas()
    assert pd.isna(out.loc[0, "n_emails"]) and pd.isna(out.loc[0, "redacted"])
    assert out.loc[1, "n_emails"] == 1


def test_robots_filter_rfc_precedence(spark):
    from magmapandas_spark.operators.webcorpus import robots_filter

    urls = spark.createDataFrame(
        [
            (0, "h", "/a/b/c"),     # matched by /a (deny) and /a/b (allow)
            (1, "h", "/a/x"),       # only /a -> deny
            (2, "h", "/free"),      # no rule -> allowed
            (3, "h", "/t"),         # equal-length tie: allow wins
        ],
        "doc_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("h", "/a", False),
            ("h", "/a/b", True),
            ("h", "/t", False),
            ("h", "/t", True),
        ],
        "host string, path_prefix string, allow boolean",
    )
    out = (
        robots_filter(urls, rules)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "allowed"] and out.loc[0, "rule_prefix"] == "/a/b"
    assert not out.loc[1, "allowed"]
    assert out.loc[2, "allowed"] and out.loc[2, "rule_prefix"] == ""
    assert out.loc[3, "allowed"]  # allow beats disallow at same length
