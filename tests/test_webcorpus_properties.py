"""Property tests for the web-corpus expression kernels, evaluated
through Spark once per example batch (expressions are the unit under
test, so batching examples into one DataFrame keeps this fast)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from magmapandas_spark.operators.webcorpus import canonicalize_url

_url = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}\.(com|org|io)",
                       fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}/?",
                       fullmatch=True),
    q=st.sampled_from(
        ["", "?a=1", "?utm_source=x", "?utm_a=1&b=2", "?b=2&utm_c=3"]
    ),
    frag=st.sampled_from(["", "#f", "#frag1"]),
)


@pytest.mark.usefixtures("spark")
def test_canonicalize_idempotent_batch(spark):
    """canonicalize ∘ canonicalize == canonicalize — the web-dedup key
    must be a fixpoint, else two passes over the same crawl disagree."""
    import hypothesis

    urls = []

    @settings(max_examples=120, deadline=None, database=None)
    @given(u=_url)
    def collect(u):
        urls.append(u)

    collect()
    df = spark.createDataFrame([(u,) for u in set(urls)], "url string")
    out = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("c1"),
    ).select(
        "url", "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).toPandas()
    bad = out[out["c1"] != out["c2"]]
    assert bad.empty, bad.head(10).to_string()
