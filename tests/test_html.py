"""HTML boilerplate-stripping tests: hygiene cases + the formula
oracle (Spark strips real markup; the oracle never runs a regex)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.html import (
    SQL_HTML_EXTRACT,
    extract_main_text,
    html_to_text,
    make_synthetic_html,
    q_html_extract,
)


def _strip_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]


def test_script_style_head_removed(spark):
    html = (
        "<html><head><title>T</title><style>p{x}</style></head>"
        "<body><script type='text/javascript'>if (a<b) {alert('<p>')}"
        "</script><p>keep me</p></body></html>"
    )
    assert _strip_one(spark, html) == "keep me"


def test_boilerplate_containers_removed(spark):
    html = (
        "<body><nav>home</nav><header>h</header><p>main text</p>"
        "<aside>related</aside><footer>f</footer></body>"
    )
    assert _strip_one(spark, html) == "main text"


def test_ad_divs_and_comments_removed(spark):
    html = (
        "<body><p>a</p><div class=\"ad big\">BUY</div>"
        "<!-- hidden --><div class='ok'>b</div></body>"
    )
    assert _strip_one(spark, html) == "a b"


def test_entities_decoded_and_whitespace_collapsed(spark):
    html = "<body><p>x &amp; y\n\n  &lt;z&gt;   &quot;q&quot;</p></body>"
    assert _strip_one(spark, html) == 'x & y <z> "q"'


def test_attribute_tags_stripped(spark):
    html = '<body><a href="http://x/?a=1&amp;b=2" class="l">link</a></body>'
    assert _strip_one(spark, html) == "link"


def test_extract_main_text_schema(spark):
    docs = spark.createDataFrame(
        [(1, make_synthetic_html(1))], "doc_id long, html string"
    )
    out = extract_main_text(docs).collect()[0]
    assert out["title"] == "Page 1 & friends"
    assert out["n_words"] > 0
    assert "<" not in out["text"]


def test_oracle_matches(spark):
    got = q_html_extract(spark, "").toPandas()
    exp = duckdb.sql(SQL_HTML_EXTRACT).df()
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)
