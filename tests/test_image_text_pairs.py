"""ImageTextPairExtractor + join_image_text_pairs (r10): the
LAION-style training-pair layer — harvest (src, alt, title, caption,
context) per <img> from raw HTML, resolve against the page URL, join
against crawled image bytes, gate with ImageQualityFilter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import FeatureFactoryError
from feature_factory_spark.operators.imagecodec import encode_png, solid_png
from feature_factory_spark.operators.imagetext import (
    ImageTextPairExtractor,
    join_image_text_pairs,
    resolve_url_expr,
)

PAGE = (
    "<html><body><p>Intro about cats &amp; dogs.</p>"
    '<img src="/images/a.png" alt="A grey cat">'
    "<figure><img src='../assets/b.jpg' title='B title'>"
    "<figcaption>A <b>black</b> dog</figcaption></figure>"
    "<img src=//cdn.example.net/d.gif alt=bare>"
    '<img alt="no src at all">'
    '<img src="">'
    "<p>Outro.</p></body></html>"
)


@pytest.fixture()
def pairs(spark):
    df = spark.createDataFrame(
        [
            (1, PAGE, "https://Img.example.org/gallery/page-1/index.html"),
            (2, "<p>no images here</p>", "https://x.org/"),
            (3, None, "https://x.org/"),
        ],
        "doc_id int, html string, url string",
    )
    ex = ImageTextPairExtractor("html", url_col="url")
    return ex.fit(df).transform(df)


def test_harvest_rows_and_attrs(pairs):
    rows = {(r["doc_id"], r["img_pos"]): r for r in pairs.collect()}
    # 5 img tags on page 1; the no-src and empty-src ones drop
    assert set(rows) == {(1, 0), (1, 1), (1, 2)}
    a, b, d = rows[(1, 0)], rows[(1, 1)], rows[(1, 2)]
    assert a["img_src"] == "/images/a.png"
    assert a["img_url"] == "https://img.example.org/images/a.png"
    assert a["img_alt"] == "A grey cat" and a["pair_text"] == "A grey cat"
    assert "Intro about cats & dogs." in a["img_context"]
    # single-quoted title, figcaption with nested markup
    assert b["img_url"] == "https://img.example.org/gallery/assets/b.jpg"
    assert b["img_alt"] is None and b["img_title"] == "B title"
    assert b["img_caption"] == "A black dog"
    assert b["pair_text"] == "A black dog"  # caption beats title
    # bare (unquoted) attributes + scheme-relative src
    assert d["img_url"] == "https://cdn.example.net/d.gif"
    assert d["img_alt"] == "bare" and d["pair_text"] == "bare"


def test_resolve_url_cases(spark):
    cases = [
        ("x.png", "https://a.org/d/e/x.png"),
        ("../x.png", "https://a.org/d/x.png"),
        ("../../../x.png", "https://a.org/x.png"),  # .. clamps at root
        ("./y.png", "https://a.org/d/e/y.png"),
        ("/abs.png", "https://a.org/abs.png"),
        ("//c.net/z.png", "https://c.net/z.png"),
        ("http://b.com/q.png", "http://b.com/q.png"),
        ("data:image/png;base64,AAA", "data:image/png;base64,AAA"),
        ("#frag", None),
        ("?q=1", "https://a.org/d/e/f.html?q=1"),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [("https://a.org/d/e/f.html", rel) for rel, _ in cases],
        "base string, rel string",
    )
    got = [
        r["res"]
        for r in df.select(
            resolve_url_expr(F.col("base"), F.col("rel")).alias("res")
        ).collect()
    ]
    assert got == [want for _, want in cases]
    # unparseable base -> NULL
    bad = spark.createDataFrame([("nope", "x.png")], "base string, rel string")
    assert bad.select(
        resolve_url_expr(F.col("base"), F.col("rel")).alias("r")
    ).collect()[0]["r"] is None


def test_require_src_false_keeps_textonly_tags(spark):
    df = spark.createDataFrame(
        [(1, '<img alt="hello">', "https://a.org/")],
        "doc_id int, html string, url string",
    )
    out = ImageTextPairExtractor(
        "html", url_col="url", require_src=False
    ).transform(df)
    r = out.collect()[0]
    assert r["img_src"] is None and r["img_alt"] == "hello"


def test_harvest_is_narrow_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, PAGE, "https://a.org/p/")], "doc_id int, html string, url string"
    )
    out = ImageTextPairExtractor("html", url_col="url").transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_join_and_quality_gate(spark):
    pages = spark.createDataFrame(
        [(1, PAGE, "https://img.example.org/gallery/page-1/index.html")],
        "doc_id int, html string, url string",
    )
    cand = ImageTextPairExtractor("html", url_col="url").transform(pages)
    rng = np.random.default_rng(0)
    noisy = encode_png(rng.integers(0, 256, (64, 64)).astype(np.uint8))
    crawled = spark.createDataFrame(
        [
            # tracking-param variant canonicalizes to a.png's URL
            ("https://img.example.org/images/a.png?utm_source=x", noisy),
            # duplicate fetch of the same URL: dedup keeps one
            ("https://img.example.org/images/a.png", noisy),
            ("https://img.example.org/gallery/assets/b.jpg",
             solid_png(64, 64, 10)),          # blank: quality-dropped
            ("https://elsewhere.net/unrelated.png", noisy),
        ],
        "url string, img binary",
    )
    joined = join_image_text_pairs(cand, crawled, "url", "img")
    got = {r["img_url"]: r for r in joined.collect()}
    assert set(got) == {
        "https://img.example.org/images/a.png",
        "https://img.example.org/gallery/assets/b.jpg",
    }
    assert got["https://img.example.org/images/a.png"]["pair_text"] == (
        "A grey cat"
    )
    gated = join_image_text_pairs(
        cand, crawled, "url", "img",
        quality=ff.ImageQualityFilter("img", min_width=32, min_height=32),
    )
    rows = gated.collect()
    assert [r["img_url"] for r in rows] == [
        "https://img.example.org/images/a.png"
    ]
    assert rows[0]["img_keep"] is True
    # left join keeps text-only candidates for recall audits
    audit = join_image_text_pairs(cand, crawled, "url", "img", how="left")
    assert audit.count() == 3
    assert audit.where("img is NULL").count() == 1
    with pytest.raises(FeatureFactoryError):
        join_image_text_pairs(cand, crawled, "url", "img", how="outer")


def test_pair_extractor_in_pipeline(spark):
    from feature_factory_spark.pipeline import Pipeline

    pages = spark.createDataFrame(
        [(1, PAGE, "https://img.example.org/g/p/")],
        "doc_id int, html string, url string",
    )
    pipe = Pipeline([
        ("pairs", ImageTextPairExtractor("html", url_col="url")),
    ])
    out = pipe.fit(pages)
    assert out.count() == 3


class TestImageTextPairScorer:
    def frame(self, spark):
        # unit vectors at known angles: cos(0)=1, cos(90deg)=0,
        # opposite=-1, plus degenerate shapes (zero-norm, NULL,
        # length mismatch) that must score NULL and never pass
        return spark.createDataFrame(
            [
                (1, [1.0, 0.0], [1.0, 0.0]),       # cos 1.0 -> keep
                (2, [1.0, 0.0], [0.0, 1.0]),       # cos 0.0 -> drop
                (3, [1.0, 0.0], [-1.0, 0.0]),      # cos -1 -> drop
                (4, [1.0, 0.0], [0.9, 0.4359]),    # cos ~0.9 -> keep
                (5, [0.0, 0.0], [1.0, 0.0]),       # zero-norm -> NULL
                (6, None, [1.0, 0.0]),             # NULL -> NULL
                (7, [1.0, 0.0], [1.0, 0.0, 0.0]),  # len mismatch
            ],
            "pair_id bigint, img array<double>, txt array<double>",
        )

    def test_flag_mode_scores_and_gates(self, spark):
        out = ff.ImageTextPairScorer("img", "txt", threshold=0.28) \
            .transform(self.frame(spark))
        got = {r["pair_id"]: (r["pair_cosine"], r["pair_cosine_keep"])
               for r in out.collect()}
        assert got[1][0] == pytest.approx(1.0) and got[1][1] is True
        assert got[2][0] == pytest.approx(0.0) and got[2][1] is False
        assert got[3][0] == pytest.approx(-1.0) and got[3][1] is False
        assert got[4][0] == pytest.approx(0.9, abs=1e-3)
        assert got[4][1] is True
        # degenerate pairs: NULL cosine, never kept
        for pid in (5, 6, 7):
            assert got[pid][0] is None and got[pid][1] is False

    def test_filter_mode_and_threshold(self, spark):
        kept = ff.ImageTextPairScorer(
            "img", "txt", threshold=0.95, mode="filter"
        ).transform(self.frame(spark))
        assert sorted(r["pair_id"] for r in kept.collect()) == [1]
        with pytest.raises(FeatureFactoryError):
            ff.ImageTextPairScorer("img", "txt", threshold=1.5)
        with pytest.raises(FeatureFactoryError):
            ff.ImageTextPairScorer("img", "txt", mode="bogus")

    def test_narrow_plan(self, spark):
        out = ff.ImageTextPairScorer("img", "txt").transform(
            self.frame(spark)
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan

    def test_composes_after_join(self, spark):
        # harvest -> join -> similarity gate, the full curation loop
        pages = spark.createDataFrame(
            [(1, '<img src="https://x.org/a.png" alt="a cat">')],
            "doc_id int, html string",
        )
        cand = ImageTextPairExtractor("html").transform(pages)
        crawled = spark.createDataFrame(
            [("https://x.org/a.png", solid_png(16, 16, 80))],
            "url string, img binary",
        )
        joined = join_image_text_pairs(cand, crawled, "url", "img")
        gated = ff.ImageTextPairScorer(
            "img_emb", "txt_emb", mode="filter"
        ).transform(
            joined.withColumn("img_emb", F.array(F.lit(1.0), F.lit(0.0)))
            .withColumn("txt_emb", F.array(F.lit(1.0), F.lit(0.1)))
        )
        assert gated.count() == 1
        assert gated.columns[-1] == "pair_cosine"
