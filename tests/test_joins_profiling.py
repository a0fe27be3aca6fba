"""AsOfJoiner / GroupedTopK / ColumnProfiler / FrequentItems."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def quotes(spark):
    # key A: quotes at minute 0, 10, 20; key B: quote at minute 5
    return spark.createDataFrame(
        [
            ("A", ts(0), 1.0),
            ("A", ts(10), 2.0),
            ("A", ts(20), 3.0),
            ("B", ts(5), 9.0),
        ],
        "k string, t timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", ts(0), 100),   # exact tie -> inclusive match px=1.0
            ("A", ts(15), 101),  # latest prior is minute 10 -> 2.0
            ("A", ts(25), 102),  # -> 3.0
            ("B", ts(4), 103),   # before any quote -> NULL
            ("C", ts(9), 104),   # key never quoted -> NULL
        ],
        "k string, t timestamp, qty int",
    )


class TestAsOfJoiner:
    def test_backward(self, quotes, trades):
        j = ff.AsOfJoiner(quotes, on=["k"], ts_col="t", value_cols=["px"])
        out = {r["qty"]: r["px"] for r in j.transform(trades).collect()}
        assert out == {100: 1.0, 101: 2.0, 102: 3.0, 103: None, 104: None}

    def test_backward_matched_ts(self, quotes, trades):
        j = ff.AsOfJoiner(quotes, on=["k"], ts_col="t")
        row = {r["qty"]: r["t_right"] for r in j.transform(trades).collect()}
        assert row[101] == ts(10)
        assert row[103] is None

    def test_forward(self, quotes, trades):
        j = ff.AsOfJoiner(quotes, on=["k"], ts_col="t", direction="forward")
        out = {r["qty"]: r["px"] for r in j.transform(trades).collect()}
        # forward: first quote at-or-after the trade
        assert out == {100: 1.0, 101: 3.0, 102: None, 103: 9.0, 104: None}

    def test_tolerance(self, quotes, trades):
        j = ff.AsOfJoiner(
            quotes, on=["k"], ts_col="t", tolerance_seconds=300.0
        )
        out = {r["qty"]: r["px"] for r in j.transform(trades).collect()}
        # trade 101 at minute 15 matches quote at minute 10: 300s -> kept;
        # trade 102 at 25 matches 20: kept; exact tie gap 0 kept
        assert out == {100: 1.0, 101: 2.0, 102: 3.0, 103: None, 104: None}
        j2 = ff.AsOfJoiner(quotes, on=["k"], ts_col="t", tolerance_seconds=100.0)
        out2 = {r["qty"]: r["px"] for r in j2.transform(trades).collect()}
        assert out2 == {100: 1.0, 101: None, 102: None, 103: None, 104: None}

    def test_left_rows_preserved(self, quotes, trades):
        j = ff.AsOfJoiner(quotes, on=["k"], ts_col="t")
        assert j.transform(trades).count() == trades.count()

    def test_name_collision_suffix(self, spark, quotes):
        left = spark.createDataFrame(
            [("A", ts(15), 7.7)], "k string, t timestamp, px double"
        )
        out = ff.AsOfJoiner(quotes, on=["k"], ts_col="t").transform(left)
        assert set(out.columns) == {"k", "t", "px", "t_right", "px_right"}
        r = out.collect()[0]
        assert r["px"] == 7.7 and r["px_right"] == 2.0

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("tolerance", [None, 300.0])
    def test_time_bucketed_equals_default(self, spark, direction, tolerance):
        """The skew-safe carry-in plan must reproduce the single-window
        plan exactly — including buckets holding only left rows, only
        right rows, or nothing, and carries across multiple empty
        buckets."""
        import random

        rng = random.Random(7)

        def key(ch):  # ~1 in 5 rows carries a NULL key
            return None if ch == "N" else ch

        quotes = spark.createDataFrame(
            [
                (key(k), ts(rng.randrange(0, 59)), float(i))
                for i, k in enumerate(
                    [rng.choice("AABCN") for _ in range(40)]
                )
            ],
            "k string, t timestamp, px double",
        )
        trades = spark.createDataFrame(
            [
                (key(rng.choice("AABCDN")), ts(rng.randrange(0, 59)), i)
                for i in range(60)
            ],
            "k string, t timestamp, qty int",
        )
        kw = dict(
            on=["k"], ts_col="t", value_cols=["px"],
            direction=direction, tolerance_seconds=tolerance,
        )
        base = ff.AsOfJoiner(quotes, **kw).transform(trades)
        # 5-minute buckets over an hour of data: in-bucket misses and
        # multi-bucket carries both occur
        bucketed = ff.AsOfJoiner(
            quotes, time_bucket_seconds=300.0, **kw
        ).transform(trades)
        row_key = lambda r: (r["k"], r["t"], r["qty"])  # noqa: E731
        b = {row_key(r): (r["px"], r["t_right"]) for r in base.collect()}
        s = {row_key(r): (r["px"], r["t_right"]) for r in bucketed.collect()}
        assert b == s

    def test_time_bucketed_plan_partitions_by_bucket(self, quotes, trades):
        j = ff.AsOfJoiner(
            quotes, on=["k"], ts_col="t", time_bucket_seconds=600.0
        )
        plan = j.transform(trades)._jdf.queryExecution().optimizedPlan().toString()
        assert "__bkt" in plan


class TestIntervalJoiner:
    @pytest.fixture(scope="class")
    def windows(self, spark):
        # key A: [0:05, 0:15) and [0:10, 0:30) overlap; key B: [0:00, 0:10)
        return spark.createDataFrame(
            [
                ("A", ts(5), ts(15), "w1"),
                ("A", ts(10), ts(30), "w2"),
                ("B", ts(0), ts(10), "w3"),
            ],
            "k string, s timestamp, e timestamp, wid string",
        )

    @pytest.fixture(scope="class")
    def points(self, spark):
        return spark.createDataFrame(
            [
                ("A", ts(12), 1),  # in w1 and w2
                ("A", ts(5), 2),   # start-inclusive -> w1
                ("A", ts(15), 3),  # end-exclusive for w1 -> only w2
                ("A", ts(45), 4),  # no window
                ("B", ts(3), 5),   # w3
                ("C", ts(3), 6),   # key never windowed
            ],
            "k string, t timestamp, pid int",
        )

    def test_inner(self, windows, points):
        j = ff.IntervalJoiner(
            windows, on=["k"], point_col="t", start_col="s", end_col="e",
            bin_width_seconds=300,
        )
        got = sorted((r["pid"], r["wid"]) for r in j.transform(points).collect())
        assert got == [(1, "w1"), (1, "w2"), (2, "w1"), (3, "w2"), (5, "w3")]

    def test_left(self, windows, points):
        j = ff.IntervalJoiner(
            windows, on=["k"], point_col="t", start_col="s", end_col="e",
            bin_width_seconds=300, how="left",
        )
        out = j.transform(points)
        got = sorted((r["pid"], r["wid"]) for r in out.collect())
        assert got == [
            (1, "w1"), (1, "w2"), (2, "w1"), (3, "w2"),
            (4, None), (5, "w3"), (6, None),
        ]

    def test_bin_width_invariance(self, windows, points):
        base = None
        for w in (60, 171, 300, 3600):
            j = ff.IntervalJoiner(
                windows, on=["k"], point_col="t", start_col="s", end_col="e",
                bin_width_seconds=w,
            )
            got = sorted(
                (r["pid"], r["wid"]) for r in j.transform(points).collect()
            )
            base = got if base is None else base
            assert got == base, f"bin width {w} changed results"

    def test_oversize_interval_excluded(self, spark, points):
        huge = spark.createDataFrame(
            [("A", ts(0), dt.datetime(2030, 1, 1), "huge")],
            "k string, s timestamp, e timestamp, wid string",
        )
        j = ff.IntervalJoiner(
            huge, on=["k"], point_col="t", start_col="s", end_col="e",
            bin_width_seconds=60, max_bins_per_interval=100,
        )
        assert j.transform(points).count() == 0


class TestGroupedTopK:
    def test_basic(self, spark):
        df = spark.createDataFrame(
            [("a", i, float(i % 5)) for i in range(20)]
            + [("b", 100 + i, float(i)) for i in range(3)],
            "g string, id long, score double",
        )
        tk = ff.GroupedTopK(["g"], "score", k=2, tiebreak_cols=["id"])
        rows = sorted(
            (r["g"], r["id"]) for r in tk.transform(df).collect()
        )
        # group a: score 4.0 ids 4 and 9 (smallest ids on tie)
        assert rows == [("a", 4), ("a", 9), ("b", 101), ("b", 102)]

    def test_skew_safe_same_result(self, spark):
        df = spark.createDataFrame(
            [("g", i, float((i * 37) % 101)) for i in range(500)],
            "g string, id long, score double",
        ).repartition(8)
        plain = ff.GroupedTopK(["g"], "score", k=5, tiebreak_cols=["id"])
        salted = ff.GroupedTopK(
            ["g"], "score", k=5, tiebreak_cols=["id"], skew_safe=True
        )
        a = sorted(r["id"] for r in plain.transform(df).collect())
        b = sorted(r["id"] for r in salted.transform(df).collect())
        assert a == b and len(a) == 5

    def test_ascending(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 5.0), ("g", 2, 1.0), ("g", 3, 3.0)],
            "g string, id long, score double",
        )
        tk = ff.GroupedTopK(["g"], "score", k=1, ascending=True)
        assert tk.transform(df).collect()[0]["id"] == 2


class TestColumnProfiler:
    def test_profile(self, spark):
        df = spark.createDataFrame(
            [(1.0, "x"), (2.0, "y"), (None, "x"), (4.0, None)],
            "n double, s string",
        )
        p = ff.ColumnProfiler(exact_distinct=True).profile(df)
        m = {(r["column"], r["metric"]): r for r in p.collect()}
        assert m[("n", "count")]["value_num"] == 3
        assert m[("n", "nulls")]["value_num"] == 1
        assert m[("n", "distinct")]["value_num"] == 3
        assert m[("n", "min")]["value_num"] == 1.0
        assert m[("n", "max")]["value_num"] == 4.0
        assert m[("n", "mean")]["value_num"] == pytest.approx(7.0 / 3)
        assert m[("s", "min")]["value_str"] == "x"
        assert m[("s", "max")]["value_str"] == "y"
        assert m[("s", "avg_len")]["value_num"] == 1.0
        assert m[("s", "nulls")]["value_num"] == 1

    def test_approx_distinct_close(self, spark):
        df = spark.range(1000).select(F.col("id").cast("double").alias("n"))
        p = ff.ColumnProfiler(columns=["n"]).profile(df)
        d = {r["metric"]: r["value_num"] for r in p.collect()}
        # rsd=0.05 is ONE standard error; allow 4 sigma
        assert abs(d["distinct"] - 1000) / 1000 < 0.2

    def test_skips_unprofilable(self, spark):
        df = spark.createDataFrame([([1, 2], 1.0)], "arr array<int>, n double")
        cols = {r["column"] for r in ff.ColumnProfiler().profile(df).collect()}
        assert cols == {"n"}


class TestFrequentItems:
    def test_min_count_and_topk(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("a",), ("b",), ("b",), ("c",), (None,)],
            "v string",
        )
        out = ff.FrequentItems(["v"], min_count=2).frequent(df)
        m = {r["value"]: r["cnt"] for r in out.collect()}
        assert m == {"a": 3, "b": 2}
        top1 = ff.FrequentItems(["v"], min_count=1, top_k=1).frequent(df)
        assert [(r["value"], r["cnt"]) for r in top1.collect()] == [("a", 3)]

    def test_multi_column(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "y")], "a int, b string"
        )
        out = ff.FrequentItems(["a", "b"], min_count=2).frequent(df)
        m = {(r["column"], r["value"]): r["cnt"] for r in out.collect()}
        assert m == {("a", "1"): 2, ("b", "y"): 2}


class TestCorpusReport:
    def test_per_group_data_card(self, spark):
        rows = ([(i, "web", "en", 100 + i) for i in range(8)]
                + [(100 + i, "books", "en", 1000) for i in range(2)])
        df = spark.createDataFrame(
            rows, "doc_id bigint, source string, lang string, n_chars int"
        )
        rep = ff.corpus_report(df, ["source"], ["n_chars"],
                               quantiles="exact")
        got = {(r["source"], r["metric"]): r["value"]
               for r in rep.collect()}
        assert got[("web", "n_docs")] == 8.0
        assert got[("books", "n_docs")] == 2.0
        assert got[("web", "share")] == 0.8
        assert got[("web", "n_chars_sum")] == sum(100 + i for i in range(8))
        assert got[("books", "n_chars_mean")] == 1000.0
        assert got[("web", "n_chars_min")] == 100.0
        assert got[("web", "n_chars_max")] == 107.0
        assert got[("web", "n_chars_p50")] == 103.5  # interpolated
        # shares sum to 1 across the report
        assert sum(v for (s, m), v in got.items() if m == "share") == 1.0

    def test_multi_group_and_quantile_modes(self, spark):
        df = spark.createDataFrame(
            [(1, "web", "en", 10), (2, "web", "fr", 20), (3, "web", "fr", 30)],
            "doc_id bigint, source string, lang string, n_chars int",
        )
        rep = ff.corpus_report(df, ["source", "lang"], ["n_chars"])
        rows = rep.collect()
        assert {"source", "lang", "metric", "value"} <= set(rep.columns)
        assert {( r["source"], r["lang"]) for r in rows} == {("web", "en"), ("web", "fr")}
        none = ff.corpus_report(df, ["lang"], ["n_chars"], quantiles="none")
        assert not [r for r in none.collect() if r["metric"].endswith("_p50")]
        import pytest as _p

        from feature_factory_spark.exceptions import InvalidParameterError
        with _p.raises(InvalidParameterError):
            ff.corpus_report(df, [], ["n_chars"])
        with _p.raises(InvalidParameterError):
            ff.corpus_report(df, ["lang"], ["n_chars"], quantiles="median")

    def test_percentile_list(self, spark):
        df = spark.createDataFrame(
            [(i, "s", i) for i in range(1, 101)],
            "doc_id bigint, source string, n int",
        )
        rep = ff.corpus_report(
            df, ["source"], ["n"], quantiles="exact",
            percentiles=[0.1, 0.5, 0.9],
        )
        got = {r["metric"]: r["value"] for r in rep.collect()}
        assert abs(got["n_p10"] - 10.9) < 1e-9  # interpolated over 1..100
        assert got["n_p50"] == 50.5
        assert abs(got["n_p90"] - 90.1) < 1e-9
        import pytest as _p

        from feature_factory_spark.exceptions import InvalidParameterError
        with _p.raises(InvalidParameterError):
            ff.corpus_report(df, ["source"], ["n"], percentiles=[1.5])


class TestCorpusOverlap:
    def test_exact_counts_and_fractions(self, spark):
        a = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "one two three")],
            "doc_id bigint, text string",
        )
        b = spark.createDataFrame(
            [(1, "alpha beta gamma epsilon"), (2, "unrelated words here")],
            "doc_id bigint, text string",
        )
        got = {r["metric"]: r["value"]
               for r in ff.corpus_overlap(a, b, "text", n=3).collect()}
        # a trigrams: {alpha beta gamma, beta gamma delta, one two three}
        # b trigrams: {alpha beta gamma, beta gamma epsilon,
        #              unrelated words here}; shared = 1
        assert got["distinct_grams_a"] == 3.0
        assert got["distinct_grams_b"] == 3.0
        assert got["shared_grams"] == 1.0
        assert got["overlap_a_in_b"] == 1 / 3
        assert got["overlap_b_in_a"] == 1 / 3

    def test_identical_and_disjoint(self, spark):
        a = spark.createDataFrame(
            [(1, "x y z w"), (2, None)], "doc_id bigint, text string"
        )
        same = {r["metric"]: r["value"]
                for r in ff.corpus_overlap(a, a).collect()}
        assert same["overlap_a_in_b"] == 1.0
        disj = spark.createDataFrame(
            [(1, "p q r s")], "doc_id bigint, text string"
        )
        none = {r["metric"]: r["value"]
                for r in ff.corpus_overlap(a, disj).collect()}
        assert none["shared_grams"] == 0.0
        assert none["overlap_a_in_b"] == 0.0

    def test_short_doc_clamp(self, spark):
        # a <n-word doc contributes its whole text as one gram — the
        # package shingle clamp
        a = spark.createDataFrame([(1, "hi there")],
                                  "doc_id bigint, text string")
        b = spark.createDataFrame([(1, "hi there")],
                                  "doc_id bigint, text string")
        got = {r["metric"]: r["value"]
               for r in ff.corpus_overlap(a, b, n=5).collect()}
        assert got["distinct_grams_a"] == 1.0
        assert got["overlap_a_in_b"] == 1.0
