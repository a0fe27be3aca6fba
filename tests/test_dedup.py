"""WithinDocDeduplicator (r10): repeated-line removal inside one
document — the Dolma/Gopher self-dedup pass, keep-first."""

import feature_factory_spark as ff


class TestWithinDocDeduplicator:
    def test_keep_first_within_doc(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb\na\n\nb\nc d e"), (2, "x\ny"), (3, None)],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: (r["text"], r["text_self_removed"])
               for r in ff.WithinDocDeduplicator("text")
               .transform(df).collect()}
        # dup 'a' and dup 'b' cut, first kept, blank line kept
        assert out[1] == ("a\nb\n\nc d e", 2)
        assert out[2] == ("x\ny", 0)
        assert out[3] == (None, None)

    def test_min_chars_spares_short_segments(self, spark):
        df = spark.createDataFrame(
            [(1, "- x\n- x\nlong enough line\nlong enough line")],
            "doc_id bigint, text string",
        )
        out = ff.WithinDocDeduplicator("text", min_chars=5).transform(df)
        r = out.collect()[0]
        # the short '- x' bullets survive; the long line dedups
        assert r["text"] == "- x\n- x\nlong enough line"
        assert r["text_self_removed"] == 1

    def test_cross_doc_lines_untouched(self, spark):
        # the SAME line in two docs survives in both — within-doc only
        df = spark.createDataFrame(
            [(1, "shared line\nown a"), (2, "shared line\nown b")],
            "doc_id bigint, text string",
        )
        out = ff.WithinDocDeduplicator("text").transform(df)
        assert all("shared line" in r["text"] for r in out.collect())

    def test_plan_stays_narrow(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb")], "doc_id bigint, text string"
        )
        plan = (ff.WithinDocDeduplicator("text").transform(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
