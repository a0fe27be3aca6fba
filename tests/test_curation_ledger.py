"""curation_ledger / curation_funnel (r11): the unified keep/drop
audit of a gate-pipeline run — per-document first-killer attribution
plus the per-stage funnel. The attribution law itself is oracle-pinned
(column_profile:curation_ledger recomputes both stages relationally);
these tests cover the mechanics: flag-gates and anti-join dedupers in
one pipeline, zero-drop stages, funnel arithmetic, and stage-name
error wrapping."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "a perfectly fine document about spark"),
        (2, "this one has the badword zzzbad inside"),
        (3, "duplicate body shared by two docs"),
        (4, "duplicate body shared by two docs"),
        (5, "another clean unique document here"),
        (6, "zzzbad again and also a duplicate"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def make_pipe():
    return ff.make_pipeline(
        ("badwords", ff.BadWordsFilter("text", ["zzzbad"], mode="filter")),
        ("exact_dedup", ff.ExactDeduplicator(["text"], "doc_id")),
    )


def test_attribution_and_survivors(spark, corpus):
    out, ledger = ff.curation_ledger(corpus, make_pipe(), "doc_id")
    got = {r["doc_id"]: (r["kept"], r["stage"], r["stage_index"])
           for r in ledger.collect()}
    assert len(got) == 6  # one row per INPUT doc
    assert got[2] == (False, "badwords", 0)
    assert got[6] == (False, "badwords", 0)
    # of the duplicate pair, exactly one dies at exact_dedup
    dup = {k: got[k] for k in (3, 4)}
    assert sorted(v[0] for v in dup.values()) == [False, True]
    dead = next(k for k, v in dup.items() if not v[0])
    assert dup[dead][1:] == ("exact_dedup", 1)
    assert got[1] == (True, None, None)
    assert got[5] == (True, None, None)
    # out is the pipeline's own final frame
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) \
        == sorted(k for k, v in got.items() if v[0])


def test_funnel_counts_and_zero_fill(spark, corpus):
    pipe = ff.make_pipeline(
        ("noop_redact", ff.PIIRedactor(["text"])),  # drops nothing
        ("badwords", ff.BadWordsFilter("text", ["zzzbad"], mode="filter")),
        ("exact_dedup", ff.ExactDeduplicator(["text"], "doc_id")),
    )
    _, ledger = ff.curation_ledger(corpus, pipe, "doc_id")
    funnel = ff.curation_funnel(
        ledger, stages=[n for n, _ in pipe.steps]
    ).orderBy("stage_index").collect()
    rows = [(r["stage"], r["n_in"], r["n_dropped"], r["n_out"])
            for r in funnel]
    assert rows == [
        ("noop_redact", 6, 0, 6),
        ("badwords", 6, 2, 4),
        ("exact_dedup", 4, 1, 3),
    ]
    # without `stages`, zero-drop stages are absent
    bare = ff.curation_funnel(ledger).collect()
    assert sorted(r["stage"] for r in bare) == ["badwords", "exact_dedup"]


def test_stage_error_is_wrapped_with_name(spark, corpus):
    pipe = ff.make_pipeline(
        ("broken", ff.BadWordsFilter("missing_col", ["x"], mode="filter")),
    )
    with pytest.raises(ff.FeatureFactoryError, match="broken"):
        ff.curation_ledger(corpus, pipe, "doc_id")


def test_preset_run_end_to_end(spark, corpus):
    # a real preset (c4) audits cleanly; every input doc is accounted
    # for exactly once and the funnel telescopes
    pipe = ff.presets.c4_pipeline()
    out, ledger = ff.curation_ledger(corpus, pipe, "doc_id")
    assert ledger.count() == 6
    assert ledger.select("doc_id").distinct().count() == 6
    funnel = ff.curation_funnel(
        ledger, stages=[n for n, _ in pipe.steps]
    ).orderBy("stage_index").collect()
    for a, b in zip(funnel, funnel[1:]):
        assert a["n_out"] == b["n_in"]
    assert funnel[-1]["n_out"] == out.count()
    assert funnel[0]["n_in"] == 6
