"""Registry-cap enforcement and family-builder failure injection
(VERDICT.md r4 next-round items 6 and 7).

Uses a private module instance (fresh exec per module) so registry
mutations cannot leak into other test files."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("entry_mod_guard", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cap_check_raises_loudly_at_51(entry):
    fake = {f"q{i}": (None, "SELECT 1") for i in range(51)}
    with pytest.raises(RuntimeError, match="existing family"):
        entry._check_registry_cap(fake)
    entry._check_registry_cap({f"q{i}": (None, None) for i in range(50)})


def test_live_registry_under_cap_with_headroom(entry):
    # 49 after the multimodal consolidation: one slot of headroom, and
    # the import-time check ran (module loaded without raising)
    assert len(entry._REGISTRY) <= entry._REGISTRY_CAP


def test_poisoned_family_member_fails_clean(entry, spark):
    """A member raising mid-family must surface the member's name, not
    strand fitted frames, and not leave the legacy-nanos conf flipped."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    conf_before = spark.conf.get(key, None)

    calls = {}

    def good(sp, sf):
        op = entry.ff.VocabBuilder("text", "doc_id", vocab_size=5)
        docs = sp.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        entry._track(op.fit(docs))
        calls["good"] = True
        return op.vocab_df_.select(F.col("token").alias("doc_id"))

    def poisoned(sp, sf):
        raise ValueError("injected failure")

    saved_registry = dict(entry._REGISTRY)
    saved_doc = dict(entry._FAMILY_DOC)
    try:
        entry._REGISTRY["__good"] = (good, "SELECT 'x' AS doc_id")
        entry._REGISTRY["__poisoned"] = (poisoned, "SELECT 'x' AS doc_id")
        entry._merge("__test_family", [
            ("__good", ["doc_id"], "doc_id"),
            ("__poisoned", ["doc_id"], "doc_id"),
        ])
        fn, _ = entry._REGISTRY["__test_family"]
        with pytest.raises(RuntimeError, match="__poisoned"):
            fn(spark, SF_DIR)
        assert calls.get("good")  # the healthy member really fitted first
        # eager release: the fitted sibling's frame is not stranded
        assert entry._FITTED_OPS == []
        assert spark.conf.get(key, None) == conf_before
    finally:
        entry._REGISTRY.clear()
        entry._REGISTRY.update(saved_registry)
        entry._FAMILY_DOC.clear()
        entry._FAMILY_DOC.update(saved_doc)
        entry.release_fitted_frames()


def test_release_fitted_frames_unpins_storage(entry, spark):
    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3}") for i in range(20)],
        "doc_id bigint, text string",
    )
    op = entry.ff.VocabBuilder("text", "doc_id", vocab_size=8).fit(docs)
    entry._track(op)
    op.vocab_df_.count()
    assert len(sc._jsc.getPersistentRDDs()) > before
    entry.release_fitted_frames()
    assert len(sc._jsc.getPersistentRDDs()) == before
