"""Driver-contract guards for the consolidated family registry.

A family query unions member frames under an `op` column; its DuckDB
oracle unions the same slices. If a member silently produced zero rows
on BOTH sides (e.g. a join drifting to empty), the hash would still
match — so the non-empty-slice invariant is pinned here, per member,
against the real testdata.
"""

import importlib.util
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("entry_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_fits_driver_cap_and_is_fully_oracled(entry):
    qs, oq = entry.queries(), entry.oracle_sql()
    assert len(qs) <= 50
    assert set(oq) == set(qs), sorted(set(qs) - set(oq))


def test_family_members_cover_every_operator_query(entry):
    # every operator that was collapsed is reachable through exactly one
    # family, and no family is registered without its members
    seen = {}
    for fam, members in entry._FAMILY_DOC.items():
        assert fam in entry.queries()
        for op in members:
            assert op not in seen, f"{op} in {fam} and {seen[op]}"
            seen[op] = fam
    assert len(seen) >= 40


@pytest.mark.parametrize(
    "family",
    [
        "impute_numeric", "impute_other", "encode_count_ordinal",
        "encode_target", "encode_label", "discretize_family",
        "outlier_family", "numeric_transform", "feature_create",
        "datetime_family", "select_stats", "scale_family",
        "embed_transform", "ts_features", "dedup_ids", "sample_family",
        "quality_filter", "pack_family", "lm_family", "lang_id",
    ],
)
def test_family_slices_all_non_empty(entry, spark, family):
    expected = set(entry._FAMILY_DOC[family])
    got = {
        r["op"]
        for r in entry.queries()[family](spark, SF_DIR)
        .select("op")
        .distinct()
        .collect()
    }
    assert got == expected, (sorted(expected - got), sorted(got - expected))


def test_frame_cache_one_entry_under_concurrent_cold_access(entry, spark):
    # family members race _t on cold keys from InheritableThreads; the
    # double-checked lock must hand every racer the SAME cached frame —
    # a loser materializing its own .cache() copy would pin duplicate
    # storage in the cache manager for the life of the session
    from pyspark import InheritableThread

    # sideline (not discard) the module-scope cache so the race sees a
    # cold key; clearing alone would orphan the other tests' .cache()'d
    # frames in the cache manager — the very leak under test
    snapshot = dict(entry._FRAME_CACHE)
    entry._FRAME_CACHE.clear()
    got = []

    def grab():
        got.append(entry._t(spark, SF_DIR, "nation"))

    try:
        threads = [InheritableThread(target=grab) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(got) == 8
        assert len({id(df) for df in got}) == 1
    finally:
        for df in {id(d): d for d in got}.values():
            df.unpersist()
        entry._FRAME_CACHE.clear()
        entry._FRAME_CACHE.update(snapshot)


def test_dedup_pair_families_find_planted_pairs(entry, spark):
    # pair yield depends on planted near-dups; assert each member slice
    # is non-empty at sf0.001 where pairs are guaranteed planted
    for family in ("dedup_pairs", "dedup_pairs_baseline"):
        expected = set(entry._FAMILY_DOC[family])
        got = {
            r["op"]
            for r in entry.queries()[family](spark, SF_DIR)
            .select("op")
            .distinct()
            .collect()
        }
        assert got == expected, (family, sorted(expected - got))
