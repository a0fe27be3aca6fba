"""ANN index append (r10 brief item 5): IVFCosineTopK and
BucketedCosineTopK ``write_index(mode='append')`` — the recrawl path.

The bar set by VERDICT.md: append + search_index == full-rebuild
search on the union corpus (exact for both families once the IVF
rebuild uses the same frozen centroids); compact_index works on the
appended ANN layout; the versions log tracks the appends; parameter /
layout mismatches fail loud instead of silently mis-probing.
"""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


def vecs(spark, lo, hi, dim=16):
    return spark.createDataFrame(
        [(i, [float((i * 13 + j * 5) % 11) - 5.0 for j in range(dim)])
         for i in range(lo, hi)],
        "vec_id bigint, embedding array<double>",
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in df.collect()
    )


def _ivf(**kw):
    return ff.IVFCosineTopK(
        "embedding", "vec_id", k=5, n_centroids=6, n_probe=2,
        iterations=2, **kw
    )


def _lsh(**kw):
    return ff.BucketedCosineTopK("embedding", "vec_id", k=5, dim=16, **kw)


# -- IVF ----------------------------------------------------------------


def test_ivf_append_matches_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "ivf")
    old, new = vecs(spark, 0, 120), vecs(spark, 120, 180)
    queries = old.where(F.col("vec_id") < 4)

    op = _ivf().fit_index(old)
    op.write_index(old, path)
    # the append assigns new vectors against the index's FROZEN
    # centroids — a fresh instance must pick them up from disk
    fresh = _ivf()
    fresh.write_index(new, path, mode="append")
    assert fresh.centroids_ == op.centroids_
    got = _rows(_ivf().search_index(spark, path, queries))

    # full rebuild over the union with the SAME centroids (an IVF
    # rebuild that refits would legitimately differ — frozen centroids
    # are the append contract)
    rebuilt = _ivf()
    rebuilt.centroids_ = op.centroids_
    full = str(tmp_path / "ivf_full")
    rebuilt.write_index(old.unionByName(new), full)
    expected = _rows(_ivf().search_index(spark, full, queries))
    assert got == expected

    vs = ff.index_versions(spark, path)
    assert [v["op"] for v in vs] == ["write", "append"]


def test_ivf_append_to_missing_index_raises(spark, tmp_path):
    with pytest.raises(ff.InvalidParameterError, match="no centroids"):
        _ivf().write_index(
            vecs(spark, 0, 20), str(tmp_path / "nope"), mode="append"
        )


def test_ivf_append_layout_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "ivf_q8")
    op = _ivf().fit_index(vecs(spark, 0, 60))
    op.write_index(vecs(spark, 0, 60), path, quantize=True)
    with pytest.raises(ff.InvalidParameterError, match="quantize=True"):
        _ivf().write_index(vecs(spark, 60, 80), path, mode="append")
    # matching layout appends fine and probes end to end
    _ivf().write_index(
        vecs(spark, 60, 80), path, mode="append", quantize=True
    )
    q = vecs(spark, 0, 3)
    assert _ivf().search_index(spark, path, q).count() > 0


# -- LSH ----------------------------------------------------------------


def test_lsh_append_matches_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "lsh")
    old, new = vecs(spark, 0, 120), vecs(spark, 120, 180)
    queries = old.where(F.col("vec_id") < 4)

    _lsh().write_index(old, path)
    _lsh().write_index(new, path, mode="append")
    got = _rows(_lsh().search_index(spark, path, queries))

    # signatures are deterministic in (vector, params): append ==
    # rebuild exactly, no frozen-state caveat
    full = str(tmp_path / "lsh_full")
    _lsh().write_index(old.unionByName(new), full)
    expected = _rows(_lsh().search_index(spark, full, queries))
    assert got == expected

    vs = ff.index_versions(spark, path)
    assert [v["op"] for v in vs] == ["write", "append"]


def test_lsh_append_param_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "lsh_pin")
    _lsh().write_index(vecs(spark, 0, 40), path)
    with pytest.raises(ff.InvalidParameterError, match="wrong buckets"):
        _lsh(seed=7).write_index(
            vecs(spark, 40, 60), path, mode="append"
        )
    with pytest.raises(ff.InvalidParameterError, match="no LSH meta"):
        _lsh().write_index(
            vecs(spark, 40, 60), str(tmp_path / "absent"), mode="append"
        )


def test_lsh_append_layout_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "lsh_q8")
    _lsh().write_index(vecs(spark, 0, 40), path, quantize=True)
    with pytest.raises(ff.InvalidParameterError, match="quantize=True"):
        _lsh().write_index(vecs(spark, 40, 60), path, mode="append")


# -- lifecycle on the appended ANN layout --------------------------------


def test_compact_appended_ann_index(spark, tmp_path):
    path = str(tmp_path / "ivf_acc")
    op = _ivf().fit_index(vecs(spark, 0, 120))
    op.write_index(vecs(spark, 0, 120), path)
    for lo in (120, 160, 200):
        _ivf().write_index(vecs(spark, lo, lo + 40), path, mode="append")

    queries = vecs(spark, 0, 4)
    before = _rows(_ivf().search_index(spark, path, queries))
    audit_src = ff.audit_index(spark, path)
    assert [v["op"] for v in audit_src["versions"]] == [
        "write", "append", "append", "append",
    ]

    dest = str(tmp_path / "ivf_compact")
    ff.compact_index(spark, path, dest)
    audit_dst = ff.audit_index(spark, dest)
    assert (audit_dst["datasets"]["corpus"]["n_rows"]
            == audit_src["datasets"]["corpus"]["n_rows"])
    assert (audit_dst["datasets"]["corpus"]["n_files"]
            < audit_src["datasets"]["corpus"]["n_files"])
    assert [v["op"] for v in audit_dst["versions"]] == ["compact"]

    after = _rows(_ivf().search_index(spark, dest, queries))
    assert after == before


# -- recall audit ---------------------------------------------------------


def test_recall_at_k_audit(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id bigint, neighbor_id bigint",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 20), (2, 21)],
        "query_id bigint, neighbor_id bigint",
    )
    got = {r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
           for r in ff.recall_at_k(exact, approx).collect()}
    assert got[1] == (3, 2, 2 / 3)
    assert got[2] == (2, 2, 1.0)


def test_recall_at_k_on_real_indexes(spark, tmp_path):
    corpus = vecs(spark, 0, 150)
    queries = vecs(spark, 0, 5)
    exact = ff.CosineTopK("embedding", "vec_id", k=8).search(corpus, queries)
    approx = _ivf().fit_index(corpus)
    got = ff.recall_at_k(
        exact, approx.search(corpus, queries)
    ).agg(F.avg("recall")).collect()[0][0]
    assert 0.0 < got <= 1.0
    full = ff.recall_at_k(exact, exact).agg(F.min("recall")).collect()[0][0]
    assert full == 1.0


def test_ivf_rebuild_after_drifted_appends(spark, tmp_path):
    """Appends assign against frozen centroids; rebuild_index refits
    on the stored corpus and must not lose rows, reset the versions
    log, and keep (or improve) recall on the drifted region."""
    path = str(tmp_path / "ivf_drift")
    # original fit sees only a tight region; the appended batch lives
    # far away (a different sign pattern), so frozen-centroid probes
    # resolve it poorly
    old = vecs(spark, 0, 120)
    far = spark.createDataFrame(
        [(1000 + i,
          [100.0 + float((i * 7 + j * 3) % 5) for j in range(16)])
         for i in range(80)],
        "vec_id bigint, embedding array<double>",
    )
    op = _ivf().fit_index(old)
    op.write_index(old, path)
    _ivf().write_index(far, path, mode="append")

    queries = far.limit(5)
    exact = ff.CosineTopK("embedding", "vec_id", k=5).search(
        old.unionByName(far), queries
    )
    before = ff.recall_at_k(
        exact, _ivf().search_index(spark, path, queries)
    ).agg(F.avg("recall")).collect()[0][0]

    dest = str(tmp_path / "ivf_rebuilt")
    _ivf().rebuild_index(spark, path, dest)
    after_idx = ff.audit_index(spark, dest)
    assert (after_idx["datasets"]["corpus"]["n_rows"]
            == ff.audit_index(spark, path)["datasets"]["corpus"]["n_rows"])
    assert [v["op"] for v in after_idx["versions"]] == ["write"]
    after = ff.recall_at_k(
        exact, _ivf().search_index(spark, dest, queries)
    ).agg(F.avg("recall")).collect()[0][0]
    assert after >= before


def test_ivf_rebuild_preserves_quantized_layout(spark, tmp_path):
    path = str(tmp_path / "ivf_q_src")
    op = _ivf().fit_index(vecs(spark, 0, 80))
    op.write_index(vecs(spark, 0, 80), path, quantize=True)
    dest = str(tmp_path / "ivf_q_dst")
    _ivf().rebuild_index(spark, path, dest)
    import os

    assert "c_q8" in spark.read.parquet(
        os.path.join(dest, "corpus")
    ).columns
    assert _ivf().search_index(spark, dest, vecs(spark, 0, 3)).count() > 0
