"""Regression tests for the round-2 verdict/advice findings."""

import logging

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.exceptions import InvalidParameterError


# --- column_modes folded to one aggregate (VERDICT perf item) -------------


def test_column_modes_tiebreak_and_values(spark):
    from feature_factory_spark.functions.stats import column_modes

    df = spark.createDataFrame(
        [("b", "x"), ("b", "y"), ("a", "y"), ("a", "z"), ("c", "y")],
        "u string, v string",
    )
    modes = column_modes(df, ["u", "v"])
    # u: a=2, b=2, c=1 -> tie broken by smallest value
    assert modes["u"] == "a"
    assert modes["v"] == "y"


def test_column_modes_ignores_nulls(spark):
    from feature_factory_spark.functions.stats import column_modes

    df = spark.createDataFrame(
        [(None,), (None,), (None,), ("k",), ("k",), ("m",)], "u string"
    )
    assert column_modes(df, ["u"])["u"] == "k"


# --- CosineTopK query-side guard (VERDICT wrong-item #2) ------------------


def test_cosine_topk_guards_large_query_side(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "id bigint, v array<double>"
    )
    t = ff.CosineTopK("v", "id", k=2, max_queries=4)
    with pytest.raises(InvalidParameterError, match="query side"):
        t.search(vecs, vecs)  # 8 query rows > cap 4
    # under the cap the same search runs
    out = t.search(vecs, vecs.where(F.col("id") < 3))
    assert out.count() == 6


# --- SimHash: transposed bit-sum fold + threshold-derived chunks ----------


def _simhash_docs(spark):
    # docs 0/1 differ by one word: their md5 signatures are hamming
    # distance 6 apart (measured) — found at threshold >= 6, not at 3
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " tail"),
        (2, base),  # exact dup of 0: hamming 0
        (3, "completely different content about distributed query engines"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_simhash_transposed_fold_finds_neardups(spark):
    docs = _simhash_docs(spark)
    dd = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3, hash_fn="md5")
    pairs = {(r["a_id"], r["b_id"]) for r in dd.candidate_pairs(docs).collect()}
    assert (0, 2) in pairs  # hamming 0
    assert (0, 1) not in pairs  # hamming 6 > 3
    assert not any(3 in p for p in pairs)


def test_simhash_chunks_follow_threshold(spark):
    # pigeonhole blocking must stay exact at any threshold: n_chunks = t+1
    assert ff.SimHashDeduplicator("t", "i", hamming_threshold=3).n_chunks == 4
    assert ff.SimHashDeduplicator("t", "i", hamming_threshold=7).n_chunks == 8
    dd = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=10, hash_fn="md5")
    docs = _simhash_docs(spark)
    pairs = {(r["a_id"], r["b_id"]) for r in dd.candidate_pairs(docs).collect()}
    # the hamming-6 pair is invisible at threshold 3 (previous test) but
    # must be recalled exactly once the threshold covers it
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)


# --- connected_components lineage control (VERDICT wrong-item #3) ---------


def test_connected_components_long_chain(spark):
    from feature_factory_spark.functions.graph import connected_components

    # a 25-node chain needs many propagation rounds; without lineage
    # truncation the nested plan grows superlinearly per iteration
    n = 25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id bigint, b_id bigint"
    )
    comp = connected_components(pairs, max_iterations=30)
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r["component"] for r in rows} == {0}


# --- FF_APPROX_QUANTILES switch (VERDICT next-round #6) -------------------


def test_approx_quantiles_env_switch(spark, monkeypatch):
    from feature_factory_spark.functions.stats import column_quantiles

    df = spark.range(0, 10000).select((F.col("id").cast("double")).alias("x"))
    exact = column_quantiles(df, ["x"], [0.05, 0.5, 0.95])["x"]
    monkeypatch.setenv("FF_APPROX_QUANTILES", "1")
    approx = column_quantiles(df, ["x"], [0.05, 0.5, 0.95])["x"]
    monkeypatch.delenv("FF_APPROX_QUANTILES")
    for e, a in zip(exact, approx):
        assert a == pytest.approx(e, rel=0.02, abs=10.0)


# --- JsonFeatures ANSI-safe casting (ADVICE) ------------------------------


def test_json_features_malformed_value_becomes_null(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": "abc"}'), (3, None)],
        "id bigint, props string",
    )
    out = ff.JsonFeatures("props", {"k": ("$.k", "int")}).transform(df)
    got = {r["id"]: r["k"] for r in out.collect()}
    assert got == {1: 7, 2: None, 3: None}


def test_json_features_strict_raises(spark):
    df = spark.createDataFrame([(2, '{"k": "abc"}')], "id bigint, props string")
    t = ff.JsonFeatures("props", {"k": ("$.k", "int")}, strict=True)
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|cast"):
        t.transform(df).collect()


# --- load_events config scoping (ADVICE) ----------------------------------


def test_load_events_restores_session_config(spark):
    from feature_factory_spark.sources.io import load_events

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key)
    ev = load_events(spark, "/root/testdata/sf0.001")
    assert spark.conf.get(key) == before
    # the frame still executes correctly after the flag is restored
    assert ev.count() > 0
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"


def test_load_events_micros_and_nanos_fixtures(spark, tmp_path):
    """Schema drift in the testdata (nanos -> micros in round 3) silently
    broke nine operators; pin BOTH physical encodings explicitly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from feature_factory_spark.sources.io import load_events

    ts_vals = [
        datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
        datetime.datetime(2024, 1, 1, 0, 0, 1, 654321),
        datetime.datetime(2024, 1, 2, 12, 30, 0, 7),
    ]
    for unit, sub in (("us", "micros"), ("ns", "nanos")):
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts_vals, pa.timestamp(unit)),
            }
        )
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet", coerce_timestamps=None)
        written = pq.read_schema(d / "events.parquet").field("ts").type
        assert str(written) == f"timestamp[{unit}]", written

        ev = load_events(spark, str(d))
        assert ev.schema["ts"].dataType.simpleString() == "timestamp", unit
        got = sorted(r["ts"] for r in ev.select("ts").collect())
        assert got == ts_vals, (unit, got)
        # the legacy nanos flag never leaks out of the loader
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            == "false"
        )


# --- configure_logging parity (reference src/logging.rs) ------------------


def test_configure_logging_disabled_by_default(monkeypatch):
    from feature_factory_spark.logging_config import configure_logging

    for v in (None, "", "0", "false"):
        if v is None:
            monkeypatch.delenv("DEBUG_FEATURE_FACTORY", raising=False)
        else:
            monkeypatch.setenv("DEBUG_FEATURE_FACTORY", v)
        logger = configure_logging()
        assert all(isinstance(h, logging.NullHandler) for h in logger.handlers)


def test_configure_logging_env_enables_debug(monkeypatch):
    from feature_factory_spark.logging_config import configure_logging

    monkeypatch.setenv("DEBUG_FEATURE_FACTORY", "true")
    logger = configure_logging()
    assert logger.level == logging.DEBUG
    assert any(not isinstance(h, logging.NullHandler) for h in logger.handlers)
    # explicit level overrides env
    assert configure_logging(level=logging.WARNING).level == logging.WARNING


def test_pipeline_step_timing_reaches_logger(spark, caplog, monkeypatch):
    # a prior configure_logging() call may have set propagate=False;
    # caplog captures via the root logger, so restore propagation here
    monkeypatch.setattr(
        logging.getLogger("feature_factory_spark"), "propagate", True
    )
    df = spark.createDataFrame([(1.0,), (None,)], "a double")
    with caplog.at_level(logging.INFO, logger="feature_factory_spark"):
        ff.make_pipeline(("imp", ff.MeanMedianImputer(["a"]))).fit(df).collect()
    assert any("fitted in" in r.message for r in caplog.records)


# --- round-4 review fixes -------------------------------------------------


def test_psi_and_iv_accept_non_identifier_column_names(spark):
    import feature_factory_spark as ff

    rows = [(float(i % 7), float(i % 5), 1 if i % 3 == 0 else 0) for i in range(60)]
    df = (
        spark.createDataFrame(rows, ["a", "b", "tgt"])
        .withColumnRenamed("a", "total sales")
        .withColumnRenamed("b", "a-b")
    )
    sel = ff.SelectByInformationValue("tgt", threshold=0.0)
    sel.fit(df)
    assert set(sel.iv_values_) == {"total sales", "a-b"}

    ref = df.select("total sales", "a-b")
    psi = ff.DropHighPSIFeatures(ref, threshold=0.25)
    psi.fit(df.select("total sales", "a-b"))
    assert set(psi.psi_values_) == {"total sales", "a-b"}


def test_asof_bucketed_matches_default_with_null_keys(spark):
    import datetime as dt

    import feature_factory_spark as ff

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", t(0), 1.0), (None, t(2), 5.0), (None, t(40), 6.0)],
        "k string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", t(5), 1), (None, t(3), 2), (None, t(55), 3)],
        "k string, ts timestamp, qty int",
    )
    kw = dict(on=["k"], ts_col="ts", value_cols=["px"])
    base = {
        r["qty"]: r["px"]
        for r in ff.AsOfJoiner(quotes, **kw).transform(trades).collect()
    }
    bucketed = {
        r["qty"]: r["px"]
        for r in ff.AsOfJoiner(quotes, time_bucket_seconds=300.0, **kw)
        .transform(trades)
        .collect()
    }
    # NULL keys join each other (window semantics), incl. the carry from
    # an earlier bucket for qty=3
    assert base == bucketed == {1: 1.0, 2: 5.0, 3: 6.0}


def test_streaming_simhash_preserves_user_hs_column(spark):
    from feature_factory_spark.streaming import StreamingDeduplicator

    df = spark.createDataFrame(
        [(1, "some text body", "keep-me"), (2, "other words entirely", "me-too")],
        "doc_id bigint, text string, hs string",
    )
    out = StreamingDeduplicator(["text"], "doc_id", key="simhash").transform(df)
    assert set(out.columns) == {"doc_id", "text", "hs"}
    assert {r["hs"] for r in out.collect()} == {"keep-me", "me-too"}


def test_document_chunker_null_and_blank_text_yield_no_chunks(spark):
    import feature_factory_spark as ff

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "real words here")],
        "doc_id bigint, text string",
    )
    out = ff.DocumentChunker("text", chunk_size=2).transform(df).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert all(r["chunk_n_words"] >= 1 for r in out)


def test_lloyd_fit_tolerates_null_and_ragged_vectors(spark):
    from feature_factory_spark.operators.similarity import lloyd_fit

    rows = [(i, [float(i % 5) + 1.0, float(i % 3) + 1.0]) for i in range(20)]
    rows.append((100, None))              # NULL vector: ignored
    rows.append((101, [1.0, 2.0, 9.9]))   # ragged: extra dim ignored
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = lloyd_fit(df, "embedding", "vec_id", k=2, iterations=2)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)
    assert all(all(x == x for x in c) for c in cents)  # no NaNs


def test_cosine_zero_norm_vector_is_max_distant_not_crash(spark):
    import feature_factory_spark as ff

    rows = [
        (0, [0.0, 0.0]),         # zero norm: must not abort the job
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = ff.CosineTopK("embedding", "vec_id", k=2).search(
        df, df.where(F.col("vec_id") == 1)
    ).collect()
    got = {r["neighbor_id"]: r["cosine"] for r in out}
    # the zero vector is EXCLUDED (NULL cosine, no fabricated score);
    # real neighbors fill the top-k
    assert set(got) == {2, 3}
    assert all(v is not None for v in got.values())
    # a zero-norm QUERY returns no neighbors instead of crashing
    zq = ff.CosineTopK("embedding", "vec_id", k=2).search(
        df, df.where(F.col("vec_id") == 0)
    )
    assert zq.count() == 0
    from feature_factory_spark.operators.similarity import lloyd_fit

    cents = lloyd_fit(df, "embedding", "vec_id", k=2, iterations=2)
    assert len(cents) == 2 and all(all(x == x for x in c) for c in cents)


def test_csv_reader_accepts_header_override(spark, tmp_path):
    from feature_factory_spark.sources import read

    p = str(tmp_path / "nohead.csv")
    with open(p, "w") as f:
        f.write("1,alpha\n2,beta\n")
    df = read(spark, p, header=False, inferSchema=False)
    assert df.count() == 2 and len(df.columns) == 2


def test_read_dispatches_with_trailing_slash(spark, tmp_path):
    from feature_factory_spark.sources import read

    d = str(tmp_path / "events.parquet")
    spark.range(5).write.parquet(d)
    assert read(spark, d + "/").count() == 5


def test_fitted_state_round_trips_decimal_values(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.50"),), (None,)],
        "x decimal(10,2)",
    )
    imp = ff.MeanMedianImputer(["x"]).fit(df)
    path = str(tmp_path / "state.json")
    imp.save_state(path)
    restored = ff.MeanMedianImputer(["x"]).load_state(path)
    # the fitted mapping must SURVIVE serialization — a dropped mapping
    # would silently make transform a no-op
    assert restored.impute_values and restored.impute_values["x"] == 2.0
    out = restored.transform(df)
    assert out.where(F.col("x").isNull()).count() == 0


def test_pipeline_refit_releases_previous_persist(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None)], "id bigint, x double")
    p = ff.Pipeline(
        [("imp", ff.MeanMedianImputer(["x"]))], cache_intermediate=True
    )
    p.fit(df)
    first = p._persisted[0]
    p.fit(df)  # refit must release the first fit's pinned frame
    assert first.storageLevel.useMemory is False
    p.unpersist()


def test_connected_components_raises_when_unconverged(spark):
    # the iteration cap is a contract of the DISTRIBUTED propagation
    # loop; the r13 small-graph union-find fallback always converges,
    # so force the distributed path by zeroing its gate
    from feature_factory_spark.exceptions import FeatureFactoryError
    from feature_factory_spark.functions import graph
    from feature_factory_spark.functions.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "a_id bigint, b_id bigint"
    )
    cap = graph._DRIVER_EDGE_CAP
    graph._DRIVER_EDGE_CAP = 0
    try:
        with pytest.raises(FeatureFactoryError, match="converge"):
            connected_components(pairs, max_iterations=3)
    finally:
        graph._DRIVER_EDGE_CAP = cap


def test_column_modes_rejects_numeric_columns(spark):
    from feature_factory_spark.functions.stats import column_modes

    df = spark.createDataFrame([(9,), (9,), (10,), (10,)], "n int")
    with pytest.raises(InvalidParameterError):
        column_modes(df, ["n"])
