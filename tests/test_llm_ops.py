"""Tests for the LLM-data-pipeline operators (text / dedup / similarity /
multimodal) — run on tiny in-memory frames plus the sf0.001 testdata."""

import pytest

from pyspark.sql import functions as F

import feature_factory_spark as ff

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ---------------------------------------------------------------- text ----


def test_tfidf_scorer_values_and_ranking(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")], "doc_id bigint, text string"
    )
    out = ff.TfIdfScorer("text", "doc_id", k=2).transform(df)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    n = 3.0
    idf = lambda df_t: math.log((n + 1) / (df_t + 1)) + 1  # noqa: E731
    # doc 1: tf(a)=2/3 idf(a)=ln(4/3)+1, tf(b)=1/3 idf(b)=ln(4/2)+1
    assert rows[(1, "a")]["tfidf"] == pytest.approx((2 / 3) * idf(2))
    assert rows[(1, "b")]["tfidf"] == pytest.approx((1 / 3) * idf(1))
    # a's doubled tf beats b's rarity here: (2/3)(ln(4/3)+1) > (1/3)(ln2+1)
    assert rows[(1, "a")]["rank"] == 1 and rows[(1, "b")]["rank"] == 2
    # empty doc contributes no rows
    assert not any(d == 3 for d, _ in rows)
    # k bounds output per doc
    assert max(r["rank"] for r in rows.values()) <= 2


def test_tfidf_scorer_deterministic_tiebreak(spark):
    # two terms with identical tf and df -> equal score; term asc breaks it
    df = spark.createDataFrame([(1, "z y"), (2, "z y")], "doc_id bigint, text string")
    out = ff.TfIdfScorer("text", "doc_id", k=2).transform(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for pairs in by_doc.values():
        assert sorted(pairs) == [(1, "y"), (2, "z")]


def test_contamination_checker_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "something with the quick brown fox inside"),  # shares 3-gram
            (2, "completely clean document text here"),
            (3, "QUICK BROWN FOX shouting match"),  # lowercase fold -> hits
        ],
        "doc_id bigint, text string",
    )
    cc = ff.ContaminationChecker("text", "doc_id", n=3)
    cc.fit(bench)
    got = {r["doc_id"]: r["contaminated"] for r in cc.transform(corpus).collect()}
    assert got == {1: True, 2: False, 3: True}
    # filter mode drops flagged rows and adds no column
    dropped = ff.ContaminationChecker("text", "doc_id", n=3, mode="filter")
    out = dropped.fit(bench).transform(corpus)
    assert {r["doc_id"] for r in out.collect()} == {2}
    assert "contaminated" not in out.columns


def test_contamination_overlap_criterion(spark):
    # r7: fuzzy decontamination — the FRACTION of a doc's distinct
    # grams present in the benchmark must reach threshold
    bench = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # 4/4 bench grams -> ratio 1.0
            (2, "a b c x y z w q"),    # 1 of 6 grams in bench
            (3, "no shared text at all here"),  # ratio 0
            (4, "ab"),                 # too short for any 3-gram
        ],
        "doc_id bigint, text string",
    )
    cc = ff.ContaminationChecker(
        "text", "doc_id", n=3, criterion="overlap", threshold=0.5
    ).fit(bench)
    got = {r["doc_id"]: (r["contaminated"], r["contaminated_ratio"])
           for r in cc.transform(corpus).collect()}
    assert got[1] == (True, 1.0)
    assert got[2][0] is False and abs(got[2][1] - 1 / 6) < 1e-9
    assert got[3] == (False, 0.0)
    assert got[4] == (False, 0.0)
    # any-hit would flag doc 2; overlap at 0.5 must not
    any_got = {
        r["doc_id"]: r["contaminated"]
        for r in ff.ContaminationChecker("text", "doc_id", n=3)
        .fit(bench).transform(corpus).collect()
    }
    assert any_got[2] is True
    # filter mode drops only threshold-reaching docs, adds no columns
    filt = ff.ContaminationChecker(
        "text", "doc_id", n=3, criterion="overlap", threshold=0.5,
        mode="filter",
    ).fit(bench)
    out = filt.transform(corpus)
    assert {r["doc_id"] for r in out.collect()} == {2, 3, 4}
    assert "contaminated" not in out.columns
    assert "contaminated_ratio" not in out.columns


def test_contamination_checker_requires_fit(spark):
    corpus = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    with pytest.raises(ff.FitNotCalledError):
        ff.ContaminationChecker("text", "doc_id").transform(corpus)


def test_text_features(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog."), (2, ""), (3, "x")], "id bigint, t string"
    )
    out = ff.TextFeatures(["t"]).transform(df).orderBy("id").collect()
    r = out[0]
    assert r["t_n_chars"] == 20
    assert r["t_n_words"] == 5
    # 'The','the','and' are stopwords -> 3/5
    assert r["t_stopword_ratio"] == pytest.approx(0.6)
    assert r["t_punct_ratio"] == pytest.approx(1 / 20)
    empty = out[1]
    assert empty["t_n_words"] == 0 and empty["t_quality_score"] == pytest.approx(0.3)


def test_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world 42!")], "id bigint, t string")
    r = ff.TokenCount(["t"]).transform(df).collect()[0]
    assert r["t_ws_tokens"] == 3
    # hello , world 4 2 !  -> 6
    assert r["t_bpe_tokens"] == 6


def test_language_identifier(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in der schule und das ist gut"),
            (3, "qwfp zxcv"),
            (4, "你好世界 这是中文文本 你好你好"),
        ],
        "id bigint, t string",
    )
    out = {r["id"]: r["t_lang"] for r in ff.LanguageIdentifier(["t"]).transform(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"
    assert out[4] == "zh"


def test_text_cleaner(spark):
    df = spark.createDataFrame(
        [(1, "  The CAT, and the dog!!  ")], "id bigint, t string"
    )
    out = ff.TextCleaner(["t"]).transform(df).collect()[0]["t"]
    assert out == "the cat and the dog"
    out2 = (
        ff.TextCleaner(["t"], remove_stopwords=True).transform(df).collect()[0]["t"]
    )
    assert out2 == "cat dog"


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # words: 6 tokens, 2 distinct
            (2, "x y z w v u"),       # all distinct
        ],
        "id bigint, t string",
    )
    out = {r["id"]: r for r in ff.RepetitionFeatures(["t"]).transform(df).collect()}
    assert out[1]["t_dup_word_ratio"] == pytest.approx(4 / 6)
    # bigrams of doc1: 'a b','b a','a b','b a','a b' -> top 'a b' 3 of 5
    assert out[1]["t_top_bigram_ratio"] == pytest.approx(3 / 5)
    assert out[2]["t_dup_word_ratio"] == 0.0
    assert out[2]["t_top_bigram_ratio"] == pytest.approx(1 / 5)


def test_gopher_quality_filter(spark):
    good = "the quick brown fox jumps over the lazy dog " * 5  # 45 words, stopwords
    short = "too short"
    symbols = "### $$$ %%% " * 20
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "id bigint, t string"
    )
    out = ff.GopherQualityFilter("t", min_words=20, max_words=100).transform(df)
    assert [r["id"] for r in out.collect()] == [1]


def test_pii_redactor(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io, ip 10.0.0.7, call +1 (555) 010-9999 now")],
        "id bigint, t string",
    )
    out = ff.PIIRedactor(["t"]).transform(df).collect()[0]["t"]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out
    assert "@" not in out and "10.0.0.7" not in out and "555" not in out
    # selective kinds
    out2 = ff.PIIRedactor(["t"], kinds=["email"]).transform(df).collect()[0]["t"]
    assert "<EMAIL>" in out2 and "10.0.0.7" in out2


def test_document_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "id bigint, t string",
    )
    out = {r["id"]: r["t_fingerprint"] for r in ff.DocumentFingerprint(["t"]).transform(df).collect()}
    assert out[1] == out[2] != out[3]


# --------------------------------------------------------------- dedup ----


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa")], "id bigint, t string"
    )
    out = ff.ExactDeduplicator(["t"], "id").transform(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_minhash_dedup_finds_planted_pairs(docs):
    dd = ff.MinHashDeduplicator("text", "doc_id", threshold=0.5)
    pairs = dd.candidate_pairs(docs).collect()
    assert len(pairs) >= 1
    assert all(p["jaccard"] >= 0.5 for p in pairs)
    n = docs.count()
    kept = dd.transform(docs).count()
    assert kept == n - len({p["b_id"] for p in pairs})


def test_minhash_star_pairing_subset_and_same_dedup(docs):
    all_p = ff.MinHashDeduplicator(
        "text", "doc_id", threshold=0.5, bucket_pairing="all"
    )
    star = ff.MinHashDeduplicator(
        "text", "doc_id", threshold=0.5, bucket_pairing="star", policy="components"
    )
    ap = {(r["a_id"], r["b_id"]) for r in all_p.candidate_pairs(docs).collect()}
    sp = {(r["a_id"], r["b_id"]) for r in star.candidate_pairs(docs).collect()}
    assert sp <= ap
    # planted dups are pairwise clusters -> star finds the same dedup set
    assert star.transform(docs).count() == all_p.transform(docs).count()


def test_minhash_star_default_survives_mass_duplication(spark):
    """1k copies of one doc: the default (star) pairing yields exactly
    n-1 candidate pairs, not the quadratic ~n^2/2 the 'all' pairing
    would enumerate — the scale guarantee for boilerplate-heavy crawls."""
    base = "the same boilerplate paragraph repeated across the crawl corpus"
    rows = [(i, base) for i in range(1000)]
    rows.append((5000, "one genuinely distinct document about spark planning"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    dd = ff.MinHashDeduplicator("text", "doc_id", threshold=0.9)
    assert dd.bucket_pairing == "star"
    pairs = dd.candidate_pairs(df)
    # every copy pairs with the cluster min (doc 0) exactly once
    assert pairs.count() == 999
    assert pairs.agg(F.min("a_id"), F.max("a_id")).first() == (0, 0)
    kept = dd.transform(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 5000]


def test_approx_quantiles_close_to_exact(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    exact = ff.Winsorizer(["x"], 0.05, 0.95).fit(df).bounds["x"]
    approx = ff.Winsorizer(["x"], 0.05, 0.95, approx=True).fit(df).bounds["x"]
    assert approx[0] == pytest.approx(exact[0], abs=5.0)
    assert approx[1] == pytest.approx(exact[1], abs=5.0)


def test_ngram_jaccard_all_pairs_matches_minhash(docs):
    brute = ff.NGramJaccardDeduplicator("text", "doc_id", threshold=0.5, all_pairs=True)
    mh = ff.MinHashDeduplicator("text", "doc_id", threshold=0.5, bucket_pairing="all")
    bp = {(r["a_id"], r["b_id"]) for r in brute.candidate_pairs(docs).collect()}
    mp = {(r["a_id"], r["b_id"]) for r in mh.candidate_pairs(docs).collect()}
    # banding at these params has ~certain recall at j>=0.5 on planted dups
    assert bp == mp


def test_simhash_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            # same token sequence, different whitespace -> identical simhash
            (2, "the quick  brown fox jumps over   the lazy dog again and again"),
            (3, "completely unrelated words about spark query planning engines"),
        ],
        "id bigint, t string",
    )
    dd = ff.SimHashDeduplicator("t", "id", hamming_threshold=3)
    pairs = dd.candidate_pairs(df).collect()
    assert {(p["a_id"], p["b_id"]) for p in pairs} == {(1, 2)}
    assert sorted(r["id"] for r in dd.transform(df).collect()) == [1, 3]


def test_embedding_dedup_brute_vs_lsh(emb):
    brute = ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.9, method="brute")
    lsh = ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.9, method="lsh", dim=64)
    bp = {(r["a_id"], r["b_id"]) for r in brute.candidate_pairs(emb).collect()}
    lp = {(r["a_id"], r["b_id"]) for r in lsh.candidate_pairs(emb).collect()}
    assert lp <= bp  # LSH candidates are a subset, verified exactly
    if bp:
        assert len(lp) / len(bp) >= 0.8  # high recall on near-identical vectors


# ---------------------------------------------------------- similarity ----


def test_cosine_topk(emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = ff.CosineTopK("embedding", "vec_id", k=5).search(emb, queries).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_ivf_topk_finds_planted_copies(spark, emb):
    queries = emb.where(F.col("vec_id") < 3)
    copies = queries.select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies)
    ivf = ff.IVFCosineTopK("embedding", "vec_id", k=1, n_centroids=4, n_probe=1)
    out = ivf.search(corpus, queries).collect()
    top = {r["query_id"]: r["cosine"] for r in out}
    # an exact copy shares the query's cluster, so n_probe=1 must find it
    for q in (0, 1, 2):
        assert top[q] == pytest.approx(1.0)


def test_ivf_centroids_deterministic(spark, emb):
    a = ff.IVFCosineTopK("embedding", "vec_id", n_centroids=4).fit_index(emb)
    b = ff.IVFCosineTopK("embedding", "vec_id", n_centroids=4).fit_index(emb)
    assert a.centroids_ == b.centroids_
    assert len(a.centroids_) == 4
    assert all(len(c) == 64 for c in a.centroids_)


def test_bucketed_topk_recall(spark, emb):
    # plant exact copies of the queries in the corpus (ids shifted by 10000):
    # identical vectors share every signature chunk, so the bucketed search
    # MUST retrieve them as top-1 (cosine 1.0)
    queries = emb.where(F.col("vec_id") < 3)
    copies = queries.select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies)
    approx = (
        ff.BucketedCosineTopK("embedding", "vec_id", k=1, dim=64)
        .search(corpus, queries)
        .collect()
    )
    top = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in approx}
    for q in (0, 1, 2):
        nid, cos = top[q]
        assert cos == pytest.approx(1.0)


# ---------------------------------------------------------- multimodal ----


def test_binary_feature_extractor(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nrest-of-payload")), (2, bytearray(b""))],
        "id bigint, payload binary",
    )
    out = {r["id"]: r for r in ff.BinaryFeatureExtractor("payload").transform(df).collect()}
    assert out[1]["payload_payload_len"] == 23
    assert out[1]["payload_header_hex"] == b"\x89PNG\r\n\x1a\n".hex()
    assert out[1]["payload_payload_md5"] == hashlib.md5(b"\x89PNG\r\n\x1a\nrest-of-payload").hexdigest()
    assert out[2]["payload_payload_len"] == 0


def test_binary_extractor_requires_binary(spark):
    df = spark.createDataFrame([(1, "not-binary")], "id bigint, payload string")
    with pytest.raises(ff.InvalidParameterError):
        ff.BinaryFeatureExtractor("payload").transform(df)


def test_frame_sampler(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(64))))], "id bigint, payload binary"
    )
    out = ff.FrameSampler("payload", n_frames=4, frame_size=8).transform(df).collect()
    assert len(out) == 4
    assert [r["frame_index"] for r in out] == [0, 1, 2, 3]
    assert bytes(out[1]["frame_bytes"]) == bytes(range(16, 24))


def test_json_features(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, '{"tag": "y"}'), (3, None)],
        "id bigint, props string",
    )
    t = ff.JsonFeatures("props", {"k": ("$.k", "int"), "tag": ("$.tag", "string")})
    out = {r["id"]: r for r in t.transform(df).collect()}
    assert out[1]["k"] == 7 and out[1]["tag"] == "x"
    assert out[2]["k"] is None and out[2]["tag"] == "y"
    assert out[3]["k"] is None


def test_c4_filter_rules(spark):
    # r7: the public C4 cleaning heuristics (Raffel et al. 2020)
    page_good = "\n".join([
        "This is a proper sentence with enough words.",
        "Another good line follows right here!",
        "too short.",                     # < 3 words
        "No terminal punctuation here",   # dropped
        "Is this a question with words?",
        'He said "quoted ending works fine."',
        "A javascript line should be removed.",
        "Final sentence to cross the five mark.",
    ])
    rows = [
        (1, page_good),
        (2, "Lorem ipsum dolor sit amet filler text here."),
        (3, "function f() { return 1; } This page has braces here."),
        (4, "One sentence only here today."),
        (5, None),
        # r8: abbreviation periods no longer inflate the sentence count
        # (4 line-terminal sentence ends; the e.g./i.e. internal dots
        # would have pushed the old raw-punctuation count over 5)
        (6, "\n".join([
            "We use e.g. and i.e. abbreviations here today.",
            "The U.S.A. census e.g. reports figures annually.",
            "Another solid sentence sits right here!",
            "A final sentence closes the page today.",
        ])),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: (r["text_c4"], r["text_c4_keep"])
           for r in ff.C4Filter("text").transform(df).collect()}
    lines = out[1][0].split("\n")
    assert "too short." not in lines
    assert "No terminal punctuation here" not in lines
    assert all("javascript" not in ln.lower() for ln in lines)
    assert len(lines) == 5 and out[1][1] is True
    assert out[2][1] is False   # lorem ipsum page drop
    assert out[3][1] is False   # curly-brace page drop
    assert out[4][1] is False   # under the 5-sentence floor
    assert out[5] == (None, False)
    # 4 true sentence ends < 5 even though raw terminal-char count is 10
    assert out[6][1] is False
    filt = ff.C4Filter("text", mode="filter").transform(df)
    assert [r["doc_id"] for r in filt.collect()] == [1]
    assert "text_c4_keep" not in filt.columns
    # narrow plan: no shuffle, no join
    plan = (ff.C4Filter("text").transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


# --- UnicodeNormalizer (r8) -------------------------------------------

def test_unicode_normalizer_forms_and_nulls(spark):
    import unicodedata

    decomposed = "école"  # e + combining acute
    rows = [(1, decomposed), (2, "ﬁt"), (3, None), (4, "plain")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    nfc = {r["doc_id"]: r["text"]
           for r in ff.UnicodeNormalizer(["text"]).transform(df).collect()}
    assert nfc[1] == unicodedata.normalize("NFC", decomposed)
    assert len(nfc[1]) == 5  # composed
    assert nfc[2] == "ﬁt"  # NFC keeps compatibility chars
    assert nfc[3] is None and nfc[4] == "plain"
    nfkc = {r["doc_id"]: r["text"]
            for r in ff.UnicodeNormalizer(["text"], form="NFKC")
            .transform(df).collect()}
    assert nfkc[2] == "fit"  # ligature folds under NFKC
    import pytest

    with pytest.raises(Exception):
        ff.UnicodeNormalizer(["text"], form="NFX")
    with pytest.raises(Exception):
        ff.UnicodeNormalizer([])


def test_unicode_normalizer_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    out = ff.UnicodeNormalizer(["text"]).transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
