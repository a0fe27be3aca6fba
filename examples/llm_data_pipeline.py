"""LLM training-data pipeline — curation end to end.

Shows the beyond-reference surface on the synthetic documents and
embeddings tables, in the order a real corpus-curation run executes:

  raw-crawl ingestion (WARC records -> URL dedup -> HTML -> text) ->
  C4 line/page cleaning -> language ID (char-n-gram model) ->
  model-based quality scoring + fuzzy benchmark decontamination ->
  exact dedup -> MinHash near-dedup (transitive clustering) ->
  boilerplate removal -> bigram-LM junk scoring -> semantic dedup over
  embeddings -> BPE tokenization (token-ID export + tokenizer files) +
  sequence packing -> source mixture assembly -> similarity search ->
  multimodal decode (PNG/JPEG, WAV/MP3 probes)

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        # the walkthrough caches several corpus frames (dedup state,
        # LM vocab, topic clusters); the 1g default heap is tight
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"documents: {docs.count()}")

    # 0. raw-crawl entry point: a real run starts from WARC archives
    #    (CommonCrawl layout), not a parquet table — read_warc explodes
    #    each archive into records (narrow per-file map), and
    #    HtmlTextExtractor turns 200/text-html payloads into text with
    #    boilerplate metrics. Demonstrated on a synthesized crawl.
    import tempfile

    from feature_factory_spark.sources import (
        make_http_response, make_warc, read_warc,
    )

    crawl_dir = tempfile.mkdtemp(prefix="crawl_")
    sample_rows = docs.select("doc_id", "text").limit(50).collect()
    recs = [
        {"payload": make_http_response(
            b"<html><body><h1>Page</h1><p>"
            + r["text"].encode()[:400]
            + b'.</p><a href="/next">next</a></body></html>'),
         "target_uri": f"http://example.org/{r['doc_id']}",
         "warc_type": "response"}
        for r in sample_rows
    ]
    with open(os.path.join(crawl_dir, "crawl.warc.gz"), "wb") as f:
        f.write(make_warc(recs, gzip_per_record=True))
    pages = (
        read_warc(spark, crawl_dir)
        .where((F.col("http_status") == 200)
               & F.col("http_content_type").startswith("text/html"))
        .select("target_uri", F.col("payload").cast("string").alias("page"))
    )
    # URL-level dedup BEFORE content work: the same page fetched under
    # tracking-param / case / port variants collapses to one candidate
    pages = ff.UrlDeduplicator("target_uri", "target_uri").transform(pages)
    extracted = ff.HtmlTextExtractor(["page"]).transform(pages)
    # between tag-strip and C4 (r9): MAIN-CONTENT extraction — jusText-
    # style block text-density segmentation cuts the nav/footer/link-
    # farm boilerplate a plain tag strip keeps; page_main_text +
    # page_boilerplate_ratio feed the gate below
    extracted = ff.MainContentExtractor(["page"]).transform(extracted)
    # encoding hygiene straight after extraction: mojibake repair, NBSP,
    # control-char strip — before any tokenization sees the text
    extracted = ff.EncodingFixer(["page_html_text"]).transform(extracted)
    # C4 line/page heuristics straight after extraction: terminal-
    # punctuation + min-words line filter, lorem-ipsum / brace /
    # sentence-floor page drops (min_sentences=1 on these short pages)
    extracted = ff.C4Filter("page_html_text", min_sentences=1).transform(extracted)
    n_pages = extracted.count()
    n_texty = extracted.where(
        (F.col("page_text_ratio") > 0.3) & F.col("page_html_text_c4_keep")
    ).count()
    print(f"crawl records -> pages: {n_pages}, past boilerplate+C4 gate: {n_texty}")

    # 0b. the CHEAPER entry point (r8): WET — CommonCrawl's
    #     pre-extracted plain text. Skips the HTML-extraction stage
    #     entirely; read_warc(kind='wet') yields (uri, text) straight
    #     into dedup/quality. Most curation pipelines start here.
    from feature_factory_spark.sources import make_wet

    wet_dir = tempfile.mkdtemp(prefix="wet_")
    with open(os.path.join(wet_dir, "crawl.warc.wet.gz"), "wb") as f:
        f.write(make_wet(
            [{"text": r["text"], "target_uri": f"http://example.org/{r['doc_id']}"}
             for r in sample_rows],
            gzip_per_record=True,
        ))
    wet_docs = read_warc(spark, wet_dir, kind="wet")
    wet_ready = ff.ExactDeduplicator(["text"], "record_id").transform(
        ff.EncodingFixer(["text"]).transform(wet_docs)
    )
    print(f"WET records ready for curation: {wet_ready.count()}")

    # 1. language ID with the fitted 30-language char-n-gram model,
    #    then model-based quality scoring: GopherQualityFilter's rules
    #    weak-label a logistic regression over the text statistics, and
    #    the continuous P(quality) ranks the gray zone the rules can't
    lang = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)
    scored = lang.transform(docs)
    qs = ff.QualityScorer("text").fit(scored)
    scored = qs.transform(scored)
    # fuzzy benchmark decontamination: drop docs whose distinct-gram
    # overlap with the eval set reaches 80% (criterion='overlap' is
    # robust to a single coincidental phrase; 'any' is the strict rule)
    bench = docs.where(F.col("doc_id") < 20)
    decon = ff.ContaminationChecker(
        "text", "doc_id", n=5, criterion="overlap", threshold=0.8,
        mode="filter",
    ).fit(bench)
    scored = decon.transform(scored)
    kept = scored.where(F.col("text_quality_prob") > 0.5)
    print(f"pass quality+decontamination gate: {kept.count()}")

    # 2. exact dedup, then MinHash near-dedup with transitive clustering
    exact = ff.ExactDeduplicator(["text"], "doc_id", normalize=True)
    deduped = exact.transform(kept)
    near = ff.MinHashDeduplicator(
        "text", "doc_id", threshold=0.5, policy="components"
    )
    final = near.transform(deduped)
    # span-level (r9): cut duplicated PASSAGES (quoted licenses,
    # syndicated paragraphs) that whole-document dedup misses, keeping
    # the corpus-wide first occurrence — the Lee et al. 2021 remedy
    final = ff.ExactSubstringDeduplicator(
        "text", "doc_id"
    ).remove_spans(final)
    # materialize between major stages: six fitted operators deep, the
    # accumulated plan is large; a real run writes intermediate parquet
    # here (localCheckpoint is the in-session equivalent) so downstream
    # stages plan against a flat scan instead of the whole lineage
    final = final.localCheckpoint()
    print(f"after dedup: {final.count()}")

    # 3. corpus-level cleaning + scoring: boilerplate segment removal
    #    and an interpolated bigram-LM junk score fitted on the
    #    surviving corpus (word order matters: templated/shuffled text
    #    scores low even with natural word frequencies)
    cleaned = ff.LineDeduplicator(
        "doc_id", "text", sep=" ", min_doc_fraction=0.8
    ).transform(final)
    lm = ff.BigramLogProbScorer("text", "doc_id").fit(cleaned)
    cleaned = lm.transform(cleaned)
    cleaned.select("doc_id", "text_removed_segments", "text_bigram_logprob") \
        .orderBy("text_bigram_logprob").show(5)

    # 3b. tokenizer prep: BPE merges over the cleaned corpus, true
    #     subword token counts, and context-window packing by them
    # tokenize the deduped corpus (at this toy SF the boilerplate
    # pass above strips nearly everything — the templated synthetic
    # docs ARE boilerplate — so the tokenizer stage reads the
    # pre-line-dedup frame)
    bpe = ff.BpeVocabBuilder(
        "text", "doc_id", num_merges=32, max_words=5000
    ).fit(final)
    counted = bpe.transform(final)
    # training-ready ids + the standard interchange export
    with_ids = bpe.encode_ids(final.select("doc_id", "text").limit(5))
    with_ids.select("doc_id", F.slice("text_bpe_ids", 1, 12)).show(3, False)
    tok_dir = tempfile.mkdtemp(prefix="tokenizer_")
    bpe.save_tokenizer(tok_dir)
    print(f"tokenizer exported: {sorted(os.listdir(tok_dir))}")
    packed = ff.SequencePacker(
        "text_bpe_token_count", budget=512, order_col="doc_id",
        partition_cols=["source"],
    ).transform(counted)
    packed.groupBy("pack_id").count().orderBy("pack_id").show(5)

    # 3b'. (r12/r13) the FINAL training-shard rows: one row per pack
    #      with the concatenated input_ids, doc_ids/doc_lens
    #      boundaries for document-causal masking, and an EOS
    #      separator between documents COUNTED in the pack budget —
    #      the published packed-sequence format a data loader reads
    sample = final.select("doc_id", "source", "text").limit(50)
    with_seq = bpe.encode_ids(sample).withColumn(
        "n_tokens", F.size("text_bpe_ids").cast("bigint")
    )
    eos_id = bpe.vocabulary().count()  # first free id as the control id
    shards = ff.SequencePacker(
        "n_tokens", budget=512, order_col="doc_id",
        partition_cols=["source"],
    ).materialize(with_seq, "text_bpe_ids", sep_id=int(eos_id))
    shards.select(
        "pack_id", "n_docs", "n_tokens", F.slice("input_ids", 1, 8),
        "doc_lens",
    ).show(3, False)

    # 3c. the second tokenizer family (r9): a SentencePiece-style
    #     unigram-LM model over the same corpus — Viterbi segmentation,
    #     U+2581 word markers, spm .vocab text export
    uni = ff.UnigramVocabBuilder(
        "text", "doc_id", vocab_size=200, seed_size=800, max_words=5000
    ).fit(final)
    uni_ids = uni.encode_ids(final.select("doc_id", "text").limit(3))
    uni.decode_ids(uni_ids).select(
        "doc_id", F.slice("text_unigram_ids", 1, 8), "text_unigram_ids_text"
    ).show(3, False)
    uni.save_tokenizer(tempfile.mkdtemp(prefix="unigram_"))

    # 4. semantic dedup + similarity search + topic bucketing over
    #    embeddings (SemDeDup: k-means blocking, within-cluster LSH,
    #    exact-cosine verify — never all-pairs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem = ff.SemanticDeduplicator(
        "embedding", "vec_id", threshold=0.95, k=4, dim=64
    ).fit(emb)
    sem_kept = sem.transform(emb)
    print(f"after semantic dedup: {sem_kept.count()} / {emb.count()}")
    queries = emb.where(F.col("vec_id") < 3)
    topk = ff.CosineTopK("embedding", "vec_id", k=3).search(emb, queries)
    topk.show()
    clustered = (
        ff.KMeansClusterer("embedding", "vec_id", k=4, iterations=2)
        .fit(emb).transform(emb)
    )
    clustered.groupBy("cluster").count().orderBy("cluster").show()

    # 5. assemble the final mixture: target weights over sources,
    #    rates derived from measured availability (scarce high-weight
    #    sources replicate whole copies + a hash-sampled fraction)
    mixer = ff.SourceMixer(
        "doc_id", "source",
        weights={"src0": 3.0, "src1": 1.0, "src2": 1.0},
        budget_rows=200, allow_oversample=True,
    ).fit(counted)
    mixture = mixer.transform(counted)
    mixture.groupBy("source").count().orderBy("source").show()
    # 5b. temperature rebalance (r9): the multilingual recipe — rates
    #     from measured sizes, p ∝ size^alpha, no weight table to
    #     maintain; here over the detected-language column
    lang_mix = ff.SourceMixer(
        "doc_id", "text_lang", alpha=0.5
    ).fit(scored)
    print("temperature rates per language:",
          {k: round(v, 3) for k, v in sorted(lang_mix.rates_.items())[:5]})

    # 6. multimodal: decode image payloads (REAL pure-stdlib PNG/BMP/PPM
    #    decoding) and filter on the decoded features — blank/low-entropy
    #    screenshots are the image-side analogue of boilerplate text
    from feature_factory_spark.operators import image_decoder, image_schema, solid_png

    def synth(batches):
        for pdf in batches:
            pdf["img"] = [
                solid_png(int(i) % 7 + 2, int(i) % 5 + 2, int(i) % 256)
                for i in pdf["doc_id"]
            ]
            yield pdf

    with_img = docs.select("doc_id").limit(200).mapInPandas(
        synth, "doc_id bigint, img binary"
    )
    decoded = ff.BinaryFeatureExtractor(
        "img", decoder=image_decoder, feature_schema=image_schema()
    ).transform(with_img)
    low_info = decoded.where(F.col("img_entropy") < 0.5)
    print(f"low-entropy images: {low_info.count()} / {decoded.count()}")

    # 6b. perceptual near-dup over the same images (hash once, dedup
    #     cheap): the pair stage sees only 8-byte signatures
    hashed = ff.ImageHasher("img").transform(with_img)
    img_kept = ff.ImageDeduplicator(
        "doc_id", hash_col="img_dhash", hamming_threshold=2
    ).transform(hashed)
    print(f"images after near-dup: {img_kept.count()} / {decoded.count()}")

    # 7. CCNet-style perplexity bucketing: cutpoints over the bigram
    #    score, head/middle/tail labels drive bucket-aware sampling
    buckets = ff.PerplexityBucketer("text_bigram_logprob").fit(cleaned)
    bucketed = buckets.transform(cleaned)
    bucketed.groupBy("text_bigram_logprob_bucket").count().show()

    # 7b. the stage-boundary gate: before anything ships, assert the
    #     corpus still looks like a corpus — one aggregate job for the
    #     whole check list, fail-loud on violation
    gate = ff.ExpectationValidator([
        ("row_count_between", "rows", 1, 10_000_000),
        ("unique", "doc_id_unique", "doc_id"),
        ("not_null_ratio_at_least", "text_not_null", "text", 0.99),
    ])
    gate.enforce(cleaned)
    print("expectations gate: all checks passed")

    # 8. snapshot bookkeeping for the NEXT crawl: diff this corpus
    #    against a simulated recrawl — only added/changed rows need
    #    re-decoding/re-scoring; removed ids leave the index
    from feature_factory_spark.operators.diff import corpus_diff

    recrawl = docs.where(F.col("doc_id") % 2 == 0)
    diff = corpus_diff(docs, recrawl, "doc_id", ["text"])
    diff.groupBy("status").count().orderBy("status").show()

    # 9. (r10) cross-modal survivorship: the text near-dup pairs and
    #    the image perceptual pairs describe the SAME pages — union
    #    them and keep one survivor per transitive multi-signal cluster
    #    instead of deduping each modality in isolation
    text_pairs = near.candidate_pairs(kept).select("a_id", "b_id")
    img_pairs = ff.ImageDeduplicator(
        "doc_id", hash_col="img_dhash", hamming_threshold=2
    ).candidate_pairs(hashed).select("a_id", "b_id")
    xmodal = ff.CrossModalDeduplicator(
        "doc_id", {"text": text_pairs, "image": img_pairs}
    )
    page_survivors = xmodal.transform(docs)
    print(f"cross-modal survivors: {page_survivors.count()} / {docs.count()}")

    # 10. (r10) one-call preset stacks + the shipping data card: the
    #     hand-built chain above, as the packaged recipes
    gq = ff.presets.gopher_pipeline("text", "doc_id").fit(docs)
    print(f"gopher preset survivors: {gq.count()}")
    card = ff.corpus_report(docs, ["source", "lang"], ["n_chars"])
    card.orderBy("source", "lang", "metric").show(12, truncate=False)

    # 10b. (r10) the crawl opt-out triad: robots.txt rules per domain,
    #      the X-Robots-Tag header (a read_warc column), and the
    #      page-level meta directive — honored BEFORE content work
    robots = spark.createDataFrame(
        [("example.org", "User-agent: *\nDisallow: /private/")],
        "domain string, robots_txt string",
    )
    from feature_factory_spark.operators.web import RobotsTxtFilter

    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://example.org/"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("private/"))
            .otherwise(F.lit("page/")),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    allowed = RobotsTxtFilter("url", mode="filter").fit_robots(
        robots
    ).transform(urls)
    print(f"robots.txt allowed: {allowed.count()} / {urls.count()}")

    # 11. (r10) tokenizer interchange both ways: export the fitted BPE
    #     as HuggingFace tokenizer.json, then APPLY it from the file in
    #     a fresh process/engine without refitting
    tj = os.path.join(tok_dir, "tokenizer.json")
    bpe.export_tokenizer_json(tj)
    applied = ff.BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        tj, spark
    )
    re_ids = applied.encode_ids(cleaned.limit(50))
    print(f"tokenizer.json round-trip encoded: {re_ids.count()} docs")

    # 12. (r11) self-contained embeddings: hashed TF-IDF vectors from
    #     the raw text — semantic dedup and ANN with NO external model
    vec = ff.HashedTfIdfVectorizer("text", n_features=128).fit(docs)
    embedded = vec.transform(docs)
    text_sem = ff.SemanticDeduplicator(
        "text_tfidf", "doc_id", threshold=0.9, k=4, dim=128
    ).fit(embedded)
    print(f"tfidf semantic dedup survivors: "
          f"{text_sem.transform(embedded).count()} / {docs.count()}")

    # 12b. (r13) the published LM quality gate, runnable verbatim:
    #      a KenLM/ARPA model (here a small deterministic fixture —
    #      real CCNet models load unchanged) scores every document
    #      with exact Katz back-off, line-level like cc_net, and the
    #      CCNet preset buckets head/middle/tail on the score
    arpa_path = os.path.join(tempfile.mkdtemp(prefix="arpa_"), "m.arpa")
    arpa_words = ["table", "query", "value", "scan", "fast", "row"]
    l1 = ["-2.5\t<unk>\t-0.4", "-1.5\t<s>\t-0.3", "-1.6\t</s>"] + [
        f"-{1.0 + 0.01 * i:.2f}\t{w}\t-0.2"
        for i, w in enumerate(arpa_words)
    ]
    l2 = [f"-0.5\t{a} {b}" for a in arpa_words[:3]
          for b in arpa_words[:3]]
    open(arpa_path, "w").write(
        "\\data\\\nngram 1=%d\nngram 2=%d\n\n\\1-grams:\n%s\n\n"
        "\\2-grams:\n%s\n\n\\end\\\n"
        % (len(l1), len(l2), "\n".join(l1), "\n".join(l2))
    )
    ccnet = ff.presets.ccnet_pipeline(spark, arpa_path)
    gated = ccnet.fit(docs.select("doc_id", "text"))
    gated.groupBy("text_arpa_logprob_bucket").count() \
        .orderBy("text_arpa_logprob_bucket").show()

    # 13. (r11) DSIR importance resampling: score every raw document
    #     by target-likeness (hashed n-gram models), then resample via
    #     the deterministic Gumbel key — the published data-selection
    #     recipe, here with src0 standing in for the quality target
    dsir = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=2048)
    dsir.fit_target(docs.where(F.col("source") == "src0"))
    dsir.fit(docs)
    # (r12) the published SELECTION step: Gumbel-top-k at a rate as a
    # quantile threshold — one aggregate + a narrow filter, no sort
    kept = dsir.select(docs, rate=0.25)
    print(f"DSIR select(rate=0.25): {kept.count()} docs kept")
    # (r13) stratified absolute counts: ~n docs PER SOURCE via
    # per-group rates from one count aggregate — 'k docs per language'
    per_src = dsir.select(docs, n=5, by=["source"])
    per_src.groupBy("source").count().orderBy("source").show(5)

    # 14. (r11) the shipping audit: run the cleaning stack through the
    #     keep/drop ledger — every input doc attributed to the stage
    #     that killed it, melted to the per-stage funnel
    pipe = ff.presets.gopher_pipeline("text", "doc_id")
    final, ledger = ff.curation_ledger(docs, pipe, "doc_id")
    funnel = ff.curation_funnel(
        ledger, stages=[n for n, _ in pipe.steps]
    )
    funnel.orderBy("stage_index").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
