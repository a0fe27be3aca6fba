"""Scale sanity: grow the input 10x and check wall time grows ~linearly,
not quadratically, for the operators whose scale story depends on plan
shape rather than constants:

- minhash:  banded-LSH candidate generation over a near-dup-heavy corpus
  (copies of one base doc form a near-dup cluster).
- asof:     AsOfJoiner's time-bucketed hot-key mode — 90% of all events
  on ONE user key, so the default per-key window would serialize onto a
  single reducer; the bucketed carry-in plan must stay ~linear.
- contamination: ContaminationChecker's broadcast gram-hash probe — the
  benchmark side is fixed, the corpus grows 10x; the probe must scale
  with the corpus scan (no corpus shuffle).
- substring: ExactSubstringDeduplicator's duplicated-window groupBy —
  the corpus-token-sized shuffle exact-substring dedup inherently pays
  must stay ~linear in the corpus.
- ivfprune: IVFCosineTopK.search_index physical partition pruning — the
  files actually read from the cluster-partitioned index must SHRINK
  with n_probe (fixed corpus; this is a plan-shape check, not a growth
  check).
- langid: NgramLanguageIdentifier.transform — the explode -> broadcast
  profile join -> per-doc aggregate must stay ~linear in the corpus
  (the profile side is fixed at |langs| x top_k).
- quality: QualityScorer.fit at 10x the corpus — the feature pass is
  corpus-sized but the collected design matrix is capped at
  max_fit_rows, so fit wall time must grow FAR slower than the corpus
  (the capped-collect scale story: at 100 TB the fit costs one scan +
  a constant-size solve).
- semdedup: SemanticDeduplicator.candidate_pairs at 10x embeddings —
  the pair join is double-bucketed (k-means cluster AND LSH chunk);
  rotation copies keep the pair OUTPUT flat so the ratio isolates the
  join/scan cost (never an all-pairs term).
- bigram: BigramLogProbScorer.transform at 10x docs — fit once, the
  transform's two model-side key joins are fixed frames, so wall must
  track the corpus scan.

Observed on local[32] at sf0.1 (see BASELINE.md §'Scale sanity' for the
per-round recorded numbers).

Usage: python scripts/scale_sanity.py [copies] [check ...]
       (ALL checks in CHECKS run by default — see the CHECKS dict;
        r10 adds crossmodal (union-pair connected components) and
        corpusreport (one-aggregate data card); r11 adds tfidf
        (hashed TF-IDF fit/transform), dsir (importance-resampling
        fit+score), and pairscore (pair cosine gate))
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def grow_docs(docs, copies: int):
    big = docs
    for i in range(1, copies):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + i * 100000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" uniquesuffix{i}word{i}tail{i}")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = big.repartition(64).persist()
    big.count()
    return big


def check_minhash(spark, copies: int) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    big = grow_docs(docs, copies)
    dd = ff.MinHashDeduplicator("text", "doc_id", threshold=0.5)
    t0 = time.perf_counter()
    c1 = dd.candidate_pairs(docs).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = dd.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"[minhash] 1x:  {n} docs, {c1} pairs, {t1:.1f}s")
    print(
        f"[minhash] {copies}x: {n * copies} docs, {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x data)"
    )
    big.unpersist()


def _hot_events(spark, copies: int):
    """events with 90% of rows forced onto ONE user key, replicated
    ``copies`` times with distinct event ids (same time range, so the
    per-(key, bucket) row count — the skew driver — grows ~copies x)."""
    from feature_factory_spark.sources.io import load_events

    ev = load_events(spark, SF_DIR).select(
        "event_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "ts",
        "event_type",
        "value",
    )
    out = ev
    for i in range(1, copies):
        out = out.unionByName(
            ev.withColumn("event_id", F.col("event_id") + i * 10_000_000)
        )
    out = out.repartition(64).persist()
    out.count()
    return out


def check_asof(spark, copies: int) -> None:
    one = _hot_events(spark, 1)
    big = _hot_events(spark, copies)

    def run(ev):
        left = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        right = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        j = ff.AsOfJoiner(
            right, on=["user_id"], ts_col="ts", time_bucket_seconds=3600
        )
        t0 = time.perf_counter()
        n = j.transform(left).count()
        return n, time.perf_counter() - t0

    n1, t1 = run(one)
    nN, tN = run(big)
    print(f"[asof-hotkey] 1x:  {n1} joined rows, {t1:.1f}s")
    print(
        f"[asof-hotkey] {copies}x: {nN} joined rows, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x data)"
    )
    one.unpersist()
    big.unpersist()


def check_contamination(spark, copies: int) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.where(F.col("doc_id") < 200)
    big = grow_docs(docs, copies)
    cc = ff.ContaminationChecker("text", "doc_id", n=3).fit(bench)

    t0 = time.perf_counter()
    c1 = cc.transform(docs).where(F.col("contaminated")).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = cc.transform(big).where(F.col("contaminated")).count()
    tN = time.perf_counter() - t0
    print(f"[contamination] 1x:  {c1} flagged, {t1:.1f}s")
    print(
        f"[contamination] {copies}x: {cN} flagged, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus, fixed benchmark)"
    )
    big.unpersist()


def check_substring(spark, copies: int) -> None:
    """ExactSubstringDeduplicator: the duplicated-window groupBy is the
    corpus-token-sized shuffle exact-substring dedup inherently pays;
    the check pins that it stays LINEAR (the near-dup suffix per copy
    keeps window hashes mostly distinct, like real corpora)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = grow_docs(docs, copies)
    op = ff.ExactSubstringDeduplicator("text", "doc_id", k=8, min_docs=2)

    t0 = time.perf_counter()
    s1 = op.spans(docs).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    sN = op.spans(big).count()
    tN = time.perf_counter() - t0
    print(f"[substring] 1x:  {s1} spans, {t1:.1f}s")
    print(
        f"[substring] {copies}x: {sN} spans, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    big.unpersist()


def _scanned_files(df) -> int:
    """Files actually read by the (executed) frame's parquet scans —
    collect() first so the AQE final plan exists, then walk the final
    plan (descending through AdaptiveSparkPlan / QueryStage wrappers,
    which hide the scans from collectLeaves) and sum the scan nodes'
    numFiles metric."""
    total = [0]

    def walk(node):
        name = node.nodeName()
        if "QueryStage" in name or name == "AdaptiveSparkPlan":
            walk(node.plan() if "QueryStage" in name else node.executedPlan())
            return
        if name.startswith("Scan parquet"):
            m = node.metrics()
            if m.contains("numFiles"):
                total[0] += int(m.apply("numFiles").value())
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return total[0]


def check_ivfprune(spark, copies: int) -> None:
    import tempfile

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ivf")
        ff.IVFCosineTopK(
            "embedding", "vec_id", k=5, n_centroids=16, n_probe=2
        ).write_index(emb, path)
        results = {}
        for n_probe in (2, 16):
            op = ff.IVFCosineTopK(
                "embedding", "vec_id", k=5, n_centroids=16, n_probe=n_probe
            )
            out = op.search_index(spark, path, queries)
            out.collect()  # executes; AQE final plan now inspectable
            results[n_probe] = _scanned_files(out)
        print(
            f"[ivfprune] files read: n_probe=2 -> {results[2]}, "
            f"n_probe=16 -> {results[16]} "
            f"({'PRUNED' if results[2] < results[16] else 'NOT PRUNED'})"
        )
        assert results[2] < results[16], (
            "partition pruning regressed: low-n_probe search read as "
            "many index files as the full probe"
        )


def check_langid(spark, copies: int) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # grow_docs(_, 1) so BOTH sides run repartitioned(64)+persisted —
    # the raw one-file parquet read would run the 1x explode on a
    # single partition and fake a sublinear ratio
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    op = ff.NgramLanguageIdentifier("text", "doc_id").fit_default(spark)

    # warm the plan once untimed: at this corpus size a first run is
    # dominated by codegen compilation, which would land entirely on
    # the 1x measurement
    op.transform(one).where(F.col("text_lang") != "und").count()
    t0 = time.perf_counter()
    c1 = op.transform(one).where(F.col("text_lang") != "und").count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.transform(big).where(F.col("text_lang") != "und").count()
    tN = time.perf_counter() - t0
    print(f"[langid] 1x:  {c1} labeled, {t1:.1f}s")
    print(
        f"[langid] {copies}x: {cN} labeled, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    op.release()
    one.unpersist()
    big.unpersist()


def check_pca(spark, copies: int) -> None:
    # PCAProjection.fit is one narrow moment-partial pass + a bounded
    # groupBy (dim^2 + dim + 1 rows to the driver): wall must track the
    # scan, never the shuffle
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    base = emb.select("vec_id", "embedding")

    def grown(k: int):
        big = base
        for i in range(1, k):
            big = big.unionByName(
                base.select(
                    (F.col("vec_id") + i * 100000).alias("vec_id"),
                    "embedding",
                )
            )
        big = big.repartition(64).persist()
        big.count()
        return big

    one, big = grown(1), grown(copies)
    op = ff.PCAProjection("embedding", dim=64, k=8)
    op.fit(one)  # warm plans
    t0 = time.perf_counter()
    op.fit(one)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    op.fit(big)
    tN = time.perf_counter() - t0
    print(f"[pca] 1x:  fit {t1:.1f}s")
    print(
        f"[pca] {copies}x: fit {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x vectors; the reduce "
        f"is a fixed {64 * 64 + 64 + 1}-row collect at every scale)"
    )
    one.unpersist()
    big.unpersist()


def check_maincontent(spark, copies: int) -> None:
    # MainContentExtractor is one narrow projection (block split +
    # higher-order array functions, no shuffle): wall must track the
    # page bytes ~linearly
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    nav = (
        '<nav><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact</a></nav><div><p>It is the case that '
    )
    post = '</p></div><footer><a href="/p">Privacy</a> legal</footer>'
    op = ff.MainContentExtractor(["page"])

    def run(d):
        pages = d.select(
            "doc_id",
            F.concat(
                F.lit(nav),
                F.replace(F.col("text"), F.lit("\n"), F.lit("</p><p>")),
                F.lit(post),
            ).alias("page"),
        )
        return (
            op.transform(pages)
            .agg(F.sum("page_n_main_blocks"), F.sum(F.length("page_main_text")))
            .collect()[0]
        )

    run(one)  # warm codegen
    t0 = time.perf_counter()
    r1 = run(one)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    rN = run(big)
    tN = time.perf_counter() - t0
    print(f"[maincontent] 1x:  main_blocks={r1[0]} chars={r1[1]}, {t1:.1f}s")
    print(
        f"[maincontent] {copies}x: main_blocks={rN[0]} chars={rN[1]}, "
        f"{tN:.1f}s (time ratio {tN / t1:.1f}x for {copies}x pages)"
    )
    one.unpersist()
    big.unpersist()


def check_quality(spark, copies: int) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    n = docs.count()
    # size the cap between 1x and copies-x so the capped-collect branch
    # is actually exercised at copies-x (sf0.1 docs alone sit far below
    # the 250k default)
    cap = max(100, 4 * n)

    ff.QualityScorer("text", max_fit_rows=cap).fit(one)  # warm plans
    t0 = time.perf_counter()
    ff.QualityScorer("text", max_fit_rows=cap).fit(one)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    ff.QualityScorer("text", max_fit_rows=cap).fit(big)
    tN = time.perf_counter() - t0
    print(f"[quality] 1x:  fit {t1:.1f}s (n={n}, cap={cap})")
    print(
        f"[quality] {copies}x: fit {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus; design matrix "
        f"capped at max_fit_rows, so the growth is the feature scan only)"
    )
    one.unpersist()
    big.unpersist()


def check_warc(spark, copies: int) -> None:
    """read_warc + HtmlTextExtractor over 10x the archive count: the
    unit of parallelism is the FILE (non-splittable gzip members), so
    wall time must scale with file count / cores — per-file narrow map,
    no shuffle, nothing super-linear."""
    import tempfile

    from feature_factory_spark.sources import (
        make_http_response, make_warc, read_warc,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r["text"] for r in docs.limit(40).collect()]
    recs = [
        {"payload": make_http_response(
            b"<html><head><style>a{x:y}</style></head><body><p>"
            + t.encode()[:800] + b"</p><a href=\"/n\">n</a></body></html>"),
         "target_uri": f"http://e.org/{i}", "warc_type": "response"}
        for i, t in enumerate(texts)
    ]
    blob = make_warc(recs, gzip_per_record=True)
    base = 32  # one file per core at 1x so BOTH sides are parallel

    def build(n_files: int) -> str:
        d = tempfile.mkdtemp(prefix=f"warcscale{n_files}_")
        for i in range(n_files):
            with open(os.path.join(d, f"part-{i:05d}.warc.gz"), "wb") as f:
                f.write(blob)
        return d

    def run(path: str) -> tuple[int, float]:
        pages = read_warc(spark, path).where(
            F.col("http_status") == 200
        ).select(F.col("payload").cast("string").alias("page"))
        out = ff.HtmlTextExtractor(["page"]).transform(pages)
        t0 = time.perf_counter()
        n = out.where(F.col("page_text_ratio") > 0.1).count()
        return n, time.perf_counter() - t0

    d1, dN = build(base), build(base * copies)
    run(d1)  # warm the mapInPandas worker pool + codegen untimed
    c1, t1 = run(d1)
    cN, tN = run(dN)
    print(f"[warc] 1x:  {base} files, {c1} pages, {t1:.1f}s")
    print(
        f"[warc] {copies}x: {base * copies} files, {cN} pages, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x archives)"
    )


def _grow_embeddings(spark, copies: int, dim: int = 64):
    """embeddings replicated ``copies`` times; copy i is the original
    CIRCULARLY ROTATED by i components — far from every other copy in
    cosine, so the candidate-pair OUTPUT stays ~flat while the corpus
    grows 10x and the ratio isolates the bucketed join's scan cost.
    (A nudge-perturbed near-dup variant grows pairs C(copies,2)-fold by
    construction — that measures output volume, not join linearity.)"""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = emb.select("vec_id", "embedding")
    for i in range(1, copies):
        rot = 1 + (i % (dim - 1))
        out = out.unionByName(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ).alias("embedding"),
            )
        )
    out = out.repartition(64).persist()
    out.count()
    return out


def check_semdedup(spark, copies: int) -> None:
    """SemanticDeduplicator.candidate_pairs at 10x the embedding corpus
    (rotation copies — pair output ~flat): the pair join is
    double-bucketed (k-means cluster AND LSH chunk) — wall must track
    the corpus scan ~linearly, never an all-pairs term."""
    one = _grow_embeddings(spark, 1)
    big = _grow_embeddings(spark, copies)
    op = ff.SemanticDeduplicator(
        "embedding", "vec_id", threshold=0.9, k=8, dim=64
    )
    # fit the coarse quantizer on the GROWN population: centroids fit
    # on the 1x originals put every rotated copy into 1-2 clusters,
    # and the 10x run then measures that fabricated bucket skew (wildly
    # unstable 8-23 s readings) instead of scan linearity
    op.fit(big)
    # warm plans untimed (codegen compilation lands on the 1x otherwise)
    op.candidate_pairs(one).count()
    t0 = time.perf_counter()
    c1 = op.candidate_pairs(one).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"[semdedup] 1x:  {c1} pairs, {t1:.1f}s")
    print(
        f"[semdedup] {copies}x: {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x embeddings, flat output)"
    )
    op.release()
    one.unpersist()
    big.unpersist()


def check_bigram(spark, copies: int) -> None:
    """BigramLogProbScorer.transform at 10x docs: fit once, then the
    transform (explode + two model-side key joins + per-doc avg) must
    stay ~linear — the model sides are fixed frames."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    op = ff.BigramLogProbScorer("text", "doc_id")
    op.fit(one)
    op.transform(one).select(F.sum("text_bigram_logprob")).collect()  # warm
    t0 = time.perf_counter()
    op.transform(one).select(F.sum("text_bigram_logprob")).collect()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    op.transform(big).select(F.sum("text_bigram_logprob")).collect()
    tN = time.perf_counter() - t0
    print(f"[bigram] 1x:  {t1:.1f}s")
    print(
        f"[bigram] {copies}x: {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x docs)"
    )
    op.release()
    one.unpersist()
    big.unpersist()


def check_arpa(spark, copies: int) -> None:
    """ArpaLogProbScorer.transform at 10x docs (r13): the model is a
    fixed frame (one unk-membership join, order-n key joins, one
    doc-partitioned lag window, one doc aggregate), so wall must track
    the corpus scan — never the model."""
    import itertools
    import os as _os
    import tempfile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    words = ["table", "query", "value", "scan", "fast", "row", "join",
             "hash", "batch", "merge", "line", "sort", "group", "data"]
    l1 = ["-2.5\t<unk>\t-0.4", "-1.5\t<s>\t-0.3", "-1.6\t</s>"]
    l1 += [f"-{1.0 + 0.01 * i:.2f}\t{w}\t-0.2"
           for i, w in enumerate(words)]
    l2 = [f"-{0.5 + 0.001 * i:.3f}\t{a} {b}\t-0.1"
          for i, (a, b) in enumerate(itertools.product(words, words))]
    l3 = [f"-{0.3 + 0.001 * i:.3f}\t{a} {b} {a}"
          for i, (a, b) in
          enumerate(itertools.product(words[:8], words[:8]))]
    arpa = (
        "\\data\\\n"
        f"ngram 1={len(l1)}\nngram 2={len(l2)}\nngram 3={len(l3)}\n\n"
        "\\1-grams:\n" + "\n".join(l1) + "\n\n"
        "\\2-grams:\n" + "\n".join(l2) + "\n\n"
        "\\3-grams:\n" + "\n".join(l3) + "\n\n\\end\\\n"
    )
    p = _os.path.join(
        tempfile.mkdtemp(prefix="ff_arpa_scale_"), "m.arpa"
    )
    open(p, "w").write(arpa)
    op = ff.ArpaLogProbScorer("text", "doc_id").load_arpa(p, spark)
    op.transform(one).select(F.sum("text_arpa_logprob")).collect()
    t0 = time.perf_counter()
    op.transform(one).select(F.sum("text_arpa_logprob")).collect()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    op.transform(big).select(F.sum("text_arpa_logprob")).collect()
    tN = time.perf_counter() - t0
    n_grams = len(l1) + len(l2) + len(l3)
    print(f"[arpa] 1x:  {t1:.1f}s  (order-3 model, {n_grams} n-grams)")
    print(
        f"[arpa] {copies}x: {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x docs)"
    )
    op.release()
    one.unpersist()
    big.unpersist()


def check_uniapply(spark, copies: int) -> None:
    """Unigram published-tokenizer apply at 10x docs (r13): a
    T5-shaped file (Precompiled charsmap + Replace chain, unk_id,
    sentinel) — the normalizer chain is the documented Arrow-batched
    Python seam and the segmentation runs at the DISTINCT-word grain,
    so wall must grow ~linearly with the corpus (the chain pass) while
    the per-word Viterbi cost stays ~fixed."""
    import base64
    import json as _json
    import os as _os
    import string
    import tempfile

    from feature_factory_spark.functions.charsmap import (
        build_charsmap_blob,
    )
    from feature_factory_spark.operators.unigram import WORD_MARK as SP

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    pieces = [["<pad>", -1.0], ["</s>", -1.1], ["<unk>", -1.2],
              [SP, -2.0]]
    for i, c in enumerate(string.ascii_lowercase + string.digits):
        pieces.append([c, -3.0 - 0.01 * i])
    for i, w in enumerate(["table", "query", "value", "scan", "fast",
                           "row", "join", "hash", "batch", "merge"]):
        pieces.append([SP + w, -1.5 - 0.01 * i])
    blob = build_charsmap_blob({"\xa0": " "})
    doc = {
        "version": "1.0", "truncation": None, "padding": None,
        "added_tokens": [{"id": 500, "content": "<extra_id_0>",
                          "special": True}],
        "normalizer": {"type": "Sequence", "normalizers": [
            {"type": "Precompiled", "precompiled_charsmap":
                base64.b64encode(blob).decode()},
            {"type": "Replace", "pattern": {"Regex": " {2,}"},
             "content": " "},
        ]},
        "pre_tokenizer": {"type": "Metaspace", "replacement": SP,
                          "prepend_scheme": "first", "split": True},
        "post_processor": None, "decoder": None,
        "model": {"type": "Unigram", "unk_id": 2, "vocab": pieces,
                  "byte_fallback": False},
    }
    p = _os.path.join(
        tempfile.mkdtemp(prefix="ff_uniapply_"), "t5ish.json"
    )
    _json.dump(doc, open(p, "w"))
    op = ff.UnigramVocabBuilder("text", "doc_id") \
        .load_tokenizer_json(p, spark)
    op.encode_ids(one).select(
        F.sum(F.size("text_unigram_ids"))
    ).collect()  # warm
    t0 = time.perf_counter()
    n1 = op.encode_ids(one).select(
        F.sum(F.size("text_unigram_ids"))
    ).collect()[0][0]
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    nN = op.encode_ids(big).select(
        F.sum(F.size("text_unigram_ids"))
    ).collect()[0][0]
    tN = time.perf_counter() - t0
    print(f"[uniapply] 1x:  {n1} ids / {t1:.1f}s")
    print(
        f"[uniapply] {copies}x: {nN} ids / {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x docs)"
    )
    op.release()
    one.unpersist()
    big.unpersist()


def check_wordpiece(spark, copies: int) -> None:
    """WordPiece (BERT-family) apply at 10x docs (r13): normalization
    is the one Arrow seam (corpus-linear), the greedy match runs at
    the DISTINCT-word grain (fixed under corpus copies), so wall must
    track the corpus scan."""
    import os as _os
    import tempfile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
             + list("abcdefghijklmnopqrstuvwxyz0123456789")
             + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
             + ["the", "table", "query", "value", "scan", "fast",
                "row", "join", "hash", "batch", "merge", "line",
                "sort", "group", "data", "##le", "##ue", "##a"])
    p = _os.path.join(tempfile.mkdtemp(prefix="ff_wp_scale_"),
                      "vocab.txt")
    open(p, "w").write("\n".join(vocab) + "\n")
    op = ff.WordPieceTokenizer("text", "doc_id").load_vocab_txt(
        p, spark
    )
    op.transform(one).select(
        F.sum("text_wordpiece_token_count")
    ).collect()  # warm
    t0 = time.perf_counter()
    n1 = op.transform(one).select(
        F.sum("text_wordpiece_token_count")
    ).collect()[0][0]
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    nN = op.transform(big).select(
        F.sum("text_wordpiece_token_count")
    ).collect()[0][0]
    tN = time.perf_counter() - t0
    print(f"[wordpiece] 1x:  {n1} tokens / {t1:.1f}s")
    print(
        f"[wordpiece] {copies}x: {nN} tokens / {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x docs)"
    )
    one.unpersist()
    big.unpersist()


def _synth_images(spark, n: int):
    """n deterministic gradient-pattern PNGs in planted near-dup groups
    of 4 (the image_dedup entry fixture), synthesized in-plan."""
    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def synth(batches):
        import hashlib as _hl

        from feature_factory_spark.operators.imagehash import pattern_png

        for pdf in batches:
            imgs = []
            for i in pdf["doc_id"]:
                i = int(i)
                hx = _hl.md5(f"ffimg-{i // 4}".encode()).hexdigest()
                p = int(hx[:16], 16)
                q0 = int(hx[16:18], 16) % 64
                q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
                m = i % 4
                if m == 1:
                    p ^= 1 << q0
                elif m == 2:
                    p ^= (1 << q0) | (1 << q1)
                elif m == 3:
                    p ^= 0xFFFFFFFFFFFFFFFF
                imgs.append(pattern_png(p))
            pdf["img"] = imgs
            yield pdf

    out = ids.repartition(64).mapInPandas(
        synth, "doc_id bigint, img binary"
    ).persist()
    out.count()
    return out


def check_imagedup(spark, copies: int) -> None:
    """ImageDeduplicator: decode + dHash (narrow Arrow map) + pigeonhole
    pair join must stay ~linear in image count; pair output grows
    linearly too (groups of 4 are disjoint)."""
    base = 4000
    one = _synth_images(spark, base)
    big = _synth_images(spark, base * copies)
    op = ff.ImageDeduplicator("doc_id", binary_col="img", hamming_threshold=2)

    # warm the Arrow/python-worker path untimed
    op.candidate_pairs(one).count()
    t0 = time.perf_counter()
    c1 = op.candidate_pairs(one).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"[imagedup] 1x:  {base} images, {c1} pairs, {t1:.1f}s")
    print(
        f"[imagedup] {copies}x: {base * copies} images, {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x images)"
    )
    one.unpersist()
    big.unpersist()


def _planted_pattern(salt: str, i: int) -> int:
    """The shared planted-group pattern (groups of 4, nested flips)."""
    import hashlib as _hl

    hx = _hl.md5(f"{salt}-{i // 4}".encode()).hexdigest()
    p = int(hx[:16], 16)
    q0 = int(hx[16:18], 16) % 64
    q1 = (q0 + 1 + int(hx[18:20], 16) % 63) % 64
    m = i % 4
    if m == 1:
        p ^= 1 << q0
    elif m == 2:
        p ^= (1 << q0) | (1 << q1)
    elif m == 3:
        p ^= 0xFFFFFFFFFFFFFFFF
    return p


def check_audiodup(spark, copies: int) -> None:
    """AudioDeduplicator: WAV decode + rFFT fingerprint (narrow Arrow
    map) + pigeonhole pair join must stay ~linear in clip count (groups
    of 4 are disjoint, so pair output is linear too)."""
    base = 1500

    def synth_wavs(n: int):
        ids = spark.range(n).select(F.col("id").alias("doc_id"))

        def synth(batches):
            from feature_factory_spark.operators.audiohash import pattern_wav

            for pdf in batches:
                pdf["wav"] = [
                    pattern_wav(_planted_pattern("ffaud", int(i)))
                    for i in pdf["doc_id"]
                ]
                yield pdf

        out = ids.repartition(64).mapInPandas(
            synth, "doc_id bigint, wav binary"
        ).persist()
        out.count()
        return out

    one = synth_wavs(base)
    big = synth_wavs(base * copies)
    op = ff.AudioDeduplicator("doc_id", binary_col="wav", hamming_threshold=2)
    op.candidate_pairs(one).count()  # warm the Arrow path untimed
    t0 = time.perf_counter()
    c1 = op.candidate_pairs(one).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"[audiodup] 1x:  {base} clips, {c1} pairs, {t1:.1f}s")
    print(
        f"[audiodup] {copies}x: {base * copies} clips, {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x clips)"
    )
    one.unpersist()
    big.unpersist()


def check_videodup(spark, copies: int) -> None:
    """VideoDeduplicator: ISO-BMFF demux + per-frame dHash + majority
    fold (narrow Arrow map) + pigeonhole pair join, ~linear in video
    count."""
    base = 1500

    def synth_vids(n: int):
        ids = spark.range(n).select(F.col("id").alias("doc_id"))

        def synth(batches):
            from feature_factory_spark.operators.videohash import pattern_mp4

            for pdf in batches:
                pdf["vid"] = [
                    pattern_mp4(_planted_pattern("ffvid", int(i)))
                    for i in pdf["doc_id"]
                ]
                yield pdf

        out = ids.repartition(64).mapInPandas(
            synth, "doc_id bigint, vid binary"
        ).persist()
        out.count()
        return out

    one = synth_vids(base)
    big = synth_vids(base * copies)
    op = ff.VideoDeduplicator("doc_id", binary_col="vid", hamming_threshold=2)
    op.candidate_pairs(one).count()  # warm the Arrow path untimed
    t0 = time.perf_counter()
    c1 = op.candidate_pairs(one).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.candidate_pairs(big).count()
    tN = time.perf_counter() - t0
    print(f"[videodup] 1x:  {base} videos, {c1} pairs, {t1:.1f}s")
    print(
        f"[videodup] {copies}x: {base * copies} videos, {cN} pairs, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x videos)"
    )
    one.unpersist()
    big.unpersist()


def check_embincr(spark, copies: int) -> None:
    """EmbeddingDeduplicator dedupe_against: a FIXED 100-vector recrawl
    batch probed against a 1x vs 10x persisted LSH index. File pruning
    holds the probe to the batch's (chunk, bucket) partitions, so probe
    wall must grow far slower than the index."""
    import tempfile

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.first()["embedding"])
    one = emb.persist()
    one.count()
    big = emb
    for i in range(1, copies):
        big = big.union(
            emb.select((F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                       "embedding")
        )
    big = big.persist()
    big.count()
    batch = emb.limit(100).select(
        (F.col("vec_id") + 50_000_000).alias("vec_id"), "embedding"
    )
    op = ff.EmbeddingDeduplicator("embedding", "vec_id", threshold=0.99,
                                  dim=dim, index_buckets=64)
    with tempfile.TemporaryDirectory() as tmp:
        p1, pN = os.path.join(tmp, "e1"), os.path.join(tmp, "eN")
        op.write_index(one, p1)
        op.write_index(big, pN)
        t0 = time.perf_counter()
        s1 = op.dedupe_against(batch, p1).count()
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sN = op.dedupe_against(batch, pN).count()
        tN = time.perf_counter() - t0
    print(f"[embincr] 1x index:  {s1} survivors, {t1:.1f}s")
    print(
        f"[embincr] {copies}x index: {sN} survivors, {tN:.1f}s "
        f"(probe time ratio {tN / t1:.1f}x for {copies}x index)"
    )
    one.unpersist()
    big.unpersist()


def check_incrdedup(spark, copies: int) -> None:
    """SimHash dedupe_against: a FIXED 100-doc recrawl batch probed
    against a 1x vs 10x persisted index. File pruning holds the probe
    to the batch's (chunk, bucket) partitions, so probe wall must grow
    far slower than the index (the index-vs-recompute win is the whole
    point of the persisted layout)."""
    import tempfile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    batch = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
    )
    op = ff.SimHashDeduplicator("text", "doc_id", hamming_threshold=3)
    with tempfile.TemporaryDirectory() as tmp:
        p1, pN = os.path.join(tmp, "i1"), os.path.join(tmp, "iN")
        op.write_index(one.select("doc_id", "text"), p1)
        op.write_index(big.select("doc_id", "text"), pN)
        t0 = time.perf_counter()
        s1 = op.dedupe_against(batch, p1).count()
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sN = op.dedupe_against(batch, pN).count()
        tN = time.perf_counter() - t0
    print(f"[incrdedup] 1x index:  {s1} survivors, {t1:.1f}s")
    print(
        f"[incrdedup] {copies}x index: {sN} survivors, {tN:.1f}s "
        f"(probe time ratio {tN / t1:.1f}x for {copies}x index)"
    )
    one.unpersist()
    big.unpersist()


def check_pagerank(spark, copies: int) -> None:
    """pagerank: fixed iterations x (one join + one aggregate) over the
    edge list — wall must stay ~linear in |E| (no rank-frame collect,
    no cross product)."""
    base = 20_000

    def graph(n: int):
        ids = spark.range(n)
        e = ids.selectExpr("id AS src", f"(id + 1) % {n} AS dst").union(
            ids.selectExpr("id AS src", f"(id * 7 + 3) % {n} AS dst")
        ).persist()
        e.count()
        return e

    from feature_factory_spark.functions.graph import pagerank

    one = graph(base)
    big = graph(base * copies)
    t0 = time.perf_counter()
    c1 = pagerank(one, iterations=3).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = pagerank(big, iterations=3).count()
    tN = time.perf_counter() - t0
    print(f"[pagerank] 1x:  {base} nodes ranked ({c1}), {t1:.1f}s")
    print(
        f"[pagerank] {copies}x: {base * copies} nodes ranked ({cN}), "
        f"{tN:.1f}s (time ratio {tN / t1:.1f}x for {copies}x edges)"
    )
    one.unpersist()
    big.unpersist()


def check_corpusshuffle(spark, copies: int) -> None:
    """CorpusShuffler: one aggregate + bucket-partitioned windows — the
    distributed prefix-sum must stay ~linear (no global single-task
    window)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)
    op = ff.CorpusShuffler("doc_id", tokens_col="n_chars",
                           tokens_per_shard=200_000)

    t0 = time.perf_counter()
    c1 = op.transform(one).groupBy("shard_id").count().count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = op.transform(big).groupBy("shard_id").count().count()
    tN = time.perf_counter() - t0
    print(f"[corpusshuffle] 1x:  {c1} shards, {t1:.1f}s")
    print(
        f"[corpusshuffle] {copies}x: {cN} shards, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    one.unpersist()
    big.unpersist()


def check_crossmodal(spark, copies: int) -> None:
    """CrossModalDeduplicator: union of per-modality pair frames +
    min-label connected components — wall must stay ~linear in |pairs|
    (each CC iteration is one join + one aggregate; near-dup graphs
    have tiny diameters, so iterations don't grow with the corpus)."""
    base = 20_000

    def run(n: int) -> float:
        pages = spark.range(n).selectExpr("id AS page_id").persist()
        pages.count()
        # text chains (x, x+1) at x%4==0; image (x, x+1) at x%8==1;
        # audio bridges (x, x+6) at x%16==2 — bounded 5-6 node clusters
        # spanning all three signals (diameter <= 4 like a real near-dup
        # graph; CC iterations must NOT grow with the corpus), |pairs|
        # ~ 0.44n
        def planted(offset, mod, rem):
            a = pages.selectExpr("page_id AS a_id").where(
                F.col("a_id") % mod == rem)
            b = pages.selectExpr("page_id AS b_id")
            return a.join(b, F.col("b_id") == F.col("a_id") + offset)

        op = ff.CrossModalDeduplicator("page_id", {
            "text": planted(1, 4, 0),
            "image": planted(1, 8, 1),
            "audio": planted(6, 16, 2),
        })
        t0 = time.perf_counter()
        kept = op.transform(pages).count()
        dt = time.perf_counter() - t0
        pages.unpersist()
        print(f"[crossmodal] {n} pages -> {kept} survivors, {dt:.1f}s")
        return dt

    t1 = run(base)
    tN = run(base * copies)
    print(
        f"[crossmodal] time ratio {tN / t1:.1f}x for {copies}x pages+pairs"
    )


def check_corpusreport(spark, copies: int) -> None:
    """corpus_report: ONE groupBy aggregate melted on the group-count-
    sized result — wall must track the scan, the melt/share window must
    never become data-sized."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = grow_docs(docs, 1)
    big = grow_docs(docs, copies)

    t0 = time.perf_counter()
    c1 = ff.corpus_report(one, ["source", "lang"], ["n_chars"]).count()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cN = ff.corpus_report(big, ["source", "lang"], ["n_chars"]).count()
    tN = time.perf_counter() - t0
    print(f"[corpusreport] 1x:  {c1} report rows, {t1:.1f}s")
    print(
        f"[corpusreport] {copies}x: {cN} report rows, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    one.unpersist()
    big.unpersist()


def check_tfidf(spark, copies: int) -> None:
    """HashedTfIdfVectorizer (r11): fit is one distinct-(doc,dim)
    aggregate collapsing to <= n_features rows; transform is a narrow
    fold. Both must track the corpus scan ~linearly — the idf state is
    model-sized at any corpus scale."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = grow_docs(docs, copies)

    def run(frame):
        op = ff.HashedTfIdfVectorizer("text", n_features=256)
        t0 = time.perf_counter()
        op.fit(frame)
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = op.transform(frame).select(
            F.sum(F.element_at("text_tfidf", 1))
        ).collect()[0][0]
        t_tr = time.perf_counter() - t0
        return t_fit, t_tr, n

    f1, tr1, _ = run(docs)
    fN, trN, _ = run(big)
    print(f"[tfidf] 1x:  fit {f1:.1f}s transform {tr1:.1f}s")
    print(
        f"[tfidf] {copies}x: fit {fN:.1f}s transform {trN:.1f}s "
        f"(fit ratio {fN / f1:.1f}x, transform ratio {trN / tr1:.1f}x "
        f"for {copies}x corpus)"
    )
    big.unpersist()


def check_tokapply(spark, copies: int) -> None:
    """Published-tokenizer application (r12): a large merge table
    (past _CHAIN_MERGE_CUTOFF, the real-tokenizer regime) applied via
    the rank-dict Arrow path. The corpus-sized plan is the
    distinct-piece groupBy + broadcast join; the per-word loop runs
    once per DISTINCT piece, so wall must track the corpus scan."""
    import json
    import tempfile

    from feature_factory_spark.operators.bpe import _B2U

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = grow_docs(docs, copies)
    # synthetic GPT-2-layout table: base merges + inert filler past
    # the cutoff so the rank path engages (the loop cost depends on
    # word length, not table size — dict lookups)
    merges = [["Ġ", "t"], ["h", "e"], ["Ġt", "he"], ["i", "n"],
              ["a", "n"], ["an", "d"], ["e", "r"], ["o", "n"]]
    merges += [[chr(0x100 + i % 60), str(i % 10)] for i in range(800)]
    vocab = {t: i for i, t in enumerate(sorted(set(_B2U.values())))}
    for l, r in merges:
        vocab.setdefault(l + r, len(vocab))
    doc = {
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel",
                          "add_prefix_space": False, "use_regex": True},
        "model": {"type": "BPE", "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "vocab": vocab,
                  "merges": [f"{l} {r}" for l, r in merges]},
    }
    path = tempfile.mktemp(suffix=".json")
    json.dump(doc, open(path, "w"))

    def run(frame):
        op = ff.BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
            path, spark
        )
        assert len(op.merges_) > op._CHAIN_MERGE_CUTOFF
        t0 = time.perf_counter()
        n = (
            op.encode_ids(frame)
            .select(F.sum(F.size("text_bpe_ids")))
            .collect()[0][0]
        )
        dt = time.perf_counter() - t0
        op.release()
        return n, dt

    n1, t1 = run(docs)
    nN, tN = run(big)
    print(f"[tokapply] 1x:  {n1} tokens, {t1:.1f}s")
    print(
        f"[tokapply] {copies}x: {nN} tokens, {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    big.unpersist()


def check_adc(spark, copies: int) -> None:
    """IVF-PQ probe (r12): ADC lookup-table scoring vs
    decode-reconstruct on the SAME pruned scan — the per-candidate
    arithmetic drop (~dim/m x) should show directly in the probe wall
    at a fixed query set while the corpus grows 10x."""
    import numpy as np
    import tempfile

    dim, m = 64, 8
    rng = np.random.RandomState(11)
    cents = rng.randn(16, dim) * 4

    def corpus(n):
        rows = [
            (i, [float(x) for x in cents[i % 16] + rng.randn(dim) * 0.3])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ).repartition(64)

    base_n = 20_000
    queries = corpus(64)

    def run(n):
        ivf = ff.IVFCosineTopK(
            "embedding", "vec_id", k=10, n_centroids=16, n_probe=4,
            iterations=2,
        )
        path = tempfile.mkdtemp(prefix="ff_adc_") + "/idx"
        ivf.write_index(corpus(n), path, quantize="pq")
        out = {}
        for mode, adc in (("decode", False), ("adc", True)):
            t0 = time.perf_counter()
            ivf.search_index(spark, path, queries, adc=adc) \
                .write.format("noop").mode("overwrite").save()
            out[mode] = time.perf_counter() - t0
        return out

    r1 = run(base_n)
    rN = run(base_n * copies)
    print(
        f"[adc] 1x ({base_n}): decode {r1['decode']:.1f}s "
        f"adc {r1['adc']:.1f}s"
    )
    print(
        f"[adc] {copies}x: decode {rN['decode']:.1f}s adc "
        f"{rN['adc']:.1f}s (adc ratio {rN['adc'] / r1['adc']:.1f}x; "
        f"adc vs decode at {copies}x: "
        f"{rN['decode'] / rN['adc']:.1f}x faster)"
    )


def check_dsir(spark, copies: int) -> None:
    """DSIRWeighter (r11): target fit fixed, raw fit + score at 10x the
    corpus — one explode+groupBy to n_buckets rows and a narrow fold,
    both ~linear in the scan."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.where(F.col("source") == "src0")
    big = grow_docs(docs, copies)

    def run(frame):
        op = ff.DSIRWeighter("text", id_col="doc_id", n_buckets=4096)
        op.fit_target(target)
        t0 = time.perf_counter()
        op.fit(frame)
        out = op.transform(frame).agg(F.sum("text_dsir")).collect()
        return time.perf_counter() - t0, out[0][0]

    t1, _ = run(docs)
    tN, _ = run(big)
    print(f"[dsir] 1x:  {t1:.1f}s (raw fit + score)")
    print(
        f"[dsir] {copies}x: {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x corpus)"
    )
    big.unpersist()


def check_pairscore(spark, copies: int) -> None:
    """ImageTextPairScorer (r11): one cosine fold per pair row — a
    stateless narrow projection that must be embarrassingly linear."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select(
        "vec_id", F.col("embedding").alias("a"),
        F.reverse("embedding").alias("b"),
    )
    big = base
    for i in range(1, copies):
        big = big.unionByName(
            base.select((F.col("vec_id") + i * 100000).alias("vec_id"),
                        "a", "b")
        )
    big = big.repartition(64).persist()
    big.count()
    op = ff.ImageTextPairScorer("a", "b")

    def run(frame):
        t0 = time.perf_counter()
        frame_out = op.transform(frame).agg(
            F.sum("pair_cosine")
        ).collect()
        return time.perf_counter() - t0, frame_out[0][0]

    t1, _ = run(base)
    tN, _ = run(big)
    print(f"[pairscore] 1x:  {t1:.1f}s")
    print(
        f"[pairscore] {copies}x: {tN:.1f}s "
        f"(time ratio {tN / t1:.1f}x for {copies}x pairs)"
    )
    big.unpersist()


CHECKS = {
    "minhash": check_minhash,
    "asof": check_asof,
    "contamination": check_contamination,
    "substring": check_substring,
    "ivfprune": check_ivfprune,
    "langid": check_langid,
    "maincontent": check_maincontent,
    "pca": check_pca,
    "quality": check_quality,
    "warc": check_warc,
    "semdedup": check_semdedup,
    "bigram": check_bigram,
    "arpa": check_arpa,
    "uniapply": check_uniapply,
    "wordpiece": check_wordpiece,
    "imagedup": check_imagedup,
    "audiodup": check_audiodup,
    "videodup": check_videodup,
    "incrdedup": check_incrdedup,
    "embincr": check_embincr,
    "corpusshuffle": check_corpusshuffle,
    "pagerank": check_pagerank,
    "crossmodal": check_crossmodal,
    "corpusreport": check_corpusreport,
    "tfidf": check_tfidf,
    "adc": check_adc,
    "tokapply": check_tokapply,
    "dsir": check_dsir,
    "pairscore": check_pairscore,
}


def main() -> None:
    args = sys.argv[1:]
    copies = int(args[0]) if args and args[0].isdigit() else 10
    names = [a for a in args if not a.isdigit()] or list(CHECKS)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        CHECKS[name](spark, copies)
        # full GC between checks, for the same reason bench.py collects
        # between queries: a quiet single-JVM session defers collection
        # debt (broadcast blocks, shuffle buffers) from earlier checks
        # into whichever later check first hits allocation pressure —
        # measured as minhash reading 43.8 s inside a 10-check sweep vs
        # 17.3 s standalone on the same host, same code (r7)
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
