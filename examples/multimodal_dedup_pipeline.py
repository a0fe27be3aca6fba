"""End-to-end multimodal near-dup pipeline: the r8 modality matrix in
one script.

Every modality follows the same shape — decode -> 64-bit perceptual
signature (narrow Arrow map) -> pigeonhole Hamming blocking -> exact
bit_count verify -> greedy/components drop — and every deduplicator
shares the persisted-index recrawl surface (write_index once,
dedupe_against each snapshot). Fixtures come from the deterministic
encoders (pattern_png / pattern_wav / pattern_mp4), so the script runs
self-contained; swap the synthesized frames for `sources.read_media`
output on a real corpus.

Run: python examples/multimodal_dedup_pipeline.py
"""

import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import feature_factory_spark as ff  # noqa: E402
from feature_factory_spark.operators.audiohash import pattern_wav  # noqa: E402
from feature_factory_spark.operators.imagehash import pattern_png  # noqa: E402
from feature_factory_spark.operators.videohash import pattern_mp4  # noqa: E402


def planted(salt: str, i: int) -> int:
    """Groups of 3: members 0/1 one bit apart (near-dups), member 2
    inverted (unique)."""
    hx = hashlib.md5(f"{salt}-{i // 3}".encode()).hexdigest()
    p = int(hx[:16], 16)
    if i % 3 == 1:
        p ^= 1 << (int(hx[16:18], 16) % 64)
    elif i % 3 == 2:
        p ^= 0xFFFFFFFFFFFFFFFF
    return p


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 30
    rows = [
        (i,
         pattern_png(planted("img", i)),
         pattern_wav(planted("aud", i), frame_len=128),
         pattern_mp4(planted("vid", i)))
        for i in range(n)
    ]
    media = spark.createDataFrame(
        rows, "doc_id bigint, img binary, wav binary, vid binary"
    )

    # 1. hash once (narrow Arrow maps), persist the 8-byte signatures
    hashed = ff.ImageHasher("img").transform(media)
    hashed = ff.AudioHasher("wav").transform(hashed)
    hashed = ff.VideoHasher("vid").transform(hashed)
    hashed = hashed.select(
        "doc_id", "img_dhash", "wav_afp", "vid_vhash"
    ).persist()
    print("signatures:", hashed.count(), "rows x 3 modalities")

    # 2. dedup each modality from the precomputed hash column — the
    #    pair stage never touches pixels/PCM/frames
    ops = {
        "image": ff.ImageDeduplicator("doc_id", hash_col="img_dhash",
                                      hamming_threshold=2),
        "audio": ff.AudioDeduplicator("doc_id", hash_col="wav_afp",
                                      hamming_threshold=2),
        "video": ff.VideoDeduplicator("doc_id", hash_col="vid_vhash",
                                      hamming_threshold=2),
    }
    for name, op in ops.items():
        pairs = op.candidate_pairs(hashed).count()
        kept = op.transform(hashed).count()
        print(f"{name}: {pairs} near-dup pairs, {kept}/{n} survive")

    # 3. the recrawl workflow: index this snapshot, dedupe the next one
    #    against it (file-pruned probe — the corpus is never recomputed)
    with tempfile.TemporaryDirectory() as tmp:
        idx = os.path.join(tmp, "imgidx")
        ops["image"].write_index(hashed, idx)
        recrawl = spark.createDataFrame(
            [(100 + i, pattern_png(planted("img", i))) for i in range(6)]
            + [(900, pattern_png(planted("img", 500 * 3)))],
            "doc_id bigint, img binary",
        )
        fresh = ff.ImageDeduplicator(
            "doc_id", binary_col="img", hamming_threshold=2
        ).dedupe_against(recrawl, idx)
        print("recrawl survivors (expect only the new group):",
              sorted(r["doc_id"] for r in fresh.collect()))
        # index lifecycle (r9): append the survivors, watch the
        # versions log, compact when the small files pile up
        ff.ImageDeduplicator(
            "doc_id", binary_col="img", hamming_threshold=2
        ).write_index(fresh.select("doc_id", "img"), idx, mode="append")
        print("index versions:",
              [v["op"] for v in ff.index_versions(spark, idx)])
        compacted = os.path.join(tmp, "imgidx_compact")
        ff.compact_index(spark, idx, compacted)
        audit = ff.audit_index(spark, compacted)
        print("compacted:", audit["datasets"])

    # 3b. audio quality gate (r9): before fingerprinting a real audio
    #     corpus, drop clipped / near-silent / too-short clips — the
    #     Gopher-analogue for speech (here: thresholds sized to the
    #     synthetic 128-sample fixtures)
    gated = ff.AudioQualityFilter(
        "wav", max_clipping_ratio=1.0, max_silence_ratio=0.9,
        min_rms=1e-6, min_duration_s=0.0,
    ).transform(media.select("doc_id", "wav"))
    print("audio passing the quality gate:",
          gated.where("wav_keep").count(), "/", n)

    # 3c. image-text pair curation (r10): harvest (img src, alt/
    #     caption) candidates from page HTML, resolve against the page
    #     URL, join the crawled bytes by canonical URL, gate quality —
    #     the LAION-style step that turns a crawl into training pairs
    pages = spark.createDataFrame(
        [
            (i,
             f'<p>About item {i}.</p>'
             f'<figure><img src="../img/{i % 5}.png" '
             f'alt="A photo of item {i % 5}">'
             f'<figcaption>Item {i % 5} in the wild</figcaption></figure>',
             f"https://shop.example.org/cat/{i}/page.html")
            for i in range(10)
        ],
        "page_id bigint, html string, url string",
    )
    cand = ff.ImageTextPairExtractor("html", url_col="url").transform(pages)
    crawled_imgs = spark.createDataFrame(
        [(f"https://shop.example.org/cat/img/{k}.png",
          pattern_png(planted("img", k * 3)))
         for k in range(4)],  # image 4 of 5 was never fetched
        "url string, img binary",
    )
    trainable = ff.join_image_text_pairs(
        cand, crawled_imgs, "url", "img",
        quality=ff.ImageQualityFilter("img", min_width=8, min_height=8,
                                      min_entropy=0.0),
    )
    got = trainable.select("img_url", "pair_text").collect()
    print("image-text pairs:", len(got), "e.g.",
          (got[0]["pair_text"], got[0]["img_url"]) if got else None)

    # 3d. (r11) pair-grain similarity gate — the decisive LAION filter
    #     (CLIP-score >= 0.28) over user-supplied embedding columns;
    #     here the encoder is faked deterministically (image k and its
    #     true caption agree, off-by-one captions don't), in
    #     production the columns come from a CLIP-style dual encoder
    def fake_emb(seed_col, flip):
        return F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.cos(seed_col * i * flip).cast("double"),
        )

    k = F.regexp_extract("img_url", r"/img/(\d+)\.png", 1).cast("int")
    scored = ff.ImageTextPairScorer(
        "img_emb", "txt_emb", threshold=0.9, mode="filter"
    ).transform(
        trainable
        .withColumn("img_emb", fake_emb(k, 1.0))
        .withColumn(
            "txt_emb",
            fake_emb(k + (F.col("page_id") % 3 == 0).cast("int"), 1.0),
        )
    )
    print("pairs surviving the similarity gate:",
          scored.count(), "/", len(got))

    # 3b. (r10) cross-modal survivorship: the per-modality pair frames
    #     describe the SAME pages — union them and keep one survivor
    #     per transitive multi-signal cluster instead of deduping each
    #     modality in isolation
    xmodal = ff.CrossModalDeduplicator(
        "doc_id",
        {name: op.candidate_pairs(hashed).select("a_id", "b_id")
         for name, op in ops.items()},
    )
    page_survivors = xmodal.transform(hashed)
    print(f"cross-modal survivors: {page_survivors.count()} "
          f"/ {hashed.count()}")

    # 4. ship the survivors: seeded shuffle + token-balanced shards +
    #    the loader-side manifest
    survivors = ops["image"].transform(hashed).select(
        "doc_id", F.lit(128).alias("n_tokens")
    )
    shuffler = ff.CorpusShuffler("doc_id", tokens_col="n_tokens",
                                 tokens_per_shard=512)
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        shuffler.write_shards(survivors, out)
        print("exported:", sorted(
            d for d in os.listdir(out) if d.startswith("shard_id=")
        ), "+ _manifest.json")

    hashed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
