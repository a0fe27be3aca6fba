"""A/B for the doc-grain encode join-back (VERDICT r13 item 7).

The guard-free WordPiece encode runs ONE doc-grain mapInPandas
producing (id, tokens) and LEFT-JOINs it back to the input frame.
Variant "passthrough" computes the token column inside the SAME
mapInPandas pass with every input column carried through Arrow —
no join, but every column round-trips the Python boundary.

Measures both on the sf0.1 documents corpus (all 5 columns carried,
the family-query shape), parity-checked first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "5"))


def main() -> int:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from feature_factory_spark.operators.wordpiece import WordPieceTokenizer

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-encode-joinback")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = entry._t(spark, SF_DIR, "documents")
    docs.count()
    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # the q_wordpiece_apply fixture vocabulary (published-model shape)
    import json as _json
    import tempfile

    words = ["the", "table", "query", "value", "scan", "fast", "row",
             "join", "hash", "batch", "merge", "line", "sort",
             "group", "data", "column", "filter", "stream", "window",
             "vector", "small", "big", "slow", "key", "agg", "part",
             "order", "spark", "customer"]
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for w in words + ["tab", "col", "cust", "val"]:
        vocab.setdefault(w, len(vocab))
    for w in ["##le", "##umn", "##omer", "##ue", "##a", "##b"]:
        vocab.setdefault(w, len(vocab))
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        vocab.setdefault(c, len(vocab))
        vocab.setdefault("##" + c, len(vocab))
    doc = {
        "version": "1.0",
        "added_tokens": [{"id": vocab[t], "content": t, "special": True}
                         for t in ("[PAD]", "[UNK]", "[CLS]", "[SEP]")],
        "normalizer": {"type": "BertNormalizer", "clean_text": True,
                       "handle_chinese_chars": True,
                       "strip_accents": None, "lowercase": True},
        "pre_tokenizer": {"type": "BertPreTokenizer"},
        "post_processor": None,
        "decoder": {"type": "WordPiece", "prefix": "##", "cleanup": True},
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "continuing_subword_prefix": "##",
                  "max_input_chars_per_word": 100, "vocab": vocab},
    }
    tmp = tempfile.mkdtemp(prefix="ff_abwp_")
    path = os.path.join(tmp, "wp.json")
    _json.dump(doc, open(path, "w"))
    op = WordPieceTokenizer("text", "doc_id").load_tokenizer_json(path, spark)

    joined = op.encode_ids(docs)
    out_col = "text_wordpiece_ids"

    # passthrough twin: same tokenize body, every input column carried
    idmap = op._require_model()
    import re as _re

    vocab = frozenset(idmap)
    unk, prefix, max_chars = op.unk_token_, op.prefix_, op.max_chars_
    special = frozenset(op._special_tokens)
    spat_src = (
        "|".join(_re.escape(t) for t in op._special_tokens)
        if op._special_tokens else None
    )
    clean, cjk = op._clean_text, op._handle_chinese
    strip_acc, lower = op._strip_accents, op._lowercase

    from feature_factory_spark.operators.wordpiece import (
        _pre_tokenize_with_specials,
        wordpiece_word,
    )

    def batches(it):
        import re as _re2

        pat = _re2.compile(spat_src) if spat_src else None
        cache: dict = {}

        def tok(w):
            s = cache.get(w)
            if s is None:
                s = [w] if w in special else wordpiece_word(
                    w, vocab, unk, prefix, max_chars
                )
                cache[w] = s
            return s

        for pdf in it:
            ids = []
            for s in pdf["text"]:
                pieces: list = []
                for w in _pre_tokenize_with_specials(
                    s, pat, clean, cjk, strip_acc, lower
                ):
                    pieces.extend(tok(w))
                ids.append([idmap.get(p, -1) for p in pieces])
            pdf[out_col] = ids
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", {out_col} array<int>"
    passthrough = docs.mapInPandas(batches, schema)

    a = {r["doc_id"]: list(r[out_col]) for r in joined.collect()}
    b = {r["doc_id"]: list(r[out_col]) for r in passthrough.collect()}
    assert a == b, "variants disagree"
    print("parity ok", flush=True)

    times = {"joinback": [], "passthrough": []}
    for rep in range(REPS):
        for name, f in (("joinback", joined), ("passthrough", passthrough)):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.perf_counter()
            f.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    for k, ts in times.items():
        print(f"{k:12s} median {sorted(ts)[len(ts)//2]:7.3f}  all {ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
