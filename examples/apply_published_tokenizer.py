"""Tokenize a curated corpus with a REAL published tokenizer — the
normal last step before training shards, end-to-end:

  1. load a GPT-2-layout tokenizer.json (suffix-less ByteLevel,
     'Ġ'-prefix spaces) — the file here is synthesized with a small
     merge table so the example is self-contained and offline, but the
     loader accepts the actual gpt2/roberta/llama-3 files unchanged
     (50k+ merge tables route through the Arrow rank-dict path);
  2. encode the documents table to token-ID sequences at the
     distinct-piece grain (the corpus-sized plan is a broadcast join,
     never a per-row merge loop);
  3. pack the id sequences into fixed-budget training shards with
     SequencePacker and write a shard manifest;
  4. decode a shard row back to text (EXACT round-trip — the byte-
     level segmentation covers every character) for a loss-example
     audit.

The same flow works for the Llama-2/Mistral Metaspace layout
(normalizer Prepend '▁' + Replace ' '->'▁', byte_fallback <0xXX>
tokens) — swap the tokenizer.json.

Run: python examples/apply_published_tokenizer.py [sf_dir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import feature_factory_spark as ff
from feature_factory_spark.operators.bpe import _B2U


def synth_gpt2_tokenizer(path: str) -> None:
    """A structurally-faithful GPT-2-layout tokenizer.json: full
    256-symbol byte alphabet, a small merge table, the ByteLevel
    pre_tokenizer the real file carries."""
    merges = [["Ġ", "t"], ["h", "e"], ["Ġt", "he"], ["i", "n"],
              ["a", "n"], ["an", "d"], ["Ġ", "a"], ["e", "r"],
              ["o", "n"], ["Ġth", "e"]]
    vocab = {t: i for i, t in enumerate(sorted(set(_B2U.values())))}
    for left, right in merges:
        vocab.setdefault(left + right, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    doc = {
        "version": "1.0",
        "added_tokens": [{"id": vocab["<|endoftext|>"],
                          "content": "<|endoftext|>", "special": True}],
        "normalizer": None,
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "post_processor": None,
        "decoder": {"type": "ByteLevel"},
        "model": {"type": "BPE", "dropout": None, "unk_token": None,
                  "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "fuse_unk": False,
                  "byte_fallback": False, "vocab": vocab,
                  "merges": [f"{l} {r}" for l, r in merges]},
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ff_apply_tok_")
    tok_path = os.path.join(work, "tokenizer.json")
    synth_gpt2_tokenizer(tok_path)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. load — the engine adopts the file's segmentation, byte
    # alphabet, merge table, and id layout verbatim
    tok = ff.BpeVocabBuilder("text", "doc_id").load_tokenizer_json(
        tok_path, spark
    )
    print(f"loaded: segmentation={tok._segmentation} "
          f"merges={len(tok.merges_)} vocab={len(tok.vocab_json_)}")

    # 2. encode to training-ready id sequences
    with_ids = tok.encode_ids(docs).withColumn(
        "n_tokens", F.size("text_bpe_ids").cast("bigint")
    )

    # 3. pack into 2048-token shards per source
    packed = ff.SequencePacker(
        "n_tokens", budget=2048, order_col="doc_id",
        partition_cols=["source"],
    ).transform(with_ids)
    n_docs = packed.count()
    n_packs = packed.select("source", "pack_id").distinct().count()
    print(f"packed {n_docs} docs into {n_packs} shards of <=2048 tokens")

    # 4. audit: decode one document back — byte-level round-trip is
    # exact, so the decoded text equals the source text
    sample = packed.orderBy("doc_id").limit(1)
    audit = tok.decode_ids(sample).select(
        "doc_id", "text", "text_bpe_ids_text"
    ).collect()[0]
    assert audit["text_bpe_ids_text"] == audit["text"], "round-trip broke"
    print(f"decode audit ok: doc {audit['doc_id']} round-trips exactly")

    # 5. (r13) the SHARD-ROW export with EOS between documents: one
    # row per pack, input_ids carries the separator, the budget law
    # charged it — what the data loader actually reads
    eot = tok.vocab_json_["<|endoftext|>"]
    shards = ff.SequencePacker(
        "n_tokens", budget=2048, order_col="doc_id",
        partition_cols=["source"],
    ).materialize(with_ids, "text_bpe_ids", sep_id=eot)
    row = shards.orderBy("source", "pack_id").limit(1).collect()[0]
    print(f"shard row: {row['n_docs']} docs / {row['n_tokens']} tokens, "
          f"eos@{[i for i, v in enumerate(row['input_ids'][:50]) if v == eot][:3]}...")

    # 6. (r13) a literal '<|endoftext|>' in RAW corpus text maps to
    # the control id (HF AddedToken isolation) and round-trips
    probe = spark.createDataFrame(
        [(0, "text with a literal <|endoftext|> inside")],
        "doc_id bigint, text string",
    )
    enc = tok.encode_ids(probe)
    ids = list(enc.collect()[0]["text_bpe_ids"])
    assert ids.count(eot) == 1
    assert tok.decode_ids(enc).collect()[0]["text_bpe_ids_text"] == \
        "text with a literal <|endoftext|> inside"
    print("special isolation ok: literal <|endoftext|> -> control id "
          "-> text")

    # 7. (r13) the BERT-family (WordPiece) apply-mode — same corpus,
    # third published family: vocab.txt loader, [CLS]/[SEP] template
    wp_vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
                + list("abcdefghijklmnopqrstuvwxyz0123456789")
                + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
                + ["the", "table", "query", "value", "scan"])
    wp_path = os.path.join(work, "vocab.txt")
    open(wp_path, "w").write("\n".join(wp_vocab) + "\n")
    wp = ff.WordPieceTokenizer("text", "doc_id").load_vocab_txt(
        wp_path, spark
    )
    wp_out = wp.encode_ids(docs.limit(100), add_special_tokens=True)
    n = wp_out.select(F.sum(F.size("text_wordpiece_ids"))).collect()[0][0]
    print(f"wordpiece: 100 docs -> {n} ids (incl [CLS]/[SEP])")

    tok.release()
    spark.stop()


if __name__ == "__main__":
    main()
