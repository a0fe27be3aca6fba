"""Source readers and sink writers.

The reference reads CSV/Parquet with extension dispatch and errors on
anything else (examples/shared.rs:16-30) and ships no writers. Spark gives
us both directions; we add JSON/ORC and scale-aware write options
(partitioning, bucketing) since the engine targets multi-TB tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..exceptions import UnsupportedFormatError

def _read_csv(s, p, o):
    # defaults, not hard-coded: read(..., header=False) must override
    o.setdefault("header", True)
    o.setdefault("inferSchema", True)
    return s.read.options(**o).csv(p)


def _read_warc(s, p, o):
    from .warc import read_warc

    return read_warc(s, p, **o)


_READERS = {
    ".parquet": lambda s, p, o: s.read.options(**o).parquet(p),
    ".csv": _read_csv,
    ".json": lambda s, p, o: s.read.options(**o).json(p),
    # LLM corpora ship as JSON Lines; Spark's json reader is line-oriented
    ".jsonl": lambda s, p, o: s.read.options(**o).json(p),
    ".orc": lambda s, p, o: s.read.options(**o).orc(p),
    # raw text corpora: one row per line in a `value` string column
    # (pass lineSep/wholetext through options); Spark decompresses
    # .txt.gz/.txt.bz2 transparently via the same codec inference as
    # the other line-oriented readers
    ".txt": lambda s, p, o: s.read.options(**o).text(p),
    # raw media ingestion for the multimodal operators: whole files as
    # (path, modificationTime, length, content binary) rows — pair with
    # a pathGlobFilter option ('*.png') to select one media type. Only
    # reachable via fmt="binaryFile" (media extensions are too varied
    # for suffix dispatch).
    ".binaryFile": lambda s, p, o: s.read.options(**o).format("binaryFile").load(p),
    # raw web crawls (CommonCrawl layout): one row per WARC record —
    # .warc.gz dispatches here too (NOT via the line-codec suffix strip)
    # because gunzip happens inside the per-file record parser
    ".warc": _read_warc,
    ".warc.gz": _read_warc,
}


def read(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    min_partitions: int | None = None,
    **options,
) -> DataFrame:
    """Extension-dispatched reader (reference: examples/shared.rs:16-30).

    ``fmt`` overrides extension dispatch (e.g. a parquet dataset DIRECTORY
    without a .parquet suffix — the most common Spark layout). Without
    ``fmt``, extension-less paths fall back to parquet; an unknown
    extension raises UnsupportedFormatError, mirroring the reference's
    error path (examples/shared.rs:26-30).

    ``min_partitions`` repartitions the scan up to at least that many
    partitions when the file layout yields fewer. A table that fits in one
    parquet row group arrives as ONE input split, so every CPU-heavy
    per-row expression downstream runs on one core — a small corpus with
    expensive text/dedup features is bottlenecked on layout, not data
    size. At real scale the floor is a no-op (large tables already have
    thousands of splits); the shuffle it inserts moves only the small
    table once."""
    if fmt is not None:
        key = f".{fmt.lstrip('.')}"
        if key not in _READERS:
            raise UnsupportedFormatError(f"unsupported input format '{fmt}'")
        df = _READERS[key](spark, path, options)
    else:
        # dispatch on the final path segment with trailing slashes
        # stripped, so '/data/events.parquet/' reads like the same
        # dataset path without the slash. A compression suffix is
        # stripped only when the INNER extension is a line-oriented
        # format ('corpus.jsonl.gz' -> .jsonl): those readers
        # decompress the codec transparently. Anything else keeps the
        # full name — 'corpus.gz' (no inner extension) and
        # 'data.parquet.gz' (whole-file-compressed columnar, which no
        # reader can open) both raise UnsupportedFormatError instead of
        # handing a gzip stream to the parquet fallback.
        last = path.rstrip("/").rsplit("/", 1)[-1]
        if last.endswith(".zstd"):
            # Hadoop's ZStandardCodec registers ONLY the '.zst' extension
            # (verified in hadoop-client bytecode), so a '.zstd'-named
            # file would be read UNCOMPRESSED -> silent garbage rows.
            # Refuse loudly with the remedy instead.
            raise UnsupportedFormatError(
                f"'{path}': Spark/Hadoop decompress zstd only for the "
                "'.zst' extension — rename the file (or pass fmt= after "
                "decompressing out of band)"
            )
        for codec in (".gz", ".bz2", ".zst", ".lz4", ".snappy", ".deflate"):
            if last.endswith(codec):
                inner = last[: -len(codec)]
                if inner.endswith((".txt", ".json", ".jsonl", ".csv")):
                    last = inner
                break
        for ext, fn in _READERS.items():
            if last.endswith(ext):
                df = fn(spark, path, options)
                break
        else:
            if "." not in last:  # extension-less directory -> parquet dataset
                df = _READERS[".parquet"](spark, path, options)
            else:
                raise UnsupportedFormatError(
                    f"unsupported input format for '{path}' "
                    f"(supported: {', '.join(_READERS)})"
                )
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        # df.rdd instantiates the RDD lineage for this plan — a
        # plan-conversion cost only (no job runs); paid once per read()
        # call, acceptable for a count probe
        df = df.repartition(min_partitions)
    return df


def read_media(
    spark: SparkSession,
    path: str,
    media: str = "image",
    prefix: str = "media_",
    **options,
) -> DataFrame:
    """Raw media ingestion in one call: binaryFile scan + real decode.

    Reads whole files as (path, modificationTime, length, content) rows
    and appends decoded features from the matching pure-stdlib codec —
    ``media='image'`` (PNG/BMP/PPM: dims, channels, mean/std/entropy),
    ``'audio'`` (WAV PCM: channels, rate, duration, RMS, peak, zcr), or
    ``'video'`` (MP4/MOV container probe: brand, duration, dims, track
    shape, codecs), ``'pdf'`` (document-structure probe: version,
    page/object counts, encryption, truncation), or ``'pdf_text'``
    (the probe PLUS real FlateDecode + content-stream text extraction —
    text, pages-with-text, show-op and char counts — the document slice
    of a curation chain in one read). Undecodable files get
    NULL features, not task failures. Pass ``pathGlobFilter='*.png'`` (etc.) through options to
    select one media type from a mixed directory.

    The decode is a narrow Arrow-batched map over the scan — the plan
    parallelizes with the file listing, no shuffle."""
    from ..operators.audiocodec import audio_schema, wav_decoder
    from ..operators.imagecodec import image_decoder, image_schema
    from ..operators.multimodal import BinaryFeatureExtractor
    from ..operators.pdfcodec import (
        pdf_decoder,
        pdf_full_decoder,
        pdf_full_schema,
        pdf_schema,
    )
    from ..operators.videocodec import mp4_decoder, video_schema

    table = {
        "image": (image_decoder, image_schema),
        "audio": (wav_decoder, audio_schema),
        "video": (mp4_decoder, video_schema),
        "pdf": (pdf_decoder, pdf_schema),
        "pdf_text": (pdf_full_decoder, pdf_full_schema),
    }
    if media not in table:
        raise UnsupportedFormatError(
            f"unsupported media kind '{media}' (supported: "
            f"{', '.join(table)})"
        )
    decoder, schema = table[media]
    df = read(spark, path, fmt="binaryFile", **options)
    return BinaryFeatureExtractor(
        "content", decoder=decoder, feature_schema=schema(), prefix=prefix
    ).transform(df)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    sort_within_partitions: list[str] | None = None,
    **options,
) -> None:
    """Scale-aware sink. partition_by enables partition pruning for
    downstream readers; max_records_per_file bounds output file sizes so a
    1000-executor read parallelizes evenly; sort_within_partitions orders
    rows inside each output task before writing — for parquet/orc this
    tightens the per-row-group min/max statistics on the sort keys, so a
    downstream filter on those keys skips whole row groups (zone-map
    pruning) instead of scanning them, and clustered values compress
    better. A task-local sort, no shuffle."""
    if fmt not in ("parquet", "csv", "json", "orc"):
        raise UnsupportedFormatError(f"unsupported output format '{fmt}'")
    if fmt == "csv":
        options.setdefault("header", True)  # symmetric with read()'s header=True
    if sort_within_partitions:
        # with partition_by, FileFormatWriter requires its input ordered
        # on the partition columns and inserts its own (non-stable) sort
        # when it is not — which would destroy the requested key order.
        # Sorting on (partition cols, sort keys) satisfies the writer's
        # required ordering up front, so no destructive re-sort happens
        # and rows inside every output file stay ordered on the keys.
        keys = [*(partition_by or []), *sort_within_partitions]
        df = df.sortWithinPartitions(*keys)
    w = df.write.mode(mode).options(**options)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def compact_to(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    target_records_per_file: int,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    writer_options: dict | None = None,
    **options,
) -> int:
    """Compact a dataset of many small files into evenly sized ones,
    written to ``dest_path``. Returns the row count written.

    Incremental appends (run_incremental, micro-batch sinks) accrete
    small files; at 100 TB that means millions of file-open round trips
    and task-scheduling overhead per scan. Two passes over the source:
    a counting pass (metadata-only for parquet/orc — row counts come
    from footers; a real parse for csv/json) sizes the output at
    ceil(rows / target_records_per_file) files, then the
    shuffle-and-write pass rewrites them balanced (a full-shuffle
    repartition — coalesce would merge unevenly and skew file sizes).
    ``**options`` go to the reader; ``writer_options`` to the writer
    (e.g. ``{"compression": "zstd"}``).

    With ``partition_by``, rows are hash-clustered on the partition
    columns so a task holds whole partition values — a round-robin
    repartition would scatter every value across every task and
    multiply the file count by the partition cardinality. A value with
    more rows than the target still lands on one task (parallelism
    skew; pre-salt a synthetic column if that dominates), but its
    output is split into target-sized files via maxRecordsPerFile,
    which bounds file sizes in every mode.

    The compacted copy is written to a NEW path: an in-place rewrite
    cannot be atomic on object stores (rename is copy+delete), so the
    safe pattern is compact to the side, validate, then repoint readers
    (table location / catalog). This helper deliberately does not
    delete the source.

    Structured Streaming sink caveat: a sink written by
    ``run_incremental`` carries a ``_spark_metadata`` commit log, and
    batch reads of such a root return ONLY files listed in that log.
    This helper reads the committed set (correct), but the compacted
    copy must NEVER become the target of the SAME streaming
    checkpoint's future appends — the query would start a fresh
    ``_spark_metadata`` at the swapped path listing only post-swap
    batches, silently hiding the compacted history from readers. Serve
    reads from the compacted copy and keep appending to the raw sink,
    or re-baseline with a fresh checkpoint + sink after the swap."""
    from ..validation import ensure

    ensure(target_records_per_file >= 1, "target_records_per_file must be >= 1")
    if fmt not in ("parquet", "csv", "json", "orc"):
        # fail before the counting scan, not after it (write()'s check
        # would otherwise fire with a full pass already burned)
        raise UnsupportedFormatError(f"unsupported output format '{fmt}'")
    df = read(spark, source_path, fmt=fmt, **options)
    rows = df.count()
    n_files = max(1, -(-rows // target_records_per_file))  # ceil
    if partition_by:
        df = df.repartition(n_files, *partition_by)
    else:
        df = df.repartition(n_files)
    write(
        df,
        dest_path,
        fmt=fmt,
        mode="error",
        partition_by=partition_by,
        max_records_per_file=target_records_per_file,
        sort_within_partitions=sort_within_partitions,
        **(writer_options or {}),
    )
    return rows


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a bucketed (and optionally sorted) table.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle (co-located sort-merge join) — at 100 TB this is
    the difference between a join that moves the fact table over the
    network and one that doesn't. Bucketing requires saveAsTable (the
    bucket metadata lives in the catalog)."""
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    """Load the driver's synthetic parquet tables (TESTDATA.md)."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its `ts` column normalised to TimestampType.

    The testdata has shipped `ts` as both TIMESTAMP(NANOS) (earlier
    generations) and plain timestamp[us] (current), so the loader
    dispatches on the SCANNED dtype instead of assuming one physical
    encoding:

    - TimestampType       -> pass through unchanged.
    - TimestampNTZType    -> cast to TimestampType (the session runs in
      UTC so the cast is value-identical; downstream windows/oracles
      were written against the zoned type).
    - LongType            -> the column was scanned as raw nanos (a
      session already carries spark.sql.legacy.parquet.nanosAsLong);
      truncate to micros via exact integer division.
    - scan REJECTED       -> genuinely-nanos file on a default session;
      re-read under the legacy nanos flag, then truncate. The flag is
      session-global and only consulted at scan planning time, so it is
      restored before returning.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = f"{sf_dir}/events.parquet"

    def _normalise(df: DataFrame) -> DataFrame:
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # raw nanoseconds since epoch -> exact truncation to micros
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(dt, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df

    try:
        return _normalise(spark.read.parquet(path))
    except Exception as exc:  # TIMESTAMP(NANOS) rejected at scan planning
        # only the nanos rejection triggers the legacy-flag retry: any
        # other unsupported-type error should surface directly instead
        # of being masked by (and re-raised from inside) the retry path
        if "NANOS" not in str(exc):
            raise

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        out = _normalise(spark.read.parquet(path))
        # force analysis (schema resolution) while the flag is active; the
        # resolved plan keeps the nanos-as-long scan after the reset
        out.schema  # noqa: B018
        return out
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
