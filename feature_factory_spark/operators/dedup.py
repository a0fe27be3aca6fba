"""Deduplication operators for LLM training-data pipelines.

The reference has no dedup operators (SURVEY.md §2.3); this module is the
beyond-reference scale surface. Every strategy is candidate-generation +
exact verification, never an all-pairs cartesian (all-pairs is instant
death at 100 TB — the LSH band join produces candidate pairs only):

- ExactDeduplicator:    one shuffle on a content-hash key (hash keys are
                        uniformly distributed — no skew), window row_number.
- MinHashDeduplicator:  shingle -> minhash signature -> banded bucket
                        self-join -> exact Jaccard verification.
- SimHashDeduplicator:  64-bit simhash -> 16-bit chunk blocking ->
                        hamming-distance verification (bit_count(xor)).
- NGramJaccardDeduplicator: exact shingle Jaccard; all-pairs mode is
                        gated behind ``all_pairs=True`` for small data /
                        oracle checks, default goes through MinHash
                        candidates.
- EmbeddingDeduplicator: cosine near-dup via random-hyperplane LSH
                        buckets (scale path) or brute force (small data).

All near-dup operators share two drop policies (``policy=``):
- 'greedy' (default): drop a row when it pairs with a SMALLER id.
  Deterministic and fully lazy, but on chain-shaped clusters (pairs
  (1,5),(3,5) without (1,3)) it keeps more than one member.
- 'components': exact transitive clustering via distributed min-label
  propagation (functions/graph.connected_components) — each cluster
  keeps exactly its minimum-id representative. Runs a few driver-checked
  iterations, so transform() triggers jobs under this policy.

Zero Python UDFs: murmur3/xxhash64, higher-order array functions, and
bit_count are all JVM-side.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import cosine_expr, double_array_literal
from ..functions.frames import one_slice_frame
from ..functions.graph import duplicate_ids
from ..functions.text import (
    MERSENNE_P31,
    base_hash_expr,
    jaccard_expr,
    normalized_text_expr,
    shingles_expr,
    universal_rehash_expr,
    words_expr,
)
from ..pipeline import Transformer
from ..validation import ensure, validate_columns, validate_string_columns


class ExactDeduplicator(Transformer):
    """Remove exact-duplicate rows by content hash, keeping the row with
    the smallest ``id_col`` per key.

    ``columns`` defines the content key (md5 over the concatenated,
    optionally normalized values). One shuffle, partitioned by the hash
    key — uniformly distributed, skew-free, AQE-coalescible."""

    def __init__(
        self,
        columns: list[str],
        id_col: str,
        normalize: bool = False,
        index_buckets: int = 64,
    ):
        ensure(bool(columns), "at least one content column is required")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        self.columns = list(columns)
        self.id_col = id_col
        self.normalize = normalize
        self.index_buckets = index_buckets

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, self.columns + [self.id_col])

    def _key_expr(self) -> Column:
        parts = [
            normalized_text_expr(F.col(c).cast("string"))
            if self.normalize
            else F.col(c).cast("string")
            for c in self.columns
        ]
        return F.md5(F.concat_ws("", *parts))

    def _transform(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self._key_expr()).orderBy(F.col(self.id_col))
        return (
            df.withColumn("__ff_rn", F.row_number().over(w))
            .where(F.col("__ff_rn") == 1)
            .drop("__ff_rn")
        )

    # --- persisted corpus index (recrawl workflow, r8) ---------------
    #
    # The exact tier of the incremental-dedup story (production
    # recrawls run exact dedup BEFORE any near-dup pass): the index is
    # just the corpus's distinct content hashes, partitioned by a pmod
    # bucket of the hash so a batch probe is a file-pruned semi-join.

    def _index_meta(self) -> dict:
        return {
            "kind": "exact",
            "columns": "|".join(self.columns),
            "normalize": self.normalize,
            "n_buckets": self.index_buckets,
        }

    def _hashed(self, df: DataFrame) -> DataFrame:
        return df.select(self._key_expr().alias("h")).distinct().withColumn(
            "hb",
            F.pmod(
                F.conv(F.substring("h", 1, 6), 16, 10).cast("bigint"),
                F.lit(self.index_buckets),
            ),
        )

    def write_index(self, df: DataFrame, path: str, mode: str = "error") -> None:
        """Materialize the corpus's distinct content hashes at
        ``<path>/hashes`` PARTITIONED BY a pmod bucket of the hash
        (+ the parameter-pinning ``<path>/meta``); ``mode='append'``
        accumulates snapshots (duplicate hash rows across appends are
        harmless — probes are semi-joins)."""
        import os

        self._check_input(df)
        hashed = self._hashed(df)
        hashed.repartition(F.col("hb")).write.mode(mode).partitionBy(
            "hb"
        ).parquet(os.path.join(path, "hashes"))
        _write_index_meta(df.sparkSession, path, self._index_meta(), mode)

    def dedupe_against(
        self, df: DataFrame, path: str, include_self: bool = True
    ) -> DataFrame:
        """Drop every row of a new batch whose content hash exists in
        the index at ``path`` (file-pruned anti-join: only the batch's
        hash buckets are scanned), then exact-dedupe within the batch
        (``include_self``). Survivors equal a full-corpus recompute
        restricted to the batch whenever the index holds every prior
        doc (hash membership has no id-order subtlety)."""
        import os

        self._check_input(df)
        spark = df.sparkSession
        _check_index_meta(spark, path, self._index_meta())
        batch = self._hashed(df)
        # one partition column -> a plain bounded-collect isin is the
        # whole prune filter (at most _INDEX_BUCKETS values)
        idx = spark.read.parquet(os.path.join(path, "hashes")).where(
            F.col("hb").isin(
                [r["hb"] for r in batch.select("hb").distinct().collect()]
            )
        )
        out = df.join(
            idx.select(F.col("h").alias("__ff_idx_h")),
            on=self._key_expr() == F.col("__ff_idx_h"),
            how="left_anti",
        )
        return self._transform(out) if include_self else out


def _minhash_constants(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P31), rng.randrange(0, MERSENNE_P31))
        for _ in range(num_perm)
    ]


def _drop_by_policy(
    df: DataFrame, id_col: str, pairs: DataFrame, policy: str
) -> DataFrame:
    """Shared transform tail for the near-dup operators: anti-join out the
    ids the chosen policy marks as duplicates (see module docstring)."""
    ensure(policy in ("greedy", "components"), "policy: 'greedy' or 'components'")
    if policy == "components":
        dups = duplicate_ids(pairs)
    else:
        dups = pairs.select(F.col("b_id").alias("dup_id")).distinct()
    return df.join(dups, on=df[id_col] == dups["dup_id"], how="left_anti")


# --- persisted-index (incremental / recrawl) machinery ----------------
#
# write_index lays the corpus's blocking keys out PARTITIONED BY
# (blocking unit, pmod(key, n_buckets)); dedupe_against then scans ONLY
# the partitions the new batch's keys map to — the recrawl workflow
# (dedupe snapshot N+1 against the accumulated corpus without
# recomputing it), the IVFCosineTopK.write_index layout precedent.

_INDEX_BUCKETS = 64  # default pmod(key) sub-partitioning per blocking unit
# (operators take index_buckets=: more buckets = finer probe pruning but
# more partition dirs/files — at fixture scale the file-creation
# overhead of units x buckets tiny dirs dominates the write, so tests
# and the entry member use a small value; at corpus scale the default
# 64 is cheap and prunes a small probe to ~1/buckets of each unit)


def _write_index_meta(spark, path: str, meta: dict, mode: str) -> None:
    import os

    meta_path = os.path.join(path, "meta")
    if mode == "append":
        # appending a snapshot must not duplicate the meta row — pin
        # the new rows against the parameters already on disk instead
        has_meta = False
        try:
            _check_index_meta(spark, path, meta)
            has_meta = True
        except Exception as exc:  # noqa: BLE001 — re-raise param clashes
            from ..exceptions import InvalidParameterError

            if isinstance(exc, InvalidParameterError):
                raise
            # no readable meta yet (first write with mode='append')
        if has_meta:
            _log_index_version(spark, path, "append")
            return
    one_slice_frame(
        spark,
        [tuple(str(v) for v in meta.values())],
        ", ".join(f"{k} string" for k in meta),
    ).write.mode(
        "overwrite" if mode == "append" else mode
    ).parquet(meta_path)
    _log_index_version(spark, path, "write")


def _log_index_version(spark, path: str, op: str,
                       n_rows: int | None = None) -> None:
    """Append one row to the index's ``<path>/versions`` audit log:
    (version, op, n_rows). Non-append ops RESET the log (the index was
    rewritten). The log is the cheap answer to "how many recrawl
    appends has this index accumulated since its last compaction" —
    the signal that schedules :func:`compact_index`."""
    import os

    from pyspark.errors import AnalysisException

    vpath = os.path.join(path, "versions")
    prev = 0
    reset = op in ("write", "compact")
    if not reset:
        try:
            prev = (
                spark.read.parquet(vpath)
                .agg(F.max("version"))
                .collect()[0][0]
                or 0
            )
        except AnalysisException as e:
            # Only the MISSING-PATH case (first append on a legacy
            # index without a log) restarts at 0; a transient storage
            # error or corrupt footer must propagate — silently
            # resetting the counter would corrupt the audit trail
            # compact_index/audit_index read (r10 verdict #1, the
            # index_versions fix applied to the write side).
            msg = str(e)
            if not ("PATH_NOT_FOUND" in msg
                    or "Path does not exist" in msg):
                raise
            prev = 0
    one_slice_frame(
        spark,
        [(int(prev) + 1, op, n_rows)],
        "version int, op string, n_rows bigint",
    ).write.mode("overwrite" if reset else "append").parquet(vpath)


def index_versions(spark, path: str) -> list[dict]:
    """The ``versions`` audit rows of an index, oldest first ([] for a
    pre-r9 index that has no log).

    Only the MISSING-PATH case maps to [] — a storage-permission error
    or corrupt footer during an audit_index health check must propagate,
    not read as "no history"."""
    import os

    from pyspark.errors import AnalysisException

    vpath = os.path.join(path, "versions")
    try:
        rows = spark.read.parquet(vpath).orderBy("version").collect()
    except AnalysisException as e:
        # PATH_NOT_FOUND / legacy index without a log; anything else
        # (corrupt footer, schema failure) is a real error
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return []
        raise
    return [r.asDict() for r in rows]


def _partition_cols(spark, dpath: str) -> list[str]:
    """Partition columns of a parquet dataset dir, discovered from the
    ``col=value`` directory chain via Hadoop's FileSystem (any storage
    scheme)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    cur = jvm.org.apache.hadoop.fs.Path(dpath)
    fs = cur.getFileSystem(conf)
    cols: list[str] = []
    while True:
        nxt = None
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name and not name.startswith("_"):
                nxt = st.getPath()
                break
        if nxt is None:
            return cols
        cols.append(nxt.getName().split("=", 1)[0])
        cur = nxt


def _index_datasets(spark, path: str) -> list[str]:
    """Names of the index's parquet dataset dirs (everything but the
    ``meta`` pin and the ``versions`` log)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name not in ("meta", "versions") and not (
            name.startswith("_") or name.startswith(".")
        ):
            out.append(name)
    return sorted(out)


def compact_index(
    spark,
    source_path: str,
    dest_path: str,
    target_records_per_file: int = 5_000_000,
) -> dict:
    """Compact an accumulated dedup index: every ``mode='append'``
    recrawl adds files per partition dir, and after N appends a probe
    opens N small files per scanned bucket. This rewrites each dataset
    PRESERVING its partition layout (discovered from the directory
    chain) with balanced, bounded file sizes — the ``compact_to``
    recipe per dataset — copies the parameter-pinning ``meta``
    verbatim, and starts the new index's ``versions`` log with a
    ``compact`` row.

    Side-write, never in-place (the ``compact_to`` contract: an
    in-place rewrite cannot be atomic on object stores): compact to a
    NEW path, validate (``audit_index``/a probe), then repoint the
    recrawl loop. Returns {dataset: rows_written}. Probes against the
    compacted index return the same results — partitioning, bucketing
    parameters, and content are unchanged, so the physical file
    pruning keeps working."""
    import os

    from ..sources.io import compact_to

    ensure(
        bool(_index_datasets(spark, source_path)),
        f"no index datasets found at {source_path}",
    )
    written: dict[str, int] = {}
    # pin partition values as strings for the rewrite: with type
    # inference on, a STRING partition column with numeric-looking
    # values ('unit=09') reads back as int 9 and rewrites as 'unit=9',
    # changing both value and directory layout. Disabled, every value
    # round-trips byte-identically (int dirs render the same digits);
    # probes re-reading the compacted index still infer their types
    # from the unchanged dir names.
    _INFER = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(_INFER, "true")
    spark.conf.set(_INFER, "false")
    try:
        for name in _index_datasets(spark, source_path):
            src = os.path.join(source_path, name)
            pcols = _partition_cols(spark, src)
            written[name] = compact_to(
                spark,
                src,
                os.path.join(dest_path, name),
                target_records_per_file,
                partition_by=pcols or None,
            )
    finally:
        spark.conf.set(_INFER, prev_infer)
    # parameter-pinning meta rides along verbatim when present (the
    # dedup tiers); the ANN indexes (IVF corpus+centroids layout) have
    # no meta dir and compact the same way
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    mp = jvm.org.apache.hadoop.fs.Path(os.path.join(source_path, "meta"))
    if mp.getFileSystem(conf).exists(mp):
        meta = spark.read.parquet(os.path.join(source_path, "meta"))
        meta.coalesce(1).write.mode("error").parquet(
            os.path.join(dest_path, "meta")
        )
    _log_index_version(
        spark, dest_path, "compact", sum(written.values())
    )
    return written


def audit_index(spark, path: str) -> dict:
    """Physical audit of an index: per dataset the row count (parquet
    footers — a metadata-only job) and the data-file count, plus the
    ``versions`` log. The n_files growth across versions is the
    compaction signal; n_rows before/after a compaction must match."""
    import os

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    datasets: dict[str, dict] = {}
    for name in _index_datasets(spark, path):
        dpath = os.path.join(path, name)
        n_rows = spark.read.parquet(dpath).count()
        p = jvm.org.apache.hadoop.fs.Path(dpath)
        fs = p.getFileSystem(conf)
        it = fs.listFiles(p, True)
        n_files = 0
        while it.hasNext():
            st = it.next()
            fname = st.getPath().getName()
            if not fname.startswith(("_", ".")):
                n_files += 1
        datasets[name] = {"n_rows": n_rows, "n_files": n_files}
    return {"datasets": datasets, "versions": index_versions(spark, path)}


def _check_index_meta(spark, path: str, expect: dict) -> None:
    """Fail-loud parameter pinning: an index probed with different
    parameters than it was written with would silently miss pairs."""
    import os

    rows = spark.read.parquet(os.path.join(path, "meta")).collect()
    ensure(len(rows) == 1, f"index at {path} has a malformed meta table")
    got = rows[0].asDict()
    for k, v in expect.items():
        ensure(
            got.get(k) == str(v),
            f"index at {path} was written with {k}={got.get(k)!r}, "
            f"but this operator is configured with {k}={v!r}; use a "
            "matching operator or rewrite the index",
        )


def _prune_filter(keys: DataFrame, c1: str, c2: str):
    """OR-of-partition-values filter from the new batch's DISTINCT
    blocking keys — at most n_units x n_buckets rows (a bounded
    collect), pushed as static predicates on the index's partition
    columns so the scan is file-pruned."""
    from collections import defaultdict

    per: dict = defaultdict(list)
    for r in keys.select(c1, c2).distinct().collect():
        per[r[c1]].append(r[c2])
    if not per:
        return F.lit(False)
    conds = [
        (F.col(c1) == F.lit(k)) & F.col(c2).isin(v) for k, v in per.items()
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


class MinHashDeduplicator(Transformer):
    """Near-duplicate removal via banded MinHash-LSH + exact Jaccard
    verification.

    Pipeline (all lazy DataFrame ops, no driver collection):
    1. shingle: distinct n-word shingles per document;
    2. signature: ``num_perm`` universal-hash minima over 31-bit murmur3
       shingle hashes (constants from a seeded RNG — deterministic);
    3. band: signature split into ``bands`` bands of num_perm/bands rows;
       band hash = murmur3 of the band's values;
    4. block: self-join on (band index, band hash) — candidate pairs only;
    5. verify: exact shingle-set Jaccard on candidates; keep pairs with
       jaccard >= threshold.

    With num_perm=64, bands=16 (r=4), P(candidate | j=0.7) per band is
    0.24, overall 1-(1-0.7^4)^16 ≈ 0.99 — recall at the threshold is
    near-total, and false candidates are removed by the exact check.

    transform() drops every row whose id appears as the LARGER member of a
    verified pair. candidate_pairs() exposes the verified pair frame."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        num_perm: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        threshold: float = 0.7,
        seed: int = 42,
        persist_shingles: bool = True,
        policy: str = "greedy",
        bucket_pairing: str = "star",
        index_buckets: int = _INDEX_BUCKETS,
    ):
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        ensure(num_perm % bands == 0, "num_perm must be divisible by bands")
        ensure(0.0 < threshold <= 1.0, "threshold must be in (0,1]")
        ensure(shingle_n >= 1, "shingle_n must be >= 1")
        ensure(
            bucket_pairing in ("all", "star"),
            "bucket_pairing must be 'all' or 'star'",
        )
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.seed = seed
        # the shingle frame feeds three DAG branches (signature, verify-a,
        # verify-b); persisting it avoids re-shingling the corpus 3x.
        # Storage is MEMORY_AND_DISK and blocks are released by Spark's
        # ContextCleaner once the result DataFrame is garbage-collected.
        self.persist_shingles = persist_shingles
        self.policy = policy
        # 'star' (default): only (bucket-min, member) pairs — linear in
        # bucket size. Exact for true-duplicate clusters (all members
        # pair with the min); an approximation for chains where only
        # non-min members exceed the threshold. This is the 100 TB-safe
        # default: boilerplate-heavy crawls create giant buckets, and
        # the drop policies (greedy/components) consume exactly the
        # star pair set.
        # 'all' (opt-in): every pair within a bucket — the complete
        # candidate set for pair-complete analytics, but a bucket
        # holding B near-identical docs yields B^2/2 pairs, which is
        # the scale-killer under mass duplication.
        self.bucket_pairing = bucket_pairing
        self.index_buckets = index_buckets
        self._constants = _minhash_constants(num_perm, seed)

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.text_col])
        validate_columns(df, [self.id_col])

    def _shingled(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("id"),
            shingles_expr(words_expr(F.col(self.text_col)), self.shingle_n).alias("sh"),
        )

    def _signature_expr(self) -> Column:
        # operates on the pre-materialized 'hs' hash array: hashing the
        # shingles once instead of once per permutation (CollapseProject
        # keeps the multi-referenced transform in its own projection).
        # ONE fold over the shingle hashes with the (a, b) permutation
        # constants as a zipped literal — not num_perm independent
        # array passes: same (a*h + b) mod p values, and the running
        # element-wise least equals array_min (order-independent
        # integer min), so signatures are bit-identical. The guard
        # reproduces the degenerate cases exactly: a NULL or empty
        # shingle array signs as [null] * num_perm, as before.
        n = len(self._constants)
        # The zipped (a, b) constants MUST pre-fold to a single Literal:
        # arrays_zip is not constant-folded, and inside the fold's
        # lambda it would be re-evaluated once per shingle hash per row
        # (measured 2x on the signature job). from_json of a literal
        # JSON string folds to one Literal(ArrayData) node — the
        # string_array_literal discipline; bigint constants always ride
        # JSON exactly.
        import json as _json

        ab = F.from_json(
            F.lit(_json.dumps(
                [{"a": a, "b": b} for a, b in self._constants]
            )),
            "array<struct<a: bigint, b: bigint>>",
        )
        init = F.array_repeat(
            F.lit(MERSENNE_P31).cast("bigint"), n
        )
        folded = F.aggregate(
            F.col("hs"),
            init,
            lambda acc, h: F.zip_with(
                acc,
                ab,
                lambda m, c: F.least(
                    m, F.pmod(c["a"] * h + c["b"], F.lit(MERSENNE_P31))
                ),
            ),
        )
        return F.when(F.size(F.col("hs")) > 0, folded).otherwise(
            F.array_repeat(F.lit(None).cast("bigint"), n)
        )

    def _banded(self, sh: DataFrame) -> DataFrame:
        """(id, band, bkey) blocking keys from a shingled frame."""
        hashed = sh.select(
            "id", "sh", F.transform(F.col("sh"), base_hash_expr).alias("hs")
        )
        sig = hashed.select("id", "sh", self._signature_expr().alias("sig"))
        return sig.select(
            "id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * self.rows_per_band + r + 1)
                                    for r in range(self.rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(self.bands)
                ])
            ).alias("bk"),
        ).select("id", "bk.band", "bk.bkey")

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        """Verified near-dup pairs: (a_id, b_id, jaccard), a_id < b_id."""
        self._check_input(df)
        sh = self._shingled(df)
        if self.persist_shingles and not df.isStreaming:
            from pyspark import StorageLevel

            sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        return self._pairs_from_shingled(sh)

    def _pairs_from_shingled(self, sh: DataFrame) -> DataFrame:
        """Banded blocking + exact Jaccard verification over an
        (already persisted) shingled frame."""
        bands = self._banded(sh)
        if self.bucket_pairing == "star":
            mins = bands.groupBy("band", "bkey").agg(F.min("id").alias("min_id"))
            cand = (
                bands.join(mins, ["band", "bkey"])
                .where(F.col("id") > F.col("min_id"))
                .select(F.col("min_id").alias("a_id"), F.col("id").alias("b_id"))
                .distinct()
            )
        else:
            a, b = bands.alias("a"), bands.alias("b")
            cand = (
                a.join(b, on=[F.col("a.band") == F.col("b.band"), F.col("a.bkey") == F.col("b.bkey"), F.col("a.id") < F.col("b.id")])
                .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
                .distinct()
            )
        sa = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
        sb = sh.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
        return (
            cand.join(sa, "a_id")
            .join(sb, "b_id")
            .select("a_id", "b_id", jaccard_expr(F.col("a_sh"), F.col("b_sh")).alias("jaccard"))
            .where(F.col("jaccard") >= F.lit(self.threshold))
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return _drop_by_policy(df, self.id_col, self.candidate_pairs(df), self.policy)

    # --- persisted corpus index (recrawl workflow, r8) ---------------

    def _index_meta(self) -> dict:
        return {
            "kind": "minhash",
            "num_perm": self.num_perm,
            "bands": self.bands,
            "shingle_n": self.shingle_n,
            "threshold": self.threshold,
            "seed": self.seed,
            "n_buckets": self.index_buckets,
        }

    def write_index(self, df: DataFrame, path: str, mode: str = "error") -> None:
        """Materialize the corpus's dedup index at ``path``:

        - ``<path>/bands`` — (id, bkey) PARTITIONED BY (band,
          bb=pmod(bkey, index_buckets)): a probe scans only the
          partitions the new batch's band keys map to.
        - ``<path>/shingles`` — (id, sh), the shingle sets exact
          Jaccard verification needs. This is the large half (roughly
          corpus token volume); signature-only verification would
          avoid it at the cost of approximate scores — exact-verify
          MinHash inherently re-reads candidate shingle sets.
        - ``<path>/meta`` — the operator parameters, pinned at probe
          time so an index probed with mismatched parameters fails
          loudly instead of silently missing pairs.

        ``mode='append'`` accumulates snapshots: after
        ``dedupe_against``, append the SURVIVORS so the index tracks
        the deduped corpus."""
        import os

        self._check_input(df)
        sh = self._shingled(df)
        bands = self._banded(sh).withColumn(
            "bb", F.pmod(F.col("bkey"), F.lit(self.index_buckets))
        )
        # repartition on the partition columns first: partitionBy from N
        # shuffle tasks otherwise writes up to N files per partition
        # value (a small-file explosion at every scale); after the
        # shuffle each (band, bb) dir gets as many files as tasks hold
        # its rows — ~1 at fixture scale, rows/task-bounded at 100 TB
        bands.repartition(F.col("band"), F.col("bb")).write.mode(
            mode
        ).partitionBy("band", "bb").parquet(os.path.join(path, "bands"))
        sh.write.mode(mode).parquet(os.path.join(path, "shingles"))
        _write_index_meta(df.sparkSession, path, self._index_meta(), mode)

    def pairs_against(
        self, df: DataFrame, path: str, _sh: DataFrame | None = None
    ) -> DataFrame:
        """Verified pairs (a_id = indexed doc, b_id = new doc, jaccard)
        between a new batch and the index at ``path``. The index band
        scan is file-pruned to the new batch's (band, bucket) keys —
        a bounded-collect static filter (at most bands x 64 values), so
        a small recrawl batch touches a small fraction of the index.
        ``_sh`` lets ``dedupe_against`` pass an already-persisted
        shingled frame so the batch is shingled once, not per pass."""
        import os

        self._check_input(df)
        spark = df.sparkSession
        _check_index_meta(spark, path, self._index_meta())
        if _sh is not None:
            sh_new = _sh
        else:
            sh_new = self._shingled(df)
            if self.persist_shingles and not df.isStreaming:
                from pyspark import StorageLevel

                sh_new = sh_new.persist(StorageLevel.MEMORY_AND_DISK)
        bands_new = self._banded(sh_new).withColumn(
            "bb", F.pmod(F.col("bkey"), F.lit(self.index_buckets))
        )
        idx_bands = spark.read.parquet(os.path.join(path, "bands")).where(
            _prune_filter(bands_new, "band", "bb")
        )
        cand = (
            idx_bands.alias("a")
            .join(
                bands_new.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.bkey") == F.col("b.bkey"),
                    # a re-submitted id never pairs with itself
                    F.col("a.id") != F.col("b.id"),
                ],
            )
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .distinct()
        )
        idx_sh = spark.read.parquet(os.path.join(path, "shingles")).select(
            F.col("id").alias("a_id"), F.col("sh").alias("a_sh")
        )
        new_sh = sh_new.select(
            F.col("id").alias("b_id"), F.col("sh").alias("b_sh")
        )
        return (
            cand.join(idx_sh, "a_id")
            .join(new_sh, "b_id")
            .select(
                "a_id",
                "b_id",
                jaccard_expr(F.col("a_sh"), F.col("b_sh")).alias("jaccard"),
            )
            .where(F.col("jaccard") >= F.lit(self.threshold))
        )

    def dedupe_against(
        self, df: DataFrame, path: str, include_self: bool = True
    ) -> DataFrame:
        """Dedupe a new batch against the persisted corpus index: a new
        row matching ANY indexed row is dropped regardless of id order
        (the accumulated corpus is authoritative); within the batch the
        configured ``policy`` applies (``include_self=False`` skips the
        within-batch pass). When ids are monotone across snapshots
        (index ids < new ids — the natural recrawl numbering) and the
        index holds every prior doc, the survivors equal a greedy
        full-corpus recompute restricted to the new batch.

        The batch is shingled ONCE (persisted) — the prune-key collect,
        the index probe, and the within-batch pass all read the same
        frame."""
        self._check_input(df)
        sh = self._shingled(df)
        if self.persist_shingles and not df.isStreaming:
            from pyspark import StorageLevel

            sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        corpus_dups = self.pairs_against(df, path, _sh=sh).select(
            F.col("b_id").alias("dup_id")
        ).distinct()
        out = df.join(
            corpus_dups, on=df[self.id_col] == corpus_dups["dup_id"],
            how="left_anti",
        )
        if include_self:
            out = _drop_by_policy(
                out, self.id_col, self._pairs_from_shingled(sh), self.policy
            )
        return out


def hamming_blocked_pairs(
    sig: DataFrame, n_bits: int, hamming_threshold: int
) -> DataFrame:
    """Verified near-dup pairs (a_id, b_id, hamming), a_id < b_id, for a
    ``(id, sig)`` signature frame, via pigeonhole chunk blocking.

    The signature is split into ``hamming_threshold + 1`` disjoint
    chunks of ``n_bits // n_chunks`` bits: two signatures within the
    threshold must agree on at least one chunk, so blocking on (chunk
    index, chunk value) has exact recall at every threshold. (Bits past
    ``width * n_chunks`` — possible when n_chunks does not divide
    n_bits — are simply uncovered by any chunk, which can only ADD
    candidates, never lose a pair.) Candidates are verified with the
    exact ``bit_count(a XOR b)`` distance. Shared by
    SimHashDeduplicator (text) and ImageDeduplicator (perceptual
    hashes, operators/imagehash.py).

    The signature frame feeds BOTH sides of the blocking self-join, so
    without materialization its producer chain (the text shingle/hash
    fold, or a media decode behind a Python boundary) executes twice
    per action. ``(id, sig)`` is 16 bytes/row — strictly cheaper to
    persist than to recompute — so it rides MEMORY_AND_DISK exactly
    like the MinHash shingle frame and the recrawl batch signature
    (ContextCleaner unpersists when the result frame is released;
    re-persisting the recrawl path's already-persisted frame at the
    same level is a no-op). Measured on the sf0.1 image member:
    1.5 s -> 1.0 s per materialization, identical pairs."""
    if not sig.isStreaming:
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    n_chunks = hamming_threshold + 1
    width = n_bits // n_chunks
    chunks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftrightunsigned("sig", width * i)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("cv"),
                )
                for i in range(n_chunks)
            ])
        ).alias("ch"),
    ).select("id", "sig", "ch.ci", "ch.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, on=[F.col("a.ci") == F.col("b.ci"), F.col("a.cv") == F.col("b.cv"), F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= F.lit(hamming_threshold))


class HammingIndexMixin:
    """Persisted-index (recrawl) machinery shared by every operator
    whose signature is a single 64/60-bit integer compared by Hamming
    distance — SimHashDeduplicator (text) and ImageDeduplicator
    (perceptual hashes). The host class provides ``_sig_frame(df) ->
    (id, sig)``, ``_index_meta()``, ``_check_input``, and the
    ``n_bits`` / ``n_chunks`` / ``hamming_threshold`` /
    ``index_buckets`` / ``id_col`` / ``policy`` attributes."""

    def _chunked_sigs(self, sig: DataFrame) -> DataFrame:
        """(id, sig, ci, cv, cb): one row per signature chunk, with the
        pmod bucket column the index partitions on."""
        width = self.n_bits // self.n_chunks
        return (
            sig.select(
                "id",
                "sig",
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(i).alias("ci"),
                            F.shiftrightunsigned("sig", width * i)
                            .bitwiseAND(F.lit((1 << width) - 1))
                            .alias("cv"),
                        )
                        for i in range(self.n_chunks)
                    ])
                ).alias("ch"),
            )
            .select("id", "sig", "ch.ci", "ch.cv")
            .withColumn("cb", F.pmod(F.col("cv"), F.lit(self.index_buckets)))
        )

    def write_index(self, df: DataFrame, path: str, mode: str = "error") -> None:
        """Materialize the corpus's signature index at ``path``:
        ``<path>/chunks`` — (id, sig, cv) PARTITIONED BY (ci,
        cb=pmod(cv, index_buckets)) — plus the parameter-pinning
        ``<path>/meta``. The full signature rides along on every chunk
        row (8 bytes), so a probe verifies Hamming distance without any
        second table — unlike the MinHash index there is no heavy
        verification side. ``mode='append'`` accumulates snapshots."""
        import os

        self._check_input(df)
        chunks = self._chunked_sigs(self._sig_frame(df))
        # see MinHashDeduplicator.write_index: pre-shuffle on the
        # partition columns so each (ci, cb) dir gets ~1 file per
        # holding task instead of one per upstream task
        chunks.repartition(F.col("ci"), F.col("cb")).write.mode(
            mode
        ).partitionBy("ci", "cb").parquet(os.path.join(path, "chunks"))
        _write_index_meta(df.sparkSession, path, self._index_meta(), mode)

    def pairs_against(
        self, df: DataFrame, path: str, _sig: DataFrame | None = None
    ) -> DataFrame:
        """Verified pairs (a_id = indexed doc, b_id = new doc, hamming)
        between a new batch and the index at ``path``; the index scan
        is file-pruned to the new batch's (chunk, bucket) keys.
        ``_sig`` lets ``dedupe_against`` pass an already-persisted
        signature frame so the batch is signed once, not per pass."""
        import os

        self._check_input(df)
        spark = df.sparkSession
        _check_index_meta(spark, path, self._index_meta())
        new_chunks = self._chunked_sigs(
            self._sig_frame(df) if _sig is None else _sig
        )
        idx = spark.read.parquet(os.path.join(path, "chunks")).where(
            _prune_filter(new_chunks, "ci", "cb")
        )
        cand = (
            idx.alias("a")
            .join(
                new_chunks.alias("b"),
                on=[
                    F.col("a.ci") == F.col("b.ci"),
                    F.col("a.cv") == F.col("b.cv"),
                    F.col("a.id") != F.col("b.id"),
                ],
            )
            .select(
                F.col("a.id").alias("a_id"),
                F.col("b.id").alias("b_id"),
                F.bit_count(
                    F.col("a.sig").bitwiseXOR(F.col("b.sig"))
                ).alias("hamming"),
            )
            .distinct()
        )
        return cand.where(F.col("hamming") <= F.lit(self.hamming_threshold))

    def dedupe_against(
        self, df: DataFrame, path: str, include_self: bool = True
    ) -> DataFrame:
        """Dedupe a new batch against the persisted index — same
        semantics as :meth:`MinHashDeduplicator.dedupe_against` (the
        corpus is authoritative; within-batch the configured policy
        applies; equals a greedy full-corpus recompute restricted to
        the batch when ids are monotone across snapshots).

        The batch's signature frame is computed ONCE and persisted —
        the prune-key collect, the index probe, and the within-batch
        pass all read it (unpersisted by Spark's ContextCleaner when
        the result frame is released)."""
        sig = self._sig_frame(df)
        if not df.isStreaming:
            from pyspark import StorageLevel

            sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
        corpus_dups = self.pairs_against(df, path, _sig=sig).select(
            F.col("b_id").alias("dup_id")
        ).distinct()
        out = df.join(
            corpus_dups, on=df[self.id_col] == corpus_dups["dup_id"],
            how="left_anti",
        )
        if include_self:
            self_pairs = hamming_blocked_pairs(
                sig, self.n_bits, self.hamming_threshold
            )
            out = _drop_by_policy(out, self.id_col, self_pairs, self.policy)
        return out


class SimHashDeduplicator(HammingIndexMixin, Transformer):
    """Near-duplicate removal via SimHash + chunk blocking.

    simhash bit k = sign of sum over word hashes h of (2*bit_k(h) - 1).
    Candidates block on any equal chunk of the signature; the chunk count
    is hamming_threshold+1, so by pigeonhole two signatures within the
    threshold must agree on at least one chunk — recall is exact at every
    threshold (default 3 -> 4 chunks).
    Verification: bit_count(a XOR b) <= hamming_threshold.

    ``hash_fn``:
    - 'xxhash64' (default): 64-bit xxhash64 word hashes, 16-bit chunks —
      the fast scale path.
    - 'md5': 60-bit hashes from the first 15 hex chars of md5, 15-bit
      chunks — bit-identical in every engine that has md5 (DuckDB,
      warehouses), so signatures are portable across the pipeline
      boundary and ANSI-SQL-verifiable."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        hamming_threshold: int = 3,
        hash_fn: str = "xxhash64",
        policy: str = "greedy",
        index_buckets: int = _INDEX_BUCKETS,
    ):
        ensure(0 <= hamming_threshold <= 63, "hamming_threshold in [0,63]")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        ensure(hash_fn in ("xxhash64", "md5"), "hash_fn must be 'xxhash64' or 'md5'")
        self.text_col = text_col
        self.id_col = id_col
        self.hamming_threshold = hamming_threshold
        self.hash_fn = hash_fn
        self.policy = policy
        self.index_buckets = index_buckets
        self.n_bits = 64 if hash_fn == "xxhash64" else 60
        # pigeonhole: with t+1 disjoint chunks, two signatures within
        # hamming distance t must agree on at least one chunk — recall is
        # exact at EVERY threshold, not just the default (a fixed chunk
        # count silently missed pairs beyond n_chunks-1). Narrow chunks at
        # large thresholds mean bigger blocking buckets, not lost pairs.
        self.n_chunks = hamming_threshold + 1
        ensure(
            self.n_chunks <= self.n_bits,
            f"hamming_threshold+1 chunks must fit in {self.n_bits} signature bits",
        )

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.text_col])
        validate_columns(df, [self.id_col])

    def _word_hash(self, w: Column) -> Column:
        if self.hash_fn == "xxhash64":
            return F.xxhash64(w)
        # 60-bit portable hash: first 15 hex chars of md5 (< 2^60, so the
        # bigint cast can never overflow under ANSI mode)
        return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint")

    def bit_sums_expr(self, hs_col: str = "hs") -> Column:
        """Per-bit sums over a pre-materialized word-hash array column
        (``hs_col``), as ONE fold producing array<bigint>[n_bits].

        sums[k] = sum over word hashes h of (2*bit_k(h) - 1). A single
        pass over the words with a zip_with per word replaces n_bits
        independent folds — O(bits x words) work either way, but the
        generated code is one tight loop instead of 60 unrolled
        aggregate expressions (codegen size and JIT time drop ~n_bits x)."""
        seq = F.sequence(F.lit(0), F.lit(self.n_bits - 1))
        zeros = F.array_repeat(F.lit(0).cast("bigint"), self.n_bits)
        return F.aggregate(
            F.col(hs_col),
            zeros,
            lambda acc, h: F.zip_with(
                acc, seq, lambda a, k: a + (F.getbit(h, k) * F.lit(2) - F.lit(1))
            ),
        )

    def sig_expr(self, sums: Column) -> Column:
        """Signature from the bit-sums array: bit k set iff sums[k] > 0.
        Must be applied in a SEPARATE projection from bit_sums_expr — the
        n_bits element_at references would otherwise re-evaluate the fold
        once per bit (CollapseProject keeps multi-referenced non-cheap
        aliases apart, so a two-select pipeline is safe).

        Bit-identical to the unrolled when-chain formulation (same
        sums, same >0 rule, same signed bit-63 weight; exact bigint
        addition in the same ascending-k order) — but ONE fold over a
        weights literal instead of n_bits unrolled terms, so the
        generated code is a tight loop (codegen size and JIT time drop
        ~n_bits x, the bit_sums_expr discipline)."""
        weights = [
            # bit 63 carries weight -2^63 in the signed representation
            (1 << k) if k < 63 else -(1 << 63)
            for k in range(self.n_bits)
        ]
        return F.aggregate(
            F.zip_with(
                sums,
                F.lit(weights).cast("array<bigint>"),
                lambda s, w: F.when(s > 0, w).otherwise(
                    F.lit(0).cast("bigint")
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    def _sig_frame(self, df: DataFrame) -> DataFrame:
        """(id, sig) signature frame for the input documents."""
        hashed = df.select(
            F.col(self.id_col).alias("id"),
            F.transform(
                words_expr(F.col(self.text_col)), self._word_hash
            ).alias("hs"),
        )
        sums = hashed.select("id", self.bit_sums_expr().alias("bsums"))
        return sums.select("id", self.sig_expr(F.col("bsums")).alias("sig"))

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        """Verified pairs (a_id, b_id, hamming), a_id < b_id."""
        self._check_input(df)
        return hamming_blocked_pairs(
            self._sig_frame(df), self.n_bits, self.hamming_threshold
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return _drop_by_policy(df, self.id_col, self.candidate_pairs(df), self.policy)

    def _index_meta(self) -> dict:
        return {
            "kind": "simhash",
            "n_bits": self.n_bits,
            "hamming_threshold": self.hamming_threshold,
            "hash_fn": self.hash_fn,
            "n_buckets": self.index_buckets,
        }

class NGramJaccardDeduplicator(Transformer):
    """Exact n-gram-shingle Jaccard dedup.

    Default path routes candidate generation through MinHash banding and
    verifies exactly (identical results to all-pairs whenever banding
    recall holds — near-total at sensible thresholds). ``all_pairs=True``
    switches to the O(n^2) cross join: only for small frames and oracle
    parity checks; it is deliberately NOT the default."""

    def __init__(
        self,
        text_col: str,
        id_col: str,
        shingle_n: int = 3,
        threshold: float = 0.5,
        all_pairs: bool = False,
        policy: str = "greedy",
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.all_pairs = all_pairs
        self.policy = policy
        self._minhash = MinHashDeduplicator(
            text_col, id_col, shingle_n=shingle_n, threshold=threshold
        )

    def _check_input(self, df: DataFrame) -> None:
        validate_string_columns(df, [self.text_col])
        validate_columns(df, [self.id_col])

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        if not self.all_pairs:
            return self._minhash.candidate_pairs(df)
        sh = df.select(
            F.col(self.id_col).alias("id"),
            shingles_expr(words_expr(F.col(self.text_col)), self.shingle_n).alias("sh"),
        )
        a = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
        b = sh.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
        return (
            a.join(b, on=F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", jaccard_expr(F.col("a_sh"), F.col("b_sh")).alias("jaccard"))
            .where(F.col("jaccard") >= F.lit(self.threshold))
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        return _drop_by_policy(df, self.id_col, self.candidate_pairs(df), self.policy)


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_sig_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i of the result is 1 iff
    vec . planes[i] >= 0 (bigint, so up to 63 planes).

    The plane matrix is ONE nested-array Literal and the n dot products
    come from a single transform — not n independent folds over n x dim
    Literal nodes — keeping plan analysis and generated-code size O(1)
    in n_planes x dim. The per-plane dot is the same sequential
    zip_with/aggregate fold as before, so signature values are
    unchanged."""
    planes_lit = double_array_literal([[float(x) for x in p] for p in planes])
    powers = F.lit([1 << i for i in range(len(planes))]).cast("array<bigint>")
    dots = F.transform(
        planes_lit,
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.aggregate(
        F.zip_with(
            dots, powers, lambda d, pw: F.when(d >= 0, pw).otherwise(F.lit(0))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


class EmbeddingDeduplicator(Transformer):
    """Embedding-cosine near-dup removal.

    method='lsh' (default, the scale path): 16-bit random-hyperplane
    signatures; candidates block on any equal 8-bit half (signatures of
    vectors with cosine >= ~0.9 collide on a half with high probability);
    exact cosine verification on candidates only.
    method='brute': all-pairs cosine — small frames / oracle checks only.

    ``dim`` must be given for LSH (hyperplanes are fixed literals from a
    seeded RNG, so results are deterministic and reproducible)."""

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        threshold: float = 0.95,
        method: str = "lsh",
        dim: int | None = None,
        n_planes: int = 16,
        seed: int = 42,
        policy: str = "greedy",
        index_buckets: int = 64,
    ):
        ensure(method in ("lsh", "brute"), "method must be 'lsh' or 'brute'")
        ensure(-1.0 <= threshold <= 1.0, "threshold must be in [-1,1]")
        if method == "lsh":
            ensure(dim is not None, "dim is required for method='lsh'")
            ensure(n_planes % 2 == 0, "n_planes must be even")
        ensure(index_buckets >= 1, "index_buckets must be >= 1")
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold
        self.method = method
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.policy = policy
        self.index_buckets = index_buckets

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.vec_col, self.id_col])

    def _signature_expr(self) -> Column:
        planes = _hyperplanes(self.n_planes, self.dim, self.seed)
        return hyperplane_sig_expr(F.col("vec"), planes)

    def _chunked(self, df: DataFrame) -> DataFrame:
        """(id, vec, ci, cv, cb): one row per signature half — the LSH
        blocking keys, with the pmod bucket column the index partitions
        on. Vectors ride along for the exact-cosine verify."""
        half = self.n_planes // 2
        base = df.select(
            F.col(self.id_col).alias("id"), F.col(self.vec_col).alias("vec")
        )
        sig = base.select("id", "vec", self._signature_expr().alias("sig"))
        return (
            sig.select(
                "id",
                "vec",
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(0).alias("ci"),
                            F.col("sig")
                            .bitwiseAND(F.lit((1 << half) - 1))
                            .alias("cv"),
                        ),
                        F.struct(
                            F.lit(1).alias("ci"),
                            F.shiftrightunsigned(
                                F.col("sig").cast("bigint"), half
                            ).alias("cv"),
                        ),
                    )
                ).alias("ch"),
            )
            .select("id", "vec", "ch.ci", "ch.cv")
            .withColumn("cb", F.pmod(F.col("cv"), F.lit(self.index_buckets)))
        )

    def _index_meta(self) -> dict:
        return {
            "kind": "embeddinglsh",
            "n_planes": self.n_planes,
            "dim": self.dim,
            "seed": self.seed,
            "threshold": self.threshold,
            "n_buckets": self.index_buckets,
        }

    def write_index(self, df: DataFrame, path: str, mode: str = "error") -> None:
        """Materialize the corpus's LSH index at ``path``:
        ``<path>/chunks`` — (id, vec, cv) PARTITIONED BY (ci,
        cb=pmod(cv, index_buckets)) — plus the parameter-pinning
        ``<path>/meta``. The vector rides along on every chunk row so a
        probe verifies exact cosine without a second table (the
        HammingIndexMixin layout, with the embedding instead of an
        8-byte signature as the verify payload). ``mode='append'``
        accumulates snapshots. LSH only — the brute method has no
        blocking keys to index."""
        import os

        ensure(self.method == "lsh", "write_index requires method='lsh'")
        self._check_input(df)
        chunks = self._chunked(df)
        # pre-shuffle on the partition columns so each (ci, cb) dir gets
        # ~1 file per holding task instead of one per upstream task
        chunks.repartition(F.col("ci"), F.col("cb")).write.mode(
            mode
        ).partitionBy("ci", "cb").parquet(os.path.join(path, "chunks"))
        _write_index_meta(df.sparkSession, path, self._index_meta(), mode)

    def pairs_against(
        self, df: DataFrame, path: str, _chunks: DataFrame | None = None
    ) -> DataFrame:
        """Verified pairs (a_id = indexed doc, b_id = new doc, cosine)
        between a new batch and the index at ``path``; the index scan is
        file-pruned to the new batch's (chunk, bucket) keys."""
        import os

        ensure(self.method == "lsh", "pairs_against requires method='lsh'")
        self._check_input(df)
        spark = df.sparkSession
        _check_index_meta(spark, path, self._index_meta())
        new_chunks = self._chunked(df) if _chunks is None else _chunks
        idx = spark.read.parquet(os.path.join(path, "chunks")).where(
            _prune_filter(new_chunks, "ci", "cb")
        )
        cand = (
            idx.alias("a")
            .join(
                new_chunks.alias("b"),
                on=[
                    F.col("a.ci") == F.col("b.ci"),
                    F.col("a.cv") == F.col("b.cv"),
                    F.col("a.id") != F.col("b.id"),
                ],
            )
            .select(
                F.col("a.id").alias("a_id"),
                F.col("a.vec").alias("a_vec"),
                F.col("b.id").alias("b_id"),
                F.col("b.vec").alias("b_vec"),
            )
            .distinct()
        )
        return cand.select(
            "a_id",
            "b_id",
            cosine_expr(F.col("a_vec"), F.col("b_vec")).alias("cosine"),
        ).where(F.col("cosine") >= F.lit(self.threshold))

    def dedupe_against(
        self, df: DataFrame, path: str, include_self: bool = True
    ) -> DataFrame:
        """Dedupe a new batch against the persisted index — same
        semantics as :meth:`MinHashDeduplicator.dedupe_against` (the
        corpus is authoritative; within-batch the configured policy
        applies). The batch's chunk frame is computed ONCE and
        persisted — the prune-key collect, the index probe, and the
        within-batch pass all read it."""
        chunks = self._chunked(df)
        if not df.isStreaming:
            from pyspark import StorageLevel

            chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
        corpus_dups = self.pairs_against(df, path, _chunks=chunks).select(
            F.col("b_id").alias("dup_id")
        ).distinct()
        out = df.join(
            corpus_dups, on=df[self.id_col] == corpus_dups["dup_id"],
            how="left_anti",
        )
        if include_self:
            a, b = chunks.alias("a"), chunks.alias("b")
            self_pairs = (
                a.join(
                    b,
                    on=[
                        F.col("a.ci") == F.col("b.ci"),
                        F.col("a.cv") == F.col("b.cv"),
                        F.col("a.id") < F.col("b.id"),
                    ],
                )
                .select(
                    F.col("a.id").alias("a_id"),
                    F.col("a.vec").alias("a_vec"),
                    F.col("b.id").alias("b_id"),
                    F.col("b.vec").alias("b_vec"),
                )
                .distinct()
                .select(
                    "a_id",
                    "b_id",
                    cosine_expr(F.col("a_vec"), F.col("b_vec")).alias("cosine"),
                )
                .where(F.col("cosine") >= F.lit(self.threshold))
            )
            out = _drop_by_policy(out, self.id_col, self_pairs, self.policy)
        return out

    def candidate_pairs(self, df: DataFrame) -> DataFrame:
        """Verified pairs (a_id, b_id, cosine), a_id < b_id."""
        self._check_input(df)
        base = df.select(
            F.col(self.id_col).alias("id"), F.col(self.vec_col).alias("vec")
        )
        if self.method == "brute":
            a = base.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"))
            b = base.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"))
            cand = a.join(b, on=F.col("a_id") < F.col("b_id"))
        else:
            chunks = self._chunked(df)
            a, b = chunks.alias("a"), chunks.alias("b")
            cand = (
                a.join(b, on=[F.col("a.ci") == F.col("b.ci"), F.col("a.cv") == F.col("b.cv"), F.col("a.id") < F.col("b.id")])
                .select(
                    F.col("a.id").alias("a_id"),
                    F.col("a.vec").alias("a_vec"),
                    F.col("b.id").alias("b_id"),
                    F.col("b.vec").alias("b_vec"),
                )
                .distinct()
            )
        return cand.select(
            "a_id",
            "b_id",
            cosine_expr(F.col("a_vec"), F.col("b_vec")).alias("cosine"),
        ).where(F.col("cosine") >= F.lit(self.threshold))

    def _transform(self, df: DataFrame) -> DataFrame:
        return _drop_by_policy(df, self.id_col, self.candidate_pairs(df), self.policy)


class WithinDocDeduplicator(Transformer):
    """WITHIN-document repeated-line removal (the Dolma/Gopher
    "duplicated paragraphs inside one page" pass): each document's
    repeated segments are cut, keeping the FIRST occurrence, without
    looking at any other document — templated pages repeat their own
    nav blocks and list stubs long before they repeat another page's.
    The cross-corpus complement is :class:`LineDeduplicator`.

    Segments shorter than ``min_chars`` after trimming (blank
    separators, list bullets) are kept unconditionally — structure is
    not repetition. Output: ``text_col`` rewritten in place plus
    ``{text_col}_self_removed`` (its own name, so it composes with
    :class:`LineDeduplicator`'s ``_removed_segments`` counter in one
    pipeline without clobbering).

    Scale shape: a PURE narrow projection — split once in a
    pre-projection (so the higher-order filter references a column,
    not a re-inlined split), then one ``filter`` lambda whose
    prior-occurrence check is ``array_position(slice(...))``. Per-doc
    cost is O(L^2) in the document's OWN line count (bounded by the
    longest document, corpus-size-free); no shuffle, no UDF, no state
    — composes before the corpus-level passes and pushes down like any
    projection."""

    def __init__(
        self,
        text_col: str,
        sep: str = "\n",
        min_chars: int = 1,
    ):
        ensure(len(sep) > 0, "sep must be non-empty")
        ensure(min_chars >= 0, "min_chars must be >= 0")
        self.text_col = text_col
        self.sep = sep
        self.min_chars = min_chars

    def is_stateful(self) -> bool:
        return False

    def _check_input(self, df: DataFrame) -> None:
        from ..validation import validate_string_columns

        validate_string_columns(df, [self.text_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        c = self.text_col
        lines = F.split(F.col(c), F.lit(self.sep), -1)
        pre = df.withColumn("__ff_wd_lines", lines)
        arr = F.col("__ff_wd_lines")
        kept = F.filter(
            arr,
            lambda x, i: (F.length(F.trim(x)) < F.lit(self.min_chars))
            | (F.array_position(F.slice(arr, 1, i), x) == 0),
        )
        out_removed = F.size(arr) - F.size(kept)
        return pre.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.array_join(kept, self.sep),
            ),
        ).withColumn(
            f"{c}_self_removed",
            F.when(F.col(c).isNotNull(), out_removed),
        ).drop("__ff_wd_lines")


class LineDeduplicator(Transformer):
    """Cross-corpus segment-level deduplication (the CCNet / Gopher
    "remove duplicated lines and paragraphs" pass): a text column is
    split into segments (lines by default), segments that occur in at
    least ``min_docs`` DISTINCT documents are removed from every
    document, and the survivors are stitched back in their original
    order. Boilerplate — navigation bars, cookie banners, license
    headers — is exactly the text that repeats across documents, and
    removing it segment-wise keeps the unique prose that document-level
    dedup would throw away wholesale.

    Beyond the reference (it has no text operators at all — SURVEY.md
    §2.3); standard LLM-corpus practice.

    Output: ``text_col`` rewritten in place (documents whose every
    segment is boilerplate become the empty string), plus
    ``{text_col}_removed_segments`` counting what was cut.

    Scale shape (every step shuffles on a uniform high-cardinality key):
    - posexplode(split) is narrow — no shuffle, parallelism preserved.
    - distinct (doc, segment) + groupBy(segment) count: the corpus-wide
      duplicate-segment table. Spark plans both as one exchange chain on
      the segment key; partial aggregation caps the map-side output.
    - the duplicate table (segments repeated across >= min_docs docs) is
      tiny next to the corpus — AQE broadcasts the anti-join side when
      it fits, sort-merge otherwise.
    - groupBy(doc) with array_sort(collect_list(struct(pos, segment)))
      rebuilds each document; per-group state is one document's segments
      (bounded by the longest document, not the corpus).

    Segments shorter than ``min_segment_chars`` are exempt (never
    removed): blank lines and stray separators repeat everywhere without
    being boilerplate.

    ``min_doc_fraction`` (mutually exclusive with ``min_docs``) states
    the threshold as a fraction of the corpus instead of an absolute
    count — the form that stays meaningful when the same pipeline runs
    at 1000x the data (an absolute 'in >= 100 docs' bar means something
    different in a 10^4-doc corpus than in a 10^9-doc one). It costs one
    extra tiny job (a countDistinct of the id column) at transform time.

    >>> df = spark.createDataFrame(
    ...     [(1, "unique BOILERPLATE"), (2, "BOILERPLATE other")],
    ...     ["doc_id", "text"])
    >>> out = LineDeduplicator("doc_id", "text", min_docs=2, sep=" ").transform(df)
    >>> sorted((r["doc_id"], r["text"]) for r in out.collect())
    [(1, 'unique'), (2, 'other')]
    """

    def __init__(
        self,
        id_col: str,
        text_col: str,
        min_docs: int | None = None,
        sep: str = "\n",
        min_segment_chars: int = 1,
        min_doc_fraction: float | None = None,
    ):
        ensure(
            (min_docs is None) != (min_doc_fraction is None),
            "exactly one of min_docs / min_doc_fraction must be given",
        )
        if min_docs is not None:
            ensure(min_docs >= 2, "min_docs must be >= 2 (a segment duplicated "
                   "across fewer than 2 documents is not a cross-doc duplicate)")
        if min_doc_fraction is not None:
            ensure(0.0 < min_doc_fraction <= 1.0,
                   "min_doc_fraction must be in (0, 1]")
        ensure(len(sep) > 0, "sep must be a non-empty string")
        ensure(min_segment_chars >= 0, "min_segment_chars must be >= 0")
        self.id_col = id_col
        self.text_col = text_col
        self.min_docs = min_docs
        self.min_doc_fraction = min_doc_fraction
        self.sep = sep
        self.min_segment_chars = min_segment_chars

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.id_col])
        validate_string_columns(df, [self.text_col])

    def _transform(self, df: DataFrame) -> DataFrame:
        import re as _re

        sep_pattern = _re.escape(self.sep)
        segs = df.select(
            F.col(self.id_col).alias("__ff_id"),
            F.posexplode(F.split(F.col(self.text_col), sep_pattern)).alias(
                "__ff_pos", "__ff_seg"
            ),
        )
        eligible = F.length(F.col("__ff_seg")) >= F.lit(self.min_segment_chars)
        # corpus-wide duplicate-segment table: distinct docs per segment.
        # countDistinct would work too; distinct + count makes the partial
        # aggregation explicit (both are the same two-exchange plan).
        if self.min_doc_fraction is not None:
            n_docs = df.select(
                F.countDistinct(F.col(self.id_col)).alias("n")
            ).collect()[0]["n"]
            threshold = F.lit(self.min_doc_fraction) * F.lit(float(n_docs))
        else:
            threshold = F.lit(self.min_docs)
        dup_segs = (
            segs.where(eligible)
            .select("__ff_id", "__ff_seg")
            .distinct()
            .groupBy("__ff_seg")
            .agg(F.count("*").alias("__ff_ndocs"))
            .where(F.col("__ff_ndocs") >= threshold)
            .select("__ff_seg", F.lit(True).alias("__ff_dup"))
        )
        marked = segs.join(dup_segs, on="__ff_seg", how="left").select(
            "__ff_id",
            "__ff_pos",
            "__ff_seg",
            (eligible & F.col("__ff_dup").isNotNull()).alias("__ff_drop"),
        )
        # collect_list skips nulls, so the conditional struct keeps only
        # surviving segments while the same aggregate counts the dropped
        # ones — one groupBy(doc), not two.
        rebuilt = marked.groupBy("__ff_id").agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("__ff_drop"),
                        F.struct(
                            F.col("__ff_pos").alias("p"),
                            F.col("__ff_seg").alias("s"),
                        ),
                    )
                )
            ).alias("__ff_kept"),
            F.sum(F.col("__ff_drop").cast("int")).alias("__ff_removed"),
        )
        rebuilt = rebuilt.select(
            "__ff_id",
            F.concat_ws(
                self.sep, F.transform(F.col("__ff_kept"), lambda x: x["s"])
            ).alias("__ff_new_text"),
            F.col("__ff_removed").cast("int").alias("__ff_removed"),
        )
        out_cols = [
            F.col("__ff_new_text").alias(c) if c == self.text_col else F.col(c)
            for c in df.columns
        ]
        return (
            df.join(rebuilt, on=df[self.id_col] == rebuilt["__ff_id"], how="left")
            .select(
                *out_cols,
                F.coalesce(F.col("__ff_removed"), F.lit(0)).alias(
                    f"{self.text_col}_removed_segments"
                ),
            )
        )


class ExactSubstringDeduplicator(Transformer):
    """Exact-substring (span-level) deduplication: find the word spans
    that occur VERBATIM in at least ``min_docs`` distinct documents —
    the ExactSubstr pass of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al., 2021), which removes memorization-prone
    repeated passages that document- and segment-level dedup both miss
    (licenses quoted mid-document, syndicated paragraphs, templated
    spans that do not align to line boundaries).

    ``spans(df)`` returns one row per maximal duplicated span:
    (id, span_start, span_end, n_windows) in WORD offsets (end
    exclusive). ``transform`` appends ``{text_col}_dup_ratio`` — the
    fraction of each document's words covered by duplicated spans (0.0
    for clean documents).

    Algorithm (the distributed equivalent of the paper's single-node
    suffix array): every k-word sliding window is hashed (md5 of the
    joined words — engine-portable); a window hash seen in >= min_docs
    distinct documents marks its [pos, pos+k) span; per document,
    overlapping/adjacent spans merge into maximal spans via the
    gaps-and-islands pattern (equal-length windows sorted by position
    merge exactly when the position gap <= k).

    Scale shape — linear passes only, no all-pairs anywhere:
    - window construction is a narrow projection (slice + md5 over the
      word array; one explode);
    - the duplicated-hash table is ONE map-side-combined groupBy on a
      uniform md5 key (the corpus-token-count-sized shuffle is the
      honest cost of exact-substring dedup at any scale — the paper
      pays it as a suffix-array sort);
    - flagged windows join the (much smaller) duplicated-hash table —
      AQE broadcasts it when it fits;
    - span merging is a per-document window over flagged positions
      (reducer state bounded by the most-duplicated document).
    """

    def __init__(
        self,
        text_col: str,
        id_col: str,
        k: int = 8,
        min_docs: int = 2,
        lowercase: bool = True,
    ):
        ensure(k >= 2, "k (window length in words) must be >= 2")
        ensure(min_docs >= 2, "min_docs must be >= 2")
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.min_docs = min_docs
        self.lowercase = lowercase

    def _check_input(self, df: DataFrame) -> None:
        validate_columns(df, [self.id_col])
        validate_string_columns(df, [self.text_col])

    def _windows(self, df: DataFrame) -> DataFrame:
        """(__ff_id, pos, __ff_h): every k-word window's md5, with its
        word offset. Documents shorter than k words contribute none."""
        text = F.col(self.text_col)
        if self.lowercase:
            text = F.lower(text)
        words = F.coalesce(words_expr(text), F.array().cast("array<string>"))
        k = self.k
        # built against __ff_words (the SECOND projection's column) —
        # documents shorter than k words contribute no windows; the
        # empty branch needs the explicit struct-array cast so CASE
        # type-unification succeeds
        structs = F.expr(
            f"CASE WHEN size(__ff_words) < {k} "
            f"THEN cast(array() AS array<struct<pos:int,h:string>>) "
            f"ELSE transform(sequence(0, size(__ff_words) - {k}), i -> "
            f"struct(cast(i AS int) AS pos, "
            f"md5(concat_ws(' ', slice(__ff_words, i + 1, {k}))) AS h)) END"
        )
        return (
            df.select(
                F.col(self.id_col).alias("__ff_id"), words.alias("__ff_words")
            )
            .select("__ff_id", F.explode(structs).alias("__ff_wdw"))
            .select("__ff_id", "__ff_wdw.pos", F.col("__ff_wdw.h").alias("__ff_h"))
        )

    def _flagged(self, df: DataFrame, keep: str = "none") -> DataFrame:
        """(__ff_id, pos[, __ff_h]) of every duplicated window. With
        ``keep='first'`` the corpus-wide first occurrence of each
        duplicated window — minimum (id, pos) — is exempted, so the
        winner document keeps its copy."""
        wdw = self._windows(df)
        dup = (
            wdw.groupBy("__ff_h")
            .agg(F.count_distinct("__ff_id").alias("__ff_nd"))
            .where(F.col("__ff_nd") >= self.min_docs)
            .select("__ff_h")
        )
        flagged = wdw.join(dup, on="__ff_h", how="left_semi")
        if keep == "first":
            winners = (
                flagged.groupBy("__ff_h")
                .agg(F.min(F.struct("__ff_id", "pos")).alias("__ff_w"))
                .select(
                    "__ff_h",
                    F.col("__ff_w.__ff_id").alias("__ff_id"),
                    F.col("__ff_w.pos").alias("pos"),
                )
            )
            flagged = flagged.join(
                winners, on=["__ff_h", "__ff_id", "pos"], how="left_anti"
            )
        return flagged

    def _merge_spans(self, flagged: DataFrame) -> DataFrame:
        """Gaps-and-islands merge of flagged window positions into
        maximal spans: (id, span_start, span_end, n_windows)."""
        w = Window.partitionBy("__ff_id").orderBy("pos")
        islands = flagged.select(
            "__ff_id",
            "pos",
            # equal-length windows: a new maximal span starts when the
            # gap to the previous flagged window exceeds k
            F.sum(
                F.when(
                    F.coalesce(
                        F.col("pos") - F.lag("pos").over(w), F.lit(self.k + 1)
                    )
                    > self.k,
                    1,
                ).otherwise(0)
            )
            .over(w)
            .alias("__ff_island"),
        )
        return (
            islands.groupBy("__ff_id", "__ff_island")
            .agg(
                F.min("pos").alias("span_start"),
                (F.max("pos") + self.k).alias("span_end"),
                F.count("*").alias("n_windows"),
            )
            .select(
                F.col("__ff_id").alias(self.id_col),
                "span_start",
                "span_end",
                "n_windows",
            )
        )

    def spans(self, df: DataFrame) -> DataFrame:
        """Maximal duplicated spans: (id, span_start, span_end,
        n_windows), end exclusive, in word offsets."""
        self._check_input(df)
        return self._merge_spans(self._flagged(df, keep="none"))

    def remove_spans(
        self,
        df: DataFrame,
        keep: str = "first",
        output_col: str | None = None,
    ) -> DataFrame:
        """Rewrite documents with their duplicated spans CUT OUT — the
        actual remedy of Lee et al. 2021 (ExactSubstr removes the
        repeated passages, it doesn't just score them).

        ``keep='first'`` (default) exempts the corpus-wide first
        occurrence of each duplicated window — minimum (id, position) —
        so exactly one copy of every duplicated passage survives the
        corpus; ``keep='none'`` cuts every occurrence everywhere
        (the conservative policy for license/boilerplate spans).

        ``output_col`` defaults to ``text_col`` (in-place rewrite).
        Documents with no duplicated spans pass through VERBATIM
        (original whitespace intact); rewritten documents rejoin their
        surviving words with single spaces, in original order and case
        (hashing lowercases when ``lowercase=True``, but the rewrite
        cuts from the original words — positions are identical because
        case folding never moves a word boundary).

        Scale shape: the same window/groupBy passes as :meth:`spans`
        (plus, for ``keep='first'``, one more groupBy on the SAME hash
        key and an anti-join), then spans collect per document (bounded
        by the most-duplicated document) and the cut itself is a narrow
        higher-order-function projection — index-aware ``filter`` with
        an ``exists`` over the doc's span array, no shuffle, no UDF."""
        ensure(keep in ("first", "none"), "keep must be 'first' or 'none'")
        self._check_input(df)
        out_col = output_col or self.text_col
        spans = self._merge_spans(self._flagged(df, keep=keep))
        per_doc = spans.groupBy(self.id_col).agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("__ff_spans")
        ).withColumnRenamed(self.id_col, "__ff_sid")
        words = F.coalesce(
            words_expr(F.col(self.text_col)),
            F.array().cast("array<string>"),
        )
        kept = F.filter(
            words,
            lambda wd, i: ~F.exists(
                F.col("__ff_spans"),
                lambda s: (i >= s["s"]) & (i < s["e"]),
            ),
        )
        cleaned = F.when(
            F.col("__ff_spans").isNull(), F.col(self.text_col)
        ).otherwise(F.array_join(kept, " "))
        joined = df.join(
            per_doc, on=df[self.id_col] == F.col("__ff_sid"), how="left"
        )
        return joined.select(
            *[
                cleaned.alias(out_col) if c == out_col else F.col(c)
                for c in df.columns
            ],
            *([] if out_col in df.columns else [cleaned.alias(out_col)]),
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        spans = self.spans(df)
        covered = spans.groupBy(self.id_col).agg(
            F.sum(F.col("span_end") - F.col("span_start")).alias("__ff_dup_words")
        )
        text = F.col(self.text_col)
        if self.lowercase:
            text = F.lower(text)
        n_words = F.size(
            F.coalesce(words_expr(text), F.array().cast("array<string>"))
        )
        out_col = f"{self.text_col}_dup_ratio"
        joined = df.join(
            covered.withColumnRenamed(self.id_col, "__ff_cid"),
            on=df[self.id_col] == F.col("__ff_cid"),
            how="left",
        )
        return joined.select(
            *[F.col(c) for c in df.columns],
            F.when(n_words > 0,
                   F.coalesce(F.col("__ff_dup_words"), F.lit(0)) / n_words)
            .otherwise(F.lit(None).cast("double"))
            .alias(out_col),
        )
