"""Persisted BM25 retrieval index — build / probe / append / forget.

The FIFTH persisted index family (after MinHash near-dup, IVF ANN,
aHash perceptual, and the exact-substring gram index): the sparse
keyword-retrieval state of a training-data pipeline (corpus search,
retrieval-based decontamination, RAG indexing) persisted so that
probes never re-read corpus text and ingest is pure insertion.

Reference parity note: the reference (RowOrcBucketingSink.java:1-385)
has no retrieval surface at all — this is the engine's extension
surface, mirroring the layout discipline of its bucketed sink
(partition directory = pruning unit).

Index layout under ``index_path``:

- ``postings/`` — one row per (token, doc) pair: ``(token, doc_id,
  tf, dl, tag)``, written ``partitionBy(bucket)`` where ``bucket =
  crc32(token) % n_buckets``. The bucket directory is the probe's
  PRUNING unit: a query's terms map to a handful of buckets, so the
  probe reads only those directories at the file listing — the
  postings read scales with the query's bucket count, never the
  corpus. ``dl`` (the doc's token count) is DENORMALIZED into the
  postings row so scoring never joins a per-doc table. crc32 (not
  ``F.hash``) because the bucket function must stay stable across
  Spark versions for a persisted index.
- ``doclens/`` — one slim row per ingested doc: ``(doc_id, dl,
  tag)``, including zero-token docs that have no postings rows. The
  corpus globals (N, avgdl) are derived from THIS table at probe
  time, which is what makes every lifecycle edge exact by
  construction: replayed appends collapse in the read-time dedup by
  ``doc_id``, forgotten docs drop out through the same tombstone
  anti-join the postings use, and a forgotten-then-re-ingested doc
  counts exactly once — no delta bookkeeping to corrupt. Cost: one
  ~12-byte-per-doc columnar aggregate per probe (seconds per 10^9
  docs on a cluster; a production deployment would additionally
  checkpoint the aggregate at compaction cadence).

Crash-replay hygiene: a replayed append re-writes identical postings
and doclens rows, so the probe dedups AT READ TIME — postings by
(token, doc_id), doclens by doc_id. Exactness, not hygiene: a
doubled tf row or a doubled doclen would shift every score. Doc ids
are stable content ids (the shared contract of all five families):
re-ingesting an id means the same text, so colliding rows from a
pre-forget ingest collapse identically.

Deletion/retention rides ``operators/retention.py`` unchanged:
:func:`forget_from_bm25_index` is an O(deleted) tombstone append
(probes anti-join it on BOTH postings and doclens, so forgotten docs
neither match nor count toward N/avgdl), ``append`` readmits
re-ingested ids, and :func:`compact_bm25_index` is the generic
copy-on-write rewrite over the two per-doc tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.text import tokens
from flink_orc_sink_spark.operators.retention import (
    IndexTable,
    compact_index,
    forget_ids,
    readmit_ids,
    subtract_tombstones,
)

N_TERM_BUCKETS = 64
BM25_K1 = 1.2
BM25_B = 0.75

BM25_TABLES = (
    IndexTable("postings", "doc_id", ("bucket",)),
    IndexTable("doclens", "doc_id"),
)


def _bucket(col):
    return F.pmod(F.crc32(col.cast("string")), F.lit(N_TERM_BUCKETS)).cast(
        "int"
    )


def term_buckets(terms: list[str]) -> list[int]:
    """Driver-side bucket ids for a query's terms (crc32 % buckets,
    the same function the writer uses) — the probe's partition
    filter. Pure Python so the probe can prune at plan time."""
    import zlib

    return sorted(
        {zlib.crc32(t.encode("utf-8")) % N_TERM_BUCKETS for t in terms}
    )


def _spread(proj: DataFrame) -> DataFrame:
    """Spread an under-split projection across the session's
    parallelism: the tokenize+explode feeding the postings aggregation
    is the CPU-heavy pre-shuffle map stage, and a corpus arriving as
    one small parquet file (a single row group is unsplittable) runs
    it on one core of 32. No-op at production split counts."""
    par = proj.sparkSession.sparkContext.defaultParallelism
    if proj.rdd.getNumPartitions() < par:
        return proj.repartition(par)
    return proj


def _postings(
    df: DataFrame, id_col: str, text_col: str, spread: bool = True
) -> DataFrame:
    """(token, doc_id, tf, dl) rows for a batch — dl rides the
    groupBy key (functionally dependent on doc_id, so free) instead
    of joining a per-doc table back on. ``spread=False`` skips the
    under-split input spread: per-TRIGGER appends are batch-bounded,
    so the extra exchange costs a Spark job per call and buys back
    less tokenize time than it spends (measured +0.3 s on the 4-batch
    streaming ingest at sf0.1); one-shot corpus builds keep it."""
    proj = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    if spread:
        proj = _spread(proj)
    return (
        proj.select("doc_id", tokens("_t").alias("tk"))
        .withColumn("dl", F.size("tk"))
        .select("doc_id", "dl", F.explode("tk").alias("token"))
        .groupBy("doc_id", "token", "dl")
        .agg(F.count("*").alias("tf"))
    )


def _doclens(
    df: DataFrame, id_col: str, text_col: str, spread: bool = True
) -> DataFrame:
    """One (doc_id, dl) row per batch doc — EVERY doc, including
    zero-token ones that contribute no postings. Same input-spread
    rule as :func:`_postings` — this is a second full tokenize pass."""
    proj = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    if spread:
        proj = _spread(proj)
    return proj.select("doc_id", F.size(tokens("_t")).alias("dl"))


def _write(df: DataFrame, path: str, mode: str, tag: int) -> None:
    df.withColumn("tag", F.lit(tag).cast("long")).write.mode(mode).parquet(
        path
    )


def build_bm25_index(
    df: DataFrame, id_col: str, text_col: str, index_path: str
) -> None:
    """One-shot index build: postings bucket-partitioned by term
    hash, plus the per-doc length table (tag = -1). Map-only after
    the one (doc, token) aggregation shuffle — the postings write is
    the only O(corpus-tokens) pass and it happens once."""
    (
        _postings(df, id_col, text_col)
        .withColumn("bucket", _bucket(F.col("token")))
        .withColumn("tag", F.lit(-1).cast("long"))
        # range-partition on (bucket, token) so each writer task covers
        # a contiguous bucket slice: files-per-bucket-dir stays O(tasks
        # holding that bucket), not O(all shuffle partitions), while
        # write parallelism still scales within hot buckets — the same
        # layout discipline as the MinHash band index (dedup.py:1034)
        .repartitionByRange("bucket", "token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_path}/postings")
    )
    _write(
        _doclens(df, id_col, text_col),
        f"{index_path}/doclens",
        "overwrite",
        -1,
    )


def append_to_bm25_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    tag: int = 0,
    owner: str | None = None,
    lease_wait_sec: float = 0.0,
) -> None:
    """Admit a batch: append its postings under the same bucket
    layout and one doclens row per doc. Pure insertion — no read, no
    merge, no corpus pass; the probe's read-time dedup makes a
    crash-replayed append harmless. Re-ingesting a previously
    forgotten id readmits it (tombstone removed), same as every other
    index family — and runs under the same enforced ``index_path``
    single-writer lease (``lease.py``). ``owner`` lets a foreachBatch
    caller pass its checkpoint-derived name (instant orphan reclaim
    after a crash-restart); ``lease_wait_sec`` opts into bounded
    waiting behind a concurrent appender."""
    from flink_orc_sink_spark.lease import process_owner, state_lease

    with state_lease(
        df.sparkSession,
        index_path,
        owner or process_owner("ingest:append"),
        wait_sec=lease_wait_sec,
    ):
        # Bucket-only hash repartition into exactly N_TERM_BUCKETS
        # partitions: an append is bounded to ≤ 64 files, and
        # non-empty write tasks are ≤ 64 (hash collisions make it
        # ~55 in expectation at the default partition count — sizing
        # the shuffle to the bucket domain drops the empty tasks).
        # Hashing on (bucket, token) instead would interleave every
        # bucket across all shuffle tasks and write up to
        # tasks×buckets (~512) files per append, compounding small
        # files over steady ingest (round-9 advice). No range-sampling
        # job either: repartitionByRange re-evaluates the upstream
        # postings plan once more to sample bounds — measured strictly
        # worse on streaming ingest.
        (
            _postings(df, id_col, text_col, spread=False)
            .withColumn("bucket", _bucket(F.col("token")))
            .withColumn("tag", F.lit(tag).cast("long"))
            .repartition(N_TERM_BUCKETS, "bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{index_path}/postings")
        )
        _write(
            _doclens(df, id_col, text_col, spread=False),
            f"{index_path}/doclens",
            "append",
            tag,
        )
        readmit_ids(df.select(id_col), index_path, lease=False)


def forget_from_bm25_index(doc_ids: DataFrame, index_path: str) -> None:
    """DELETE docs from the retrieval index (GDPR/takedown): an
    O(deleted) tombstone append. Forgotten docs stop matching AND
    stop counting toward N/avgdl/df immediately — the probe
    anti-joins the tombstones on postings and doclens alike, so the
    scores equal a from-scratch index over corpus-minus-forgotten.
    Run :func:`compact_bm25_index` periodically to drop the rows
    physically."""
    forget_ids(doc_ids, index_path)


def compact_bm25_index(spark: SparkSession, index_path: str) -> None:
    """Copy-on-write retention pass: rewrite ``postings/`` (bucket
    layout preserved) and ``doclens/`` without tombstoned docs, then
    clear the tombstones. Probe results are IDENTICAL before and
    after; the swap is crash-recoverable
    (``operators/retention.py``)."""
    compact_index(spark, index_path, BM25_TABLES)


def bm25_probe_index(
    spark: SparkSession,
    index_path: str,
    terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score the persisted index for ``terms`` and return the top-k
    ``(doc_id, bm25, n_terms)`` — bit-identical to the one-shot
    in-memory scorer (queries/llm.py::_bm25_scored) over the same
    live corpus, which is what the ``docs_bm25_index_topk`` oracle
    proves.

    100 TB shape: the bucket filter prunes the postings read AT THE
    FILE LISTING to the query terms' directories; document
    frequencies come from the pruned postings themselves (exact, no
    stored-df staleness problem); the corpus globals aggregate the
    slim doclens table (see module docstring). The only shuffle is
    the per-doc score sum over MATCHING postings; top-k is
    TakeOrderedAndProject.

    Document frequency is a WINDOW count over the deduped postings
    (round 13): the old ``groupBy(token) → broadcast-join back`` form
    evaluated the whole pruned-scan + tombstone-anti-join + dedup
    subtree a SECOND time just to build the df broadcast — one full
    extra postings pass (and its own Spark job) per probe.
    ``count(*) over (partition by token)`` on the already-deduped
    rows is the same exact integer df, computed in-stream on the one
    term-bounded frame."""
    from pyspark.sql import Window

    post = subtract_tombstones(
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("bucket").isin(term_buckets(terms)))
        .filter(F.col("token").isin(*terms)),
        "doc_id",
        spark,
        index_path,
    ).dropDuplicates(["token", "doc_id"])
    stats = (
        subtract_tombstones(
            spark.read.parquet(f"{index_path}/doclens").dropDuplicates(
                ["doc_id"]
            ),
            "doc_id",
            spark,
            index_path,
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        # long/long division of the summed doclens == F.avg over the
        # per-doc longs: Spark's avg(long) also divides the long sum
        # once at the end, so avgdl is bit-identical to the one-shot
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .select("n_docs", "avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        post.withColumn(
            "df", F.count("*").over(Window.partitionBy("token"))
        )
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term_score), 6).cast("double").alias("bm25"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
