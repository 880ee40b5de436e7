"""Persisted BM25 retrieval index — build / probe / incremental append.

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
  probe reads only those directories at the file listing — probe cost
  scales with the query's bucket count, never the corpus. ``dl`` (the
  doc's token count) is DENORMALIZED into the postings row so scoring
  never joins a per-doc table. crc32 (not ``F.hash``) because the
  bucket function must stay stable across Spark versions for a
  persisted index.
- ``stats/`` — one tiny row per ingest batch: ``(tag, n_docs,
  sum_dl)``. The BM25 globals (N, avgdl) are ADDITIVE, so append
  writes a delta row and the probe aggregates a batches-sized table —
  never a corpus scan. ``n_docs``/``sum_dl`` count ALL batch docs
  (including zero-token docs, which have no postings rows), matching
  the one-shot scorer's corpus statistics exactly.

Crash-replay hygiene (the replay triple shared by the row-counted
index families): a replayed append re-writes identical postings rows
and an identical stats row, so the probe dedups AT READ TIME —
postings by (token, doc_id), stats by tag. Exactness, not hygiene:
a doubled tf row or a doubled stats delta would shift every score.

Per-doc takedown is a tombstone decision like MinHash/IVF/aHash —
anti-join postings on a tombstone set and subtract the forgotten
docs' (1, dl) from the stats. Not implemented here; the gram index's
rebuild-vs-tombstone discussion (dedup.py::build_gram_index) applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.text import tokens

N_TERM_BUCKETS = 64
BM25_K1 = 1.2
BM25_B = 0.75


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


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, doc_id, tf, dl) rows for a batch — dl rides the
    groupBy key (functionally dependent on doc_id, so free) instead
    of joining a per-doc table back on."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
        )
        .withColumn("dl", F.size("tk"))
        .select("doc_id", "dl", F.explode("tk").alias("token"))
        .groupBy("doc_id", "token", "dl")
        .agg(F.count("*").alias("tf"))
    )


def _stats_delta(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-row (n_docs, sum_dl) delta for a batch — counts EVERY doc,
    including zero-token ones that contribute no postings."""
    return df.select(F.size(tokens(text_col)).alias("dl")).agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )


def build_bm25_index(
    df: DataFrame, id_col: str, text_col: str, index_path: str
) -> None:
    """One-shot index build: postings bucket-partitioned by term
    hash, plus the first stats delta (tag = -1). Map-only after the
    one (doc, token) aggregation shuffle — the postings write is the
    only O(corpus-tokens) pass and it happens once."""
    (
        _postings(df, id_col, text_col)
        .withColumn("bucket", _bucket(F.col("token")))
        .withColumn("tag", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_path}/postings")
    )
    (
        _stats_delta(df, id_col, text_col)
        .withColumn("tag", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .parquet(f"{index_path}/stats")
    )


def append_to_bm25_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    tag: int = 0,
) -> None:
    """Admit a batch: append its postings under the same bucket
    layout and one stats delta row. Pure insertion — no read, no
    merge, no corpus pass; the probe's read-time dedup makes a
    crash-replayed append harmless."""
    (
        _postings(df, id_col, text_col)
        .withColumn("bucket", _bucket(F.col("token")))
        .withColumn("tag", F.lit(tag).cast("long"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{index_path}/postings")
    )
    (
        _stats_delta(df, id_col, text_col)
        .withColumn("tag", F.lit(tag).cast("long"))
        .write.mode("append")
        .parquet(f"{index_path}/stats")
    )


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
    corpus, which is what the ``docs_bm25_index_topk`` oracle proves.

    100 TB shape: the bucket filter prunes the postings read AT THE
    FILE LISTING to the query terms' directories; document
    frequencies come from the pruned postings themselves (exact, no
    stored-df staleness problem); the corpus globals aggregate the
    batches-sized stats table. The only shuffle is the per-doc score
    sum over MATCHING postings; top-k is TakeOrderedAndProject."""
    post = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("bucket").isin(term_buckets(terms)))
        .filter(F.col("token").isin(*terms))
        # replay-hygiene: a crash-replayed append double-writes rows;
        # (token, doc_id) is unique in a correct index, so keep one
        .dropDuplicates(["token", "doc_id"])
    )
    stats = (
        spark.read.parquet(f"{index_path}/stats")
        .dropDuplicates(["tag"])
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
        )
        # long/long division after summing deltas == F.avg over the
        # per-doc longs: Spark's avg(long) also divides the long sum
        # once at the end, so avgdl is bit-identical to the one-shot
        .withColumn(
            "avgdl", F.col("sum_dl") / F.col("n_docs")
        )
        .select("n_docs", "avgdl")
    )
    dfreq = post.groupBy("token").agg(F.count("*").alias("df"))
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
        post.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term_score), 6).cast("double").alias("bm25"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
