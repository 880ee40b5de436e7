"""Deduplication operators for LLM training-data pipelines.

Four families, all shuffle-planned for 100 TB (SURVEY.md §7.2 step 5):

- **exact**: fingerprint (md5 of normalized text) → groupBy. One
  shuffle on the fingerprint; map-side partial aggregation for free.
- **n-gram Jaccard**: inverted-index self-join on shingles (pairs only
  materialize for documents sharing a shingle), never an O(n²) cross
  join. An optional document-frequency cap drops ubiquitous shingles —
  the standard guard against quadratic blow-up on hot shingles.
- **MinHash + LSH**: 64 permutations, banded into 16×4; candidate
  pairs come from band-bucket joins, then exact-Jaccard verification.
  The hash family is md5-based so external engines can replicate the
  signatures exactly (see ``hash32``).
- **SimHash**: 60-bit signatures from token-frequency-weighted bit
  votes; Hamming-≤k pairs via banded prefix buckets + bit_count(xor).

Every signature hash here derives from md5 so the DuckDB oracles in
``__spark_entry__.py`` reproduce signatures bit-for-bit. The one
exception is :func:`dup_ngram_spans`, whose grams use 64-bit
``xxhash64`` (DuckDB cannot replicate it); its oracle instead replays
the span algebra over LITERAL gram strings, so the hashed path is
checked against a collision-free reference rather than reproduced.
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.text import (
    fingerprint,
    hash32,
    hash64,
)
from flink_orc_sink_spark.session import release_local_checkpoint

# --- MinHash parameters (shared with the SQL oracle generator) -------
MINHASH_PERMS = 64
MINHASH_BANDS = 16
MINHASH_ROWS = MINHASH_PERMS // MINHASH_BANDS  # 4 rows per band
MINHASH_P = 4294967311  # prime > 2^32; a*h+b stays under 2^63

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, 2**31) for _ in range(MINHASH_PERMS)]
MINHASH_B = [_rng.randrange(0, 2**31) for _ in range(MINHASH_PERMS)]

# --- SimHash parameters ----------------------------------------------
SIMHASH_BITS = 60  # 15 md5 hex chars; fits signed int64
SIMHASH_BANDS = 4  # 4 bands × 15 bits for candidate bucketing


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    ``(fp, n_dups, keeper_id)`` with keeper = min id. ``n_dups >= 2``
    rows are the actual duplicate sets; the full output (one row per
    distinct text) doubles as the dedup survivor list."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one document (min id) per normalized-text fingerprint.

    Window-free formulation: groupBy(fp).min(id) then a semi join back,
    which AQE turns into a broadcast when the survivor set is small.
    """
    keepers = (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


def _py_shingles(toks: list, k: int) -> set:
    """Distinct word k-shingles, matching functions/text.py::
    word_shingles semantics (short docs yield the whole sequence)."""
    toks = list(toks)
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


def _shingle_udf(k: int):
    """Arrow-batched shingling from a token array. The Catalyst
    ``word_shingles`` expression is interpreted per element (~6 s per
    evaluation on 5000 docs) and multi-branch plans (inverted-index
    self-joins) re-evaluate it once per branch; the Python form is
    ~0.2 s per evaluation."""

    @F.pandas_udf("array<string>")
    def sh(tokens: pd.Series) -> pd.Series:
        return pd.Series([sorted(_py_shingles(t, k)) for t in tokens])

    return sh


def shingle_postings(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Inverted index: one row per (shingle, doc) — the distributed
    representation every near-dup family starts from. Tokenization in
    Spark (shared definition), shingling Arrow-batched."""
    from flink_orc_sink_spark.functions.text import tokens

    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(_shingle_udf(k)(tokens(text_col))).alias("s"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    k: int = 3,
    df_cap: int | None = 5000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair of documents
    sharing at least one ``k``-shingle; emits pairs with
    ``jaccard >= threshold``.

    Plan shape: explode shingles → self-join on the shingle (inverted
    index) → count shared shingles per pair → join per-doc set sizes →
    |∩| / (|A|+|B|−|∩|). Pairs with no shared shingle never exist, so
    cost follows real overlap, not n². ``df_cap`` (document frequency
    cap) drops shingles appearing in more than ``df_cap`` docs — one
    hot shingle shared by d documents creates d² join rows, so the cap
    is ON by default (finite); pass ``None`` only when the corpus is
    known to lack hot shingles.
    """
    postings = shingle_postings(df, id_col, text_col, k)
    if df_cap is not None:
        rare = (
            postings.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("s")
        )
        postings = postings.join(rare, "s", "left_semi")
    sizes = postings.groupBy("doc").agg(F.count("*").alias("n"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_sig_udf():
    """Arrow-batched MinHash from a token array: shingle → md5-based
    32-bit hash → 64 affine permutations → per-permutation min, all in
    one NumPy matmul-shaped pass per batch.

    Python md5 over utf-8 == Spark ``md5()`` == DuckDB ``md5()``, so
    signatures stay bit-identical to the SQL oracle. Kept in Python
    because Catalyst higher-order lambdas are *interpreted* per
    element — measured 4-5 s for 5000 docs vs ~0.3 s here.
    """
    a = np.array(MINHASH_A, dtype=np.uint64).reshape(-1, 1)
    b = np.array(MINHASH_B, dtype=np.uint64).reshape(-1, 1)
    p = np.uint64(MINHASH_P)

    @F.pandas_udf("array<long>")
    def sig(tokens: pd.Series) -> pd.Series:
        # Shingles repeat heavily (Zipfian text), so hash each DISTINCT
        # shingle once per executor process — the md5 call count drops
        # from total-shingle-occurrences to vocabulary size. Bounded
        # cache: cleared past 2M entries (~200 MB) to keep executor
        # memory flat on adversarial vocabularies.
        cache: dict[str, int] = {}
        out = []
        for toks in tokens:
            shingles = _py_shingles(toks, 3)
            hs = []
            for s in shingles:
                v = cache.get(s)
                if v is None:
                    v = int(
                        hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16
                    )
                    if len(cache) > 2_000_000:
                        cache.clear()
                    cache[s] = v
                hs.append(v)
            h = np.array(hs, dtype=np.uint64).reshape(1, -1)
            out.append(((a * h + b) % p).min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """64-permutation MinHash signatures: ``(doc, sig array<long>)``.

    ``sig[i] = min over shingles of (a_i * hash32(shingle) + b_i) mod P``.
    Tokenization stays in Spark (one definition shared with every text
    operator, :func:`~flink_orc_sink_spark.functions.text.tokens`);
    shingling + hashing + permutation run in an Arrow-batched Pandas
    UDF (:func:`_minhash_sig_udf`). ZERO shuffle — per-row all the
    way, embarrassingly parallel at any scale.
    """
    if k != 3:
        raise ValueError("minhash signatures are fixed at k=3 shingles")
    from flink_orc_sink_spark.functions.text import tokens

    # The signature UDF is the pipeline's CPU-heavy pre-shuffle map
    # stage, and its parallelism is the INPUT SPLIT count — a corpus
    # that arrives as one small parquet file (every sf0.1 table is a
    # single file) runs the whole tokenize+shingle+permute pass on one
    # core of 32. Project to the two needed columns FIRST (an opaque
    # UDF defeats column pruning past the exchange — guide §2.3), then
    # spread an under-split input to a task count derived from the
    # input's size (round 13: a Python task has ~250 ms fixed worker
    # overhead, so the r12 spread-to-parallelism overshot small
    # inputs — see session.spread_for_py_udf). At production split
    # counts the guard is false and no shuffle is added.
    from flink_orc_sink_spark.session import spread_for_py_udf

    proj = spread_for_py_udf(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
    )
    return proj.select(
        "doc",
        _minhash_sig_udf()(tokens("_t")).alias("sig"),
    )


def _sig_from_hs_udf():
    """MinHash signature DERIVED from a doc's distinct shingle-hash
    set (the ``hs`` column :func:`shingle_hash_sets` computes):
    ``sig[i] = min((a_i*h + b_i) mod P)`` over the doc's DISTINCT
    hashes equals the min over its raw shingle stream — min is
    duplicate-insensitive and order-insensitive — so the signature is
    BIT-IDENTICAL to :func:`_minhash_sig_udf`'s, without re-tokenizing
    or re-md5-hashing the text. The md5 pass is the dedup family's
    dominant Python CPU (measured 17-19 s of worker CPU on the index
    build/ingest paths at sf0.1, HALF of it the second pass); deriving
    the signature from ``hs`` is a pure affine NumPy pass over already
    -computed hashes."""
    a = np.array(MINHASH_A, dtype=np.uint64).reshape(-1, 1)
    b = np.array(MINHASH_B, dtype=np.uint64).reshape(-1, 1)
    p = np.uint64(MINHASH_P)

    @F.pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        out = []
        for h_ in hs:
            h = np.asarray(h_, dtype=np.uint64).reshape(1, -1)
            out.append(((a * h + b) % p).min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_signatures_from_sets(sh: DataFrame) -> DataFrame:
    """(doc, sig) derived from a (doc, hs) shingle-hash-set frame —
    bit-identical to :func:`minhash_signatures` over the same docs
    (see :func:`_sig_from_hs_udf`), at the cost of one cheap affine
    pass instead of a full tokenize+md5 pass."""
    return sh.select("doc", _sig_from_hs_udf()(F.col("hs")).alias("sig"))


def banded_pairs(bands: DataFrame, bucket_cap: int = 1000) -> DataFrame:
    """Distinct candidate pairs from (doc, band, bkey) bucket rows.

    One shuffle (groupBy bucket) and ONE evaluation of the upstream
    signature expression — a bands-with-bands self-join would compute
    the signatures twice (once per branch) and shuffle twice the rows.
    Pairs are expanded in-bucket from the sorted doc list.

    ``bucket_cap`` drops degenerate buckets (> cap docs): one such
    bucket would expand to cap²/2 pairs in a single row. Buckets that
    big mean a degenerate signature (e.g. thousands of empty
    documents) — at 100 TB you want them surfaced and handled
    upstream, not silently exploded. Exact duplicates still pair up
    through ordinary-sized buckets.
    """
    grouped = (
        bands.groupBy("band", "bkey")
        .agg(F.array_sort(F.collect_list("doc")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= bucket_cap))
    )
    # Two chained explodes instead of a nested higher-order transform:
    # Catalyst HOF lambdas are interpreted (no codegen) and their
    # first evaluation alone costs seconds; posexplode + slice with
    # Column offsets stays fully inside whole-stage codegen.
    return (
        grouped.select("docs", F.posexplode("docs").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(
                F.slice("docs", F.col("i") + 2, F.size("docs"))
            ).alias("doc_b"),
        )
        .distinct()
    )


def band_rows(signatures: DataFrame) -> DataFrame:
    """(doc, band, bkey) bucket rows from (doc, sig) signatures.

    Explicit per-band struct array (unrolled at plan-build time, 16
    bands) instead of a higher-order transform: HOF lambdas are
    interpreted per element and their first evaluation costs ~7 s;
    the unrolled form codegens and measures 0.2 s on the same data.
    """
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.col("sig")[b * MINHASH_ROWS + r]
                    for r in range(MINHASH_ROWS)
                ],
            ).alias("bkey"),
        )
        for b in range(MINHASH_BANDS)
    ]
    return signatures.select(
        "doc", F.explode(F.array(*structs)).alias("bb")
    ).select("doc", "bb.band", "bb.bkey")


def minhash_candidate_pairs(
    signatures: DataFrame, bucket_cap: int = 1000
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a
    candidate pair. One ``posexplode`` turns the signature array into
    (band, key) bucket rows (no 16-way union), then
    :func:`banded_pairs` expands same-bucket pairs in one shuffle."""
    return banded_pairs(band_rows(signatures), bucket_cap)


def _pair_jaccard_udf(k: int):
    """Arrow-batched exact shingle-set Jaccard for candidate pairs —
    raw double ratio from Python (IEEE-identical to any engine's i/u);
    callers round Spark-side so rounding semantics match the
    relational convention everywhere.

    Round-13 note: a per-doc-id memoization of the shingle sets was
    tried and REVERTED — measured candidate multiplicity at sf0.1 is
    ~1.07 pairs per doc (257 pairs / 479 docs), so the cache never
    pays, and retaining every doc's frozenset doubled the verify
    stage's worker CPU (45 → 97 s) instead of cutting it."""

    @F.pandas_udf("double")
    def pair_jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = []
        for a_, b_ in zip(ta, tb):
            sa, sb = _py_shingles(a_, k), _py_shingles(b_, k)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            out.append(inter / union if union else 0.0)
        return pd.Series(out)

    return pair_jaccard


def minhash_incremental_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 3,
    bucket_cap: int = 1000,
) -> DataFrame:
    """INCREMENTAL ingest dedup: near-dup matches of a NEW batch
    against the existing corpus plus earlier rows of the same batch
    (``(new_doc, match_doc, jaccard)`` with jaccard ≥ threshold) —
    the production shape where a 100 TB corpus is NOT re-deduped on
    every ingest.

    Scale shape: corpus signatures/bands are recomputed here for
    self-containment, but both are per-row map work — in production
    they are computed once at ingest and PERSISTED (parquet keyed by
    (band, bkey)), so an incremental run's cost is: signature the new
    batch (map-only), one bucket equi-join whose output is bounded by
    the NEW batch's bucket occupancy, and exact verification of only
    the surviving candidates. Nothing scales with corpus size except
    the (pruned, pre-bucketed) index probe. Degenerate corpus buckets
    (> ``bucket_cap`` docs) are dropped, mirroring
    :func:`banded_pairs`'s cap.
    """
    from flink_orc_sink_spark.functions.text import tokens

    # In-bucket candidate expansion after ONE groupBy (round 13, the
    # same shape as :func:`banded_pairs` and for the same reason): the
    # old bn/hot-broadcast/bucket-join form referenced the band frames
    # from THREE plan branches, so the Arrow signature subtree (the
    # family's expensive pass) evaluated ~5× per query. One union →
    # one shuffle → per-bucket expansion evaluates it once, drops the
    # hot-bucket broadcast AND the candidate equi-join, and keeps the
    # identical candidate set: a bucket over ``bucket_cap`` TOTAL rows
    # is dropped whole (same raw-count rule as the old ``hot``), a new
    # doc pairs with every corpus doc in its bucket and with earlier
    # (smaller-id) new docs only.
    new_bands = band_rows(minhash_signatures(new_docs, id_col, text_col, k))
    bc = band_rows(minhash_signatures(corpus, id_col, text_col, k))
    all_bands = bc.withColumn("is_new", F.lit(False)).unionByName(
        new_bands.withColumn("is_new", F.lit(True))
    )
    grouped = (
        all_bands.groupBy("band", "bkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc", "is_new"))
            ).alias("ds")
        )
        .filter((F.size("ds") >= 2) & (F.size("ds") <= bucket_cap))
    )
    cands = (
        grouped.select(F.explode("ds").alias("a"), "ds")
        .filter(F.col("a.is_new"))
        .select(
            F.col("a.doc").alias("new_doc"), F.explode("ds").alias("b")
        )
        .filter(
            (~F.col("b.is_new")) | (F.col("b.doc") < F.col("new_doc"))
        )
        .select("new_doc", F.col("b.doc").alias("match_doc"))
        .distinct()
    )
    all_docs = new_docs.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("t")
    ).unionByName(
        corpus.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    )
    pair_jaccard = _pair_jaccard_udf(k)
    return (
        cands.join(
            all_docs.select(F.col("doc").alias("new_doc"), F.col("t").alias("ta")),
            "new_doc",
        )
        .join(
            all_docs.select(F.col("doc").alias("match_doc"), F.col("t").alias("tb")),
            "match_doc",
        )
        .withColumn("jaccard", F.round(pair_jaccard(F.col("ta"), F.col("tb")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc", "match_doc", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: candidates from banding, then
    exact-Jaccard verification of candidates only. Output:
    ``(doc_a, doc_b, jaccard)`` with ``jaccard >= threshold``.

    At 100 TB the candidate join replaces the all-pairs problem with
    per-bucket micro-joins, and verification touches ONLY candidate
    pairs: each candidate pair fetches its two token arrays and the
    exact shingle-set Jaccard is computed per pair in an Arrow batch —
    cost O(candidates), never the corpus-sized inverted-index
    self-join that LSH exists to avoid.

    ``shingles`` (round 13): optional pre-materialized ``(doc, hs)``
    frame — when given, candidate signatures derive from it
    (bit-identical, md5-free) instead of re-hashing the text; the
    exact verification still reads token arrays (string-shingle
    Jaccard is this family's registered semantics, distinct from the
    probe's hash-set Jaccard).
    """
    from flink_orc_sink_spark.functions.text import tokens

    sigs = (
        minhash_signatures_from_sets(shingles)
        if shingles is not None
        else minhash_signatures(df, id_col, text_col, k)
    )
    cands = minhash_candidate_pairs(sigs)
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))

    pair_jaccard = _pair_jaccard_udf(k)

    return (
        cands.join(toks.select(F.col("doc").alias("doc_a"), F.col("t").alias("ta")), "doc_a")
        .join(toks.select(F.col("doc").alias("doc_b"), F.col("t").alias("tb")), "doc_b")
        # raw double ratio from Python (IEEE-identical to any engine's
        # i/u), rounded by Spark so rounding semantics match the
        # relational convention everywhere.
        .withColumn("jaccard", F.round(pair_jaccard(F.col("ta"), F.col("tb")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _simhash_sig_udf():
    """Arrow-batched 60-bit SimHash from a token array: per-token
    md5-based 60-bit hash, frequency-weighted bit votes, sign →
    signature — one NumPy pass per batch. Python md5 keeps the
    signature bit-identical to the DuckDB oracle. Replaces the
    explode + groupBy + 60-aggregate formulation: that paid a full
    token shuffle and a 60-column interpreted aggregate; this is
    per-row and shuffle-free."""
    bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)
    weights = (np.uint64(1) << bit_idx).astype(np.int64)

    @F.pandas_udf("long")
    def sig(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            tf = Counter(toks)
            if not tf:
                out.append(0)
                continue
            h = np.array(
                [
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                    for t in tf
                ],
                dtype=np.uint64,
            )
            cnt = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
            bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
            out.append(int(((votes > 0) * weights).sum()))
        return pd.Series(out)

    return sig


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document: ``(doc, simhash)``.

    Token-frequency-weighted bit votes: for bit j, sum cnt over tokens
    with bit j set minus cnt over tokens with it clear; bit j of the
    signature is 1 iff the vote is positive. Tokenization in Spark
    (shared definition), votes in an Arrow-batched Pandas UDF.
    """
    from flink_orc_sink_spark.functions.text import tokens as tok_expr

    return df.select(
        F.col(id_col).alias("doc"),
        _simhash_sig_udf()(tok_expr(text_col)).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Banding by 15-bit chunks (pigeonhole: distance ≤ 3 over 4 bands
    guarantees one identical band), so candidates come from bucket
    joins, then ``bit_count(xor) <= k`` verifies. Output:
    ``(doc_a, doc_b, hamming)``.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << chunk_bits) - 1
    band_keys = F.array(
        *[
            F.shiftright(F.col("simhash"), b * chunk_bits)
            .bitwiseAND(F.lit(mask))
            .cast("string")
            for b in range(SIMHASH_BANDS)
        ]
    )
    # Carry the signature inside the bucket payload (struct sorts by
    # doc id first) so the hamming check needs no join-back and the
    # signature UDF is evaluated exactly once.
    bands = sigs.select(
        F.struct(F.col("doc"), F.col("simhash")).alias("doc"),
        F.posexplode(band_keys).alias("band", "bkey"),
    )
    cands = banded_pairs(bands)
    return (
        cands.select(
            F.col("doc_a.doc").alias("doc_a"),
            F.col("doc_b.doc").alias("doc_b"),
            F.bit_count(
                F.col("doc_a.simhash").bitwiseXOR(F.col("doc_b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --- winnowing (rolling-hash) fingerprints ----------------------------
# Schleimer/Wilkerson/Aiken's winnowing: polynomial rolling hash over
# char k-grams of the normalized text, then the minimum hash of every
# w-gram window; the distinct window-minima are the document's
# fingerprint set. Guarantees: any shared substring of length
# >= k + w - 1 produces at least one shared fingerprint.
WINNOW_K = 8            # char-gram length
WINNOW_W = 4            # winnowing window (in grams)
WINNOW_B = 257          # polynomial base
WINNOW_M = 2147483647   # 2^31 - 1 (keeps every term inside int64)
WINNOW_POWS = [pow(WINNOW_B, WINNOW_K - 1 - j, WINNOW_M) for j in range(WINNOW_K)]


def _winnow_udf():
    """Arrow-batched winnowing: normalized text -> sorted distinct
    fingerprint array. The gram hash is the direct polynomial form
    ``sum(code_j * B^(k-1-j)) mod M`` — identical per gram to the
    rolling recurrence, but expressible without recursion so the
    DuckDB oracle can replicate it term-for-term. Docs whose
    normalized text is shorter than k emit no fingerprints."""
    import re as _re

    pows = np.array(WINNOW_POWS, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # ASCII-\s normalization, matching Spark's Java regex and
            # DuckDB's RE2 (Python's \s would also eat unicode spaces;
            # SQL trim() strips spaces only, so strip(" ") here).
            t = _re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").strip(" ")).lower()
            n = len(t)
            if n < WINNOW_K:
                out.append([])
                continue
            codes = np.fromiter(map(ord, t), dtype=np.int64, count=n)
            grams = np.lib.stride_tricks.sliding_window_view(codes, WINNOW_K)
            h = (grams * pows).sum(axis=1) % WINNOW_M
            if len(h) <= WINNOW_W:
                mins = {int(h.min())}
            else:
                wins = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
                mins = set(int(x) for x in wins.min(axis=1))
            out.append(sorted(mins))
        return pd.Series(out)

    return fps


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing fingerprint postings: one row per (doc, fp).

    Per-row Pandas UDF + explode — ZERO shuffle; the fingerprint set
    is ~2/(w+1) of the gram count per doc, so output stays linear in
    corpus size. Downstream: self-join on fp for substring-level
    near-dup candidates (plagiarism-style matching, complementary to
    shingle Jaccard which is word- and whole-doc-oriented)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(_winnow_udf()(F.col(text_col))).alias("fp"),
    )


def neardup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph → one row per
    involved doc: ``(doc, cluster_keeper)`` with keeper = min doc id
    in the component. THE step after pair generation in a dedup
    pipeline: pairs (a,b),(b,c) must collapse to ONE survivor, which
    pairwise filtering alone cannot decide.

    Iterative min-label propagation: each round joins labels across
    edges and keeps the per-doc minimum; converges in O(graph
    diameter) rounds (near-dup clusters are shallow — typically 2-3).
    All per-round work is distributed joins/aggregations; the driver
    only checks the converged-row count. ``localCheckpoint`` truncates
    lineage so plans stay constant-size across rounds.
    """
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.src == labels.doc).select(
            F.col("dst").alias("doc"), F.col("label")
        )
        # Lazy checkpoint: the change-count job below is the first to
        # compute new_labels, so it materializes the checkpoint as a
        # side effect — one Spark job per round instead of two (labels
        # only ever decrease, so "changed" is a strict < filter).
        new_labels = (
            labels.union(nbr).groupBy("doc").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        # The count above materialized new_labels' checkpoint, so the
        # PREVIOUS round's label blocks are now superseded — release
        # them instead of holding O(rounds) block sets until the
        # ContextCleaner notices. (The final labels checkpoint stays:
        # the returned DataFrame reads from it.)
        release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    # edges fed every round's join but the converged labels are
    # already materialized — the result no longer needs them.
    release_local_checkpoint(edges)
    return labels.select("doc", F.col("label").alias("cluster_keeper"))


def dup_ngram_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """EXACT substring-level duplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    token-level): every token ``n``-gram occurring ≥ 2 times ANYWHERE
    in the corpus (within a doc or across docs) marks its positions;
    overlapping/adjacent marks merge into MAXIMAL duplicated spans.
    One row per span: ``(doc, span_start, span_end)`` — inclusive
    0-based token indexes, ready for span excision or per-doc
    duplication scoring (complementary to whole-doc MinHash: it
    catches boilerplate/quote duplication inside otherwise-unique
    docs, the case document-level Jaccard misses).

    100 TB shape — everything is linear in token count, JVM-side:

    - gram stream: per-doc ``transform`` + ``posexplode`` → one row
      per token position (no Python, no quadratic pairs); grams are
      ``xxhash64`` (64-bit — at 10^10 grams the expected collision
      count is ~0.003, vs thousands for a 32-bit hash)
    - duplicate detection: ONE count aggregation keyed by gram hash
      (map-side partials absorb hot boilerplate grams) + a semi join
      back — occurrence rows survive at most once, so a
      million-document boilerplate gram costs its occurrence count,
      never a pairwise blowup (contrast all-pairs substring matching)
    - span merge: per-doc window (partitioned — never global),
      classic gaps-and-islands; state bounded by doc length
    """
    occ = _gram_occurrences(df, id_col, text_col, n)
    dup = (
        occ.groupBy("gh")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gh")
    )
    return _merge_marked_spans(occ.join(dup, "gh", "left_semi"), n)


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc, tk, ntok)`` under the package's canonical tokenizer.

    The tokenize(+downstream gram fanout) is the gram family's
    CPU-heavy pre-shuffle map stage; its parallelism is the input
    split count, and a corpus arriving as one small parquet file
    (every sf0.1 table is a single file, unsplittable below one row
    group) runs it on one core. Project to the two needed columns,
    then spread an under-split input across the session's parallelism
    — at production split counts the guard is false and no shuffle is
    added."""
    from flink_orc_sink_spark.functions.text import tokens

    proj = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if proj.rdd.getNumPartitions() < par:
        proj = proj.repartition(par)
    return proj.select(
        "doc", tokens("_t").alias("tk")
    ).withColumn("ntok", F.size("tk"))


def _gram_occurrences(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One row per token ``n``-gram occurrence: ``(doc, pos, gh)``
    with ``gh`` the gram's 64-bit ``xxhash64``. Linear gram stream —
    per-doc ``transform`` + ``posexplode``, no Python."""
    return (
        _tokenized(df, id_col, text_col)
        .filter(F.col("ntok") >= n)
        .select(
            "doc",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("ntok") - n),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice("tk", i + 1, n))
                    ),
                )
            ).alias("pos", "gh"),
        )
    )


def _merge_marked_spans(marked: DataFrame, n: int) -> DataFrame:
    """Merge marked gram START positions ``(doc, pos)`` into maximal
    covered spans ``(doc, span_start, span_end)`` — classic per-doc
    gaps-and-islands (partitioned window, never global). Two start
    positions merge while ``pos <= prev + n``: extents
    ``[prev, prev+n-1]`` and ``[pos, pos+n-1]`` overlap or touch, so
    the island union is EXACTLY the set of covered token positions."""
    w = Window.partitionBy("doc").orderBy("pos")
    return (
        marked.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + n),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .select("doc", "span_start", "span_end")
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Span-level train/eval decontamination: maximal spans of
    training-doc token positions covered by an ``n``-gram that occurs
    ANYWHERE in the held-out eval set. Where ``docs_contamination``
    counts shared shingles per doc (drop-the-doc policy), this
    returns the positions themselves — the surgical policy every
    modern pretraining pipeline prefers (cut the leaked benchmark
    quote, keep the rest of the document).

    100 TB shape: the eval gram set is tiny next to the corpus (eval
    benchmarks are fixed, curated sets) — distinct-hash it and
    BROADCAST; the training gram stream is map-only through the semi
    join, then the per-doc islands window. Nothing corpus-pairwise;
    for an eval set too big to broadcast, the same Bloom prefilter as
    ``docs_contamination_bloom`` applies unchanged.
    """
    eval_grams = (
        _gram_occurrences(eval_df, id_col, text_col, n)
        .select("gh")
        .distinct()
    )
    occ = _gram_occurrences(train, id_col, text_col, n)
    # bounded-broadcast: eval-suite grams: contamination benchmarks are fixed curated sets (MBs), not SF-scaled
    marked = occ.join(F.broadcast(eval_grams), "gh", "left_semi")
    return _merge_marked_spans(marked, n)


def cut_dup_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Span EXCISION with the Lee et al. 2022 keep-first policy: for
    every token ``n``-gram occurring ≥ 2 times in the corpus, the
    globally-first occurrence (min ``(doc, pos)``) survives and every
    other occurrence's tokens are cut; each doc is re-emitted as the
    space-join of its surviving tokens. An exact-duplicate doc that
    sorts after its twin loses every token (``clean_text = ''``) —
    whole-doc dedup falls out as the degenerate case, while partial
    boilerplate/quotes are cut in place and the unique remainder of
    the doc survives (what doc-level dedup would have thrown away).

    Output: ``(doc, clean_text, n_kept, n_removed)`` for EVERY input
    doc — docs shorter than ``n`` (or empty) pass through whole.

    100 TB shape, all JVM-side and linear in token count:

    - first-occurrence selection rides the SAME count aggregation
      that detects duplication (``min(struct(doc, pos))`` merges in
      map-side partials) — no per-gram sort, no skewed row_number
      window under a million-occurrence boilerplate gram
    - marked occurrences explode into their ≤ n covered positions,
      de-duplicated by ``(doc, pos)`` — volume bounded by n × the
      duplicated region, not the corpus
    - reassembly: token stream anti-joins the removed positions and
      regroups per doc (``collect_list`` bounded by doc length — a
      doc must fit an executor anyway)
    """
    toks = _tokenized(df, id_col, text_col)
    occ = _gram_occurrences(df, id_col, text_col, n)
    dup = (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("doc", "pos")).alias("first"),
        )
        .filter(F.col("cnt") >= 2)
        .select("gh", "first")
    )
    marked = occ.join(dup, "gh").filter(
        F.struct("doc", "pos") != F.col("first")
    )
    return _excise_marked(toks, marked, n)


def _excise_marked(
    toks: DataFrame, marked: DataFrame, n: int
) -> DataFrame:
    """Cut every token position covered by a marked gram occurrence
    ``(doc, pos)`` and re-emit each doc of ``toks`` as the space-join
    of its surviving tokens. Marked occurrences explode into their
    ≤ n covered positions (volume bounded by n × the duplicated
    region, deduplicated by (doc, pos)); the token stream anti-joins
    the removed set and regroups per doc (``collect_list`` bounded by
    doc length — a doc must fit an executor anyway)."""
    removed = marked.select(
        "doc",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
        ).alias("rpos"),
    ).distinct()
    tokpos = toks.select(
        "doc", F.posexplode("tk").alias("pos", "tok")
    )
    kept = tokpos.join(
        removed,
        (tokpos["doc"] == removed["doc"])
        & (tokpos["pos"] == removed["rpos"]),
        "left_anti",
    )
    clean = kept.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        toks.join(clean, "doc", "left")
        .select(
            "doc",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("ntok") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def _deletion_variants_udf(max_deletes: int):
    """Pandas UDF: string → array of all variants reachable by up to
    ``max_deletes`` character deletions (the string itself included).
    Variant counts are C(L,0)+C(L,1)+…: bounded by key length, not
    corpus size."""

    @F.pandas_udf("array<string>")
    def variants(s: pd.Series) -> pd.Series:
        def gen(x: str) -> list[str]:
            seen = {x}
            frontier = {x}
            for _ in range(max_deletes):
                nxt = set()
                for w in frontier:
                    for i in range(len(w)):
                        nxt.add(w[:i] + w[i + 1 :])
                nxt -= seen
                seen |= nxt
                frontier = nxt
            return sorted(seen)

        return s.map(gen)

    return variants


def symspell_pairs(
    df: DataFrame,
    text_col: str,
    max_edit: int = 2,
    bucket_cap: int = 1000,
) -> DataFrame:
    """FUZZY SELF-JOIN by SymSpell deletion-neighborhood blocking:
    all string pairs within Levenshtein distance ``max_edit``,
    WITHOUT the all-pairs comparison — two strings within edit
    distance d always share a variant reachable by ≤ d deletions
    from each (every edit op costs at most one deletion per side),
    so the candidate set is an equi-join on exploded variants; the
    exact ``levenshtein`` verify removes false positives.

    Recall caveat: the blocking itself has no false negatives, but the
    ``bucket_cap`` degenerate-bucket guard drops variant buckets larger
    than ``bucket_cap`` outright, so a pair whose ONLY shared deletion
    variants live in capped buckets is lost — the same bounded-recall
    trade-off MinHash banding makes for skew safety. Corpora of many
    short or near-identical keys are the risk case; raise
    ``bucket_cap`` (or pre-dedup exact keys) if full recall matters
    more than skew protection.

    Scale shape: variants fan out per row by O(L^d) (key length, not
    corpus size), candidates come from one bucket equi-join with the
    same ``bucket_cap`` degenerate-bucket guard as the MinHash
    banding, and verification touches candidates only. The classic
    entity-resolution / noisy-key join at corpus scale.
    """
    base = df.select(F.col(text_col).alias("s")).distinct()
    exploded = base.select(
        "s", F.explode(_deletion_variants_udf(max_edit)("s")).alias("v")
    )
    grouped = (
        exploded.groupBy("v")
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
        .filter((F.size("ss") >= 2) & (F.size("ss") <= bucket_cap))
    )
    cands = (
        grouped.select("ss", F.posexplode("ss").alias("i", "a"))
        .select(
            "a",
            F.explode(
                F.slice("ss", F.col("i") + 2, F.size("ss"))
            ).alias("b"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("a"), F.col("b"))
    return cands.filter(dist <= max_edit).select(
        F.col("a").alias(f"{text_col}_a"),
        F.col("b").alias(f"{text_col}_b"),
        dist.cast("int").alias("edit_dist"),
    )


def _shingle_hashes_udf(k: int):
    """Arrow-batched DISTINCT shingle hash32 set per doc (sorted
    array<long>) — the md5-based 32-bit hash the MinHash signatures
    already use, so the persisted index and the signature path share
    one hash universe."""

    @F.pandas_udf("array<long>")
    def sh(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            hs = {
                int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
                for s in _py_shingles(toks, k)
            }
            out.append(sorted(hs))
        return pd.Series(out)

    return sh


def shingle_hash_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc, hs) — each doc's distinct shingle hash32 values, sorted.
    Exact Jaccard between two docs is then pure JVM array arithmetic
    (``array_intersect``/``array_union``), no text needed.

    Same scale-adaptive under-split input spread as
    :func:`minhash_signatures` (``session.spread_for_py_udf``): the
    tokenize+md5 UDF is CPU-heavy map work, and a corpus arriving as
    one parquet file would run it on one core. No-op at production
    split counts."""
    from flink_orc_sink_spark.functions.text import tokens
    from flink_orc_sink_spark.session import spread_for_py_udf

    proj = spread_for_py_udf(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
    )
    return proj.select(
        "doc",
        _shingle_hashes_udf(k)(tokens("_t")).alias("hs"),
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    k: int = 3,
) -> None:
    """PERSIST the corpus dedup index — the production shape
    :func:`minhash_incremental_pairs`'s docstring promises. Two
    tables under ``index_path``:

    - ``bands/``: (doc, bkey) parquet PARTITIONED BY band (16 dirs,
      each sorted by bkey) — the LSH inverted index. One map pass
      over the corpus, written once at ingest.
    - ``shingles/``: (doc, hs array<long>) — each doc's distinct
      shingle hash32 set, for EXACT verification of candidates
      without ever touching corpus text again.

    Index bytes ≈ corpus token count × 8 B (hashes) + 16 band rows
    per doc — an order of magnitude below the text it indexes, and
    the only thing an incremental ingest ever reads.

    ONE tokenize+md5 pass over the corpus (round 13): the shingle
    table is written first, then the band rows derive their
    signatures from the PERSISTED hashes
    (:func:`minhash_signatures_from_sets` — bit-identical, md5-free).
    The expensive pass used to run twice (once for sigs, once for
    shingles); the materialization that makes it run once is the
    shingles table itself — written anyway, so nothing index-sized
    is held in executor storage at any corpus size. The read-back
    scan is splittable parquet, so the derivation parallelizes
    regardless of how under-split the source corpus arrived.
    """
    (
        shingle_hash_sets(df, id_col, text_col, k)
        .write.mode("overwrite")
        .parquet(f"{index_path}/shingles")
    )
    sh = df.sparkSession.read.parquet(f"{index_path}/shingles")
    (
        band_rows(minhash_signatures_from_sets(sh))
        # range-partition on (band, bkey): band dirs preserved via
        # partitionBy while write parallelism scales past the 16-band
        # cap a repartition("band") would impose
        .repartitionByRange("band", "bkey")
        .sortWithinPartitions("band", "bkey")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{index_path}/bands")
    )


def minhash_probe_index(
    spark,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    threshold: float = 0.7,
    k: int = 3,
    bucket_cap: int = 1000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL ingest dedup against a PERSISTED index: near-dup
    matches ``(new_doc, match_doc, jaccard ≥ threshold)`` of a new
    batch vs the indexed corpus — corpus TEXT is never read, only the
    index. The cost profile at 100 TB:

    - signature + shingle-hash the NEW batch: map-only, batch-sized
    - hot-bucket discovery: one agg over the band index (index-sized,
      broadcast back — the same ``bucket_cap`` skew guard as
      :func:`banded_pairs`)
    - candidates: one equi-join of the batch's 16 band rows/doc
      against the partitioned band index
    - verification: the candidate set semi-join-prunes the shingle
      table, then exact Jaccard runs as JVM ``array_intersect``/
      ``array_union`` — candidates only, no Python, no text

    Nothing scales with corpus size except the (pre-bucketed,
    partition-laid-out) index probe itself.

    ``shingles`` (round 13): a pre-materialized ``(doc, hs)`` frame
    for the batch (``shingle_hash_sets(new_docs)``, eagerly
    checkpointed by the caller). When given, BOTH the band keys and
    the verification sets derive from it — one tokenize+md5 pass per
    trigger instead of two. Streaming callers that probe AND append
    the same batch share one frame across all consumers. When None,
    the self-contained two-pass form runs (the returned plan must not
    own checkpointed blocks, so this function never materializes
    internally).
    """
    from flink_orc_sink_spark.operators.retention import subtract_tombstones

    if shingles is not None:
        new_sigs = minhash_signatures_from_sets(shingles)
    else:
        new_sigs = minhash_signatures(new_docs, id_col, text_col, k)
    new_bands = band_rows(new_sigs)
    bn = new_bands.select(F.col("doc").alias("new_doc"), "band", "bkey")
    corpus_bands = subtract_tombstones(
        # forgotten docs drop out BEFORE the hot-bucket count, so a
        # tombstoned probe is exactly the probe of a rebuilt
        # corpus-minus-forgotten index (bucket-cap decisions included)
        spark.read.parquet(f"{index_path}/bands"),
        "doc",
        spark,
        index_path,
    ).select(F.col("doc").alias("match_doc"), "band", "bkey")
    hot = (
        corpus_bands.groupBy("band", "bkey")
        # DISTINCT docs, not raw rows: a crash-replayed double-append
        # duplicates band rows, and a raw count would push genuine
        # buckets over the cap — silently suppressing real matches
        # (the replay must never change probe results in either
        # direction)
        .agg(F.count_distinct("match_doc").alias("n"))
        .filter(F.col("n") > bucket_cap)
        .select("band", "bkey")
    )
    cands = (
        # bounded-broadcast: skew heads: over-cap (band,bkey) buckets only, <= n_docs/bucket_cap
        bn.join(F.broadcast(hot), ["band", "bkey"], "left_anti")
        .join(corpus_bands, ["band", "bkey"])
        # a doc must never match ITSELF: after a crash-replayed
        # append the probed batch can already be IN the index, and
        # without this guard every replayed doc would emit a
        # jaccard-1.0 self-pair
        .filter(F.col("new_doc") != F.col("match_doc"))
        .select("new_doc", "match_doc")
        .distinct()
    )
    new_sh = (
        shingles
        if shingles is not None
        else shingle_hash_sets(new_docs, id_col, text_col, k)
    ).select(F.col("doc").alias("new_doc"), F.col("hs").alias("ha"))
    corpus_sh = (
        spark.read.parquet(f"{index_path}/shingles")
        .select(F.col("doc").alias("match_doc"), F.col("hs").alias("hb"))
        # candidates bound which corpus sets are ever deserialized
        .join(cands.select("match_doc").distinct(), "match_doc", "left_semi")
        # a crash between append_to_minhash_index's two writes +
        # replay can double-append a doc's (identical) shingle row;
        # dedup by doc at read time so a replay-duplicated index can
        # never duplicate probe output rows
        .dropDuplicates(["match_doc"])
    )
    jac = F.round(
        F.size(F.array_intersect("ha", "hb"))
        / F.size(F.array_union("ha", "hb")),
        6,
    )
    return (
        cands.join(new_sh, "new_doc")
        .join(corpus_sh, "match_doc")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc", "match_doc", "jaccard")
    )


def append_to_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    k: int = 3,
    owner: str | None = None,
    lease_wait_sec: float = 0.0,
    shingles: DataFrame | None = None,
) -> None:
    """The other half of the incremental-ingest lifecycle: after a new
    batch is probed (:func:`minhash_probe_index`) and its survivors
    admitted, APPEND those survivors into the persisted index so the
    next batch dedups against them too. Batch-sized map work + an
    append write into the same band-partitioned layout — the corpus
    is still never re-read, and the index stays the single source of
    dedup truth across ingests.

    ``shingles`` (round 13): optional pre-materialized ``(doc, hs)``
    frame for the batch, shared with the caller's probe. When None,
    the append materializes it itself (eager localCheckpoint,
    batch-sized by contract, released before returning): both the
    band write and the shingle write consume ONE tokenize+md5 pass
    instead of each running its own — the same shape as the gram
    index's ``occurrences=`` (round 12).

    Runs under the ``index_path`` single-writer LEASE (``lease.py``):
    an append landing while ``compact_minhash_index``'s swap is
    mid-flight was the remaining silent-interleave class — now either
    side fails loudly instead.

    ``owner`` overrides the per-invocation lease owner: a streaming
    ``foreachBatch`` caller should pass a checkpoint-derived name
    (``f"sink:{checkpoint}"``) so a crash-restarted stream RECLAIMS
    its own orphan lease instantly instead of blocking a full TTL
    behind a dead pid-based owner. ``lease_wait_sec>0`` opts into
    bounded jittered waiting when another appender holds the lease
    (concurrent ingest jobs then serialize instead of crashing)."""
    from flink_orc_sink_spark.lease import process_owner, state_lease
    from flink_orc_sink_spark.session import release_local_checkpoint

    sh = shingles
    own_ck = sh is None
    try:
        if own_ck:
            # batch-sized by the append contract; eager so a failure
            # below still releases in the finally
            sh = shingle_hash_sets(
                df, id_col, text_col, k
            ).localCheckpoint(eager=True)
        with state_lease(
            df.sparkSession,
            index_path,
            owner or process_owner("ingest:append"),
            wait_sec=lease_wait_sec,
        ):
            # SALTED-hash repartition: (band, xxhash(bkey) % k) with
            # k = ceil(parallelism / bands) gives full write parallelism
            # while bounding an append to ≤ bands × k ≈ O(parallelism)
            # files — NOT O(tasks × bands) like a plain (band, bkey) hash
            # (which interleaves every band across all tasks, compounding
            # small files over steady ingest) and NOT the bands-task
            # write a band-only repartition pays. No range-sampling job
            # either — repartitionByRange re-evaluates the upstream plan
            # (the shingle/minhash pass) once more to sample bounds,
            # measured 2-3× worse on stream ingest at sf0.1.
            brows = band_rows(minhash_signatures_from_sets(sh))
            n_bands_eff = MINHASH_BANDS  # band_rows' fixed band layout
            salt_k = max(
                1,
                -(-df.sparkSession.sparkContext.defaultParallelism
                  // n_bands_eff),
            )
            (
                brows.withColumn(
                    "_salt", F.pmod(F.xxhash64("bkey"), F.lit(salt_k))
                )
                .repartition(n_bands_eff * salt_k, "band", "_salt")
                .drop("_salt")
                .sortWithinPartitions("band", "bkey")
                .write.mode("append")
                .partitionBy("band")
                .parquet(f"{index_path}/bands")
            )
            sh.write.mode("append").parquet(f"{index_path}/shingles")
            # re-ingesting a previously forgotten doc readmits it: a
            # forget covers rows ingested before it, exactly as a
            # rebuild-without-them would (no-op when nothing is
            # tombstoned)
            from flink_orc_sink_spark.operators.retention import readmit_ids

            readmit_ids(df.select(id_col), index_path, lease=False)
    finally:
        if own_ck and sh is not None:
            release_local_checkpoint(sh)


def forget_from_minhash_index(doc_ids: DataFrame, index_path: str) -> None:
    """DELETE docs from the persisted index (GDPR/takedown/retention —
    the index-side completion of the table-side erase,
    ``queries/events.py::orc_gdpr_erase``): tombstone the ids so every
    subsequent :func:`minhash_probe_index` behaves exactly as if the
    index had been rebuilt without them — forgotten docs never match
    again, AND their band rows stop counting toward bucket-cap
    decisions. O(deleted) work (``operators/retention.py``); run
    :func:`compact_minhash_index` periodically to drop the rows
    physically."""
    from flink_orc_sink_spark.operators.retention import forget_ids

    forget_ids(doc_ids, index_path)


def compact_minhash_index(spark, index_path: str) -> None:
    """Copy-on-write retention pass: rewrite ``bands/`` + ``shingles/``
    without tombstoned docs (band partition layout and (band, bkey)
    clustering preserved), then clear the tombstones. Probe results
    are IDENTICAL before and after (pytest-pinned); the swap is
    crash-recoverable (``operators/retention.py``)."""
    from flink_orc_sink_spark.operators.retention import (
        MINHASH_TABLES,
        compact_index,
    )

    compact_index(spark, index_path, MINHASH_TABLES)


def build_gram_index(
    df: DataFrame, id_col: str, text_col: str, index_path: str, n: int = 8
) -> None:
    """PERSIST the exact-substring dedup state — the fourth index
    family (after MinHash, IVF, aHash), giving :func:`dup_ngram_spans`
    / :func:`cut_dup_spans` their production INGEST shape: the corpus
    is gram-indexed once; every later batch is span-cut against the
    index without ever re-reading corpus text.

    The index is the corpus's DISTINCT token-``n``-gram hash set
    (``grams/``: one int64 column; the BUILD writes range-partitioned
    files, APPENDS are hash-partitioned — every file is sorted by
    ``gh`` either way, so probe filters prune at parquet row-group
    level inside any file they must open). Presence is the whole
    contract — an incoming occurrence
    whose gram exists anywhere in the corpus is by definition not the
    first occurrence, so keep-first excision needs no counts and no
    positions, and duplicate/replayed appends are idempotent by
    construction (re-asserting presence changes nothing). Index bytes
    ≈ 8 B per distinct corpus gram — far below the text it indexes.
    Takedown note: grams are SHARED across docs, so per-doc forget is
    a rebuild decision here (removing a doc's grams could un-index
    another doc's identical boilerplate), unlike the per-doc row
    tombstones of the other three families.
    """
    occ = _gram_occurrences(df, id_col, text_col, n)
    (
        occ.select("gh")
        .distinct()
        .withColumn("tag", F.lit(-1).cast("long"))
        .repartitionByRange(32, "gh")
        .sortWithinPartitions("gh")
        .write.mode("overwrite")
        .parquet(f"{index_path}/grams")
    )


def cut_spans_against_index(
    spark,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    n: int = 8,
    exclude_tag: int | None = None,
    occurrences: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL keep-first span excision: cut a new batch's token
    positions covered by any ``n``-gram that (a) exists in the
    persisted corpus index — the corpus copy came first — or (b) is
    duplicated WITHIN the batch and this occurrence is not the
    batch's first. Admitting the cleaned output and then
    :func:`append_to_gram_index` reproduces exactly what
    :func:`cut_dup_spans` over corpus ∪ batch would have cut from the
    batch docs (value-oracled as ``docs_index_cut_dedup``).

    ``occurrences``: optionally the PRE-MATERIALIZED gram stream of
    ``new_docs`` (``_gram_occurrences(new_docs, id_col, text_col,
    n)``, e.g. behind an eager ``localCheckpoint``). The probe plan
    consumes the gram stream THREE times (the index-probe broadcast,
    the within-batch duplicate aggregation, the flag join), so a
    caller that also appends the same batch afterwards saves four
    tokenize+posexplode passes per micro-batch by materializing it
    once. Batch-bounded by the same contract as the probe itself;
    the caller owns the checkpoint's release.

    100 TB shape: the batch's distinct gram hashes BROADCAST onto the
    index scan (map-only — the index is never shuffled and never
    joins wider than one int64 column; matched output is
    batch-bounded by construction), within-batch duplication rides
    the same count aggregation as :func:`cut_dup_spans`, and the
    excision itself is batch-sized. Per-batch probe cost is one
    columnar scan of the single-column index — on a cluster, persist
    ``grams/`` as a table BUCKETED by ``gh`` and the probe becomes a
    shuffle-free semi join of the batch side only.
    """
    toks = _tokenized(new_docs, id_col, text_col)
    occ = (
        occurrences
        if occurrences is not None
        else _gram_occurrences(new_docs, id_col, text_col, n)
    )
    batch_ghs = occ.select("gh").distinct()
    idx = spark.read.parquet(f"{index_path}/grams")
    if exclude_tag is not None:
        # self-match guard for streaming replay: a crash-replayed
        # batch finds its OWN grams already appended under its tag —
        # without the filter every one of its tokens would look
        # corpus-duplicated and the whole batch would be cut to ''
        idx = idx.filter(F.col("tag") != exclude_tag)
    # map-only over the index; output ⊆ batch grams (batch-bounded)
    # bounded-broadcast: ingest micro-batch grams: trigger-bounded by contract (probe scales with batch, never corpus)
    hit = idx.select("gh").join(F.broadcast(batch_ghs), "gh", "left_semi")
    batch_first = (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("doc", "pos")).alias("first"),
        )
        .filter(F.col("cnt") >= 2)
        .select("gh", "first")
    )
    with_flags = (
        occ.join(
            # bounded-broadcast: hit is a subset of the batch's grams — micro-batch-bounded
            F.broadcast(hit.withColumn("in_idx", F.lit(True))),
            "gh",
            "left",
        )
        # bounded-broadcast: batch_first is a subset of the batch's grams — micro-batch-bounded
        .join(F.broadcast(batch_first), "gh", "left")
    )
    marked = with_flags.filter(
        F.coalesce("in_idx", F.lit(False))
        | (
            F.col("first").isNotNull()
            & (F.struct("doc", "pos") != F.col("first"))
        )
    ).select("doc", "pos")
    return _excise_marked(toks, marked, n)


def append_to_gram_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    n: int = 8,
    tag: int = -1,
    owner: str | None = None,
    lease_wait_sec: float = 0.0,
    occurrences: DataFrame | None = None,
) -> None:
    """Admit a probed batch's grams so later batches dedup against it
    too. Append the batch's distinct gram hashes in the same sorted
    layout; presence semantics make a crash-replayed append a no-op
    (asserting an already-present gram changes nothing — no read-time
    dedup needed, unlike the row-counted index families). Streaming
    ingest passes its batch id as ``tag`` so a replayed batch can
    exclude its own prior append at probe time. Runs under the
    ``index_path`` single-writer lease (``lease.py``); ``owner`` lets
    a foreachBatch caller pass its checkpoint-derived name (instant
    orphan reclaim after a crash-restart) and ``lease_wait_sec``
    opts into bounded waiting behind a concurrent appender.
    ``occurrences`` mirrors :func:`cut_spans_against_index`: a probe
    caller that already materialized the batch's gram stream passes
    it here and the append skips its own tokenize+posexplode pass."""
    from flink_orc_sink_spark.lease import process_owner, state_lease

    occ = (
        occurrences
        if occurrences is not None
        else _gram_occurrences(df, id_col, text_col, n)
    )
    with state_lease(
        df.sparkSession,
        index_path,
        owner or process_owner("ingest:append"),
        wait_sec=lease_wait_sec,
    ):
        (
            occ.select("gh")
            .distinct()
            .withColumn("tag", F.lit(tag).cast("long"))
            # hash, not range: repartitionByRange would re-evaluate
            # the upstream distinct once more per micro-batch for its
            # bounds-sampling job (measured +2.6 s on
            # stream_gram_index_ingest at sf0.1). Appended segments
            # therefore span the full gh range at the FILE level —
            # but each file is SORTED by gh (sortWithinPartitions
            # below), so probe-side gh filters still prune at the
            # parquet ROW-GROUP level inside admitted files; only
            # file opens (4 per append) are unpruned, and the
            # copy-on-write compaction pass restores the build's
            # range layout when segment count matters.
            .repartition(4, "gh")
            .sortWithinPartitions("gh")
            .write.mode("append")
            .parquet(f"{index_path}/grams")
        )
