"""Text-function semantics on hand-checked examples."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("v"))
        .collect()[0]
        .v
    )


def test_tokens_and_count(spark):
    assert _one(spark, "  Hello   World  ", tokens("text")) == ["hello", "world"]
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "a b  c", token_count("text")) == 3


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles("text", 3))
    assert got == ["a b c", "b c d"]
    # short doc: single whole-sequence shingle
    assert _one(spark, "a b", word_shingles("text", 3)) == ["a b"]


def test_fingerprint_normalization(spark):
    a = _one(spark, "The  Quick\tFox", fingerprint("text"))
    b = _one(spark, "the quick fox", fingerprint("text"))
    assert a == b


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of a house", lang_id("text")) == "en"
    assert _one(spark, "el perro y la casa de un amigo", lang_id("text")) == "es"
    assert _one(spark, "zzz qqq xxx", lang_id("text")) == "und"


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(
        F.min(quality_score("text")).alias("lo"),
        F.max(quality_score("text")).alias("hi"),
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_bpe_token_count(spark):
    from flink_orc_sink_spark.functions.text import bpe_token_count

    # "don't stop" -> don | 't | _stop ; "a1b2" -> a|1|b|2 ; "x, y!" -> x|,|_y|!
    assert _one(spark, "don't stop", bpe_token_count("text")) == 3
    assert _one(spark, "a1b2", bpe_token_count("text")) == 4
    assert _one(spark, "x, y!", bpe_token_count("text")) == 4
    assert _one(spark, "", bpe_token_count("text")) == 0


def test_bpe_train_hand_computed():
    """The classic BPE walkthrough: merges come out in frequency
    order with deterministic tie-breaks."""
    from flink_orc_sink_spark.functions.bpe import EOW, train_bpe

    corpus = ["low low low low low lower lower newest newest newest"]
    merges = train_bpe(corpus, n_merges=4)
    # word freqs: low×5, lower×2, newest×3
    # pair counts round 1: ('l','o')=7, ('o','w')=7, ('w',EOW)=5,
    # ('e','s')=3, ... tie 7/7 broken lexicographically: ('l','o')
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # next best: ('low', EOW) at 5
    assert merges[2] == ("low", EOW)
    assert len(merges) == 4


def test_bpe_encode_reconstructs_and_compresses():
    from flink_orc_sink_spark.functions.bpe import (
        EOW,
        encode_word,
        train_bpe,
    )

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker brown foxes jump over lazy dogs",
    ] * 5
    merges = train_bpe(corpus, n_merges=60)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["the", "quick", "quicker", "foxes", "unseen", "dog"]:
        toks = encode_word(w, ranks)
        # reconstruction: subwords concatenate back to word + marker
        assert "".join(toks) == w + EOW
    # a frequent word collapses to one symbol
    assert encode_word("the", ranks) == ["the" + EOW]


def test_bpe_udf_matches_pure_python(spark):
    from flink_orc_sink_spark.functions.bpe import (
        encode_word,
        make_bpe_encode_udf,
        train_bpe,
    )

    texts = ["aa ab ba", "aa aa bb", "ab ab ab aa"]
    merges = train_bpe(texts, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {
        r.i: r.toks
        for r in df.select(
            "i", make_bpe_encode_udf(merges)(F.col("text")).alias("toks")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = [tok for w in t.split() for tok in encode_word(w, ranks)]
        assert got[i] == want
