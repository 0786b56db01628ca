"""Text-analysis function family on handmade sentences."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import text as TX


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_lang_id_real_sentences(spark):
    cases = {
        "the cat sat on the mat and looked to the door": "en",
        "der hund und die katze sind nicht das problem": "de",
        "le chat et la souris sont dans les champs": "fr",
        "el perro y los gatos que viven por una casa": "es",
        "xyzzy plugh 12345": "und",
    }
    for sentence, expected in cases.items():
        got = _one(spark, sentence, TX.lang_id(TX.norm_words(F.col("text"))))
        assert got == expected, f"{sentence!r}: {got} != {expected}"


def test_shingles(spark):
    got = _one(spark, "a b c d", TX.shingles(TX.norm_words(F.col("text")), 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", TX.shingles(TX.norm_words(F.col("text")), 3)) == []


def test_token_counts(spark):
    assert _one(spark, "hello world", TX.ws_token_count("text")) == 2
    # BPE-ish: 'hello' ',' 'world' '42' '!'
    assert _one(spark, "hello, world 42!", TX.token_count("text")) == 5


def test_quality_score_range_and_order(spark):
    good = "the quick brown fox and the lazy dog went to the market in town"
    bad = "!!! ??? ,,,"
    qg = _one(spark, good, TX.quality_score("text"))
    qb = _one(spark, bad, TX.quality_score("text"))
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", TX.fingerprint("text"))
    b = _one(spark, "gamma alpha beta", TX.fingerprint("text"))
    c = _one(spark, "alpha beta delta", TX.fingerprint("text"))
    assert a == b != c


def test_redact_pii_all_categories(spark):
    s = (
        "mail bob.smith+x@corp.example.org node 192.168.1.17 "
        "ssn 123-45-6789 call 415-555-0100 ok"
    )
    out = _one(spark, s, TX.redact_pii("text"))
    assert out == "mail <EMAIL> node <IP> ssn <SSN> call <PHONE> ok"
    counts = spark.createDataFrame([(s,)], "text string").select(
        *[c.alias(n) for n, c in TX.pii_counts("text").items()]
    ).collect()[0]
    assert counts.asDict() == {"email": 1, "ip": 1, "ssn": 1, "phone": 1}


def test_redact_pii_leaves_clean_text_alone(spark):
    s = "version 3.14 of the thing shipped in 2024 at half past 12"
    assert _one(spark, s, TX.redact_pii("text")) == s


def test_repetition_filters_flag_degenerate_doc(spark):
    """'spam spam spam spam' has TTR 0.25 and top-word fraction 1.0 —
    the repetition thresholds must reject it while keeping varied
    text. Exercises the t7 signal algebra end-to-end on tiny input."""
    import __spark_entry__ as E

    import os, tempfile
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "the quick brown fox jumps over one lazy dog today"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["t7_repetition_filters"](spark, d).collect()
    }
    assert out[1]["keep"] is False and out[1]["top_word_frac"] == 1.0
    assert out[2]["keep"] is True and out[2]["ttr"] == 1.0
