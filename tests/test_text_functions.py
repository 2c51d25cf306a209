"""Text-analysis builders: language-ID, quality, token count, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_webcrawler_spark.functions import text as X


def test_lang_id(spark):
    rows = [
        (1, "the cat and the dog went to the park of wonders"),
        (2, "der hund und die katze ist im haus und der garten"),
        (3, "le chat et la maison et les arbres"),
        (4, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", X.lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, this is the test of the tokens!"),
         (2, "!!!???;;;"),
         (3, "x " * 200)],
        "id long, text string")
    out = {r.id: (r.tc, r.q) for r in df.select(
        "id", X.token_count("text").alias("tc"),
        X.quality_score("text").alias("q")).collect()}
    assert out[1][0] == 9
    assert out[2][0] == 0
    assert out[1][1] > out[2][1]            # punctuation soup scores worse
    assert 0.0 <= out[2][1] <= 1.0


def test_fingerprint_position_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdef"), (3, "abcdfe"), (4, "fedcba")],
        "id long, text string")
    got = {r.id: r.fp for r in df.select("id", X.fingerprint("text").alias("fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]                 # transposition changes the hash
    assert got[1] != got[4]
