"""Unit tests for the column-function library (golden values)."""

import pytest
from pyspark.sql import functions as F

from pyperustats_spark.functions.dates import parse_period, quarter_label
from pyperustats_spark.functions.hashing import (
    hamming64,
    md5_hash64,
    minhash_coeffs,
    simhash64,
)
from pyperustats_spark.functions.text import (
    char_ngrams,
    clean_numeric,
    slugify,
    token_count,
    tokens,
    word_ngrams,
)
from pyperustats_spark.functions.vectors import cosine, dot, norm


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_parse_period_daily_spanish(spark):
    v = one(spark, parse_period(F.lit("15.Ene.23"), "D"))
    assert v.isoformat().startswith("2023-01-15")


def test_parse_period_quarter_end(spark):
    v = one(spark, parse_period(F.lit("Q1.23"), "Q"))
    assert v.isoformat().startswith("2023-03-31")


def test_quarter_label(spark):
    v = one(spark, quarter_label(F.lit("2023-05-10").cast("timestamp")))
    assert v == "2023Q2"


def test_clean_numeric(spark):
    assert one(spark, clean_numeric(F.lit("3,400,841.50"))) == 3400841.50
    assert one(spark, clean_numeric(F.lit("abc"))) is None
    assert one(spark, clean_numeric(F.lit("1,200"))) == 1200.0


def test_slugify(spark):
    assert one(spark, slugify(F.lit("  Módulo 01: Datos!  "))) == "m-dulo-01-datos"


def test_tokens_and_count(spark):
    assert one(spark, tokens(F.lit("Hello, world! it's me"))) == [
        "hello", "world", "it's", "me"]
    assert one(spark, token_count(F.lit("a b  c"))) == 3


def test_char_ngrams(spark):
    assert one(spark, char_ngrams(F.lit("abcd"), 3)) == ["abc", "bcd"]


def test_word_ngrams(spark):
    assert one(spark, word_ngrams(F.lit("a b c"), 2)) == ["a b", "b c"]
    assert one(spark, word_ngrams(F.lit("single"), 2)) == []


def test_md5_hash64_matches_duckdb(spark):
    import duckdb
    expected = duckdb.connect().execute(
        "SELECT CAST(concat('0x', substr(md5('hello'),1,15)) AS BIGINT)"
    ).fetchone()[0]
    assert one(spark, md5_hash64(F.lit("hello"))) == expected


def test_minhash_coeffs_deterministic():
    assert minhash_coeffs(4) == minhash_coeffs(4)
    assert len(set(minhash_coeffs(16))) == 16


def test_simhash_similar_texts_close(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    c = "completely unrelated words about spark query optimization engines"
    df = spark.createDataFrame([(a,), (b,), (c,)], "text string").select(
        simhash64(tokens(F.col("text"))).alias("h"))
    ha, hb, hc = [r["h"] for r in df.collect()]
    df2 = spark.range(1).select(
        hamming64(F.lit(ha), F.lit(hb)).alias("ab"),
        hamming64(F.lit(ha), F.lit(hc)).alias("ac"))
    r = df2.collect()[0]
    assert r["ab"] < r["ac"]


def test_vector_ops(spark):
    a = F.array(F.lit(1.0), F.lit(2.0), F.lit(2.0))
    b = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    assert one(spark, dot(a, b)) == 1.0
    assert one(spark, norm(a)) == 3.0
    assert one(spark, cosine(a, a)) == pytest.approx(1.0)
    assert one(spark, cosine(a, b)) == pytest.approx(1.0 / 3.0)


def test_strip_accents_matches_nfd(spark):
    import unicodedata

    from pyperustats_spark.functions.text import strip_accents

    samples = ["Cañete", "MÁNCORA", "çédille Ça", "über-Längen äöü",
               "plain ascii 42", "mixté ś decomposed"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r[0] for r in df.select(strip_accents(F.col("s"))).collect()]
    want = [
        "".join(c for c in unicodedata.normalize("NFD", s)
                if unicodedata.category(c) != "Mn")
        for s in samples
    ]
    assert got == want


def test_clean_text_es_reference_semantics(spark):
    from pyperustats_spark.functions.text import clean_text_es

    df = spark.createDataFrame(
        [("  Cañete—Sur  ",), ("san josé/de RÍO 2",)], "s string")
    got = [r[0] for r in df.select(clean_text_es(F.col("s"))).collect()]
    assert got == ["CANETE SUR", "SAN JOSE DE RIO 2"]


def test_most_common_by_group_tiebreak(spark):
    from pyperustats_spark.operators.relational import most_common_by_group

    rows = [(1, "b"), (1, "b"), (1, "a"), (2, "z"), (2, "y"), (3, "q")]
    df = spark.createDataFrame(rows, "g int, v string")
    got = {
        r["g"]: r["most_common"]
        for r in most_common_by_group(df, ["g"], "v").collect()
    }
    # group 1: clear winner; group 2: tie -> lexicographically smallest
    assert got == {1: "b", 2: "y", 3: "q"}
