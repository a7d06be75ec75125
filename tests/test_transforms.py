"""CREATE_LIKE AST-translator tests.

Transform goldens from the reference (unittests_utils.py:158-204):
``2 * __x`` on int, ``__x.split('-')[0]`` on string, ``round(__x)`` on
float with None passthrough, and ``__x ** 2`` (unittests_utils.py:302).
"""

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.plans.transforms import (
    TransformTranslationError,
    translate_create_like,
)


def run1(spark, source, value, input_type):
    fn = translate_create_like(source)
    df = spark.range(1).select(F.lit(value).cast(input_type).alias("x"))
    return df.select(fn(F.col("x")).alias("y")).collect()[0]["y"]


def test_arithmetic(spark):
    assert run1(spark, "lambda __x: 2 * __x", 31038, "long") == 62076
    assert run1(spark, "lambda __x: __x ** 2", 6.6, "double") == pytest.approx(6.6**2)
    assert run1(spark, "lambda __x: __x + 1 - 2", 10, "long") == 9
    assert run1(spark, "lambda __x: -__x", 5, "long") == -5
    assert run1(spark, "lambda __x: __x / 4", 10, "long") == 2.5


def test_split_subscript(spark):
    src = "lambda __x: __x.split('-')[0]"
    assert run1(spark, src, "JGUZOCJCNMVJHU-UHFFFAOYSA-N", "string") == "JGUZOCJCNMVJHU"
    src_last = "lambda __x: __x.split('-')[-1]"
    assert run1(spark, src_last, "JGUZOCJCNMVJHU-UHFFFAOYSA-N", "string") == "N"


def test_round_is_bankers(spark):
    # Python round() is HALF_EVEN: round(0.5) == 0, round(1.5) == 2,
    # round(6.6) == 7. F.round would give 1 for 0.5 — parity requires bround.
    assert run1(spark, "lambda __x: round(__x)", 6.6, "double") == 7.0
    assert run1(spark, "lambda __x: round(__x)", 0.5, "double") == 0.0
    assert run1(spark, "lambda __x: round(__x)", 1.5, "double") == 2.0
    assert run1(spark, "lambda __x: round(__x, 1)", 6.66, "double") == 6.7


def test_none_passthrough(spark):
    fn = translate_create_like("lambda __x: round(__x)")
    df = spark.range(1).select(F.lit(None).cast("double").alias("x"))
    assert df.select(fn(F.col("x")).alias("y")).collect()[0]["y"] is None


def test_string_methods(spark):
    assert run1(spark, "lambda __x: __x.upper()", "abc", "string") == "ABC"
    assert run1(spark, "lambda __x: __x.lower()", "AbC", "string") == "abc"
    assert run1(spark, "lambda __x: __x.strip()", "  a  ", "string") == "a"
    assert run1(spark, "lambda __x: __x.replace('a', 'b')", "aba", "string") == "bbb"


def test_rejects_non_whitelisted():
    for bad in (
        "lambda __x: __import__('os')",
        "lambda __x: open('/etc/passwd')",
        "lambda __x: [v for v in __x]",
        "lambda __x, __y: __x",
        "not even a lambda",
        "lambda: __x: __x.split('-')[0]",  # the reference's shipped typo
    ):
        with pytest.raises(TransformTranslationError):
            translate_create_like(bad)


def test_shingle_udf_matches_column_spec(spark, sf_dir):
    """shingle_array_udf (hot path) must produce exactly what the Column
    expression word_shingles (the semantic spec / oracle reference) does."""
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.functions.text import (
        shingle_array_udf,
        word_shingles,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    both = d.select(
        "doc_id",
        word_shingles(F.col("text"), 3).alias("spec"),
        shingle_array_udf(3)(F.col("text")).alias("fast"),
    )
    bad = both.filter(F.col("spec") != F.col("fast")).count()
    assert bad == 0


def test_scrub_pii(spark):
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.functions.text import scrub_pii

    rows = [
        (1, "contact alice.smith+x@example.co.uk now"),
        (2, "call 555-123-4567 or +49 1234 567 ok"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in df.select("id", scrub_pii(F.col("text")).alias("clean")).collect()
    }
    assert got[1] == "contact <EMAIL> now"
    assert got[2] == "call <PHONE> or +49 1234 567 ok"  # 3-3-4 shape only
    assert got[3] == "nothing here"


def test_repetition_signals(spark):
    from pyspark.sql import functions as F

    from local_pubchem_db_spark.functions.text import repetition_signals_udf

    rows = [(1, "a b c a b c a b c"), (2, "x y"), (3, "u v w z")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["s"]["n_tokens"], r["s"]["n_3grams"],
                  r["s"]["n_dup_3grams"], r["s"]["max_tok_count"])
        for r in df.select("id", repetition_signals_udf()(F.col("text")).alias("s")).collect()
    }
    # 9 tokens -> 7 3-grams, 3 distinct ("a b c","b c a","c a b") -> 4 dups
    assert got[1] == (9, 7, 4, 3)
    assert got[2] == (2, 0, 0, 1)
    assert got[3] == (4, 2, 0, 1)
