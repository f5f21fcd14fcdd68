"""Parity of the pure-Python xxHash64 (gocrd_spark.pyxxh) with Spark's
JVM ``F.xxhash64`` — the foundation the independent golden twins stand
on. Covers every framing the operators use: strings (all tail lengths,
multi-byte UTF-8, >=32-byte stripes), int literals, long columns, and
the multi-argument fold."""

import random

from pyspark.sql import functions as F

from gocrd_spark.pyxxh import spark_xxhash64


def _spark_hash_strings(spark, strings, extra_int=None):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    col = F.xxhash64("s") if extra_int is None else F.xxhash64("s", F.lit(extra_int))
    return [r.h for r in df.select(col.alias("h")).collect()]


def test_string_parity(spark):
    rng = random.Random(7)
    strings = [
        "",
        "a",
        "abc",
        "the quick brown fox jumps over the lazy dog",
        "ſchaͤdlich Unmuͤndigkeit über",  # multi-byte UTF-8
        "x" * 31,
        "y" * 32,
        "z" * 33,
        "w" * 100,
    ] + ["".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 80)))
         for _ in range(60)]
    got = _spark_hash_strings(spark, strings)
    want = [spark_xxhash64(s) for s in strings]
    assert got == want


def test_string_int_fold_parity(spark):
    """F.xxhash64(string, F.lit(i)) — the MinHash permutation shape."""
    strings = ["", "shingle one two", "aͤ ü ſ", "m" * 40]
    for i in (0, 1, 5, 31):
        got = _spark_hash_strings(spark, strings, extra_int=i)
        want = [spark_xxhash64(s, i) for s in strings]
        assert got == want, f"seed-fold mismatch at i={i}"


def test_long_column_parity(spark):
    rng = random.Random(11)
    vals = [0, 1, -1, 2**40, -(2**40), 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(40)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r.h for r in df.select(F.xxhash64("v").alias("h")).collect()]
    want = [spark_xxhash64(("long", v)) for v in vals]
    assert got == want


def test_int_literal_is_integer_type(spark):
    """Pin the PySpark literal-typing assumption: F.lit(small int) is
    IntegerType (4-byte framing), not LongType."""
    df = spark.range(1)
    got = df.select(F.xxhash64(F.lit(3)).alias("h")).collect()[0].h
    assert got == spark_xxhash64(3)
    assert got != spark_xxhash64(("long", 3))
