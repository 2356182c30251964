"""Flink-named function surface: Python wrappers + SQL registrations."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.functions import scalar as S


def test_python_wrappers(spark):
    df = spark.createDataFrame(
        [("a,b,c", '{"k": 7}', "hello world")], "csv string, js string, txt string"
    )
    row = df.select(
        S.split_index("csv", ",", 1).alias("si"),
        S.str_to_map("csv", ",", "=").alias("m"),
        S.translate3("txt", "lo", "01").alias("tr"),
        S.regexp_count("txt", "l").alias("rc"),
        S.char_length("txt").alias("cl"),
        S.json_value("js", "$.k").alias("jv"),
        S.json_exists("js", "$.k").alias("je"),
        S.json_exists("js", "$.missing").alias("jm"),
        S.is_json("js").alias("ij"),
        S.if_then_else(F.lit(True), F.lit("y"), F.lit("n")).alias("ite"),
        S.btrim(F.lit("  x  ")).alias("bt"),
        S.try_cast(F.lit("12x"), "int").alias("tc"),
    ).collect()[0]
    assert row.si == "b"
    assert row.tr == "he001 w1r0d"
    assert row.rc == 3
    assert row.cl == 11
    assert row.jv == "7"
    assert row.je is True and row.jm is False
    assert row.ij is True
    assert row.ite == "y"
    assert row.bt == "x"
    assert row.tc is None


def test_sql_registered_functions(spark, sf_dir):
    te = TableEnvironment(spark=spark)
    te.use_data_dir(sf_dir)
    row = te.sql(
        """SELECT split_index('x|y|z', '\\\\|', 2) AS si,
                  translate3('abc', 'ab', 'xy') AS tr,
                  json_value(props, '$.k') AS jv,
                  json_exists(props, '$.k') AS je,
                  is_json(props) AS ij,
                  json_unquote('"q"') AS ju
           FROM events LIMIT 1"""
    ).collect()[0]
    assert row.si == "z"
    assert row.tr == "xyc"
    assert row.jv is not None
    assert row.je is True
    assert row.ij is True
    assert row.ju == "q"


def test_base64_roundtrip_sql(spark):
    TableEnvironment(spark=spark)
    row = spark.sql(
        "SELECT from_base64_(to_base64_('flink')) AS rt"
    ).collect()[0]
    assert row.rt == "flink"


def test_temporal_numeric_hash_shims(spark):
    TableEnvironment(spark=spark)
    row = spark.sql(
        """SELECT temporal_overlaps(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-01 02:00:00',
                                    TIMESTAMP '2024-01-01 01:00:00',
                                    TIMESTAMP '2024-01-01 03:00:00') AS ov,
                  temporal_overlaps(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-01 01:00:00',
                                    TIMESTAMP '2024-01-01 01:00:00',
                                    TIMESTAMP '2024-01-01 02:00:00') AS adj,
                  truncate_num(3.14159, 2) AS tpos,
                  truncate_num(-3.14159, 2) AS tneg,
                  rand_integer(10) AS ri,
                  sha224('x') AS h224, sha384('x') AS h384, sha512('x') AS h512
        """
    ).collect()[0]
    assert row.ov is True
    # SQL-standard OVERLAPS (reference TemporalOverlapsConverter): closed
    # comparison after endpoint sorting — touching intervals DO overlap.
    assert row.adj is True
    assert row.tpos == 3.14 and row.tneg == -3.14  # toward zero, not floor
    assert 0 <= row.ri < 10
    assert (len(row.h224), len(row.h384), len(row.h512)) == (56, 96, 128)


def test_similar_to(spark):
    TableEnvironment(spark=spark)
    row = spark.sql(
        """SELECT similar_to('abcdef', 'abc%') AS pre,
                  similar_to('abcdef', '%c_e%') AS mid,
                  similar_to('abcdef', 'abc') AS whole,
                  similar_to('abc', 'a(b|x)c') AS alt,
                  similar_to('abc', 'a.c') AS dotlit,
                  similar_to('a.c', 'a.c') AS dotmatch,
                  similar_to('a$b', 'a$b') AS dollarlit
        """
    ).collect()[0]
    assert row.pre is True
    assert row.mid is True
    assert row.whole is False  # anchored: must match the ENTIRE string
    assert row.alt is True  # regex alternation passes through per the standard
    assert row.dotlit is False  # '.' is a LITERAL in SIMILAR TO, not any-char
    assert row.dotmatch is True
    assert row.dollarlit is True  # '$' is a literal, not an anchor


def test_boolean_predicate_shims(spark):
    """IS_TRUE family: three-valued logic collapsed exactly as the
    reference's null-safe predicates."""
    from apache_flink_spark.functions.registry import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT is_true(true) a, is_true(false) b, is_true(CAST(NULL AS BOOLEAN)) c,"
        " is_false(false) d, is_false(CAST(NULL AS BOOLEAN)) e,"
        " is_not_true(CAST(NULL AS BOOLEAN)) f, is_not_false(CAST(NULL AS BOOLEAN)) g"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (True, False, False)
    assert (r.d, r.e) == (True, False)
    assert (r.f, r.g) == (True, True)
