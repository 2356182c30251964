"""Scalar function surface — string / regexp / math / temporal / JSON /
hash / conditional families.

Reference parity (SURVEY.md §2.10): the 224 built-in function definitions in
flink-table-common .../functions/BuiltInFunctionDefinitions.java (plus the
~313-operator FlinkSqlOperatorTable). Every function exercised here is the
Spark builtin named in the SURVEY §2.10 mapping table — all evaluate JVM-side
inside whole-stage codegen; no Python UDFs anywhere on this surface.

Oracle notes: functions are chosen for bit-identical cross-engine results —
integer/string functions are exact everywhere; the only floats involved come
from exact operations (abs/sub on doubles, sqrt which IEEE-754 requires
correctly rounded). Dates cross the boundary as formatted strings, regexp
semantics differences are normalized in the oracle SQL (DuckDB needs the 'g'
flag to match Spark's replace-all; DuckDB dayofweek is 0-based vs Spark's
1-based).

Scale: all of these are narrow per-row expressions — no shuffle, full
predicate/projection pushdown, and Catalyst constant-folds the literal
arguments. Nothing here changes shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t


@query(
    "fn_string_basics",
    oracle="""
    SELECT p_partkey,
           length(p_name) AS name_len,
           upper(p_type) AS up_type,
           substring(p_name, 1, 5) AS name5,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_name, ' ', '_') AS name_us,
           reverse(p_brand) AS brand_rev,
           repeat('ab', p_size % 3) AS rep,
           trim(concat(' ', p_name, ' ')) AS trimmed
    FROM part
    """,
)
def fn_string_basics(spark, sf_dir):
    """charLength/upper/substring/concat_ws/lpad/replace/reverse/repeat/trim
    (BuiltInFunctionDefinitions string group)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_type").alias("up_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.reverse("p_brand").alias("brand_rev"),
        F.expr("repeat('ab', p_size % 3)").alias("rep"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "fn_string_search",
    oracle="""
    SELECT p_partkey,
           strpos(p_name, 'widget') AS widget_pos,
           contains(p_name, 'bolt') AS has_bolt,
           starts_with(p_type, 'E') AS starts_e,
           ends_with(p_name, 'rod') AS ends_rod,
           string_split(p_name, ' ')[1] AS first_word,
           left(p_brand, 5) AS brand5,
           right(p_brand, 2) AS brand_tail,
           ascii(p_name) AS first_cp
    FROM part
    """,
)
def fn_string_search(spark, sf_dir):
    """position/instr, STARTSWITH/ENDSWITH, splitIndex, left/right, ascii."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "widget").alias("widget_pos"),
        F.col("p_name").contains("bolt").alias("has_bolt"),
        F.col("p_type").startswith("E").alias("starts_e"),
        F.col("p_name").endswith("rod").alias("ends_rod"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.expr("left(p_brand, 5)").alias("brand5"),
        F.expr("right(p_brand, 2)").alias("brand_tail"),
        F.ascii("p_name").alias("first_cp"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_int,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_type, '^E') AS is_economy,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels
    FROM part
    """,
)
def fn_regexp(spark, sf_dir):
    """REGEXP_EXTRACT / regexpReplace (replace-all, hence DuckDB 'g' flag) /
    regexp (RLIKE) / REGEXP_COUNT."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1)
        .cast("int")
        .alias("brand_int"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_type").rlike("^E").alias("is_economy"),
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(sign(l_quantity - 25.0) AS INTEGER) AS qty_sign,
           l_linenumber % 3 AS ln_mod,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           pow(l_quantity, 2) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    """abs/sign/mod/floor/ceil/power/sqrt/greatest/least — all exact or
    IEEE-correctly-rounded, so cross-engine bit-identical."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "fn_temporal",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dy,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           strftime(o_orderdate, '%Y-%m') AS ym,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_temporal(spark, sf_dir):
    """extract/dateFormat/timestampDiff/add-months/last_day. DuckDB's
    dayofweek is 0-based (Sunday=0) vs Spark's 1-based — normalized in the
    oracle; both engines clamp month addition to month-end identically."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus3mo"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_valid(props) AS is_json
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON_VALUE / IS_JSON over the events.props JSON column —
    get_json_object stays JVM-side (Jackson), no Python."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.get_json_object("props", "$").isNotNull().alias("is_json"),
    )


@query(
    "fn_hash_conditional",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg_or_dash,
           c_nationkey IN (1, 2, 3) AS small_nation,
           c_acctbal BETWEEN 0 AND 1000 AS low_pos
    FROM customer
    """,
)
def fn_hash_conditional(spark, sf_dir):
    """md5/sha2 + ifThenElse/COALESCE/NULLIF/in/between
    (comparison-logic group of BuiltInFunctionDefinitions)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("-")).alias(
            "seg_or_dash"
        ),
        F.col("c_nationkey").isin(1, 2, 3).alias("small_nation"),
        F.col("c_acctbal").between(0, 1000).alias("low_pos"),
    )


@query(
    "fn_null_semantics",
    oracle="""
    SELECT c_custkey,
           nullif(c_nationkey, 5) AS nk_or_null,
           nullif(c_nationkey, 5) IS NOT DISTINCT FROM NULL AS was_five,
           c_nationkey IS DISTINCT FROM c_custkey % 25 AS key_mismatch,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'redacted') AS seg2,
           CASE WHEN c_acctbal IS NULL THEN -1 ELSE 0 END AS null_flag
    FROM customer
    """,
)
def fn_null_semantics(spark, sf_dir):
    """Three-valued-logic surface: NULLIF, null-safe equality (Spark's <=> /
    eqNullSafe == ANSI IS NOT DISTINCT FROM), IS DISTINCT FROM, COALESCE
    fallbacks — the comparison-group semantics of
    BuiltInFunctionDefinitions."""
    c = t(spark, sf_dir, "customer")
    nk = F.nullif("c_nationkey", F.lit(5))
    return c.select(
        "c_custkey",
        nk.alias("nk_or_null"),
        nk.eqNullSafe(F.lit(None)).alias("was_five"),
        (~F.col("c_nationkey").eqNullSafe(F.col("c_custkey") % 25)).alias(
            "key_mismatch"
        ),
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("redacted")
        ).alias("seg2"),
        F.when(F.col("c_acctbal").isNull(), -1).otherwise(0).alias("null_flag"),
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT 'SpANSIQL' AS ov, 'b' AS el, 'x-007' AS pf,
           'Hello Spark World' AS ic, 'xycyx' AS tr, 'A' AS ch,
           'ababab' AS rp, CAST(3 AS INTEGER) AS lc, CAST(4 AS INTEGER) AS ps,
           'Spark' AS bt, CAST(4 AS INTEGER) AS ri, '123' AS rs,
           '1,22,333' AS rea, 'a+b%2Fc' AS ue, 'a b' AS ud,
           '1010' AS bn, '4142' AS hx, 'AB' AS uh,
           'h.io' AS pu, '2' AS sm, 'Sp' AS lf, 'rk' AS rt,
           CAST(3 AS INTEGER) AS ins, CAST(65 AS INTEGER) AS asc_
    """,
)
def fn_string_extended(spark, sf_dir):
    """Per-name sweep follow-up (FUNCTIONS.md): the string/regexp/url names
    the r1 family queries did not individually prove — OVERLAY, ELT, PRINTF,
    INITCAP, TRANSLATE3(translate), CHR(char), REPEAT, LOCATE, POSITION,
    BTRIM, REGEXP_INSTR, REGEXP_SUBSTR, REGEXP_EXTRACT_ALL, URL_ENCODE/
    DECODE, BIN, HEX/UNHEX, PARSE_URL, STR_TO_MAP, LEFT/RIGHT, INSTR, ASCII.
    Literal inputs -> hand-computed constants in the oracle, so the driver's
    hash compare pins each function's exact output."""
    _ = t(spark, sf_dir, "region")  # touch catalog (uniform query shape)
    return spark.sql(
        """SELECT
        overlay('SparkSQL', 'ANSI', 3, 4) AS ov,
        elt(2, 'a', 'b', 'c') AS el,
        printf('%s-%03d', 'x', 7) AS pf,
        initcap('hello spark world') AS ic,
        translate('abcba', 'ab', 'xy') AS tr,
        char(65) AS ch,
        repeat('ab', 3) AS rp,
        locate('ar', 'Spark') AS lc,
        position('rk' IN 'Spark') AS ps,
        btrim('xxSparkxx', 'x') AS bt,
        regexp_instr('abc123def', '[0-9]+') AS ri,
        regexp_substr('abc123def', '[0-9]+') AS rs,
        array_join(regexp_extract_all('a1b22c333', '[0-9]+', 0), ',') AS rea,
        url_encode('a b/c') AS ue,
        url_decode('a%20b') AS ud,
        bin(10) AS bn,
        hex('AB') AS hx,
        CAST(unhex('4142') AS STRING) AS uh,
        parse_url('https://h.io/p?q=1', 'HOST') AS pu,
        CAST(str_to_map('a:1,b:2', ',', ':')['b'] AS STRING) AS sm,
        left('Spark', 2) AS lf,
        right('Spark', 2) AS rt,
        instr('Spark', 'ar') AS ins,
        ascii('A') AS asc_
        """
    )


@query(
    "fn_json_constructors",
    oracle=r"""
    SELECT '{"a":"1"}' AS jo, '["x","y"]' AS ja, '"he\"y"' AS js,
           CAST(1 AS BIGINT) AS hr
    """,
)
def fn_json_constructors(spark, sf_dir):
    """JSON constructor shims (reference JSON_OBJECT / JSON_ARRAY /
    JSON_STRING; FUNCTIONS.md): fixed-arity SQL-function shims, Catalyst-
    inlined — json_array3 applies the reference's ABSENT ON NULL default.
    The hash-family row (sha256 shim) rides along as a length check."""
    from apache_flink_spark.functions.registry import register_all

    register_all(spark)
    _ = t(spark, sf_dir, "region")
    return spark.sql(
        """SELECT
        json_object('a', '1') AS jo,
        json_array3('x', NULL, 'y') AS ja,
        json_string('he"y') AS js,
        CAST(length(sha256('x')) / 64 AS BIGINT) AS hr
        """
    )


@query(
    "fn_collection_vectors",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS ap, CAST(2 AS INTEGER) AS ea,
           'a,b' AS mk, '1,2' AS mv, CAST(2 AS INTEGER) AS me,
           CAST(2 AS INTEGER) AS mfa, CAST(2 AS INTEGER) AS mu,
           '1,2,3' AS au, '1,3' AS ax, '2' AS ai,
           '1,2' AS aap, '1,2' AS apr, '2' AS arm,
           CAST(TRUE AS BOOLEAN) AS ac, '2,3' AS sl, '1,2' AS fl,
           '1,2,3,4' AS sq, CAST(3 AS INTEGER) AS cd
    """,
)
def fn_collection_vectors(spark, sf_dir):
    """Collection-family per-name proof (FUNCTIONS.md ARRAY_*/MAP_* rows):
    ARRAY_POSITION, element_at (AT), MAP_KEYS/VALUES/ENTRIES,
    MAP_FROM_ARRAYS, MAP_UNION(map_concat), ARRAY_UNION/EXCEPT/INTERSECT/
    APPEND/PREPEND/REMOVE/CONTAINS, ARRAY_SLICE(slice), flatten, sequence
    (rangeTo), CARDINALITY. Literal inputs -> hand-computed constants;
    array/map outputs serialize through array_join so the hash compare is
    order-stable."""
    _ = t(spark, sf_dir, "region")
    return spark.sql(
        """SELECT
        array_position(array('a','b','c'), 'b') AS ap,
        element_at(map('k1',1,'k2',2), 'k2') AS ea,
        array_join(array_sort(map_keys(map('b',2,'a',1))), ',') AS mk,
        array_join(transform(map_values(map('a',1,'b',2)),
                             x -> cast(x AS string)), ',') AS mv,
        size(map_entries(map('a',1,'b',2))) AS me,
        element_at(map_from_arrays(array('x','y'), array(1,2)), 'y') AS mfa,
        size(map_concat(map('a',1), map('b',2))) AS mu,
        array_join(transform(array_sort(array_union(array(1,2), array(2,3))),
                             x -> cast(x AS string)), ',') AS au,
        array_join(transform(array_sort(array_except(array(1,2,3), array(2))),
                             x -> cast(x AS string)), ',') AS ax,
        array_join(transform(array_intersect(array(1,2), array(2,3)),
                             x -> cast(x AS string)), ',') AS ai,
        array_join(transform(array_append(array(1), 2),
                             x -> cast(x AS string)), ',') AS aap,
        array_join(transform(array_prepend(array(2), 1),
                             x -> cast(x AS string)), ',') AS apr,
        array_join(transform(array_remove(array(1,2,1), 1),
                             x -> cast(x AS string)), ',') AS arm,
        array_contains(array(1,2), 2) AS ac,
        array_join(transform(slice(array(1,2,3,4), 2, 2),
                             x -> cast(x AS string)), ',') AS sl,
        array_join(transform(flatten(array(array(1),array(2))),
                             x -> cast(x AS string)), ',') AS fl,
        array_join(transform(sequence(1,4),
                             x -> cast(x AS string)), ',') AS sq,
        cardinality(array(1,2,3)) AS cd
        """
    )
