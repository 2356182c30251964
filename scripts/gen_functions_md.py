"""Generate FUNCTIONS.md — the per-name audit of every reference built-in.

Reads the 224 `name("...")` definitions from the reference's
BuiltInFunctionDefinitions.java (flink-table-common
.../functions/BuiltInFunctionDefinitions.java), classifies each against this
engine, VALIDATES every claimed Spark builtin against the live
FunctionRegistry (spark.catalog.functionExists), and writes the checklist.

Statuses:
  builtin  — same semantics via a Spark SQL function (named)
  shim     — installed by functions/registry.py (Catalyst-inlined SQL fn)
  mapped   — expressible as a short Spark expression/recipe (given)
  dsl      — expression-DSL/syntax artifact; Spark operator/syntax (given)
  planner  — planner/streaming-internal; Spark equivalent noted
  helper   — python-level helper in this repo
  missing  — no equivalent; noted divergence

Usage: python scripts/gen_functions_md.py  (writes FUNCTIONS.md, exits 1 on
any builtin mapping that does not resolve in the live registry)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = (
    "/root/reference/flink-table/flink-table-common/src/main/java/org/apache/"
    "flink/table/functions/BuiltInFunctionDefinitions.java"
)

# name -> (status, spark equivalent / recipe, note)
M: dict[str, tuple[str, str, str]] = {
    # --- planner / internal ---
    "$HASHCODE$1": ("planner", "hash(...)", "internal hash for distribution"),
    "$REPLICATE_ROWS$1": ("planner", "Catalyst RewriteExceptAll/IntersectAll", "set-op rewrite internal"),
    "$UNNEST_ROWS$1": ("planner", "explode / posexplode", "unnest internal"),
    "AGG_DECIMAL_MINUS": ("planner", "decimal sum (Catalyst)", "internal decimal agg helper"),
    "AGG_DECIMAL_PLUS": ("planner", "decimal sum (Catalyst)", "internal decimal agg helper"),
    "HIVE_AGG_DECIMAL_PLUS": ("planner", "decimal sum (Catalyst)", "hive-compat internal"),
    "SOURCE_WATERMARK": ("planner", "withWatermark(col, delay)", "watermark declared on the stream, not in DDL"),
    "proctime": ("planner", "processing-time trigger", "SS has no proctime column; trigger-based"),
    "rowtime": ("planner", "withWatermark event-time column", "event-time attribute"),
    "currentRowTimestamp": ("planner", "current_timestamp()", "row-level ts at emission"),
    "streamRecordTimestamp": ("planner", "n/a", "StreamRecord internal ts"),
    "CURRENT_WATERMARK": ("helper", "streaming.utils.current_watermark", "from StreamingQueryProgress"),
    # --- ARRAY_* ---
    "ARRAY_AGG": ("builtin", "array_agg", ""),
    "ARRAY_APPEND": ("builtin", "array_append", ""),
    "ARRAY_CONCAT": ("builtin", "concat", "concat() accepts arrays"),
    "ARRAY_CONTAINS": ("builtin", "array_contains", ""),
    "ARRAY_DISTINCT": ("builtin", "array_distinct", ""),
    "ARRAY_EXCEPT": ("builtin", "array_except", ""),
    "ARRAY_INTERSECT": ("builtin", "array_intersect", ""),
    "ARRAY_JOIN": ("builtin", "array_join", ""),
    "ARRAY_MAX": ("builtin", "array_max", ""),
    "ARRAY_MIN": ("builtin", "array_min", ""),
    "ARRAY_POSITION": ("builtin", "array_position", ""),
    "ARRAY_PREPEND": ("builtin", "array_prepend", ""),
    "ARRAY_REMOVE": ("builtin", "array_remove", ""),
    "ARRAY_REVERSE": ("builtin", "reverse", "reverse() accepts arrays"),
    "ARRAY_SLICE": ("builtin", "slice", ""),
    "ARRAY_SORT": ("builtin", "array_sort", ""),
    "ARRAY_UNION": ("builtin", "array_union", ""),
    # --- strings / misc uppercase ---
    "BTRIM": ("builtin", "btrim", ""),
    "COALESCE": ("builtin", "coalesce", ""),
    "ELT": ("builtin", "elt", ""),
    "ENDSWITH": ("builtin", "endswith", ""),
    "GREATEST": ("builtin", "greatest", ""),
    "IFNULL": ("builtin", "ifnull", ""),
    "LEAST": ("builtin", "least", ""),
    "LIKE": ("builtin", "like", "also LIKE operator"),
    "PERCENTILE": ("builtin", "percentile", ""),
    "PRINTF": ("builtin", "printf", ""),
    "REGEXP_COUNT": ("builtin", "regexp_count", ""),
    "REGEXP_EXTRACT_ALL": ("builtin", "regexp_extract_all", ""),
    "REGEXP_INSTR": ("builtin", "regexp_instr", ""),
    "REGEXP_SUBSTR": ("builtin", "regexp_substr", ""),
    "SPLIT": ("builtin", "split", ""),
    "STARTSWITH": ("builtin", "startswith", ""),
    "TRY_CAST": ("dsl", "TRY_CAST(x AS type)", "parser syntax, also Column.try_cast"),
    "TYPEOF": ("builtin", "typeof", ""),
    "UNHEX": ("builtin", "unhex", ""),
    "URL_DECODE": ("builtin", "url_decode", ""),
    "URL_ENCODE": ("builtin", "url_encode", ""),
    "TRANSLATE3": ("shim", "translate3 -> translate", "functions/registry.py"),
    # --- JSON ---
    "IS_JSON": ("shim", "is_json -> try_parse_json IS NOT NULL", "functions/registry.py"),
    "JSON_ARRAY": ("shim", "json_array3 -> to_json(filtered array)", "fixed arity 3, ABSENT ON NULL"),
    "JSON_ARRAYAGG_ABSENT_ON_NULL": ("mapped", "to_json(array_agg(x) FILTER (WHERE x IS NOT NULL))", ""),
    "JSON_ARRAYAGG_NULL_ON_NULL": ("mapped", "to_json(array_agg(x))", ""),
    "JSON_EXISTS": ("shim", "json_exists -> get_json_object IS NOT NULL", "functions/registry.py"),
    "JSON_OBJECT": ("shim", "json_object -> to_json(map(k, v))", "fixed arity 1 pair"),
    "JSON_OBJECTAGG_ABSENT_ON_NULL": ("mapped", "to_json(map_from_entries(collect_list(struct(k,v))))", "queries/aggregates.py json_objectagg"),
    "JSON_OBJECTAGG_NULL_ON_NULL": ("mapped", "same with null-keeping collect", ""),
    "JSON_QUERY": ("builtin", "get_json_object", "returns STRING not JSON type — divergence"),
    "JSON_QUOTE": ("shim", "json_quote", "functions/registry.py"),
    "JSON_STRING": ("shim", "json_string", "scalar-to-JSON-literal; string arity"),
    "JSON_UNQUOTE": ("shim", "json_unquote -> get_json_object(s,'$')", "functions/registry.py"),
    "JSON_VALUE": ("shim", "json_value -> get_json_object", "functions/registry.py"),
    # --- MAP ---
    "MAP_ENTRIES": ("builtin", "map_entries", ""),
    "MAP_FROM_ARRAYS": ("builtin", "map_from_arrays", ""),
    "MAP_KEYS": ("builtin", "map_keys", ""),
    "MAP_UNION": ("builtin", "map_concat", ""),
    "MAP_VALUES": ("builtin", "map_values", ""),
    # --- lowercase: operators / DSL ---
    "and": ("dsl", "AND / &", ""),
    "or": ("dsl", "OR / |", ""),
    "not": ("dsl", "NOT / ~", ""),
    "as": ("dsl", ".alias()", ""),
    "asc": ("dsl", ".asc()", ""),
    "desc": ("dsl", ".desc()", ""),
    "at": ("builtin", "element_at", ""),
    "between": ("dsl", "BETWEEN / Column.between", ""),
    "notBetween": ("dsl", "NOT BETWEEN", ""),
    "cast": ("dsl", "CAST / .cast()", ""),
    "reinterpretCast": ("planner", ".cast()", "no checked reinterpret; plain cast"),
    "distinct": ("dsl", "DISTINCT / .distinct()", ""),
    "divide": ("dsl", "/", ""),
    "equals": ("dsl", "=", ""),
    "notEquals": ("dsl", "<> / !=", ""),
    "greaterThan": ("dsl", ">", ""),
    "greaterThanOrEqual": ("dsl", ">=", ""),
    "lessThan": ("dsl", "<", ""),
    "lessThanOrEqual": ("dsl", "<=", ""),
    "in": ("dsl", "IN / .isin()", ""),
    "get": ("dsl", "struct field access col.field / col['f']", ""),
    "element": ("dsl", "single-field struct access", ""),
    "flatten": ("dsl", "select('s.*') for structs; flatten() for arrays", ""),
    "minus": ("dsl", "-", ""),
    "minusPrefix": ("dsl", "unary -", ""),
    "plus": ("dsl", "+", ""),
    "times": ("dsl", "*", ""),
    "mod": ("builtin", "mod", "also % operator"),
    "over": ("dsl", "OVER / Window spec", ""),
    "rangeTo": ("dsl", "sequence(a, b)", "Table-API range literal"),
    "row": ("builtin", "struct", ""),
    "array": ("builtin", "array", ""),
    "map": ("builtin", "map", ""),
    "start": ("dsl", "window().start field", ""),
    "end": ("dsl", "window().end field", ""),
    "withColumns": ("dsl", "select(*cols)", ""),
    "withoutColumns": ("dsl", ".drop(*cols)", ""),
    "isFalse": ("shim", "is_false -> x IS NOT DISTINCT FROM FALSE", "functions/registry.py"),
    "isNotFalse": ("shim", "is_not_false -> x IS DISTINCT FROM FALSE", "functions/registry.py"),
    "isTrue": ("shim", "is_true -> x IS NOT DISTINCT FROM TRUE", "functions/registry.py"),
    "isNotTrue": ("shim", "is_not_true -> x IS DISTINCT FROM TRUE", "functions/registry.py"),
    "isNull": ("builtin", "isnull", "also IS NULL"),
    "isNotNull": ("builtin", "isnotnull", "also IS NOT NULL"),
    "ifThenElse": ("builtin", "if", "also CASE WHEN; if_then_else shim"),
    # --- scalar math ---
    "abs": ("builtin", "abs", ""),
    "acos": ("builtin", "acos", ""),
    "asin": ("builtin", "asin", ""),
    "atan": ("builtin", "atan", ""),
    "atan2": ("builtin", "atan2", ""),
    "bin": ("builtin", "bin", ""),
    "cardinality": ("builtin", "cardinality", "array/map size"),
    "ceil": ("builtin", "ceil", ""),
    "cos": ("builtin", "cos", ""),
    "cosh": ("builtin", "cosh", ""),
    "cot": ("builtin", "cot", ""),
    "degrees": ("builtin", "degrees", ""),
    "e": ("builtin", "e", ""),
    "exp": ("builtin", "exp", ""),
    "floor": ("builtin", "floor", ""),
    "hex": ("builtin", "hex", ""),
    "ln": ("builtin", "ln", ""),
    "log": ("builtin", "log", ""),
    "log10": ("builtin", "log10", ""),
    "log2": ("builtin", "log2", ""),
    "pi": ("builtin", "pi", ""),
    "power": ("builtin", "power", ""),
    "radians": ("builtin", "radians", ""),
    "rand": ("builtin", "rand", ""),
    "randInteger": ("shim", "rand_integer", "functions/registry.py"),
    "round": ("builtin", "round", ""),
    "sign": ("builtin", "sign", ""),
    "sin": ("builtin", "sin", ""),
    "sinh": ("builtin", "sinh", ""),
    "sqrt": ("builtin", "sqrt", ""),
    "tan": ("builtin", "tan", ""),
    "tanh": ("builtin", "tanh", ""),
    "truncate": ("shim", "truncate_num", "toward-zero numeric truncate"),
    # --- strings ---
    "ascii": ("builtin", "ascii", ""),
    "charLength": ("builtin", "char_length", "char_length_ shim also installed"),
    "chr": ("builtin", "char", "Spark names it char()"),
    "concat": ("builtin", "concat", ""),
    "concat_ws": ("builtin", "concat_ws", ""),
    "decode": ("builtin", "decode", ""),
    "encode": ("builtin", "encode", ""),
    "fromBase64": ("builtin", "unbase64", "from_base64_ shim also installed"),
    "initCap": ("builtin", "initcap", ""),
    "instr": ("builtin", "instr", ""),
    "left": ("builtin", "left", ""),
    "locate": ("builtin", "locate", ""),
    "lower": ("builtin", "lower", ""),
    "lowerCase": ("builtin", "lower", "alias"),
    "lpad": ("builtin", "lpad", ""),
    "ltrim": ("builtin", "ltrim", ""),
    "overlay": ("builtin", "overlay", ""),
    "parseUrl": ("builtin", "parse_url", ""),
    "position": ("builtin", "position", ""),
    "regexp": ("builtin", "regexp", "also RLIKE"),
    "regexpExtract": ("builtin", "regexp_extract", ""),
    "regexpReplace": ("builtin", "regexp_replace", ""),
    "repeat": ("builtin", "repeat", ""),
    "replace": ("builtin", "replace", ""),
    "reverse": ("builtin", "reverse", ""),
    "right": ("builtin", "right", ""),
    "rpad": ("builtin", "rpad", ""),
    "rtrim": ("builtin", "rtrim", ""),
    "similar": ("shim", "similar_to", "SQL SIMILAR TO semantics"),
    "splitIndex": ("shim", "split_index", "functions/registry.py"),
    "strToMap": ("builtin", "str_to_map", ""),
    "substr": ("builtin", "substr", ""),
    "substring": ("builtin", "substring", ""),
    "toBase64": ("builtin", "base64", "to_base64_ shim also installed"),
    "trim": ("builtin", "trim", ""),
    "upper": ("builtin", "upper", ""),
    "upperCase": ("builtin", "upper", "alias"),
    "uuid": ("builtin", "uuid", ""),
    # --- hashing ---
    "md5": ("builtin", "md5", ""),
    "sha1": ("builtin", "sha1", ""),
    "sha2": ("builtin", "sha2", ""),
    "sha224": ("shim", "sha224 -> sha2(x,224)", "functions/registry.py"),
    "sha256": ("shim", "sha256 -> sha2(x,256)", "functions/registry.py"),
    "sha384": ("shim", "sha384 -> sha2(x,384)", "functions/registry.py"),
    "sha512": ("shim", "sha512 -> sha2(x,512)", "functions/registry.py"),
    # --- temporal ---
    "convertTz": ("builtin", "convert_timezone", ""),
    "currentDate": ("builtin", "current_date", ""),
    "currentDatabase": ("builtin", "current_database", ""),
    "currentTime": ("shim", "current_time_ (HH:mm:ss string)", "Spark has no TIME type — string divergence"),
    "currentTimestamp": ("builtin", "current_timestamp", ""),
    "dateFormat": ("builtin", "date_format", ""),
    "extract": ("builtin", "extract", ""),
    "fromUnixtime": ("builtin", "from_unixtime", ""),
    "localTime": ("shim", "local_time_ (HH:mm:ss string)", "Spark has no TIME type — string divergence"),
    "localTimestamp": ("builtin", "localtimestamp", ""),
    "now": ("builtin", "now", ""),
    "temporalOverlaps": ("shim", "temporal_overlaps", "SQL-standard OVERLAPS, endpoint-sorted"),
    "timestampDiff": ("dsl", "timestampdiff(UNIT, a, b)", "parser-level function syntax"),
    "toDate": ("builtin", "to_date", ""),
    "toTimestamp": ("builtin", "to_timestamp", ""),
    "toTimestampLtz": ("builtin", "to_timestamp_ltz", ""),
    "unixTimestamp": ("builtin", "unix_timestamp", ""),
    # --- aggregates ---
    "avg": ("builtin", "avg", ""),
    "collect": ("mapped", "collect_list (multiset as array)", ""),
    "count": ("builtin", "count", ""),
    "first_value": ("builtin", "first_value", ""),
    "last_value": ("builtin", "last_value", ""),
    "lag": ("builtin", "lag", ""),
    "lead": ("builtin", "lead", ""),
    "listAgg": ("builtin", "listagg", "also concat_ws(collect_list) recipe"),
    "max": ("builtin", "max", ""),
    "min": ("builtin", "min", ""),
    "stddevPop": ("builtin", "stddev_pop", ""),
    "stddevSamp": ("builtin", "stddev_samp", ""),
    "sum": ("builtin", "sum", ""),
    "sum0": ("mapped", "coalesce(sum(x), 0)", ""),
    "varPop": ("builtin", "var_pop", ""),
    "varSamp": ("builtin", "var_samp", ""),
}


def ref_names() -> list[str]:
    with open(REF) as f:
        src = f.read()
    return sorted(set(re.findall(r'name\("([^"]+)"\)', src)))


def main() -> int:
    names = ref_names()
    missing_rows = [n for n in names if n not in M]
    extra_rows = [n for n in M if n not in names]
    if missing_rows or extra_rows:
        print("UNMAPPED:", missing_rows, "\nSTALE:", extra_rows, file=sys.stderr)
        return 1

    from apache_flink_spark.session import get_spark

    spark = get_spark(app_name="fn_audit")
    from apache_flink_spark.functions.registry import _SQL_FUNCTIONS, register_all

    register_all(spark)
    bad = []
    for n in names:
        status, equiv, _ = M[n]
        if status == "builtin":
            fn = equiv.split()[0]
            if not spark.catalog.functionExists(fn):
                bad.append((n, fn))
        elif status == "shim":
            fn = equiv.split()[0]
            if fn not in _SQL_FUNCTIONS:
                bad.append((n, fn + " (shim not registered)"))
    if bad:
        print("UNRESOLVED:", bad, file=sys.stderr)
        return 1

    counts: dict[str, int] = {}
    for n in names:
        counts[M[n][0]] = counts.get(M[n][0], 0) + 1
    lines = [
        "# FUNCTIONS — per-name audit of the reference's 224 built-ins",
        "",
        "Source: reference flink-table-common BuiltInFunctionDefinitions.java",
        "(every `name(\"...\")` definition). Statuses: builtin = same semantics",
        "via a Spark SQL function (validated against the live FunctionRegistry",
        "by scripts/gen_functions_md.py); shim = installed by",
        "functions/registry.py; mapped = short Spark recipe; dsl = expression-",
        "DSL/syntax artifact with Spark syntax equivalent; planner = planner/",
        "streaming internal; helper = python helper; missing = divergence.",
        "",
        "Counts: " + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())),
        f" (total {len(names)})",
        "",
        "| Reference name | Status | Spark equivalent | Note |",
        "|---|---|---|---|",
    ]
    for n in names:
        status, equiv, note = M[n]
        lines.append(f"| `{n}` | {status} | `{equiv}` | {note} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "FUNCTIONS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(names)} names, {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
