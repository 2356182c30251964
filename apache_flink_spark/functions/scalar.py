"""Scalar functions where the Flink name has no literal Spark twin.

Each wrapper cites the reference definition (BuiltInFunctionDefinitions.java,
abbreviated BFD, or flink-table-runtime .../functions/scalar/) and is
implemented as a *composition of built-in Catalyst expressions* — never a
Python UDF — so the whole surface stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "split_index",
    "str_to_map",
    "parse_url",
    "translate3",
    "regexp_count",
    "regexp_instr",
    "regexp_substr",
    "if_then_else",
    "char_length",
    "to_base64",
    "from_base64",
    "btrim",
    "elt_",
    "json_value",
    "json_exists",
    "json_quote",
    "json_unquote",
    "is_json",
    "url_encode",
    "url_decode",
    "try_cast",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_index(s, sep, idx) -> Column:
    """Flink SPLIT_INDEX(s, sep, i) — 0-based element of split, NULL if out of
    range (BFD name 'splitIndex'; RT=functions/scalar). Spark: split + 0-based
    element_at via array index arithmetic (element_at is 1-based)."""
    return F.element_at(F.split(_col(s), sep), F.lit(idx) + 1)


def str_to_map(s, pair_sep: str = ",", kv_sep: str = "=") -> Column:
    """Flink STR_TO_MAP (BFD 'strToMap') — Spark has str_to_map built-in."""
    return F.str_to_map(_col(s), F.lit(pair_sep), F.lit(kv_sep))


def parse_url(url, part, key=None) -> Column:
    """Flink parseUrl (BFD) — Spark parse_url."""
    if key is None:
        return F.parse_url(_col(url), F.lit(part))
    return F.parse_url(_col(url), F.lit(part), F.lit(key))


def translate3(s, search, replace) -> Column:
    """Flink TRANSLATE3(expr, from, to) (BFD 'TRANSLATE3') == Spark translate."""
    return F.translate(_col(s), search, replace)


def regexp_count(s, pattern) -> Column:
    """Flink REGEXP_COUNT (RT=functions/scalar/RegexpCountFunction.java)."""
    return F.regexp_count(_col(s), F.lit(pattern))


def regexp_instr(s, pattern) -> Column:
    return F.regexp_instr(_col(s), F.lit(pattern))


def regexp_substr(s, pattern) -> Column:
    return F.regexp_substr(_col(s), F.lit(pattern))


def if_then_else(cond, a, b) -> Column:
    """Flink ifThenElse (BFD) == CASE WHEN."""
    return F.when(cond, a).otherwise(b)


def char_length(s) -> Column:
    """Flink charLength (BFD) == Spark length (chars, not bytes)."""
    return F.length(_col(s))


def to_base64(s) -> Column:
    return F.base64(_col(s))


def from_base64(s) -> Column:
    return F.unbase64(_col(s))


def btrim(s, trim_str=None) -> Column:
    """Flink BTRIM — trim both ends (BFD 'BTRIM')."""
    return F.btrim(_col(s), F.lit(trim_str)) if trim_str is not None else F.btrim(_col(s))


def elt_(idx, *cols) -> Column:
    """Flink ELT(i, e1, e2, ...) — 1-based select (BFD 'ELT')."""
    return F.elt(_col(idx), *[_col(c) for c in cols])


def json_value(js, path) -> Column:
    """SQL/JSON JSON_VALUE (BFD 'JSON_VALUE') — scalar extraction; Spark's
    get_json_object covers the $.a.b[0] path subset the tests use."""
    return F.get_json_object(_col(js), path)


def json_exists(js, path) -> Column:
    """SQL/JSON JSON_EXISTS (BFD) — true iff the path hits a value."""
    return F.get_json_object(_col(js), path).isNotNull()


def json_quote(s) -> Column:
    """Flink JSON_QUOTE (BFD) — wrap a string as a JSON string literal
    (escapes backslash and double-quote; control chars out of scope)."""
    c = _col(s)
    escaped = F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"')
    return F.concat(F.lit('"'), escaped, F.lit('"'))


def json_unquote(s) -> Column:
    """Flink JSON_UNQUOTE — strip quotes/unescape if valid JSON string."""
    return F.get_json_object(_col(s), "$")


def is_json(s) -> Column:
    """Flink IS_JSON — validity check via try-parse (NULL == invalid)."""
    return F.try_parse_json(_col(s)).isNotNull()


def url_encode(s) -> Column:
    return F.url_encode(_col(s))


def url_decode(s) -> Column:
    return F.url_decode(_col(s))


def try_cast(c, dtype: str) -> Column:
    return _col(c).try_cast(dtype)
