"""Multi-catalog support — in-memory secondary catalogs.

Reference parity: ``GenericInMemoryCatalog`` (flink-table/
flink-table-api-java/.../catalog/GenericInMemoryCatalog.java, factory
``GenericInMemoryCatalogFactory.java`` — option ``default-database``) and
the catalog DDL statement family (flink-sql-parser ``SqlCreateCatalog`` /
``SqlDropCatalog`` / ``SqlAlterCatalog{Options,Reset,Comment}`` /
``SqlUseCatalog`` / ``SqlDescribeCatalog``; databases via
``SqlCreateDatabase`` / ``SqlDropDatabase`` / ``SqlAlterDatabase`` /
``SqlDescribeDatabase``).

Execution model. Spark has exactly one session catalog, so secondary
catalogs are an ENGINE-LEVEL namespace: a registry maps
``catalog.database.table`` onto a mangled temp-view name
(``__cat_<catalog>__<db>__<table>``), and the facade rewrites identifiers
before Catalyst sees the statement:

  - fully-qualified ``cat.db.tbl`` references resolve from any catalog
    context (this is what makes CROSS-catalog joins work);
  - unqualified names resolve against the CURRENT (catalog, database)
    when a secondary catalog is current;
  - the built-in catalog keeps Spark's name (``spark_catalog``) and
    behavior; ``default_catalog.default_database.x`` (the reference's
    built-in naming) is also accepted and maps to the plain name.

The rewrite is literal-safe (never inside ``'...'``) and bounded: only
names actually registered in the catalog registry are touched, so
ordinary statements pay one dict lookup and pass through byte-identical.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

__all__ = [
    "try_handle_catalog_ddl",
    "rewrite_catalog_identifiers",
    "current_catalog",
    "CatalogError",
]


class CatalogError(ValueError):
    pass


#: secondary catalogs: name -> {"comment", "properties", "dbs":
#: {db: {"comment", "properties"}}, "current_db"}
_CATALOGS: dict[str, dict] = {}

#: (catalog, db, table) -> mangled temp-view name
_CAT_TABLES: dict[tuple[str, str, str], str] = {}

#: current catalog: None = the built-in Spark session catalog
_CURRENT: list[str | None] = [None]

_BUILTIN = "spark_catalog"
#: the reference's built-in names, accepted as aliases of the Spark ones
_REF_BUILTIN = "default_catalog"
_REF_BUILTIN_DB = "default_database"


def current_catalog(spark: SparkSession) -> str:
    return _CURRENT[0] or spark.catalog.currentCatalog()


def _mangle(cat: str, db: str, tbl: str) -> str:
    return f"__cat_{cat}__{db}__{tbl}"


def _get_cat(name: str) -> dict:
    if name not in _CATALOGS:
        raise CatalogError(
            f"catalog {name!r} does not exist (SHOW CATALOGS lists "
            "registered ones)"
        )
    return _CATALOGS[name]


def _is_hive(name: str | None) -> bool:
    return name in _CATALOGS and _CATALOGS[name].get("type") == "hive"


def _any_hive() -> bool:
    return any(c.get("type") == "hive" for c in _CATALOGS.values())


def _sync_hive_dbs(spark: SparkSession, c: dict) -> None:
    """A hive-typed catalog's database list is the METASTORE's — refresh
    the local view so the shared db routes (SHOW/USE/DESCRIBE DATABASE)
    see current truth."""
    old = c["dbs"]
    c["dbs"] = {
        d.name: old.get(d.name, {"comment": d.description or None,
                                 "properties": {}})
        for d in spark.catalog.listDatabases()
    }


def reset_for_tests() -> None:
    _CATALOGS.clear()
    _CAT_TABLES.clear()
    _PENDING.clear()
    _CURRENT[0] = None


# ---------------------------------------------------------------- grammar

_CREATE_CATALOG_RE = re.compile(
    r"^\s*CREATE\s+CATALOG\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?`?(?P<name>\w+)`?"
    r"(?:\s+COMMENT\s+'(?P<comment>[^']*)')?"
    r"\s+WITH\s*\((?P<opts>.*)\)\s*$",
    re.I | re.S,
)
_DROP_CATALOG_RE = re.compile(
    r"^\s*DROP\s+CATALOG\s+(?P<ie>IF\s+EXISTS\s+)?`?(?P<name>\w+)`?\s*$",
    re.I,
)
_ALTER_CAT_SET_RE = re.compile(
    r"^\s*ALTER\s+CATALOG\s+`?(?P<name>\w+)`?\s+SET\s*\((?P<opts>.*)\)\s*$",
    re.I | re.S,
)
_ALTER_CAT_RESET_RE = re.compile(
    r"^\s*ALTER\s+CATALOG\s+`?(?P<name>\w+)`?\s+RESET\s*\((?P<keys>.*)\)\s*$",
    re.I | re.S,
)
_ALTER_CAT_COMMENT_RE = re.compile(
    r"^\s*ALTER\s+CATALOG\s+`?(?P<name>\w+)`?\s+COMMENT\s+"
    r"'(?P<comment>[^']*)'\s*$",
    re.I,
)
_DESC_CATALOG_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+CATALOG\s+(?P<ext>EXTENDED\s+)?`?(?P<name>\w+)`?\s*$",
    re.I,
)
_USE_CATALOG_RE = re.compile(
    r"^\s*USE\s+CATALOG\s+`?(?P<name>\w+)`?\s*$", re.I
)
_SHOW_CATALOGS_RE = re.compile(
    r"^\s*SHOW\s+CATALOGS"
    r"(?:\s+(?P<not>NOT\s+)?(?P<op>LIKE|ILIKE)\s+'(?P<like>[^']*)')?\s*$",
    re.I,
)
_SHOW_CREATE_CATALOG_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+CATALOG\s+`?(?P<name>\w+)`?\s*$", re.I
)
_SHOW_CUR_CAT_RE = re.compile(r"^\s*SHOW\s+CURRENT\s+CATALOG\s*$", re.I)

_CREATE_DB_RE = re.compile(
    r"^\s*CREATE\s+DATABASE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?:`?(?P<cat>\w+)`?\.)?`?(?P<name>\w+)`?"
    r"(?:\s+COMMENT\s+'(?P<comment>[^']*)')?"
    r"(?:\s+WITH\s*\((?P<opts>.*)\))?\s*$",
    re.I | re.S,
)
_DROP_DB_RE = re.compile(
    r"^\s*DROP\s+DATABASE\s+(?P<ie>IF\s+EXISTS\s+)?"
    r"(?:`?(?P<cat>\w+)`?\.)?`?(?P<name>\w+)`?"
    r"\s*(?P<mode>RESTRICT|CASCADE)?\s*$",
    re.I,
)
_ALTER_DB_RE = re.compile(
    r"^\s*ALTER\s+DATABASE\s+(?:`?(?P<cat>\w+)`?\.)?`?(?P<name>\w+)`?"
    r"\s+SET\s*\((?P<opts>.*)\)\s*$",
    re.I | re.S,
)
_DESC_DB_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+DATABASE\s+(?P<ext>EXTENDED\s+)?"
    r"(?:`?(?P<cat>\w+)`?\.)?`?(?P<name>\w+)`?\s*$",
    re.I,
)
_USE_DB_RE = re.compile(r"^\s*USE\s+`?(?P<name>\w+)`?\s*$", re.I)
_SHOW_DBS_RE = re.compile(
    r"^\s*SHOW\s+DATABASES"
    r"(?:\s+(?:FROM|IN)\s+`?(?P<cat>\w+)`?)?"
    r"(?:\s+(?P<not>NOT\s+)?(?P<op>LIKE|ILIKE)\s+'(?P<like>[^']*)')?\s*$",
    re.I,
)
_SHOW_CUR_DB_RE = re.compile(r"^\s*SHOW\s+CURRENT\s+DATABASE\s*$", re.I)
_SHOW_TABLES_RE = re.compile(
    r"^\s*SHOW\s+TABLES"
    r"(?:\s+(?:FROM|IN)\s+(?:`?(?P<cat>\w+)`?\.)?`?(?P<db>\w+)`?)?"
    r"(?:\s+(?P<not>NOT\s+)?(?P<op>LIKE|ILIKE)\s+'(?P<like>[^']*)')?\s*$",
    re.I,
)
_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?"
    r"(?:`?(?P<cat>\w+)`?\.`?(?P<db>\w+)`?\.)?`?(?P<name>\w+)`?\s*$",
    re.I,
)

#: CREATE TABLE with a qualified or to-be-qualified name — the name is
#: REWRITTEN to the mangled view and the table recorded in the registry;
#: the body is left for ddl.execute_flink_ddl
_CREATE_TABLE_NAME_RE = re.compile(
    r"^(?P<head>\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?|REPLACE\s+)"
    r"(?:TEMPORARY\s+)?TABLE\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?)"
    r"(?:`?(?P<cat>\w+)`?\.`?(?P<db>\w+)`?\.)?`?(?P<name>\w+)`?"
    r"(?P<rest>(?:\s*\(|\s+(?:WITH|DISTRIBUTED|PARTITIONED)\b).*)$",
    re.I | re.S,
)


def _split_options(opts: str) -> dict[str, str]:
    out = {}
    for m in re.finditer(r"'([^']*)'\s*=\s*'([^']*)'", opts):
        out[m.group(1).lower()] = m.group(2)
    return out


def _like(name: str, m: re.Match) -> bool:
    """Flink SHOW ... [NOT] (LIKE|ILIKE) — delegates to the one shared
    SQL-LIKE translation (catalog_sql._sql_like); ILIKE folds case."""
    pattern = m.groupdict().get("like")
    if pattern is None:
        return True
    from apache_flink_spark.catalog_sql import _sql_like

    if (m.group("op") or "").upper() == "ILIKE":
        return _sql_like(name.lower(), pattern.lower(), bool(m.group("not")))
    return _sql_like(name, pattern, bool(m.group("not")))


def _ok(spark: SparkSession):
    return spark.createDataFrame([("OK",)], "result string")


def _info(spark: SparkSession, rows: list[tuple[str, str | None]]):
    return spark.createDataFrame(
        rows, "`info name` string, `info value` string"
    )


# -------------------------------------------------------------- resolve


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    spans, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, j))
            i = j + 1
        else:
            i += 1
    return spans


def _in_literal(spans, pos: int) -> bool:
    return any(a <= pos <= b for a, b in spans)


def _closes_derived_table(sql: str, close_idx: int, spans) -> bool:
    """True when the ``)`` at ``close_idx`` closes a DERIVED TABLE —
    i.e. its matching open paren wraps a query (SELECT/VALUES/WITH/
    TABLE). A function call's close (``SUM(x)``, ``CAST(c AS INT)``)
    wraps an expression, so ``) AS name`` after it is a COLUMN alias
    that must not shadow catalog table names (r9 advice)."""
    depth = 0
    i = close_idx
    while i >= 0:
        if _in_literal(spans, i):
            i -= 1
            continue
        ch = sql[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            depth -= 1
            if depth == 0:
                j = i + 1
                while j < len(sql) and sql[j].isspace():
                    j += 1
                return bool(re.match(
                    r"(?i)(?:SELECT|VALUES|WITH|TABLE)\b", sql[j:j + 7]
                ))
        i -= 1
    return False


#: registry keys added by a CREATE rewrite whose DDL has not yet been
#: verified to have materialized the view — checked (and cleared) on the
#: next statement, so a FAILED create cannot leave a phantom table
_PENDING: list[tuple[str, str, str]] = []


def _gc_phantom_entries(spark: SparkSession) -> None:
    """Drop registry entries whose backing view never materialized — a
    CREATE TABLE registers its mapping before the DDL executes (the text
    rewrite has no execution context), so a FAILED create would otherwise
    leave a phantom table in SHOW TABLES and the rewrite (r7 review).
    Only entries still PENDING verification are checked — one catalog
    lookup per recent CREATE, not per registered table."""
    while _PENDING:
        key = _PENDING.pop()
        view = _CAT_TABLES.get(key)
        if view is not None and not spark.catalog.tableExists(view):
            del _CAT_TABLES[key]


def rewrite_catalog_identifiers(spark: SparkSession, sql: str) -> str:
    """Rewrite catalog-qualified (and, when a secondary catalog is
    current, unqualified) table references onto the mangled temp views.
    A pass-through when no secondary catalog exists."""
    if _PENDING:
        _gc_phantom_entries(spark)
    # CREATE TABLE targeting a secondary catalog: register + rename first
    # so the DDL route sees the mangled name.
    cm = _CREATE_TABLE_NAME_RE.match(sql)
    if cm and "." not in (cm.group("name") or ""):
        cat, db = cm.group("cat"), cm.group("db")
        if cat is None and _CURRENT[0] is not None:
            cat = _CURRENT[0]
            db = _CATALOGS[cat]["current_db"]
        if cat is not None and _is_hive(cat):
            # hive catalog: the table lands in the metastore natively —
            # qualify with the database, never mangle (with no explicit
            # catalog the session's current db already points there)
            if cm.group("cat") is not None:
                sql = (
                    cm.group("head")
                    + f"{db}.{cm.group('name')}"
                    + cm.group("rest")
                )
        elif cat is not None and cat in _CATALOGS:
            c = _CATALOGS[cat]
            if db not in c["dbs"]:
                raise CatalogError(
                    f"database {db!r} does not exist in catalog {cat!r}"
                )
            view = _mangle(cat, db, cm.group("name"))
            key = (cat, db, cm.group("name"))
            _CAT_TABLES[key] = view
            if key not in _PENDING:
                _PENDING.append(key)
            sql = cm.group("head") + view + cm.group("rest")
    if _REF_BUILTIN in sql:
        # the reference's built-in naming maps to plain Spark resolution
        spans = _literal_spans(sql)
        sql = re.sub(
            rf"\b{_REF_BUILTIN}\.{_REF_BUILTIN_DB}\.(\w+)\b",
            lambda m: m.group(0) if _in_literal(spans, m.start())
            else m.group(1),
            sql,
        )
    if not _CAT_TABLES and _CURRENT[0] is None and not _any_hive():
        return sql
    spans = _literal_spans(sql)

    def _sub_qualified(m: re.Match) -> str:
        if _in_literal(spans, m.start()):
            return m.group(0)
        key = (m.group(1), m.group(2), m.group(3))
        if _is_hive(key[0]):
            # hive catalog IS the session catalog under another name
            return f"{_BUILTIN}.{key[1]}.{key[2]}"
        return _CAT_TABLES.get(key, m.group(0))

    out = re.sub(
        r"\b(\w+)\.(\w+)\.(\w+)\b",
        _sub_qualified,
        sql,
    )
    if _CURRENT[0] is not None:
        cat = _CURRENT[0]
        db = _CATALOGS[cat]["current_db"]
        local = {
            t: v for (c, d, t), v in _CAT_TABLES.items()
            if c == cat and d == db
        }
        if local:
            spans = _literal_spans(out)
            # names bound INSIDE the statement shadow catalog tables: a
            # CTE (WITH name AS (...)) or an alias (... AS name) that
            # happens to share a registered table's name must not be
            # redirected to the catalog table (r7 advice)
            bound = {
                b.group(1)
                for b in re.finditer(
                    r"(?i)\bWITH\s+(\w+)\s+AS\s*\(", out
                )
                if not _in_literal(spans, b.start())
            }
            bound |= {
                b.group(1)
                for b in re.finditer(
                    r"(?i),\s*(\w+)\s+AS\s*\(", out
                )
                if not _in_literal(spans, b.start())
            }
            # derived-table aliases only: `) AS name` where the matching
            # OPEN paren wraps a query (SELECT/VALUES/WITH/TABLE). A bare
            # column alias (SELECT sum(x) AS orders) or a CAST(a AS INT)
            # target closes a FUNCTION call, can never shadow a TABLE
            # reference, and binding it suppressed legitimate
            # FROM-position rewrites (r8+r9 advice).
            bound |= {
                b.group(1)
                for b in re.finditer(r"(?i)\)\s*AS\s+(\w+)\b", out)
                if not _in_literal(spans, b.start(1))
                and _closes_derived_table(out, b.start(), spans)
            }
            local = {t: v for t, v in local.items() if t not in bound}

        if local:

            def _sub_plain(m: re.Match) -> str:
                # only TABLE POSITIONS (after FROM/JOIN/INTO/TABLE/UPDATE/
                # DELETE FROM/DESCRIBE): a column or alias that happens to
                # share a registered table's name must survive (r7 review)
                if _in_literal(spans, m.start(2)):
                    return m.group(0)
                e = m.end(2)
                if e < len(out) and out[e] == ".":
                    return m.group(0)  # already qualified
                repl = local.get(m.group(2))
                if repl is None:
                    return m.group(0)
                return m.group(1) + repl

            out = re.sub(
                r"(?i)\b((?:FROM|JOIN|INTO|OVERWRITE|TABLE|UPDATE|DESC"
                r"|DESCRIBE)\s+)`?(\w+)`?",
                _sub_plain,
                out,
            )
    return out


# ---------------------------------------------------------------- routes


def try_handle_catalog_ddl(spark: SparkSession, sql: str):
    """Route one catalog/database DDL statement; returns a DataFrame or
    None to fall through (built-in catalog behavior stays in
    catalog_sql.py / Spark)."""
    m = _CREATE_CATALOG_RE.match(sql)
    if m:
        name = m.group("name")
        if name in _CATALOGS or name in (_BUILTIN, _REF_BUILTIN):
            if m.group("ine"):
                return _ok(spark)
            raise CatalogError(f"catalog {name!r} already exists")
        opts = _split_options(m.group("opts"))
        ctype = opts.get("type", "")
        if ctype not in ("generic_in_memory", "hive"):
            raise CatalogError(
                f"unsupported catalog type {ctype!r} — "
                "'generic_in_memory' (reference GenericInMemoryCatalog) "
                "and 'hive' (reference flink-connector-hive HiveCatalog, "
                "r8) are available; other external metastore catalogs "
                "need their service"
            )
        if ctype == "hive":
            # HiveCatalog routes onto Spark's own Hive-metastore session
            # catalog (the in-box spark-hive integration — io.hive_session).
            # catalogImplementation is a STATIC conf, so the session must
            # have been created Hive-enabled.
            impl = spark.conf.get(
                "spark.sql.catalogImplementation", "in-memory"
            )
            if impl != "hive":
                raise CatalogError(
                    "CREATE CATALOG ... WITH ('type'='hive') requires a "
                    "Hive-enabled SparkSession (catalogImplementation is "
                    "a static conf) — build the session with "
                    "apache_flink_spark.io.hive_session(warehouse_dir)"
                )
            default_db = opts.get("default-database", "default")
            _CATALOGS[name] = {
                "type": "hive",
                "comment": m.group("comment"),
                "properties": {
                    k: v for k, v in opts.items() if k != "type"
                },
                "dbs": {},
                "current_db": default_db,
            }
            _sync_hive_dbs(spark, _CATALOGS[name])
            if default_db not in _CATALOGS[name]["dbs"]:
                del _CATALOGS[name]
                raise CatalogError(
                    f"hive catalog default-database {default_db!r} does "
                    "not exist in the metastore"
                )
            return _ok(spark)
        default_db = opts.get("default-database", "default")
        _CATALOGS[name] = {
            "type": "generic_in_memory",
            "comment": m.group("comment"),
            "properties": {
                k: v for k, v in opts.items() if k != "type"
            },
            "dbs": {default_db: {"comment": None, "properties": {}}},
            "current_db": default_db,
        }
        return _ok(spark)

    m = _DROP_CATALOG_RE.match(sql)
    if m:
        name = m.group("name")
        if name in (_BUILTIN, _REF_BUILTIN):
            raise CatalogError(f"cannot drop the built-in catalog {name!r}")
        if name not in _CATALOGS:
            if m.group("ie"):
                return _ok(spark)
            raise CatalogError(f"catalog {name!r} does not exist")
        if _CURRENT[0] == name:
            raise CatalogError(
                f"cannot drop the current catalog {name!r} — USE CATALOG "
                "another one first (reference CatalogManager.unregisterCatalog)"
            )
        for key in [k for k in _CAT_TABLES if k[0] == name]:
            spark.catalog.dropTempView(_CAT_TABLES.pop(key))
        del _CATALOGS[name]
        return _ok(spark)

    m = _ALTER_CAT_SET_RE.match(sql)
    if m:
        c = _get_cat(m.group("name"))
        opts = _split_options(m.group("opts"))
        if "type" in opts:
            raise CatalogError(
                "ALTER CATALOG cannot change 'type' (reference "
                "AlterCatalogOptionsOperation forbids it too)"
            )
        c["properties"].update(opts)
        return _ok(spark)

    m = _ALTER_CAT_RESET_RE.match(sql)
    if m:
        c = _get_cat(m.group("name"))
        keys = [
            k.strip().strip("'").lower()
            for k in m.group("keys").split(",")
            if k.strip()
        ]
        if "type" in keys:
            raise CatalogError("ALTER CATALOG RESET cannot remove 'type'")
        for k in keys:
            c["properties"].pop(k, None)
        return _ok(spark)

    m = _ALTER_CAT_COMMENT_RE.match(sql)
    if m:
        _get_cat(m.group("name"))["comment"] = m.group("comment")
        return _ok(spark)

    m = _DESC_CATALOG_RE.match(sql)
    if m:
        # DescribeCatalogOperation: info name/info value rows — name,
        # type, comment (+ sorted option:* when EXTENDED)
        name = m.group("name")
        if name in (_BUILTIN, _REF_BUILTIN):
            rows = [("name", name), ("type", "generic_in_memory"),
                    ("comment", None)]
            return _info(spark, rows)
        c = _get_cat(name)
        rows = [
            ("name", name),
            ("type", c.get("type", "generic_in_memory")),
            ("comment", c["comment"]),
        ]
        if m.group("ext"):
            rows += [
                (f"option:{k}", v)
                for k, v in sorted(c["properties"].items())
            ]
        return _info(spark, rows)

    m = _USE_CATALOG_RE.match(sql)
    if m:
        name = m.group("name")
        if name in (_BUILTIN, _REF_BUILTIN):
            _CURRENT[0] = None
            return _ok(spark)
        if name not in _CATALOGS:
            # a genuine Spark catalog plugin (spark.sql.catalog.<name>)
            # keeps its pre-facade behavior (r7 review): pass through and
            # let Spark raise for truly unknown names.
            spark.catalog.setCurrentCatalog(name)
            _CURRENT[0] = None
            return _ok(spark)
        _CURRENT[0] = name
        if _is_hive(name):
            # hive catalog IS the session catalog: unqualified names
            # resolve natively once the session database is switched
            _sync_hive_dbs(spark, _CATALOGS[name])
            spark.catalog.setCurrentDatabase(
                _CATALOGS[name]["current_db"]
            )
        return _ok(spark)

    m = _SHOW_CATALOGS_RE.match(sql)
    if m:
        rows = [r[0] for r in spark.sql("SHOW CATALOGS").collect()]
        rows += list(_CATALOGS)
        return spark.createDataFrame(
            [(v,) for v in sorted(rows) if _like(v, m)],
            "`catalog name` string",
        )

    m = _SHOW_CREATE_CATALOG_RE.match(sql)
    if m:
        # SqlShowCreateCatalog / ShowCreateUtil.buildShowCreateCatalogRow
        name = m.group("name")
        if name in (_BUILTIN, _REF_BUILTIN):
            ddl = f"CREATE CATALOG `{name}` WITH (\n  'type' = 'generic_in_memory'\n)"
            return spark.createDataFrame([(ddl,)], "result string")
        c = _get_cat(name)
        opts = {
            "type": c.get("type", "generic_in_memory"), **c["properties"]
        }
        comment = (
            f"\nCOMMENT '{c['comment']}'" if c["comment"] else ""
        )
        with_body = ",\n".join(
            f"  '{k}' = '{v}'" for k, v in sorted(opts.items())
        )
        ddl = f"CREATE CATALOG `{name}`{comment} WITH (\n{with_body}\n)"
        return spark.createDataFrame([(ddl,)], "result string")

    if _SHOW_CUR_CAT_RE.match(sql):
        return spark.createDataFrame(
            [(current_catalog(spark),)], "`current catalog name` string"
        )

    m = _CREATE_DB_RE.match(sql)
    if m:
        cat = m.group("cat") or _CURRENT[0]
        if cat is None or cat not in _CATALOGS:
            return None  # built-in catalog: Spark handles CREATE DATABASE
        if _is_hive(cat):
            # hive catalog: the metastore owns databases — delegate
            ine = "IF NOT EXISTS " if m.group("ine") else ""
            spark.sql(f"CREATE DATABASE {ine}{m.group('name')}")
            _sync_hive_dbs(spark, _CATALOGS[cat])
            return _ok(spark)
        dbs = _CATALOGS[cat]["dbs"]
        name = m.group("name")
        if name in dbs:
            if m.group("ine"):
                return _ok(spark)
            raise CatalogError(
                f"database {name!r} already exists in catalog {cat!r}"
            )
        dbs[name] = {
            "comment": m.group("comment"),
            "properties": _split_options(m.group("opts") or ""),
        }
        return _ok(spark)

    m = _DROP_DB_RE.match(sql)
    if m:
        cat = m.group("cat") or _CURRENT[0]
        if cat is None or cat not in _CATALOGS:
            return None
        if _is_hive(cat):
            ie = "IF EXISTS " if m.group("ie") else ""
            mode = (m.group("mode") or "").upper()
            spark.sql(
                f"DROP DATABASE {ie}{m.group('name')}"
                + (" CASCADE" if mode == "CASCADE" else "")
            )
            _sync_hive_dbs(spark, _CATALOGS[cat])
            return _ok(spark)
        c, name = _CATALOGS[cat], m.group("name")
        if name not in c["dbs"]:
            if m.group("ie"):
                return _ok(spark)
            raise CatalogError(
                f"database {name!r} does not exist in catalog {cat!r}"
            )
        tables = [k for k in _CAT_TABLES if k[0] == cat and k[1] == name]
        if tables and (m.group("mode") or "RESTRICT").upper() != "CASCADE":
            raise CatalogError(
                f"database {name!r} is not empty ({len(tables)} tables) — "
                "use DROP DATABASE ... CASCADE"
            )
        if c["current_db"] == name:
            raise CatalogError(
                f"cannot drop the current database {name!r}"
            )
        for key in tables:
            spark.catalog.dropTempView(_CAT_TABLES.pop(key))
        del c["dbs"][name]
        return _ok(spark)

    m = _ALTER_DB_RE.match(sql)
    if m:
        cat = m.group("cat") or _CURRENT[0]
        opts = _split_options(m.group("opts"))
        if cat is None or cat not in _CATALOGS:
            # SqlAlterDatabase on the built-in catalog: Spark's native
            # syntax is SET DBPROPERTIES
            if m.group("cat"):
                return None
            props = ", ".join(f"'{k}'='{v}'" for k, v in opts.items())
            spark.sql(
                f"ALTER DATABASE {m.group('name')} SET DBPROPERTIES ({props})"
            )
            return _ok(spark)
        c, name = _CATALOGS[cat], m.group("name")
        if name not in c["dbs"]:
            raise CatalogError(
                f"database {name!r} does not exist in catalog {cat!r}"
            )
        c["dbs"][name]["properties"].update(opts)
        return _ok(spark)

    m = _DESC_DB_RE.match(sql)
    if m:
        cat = m.group("cat") or _CURRENT[0]
        name = m.group("name")
        if cat is None or cat not in _CATALOGS:
            # built-in: project Spark's catalog metadata into the
            # reference's info name/info value shape
            try:
                db = spark.catalog.getDatabase(name)
            except Exception:
                raise CatalogError(f"database {name!r} does not exist")
            rows = [("name", db.name), ("comment", db.description or "")]
            if m.group("ext"):
                rows.append(("location", db.locationUri))
            return _info(spark, rows)
        c = _CATALOGS[cat]
        if name not in c["dbs"]:
            raise CatalogError(
                f"database {name!r} does not exist in catalog {cat!r}"
            )
        d = c["dbs"][name]
        rows = [("name", name), ("comment", d["comment"] or "")]
        if m.group("ext"):
            rows += [
                (f"option:{k}", v)
                for k, v in sorted(d["properties"].items())
            ]
        return _info(spark, rows)

    m = _SHOW_TABLES_RE.match(sql)
    if m and m.group("cat") and m.group("cat") in _CATALOGS:
        # catalog-qualified listing works from ANY current catalog
        # (SqlShowTables' [catalog.]database preposition)
        if _is_hive(m.group("cat")):
            _sync_hive_dbs(spark, _CATALOGS[m.group("cat")])
        if m.group("db") not in _CATALOGS[m.group("cat")]["dbs"]:
            raise CatalogError(
                f"database {m.group('db')!r} does not exist in catalog "
                f"{m.group('cat')!r}"
            )
        if _is_hive(m.group("cat")):
            names = sorted(
                tb.name
                for tb in spark.catalog.listTables(m.group("db"))
                if not tb.isTemporary and _like(tb.name, m)
            )
        else:
            names = sorted(
                t for (cc, dd, t) in _CAT_TABLES
                if cc == m.group("cat") and dd == m.group("db")
                and _like(t, m)
            )
        return spark.createDataFrame(
            [(t,) for t in names], "`table name` string"
        )

    m = _DROP_TABLE_RE.match(sql)
    if m:
        # the facade's identifier rewrite runs BEFORE routing, so a
        # qualified name arrives here already mangled — resolve either form
        key = None
        name = m.group("name")
        if _CURRENT[0] is not None and _is_hive(_CURRENT[0]) and not m.group("cat"):
            return None  # hive catalog: Spark-native drop in the set db
        if m.group("cat"):
            ddb = m.group("db")
            key = (m.group("cat"), ddb, name)
        elif name in set(_CAT_TABLES.values()):
            key = next(k for k, v in _CAT_TABLES.items() if v == name)
        elif _CURRENT[0] is not None:
            key = (_CURRENT[0], _CATALOGS[_CURRENT[0]]["current_db"], name)
        if key is None or key not in _CAT_TABLES:
            if key is not None and key[0] in _CATALOGS:
                if m.group("ie"):
                    return _ok(spark)
                # current-catalog semantics: an unqualified DROP while a
                # secondary catalog is current targets THAT catalog — it
                # must not fall through and drop the built-in catalog's
                # table of the same name (r7 review)
                raise CatalogError(
                    f"table {name!r} does not exist in catalog "
                    f"{key[0]!r} (database {key[1]!r})"
                )
            return None  # built-in context: Spark-native table
        spark.catalog.dropTempView(_CAT_TABLES.pop(key))
        return _ok(spark)

    m = _SHOW_DBS_RE.match(sql)
    if m:
        cat2 = m.group("cat") or _CURRENT[0]
        if cat2 is not None and cat2 not in (
            _BUILTIN, _REF_BUILTIN,
        ) and cat2 in _CATALOGS:
            if _is_hive(cat2):
                _sync_hive_dbs(spark, _CATALOGS[cat2])
            names = sorted(_CATALOGS[cat2]["dbs"])
        elif cat2 is None or cat2 in (_BUILTIN, _REF_BUILTIN):
            if m.group("like") is None and m.group("cat") is None:
                return None  # plain builtin listing: catalog_sql's route
            names = sorted(
                d.name for d in spark.catalog.listDatabases()
            )
        else:
            raise CatalogError(f"catalog {cat2!r} does not exist")
        return spark.createDataFrame(
            [(d,) for d in names if _like(d, m)],
            "`database name` string",
        )

    # the remaining routes only apply while a secondary catalog is current
    if _CURRENT[0] is None:
        return None
    cat = _CURRENT[0]
    c = _CATALOGS[cat]

    m = _USE_DB_RE.match(sql)
    if m and m.group("name").upper() != "CATALOG":
        name = m.group("name")
        if _is_hive(cat):
            _sync_hive_dbs(spark, c)
        if name not in c["dbs"]:
            raise CatalogError(
                f"database {name!r} does not exist in catalog {cat!r}"
            )
        c["current_db"] = name
        if _is_hive(cat):
            spark.catalog.setCurrentDatabase(name)
        return _ok(spark)


    if _SHOW_CUR_DB_RE.match(sql):
        return spark.createDataFrame(
            [(c["current_db"],)], "`current database name` string"
        )

    m = _SHOW_TABLES_RE.match(sql)
    if m:
        scat = m.group("cat") or cat
        if scat not in _CATALOGS:
            return None  # qualified toward the built-in: Spark/catalog_sql
        db = m.group("db") or _CATALOGS[scat]["current_db"]
        if _is_hive(scat):
            _sync_hive_dbs(spark, _CATALOGS[scat])
        if db not in _CATALOGS[scat]["dbs"]:
            raise CatalogError(
                f"database {db!r} does not exist in catalog {scat!r}"
            )
        if _is_hive(scat):
            names = sorted(
                tb.name for tb in spark.catalog.listTables(db)
                if not tb.isTemporary and _like(tb.name, m)
            )
        else:
            names = sorted(
                t for (cc, dd, t) in _CAT_TABLES
                if cc == scat and dd == db and _like(t, m)
            )
        return spark.createDataFrame(
            [(t,) for t in names], "`table name` string"
        )

    return None
