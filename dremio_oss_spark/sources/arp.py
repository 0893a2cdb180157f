"""ARP-style pushdown dialects: declarative per-source SQL rendering.

Reference: dremio-oss `common/dialect/arp/` — each relational source
ships a YAML descriptor declaring WHICH operations push down
(projections, filters, aggregates, sort/limit, per-function support)
and HOW each renders in that engine's SQL; the planner keeps
unsupported subtrees in Dremio and ships the supported prefix through
`common/rel2sql/DremioRelToSqlConverter.java`.

Spark-first mapping: the dialect is a small Python object consulted by
`ExternalSource.read()`.  A fully-supported subtree renders to one
remote SQL; an unsupported aggregate degrades the pushdown to
project+filter (the remote does the cheap row reduction, Spark does the
aggregation) — exactly the ARP split, with the decision recorded so
tests and EXPLAIN tooling can assert what shipped.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ArpDialect:
    """One source dialect: identifier quoting, limit syntax, and the
    aggregate functions the source supports (the YAML's operation
    list)."""

    name: str = "generic"
    # empty quotes = bare lowercase identifiers (duckdb/postgres default)
    quote_open: str = ""
    quote_close: str = ""
    # LIMIT rendering: "limit" (postgres/duckdb) or "top" (t-sql)
    limit_style: str = "limit"
    supported_aggs: frozenset[str] = frozenset(
        {"sum", "count", "min", "max", "avg"})
    # function-name translation (rel2sql operator map)
    function_map: dict[str, str] = field(default_factory=dict)

    def ident(self, name: str) -> str:
        return f"{self.quote_open}{name}{self.quote_close}"

    def agg_supported(self, measures: dict[str, str]) -> bool:
        """Every aggregate function appearing in the measures must be in
        the dialect's supported set (ARP: unsupported op => subtree
        stays local).  Scalar wrappers (cast etc.) don't disqualify."""
        import re

        for expr in measures.values():
            fns = {m.lower()
                   for m in re.findall(r"\b([A-Za-z_]\w*)\s*\(", expr)}
            aggs = fns & _KNOWN_AGGS
            if not aggs or not aggs <= self.supported_aggs:
                return False
        return True

    def _fn(self, expr: str) -> str:
        import re

        return re.sub(
            r"\b([A-Za-z_]\w*)\s*\(",
            lambda m: self.function_map.get(
                m.group(1).lower(), m.group(1)) + "(",
            expr)

    def render(self, table: str, columns: list[str] | None,
               predicate: str | None,
               aggregate: tuple[list[str], dict[str, str]] | None,
               limit: int | None = None) -> str:
        """rel2sql for the supported subtree."""
        if aggregate is not None:
            keys, measures = aggregate
            sel = [self.ident(k) for k in keys] + [
                f"{self._fn(expr)} as {self.ident(alias)}"
                for alias, expr in measures.items()]
        elif columns:
            sel = [self.ident(c) for c in columns]
        else:
            sel = ["*"]
        top = (f"top {limit} " if limit is not None
               and self.limit_style == "top" else "")
        sql = f"select {top}{', '.join(sel)} from {self.ident(table)}"
        if predicate:
            sql += f" where {predicate}"
        if aggregate is not None and aggregate[0]:
            sql += " group by " + ", ".join(
                self.ident(k) for k in aggregate[0])
        if limit is not None and self.limit_style == "limit":
            sql += f" limit {limit}"
        elif limit is not None and self.limit_style == "fetch":
            sql += f" fetch first {limit} rows only"
        return sql


# aggregate functions the pushdown splitter recognizes
_KNOWN_AGGS = frozenset({"sum", "count", "min", "max", "avg", "stddev",
                         "stddev_samp", "var_samp", "median",
                         "approx_percentile"})


DUCKDB_DIALECT = ArpDialect(
    name="duckdb",
    supported_aggs=frozenset(
        {"sum", "count", "min", "max", "avg", "stddev", "median"}),
)

# a T-SQL-flavored descriptor: bracket quoting, TOP n, no MEDIAN —
# exercises the unsupported-aggregate fallback path
TSQL_DIALECT = ArpDialect(
    name="tsql",
    quote_open="[", quote_close="]",
    limit_style="top",
    supported_aggs=frozenset({"sum", "count", "min", "max", "avg"}),
    function_map={"stddev": "stdev"},
)

# Oracle-flavored descriptor: double-quote idents, ANSI FETCH FIRST
# rows syntax, coalesce/substring rendered through NVL/SUBSTR (the kind
# of operation mapping the reference's ARP YAMLs declare per source)
ORACLE_DIALECT = ArpDialect(
    name="oracle",
    quote_open='"', quote_close='"',
    limit_style="fetch",
    supported_aggs=frozenset(
        {"sum", "count", "min", "max", "avg", "stddev", "median"}),
    function_map={"coalesce": "nvl", "substring": "substr"},
)

# MySQL-flavored descriptor: backtick idents, STD for stddev, no MEDIAN
# (exercises the degrade path for median rollups)
MYSQL_DIALECT = ArpDialect(
    name="mysql",
    quote_open="`", quote_close="`",
    supported_aggs=frozenset({"sum", "count", "min", "max", "avg",
                              "stddev"}),
    function_map={"stddev": "std"},
)

# PostgreSQL descriptor — the most common RDBMS federation target.
# Double-quoted (case-preserving) identifiers, LIMIT n, sample-variance
# family spelled *_samp; MEDIAN does not exist as a plain aggregate
# (PostgreSQL only offers percentile_cont WITHIN GROUP), so median
# rollups degrade to the scan+local-aggregate split.  Declarative shape
# mirrors the reference's per-source ARP YAML consumed by
# common/dialect/arp/ + DremioRelToSqlConverter.java.
POSTGRES_DIALECT = ArpDialect(
    name="postgres",
    quote_open='"', quote_close='"',
    supported_aggs=frozenset({"sum", "count", "min", "max", "avg",
                              "stddev", "stddev_samp", "var_samp"}),
    function_map={"stddev": "stddev_samp"},
)

# Redshift descriptor: Postgres-derived SQL surface, but MEDIAN exists
# as a native aggregate, so median rollups ship whole.
REDSHIFT_DIALECT = ArpDialect(
    name="redshift",
    quote_open='"', quote_close='"',
    supported_aggs=frozenset({"sum", "count", "min", "max", "avg",
                              "stddev", "stddev_samp", "var_samp",
                              "median"}),
    function_map={"stddev": "stddev_samp"},
)


def dialect_from_arp_yaml(text: str) -> ArpDialect:
    """Load a dialect from a declarative ARP descriptor (YAML).

    This consumes the reference framework's per-plugin descriptor shape
    (`common/dialect/arp/` reads one YAML per source; the public ARP
    connector format documents the structure):

        metadata:
          name: POSTGRES          # -> dialect name (lowercased)
        syntax:
          identifier_quote: '"'   # both sides; '[' means [ ] (T-SQL)
          limit_style: limit      # engine extension: limit|top|fetch
        expressions:
          aggregation:
            functions:
              - names: [sum, count, min, max, avg]
              - names: [stddev]
                rewrite: 'STDDEV_SAMP({0})'   # rename-only templates
          operators:
            - names: [coalesce]
              rewrite: 'NVL({0}, {1})'

    Supported subset, honestly scoped: per-function support lists and
    RENAME-ONLY rewrite templates (`NAME({0}, ...)` with the arguments
    in order).  A rewrite that reorders, drops, or wraps arguments is
    beyond this renderer's function_map and raises — unsupported
    declarations must fail loudly rather than render wrong SQL."""
    import re as _re

    import yaml

    doc = yaml.safe_load(text) or {}
    meta = doc.get("metadata") or {}
    syntax = doc.get("syntax") or {}
    exprs = doc.get("expressions") or {}

    q = syntax.get("identifier_quote", "")
    pairs = {"[": "]", "(": ")", "{": "}"}
    quote_open, quote_close = q, pairs.get(q, q)

    def _rename_of(entry: dict, names: list[str]) -> dict[str, str]:
        rw = entry.get("rewrite")
        if not rw:
            return {}
        m = _re.fullmatch(
            r"\s*([A-Za-z_]\w*)\s*\(\s*\{\d+\}"
            r"(?:\s*,\s*\{\d+\})*\s*\)\s*", rw)
        if not m:
            raise ValueError(
                f"unsupported ARP rewrite template {rw!r}: only "
                "rename-style NAME({0}, {1}, ...) templates render here")
        args = _re.findall(r"\{(\d+)\}", rw)
        if args != [str(i) for i in range(len(args))]:
            raise ValueError(
                f"unsupported ARP rewrite template {rw!r}: argument "
                "reordering is not expressible as a function rename")
        return {n.lower(): m.group(1).lower() for n in names}

    supported: set[str] = set()
    fmap: dict[str, str] = {}
    for entry in ((exprs.get("aggregation") or {}).get("functions")
                  or []):
        names = [n.lower() for n in (entry.get("names") or [])]
        supported.update(names)
        fmap.update(_rename_of(entry, names))
    for entry in (exprs.get("operators") or []):
        names = [n.lower() for n in (entry.get("names") or [])]
        fmap.update(_rename_of(entry, names))

    return ArpDialect(
        name=str(meta.get("name", "generic")).lower(),
        quote_open=quote_open, quote_close=quote_close,
        limit_style=syntax.get("limit_style", "limit"),
        supported_aggs=frozenset(supported) or ArpDialect.supported_aggs,
        function_map=fmap,
    )
