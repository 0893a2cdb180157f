"""Elasticsearch-style source — emulated server, real pushdown shape.

Reference: dremio-oss `plugins/elasticsearch` — `ElasticsearchScanPrel`
scans an index, and planner rules push work into the server:
`ElasticFilterRule` renders predicates as query-DSL JSON (bool / term /
range / wildcard / match), projections become `_source` includes, and
the `CONTAINS()` SQL function ships a Lucene query string verbatim
(`exec/planner/sql/handlers/query/ContainsFunctionHandler` hands it to
elastic's `query_string` query).

No Elasticsearch server exists in this environment, so the "server" is
a pure-Python evaluator over JSON documents with a per-field inverted
index for full-text match; what is REAL and tested is the plugin's
responsibility:

- the query-DSL dialect rendered engine-side and recorded on
  `last_dsl` so tests assert exactly what was pushed;
- Lucene query-string parsing for CONTAINS (field:term, AND/OR/NOT,
  quoted phrases, field:[a TO b] ranges) → query DSL, mirroring what
  elastic's query_string query does;
- analysis (lowercase tokenization) applied consistently at index and
  query time, as elastic's standard analyzer does;
- results entering Spark through Arrow `createDataFrame`.

Scale contract: identical to `external.py` / `mongo.py` — pushdown
keeps transferred results dimension-sized; corpus-scale text search
belongs in the engine's own operators (`operators/text.py`).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def tokenize(text: Any) -> list[str]:
    """Standard-analyzer stand-in: lowercase, split on non-alphanumerics."""
    if text is None:
        return []
    return [t for t in re.split(r"[^a-z0-9]+", str(text).lower()) if t]


class ElasticSource:
    """A named search source holding document indexes."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        self._indexes: dict[str, list[dict]] = {}
        self.last_dsl: dict | None = None

    def index_docs(self, index: str, docs: list[dict]) -> None:
        self._indexes.setdefault(index, []).extend(docs)

    # -- query DSL evaluation (server side) ------------------------------
    def _matches(self, doc: dict, clause: dict) -> bool:
        (kind, arg), = clause.items()
        if kind == "bool":
            for q in arg.get("must", []):
                if not self._matches(doc, q):
                    return False
            for q in arg.get("filter", []):
                if not self._matches(doc, q):
                    return False
            for q in arg.get("must_not", []):
                if self._matches(doc, q):
                    return False
            should = arg.get("should", [])
            if should and not any(self._matches(doc, q) for q in should):
                return False
            return True
        if kind == "term":
            (field, val), = arg.items()
            if isinstance(val, dict):
                val = val["value"]
            return doc.get(field) == val
        if kind == "terms":
            (field, vals), = arg.items()
            return doc.get(field) in vals
        if kind == "range":
            (field, conds), = arg.items()
            v = doc.get(field)
            if v is None:
                return False
            return all(
                (op == "gt" and v > bound) or (op == "gte" and v >= bound)
                or (op == "lt" and v < bound) or (op == "lte" and v <= bound)
                for op, bound in conds.items()
            )
        if kind == "match":
            (field, text), = arg.items()
            if isinstance(text, dict):
                text = text["query"]
            terms = tokenize(text)
            toks = set(tokenize(doc.get(field)))
            return all(t in toks for t in terms)
        if kind == "match_phrase":
            (field, text), = arg.items()
            want = tokenize(text)
            toks = tokenize(doc.get(field))
            n = len(want)
            return any(toks[i:i + n] == want
                       for i in range(len(toks) - n + 1))
        if kind == "wildcard":
            (field, pat), = arg.items()
            if isinstance(pat, dict):
                pat = pat["value"]
            rx = "^" + re.escape(pat).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            return re.match(rx, str(doc.get(field, "")).lower()) is not None
        if kind == "exists":
            return doc.get(arg["field"]) is not None
        if kind == "match_all":
            return True
        raise ValueError(f"unsupported query DSL clause {kind!r}")

    # -- engine-facing API -----------------------------------------------
    def search(self, index: str, query: dict | None = None,
               source: list[str] | None = None,
               sort: list[tuple[str, str]] | None = None,
               size: int | None = None) -> DataFrame:
        """Filter + projection pushdown (ElasticFilterRule): the DSL and
        `_source` includes run on the server; Spark scans the result."""
        query = query or {"match_all": {}}
        self.last_dsl = {"index": index, "query": query,
                         "_source": source, "sort": sort, "size": size}
        hits = [d for d in self._indexes.get(index, [])
                if self._matches(d, query)]
        if sort:
            # elasticsearch's default is missing: "_last" for BOTH
            # directions — the old tuple key put nulls first descending
            for field, direction in reversed(sort):
                nulls = [d for d in hits if d.get(field) is None]
                nn = [d for d in hits if d.get(field) is not None]
                nn.sort(key=lambda d, f=field: d.get(f),
                        reverse=direction == "desc")
                hits = nn + nulls
        if size is not None:
            hits = hits[:size]
        if source:
            hits = [{k: d.get(k) for k in source} for d in hits]
        if not hits:
            raise ValueError("empty elastic result (schema unknown)")
        import pandas as pd

        cols: list[str] = []
        for d in hits:
            for k in d:
                if k not in cols:
                    cols.append(k)
        return self.spark.createDataFrame(pd.DataFrame(
            [{c: d.get(c) for c in cols} for d in hits], columns=cols
        ))

    def contains(self, index: str, lucene: str,
                 source: list[str] | None = None) -> DataFrame:
        """CONTAINS(<lucene query>) — Dremio ships the string to elastic's
        query_string query; here it is parsed to query DSL (recorded on
        last_dsl like any pushed filter) and evaluated server-side."""
        return self.search(index, parse_lucene(lucene), source=source)


# -- Lucene query-string syntax -> query DSL ----------------------------
_TOKEN_RX = re.compile(
    r"\s*(\(|\)|AND\b|OR\b|NOT\b|"
    r'[\w.]+:\[[^\]]+\]|[\w.]+:"[^"]*"|[\w.]+:[^\s()]+|"[^"]*"|[^\s()]+)'
)


def _lucene_tokens(q: str) -> list[str]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if not m:
            if q[pos:].strip():
                raise ValueError(f"bad lucene query at {q[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _clause_for(tok: str) -> dict:
    """One term token -> a DSL clause."""
    field, sep, val = tok.partition(":")
    if not sep:
        field, val = "_all", tok
    rng = re.fullmatch(r"\[\s*(\S+)\s+TO\s+(\S+)\s*\]", val)
    if rng:
        lo, hi = rng.groups()
        conds: dict[str, Any] = {}
        if lo != "*":
            conds["gte"] = float(lo) if re.fullmatch(r"-?\d+(\.\d+)?", lo) else lo
        if hi != "*":
            conds["lte"] = float(hi) if re.fullmatch(r"-?\d+(\.\d+)?", hi) else hi
        return {"range": {field: conds}}
    if val.startswith('"') and val.endswith('"'):
        return {"match_phrase": {field: val[1:-1]}}
    if "*" in val or "?" in val:
        return {"wildcard": {field: val.lower()}}
    return {"match": {field: val}}


def parse_lucene(q: str) -> dict:
    """Recursive-descent parse of the CONTAINS subset of Lucene syntax:
    field:term, field:"a phrase", field:[lo TO hi], wildcards, AND / OR /
    NOT, parentheses.  OR binds looser than AND; NOT is prefix."""
    tokens = _lucene_tokens(q)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def take() -> str:
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"unexpected end of lucene query {q!r}")
        pos += 1
        return tokens[pos - 1]

    def parse_or() -> dict:
        # bare adjacent terms are IMPLICIT OR — query_string's default
        # operator (treating adjacency as AND silently dropped matches
        # relative to the elasticsearch behavior being mirrored)
        parts = [parse_and()]
        while peek() is not None and peek() != ")":
            if peek() == "OR":
                take()
            parts.append(parse_and())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts}}

    def parse_and() -> dict:
        parts = [parse_not()]
        while peek() == "AND":
            take()
            parts.append(parse_not())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    def parse_not() -> dict:
        if peek() == "NOT":
            take()
            return {"bool": {"must_not": [parse_not()]}}
        return parse_atom()

    def parse_atom() -> dict:
        if peek() == "(":
            take()
            inner = parse_or()
            if take() != ")":
                raise ValueError("unbalanced parens in lucene query")
            return inner
        return _clause_for(take())

    out = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing lucene tokens: {tokens[pos:]}")
    return out
