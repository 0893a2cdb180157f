"""MongoDB-style document source — emulated server, real pushdown shape.

Reference: dremio-oss `plugins/mongo` — `MongoScanPrel`/`MongoRecordReader`
read collections of BSON documents, and the planner pushes projections,
filters (`MongoFilterRule` → find() query documents) and simple
aggregations (`MongoAggregationPipeline` → aggregate() pipelines) into
the server so only reduced results cross the wire.

No Mongo server exists in this environment, so the "server" here is a
pure-Python evaluator over JSON-lines collections; what is REAL and
tested is everything Dremio's plugin is responsible for:

- the find()-document dialect ({"$gt": ..}, {"$in": ..}, "$and"/"$or",
  dotted paths, "$regex", "$exists") rendered from the engine side and
  recorded on `last_find` so tests assert exactly what was pushed;
- the aggregation-pipeline dialect ($match / $unwind / $project /
  $group / $sort / $limit) likewise recorded on `last_pipeline`;
- results entering Spark through Arrow `createDataFrame`.

Scale contract: like `external.py`, pushdown keeps the transferred
result dimension-sized (a group-by or filtered slice), never the raw
collection — the same reason the reference pushes these stages to the
server.  Collections too large for that contract belong in parquet, not
behind a document API.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _get_path(doc: dict, path: str) -> Any:
    """Resolve a dotted field path ("customer.address.city")."""
    cur: Any = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


_MISSING = object()


def _match_value(val: Any, cond: Any) -> bool:
    """Evaluate one field condition: scalar equality or operator doc."""
    if not isinstance(cond, dict):
        return val == cond
    for op, arg in cond.items():
        if op == "$eq":
            if val != arg:
                return False
        elif op == "$ne":
            if val == arg:
                return False
        elif op == "$gt":
            if val is None or not val > arg:
                return False
        elif op == "$gte":
            if val is None or not val >= arg:
                return False
        elif op == "$lt":
            if val is None or not val < arg:
                return False
        elif op == "$lte":
            if val is None or not val <= arg:
                return False
        elif op == "$in":
            if val not in arg:
                return False
        elif op == "$nin":
            if val in arg:
                return False
        elif op == "$regex":
            if val is None or not re.search(arg, str(val)):
                return False
        elif op == "$exists":
            if bool(arg) != (val is not None):
                return False
        else:
            raise ValueError(f"unsupported mongo operator {op!r}")
    return True


def match(doc: dict, query: dict) -> bool:
    """Evaluate a find() query document against one document."""
    for key, cond in query.items():
        if key == "$and":
            if not all(match(doc, q) for q in cond):
                return False
        elif key == "$or":
            if not any(match(doc, q) for q in cond):
                return False
        elif key == "$nor":
            if any(match(doc, q) for q in cond):
                return False
        else:
            if not _match_value(_get_path(doc, key), cond):
                return False
    return True


class MongoSource:
    """A named document source holding JSON-lines collections."""

    def __init__(self, spark: SparkSession, name: str,
                 collections: dict[str, list[dict]] | None = None):
        self.spark = spark
        self.name = name
        self._collections: dict[str, list[dict]] = dict(collections or {})
        self.last_find: dict | None = None
        self.last_pipeline: list[dict] | None = None

    def insert_many(self, collection: str, docs: list[dict]) -> None:
        self._collections.setdefault(collection, []).extend(docs)

    def load_jsonl(self, collection: str, path: str) -> None:
        with open(path) as f:
            self.insert_many(
                collection, [json.loads(ln) for ln in f if ln.strip()]
            )

    # -- server-side evaluation ------------------------------------------
    def _find(self, collection: str, query: dict,
              projection: list[str] | None) -> list[dict]:
        out = []
        for doc in self._collections.get(collection, []):
            if match(doc, query):
                if projection:
                    out.append({p.replace(".", "_"): _get_path(doc, p)
                                for p in projection})
                else:
                    out.append(doc)
        return out

    def _aggregate(self, collection: str, pipeline: list[dict]) -> list[dict]:
        docs = list(self._collections.get(collection, []))
        for stage in pipeline:
            (op, arg), = stage.items()
            if op == "$match":
                docs = [d for d in docs if match(d, arg)]
            elif op == "$unwind":
                path = arg.lstrip("$") if isinstance(arg, str) else arg["path"].lstrip("$")
                nxt = []
                for d in docs:
                    for item in _get_path(d, path) or []:
                        nd = dict(d)
                        # set along the NESTED path (deep-copied per
                        # level) — storing under the literal dotted key
                        # left _get_path reading the pre-unwind list
                        segs = path.split(".")
                        cur = nd
                        for sgm in segs[:-1]:
                            cur[sgm] = dict(cur.get(sgm) or {})
                            cur = cur[sgm]
                        cur[segs[-1]] = item
                        nxt.append(nd)
                docs = nxt
            elif op == "$project":
                if all(not v for v in arg.values()):
                    # EXCLUSION form ({'_id': 0, ...}): keep every other
                    # field — the inclusion comprehension returned {}
                    drop = set(arg)
                    docs = [{k: v for k, v in d.items() if k not in drop}
                            for d in docs]
                else:
                    docs = [
                        {k: (_get_path(d, v.lstrip("$"))
                             if isinstance(v, str) and v.startswith("$")
                             else _get_path(d, k))
                         for k, v in arg.items() if v}
                        for d in docs
                    ]
            elif op == "$group":
                groups: dict[Any, dict] = {}
                key_expr = arg["_id"]
                for d in docs:
                    if isinstance(key_expr, dict):
                        key = tuple(
                            _get_path(d, v.lstrip("$"))
                            for v in key_expr.values()
                        )
                        key_doc = dict(zip(key_expr.keys(), key))
                    elif key_expr is None:
                        key, key_doc = (), {}
                    else:
                        k = _get_path(d, key_expr.lstrip("$"))
                        key, key_doc = (k,), {"_id": k}
                    g = groups.setdefault(key, {"_doc": key_doc, "_rows": []})
                    g["_rows"].append(d)
                out = []
                for g in groups.values():
                    row = dict(g["_doc"])
                    for alias, spec in arg.items():
                        if alias == "_id":
                            continue
                        (aop, aarg), = spec.items()
                        if aop == "$sum" and aarg == 1:
                            row[alias] = len(g["_rows"])
                        else:
                            vals = [
                                _get_path(d, str(aarg).lstrip("$"))
                                for d in g["_rows"]
                            ]
                            vals = [v for v in vals if v is not None]
                            if aop == "$sum":
                                row[alias] = sum(vals)
                            elif aop == "$avg":
                                row[alias] = (sum(vals) / len(vals)
                                              if vals else None)
                            elif aop == "$min":
                                row[alias] = min(vals) if vals else None
                            elif aop == "$max":
                                row[alias] = max(vals) if vals else None
                            elif aop == "$count":
                                row[alias] = len(vals)
                            else:
                                raise ValueError(
                                    f"unsupported accumulator {aop!r}")
                    out.append(row)
                docs = out
            elif op == "$sort":
                # Mongo sorts null/missing LOWEST (first ascending, last
                # descending); the old (is None, v) key inverted that.
                # Variable-length tuples keep None out of comparisons.
                for field, direction in reversed(list(arg.items())):
                    docs.sort(
                        key=lambda d, f=field: (
                            ((0,) if _get_path(d, f) is None
                             else (1, _get_path(d, f)))),
                        reverse=direction < 0)
            elif op == "$limit":
                docs = docs[:arg]
            else:
                raise ValueError(f"unsupported pipeline stage {op!r}")
        return docs

    # -- engine-facing API (what the planner pushes) ---------------------
    def find(self, collection: str, query: dict | None = None,
             projection: list[str] | None = None) -> DataFrame:
        """Project/filter pushdown (MongoFilterRule): the query document
        and projection run on the server; Spark scans the result."""
        self.last_find = {"collection": collection,
                          "query": query or {}, "projection": projection}
        return self._to_df(self._find(collection, query or {}, projection))

    def aggregate(self, collection: str, pipeline: list[dict]) -> DataFrame:
        """Aggregation-pipeline pushdown (MongoAggregationPipeline):
        the pipeline runs on the server; Spark scans the reduced result."""
        self.last_pipeline = pipeline
        return self._to_df(self._aggregate(collection, pipeline))

    def _to_df(self, docs: list[dict]) -> DataFrame:
        if not docs:
            raise ValueError("empty mongo result (schema unknown)")
        import pandas as pd

        cols: list[str] = []
        for d in docs:
            for k in d:
                if k not in cols:
                    cols.append(k)
        pdf = pd.DataFrame(
            [{c: d.get(c) for c in cols} for d in docs], columns=cols
        )
        return self.spark.createDataFrame(pdf)
