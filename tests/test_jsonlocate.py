"""JSON selection→path locator (jsonlocate.py vs the reference's
JSONElementLocator.java) and the extract-map/extract-list
recommenders it feeds (ExtractMapRecommender / ExtractListRecommender
getRules), through to oracle-checked regenerated SQL."""

from __future__ import annotations

import json

import pytest

from dremio_oss_spark.engine import Engine
from dremio_oss_spark.explore import (ExploreService, ExploreError,
                                      recommend_extract_list,
                                      recommend_extract_map)
from dremio_oss_spark.jsonlocate import (JsonLocateError, locate,
                                         locate_path, parse_path,
                                         to_rule_path)
from tests.conftest import SF_SMALL
from tests.oracle import duckdb_conn

DONUT = json.dumps({
    "id": "0001", "type": "donut",
    "batters": {"batter": [
        {"id": "1001", "type": "Regular"},
        {"id": "1002", "type": "Chocolate"},
        {"id": "1003", "type": "Blueberry"}]},
    "topping": [{"id": "5001", "type": "None"},
                {"id": "5002", "type": "Glazed"}]})


def test_locate_scalar_selection_to_path():
    off = DONUT.find("Chocolate")
    start, end = locate(DONUT, off, off + len("Chocolate"))
    assert to_rule_path(start) == "batters.batter[1].type"
    assert start == end


def test_locate_path_roundtrip():
    # every scalar path round-trips: locate_path -> locate
    for path, want in [("value.id", "0001"),
                       ("value.batters.batter[0].id", "1001"),
                       ("value.batters.batter[2].type", "Blueberry"),
                       ("value.topping[1].type", "Glazed")]:
        iv = locate_path(DONUT, path)
        assert iv is not None, path
        assert DONUT[iv[0]:iv[1]] == want, path
        s, e = locate(DONUT, iv[0], iv[1])
        assert "value" + to_rule_path([el for el in s]) == \
            "value." + path.split("value.")[1].replace("value.", "") \
            or to_rule_path(s) == path[len("value."):], (path, s)


def test_locate_path_container_interval():
    iv = locate_path(DONUT, "value.batters")
    frag = DONUT[iv[0]:iv[1]]
    assert frag.startswith("{") and frag.endswith("}")
    assert json.loads(frag) == json.loads(DONUT)["batters"]
    iv = locate_path(DONUT, "value.topping")
    assert json.loads(DONUT[iv[0]:iv[1]]) == \
        json.loads(DONUT)["topping"]
    assert locate_path(DONUT, "value.no.such") is None


def test_locate_selection_spanning_siblings():
    # a selection across two toppings maps start/end to each element
    a = DONUT.find('{"id": "5001"')
    b = DONUT.find('"Glazed"') + len('"Glazed"')
    start, end = locate(DONUT, a, b)
    assert to_rule_path(start).startswith("topping[0]")
    assert to_rule_path(end).startswith("topping[1]")


def test_parse_path_and_rule_path():
    p = parse_path("value.a[0].b[12]")
    assert to_rule_path(p) == "a[0].b[12]"
    with pytest.raises(JsonLocateError):
        parse_path("value.a[0")
    with pytest.raises(JsonLocateError):
        locate("{not json", 0, 2)


def test_recommend_extract_map_from_selection():
    off = DONUT.find("Chocolate")
    rules = recommend_extract_map(
        {"cellText": DONUT, "offset": off, "length": 9})
    assert rules == [{"path": "batters.batter[1].type"}]
    # reference parity: an explicit mapPathList wins
    rules = recommend_extract_map(
        {"mapPathList": ["batters", "batter"]})
    assert rules == [{"path": "batters.batter"}]
    # spanning selection recommends the common ancestor
    a = DONUT.find('"1001"')
    b = DONUT.find("Chocolate") + 3
    rules = recommend_extract_map(
        {"cellText": DONUT, "offset": a + 1, "length": b - a - 1})
    assert rules == [{"path": "batters.batter"}]
    with pytest.raises(ExploreError):
        recommend_extract_map({"cellText": "{bad", "offset": 0,
                               "length": 1})


def test_recommend_extract_list_single_and_span():
    arr = json.dumps(["a", "bb", "ccc", "dddd", "eeeee"])
    off = arr.find('"ccc"')
    rules = recommend_extract_list(
        {"cellText": arr, "offset": off, "length": 5})
    assert rules == [{"type": "single", "single": {"index": 2}}]
    # span elements 1..3 -> the four from-start/from-end combos
    a = arr.find('"bb"')
    b = arr.find('"dddd"') + 6
    rules = recommend_extract_list(
        {"cellText": arr, "offset": a, "length": b - a})
    sels = [r["multiple"]["selection"] for r in rules]
    assert len(sels) == 4
    assert sels[0] == {"start": {"value": 1,
                                 "direction": "FROM_THE_START"},
                       "end": {"value": 3,
                               "direction": "FROM_THE_START"}}
    # from-the-end offsets use the array's final size (count=5)
    assert sels[3] == {"start": {"value": 3,
                                 "direction": "FROM_THE_END"},
                       "end": {"value": 1,
                               "direction": "FROM_THE_END"}}
    with pytest.raises(ExploreError):
        recommend_extract_list(
            {"cellText": DONUT, "offset": 2, "length": 4})


@pytest.fixture(scope="module")
def svc(spark):
    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    return ExploreService(eng)


def test_selection_to_transform_roundtrip_oracle(svc):
    """Donuts-style nested cell: selections map to paths that
    round-trip through extract transforms into oracle-checked SQL."""
    svc.new_untitled_from_table("orders", "jl0")
    svc.transform("tmp.UNTITLED", "jl0", {
        "type": "addCalculatedField", "newColumnName": "cell",
        "sourceColumnName": "o_orderstatus",
        "expression": "named_struct('prio', named_struct('word', "
                      "split(o_orderpriority, '-')[1]), 'tags', "
                      "split(o_orderpriority, '-'))",
        "dropSourceColumn": False}, "jl1")
    row = svc.engine.sql(
        svc.get_version("tmp.UNTITLED", "jl1")["sql"]).limit(
        1).collect()[0]
    cell = json.dumps(row["cell"].asDict(recursive=True))
    word = row["cell"]["prio"]["word"]
    off = cell.find(f'"{word}"', cell.find("word")) + 1
    rules = recommend_extract_map(
        {"cellText": cell, "offset": off, "length": len(word)})
    assert rules == [{"path": "prio.word"}], rules
    svc.transform("tmp.UNTITLED", "jl1", {
        "type": "field", "sourceColumnName": "cell",
        "newColumnName": "prio_word", "dropSourceColumn": True,
        "fieldTransformation": {
            "type": "ExtractMap",
            "extractMap": {"rule": rules[0]}}}, "jl2")
    got = svc.engine.sql(
        svc.get_version("tmp.UNTITLED", "jl2")["sql"]) \
        .groupBy("prio_word").count().collect()
    con = duckdb_conn(SF_SMALL)
    try:
        exp = dict(con.execute(
            "select split_part(o_orderpriority, '-', 2), count(*) "
            "from orders group by 1").fetchall())
    finally:
        con.close()
    assert {r["prio_word"]: r["count"] for r in got} == exp


def test_extract_cards_over_rest(spark):
    """extract_map / extract_list card routes locate selections and
    return ready rules with sample match counts."""
    import json as _json
    import urllib.request as rq

    from dremio_oss_spark.server.rest import serve_rest_background

    eng = Engine(spark)
    eng.add_testdata_source(SF_SMALL)
    server, _t = serve_rest_background(eng)
    port = server.server_address[1]

    def call(method, path, body=None):
        req = rq.Request(f"http://127.0.0.1:{port}{path}",
                         data=_json.dumps(body).encode()
                         if body is not None else None,
                         method=method,
                         headers={"Content-Type": "application/json"})
        with rq.urlopen(req) as r:
            return r.status, _json.loads(r.read())

    try:
        code, out = call("POST", "/api/v3/datasets/new_untitled"
                         "?parentDataset=orders&newVersion=jx0"
                         "&limit=1")
        assert code == 200, out
        path = ".".join(out["dataset"]["fullPath"])
        code, _ = call(
            "POST",
            f"/api/v3/dataset/{path}/version/jx0/"
            "transformAndPreview?newVersion=jx1",
            body={"type": "addCalculatedField",
                  "newColumnName": "tags",
                  "sourceColumnName": "o_orderpriority",
                  "expression": "split(o_orderpriority, '-')",
                  "dropSourceColumn": False})
        cell = json.dumps(["1", "URGENT"])
        code, cards = call(
            "POST",
            f"/api/v3/dataset/{path}/version/jx1/extract_list",
            body={"colName": "tags", "cellText": cell,
                  "offset": cell.find("URGENT"), "length": 6})
        assert code == 200, cards
        assert cards["cards"][0]["rule"] == {
            "type": "single", "single": {"index": 1}}
        assert cards["cards"][0]["matchedCount"] > 0
        donut_cell = json.dumps({"prio": {"word": "URGENT"}})
        code, cards = call(
            "POST",
            f"/api/v3/dataset/{path}/version/jx1/extract_map",
            body={"colName": "tags", "cellText": donut_cell,
                  "offset": donut_cell.find("URGENT"),
                  "length": 6})
        assert code == 200, cards
        assert cards["cards"][0]["rule"] == {"path": "prio.word"}
    finally:
        server.shutdown()


def test_locate_path_object_array_element_reference_parity():
    """Reference parity (JSONElementLocator.java:168-173): a path
    naming an object-valued array element resolves to None — the live
    path only equals it at END_OBJECT, which the reference's switch
    maps to null.  Paths INTO the element resolve."""
    assert locate_path(DONUT, "value.topping[0]") is None
    iv = locate_path(DONUT, "value.topping[0].type")
    assert DONUT[iv[0]:iv[1]] == "None"
