"""REST serving surface (reference controller/ParseController.java:18-28):
POST /fetch with a SQL body returns the ColLine list as JSON."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from hive_parse_lineage_spark.engine import Engine
from hive_parse_lineage_spark.server import make_server


@pytest.fixture(scope="module")
def server_url(spark, tables):
    eng = Engine(spark, register_tables=False)
    srv = make_server(eng)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()
    srv.server_close()


def _post(url: str, body: str):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server_url):
    with urllib.request.urlopen(server_url + "/health") as resp:
        assert json.loads(resp.read()) == {"status": "ok"}


def test_fetch_lineage(server_url):
    status, edges = _post(server_url + "/fetch",
                          "SELECT n_name AS nm FROM nation WHERE n_regionkey = 0")
    assert status == 200
    assert any(e["target_alias"] == "nm"
               and "default.nation.n_name" in e["sources"] for e in edges)
    assert any(any(c.startswith("WHERE:") for c in e["conditions"]) for e in edges)


def test_tables_endpoint(server_url):
    status, body = _post(server_url + "/tables",
                         "INSERT INTO nation SELECT * FROM nation")
    assert status == 200
    assert body["input_tables"] == ["default.nation"]
    assert body["output_tables"] == ["default.nation"]


def test_fetch_traverse_views(server_url, spark):
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW srv_v AS "
              "SELECT n_name FROM nation WHERE n_regionkey = 0")
    try:
        _, bound = _post(server_url + "/fetch", "SELECT n_name FROM srv_v")
        assert bound[0]["sources"] == ["default.srv_v.n_name"]
        _, expanded = _post(server_url + "/fetch?traverse_views=1",
                            "SELECT n_name FROM srv_v")
        assert expanded[0]["sources"] == ["default.nation.n_name"]
    finally:
        spark.sql("DROP VIEW IF EXISTS srv_v")


def test_fetch_parse_error(server_url):
    req = urllib.request.Request(server_url + "/fetch",
                                 data=b"SELEC nonsense FROM", method="POST")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
        assert "error" in json.loads(e.read())
    assert raised


def test_tables_operations(server_url):
    """POST /tables returns per-statement Operation tags
    (common/Operation.java:3-5) alongside the table sets."""
    status, body = _post(server_url + "/tables",
                         "SELECT * FROM nation; "
                         "INSERT INTO nation SELECT * FROM nation; "
                         "DROP TABLE IF EXISTS no_such_tbl")
    assert status == 200
    assert body["operations"] == ["SELECT", "INSERT", "DROP"]
    assert body["input_tables"] == ["default.nation"]
