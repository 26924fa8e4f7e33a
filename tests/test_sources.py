"""Source tests: declared-schema CSV, the REST landing-zone pattern (with
a real in-process HTTP server), and fail-fast auth (reference bug B4)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from kusuma_metamorph_etl_spark.sources.csv import read_csv
from kusuma_metamorph_etl_spark.sources.memory import dataframe_from_records
from kusuma_metamorph_etl_spark.sources.rest import (
    fetch_to_landing,
    fetch_token,
    land_json_records,
    read_landed_json,
)

RECORDS = [
    {"id": 1, "name": "alpha"},
    {"id": 2, "name": "beta"},
    {"id": 3, "name": "gamma"},
]


class _Api(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 (http.server API)
        if self.path == "/token":
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode()
            if "username=admin" in body and "password=pw" in body:
                payload = json.dumps({"access_token": "tok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_response(401)
                self.end_headers()
        else:
            self.send_response(404)
            self.end_headers()

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/v1/things":
            if self.headers.get("Authorization") != "Bearer tok":
                self.send_response(401)
                self.end_headers()
                return
            body = json.dumps({"data": RECORDS}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, *args):  # silence test output
        pass


@pytest.fixture(scope="module")
def api_server():
    server = HTTPServer(("127.0.0.1", 0), _Api)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_csv_declared_schema_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    path = str(tmp_path / "csv")
    df.write.option("header", "true").csv(path)
    back = read_csv(spark, path, schema="id long, v string")
    assert back.schema.simpleString() == "struct<id:bigint,v:string>"
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_land_and_read_json(spark, tmp_path):
    landing = str(tmp_path / "landing")
    paths = land_json_records(RECORDS, landing, records_per_file=2)
    assert len(paths) == 2  # pagination honored
    df = read_landed_json(spark, landing, "id long, name string")
    assert {tuple(r) for r in df.collect()} == {(1, "alpha"), (2, "beta"), (3, "gamma")}


def test_fetch_to_landing_http(spark, api_server, tmp_path):
    requests = pytest.importorskip("requests")  # noqa: F841
    landing = str(tmp_path / "landed")
    fetch_to_landing(api_server, "/v1/things", landing, token="tok")
    df = read_landed_json(spark, landing, "id long, name string")
    assert df.count() == 3


def test_fetch_fails_fast_on_auth_error(api_server, tmp_path):
    requests = pytest.importorskip("requests")
    with pytest.raises(requests.HTTPError):
        fetch_to_landing(api_server, "/v1/things", str(tmp_path / "x"), token=None)


def test_token_flow_end_to_end(spark, api_server, tmp_path):
    requests = pytest.importorskip("requests")
    token = fetch_token(api_server, "admin", "pw")
    assert token == "tok"
    landing = str(tmp_path / "authed")
    fetch_to_landing(api_server, "/v1/things", landing, token=token)
    assert read_landed_json(spark, landing, "id long, name string").count() == 3
    # Wrong credentials fail fast (reference bug B4: silent None token).
    with pytest.raises(requests.HTTPError):
        fetch_token(api_server, "admin", "wrong")


def test_inline_schema_records(spark):
    df = dataframe_from_records(
        spark, [(1, "x")], "id int, v string"
    )
    assert df.schema.simpleString() == "struct<id:int,v:string>"
    assert df.collect()[0].asDict() == {"id": 1, "v": "x"}


def test_orc_roundtrip_with_pushdown(spark, sf_small, tmp_path):
    """ORC is the second first-class columnar source: values survive the
    round-trip and filters push to the ORC scan just as with parquet."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders_orc")
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in orders.collect()}
    plan = (
        back.filter(F.col("o_totalprice") > 1000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_schema_evolution_merges_additive_column(spark, sf_small):
    from kusuma_metamorph_etl_spark.queries.core import src_schema_evolution
    from pyspark.sql import functions as F

    out = src_schema_evolution(spark, sf_small)
    assert out.columns == ["o_orderkey", "o_totalprice", "o_orderpriority"]
    old = out.filter(F.col("o_orderkey") % 2 == 0)
    new = out.filter(F.col("o_orderkey") % 2 == 1)
    assert old.filter(F.col("o_orderpriority").isNotNull()).count() == 0
    assert new.filter(F.col("o_orderpriority").isNull()).count() == 0
    assert old.count() > 0 and new.count() > 0


def test_csv_badrecords_quarantines_malformed_lines(spark, sf_small):
    """PERMISSIVE + corrupt-record column: every malformed line is
    captured (not dropped, not fatal) and every good line parses."""
    import os

    from pyspark.sql import functions as F

    from kusuma_metamorph_etl_spark.queries.core import SCRATCH, src_csv_badrecords
    from kusuma_metamorph_etl_spark.sources.catalog import load_table

    good = src_csv_badrecords(spark, sf_small)
    orders = load_table(spark, sf_small, "orders")
    n_bad_expected = orders.filter(F.col("o_orderkey") % 97 == 0).count()
    n_good_expected = orders.count() - n_bad_expected
    # CSV corrupt detection runs against the PRUNED schema: selecting a
    # subset re-parses only those fields and un-marks short rows, and a
    # corrupt-only projection is disallowed outright — so count the GOOD
    # rows with the full projection the query declares.
    assert len(good.collect()) == n_good_expected

    base = os.path.join(SCRATCH, "csv_badrecords", os.path.basename(sf_small))
    parsed = (
        spark.read.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double, "
            "_corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(base)
        .cache()  # the documented workaround for querying _corrupt alone
    )
    quarantined = parsed.filter(F.col("_corrupt").isNotNull())
    assert quarantined.count() == n_bad_expected
    # the raw malformed line is preserved for audit
    assert all("garbage" in r["_corrupt"] for r in quarantined.collect())


def test_landing_rerun_clears_stale_pages(spark, tmp_path):
    """Regression (r8 review): numbering restarts at 0 each run, so a
    shrinking feed left yesterday's higher-index files for the glob to
    silently mix in."""
    landing = str(tmp_path / "land")
    land_json_records([{"id": i} for i in range(6)], landing, records_per_file=2)
    land_json_records([{"id": i} for i in range(2)], landing, records_per_file=2)
    got = read_landed_json(spark, landing, "id long")
    assert got.count() == 2  # only the re-run's records, no stale pages
