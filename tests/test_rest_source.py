"""REST source against a local HTTP server (stdlib http.server in a
thread): GET/POST + headers + CSV/JSON bodies + executor-side partitioned
fetch."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from macrobase_spark.sources.rest import read_rest, read_rest_partitioned

CSV_BODY = "usage,latency,location\n1.5,10,CAN\n2.5,20,USA\n"
PAGES = {f"/page{i}": f"a,b\n{i},x{i}\n{i * 10},y{i}\n" for i in range(4)}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, body: str, ctype: str = "text/plain"):
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path.startswith("/csv"):
            if self.headers.get("X-Auth") != "token42":
                self.send_response(401)
                self.end_headers()
                return
            self._send(CSV_BODY)
        elif self.path.startswith("/json"):
            self._send(json.dumps({"data": [
                {"usage": 1.5, "location": "CAN"},
                {"usage": 2.5, "location": "USA"},
            ]}), "application/json")
        elif self.path in PAGES:
            self._send(PAGES[self.path])
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        rows = "\n".join(f"{v},POSTED" for v in body.get("vals", []))
        self._send(f"v,tag\n{rows}\n")


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_rest_get_csv_with_headers_and_types(spark, server):
    df = read_rest(spark, f"{server}/csv", headers={"X-Auth": "token42"},
                   types={"usage": "double", "latency": "int"})
    rows = {r["location"]: r for r in df.collect()}
    assert rows["CAN"]["usage"] == 1.5 and rows["USA"]["latency"] == 20
    assert dict(df.dtypes)["usage"] == "double"


def test_rest_auth_failure_raises(spark, server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        read_rest(spark, f"{server}/csv")  # missing header → 401


def test_rest_post_json_body(spark, server):
    df = read_rest(spark, f"{server}/post", method="POST",
                   json_body=json.dumps({"vals": [7, 8]}))
    got = sorted((r["v"], r["tag"]) for r in df.collect())
    assert got == [("7", "POSTED"), ("8", "POSTED")]


def test_rest_json_format(spark, server):
    df = read_rest(spark, f"{server}/json", fmt="json",
                   types={"usage": "double"})
    assert {r["location"] for r in df.collect()} == {"CAN", "USA"}


def test_rest_partitioned_executor_fetch(spark, server):
    urls = [f"{server}/page{i}" for i in range(4)]
    df = read_rest_partitioned(spark, urls, types={"a": "int"},
                               num_partitions=2)
    rows = df.collect()
    assert len(rows) == 8
    assert {r["a"] for r in rows} == {0, 1, 2, 3, 10, 20, 30, 0}
