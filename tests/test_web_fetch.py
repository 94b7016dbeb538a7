"""Live-fetch stage driven against a LOCAL http.server — the
reference's WebSource semantics (robots gate, crawl-delay clock,
charset decode, failure degradation) without external network.
"""

from __future__ import annotations

import http.server
import threading

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def http_fixture():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/page"):
                body = f"<html><body><p>content {self.path}</p></body></html>".encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/latin"):
                body = "héllo".encode("latin-1")
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=latin-1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *args):  # quiet
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_web_fetch_robots_delay_and_decode(spark, http_fixture):
    from fundus_spark.sources.web import web_fetch

    base = http_fixture
    urls = spark.createDataFrame(
        [
            (0, "local", f"{base}/page/0"),
            (1, "local", f"{base}/page/1"),
            (2, "local", f"{base}/private/x"),  # robots-disallowed
            (3, "local", f"{base}/latin"),
            (4, "local", f"{base}/missing"),  # 404 -> error row
        ],
        "url_id long, source string, url string",
    )
    robots = spark.createDataFrame(
        [("local", "User-agent: *\nDisallow: /private/\nCrawl-delay: 0\n")],
        "source string, robots_txt string",
    )
    rows = {r["url_id"]: r for r in web_fetch(urls, robots, default_delay=0.0, timeout=10).collect()}
    assert rows[0]["status"] == 200 and "content /page/0" in rows[0]["html"]
    assert rows[1]["status"] == 200
    assert rows[2]["skipped_by_robots"] == "disallowed" and rows[2]["html"] is None
    assert rows[3]["html"] == "héllo"  # charset=latin-1 honored
    assert rows[4]["error"] is not None and rows[4]["html"] is None
