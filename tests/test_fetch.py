"""Fetcher seam (S3): HttpFetcher unit (injected transport), integration
(real localhost HTTP server, UA/timeout/status semantics per reference
src/utils/utils.go:22-45), and a full golden crawl through real HTTP."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlsplit

import pyspark.sql.functions as F
import pytest

from grawler import oracle, synthgen
from grawler.conf import CrawlConfig
from grawler.engine import CrawlEngine
from grawler.fetch import HttpFetcher
from grawler.synthgen import spark_tables

CFG = CrawlConfig()


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_http_fetcher_injected_transport(spark):
    """Status / error mapping without a network: 200 kept, 404 recorded
    (downstream filter drops >399), transport exception -> null status."""
    pages = {
        "http://a.example/ok": (200, "text/html; charset=utf-8", "<p>hi</p>"),
        "http://a.example/gone": (404, "text/html", "nope"),
    }

    def transport(url):
        if url not in pages:
            raise OSError("connection refused")
        return pages[url]

    f = HttpFetcher(transport=transport)
    got = {
        r["url"]: (r["status"], r["content_type"], r["html"])
        for r in f.fetch(
            _urls_df(spark, list(pages) + ["http://dead.example/x"])
        ).collect()
    }
    assert got["http://a.example/ok"] == (
        200, "text/html; charset=utf-8", "<p>hi</p>")
    assert got["http://a.example/gone"][0] == 404
    assert got["http://dead.example/x"] == (None, None, None)


class _Handler(BaseHTTPRequestHandler):
    # class attrs injected by the fixture
    routes: dict = {}
    seen_agents: list = []
    requests: list = []

    def do_GET(self):  # noqa: N802
        type(self).seen_agents.append(self.headers.get("User-Agent"))
        type(self).requests.append(unquote(self.path))
        entry = self.routes.get(unquote(self.path))
        if entry is None:
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"not found")
            return
        status, ctype, body = entry
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    _Handler.routes = {}
    _Handler.seen_agents = []
    _Handler.requests = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, srv.server_address[1]
    srv.shutdown()


def test_http_fetcher_real_server(spark, http_server):
    srv, port = http_server
    _Handler.routes.update({
        "/ok": (200, "text/html; charset=utf-8", "<a href='/x'>x</a>"),
        "/err": (500, "text/plain", "boom"),
    })
    base = f"http://127.0.0.1:{port}"
    f = HttpFetcher(user_agent="grawler", timeout_s=5)
    rows = {r["url"]: r for r in f.fetch(
        _urls_df(spark, [f"{base}/ok", f"{base}/err", f"{base}/missing"])
    ).collect()}
    assert rows[f"{base}/ok"]["status"] == 200
    assert rows[f"{base}/ok"]["html"] == "<a href='/x'>x</a>"
    assert rows[f"{base}/err"]["status"] == 500          # >399 -> error path
    assert rows[f"{base}/missing"]["status"] == 404
    assert rows[f"{base}/ok"]["fetch_latency_ms"] >= 0
    assert set(_Handler.seen_agents) == {"grawler"}      # reference UA


def test_http_fetcher_timeout_is_failed_fetch(spark, http_server):
    """A server slower than timeout_s -> null status (failed fetch, NOT an
    exception), matching the reference's 10s-client-timeout error handling
    (src/utils/utils.go:24,40-42); fast URLs in the same batch still land."""
    import time as _t

    srv, port = http_server
    _Handler.routes["/fast"] = (200, "text/plain", "ok")

    class SlowHandler(_Handler):
        def do_GET(self):  # noqa: N802
            if self.path == "/slow":
                _t.sleep(3)
            super().do_GET()

    srv.RequestHandlerClass = SlowHandler
    base = f"http://127.0.0.1:{port}"
    f = HttpFetcher(timeout_s=1)
    rows = {r["url"]: r for r in f.fetch(
        _urls_df(spark, [f"{base}/fast", f"{base}/slow"])).collect()}
    assert rows[f"{base}/fast"]["status"] == 200
    assert rows[f"{base}/slow"]["status"] is None
    assert rows[f"{base}/slow"]["html"] is None


def test_golden_crawl_through_real_http(spark, http_server, tmp_path):
    """End-to-end: the engine with HttpFetcher against a local server
    serving the synthetic web must equal the pure-Python oracle — the
    deploy path (real sockets, threads, Arrow batches) is the tested path.
    URLs are routed host-aware: http://<host>/<path> -> /<host>/<path>."""
    srv, port = http_server
    web = synthgen.generate(seed=42, n_pages=60, shape="mixed")
    for p in web.pages.to_dict("records"):
        parts = urlsplit(p["url"])
        key = f"/{parts.netloc}{parts.path}" + (
            f"?{parts.query}" if parts.query else "")
        _Handler.routes[key] = (
            int(p["status"]), p["content_type"], p["html"])
    for r in web.robots.to_dict("records"):
        _Handler.routes[f"/{r['host']}/robots.txt"] = (
            200, "text/plain", r["robots_txt"])

    def rewrite(url: str, _port=port) -> str:
        parts = urlsplit(url)
        q = f"?{parts.query}" if parts.query else ""
        return f"http://127.0.0.1:{_port}/{parts.netloc}{parts.path}{q}"

    seeds, pages, robots, images = spark_tables(spark, web)
    fetcher = HttpFetcher(user_agent="grawler", timeout_s=5,
                          url_rewriter=rewrite)
    eng = CrawlEngine(spark, pages, robots, images, str(tmp_path), CFG,
                      robots_cache_init=robots, fetcher=fetcher)
    res = eng.run(seeds, max_waves=3)
    o = oracle.crawl(web, CFG, max_waves=3)

    etr = [(r["wave"], r["seq"], r["url"], r["host"], r["depth"])
           for r in res.trace().orderBy("wave", "seq").collect()]
    assert etr == o.trace
    seen = {r["url"]: r["first_wave"] for r in res.seen().collect()}
    assert seen == o.seen
    store = {r["image_id"]: (r["caption"], r["phash"])
             for r in res.store().collect()}
    assert store == {i: (s["caption"], s["phash"])
                     for i, s in o.store.items()}
    # robots single-fetch invariant (ADVICE r2): the committed robots_delta
    # must come from the PERSISTED cache, not re-execute fetch_robots — a
    # re-execution would GET each stale host's robots.txt twice per wave
    # (and could persist different rules than the ones that gated the wave)
    from collections import Counter

    robots_gets = Counter(p for p in _Handler.requests
                          if p.endswith("/robots.txt"))
    doubled = {p: n for p, n in robots_gets.items() if n > 1}
    assert not doubled, f"robots.txt fetched more than once: {doubled}"
