"""Fetcher seam (S3): the engine fetches scheduled URLs through a Fetcher.

Two implementations of one contract:

  SimFetcher   deterministic fetch-sim — joins the synthetic web tables
               (sandbox/test default; no network, reproducible goldens).
  HttpFetcher  real batched HTTP via mapInPandas: UA 'grawler', 10 s
               timeout, status recorded and >399 handled downstream as a
               failed fetch — the reference fetch semantics
               (/root/reference/src/utils/utils.go:22-45: custom UA header,
               10 s client timeout, StatusCode > 399 -> error). A
               per-partition thread pool issues concurrent requests per
               Arrow batch (the reference overlaps fetches with 20
               goroutines; here parallelism = partitions x pool size).
               An injectable `transport` makes it unit-testable offline and
               a `url_rewriter` lets integration tests route synthetic
               hostnames to a local server.

Both produce the same columns appended to the scheduled rows:
  status smallint, content_type string, fetch_latency_ms int, html string
(missing/failed fetch -> null status, matching the fetch-sim left join).

Robots fetching goes through the same seam (`fetch_robots`): a real
deployment GETs http://<host>/robots.txt on cache miss/staleness
(reference src/crawler.go:222-254). A failed/non-200 robots fetch maps to
empty rules, i.e. fail-OPEN — this INTENTIONALLY diverges from the
reference, whose agentAllowed returns an error on fetch failure
(effectively fail-closed); empty-rules-on-miss is the semantics the
SimFetcher and the pure-Python oracle implement, so both fetchers gate
identically and crawl goldens stay transport-independent.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

FETCH_FIELDS = [
    StructField("status", ShortType()),
    StructField("content_type", StringType()),
    StructField("fetch_latency_ms", IntegerType()),
    StructField("html", StringType()),
]


class SimFetcher:
    """Deterministic fetch: join the synthetic web (no network)."""

    def __init__(self, pages: DataFrame, robots_truth: DataFrame):
        self.pages = pages.select(
            "url", "status", "content_type", "fetch_latency_ms", "html"
        ).persist()
        self.robots_truth = robots_truth.select("host", "robots_txt").persist()

    def fetch(self, to_fetch: DataFrame) -> DataFrame:
        return to_fetch.join(self.pages, "url", "left")

    def fetch_robots(self, stale_hosts: DataFrame, ts) -> DataFrame:
        return (
            stale_hosts.join(self.robots_truth, "host", "left")
            .select(
                "host",
                F.coalesce("robots_txt", F.lit("")).alias("robots_txt"),
                F.lit(ts).alias("fetched_ts"),
            )
        )


def _default_transport(user_agent: str, timeout_s: float):
    """Real HTTP GET -> (status | None, content_type, text)."""
    import urllib.error
    import urllib.request

    def get(url: str):
        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status = int(resp.status)
                ctype = resp.headers.get("Content-Type", "") or ""
                raw = resp.read()
        except urllib.error.HTTPError as e:  # >= 400 with a response
            status = int(e.code)
            ctype = (e.headers.get("Content-Type", "") if e.headers
                     else "") or ""
            try:
                raw = e.read()
            except Exception:
                raw = b""
        except Exception:  # timeout / refused / DNS -> failed fetch
            return None, None, None
        charset = "utf-8"
        if "charset=" in ctype:
            charset = ctype.split("charset=", 1)[1].split(";")[0].strip()
        try:
            text = raw.decode(charset, errors="replace")
        except LookupError:
            text = raw.decode("utf-8", errors="replace")
        return status, ctype, text

    return get


class HttpFetcher:
    """Batched HTTP fetch: one Arrow batch -> one thread pool of GETs.

    transport: optional Callable[[url], (status|None, content_type, text)]
               replacing the real GET (unit tests / custom clients).
    url_rewriter: optional Callable[[url], url] applied before the GET
               (integration tests route synthetic hosts to localhost).
    """

    def __init__(
        self,
        user_agent: str = "grawler",
        timeout_s: float = 10.0,
        max_conns_per_task: int = 8,
        transport: Callable | None = None,
        url_rewriter: Callable[[str], str] | None = None,
    ):
        self.user_agent = user_agent
        self.timeout_s = timeout_s
        self.max_conns = max(1, max_conns_per_task)
        self.transport = transport
        self.url_rewriter = url_rewriter

    def fetch(self, to_fetch: DataFrame) -> DataFrame:
        schema = StructType(list(to_fetch.schema.fields) + FETCH_FIELDS)
        ua, timeout_s = self.user_agent, self.timeout_s
        transport, rewrite = self.transport, self.url_rewriter
        max_conns = self.max_conns

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import time
            from concurrent.futures import ThreadPoolExecutor

            get = transport or _default_transport(ua, timeout_s)

            def one(url: str):
                t0 = time.monotonic()
                try:
                    status, ctype, text = get(rewrite(url) if rewrite else url)
                except Exception:
                    status, ctype, text = None, None, None
                return (status, ctype,
                        int((time.monotonic() - t0) * 1000), text)

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                with ThreadPoolExecutor(
                    max_workers=min(max_conns, len(pdf))
                ) as pool:
                    res = list(pool.map(one, pdf["url"]))
                out = pdf.copy()
                out["status"] = pd.array(
                    [r[0] for r in res], dtype="Int16")
                out["content_type"] = [r[1] for r in res]
                out["fetch_latency_ms"] = pd.array(
                    [r[2] for r in res], dtype="Int32")
                out["html"] = [r[3] for r in res]
                yield out

        return to_fetch.mapInPandas(run, schema=schema)

    def fetch_robots(self, stale_hosts: DataFrame, ts) -> DataFrame:
        urls = stale_hosts.select(
            "host",
            F.concat(F.lit("http://"), F.col("host"),
                     F.lit("/robots.txt")).alias("url"),
        )
        got = self.fetch(urls)
        return got.select(
            "host",
            F.when(F.col("status") == 200, F.col("html"))
            .otherwise(F.lit("")).alias("robots_txt"),
            F.lit(ts).alias("fetched_ts"),
        )
