"""URL canonicalization + component extraction (operators F1/F6, SURVEY.md §2.2).

Reference behavior reimplemented (not ported):
  - component extraction: url.Parse -> (scheme, host, path); base = scheme://host
    (/root/reference/src/utils/utils.go:47-53, src/crawler.go:119-130)
  - child normalize/filter: drop empty, percent-decode, drop '#...'/'?...',
    '/path' -> base_url + path, require valid UTF-8
    (/root/reference/src/utils/utils.go:55-62,161-183)
  - allowlist: scheme in {http,https}, path != '/robots.txt', host not blocked
    (/root/reference/src/crawler.go:204-220)

One vectorized Arrow pass (pandas UDF) computes canonical url + components +
validity together; the native-function fallbacks (parse_url / url_decode) are
used in the SQL-checkable operator surface.
"""

from __future__ import annotations

from urllib.parse import unquote, urlsplit

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

CANON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("valid", StringType()),  # '1' / '0' (Arrow-friendly)
    ]
)


def canonicalize_one(raw: str | None, base_url: str | None = None):
    """Pure-Python core shared by the pandas UDF and the oracle.

    Returns (canon_url, scheme, host, path, valid).
    """
    if raw is None:
        return (None, None, None, None, "0")
    try:
        s = unquote(raw).strip()
    except Exception:
        return (raw, None, None, None, "0")
    if not s or s.startswith("#") or s.startswith("?"):
        return (s, None, None, None, "0")
    if s.startswith("/") and base_url:
        s = base_url.rstrip("/") + s
    try:
        s.encode("utf-8")
        parts = urlsplit(s)
    except (UnicodeError, ValueError):
        return (s, None, None, None, "0")
    scheme, host = parts.scheme.lower(), parts.netloc.lower()
    if not scheme or not host:
        return (s, scheme or None, host or None, parts.path or "/", "0")
    path = parts.path or "/"
    canon = f"{scheme}://{host}{path}"
    if parts.query:
        canon += f"?{parts.query}"
    return (canon, scheme, host, path, "1")


@pandas_udf(CANON_SCHEMA)
def canonicalize_udf(urls: pd.Series, bases: pd.Series) -> pd.DataFrame:
    rows = [canonicalize_one(u, b) for u, b in zip(urls, bases)]
    return pd.DataFrame(rows, columns=["url", "scheme", "host", "path", "valid"])


def with_canonical(df, url_col: str = "url", base_col: str | None = None):
    """Attach canonical url/scheme/host/path/valid columns in one Arrow pass."""
    base = F.col(base_col) if base_col else F.lit(None).cast("string")
    c = canonicalize_udf(F.col(url_col), base)
    return (
        df.withColumn("_c", c)
        .withColumn("url_canon", F.col("_c.url"))
        .withColumn("scheme", F.col("_c.scheme"))
        .withColumn("host", F.col("_c.host"))
        .withColumn("path", F.col("_c.path"))
        .withColumn("url_valid", F.col("_c.valid") == "1")
        .drop("_c")
    )


def allow_predicate(
    schemes=("http", "https"), blocked_paths=("/robots.txt",), blocked_hosts=()
) -> Column:
    """F2 allowlist as a native predicate (whole-stage codegen friendly)."""
    p = F.col("scheme").isin(*schemes) & F.col("url_valid")
    for bp in blocked_paths:
        p = p & (F.col("path") != bp)
    if blocked_hosts:
        p = p & ~F.col("host").isin(*blocked_hosts)
    return p
