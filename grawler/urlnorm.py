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

import re
from urllib.parse import unquote, urlsplit

import numpy as np
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


# Vectorized fast path: URLs for which canonicalize_one is provably the
# identity transform (no percent-escapes, no query/fragment, no whitespace
# or other stripped/normalized characters, scheme+host already lowercase,
# plain host charset, non-empty path). For these, canonicalize_one returns
# (raw, scheme, host, path, "1") with the groups exactly as the regex
# captures them, so one C-level pandas str.extract replaces the per-row
# unquote+urlsplit loop; everything else falls back to canonicalize_one.
# \x1c-\x1f are excluded everywhere because str.strip() removes them while
# re's \s does not match them.
_FAST_RE = re.compile(
    r"^([a-z][a-z0-9+.\-]*)://([a-z0-9._\-]+)(/[^\s\x1c-\x1f?#%]*)$")


def _canonicalize_batch(urls: pd.Series, bases: pd.Series) -> pd.DataFrame:
    n = len(urls)
    ext = urls.str.extract(_FAST_RE, expand=True)
    fast = ext[0].notna().to_numpy()
    cols = {}
    for name in ("url", "scheme", "host", "path", "valid"):
        cols[name] = np.empty(n, dtype=object)
    raw = urls.to_numpy(dtype=object)
    cols["url"][fast] = raw[fast]
    cols["scheme"][fast] = ext[0].to_numpy(dtype=object)[fast]
    cols["host"][fast] = ext[1].to_numpy(dtype=object)[fast]
    cols["path"][fast] = ext[2].to_numpy(dtype=object)[fast]
    cols["valid"][fast] = "1"
    if not fast.all():
        base_arr = bases.to_numpy(dtype=object)
        for i in np.flatnonzero(~fast):
            u = raw[i]
            row = canonicalize_one(None if u is None or u != u else u,
                                   base_arr[i])
            (cols["url"][i], cols["scheme"][i], cols["host"][i],
             cols["path"][i], cols["valid"][i]) = row
    return pd.DataFrame(cols)


@pandas_udf(CANON_SCHEMA)
def _canonicalize_udf_raw(urls: pd.Series, bases: pd.Series) -> pd.DataFrame:
    return _canonicalize_batch(urls, bases)


# asNondeterministic: a filter on a UDF-derived column (the allowlist
# predicate over _c.scheme/_c.valid) otherwise gets pushed below the
# projection and the optimizer evaluates the UDF TWICE — one ArrowEvalPython
# under the filter and one above (observed in the r06 baseline plans for
# the frontier pipeline and the engine's children path). Marking it
# non-deterministic forbids the duplication: one ArrowEvalPython, the
# filter runs on its output. The function itself is pure, so this is only
# an optimizer fence, not a semantics change.
canonicalize_udf = _canonicalize_udf_raw.asNondeterministic()


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
