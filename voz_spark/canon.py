"""URL canonicalization + stable keying (SURVEY §2.B B1/B2).

Reference behavior being generalized: relative→absolute joins at
src/box_crawler.py:119-121 and src/thread_crawler.py:291-292, thread-id
regex at src/box_crawler.py:170-174, md5 cache key at
src/image_processor.py:59-60.

``canonicalize_one`` is a plain Python function so the exact same code
runs inside the vectorized pandas UDF (engine) and inside the pure-
Python oracle simulator — ordering/seen-set parity cannot drift.

The 64-bit key is Spark's built-in ``xxhash64`` (JVM-side, no UDF).
It is used ONLY for bloom membership, shard routing, and salting; the
exact dedup join always includes the canonical URL string, so a hash
collision can never drop a URL (SURVEY §7.4 item 2).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_one(url: str, base: str | None = None) -> str:
    """Canonical form: resolve vs base, lowercase scheme/host, drop
    fragment and default port, ensure a path, collapse duplicate
    slashes in the path."""
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    while "//" in path:
        path = path.replace("//", "/")
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def url_key(col: Column) -> Column:
    """64-bit stable key: Spark built-in xxhash64 (seed 42)."""
    return F.xxhash64(col)


def host_col(url: Column) -> Column:
    """Host extraction as a JVM-side expression (no Python)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))
