"""URL canonicalization — the web-corpus normalization pass that runs
before any url-keyed dedup/join (Common-Crawl corpora carry the same
page under host-case, default-port, fragment, tracking-param and
trailing-slash variants).

Rules (each mirrored 1:1 in SQL_URL_CANONICALIZE):
1. drop the fragment
2. lowercase scheme and host
3. strip the scheme's default port (https:443, http:80)
4. strip ONE trailing slash from a non-root path
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), sort the
   survivors lexicographically, re-join

The synthetic corpus's urls are already canonical, so the op
decorates them deterministically per doc_id (the construction-oracle
pattern used by pii_redact / the markdown ops) and the SQL oracle
rebuilds both the decoration and the generic canonicalization.
"""

from __future__ import annotations

import pyarrow as pa

_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")
_DEFAULT_PORTS = {"https": "443", "http": "80"}


def decorate_url(doc_id: int, base: str) -> str:
    """Deterministic variant per doc_id % 5 (0 = untouched)."""
    v = doc_id % 5
    if v == 1:
        scheme, rest = base.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme}://{host.upper()}/{path}#section2"
    if v == 2:
        return base + "?utm_source=feed&z=9&a=1"
    if v == 3:
        scheme, rest = base.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme}://{host}:443/{path}/"
    if v == 4:
        return base + "?b=2&utm_campaign=x"
    return base


def canonicalize_url(url: str) -> str:
    url = url.split("#", 1)[0]
    scheme, _, rest = url.partition("://")
    scheme = scheme.lower()

    authpath, _, query = rest.partition("?")
    auth, slash, path = authpath.partition("/")
    path = slash + path

    host, _, port = auth.partition(":")
    host = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        host = f"{host}:{port}"

    if path.endswith("/") and path != "/":
        path = path[:-1]

    params = sorted(
        p
        for p in query.split("&")
        if p and not p.startswith(_TRACKING_PREFIXES)
    )
    tail = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{path}{tail}"


def url_canonicalize_batch(batch: pa.Table) -> pa.Table:
    from ..sources.synth import url_for

    ids = batch["doc_id"].to_pylist()
    raw = [decorate_url(i, url_for(i)) for i in ids]
    canon = [canonicalize_url(u) for u in raw]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "raw_url": pa.array(raw, pa.string()),
            "canon_url": pa.array(canon, pa.string()),
        }
    )
