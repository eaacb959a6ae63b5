"""URL normalization and derivation functions (M4/M5/M6/M11).

Reference: /root/reference/src/main/java/searchengine/utils/UrlUtils.java
(duplicated logic at config/SitesList.java:36-54) and the full-URL builder
at service/SearchServiceImpl.java:209-237.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def normalize_url(url: str) -> str:
    """M4 (UrlUtils.java:16-34): strip ``#fragment``, strip ``www.`` after
    the scheme, strip ONE trailing slash."""
    if url is None:
        return ""
    u = url.strip()
    hash_idx = u.find("#")
    if hash_idx >= 0:
        u = u[:hash_idx]
    for scheme in ("http://", "https://"):
        prefix = scheme + "www."
        if u.startswith(prefix):
            u = scheme + u[len(prefix):]
            break
    if u.endswith("/"):
        u = u[:-1]
    return u


def extract_path(url: str, site_url: str) -> str:
    """M5 (UrlUtils.java:36-41): normalized url minus normalized site-url
    prefix; ``"/"`` if the remainder is empty."""
    nu, ns = normalize_url(url), normalize_url(site_url)
    path = nu[len(ns):] if nu.startswith(ns) else nu
    return path if path else "/"


def extract_site_name(url: str) -> str:
    """M6 (UrlUtils.java:43-60): host minus ``www.``, first dot-label,
    capitalized."""
    u = normalize_url(url)
    for scheme in ("http://", "https://"):
        if u.startswith(scheme):
            u = u[len(scheme):]
            break
    if u.startswith("www."):
        u = u[4:]
    host = u.split("/", 1)[0]
    label = host.split(".", 1)[0]
    return label[:1].upper() + label[1:] if label else ""


def build_full_url(site_url: str, path: str | None) -> str:
    """M11 (SearchServiceImpl.java:209-237): site url ⊕ path with slash
    de-duplication; absolute urls in ``path`` pass through trimmed; empty
    path yields the site url with a trailing slash ensured."""
    trimmed = (path or "").strip()
    if trimmed.startswith("http://") or trimmed.startswith("https://"):
        return trimmed
    base = site_url or ""
    if not trimmed:
        return base if base.endswith("/") else base + "/"
    if not base.endswith("/") and not trimmed.startswith("/"):
        return base + "/" + trimmed
    if base.endswith("/") and trimmed.startswith("/"):
        return base + trimmed[1:]
    return base + trimmed


def normalize_url_batch(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized M4 for ``map_batches`` projections."""
    vals = urls.to_pylist()
    return pa.array([normalize_url(v) for v in vals], type=pa.string())


def site_of_url(url: str, site_urls: list[str]) -> int:
    """Map a normalized url to the site whose normalized root prefixes it
    (IndexingServiceImpl.java:183-195 semantics); -1 when none matches."""
    nu = normalize_url(url)
    for i, root in enumerate(site_urls):
        if nu.startswith(normalize_url(root)):
            return i
    return -1


def site_ids_for_urls(urls: list[str], site_urls: list[str]) -> np.ndarray:
    norm_roots = [normalize_url(r) for r in site_urls]
    out = np.full(len(urls), -1, dtype=np.int32)
    for i, u in enumerate(urls):
        nu = normalize_url(u)
        for sid, root in enumerate(norm_roots):
            if nu.startswith(root):
                out[i] = sid
                break
    return out
