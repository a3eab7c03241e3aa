"""Remote byte-range IO for the in-house readers (SURVEY §2.1 S8/S10/S11).

The reference consumes COGs on object storage through GDAL's VSI layer
with HTTP retry configuration (reference odc/stac/loader/_rio.py:374-475;
retry env GDAL_HTTP_MAX_RETRY / GDAL_HTTP_RETRY_DELAY at _rio.py:65-69).
This module is the engine-native equivalent: every in-house reader
(sources/geotiff.py, operators/jp2.py, sources/netcdf.py,
sources/hdf5.py) performs its header scans and per-tile/per-chunk
fetches through :func:`range_open` / :func:`fetch_range`, which dispatch
on the URI scheme:

- local path / ``file://``  → plain filesystem (zero-overhead fast path)
- ``http(s)://``            → one HTTP GET with a ``Range:`` header per
  fetch, retried with the reference's policy (default 10 tries, 0.5 s
  base delay, exponential backoff capped at 10 s; override via
  ``ODC_STAC_SPARK_HTTP_MAX_RETRY`` / ``ODC_STAC_SPARK_HTTP_RETRY_DELAY``
  — the GDAL knobs' counterparts). Servers that ignore ``Range`` (200
  instead of 206) still work: the full body is sliced, cached for the
  source's lifetime, and counted so tests can assert the fallback.
- ``s3://``                 → botocore ``get_object`` with a ``Range``
  parameter; region/credentials come from the executor-side settings
  installed by :func:`odc_stac_spark.sources.aws.configure_s3_access`
  (synth._ENV["aws"]), falling back to the ambient botocore chain.
  Unsigned mode uses botocore's UNSIGNED signer. Clients are cached
  per executor process (the reference's thread-local GDAL session
  reuse, loader/_rio.py:126-176).

Spark-first scale shape: readers ship URL *strings* in the task closure,
never live handles; each executor materializes sources lazily on first
fetch. A window read touches only the byte ranges of intersecting
tiles/chunks, so executor memory and network bytes are bounded by the
request, never the file size — the COG access discipline at 100 TB.

The file-like wrapper (:class:`RangeFile`) optionally block-caches
(default 256 KiB blocks, small per-handle LRU) so chatty consumers —
the HDF5 B-tree walk does many sub-KB reads — coalesce into a few
ranged GETs instead of hundreds.
"""

from __future__ import annotations

import http.client
import io
import os
import time
import urllib.error
import urllib.request
from typing import Dict, Optional, Tuple
from urllib.parse import urlparse


class RangeIOError(IOError):
    """A ranged fetch failed permanently (after retries)."""


def _max_retry() -> int:
    return int(os.environ.get("ODC_STAC_SPARK_HTTP_MAX_RETRY", "10"))


def _retry_delay() -> float:
    return float(os.environ.get("ODC_STAC_SPARK_HTTP_RETRY_DELAY", "0.5"))


def is_remote(url: str) -> bool:
    return urlparse(url).scheme in ("http", "https", "s3")


# ---------------------------------------------------------------------------
# sources


class RangeSource:
    """One readable object addressed by URL. ``read_range`` clips at EOF
    (short result, never an error) the way ``file.read`` does."""

    url: str

    def size(self) -> int:
        raise NotImplementedError

    def read_range(self, offset: int, n: int) -> bytes:
        raise NotImplementedError

    def read_all(self) -> bytes:
        return self.read_range(0, self.size())

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class LocalRange(RangeSource):
    def __init__(self, path: str):
        u = urlparse(path)
        self.url = path
        self._path = u.path if u.scheme == "file" else path
        self._size: Optional[int] = None

    def size(self) -> int:
        if self._size is None:
            self._size = os.path.getsize(self._path)
        return self._size

    def read_range(self, offset: int, n: int) -> bytes:
        with open(self._path, "rb") as f:
            f.seek(offset)
            return f.read(n)

    def read_all(self) -> bytes:
        with open(self._path, "rb") as f:
            return f.read()


def _retrying(fn, url: str, what: str):
    """Run ``fn()`` under the reference's retry policy: retry transport
    errors and 5xx/429 up to max_retry times with exponential backoff;
    4xx other than 429 are permanent (a 404 never heals)."""
    tries = _max_retry()
    delay = _retry_delay()
    last: Optional[Exception] = None
    for attempt in range(max(1, tries)):
        if attempt > 0:
            time.sleep(min(delay * (2 ** (attempt - 1)), 10.0))
        try:
            return fn()
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in (429, 500, 502, 503, 504):
                err = RangeIOError(f"{what} {url}: HTTP {e.code} {e.reason}")
                err.code = e.code  # definitive status, lets callers skip fallbacks
                raise err from e
        except RangeIOError:
            # Permanent protocol verdicts (no Content-Length, 206 without a
            # Content-Range total) — RangeIOError subclasses OSError, so
            # without this clause they'd be retried with full backoff below.
            raise
        except (
            urllib.error.URLError,
            http.client.HTTPException,  # IncompleteRead/RemoteDisconnected mid-body
            ConnectionError,
            TimeoutError,
            OSError,
        ) as e:
            last = e
    raise RangeIOError(f"{what} {url}: failed after {tries} attempts: {last}") from last


class HttpRange(RangeSource):
    """Ranged HTTP(S) reads via urllib. Tolerates servers without Range
    support (200 full-body responses are sliced and the body cached).
    ``timeout`` guards each request so a dead server fails a Spark task
    instead of hanging it."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout
        self._size: Optional[int] = None
        self._full_body: Optional[bytes] = None  # 200-fallback cache
        self.n_requests = 0  # observable for tests / perf counters
        self.n_full_fallbacks = 0

    def _request(self, headers: Dict[str, str]):
        req = urllib.request.Request(self.url, headers=headers)
        self.n_requests += 1
        return urllib.request.urlopen(req, timeout=self.timeout)

    def size(self) -> int:
        if self._size is None:
            if self._full_body is not None:
                self._size = len(self._full_body)
                return self._size

            def head():
                req = urllib.request.Request(self.url, method="HEAD")
                self.n_requests += 1
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    cl = resp.headers.get("Content-Length")
                    if cl is None:
                        raise RangeIOError(
                            f"HEAD {self.url}: no Content-Length in response"
                        )
                    return int(cl)

            try:
                self._size = _retrying(head, self.url, "HEAD")
            except RangeIOError as e:
                # GET-only endpoints (presigned S3/Azure URLs, servers
                # rejecting HEAD) still support ranged GETs: probe with
                # bytes=0-0 and learn the size from the Content-Range
                # total; 200-fallback servers hand us the whole body,
                # which read_range caches anyway. A definitive "object
                # does not exist" verdict is NOT a HEAD-support problem —
                # a GET would 404 identically, so surface it instead of
                # probing redundantly. 401/403 stay on the fallback path:
                # method-scoped auth (URLs presigned for GET only)
                # legitimately 403s HEAD while the GET succeeds.
                if getattr(e, "code", None) in (404, 410):
                    raise
                self._size = _retrying(self._probe_size, self.url, "GET probe")
        return self._size

    def _probe_size(self) -> int:
        resp = self._request({"Range": "bytes=0-0"})
        with resp:
            body = resp.read()
            status = getattr(resp, "status", resp.getcode())
            if status == 206:
                cr = resp.headers.get("Content-Range", "")
                if "/" in cr and not cr.endswith("/*"):
                    return int(cr.rsplit("/", 1)[1])
                raise RangeIOError(
                    f"GET probe {self.url}: 206 without Content-Range total"
                )
            # server ignored Range: full body in hand — cache it
            self._full_body = body
            self.n_full_fallbacks += 1
            return len(body)

    def read_range(self, offset: int, n: int) -> bytes:
        if n <= 0:
            return b""
        if self._full_body is not None:
            return self._full_body[offset : offset + n]

        def get():
            try:
                resp = self._request({"Range": f"bytes={offset}-{offset + n - 1}"})
            except urllib.error.HTTPError as e:
                if e.code == 416:  # requested range entirely past EOF
                    return b""
                raise
            with resp:
                body = resp.read()
                status = getattr(resp, "status", resp.getcode())
                if status == 206:
                    cr = resp.headers.get("Content-Range", "")
                    if "/" in cr and not cr.endswith("/*"):
                        self._size = int(cr.rsplit("/", 1)[1])
                    return body
                # server ignored Range: cache the full body, slice it
                self._full_body = body
                self._size = len(body)
                self.n_full_fallbacks += 1
                return body[offset : offset + n]

        return _retrying(get, self.url, "GET")


class S3Range(RangeSource):
    """Ranged S3 reads via botocore ``get_object``. Settings resolution
    order: injected client (tests) → executor-env settings installed by
    ``configure_s3_access`` → ambient botocore chain. Unsigned mode maps
    to botocore's UNSIGNED signature (reference _aws.py:147-156)."""

    def __init__(self, url: str, client=None):
        u = urlparse(url)
        self.url = url
        self.bucket = u.netloc
        self.key = u.path.lstrip("/")
        self._client = client
        self._size: Optional[int] = None
        self._extra: Optional[Dict[str, str]] = None

    def _ensure_extra(self) -> Dict[str, str]:
        if self._extra is None:
            self._extra = (
                {"RequestPayer": "requester"}
                if self._settings().get("requester_pays")
                else {}
            )
        return self._extra

    def _settings(self) -> Dict:
        from .synth import _ENV

        return _ENV.get("aws") or {}

    def _get_client(self):
        if self._client is not None:
            return self._client
        try:
            import botocore.session
            from botocore import UNSIGNED
            from botocore.config import Config
        except ImportError as e:  # pragma: no cover - botocore present here
            raise RangeIOError(
                f"s3:// reads need botocore, which is not installed "
                f"(url: {self.url}); install botocore or configure an "
                f"http(s) endpoint"
            ) from e
        s = self._settings()
        key = (
            s.get("region_name"),
            bool(s.get("aws_unsigned")),
            s.get("aws_access_key_id"),
        )
        cached = _S3_CLIENTS.get(key)
        if cached is not None:
            self._client = cached
            return cached
        session = botocore.session.Session()
        kwargs: Dict = {}
        if s.get("region_name"):
            kwargs["region_name"] = s["region_name"]
        if s.get("aws_unsigned"):
            kwargs["config"] = Config(
                signature_version=UNSIGNED,
                retries={"max_attempts": _max_retry(), "mode": "standard"},
            )
        else:
            kwargs["config"] = Config(
                retries={"max_attempts": _max_retry(), "mode": "standard"}
            )
            if s.get("aws_access_key_id"):
                kwargs["aws_access_key_id"] = s["aws_access_key_id"]
                kwargs["aws_secret_access_key"] = s.get("aws_secret_access_key")
                if s.get("aws_session_token"):
                    kwargs["aws_session_token"] = s["aws_session_token"]
        client = session.create_client("s3", **kwargs)
        _S3_CLIENTS[key] = client
        self._client = client
        return client

    def size(self) -> int:
        if self._size is None:
            c = self._get_client()
            extra = self._ensure_extra()

            def head():
                resp = c.head_object(Bucket=self.bucket, Key=self.key, **extra)
                return int(resp["ContentLength"])

            self._size = _retrying(head, self.url, "HEAD")
        return self._size

    def read_range(self, offset: int, n: int) -> bytes:
        if n <= 0:
            return b""
        c = self._get_client()
        extra = self._ensure_extra()

        def get():
            try:
                resp = c.get_object(
                    Bucket=self.bucket,
                    Key=self.key,
                    Range=f"bytes={offset}-{offset + n - 1}",
                    **extra,
                )
            except Exception as e:
                code = getattr(e, "response", {}).get("Error", {}).get("Code", "")
                if code in ("InvalidRange",):
                    return b""
                raise
            cr = resp.get("ContentRange", "")
            if "/" in cr and not cr.endswith("/*"):
                self._size = int(cr.rsplit("/", 1)[1])
            body = resp["Body"].read()
            return body

        return _retrying(get, self.url, "GET")


# per-executor-process client cache (reference session-reuse pattern)
_S3_CLIENTS: Dict[Tuple, object] = {}


def open_range(url: str, **kwargs) -> RangeSource:
    """URL → RangeSource, dispatched on scheme."""
    scheme = urlparse(url).scheme
    if scheme in ("http", "https"):
        return HttpRange(url, **kwargs)
    if scheme == "s3":
        return S3Range(url, **kwargs)
    if scheme in ("", "file"):
        return LocalRange(url)
    raise RangeIOError(f"unsupported URL scheme {scheme!r}: {url}")


# ---------------------------------------------------------------------------
# file-like wrapper


class RangeFile:
    """Seek/read file protocol over a RangeSource, with an optional
    block cache (rounded fetches, LRU) so sub-KB metadata walks over
    HTTP/S3 coalesce into a few ranged GETs. Local sources bypass the
    cache entirely (the OS page cache already does this job)."""

    def __init__(
        self,
        src: RangeSource,
        block_size: int = 256 * 1024,
        max_blocks: int = 64,
    ):
        self._src = src
        self._pos = 0
        self._block_size = block_size
        self._max_blocks = max_blocks
        self._cache: "Dict[int, bytes]" = {}  # block index → bytes (LRU by dict order)
        self._use_cache = not isinstance(src, LocalRange) and block_size > 0

    @property
    def name(self) -> str:
        return self._src.url

    def _block(self, idx: int) -> bytes:
        blk = self._cache.get(idx)
        if blk is not None:
            # refresh recency
            del self._cache[idx]
            self._cache[idx] = blk
            return blk
        blk = self._src.read_range(idx * self._block_size, self._block_size)
        if len(self._cache) >= self._max_blocks:
            self._cache.pop(next(iter(self._cache)))
        self._cache[idx] = blk
        return blk

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = max(0, self._src.size() - self._pos)
        if n == 0:
            return b""
        if not self._use_cache:
            out = self._src.read_range(self._pos, n)
            self._pos += len(out)
            return out
        bs = self._block_size
        first, last = self._pos // bs, (self._pos + n - 1) // bs
        parts = []
        for idx in range(first, last + 1):
            blk = self._block(idx)
            lo = self._pos - idx * bs if idx == first else 0
            hi = min(len(blk), self._pos + n - idx * bs)
            if lo < hi:
                parts.append(blk[lo:hi])
            if len(blk) < bs:
                break  # EOF block
        out = b"".join(parts)
        self._pos += len(out)
        return out

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            self._pos = offset
        elif whence == io.SEEK_CUR:
            self._pos += offset
        elif whence == io.SEEK_END:
            self._pos = self._src.size() + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if self._pos < 0:
            raise ValueError("negative seek position")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def close(self) -> None:
        self._cache.clear()
        self._src.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def range_open(url: str, block_size: int = 256 * 1024, max_blocks: int = 64):
    """``open(path, "rb")`` drop-in for any supported URL. Local paths
    return a real file object (fast path); remote URLs return a
    block-cached :class:`RangeFile`."""
    scheme = urlparse(url).scheme
    if scheme in ("", "file"):
        u = urlparse(url)
        return open(u.path if scheme == "file" else url, "rb")
    return RangeFile(open_range(url), block_size=block_size, max_blocks=max_blocks)


def put_bytes(url: str, data: bytes) -> None:
    """Upload one complete object — the write half of the remote story
    (COG/Zarr-chunk sinks build each object fully in executor memory, so
    a single PUT per object is the natural shape; S3 multipart only pays
    off past ~100 MB, far above a tile/chunk). Local paths create parent
    directories; ``s3://`` uses botocore ``put_object`` with the same
    cached clients/credentials as the read path; ``http(s)://`` issues a
    retried PUT (presigned-URL / WebDAV style)."""
    scheme = urlparse(url).scheme
    if scheme in ("", "file"):
        path = urlparse(url).path if scheme == "file" else url
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        return
    if scheme == "s3":
        src = S3Range(url)
        c = src._get_client()
        extra = src._ensure_extra()

        def put():
            c.put_object(Bucket=src.bucket, Key=src.key, Body=data, **extra)

        _retrying(put, url, "PUT")
        _SOURCES.pop(url, None)  # cached reads of the old object are stale
        return
    if scheme in ("http", "https"):

        def put():
            req = urllib.request.Request(url, data=data, method="PUT")
            with urllib.request.urlopen(req, timeout=60.0) as resp:
                status = getattr(resp, "status", resp.getcode())
                if status not in (200, 201, 204):
                    raise RangeIOError(f"PUT {url}: HTTP {status}")

        _retrying(put, url, "PUT")
        _SOURCES.pop(url, None)
        return
    raise RangeIOError(f"unsupported URL scheme {scheme!r}: {url}")


# per-executor-process source reuse for the per-tile hot path: repeated
# fetches against one object share its learned size and 200-fallback body
# cache instead of re-probing (bounded: small LRU of stateful handles —
# the reference's session-reuse pattern again)
_SOURCES: Dict[str, RangeSource] = {}
_SOURCES_CAP = 32


def fetch_range(url: str, offset: int, n: int) -> bytes:
    """One-shot ranged fetch — the per-tile/per-chunk hot path. Local
    files open/seek/read; remote URLs issue one ranged GET against a
    per-process cached source."""
    scheme = urlparse(url).scheme
    if offset < 0 or n < 0:
        raise ValueError(f"fetch_range: invalid range [{offset}, {offset}+{n})")
    if scheme in ("", "file"):
        u = urlparse(url)
        with open(u.path if scheme == "file" else url, "rb") as f:
            # clamp to the file extent: a corrupt offset/bytecount from a
            # parsed header must yield a short read (typed error
            # downstream), never an n-byte pre-allocation (fuzz finding)
            f.seek(0, 2)
            n = min(n, max(0, f.tell() - offset))
            f.seek(offset)
            return f.read(n)
    src = _SOURCES.get(url)
    if src is None:
        if len(_SOURCES) >= _SOURCES_CAP:
            _SOURCES.pop(next(iter(_SOURCES)))
        src = open_range(url)
        _SOURCES[url] = src
    else:
        del _SOURCES[url]
        _SOURCES[url] = src  # refresh LRU recency
    return src.read_range(offset, n)
