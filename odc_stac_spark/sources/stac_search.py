"""Live STAC API ``/search`` client (SURVEY §2.1 S16, the live half).

The reference drives searches through pystac-client
(``bench/_prepare.py:36-85``: ``Client.open(api)`` → ``cat.search(...)``
→ ``get_all_items_as_dict()``). This is the same protocol surface,
self-contained: paged POST ``{api}/search`` requests following the STAC
API ``next`` link relation, with the transport injectable so the client
is fully testable against golden page fixtures without network access.

Pagination per the STAC API Item Search spec: each page is a GeoJSON
FeatureCollection whose ``links`` may carry ``rel: next``. A next link
either repeats the POST with a new ``body`` (optionally ``merge``-ing
into the previous body) or is a plain GET href (token pagination).

Spark-first shape: the driver pages the catalog (metadata plane, ~KB per
item), then hands the accumulated dicts to
``stac_items.stac_dicts_to_items`` — ONE code path with the at-scale
JSON/geoparquet scans. For catalogs too large to page on the driver,
dump pages to storage and use ``read_stac_api_dump`` (a distributed
scan); this client is the interactive/bounded path, like the reference.

HTTP retry mirrors the reference's GDAL env knobs
(``loader/_rio.py:65-69``) via the shared rangeio policy.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Callable, Dict, Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession

from .rangeio import _retrying

# transport: (method, url, json_body_or_None) -> parsed JSON dict
Transport = Callable[[str, str, Optional[dict]], dict]


def _urllib_transport(timeout: float = 60.0) -> Transport:
    def call(method: str, url: str, body: Optional[dict]) -> dict:
        def go():
            data = None
            headers = {"Accept": "application/geo+json"}
            if body is not None:
                data = json.dumps(body).encode("utf-8")
                headers["Content-Type"] = "application/json"
            req = urllib.request.Request(url, data=data, headers=headers, method=method)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))

        return _retrying(go, url, method)

    return call


class StacSearchClient:
    """Paged STAC API item search.

    >>> client = StacSearchClient("https://earth-search.aws.element84.com/v1")
    >>> items = list(client.search(collections=["sentinel-2-l2a"],
    ...                            bbox=[27.34, -14.98, 27.56, -7.71],
    ...                            datetime="2020-06-06", max_items=100))

    ``transport`` (tests) replaces the network: any callable
    ``(method, url, body) -> response dict``.
    """

    def __init__(
        self,
        api_url: str,
        transport: Optional[Transport] = None,
        timeout: float = 60.0,
    ):
        self.api_url = api_url.rstrip("/")
        self.transport = transport or _urllib_transport(timeout)

    @property
    def search_url(self) -> str:
        return f"{self.api_url}/search"

    def search_pages(
        self,
        collections: Optional[List[str]] = None,
        bbox: Optional[List[float]] = None,
        datetime: Optional[str] = None,
        intersects: Optional[dict] = None,
        query: Optional[dict] = None,
        ids: Optional[List[str]] = None,
        limit: int = 100,
        max_items: Optional[int] = None,
    ) -> Iterator[dict]:
        """Yield raw FeatureCollection pages. The last page may be
        truncated client-side to honor ``max_items`` exactly."""
        body: Dict[str, Any] = {"limit": limit}
        if collections:
            body["collections"] = list(collections)
        if bbox is not None:
            body["bbox"] = list(bbox)
        if datetime is not None:
            body["datetime"] = datetime
        if intersects is not None:
            body["intersects"] = intersects
        if query:
            body["query"] = query
        if ids:
            body["ids"] = list(ids)

        method, url, payload = "POST", self.search_url, body
        n_seen = 0
        while True:
            page = self.transport(method, url, payload)
            feats = page.get("features") or []
            if max_items is not None and n_seen + len(feats) > max_items:
                page = dict(page, features=feats[: max_items - n_seen])
                feats = page["features"]
            n_seen += len(feats)
            if feats:
                yield page
            if max_items is not None and n_seen >= max_items:
                return
            nxt = next(
                (l for l in page.get("links") or [] if l.get("rel") == "next"), None
            )
            if nxt is None or not feats:
                return
            url = nxt.get("href") or self.search_url
            next_method = (nxt.get("method") or "GET").upper()
            if next_method == "POST":
                nbody = nxt.get("body") or {}
                payload = {**payload, **nbody} if nxt.get("merge") else (nbody or payload)
                method = "POST"
            else:
                method, payload = "GET", None

    def search(self, **kwargs) -> Iterator[dict]:
        """Yield item dicts (the pystac-client ``items_as_dicts`` shape)."""
        for page in self.search_pages(**kwargs):
            yield from page["features"]

    def search_to_dump(self, **kwargs) -> dict:
        """One FeatureCollection with all matched features + the query
        echoed under ``properties`` — byte-compatible with the reference's
        ``dump_site`` output (bench/_prepare.py:62-73), so the result
        feeds ``read_stac_api_dump``/``stac_featurecollection_to_items``
        unchanged."""
        feats = list(self.search(**kwargs))
        return {
            "type": "FeatureCollection",
            "features": feats,
            "properties": {"api": self.search_url, "search": dict(kwargs)},
        }


def search_items(
    spark: SparkSession,
    api_url_or_client,
    transport: Optional[Transport] = None,
    **search: Any,
) -> DataFrame:
    """Search a STAC API and land the results as ITEM_SCHEMA rows — the
    live-search analog of ``read_stac_api_dump``."""
    from .stac_items import stac_dicts_to_items

    client = (
        api_url_or_client
        if isinstance(api_url_or_client, StacSearchClient)
        else StacSearchClient(api_url_or_client, transport=transport)
    )
    return stac_dicts_to_items(spark, client.search(**search))
