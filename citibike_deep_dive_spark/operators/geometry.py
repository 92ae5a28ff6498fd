"""Optional HTTP geometry provider (Mapbox-Directions-shaped).

Reference: citibike_data_process/table_updating/update_tripsmap.py:21,121-155
— cycling-directions GET per route with geometries=geojson, an access
token, 3 attempts with 2**attempt backoff, and an EMPTY shape once
retries are exhausted (the row still lands, with no waypoints).

The engine's data path stays network-free: the default provider in
operators/tripsmap.py is the deterministic offline one. This module is
the production plug-in for the injectable ``GeometryProvider`` hook —
constructed per driver, passed to ``enrich_routes``/``run_pipeline``.
Enrichment runs only on the top-k-per-year gate's ~30×years rows, so
driver-side HTTP with a small retry loop is the right cost model; there
is deliberately no HTTP from executors.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from ..sources.remote import HttpGet, get_with_retries

# The reference's URL template (update_tripsmap.py:21), host configurable.
DIRECTIONS_PATH = "/directions/v5/mapbox/cycling/{from_lon},{from_lat};{to_lon},{to_lat}"


def http_geometry_provider(
    base_url: str,
    access_token: str = "",
    http_get: HttpGet | None = None,
    max_retries: int = 3,
    backoff: float = 2.0,
) -> Callable[[float, float, float, float], list[list[float]]]:
    """Build a ``GeometryProvider`` that fetches route shapes over HTTP.

    Matches the reference request_trip_shape contract exactly:
    - GET {base_url}/directions/v5/mapbox/cycling/{lon1},{lat1};{lon2},{lat2}
      with geometries=geojson [+ access_token] (update_tripsmap.py:121-136),
    - ``max_retries`` attempts, ``backoff ** attempt`` sleep between them,
    - shape = routes[0].geometry.coordinates ([lon, lat] pairs),
    - EMPTY list after the final failure — the route row is still
      produced, just with no waypoints (update_tripsmap.py:148-153).
    """

    def provider(
        lat1: float, lon1: float, lat2: float, lon2: float
    ) -> list[list[float]]:
        path = DIRECTIONS_PATH.format(
            from_lon=lon1, from_lat=lat1, to_lon=lon2, to_lat=lat2
        )
        url = base_url.rstrip("/") + path + "?geometries=geojson"
        if access_token:
            url += f"&access_token={access_token}"
        try:
            body = get_with_retries(url, http_get, max_retries, backoff)
        except Exception:
            return []  # retries exhausted → no shape (reference :152-153)
        data = json.loads(body)
        return [list(c) for c in data["routes"][0]["geometry"]["coordinates"]]

    return provider
