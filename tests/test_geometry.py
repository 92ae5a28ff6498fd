"""HTTP geometry provider against a local fake Directions server:
success shape, retry-then-success, and retries-exhausted → empty
waypoints surviving the full enrichment path."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from citibike_deep_dive_spark.operators.geometry import http_geometry_provider

SHAPE = [[-73.99, 40.75], [-73.993, 40.75], [-73.996, 40.75]]


@pytest.fixture()
def directions_server():
    """Fake Mapbox Directions endpoint. ``fail_first[n]`` makes the next n
    requests 500 before succeeding (retry exercise)."""
    state = {"fail_next": 0, "hits": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            state["hits"] += 1
            if state["fail_next"] > 0:
                state["fail_next"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps(
                {"routes": [{"geometry": {"coordinates": SHAPE}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", state
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_provider_fetches_shape(directions_server):
    url, state = directions_server
    provider = http_geometry_provider(url, access_token="tok", backoff=0)
    shape = provider(40.75, -73.99, 40.75, -73.996)
    assert shape == SHAPE
    assert state["hits"] == 1


def test_provider_retries_then_succeeds(directions_server):
    url, state = directions_server
    state["fail_next"] = 2
    provider = http_geometry_provider(url, max_retries=3, backoff=0)
    assert provider(40.75, -73.99, 40.75, -73.996) == SHAPE
    assert state["hits"] == 3


def test_provider_exhausted_returns_empty(directions_server):
    url, state = directions_server
    state["fail_next"] = 99
    provider = http_geometry_provider(url, max_retries=3, backoff=0)
    assert provider(40.75, -73.99, 40.75, -73.996) == []
    assert state["hits"] == 3  # exactly max_retries attempts


def test_enrichment_with_http_provider_and_failures(directions_server, spark):
    """Full mapInPandas enrichment using the HTTP provider; a failing
    provider yields rows with EMPTY waypoints, not dropped rows."""
    from citibike_deep_dive_spark.operators.tripsmap import (
        enrich_routes,
        top_trips,
        trip_aggregate,
    )
    from tests.test_operators import clean_trips

    url, state = directions_server
    top = top_trips(trip_aggregate(clean_trips(spark)), k=2)

    ok = http_geometry_provider(url, backoff=0)
    rows = enrich_routes(top, ok).collect()
    assert rows and all(len(r.waypoints) >= 3 for r in rows)
    # multi-segment shape went through densify (first point = shape start)
    assert rows[0].waypoints[0].coordinates == [
        round(SHAPE[0][0], 5), round(SHAPE[0][1], 5)
    ]

    state["fail_next"] = 10**6
    failing = http_geometry_provider(url, max_retries=2, backoff=0)
    rows = enrich_routes(top, failing).collect()
    assert rows and all(r.waypoints == [] for r in rows)
