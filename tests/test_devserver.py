"""Dev read API vs the reference's Flask file server
(/root/reference/devserver.py:10-38): same three routes, same artifacts,
CORS header, 404s — driven over a localhost socket."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from cinescrapers_spark.cli import FIXTURE_NOW, main
from cinescrapers_spark.devserver import build_artifacts, make_server
from cinescrapers_spark.dims import cinemas_df
from cinescrapers_spark.streaming.ingest import ShowtimesStore


@pytest.fixture()
def server(spark, tmp_path):
    store_dir = str(tmp_path / "store")
    assert main(["scrape", "rio", "--store", store_dir]) == 0
    dim = cinemas_df(spark).selectExpr(
        "url as site", "shortcode as cinema_shortcode"
    ).dropDuplicates(["site"])
    store = ShowtimesStore(spark, store_dir, dim)
    art = str(tmp_path / "artifacts")
    counts = build_artifacts(store, cinemas_df(spark), art, now=FIXTURE_NOW)
    (tmp_path / "artifacts" / "thumbnails" / "x.jpg").write_bytes(b"\xff\xd8fake")
    srv = make_server(art, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, counts
    srv.shutdown()


def _get(srv, path):
    port = srv.server_address[1]
    return urllib.request.urlopen(f"http://127.0.0.1:{port}{path}")


def test_routes_and_cors(server):
    srv, counts = server
    r = _get(srv, "/cinescrapers.json")
    assert r.headers["Content-Type"] == "application/json"
    assert r.headers["Access-Control-Allow-Origin"] == "*"
    shows = json.loads(r.read())
    assert len(shows) == counts["showtimes"] > 0
    assert all("cinema_shortcode" in s for s in shows)

    cinemas = json.loads(_get(srv, "/cinemas.json").read())
    assert len(cinemas) == counts["cinemas"] == 27

    assert _get(srv, "/thumbnails/x.jpg").read() == b"\xff\xd8fake"


def test_missing_and_traversal_404(server):
    srv, _ = server
    for path in ("/nope.json", "/thumbnails/nope.jpg", "/thumbnails/../cinemas.json"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv, path)
        assert e.value.code == 404
