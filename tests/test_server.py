"""S7 — annotation HTTP server (sources/server.py). No Ray needed."""

import json
import urllib.parse
import urllib.request

import pytest

from pikes_ray.sources.server import PipelineServer


@pytest.fixture(scope="module")
def server_url():
    with PipelineServer() as url:
        yield url


def _get(url: str) -> tuple[int, str]:
    with urllib.request.urlopen(url) as r:
        return r.status, r.read().decode("utf-8")


def test_json_endpoint(server_url):
    q = urllib.parse.quote("Alice Johnson met Bob Smith in Paris.")
    status, body = _get(f"{server_url}/json?text={q}")
    assert status == 200
    ann = json.loads(body)
    assert {"tokens", "entities", "predicates"} <= set(ann)
    forms = [t["form"] for t in ann["tokens"]]
    assert "Alice" in forms and "Paris" in forms
    assert any(e["etype"] == "PERSON" for e in ann["entities"])


def test_triples_endpoint_post(server_url):
    data = urllib.parse.urlencode(
        {"text": "Alice Johnson met Bob Smith in Paris."}).encode()
    req = urllib.request.Request(f"{server_url}/triples", data=data)
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        body = r.read().decode("utf-8")
    lines = [ln for ln in body.splitlines() if ln]
    assert lines and all(ln.endswith(" .") for ln in lines)
    assert any("meet.01" in ln and "premon" in ln for ln in lines)
    assert any("Paris" in ln for ln in lines)


def test_naf_endpoint(server_url):
    q = urllib.parse.quote("Acme Corp acquired Beta LLC.")
    status, body = _get(f"{server_url}/naf?text={q}")
    assert status == 200
    assert body.startswith("<NAF") and body.endswith("</NAF>")
    assert "<entity" in body and "<predicate" in body


def test_errors(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server_url}/nope?text=x")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server_url}/json")
    assert e.value.code == 400
