"""S7 — annotation HTTP server (≙ pikes-tintop PipelineServer,
pikes-tintop/.../server/PipelineServer.java:25-80 and its handlers:
``/naf`` NafHandler, ``/text2rdf`` TriplesHandler, ``/json``
JsonHandler — each runs text2naf + the RDF extractor on one request).

The Ray-native deployment story for a long-lived service is N stateless
replicas behind any HTTP load balancer, each holding the pinned rule
model (the same per-process cache the batch path uses) — per-request
annotation is single-document CPU work, so there is nothing for Ray to
schedule; the batch engine stays the 100-TB path and this server is the
interactive/debugging front end.  Implemented on the stdlib
``http.server`` (threaded) with zero Ray dependency.

Endpoints (GET with ``?text=`` or POST with a ``text=`` form body /
raw body):

- ``/json``     → annotation layers as JSON (tokens/entities/…)
- ``/triples``  → the single-document graph as N-Triples lines
- ``/naf``      → NAF-style XML (same shape as the S6 sink)
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa

from pikes_ray.schema import TRANSCRIPT_SCHEMA


def _annotate_text(text: str) -> dict:
    """One document through normalize+annotate+filter (no Ray)."""
    from pikes_ray.stages.annotate import RuleAnnotator
    from pikes_ray.stages.filter import FilterConfig, filter_document

    model = _MODEL_CACHE.setdefault("model", RuleAnnotator())
    ann = model.annotate(text)
    return filter_document(ann, _MODEL_CACHE.setdefault(
        "cfg", FilterConfig()))


_MODEL_CACHE: dict = {}


def _triples_table(text: str, doc_id: str = "http") -> pa.Table:
    from pikes_ray.stages.fused import KGStage

    stage = _MODEL_CACHE.setdefault("stage", KGStage())
    row = [{"conv_id": doc_id, "turn_idx": 0, "role": "user", "text": text,
            "tool": "", "ts": dt.datetime(2020, 1, 1)}]
    return stage(pa.Table.from_pylist(row, schema=TRANSCRIPT_SCHEMA))


def render_ntriples(text: str) -> str:
    from pikes_ray.sources.sinks import format_ntriples

    lines = format_ntriples(_triples_table(text))["text"].to_pylist()
    return "\n".join(lines) + ("\n" if lines else "")


def render_json(text: str) -> str:
    return json.dumps(_annotate_text(text), default=str)


def render_naf(text: str) -> str:
    from xml.sax.saxutils import escape, quoteattr

    ann = _annotate_text(text)
    toks, ents, prds = ann["tokens"], ann["entities"], ann["predicates"]
    buf = ['<NAF xml:lang="en" version="v3">',
           f"<raw>{escape(text)}</raw>", "<text>"]
    for i, t in enumerate(toks):
        buf.append(f'<wf id="w{i}" offset="{t["offset"]}" '
                   f'length="{t["length"]}" sent="{t["sent"]}">'
                   f'{escape(t["form"])}</wf>')
    buf.append("</text><terms>")
    for i, t in enumerate(toks):
        buf.append(f'<term id="t{i}" lemma={quoteattr(t["lemma"])} '
                   f'pos={quoteattr(t["pos"])} '
                   f'morphofeat={quoteattr(t["morphofeat"])}/>')
    buf.append("</terms><entities>")
    for k, e in enumerate(ents):
        targets = "".join(f'<target id="t{j}"/>'
                          for j in range(e["start"], e["end"]))
        buf.append(f'<entity id="e{k}" type={quoteattr(e["etype"] or "MISC")}>'
                   f"<references><span>{targets}</span></references></entity>")
    buf.append("</entities><srl>")
    for k, p in enumerate(prds):
        roles = "".join(
            f'<role id="r{k}_{m}" semRole={quoteattr(r["sem_role"])}>'
            f'<span><target id="t{r["head"]}"/></span></role>'
            for m, r in enumerate(p["roles"]))
        buf.append(f'<predicate id="pr{k}"><externalRef reference='
                   f'{quoteattr(p["sense"] or "")}/>'
                   f'<span><target id="t{p["head"]}"/></span>{roles}</predicate>')
    buf.append("</srl></NAF>")
    return "".join(buf)


_ROUTES = {
    "/json": (render_json, "application/json"),
    "/triples": (render_ntriples, "application/n-triples"),
    "/naf": (render_naf, "application/xml"),
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):      # quiet test output
        pass

    def _text_from_request(self) -> str | None:
        q = parse_qs(urlparse(self.path).query)
        if "text" in q:
            return q["text"][0]
        length = int(self.headers.get("Content-Length") or 0)
        if length:
            body = self.rfile.read(length).decode("utf-8", "replace")
            form = parse_qs(body)
            if "text" in form:
                return form["text"][0]
            return body
        return None

    def _serve(self):
        path = urlparse(self.path).path
        route = _ROUTES.get(path)
        if route is None:
            self.send_error(404, "unknown endpoint")
            return
        text = self._text_from_request()
        if not text:
            self.send_error(400, "missing ?text= or request body")
            return
        try:
            payload = route[0](text).encode("utf-8")
        except Exception as exc:    # quarantine semantics: report, not die
            self.send_error(500, f"annotation failed: {exc}")
            return
        self.send_response(200)
        self.send_header("Content-Type", route[1] + "; charset=utf-8")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    do_GET = _serve
    do_POST = _serve


class PipelineServer:
    """``with PipelineServer(port=0) as url: …`` — threaded HTTP server."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = ThreadingHTTPServer((host, port), _Handler)
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    @property
    def url(self) -> str:
        h, p = self._srv.server_address[:2]
        return f"http://{h}:{p}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()


def main():                                       # pragma: no cover
    import sys

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8011
    srv = PipelineServer(port=port)
    with srv as url:
        print(f"pikes_ray server on {url} (endpoints: /json /triples /naf)")
        threading.Event().wait()


if __name__ == "__main__":                        # pragma: no cover
    main()
