"""WSGI shim binding the ported REST route table (``rest.ROUTES``) to a
real socket — the served counterpart of ``graphrag-server/src/main.rs``
(routes at ``:815-930``), on stdlib ``wsgiref`` only (no web framework
in the sandbox, and none needed: handlers are pure
``(state, request) → (status, body)`` functions, so the shim is pure
plumbing — JSON (de)serialization, path-param matching for
``/documents/{id}``, query-string parsing for ``/entities``).

Usage (tests / scripts):

    state = AppState(GraphRAG())
    srv = serve(state, port=0)            # port=0 → ephemeral
    ...HTTP against srv.server_address...
    srv.shutdown()

The server is single-threaded WSGI — correct for the integration
surface; a production deployment would mount ``make_wsgi_app(state)``
on any WSGI container unchanged.
"""

from __future__ import annotations

import json
from urllib.parse import parse_qs

from .rest import ROUTES, app_error

_INT_PARAMS = {"page", "page_size"}


def _parse_params(environ) -> dict:
    out: dict = {}
    for k, vs in parse_qs(environ.get("QUERY_STRING", "")).items():
        v = vs[-1]
        out[k] = int(v) if k in _INT_PARAMS else v
    return out


def _read_json(environ):
    try:
        n = int(environ.get("CONTENT_LENGTH") or 0)
    except ValueError:
        n = 0
    raw = environ["wsgi.input"].read(n) if n else b""
    if not raw:
        return None, app_error("bad_request", "Missing JSON body")
    try:
        return json.loads(raw), None
    except ValueError:
        return None, app_error("bad_request", "Invalid JSON body")


_STATUS = {200: "200 OK", 400: "400 Bad Request", 404: "404 Not Found",
           500: "500 Internal Server Error"}


def make_wsgi_app(state):
    """WSGI callable dispatching to ``rest.ROUTES`` handlers."""

    def app(environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/").rstrip("/") or "/"
        try:
            if (method, path) in ROUTES:
                handler = ROUTES[(method, path)]
                if method == "POST":
                    takes_body = handler.__code__.co_argcount > 1
                    if takes_body:
                        body, err = _read_json(environ)
                        status, out = err if err else handler(state, body)
                    else:                  # e.g. POST /graph/build
                        status, out = handler(state)
                elif path == "/entities":
                    status, out = handler(state, _parse_params(environ))
                else:
                    status, out = handler(state)
            elif method == "GET" and path.startswith("/documents/"):
                doc_id = path[len("/documents/"):]
                status, out = ROUTES[("GET", "/documents/{id}")](
                    state, doc_id)
            else:
                status, out = 404, {"error": f"Not found: {method} {path}"}
        except KeyError as e:                          # missing req field
            status, out = app_error("bad_request",
                                    f"Missing field: {e.args[0]}")
        except Exception as e:                         # noqa: BLE001
            status, out = app_error("internal", str(e))
        payload = json.dumps(out).encode()
        start_response(_STATUS.get(status, f"{status} Error"),
                       [("Content-Type", "application/json"),
                        ("Content-Length", str(len(payload)))])
        return [payload]

    return app


def serve(state, host: str = "127.0.0.1", port: int = 8080):
    """Bind and return a ``wsgiref`` server (caller drives
    ``serve_forever`` — typically on a thread — and ``shutdown``)."""
    from wsgiref.simple_server import WSGIRequestHandler, make_server

    class _Quiet(WSGIRequestHandler):
        def log_message(self, *a):                     # no stderr spam
            pass

    return make_server(host, port, make_wsgi_app(state),
                       handler_class=_Quiet)


def main():                                            # pragma: no cover
    import sys

    from .api import GraphRAG
    from .rest import AppState

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080
    srv = serve(AppState(GraphRAG()), port=port)
    print(f"graphrag_rs_ray server on http://127.0.0.1:{port}")
    srv.serve_forever()


if __name__ == "__main__":                             # pragma: no cover
    main()
