"""Local HTTP server that serves the synthetic web fixture as real pages —
the live-fetch twin of the web_graph/robots parquet tables.

Routing: GET /<host>/<path...> looks up "https://<host>/<path...>" in the
web-graph dict and answers with the row's status code and an HTML body
whose <a href> anchors are the row's out_links VERBATIM (document order)
plus an <img src="/img/<image_id>"> reference; GET /<host>/robots.txt
serves the robots fixture. URLs absent from the graph, and rows with
status_code 0, close the connection without a response — the fetcher must
map both to status 0 ("connection failed"), exactly like join mode.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def page_html(out_links: list[str] | None, image_id: str | None) -> str:
    anchors = "".join(f'<a href="{h}">l</a>\n' for h in (out_links or []))
    img = f'<img src="/img/{image_id}"/>' if image_id else ""
    return f"<html><head><title>t</title></head><body>{img}\n{anchors}</body></html>"


class FixtureServer:
    """graph: {url: (status_code, out_links, image_id)}; robots: {host: txt}."""

    def __init__(self, graph: dict, robots: dict | None = None,
                 robots_fail_first: dict | None = None):
        import collections

        self.graph = graph
        self.robots = robots or {}
        self.robots_hits = collections.Counter()  # host -> #robots.txt GETs
        # host -> N: the first N robots.txt GETs for that host answer 503
        # (simulates a transient outage; later GETs serve the real rules)
        self.robots_fail_first = dict(robots_fail_first or {})
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                parts = self.path.lstrip("/").split("/", 1)
                host = parts[0]
                path = "/" + (parts[1] if len(parts) > 1 else "")
                if path == "/robots.txt":
                    outer.robots_hits[host] += 1
                    if outer.robots_hits[host] <= outer.robots_fail_first.get(host, 0):
                        self.send_error(503)
                        return
                    txt = outer.robots.get(host)
                    if txt is None:
                        self.send_error(404)
                        return
                    body = txt.encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                url = f"https://{host}{path}"
                row = outer.graph.get(url)
                if row is None or row[0] == 0:
                    # connection-level failure: close without an HTTP response
                    self.close_connection = True
                    self.connection.close()
                    return
                status, out_links, image_id = row
                if status != 200:
                    self.send_error(status)  # complete error response
                    return
                body = page_html(out_links, image_id).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_port
        self.base = f"http://127.0.0.1:{self.port}"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self.httpd.shutdown()
        self.httpd.server_close()


def graph_from_parquet(spark, fixture_dir: str) -> dict:
    rows = spark.read.parquet(f"{fixture_dir}/web_graph").collect()
    return {r.url: (int(r.status_code), list(r.out_links or []), r.image_id)
            for r in rows}


def robots_from_parquet(spark, fixture_dir: str) -> dict:
    import os

    if not os.path.exists(f"{fixture_dir}/robots"):
        return {}
    rows = spark.read.parquet(f"{fixture_dir}/robots").collect()
    return {r.host: r.robots_txt for r in rows}
