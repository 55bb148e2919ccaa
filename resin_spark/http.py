"""Q3 — HTTP read/write surface over SearchEngine (stdlib only).

Rebuilds the reference's HTTP endpoints on ``http.server`` (the reference
hosts ASP.NET controllers over a SessionFactory:
/root/reference/src/Sir.HttpServer/Controllers/QueryController.cs:26-55,
WriteController.cs:31-53, HttpReader.cs:38-70, HttpWriter.cs:24-36):

* ``GET /query``  — querystring search: ``collection`` (repeatable),
  ``q`` (natural-language text), ``field`` (repeatable, default
  ``text``), ``select`` (repeatable), ``AND``/``OR`` flag keys, ``take``
  (default 100, HttpReader.cs:40) and ``skip``.  The flag-to-operator
  rule is the reference's verbatim: AND -> "and", else OR -> "or", else
  "not" (QueryParser.cs:56-67) — yes, flagless GETs become pure-NOT
  queries that match nothing; pass OR (the reference UI does).
* ``POST /query`` — JSON dict query body (the parse_query form), same
  take/skip/select params (HttpQueryParser.cs:39-46).
* ``POST /write?collection=c`` — JSON array of documents appended as one
  new index segment via api.append_docs (HttpWriter.cs:24-36; the
  reference deserializes the body into Documents and hands them to
  SessionFactory.Write).
* ``POST /saveas`` — query params as GET /query plus ``target`` and
  ``truncate``: materialize the query result as a new indexed collection
  (SaveAsController.cs:31-44 -> SaveAsJob.cs:53-95 -> api.save_as).
* ``GET /status?collection=c`` — doc count + per-field stats (the
  reference's status/HEAD surface).

Query responses are a JSON array of documents with ``score`` plus the
reference's ``X-TotalDocumentCount`` header (QueryController.cs:44).
The header counts RETURNED rows; pass ``total=true`` to spend one extra
count job on the exact match total (the reference's Total comes free
from its in-process reduce; ours is a distributed query).

Serving model: one driver process hosts the HTTP listener; each request
becomes Spark jobs on the shared SparkSession (thread-safe job
submission), so a 1000-executor cluster serves reads behind one thin
front end — the same topology as the reference's single Kestrel host
over an embedded engine.  Engines (and their cached listings / term
directories) are cached per collection across requests, the
SessionFactory role (X10).
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

__all__ = ["ResinHttpServer", "parse_get_params"]


def parse_get_params(qs: dict) -> dict:
    """Normalized GET /query params (HttpReader.cs:38-55 +
    HttpQueryParser.cs:26-38): returns dict with collections, q, fields,
    select, op, take, skip, total."""
    and_flag = "AND" in qs
    or_flag = not and_flag and "OR" in qs
    return {
        "collections": qs.get("collection", []),
        "q": (qs.get("q") or [""])[0],
        "fields": qs.get("field", ["text"]),
        "select": qs.get("select", []) or None,
        "op": "and" if and_flag else ("or" if or_flag else "not"),
        "take": int((qs.get("take") or ["100"])[0]),
        "skip": int((qs.get("skip") or ["0"])[0]),
        "total": (qs.get("total") or ["false"])[0].lower() == "true",
        # beyond-reference: &phrase=true makes q an exact-phrase string
        # (adjacent tokens in order) over the FIRST field
        "phrase": (qs.get("phrase") or ["false"])[0].lower() == "true",
    }


def _jsonable(v):
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    return v


class ResinHttpServer:
    """Thin HTTP front end over a directory of collections.

    ``root_dir/<collection>`` is one index root (the layout build_index
    writes).  ``port=0`` binds an ephemeral port (read ``.port``)."""

    def __init__(self, spark: SparkSession, root_dir: str,
                 host: str = "127.0.0.1", port: int = 0,
                 wet_dir: str | None = None):
        from resin_spark.crawl import CrawlQueue
        from resin_spark.executor import SearchEngine

        self.spark = spark
        self.root_dir = root_dir.rstrip("/")
        # local WET store for crawl jobs — the reference keeps downloaded
        # files under <Directory>/wet (CrawlJob.cs:120); offline analog
        # reads pre-placed files from the same place
        self.wet_dir = wet_dir or f"{self.root_dir}/wet"
        self._crawl_queue = CrawlQueue()
        self._engines: dict[str, SearchEngine] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _send(self, code: int, payload, headers: dict | None = None):
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in (headers or {}).items():
                    self.send_header(k, str(v))
                self.end_headers()
                self.wfile.write(body)

            def _body_json(self):
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"null")

            def do_GET(self):
                u = urlparse(self.path)
                qs = parse_qs(u.query, keep_blank_values=True)
                try:
                    if u.path == "/query":
                        outer._handle_query_get(self, qs)
                    elif u.path == "/status":
                        outer._handle_status(self, qs)
                    else:
                        self._send(404, {"error": f"no route {u.path}"})
                except Exception as e:  # surface errors as JSON, not 500 HTML
                    self._send(400, {"error": str(e)})

            def do_POST(self):
                u = urlparse(self.path)
                qs = parse_qs(u.query, keep_blank_values=True)
                try:
                    if u.path == "/query":
                        outer._handle_query_post(self, qs)
                    elif u.path == "/write":
                        outer._handle_write(self, qs)
                    elif u.path == "/saveas":
                        outer._handle_saveas(self, qs)
                    elif u.path == "/crawl":
                        outer._handle_crawl(self, qs)
                    else:
                        self._send(404, {"error": f"no route {u.path}"})
                except Exception as e:
                    self._send(400, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ engine
    def engine(self, collection: str):
        from resin_spark.executor import SearchEngine

        with self._lock:
            if collection not in self._engines:
                self._engines[collection] = SearchEngine(
                    self.spark, f"{self.root_dir}/{collection}")
            return self._engines[collection]

    # ------------------------------------------------------------ routes
    def _rows_json(self, df, extra_cols: tuple[str, ...] = ()):
        cols = df.columns
        return [
            {c: _jsonable(r[c]) for c in cols}
            for r in df.collect()
        ]

    def _handle_query_get(self, h, qs):
        from resin_spark.executor import multi_search
        from resin_spark.query import parse_flat

        p = parse_get_params(qs)
        if not p["collections"] or not p["q"]:
            h._send(400, {"error": "collection and q are required"})
            return
        q = parse_flat(p["q"], p["fields"], op=p["op"],
                       select=p["select"])
        if p["phrase"] and len(p["collections"]) == 1:
            eng = self.engine(p["collections"][0])
            if p["total"]:
                # one uncapped phrase search: total = its count, the
                # page = a slice of the same ordered frame (persisted),
                # so candidate fetch + adjacency verify run once — not
                # once for the page and again for the count
                full = eng.phrase_search(p["q"], field=p["fields"][0],
                                         k=0, select=p["select"]).persist()
                total = full.count()
                out = full.offset(p["skip"]) if p["skip"] else full
                if p["take"]:
                    out = out.limit(p["take"])
                rows = self._rows_json(out)
                full.unpersist()
                h._send(200, rows, {"X-TotalDocumentCount": total})
                return
            out = eng.phrase_search(p["q"], field=p["fields"][0],
                                    k=p["take"], skip=p["skip"],
                                    select=p["select"])
            total = None
        elif len(p["collections"]) == 1:
            eng = self.engine(p["collections"][0])
            out = eng.search(q, k=p["take"], skip=p["skip"],
                             select=p["select"])
            total = eng.search(q, k=0).count() if p["total"] else None
        else:
            engines = {c: self.engine(c) for c in p["collections"]}
            out = multi_search(engines, q, k=p["take"], skip=p["skip"],
                               select=p["select"])
            total = None
        rows = self._rows_json(out)
        h._send(200, rows, {"X-TotalDocumentCount":
                            total if total is not None else len(rows)})

    def _handle_query_post(self, h, qs):
        from resin_spark.query import parse_query

        body = h._body_json()
        if not isinstance(body, dict):
            h._send(400, {"error": "POST /query body must be a dict query"})
            return
        take = int((qs.get("take") or ["100"])[0])
        skip = int((qs.get("skip") or ["0"])[0])
        select = qs.get("select", []) or None
        collection = (qs.get("collection") or [None])[0] \
            or body.get("collection")
        if not collection:
            h._send(400, {"error": "collection is required"})
            return
        q = parse_query({k: v for k, v in body.items()
                         if k != "collection"},
                        skip=skip, take=take, select=select)
        out = self.engine(collection).search(q, k=take, skip=skip,
                                             select=select)
        rows = self._rows_json(out)
        h._send(200, rows, {"X-TotalDocumentCount": len(rows)})

    def _handle_write(self, h, qs):
        from resin_spark.api import append_docs

        collection = (qs.get("collection") or [None])[0]
        if not collection:
            h._send(400, {"error": "collection is required"})
            return
        docs = h._body_json()
        if not isinstance(docs, list) or not docs:
            h._send(400, {"error": "body must be a non-empty JSON array"})
            return
        rows = [
            (
                str(d["conv_id"]),
                int(d.get("turn_idx", 0)),
                str(d.get("role", "")),
                str(d.get("text", "")),
                str(d.get("tool", "")),
                dt.datetime.fromisoformat(d["ts"]) if d.get("ts") else None,
            )
            for d in docs
        ]
        batch = self.spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        # positions=true opts a BRAND-NEW collection into the positional
        # layout (index-only phrase verify); existing collections keep
        # their layout via append_docs' auto-detect
        pos = (qs.get("positions") or [""])[0].lower() in ("1", "true")
        res = append_docs(self.spark, batch,
                          f"{self.root_dir}/{collection}",
                          positions=True if pos else None)
        eng = self._engines.get(collection)
        if eng is not None:
            eng.refresh()
        h._send(201, res)

    def _handle_saveas(self, h, qs):
        """X11 over HTTP: materialize a query's results as a NEW indexed
        collection (SaveAsController.cs:31-44 -> SaveAsJob.cs:53-95).
        Same querystring contract as GET /query plus ``target`` (the new
        collection name) and ``truncate=true`` (drop an existing target
        first, SaveAsJob's _truncate).  ``take`` defaults to 0 = ALL
        matches (a CTAS, not a page).  The reference's select fields
        become the target's indexed fields when they name text fields."""
        from resin_spark import build as B
        from resin_spark.api import save_as, truncate
        from resin_spark.query import parse_flat

        p = parse_get_params(qs)
        take = int((qs.get("take") or ["0"])[0])
        target = (qs.get("target") or [None])[0]
        trunc = (qs.get("truncate") or ["false"])[0].lower() == "true"
        if not p["collections"] or not p["q"] or not target:
            h._send(400, {"error": "collection, q and target are required"})
            return
        if target in p["collections"]:
            h._send(400, {"error": "target must differ from the source"})
            return
        new_root = f"{self.root_dir}/{target}"
        if trunc:
            truncate(self.spark, new_root)
        elif B._exists(self.spark, B.p_docs(new_root)):
            h._send(409, {"error": f"collection {target} exists; "
                                   "pass truncate=true to replace it"})
            return
        q = parse_flat(p["q"], p["fields"], op=p["op"], select=p["select"])
        eng = self.engine(p["collections"][0])
        fields = tuple(f for f in (p["select"] or ())
                       if f in set(eng.fields)) or None
        res = save_as(eng, q, new_root, k=take, fields=fields)
        with self._lock:
            # a cached engine for the target would read the old index
            self._engines.pop(target, None)
        h._send(201, {"target": target, **res})

    def _handle_crawl(self, h, qs):
        """CrawlController.Post analog (CrawlController.cs:41-90):
        validate the job name, enqueue a background CrawlJob keyed by
        crawlid, and return immediately — progress is polled via
        GET /status?crawlid=... (the reference redirects to its Status
        page).  Only job=CCC exists (CrawlJob.cs:58-63)."""
        from resin_spark.crawl import crawl_wet

        p = parse_get_params(qs)
        job = (qs.get("job") or [""])[0]
        crawlid = (qs.get("crawlid") or [None])[0]
        if job != "CCC":
            h._send(400, {"error": "job must be CCC"})
            return
        if not p["collections"] or not p["q"]:
            h._send(400, {"error": "collection and q are required"})
            return

        def run(st: dict) -> dict:
            res = crawl_wet(
                self.spark, self.root_dir, p["collections"], p["q"],
                p["fields"], self.wet_dir, op=p["op"], skip=p["skip"],
                take=p["take"], status=st, engine_factory=self.engine)
            if res.get("written"):
                eng = self._engines.get("cc_wet")
                if eng is not None:
                    eng.refresh()
            return res

        try:
            cid = self._crawl_queue.enqueue(run, crawlid)
        except ValueError as e:
            # duplicate live crawlid (e.g. a client retry while the
            # first job still runs): conflict, don't start a second
            # writer on the same target collection
            h._send(409, {"error": str(e)})
            return
        h._send(202, {"crawlid": cid, "state": "queued"})

    def _handle_status(self, h, qs):
        crawlid = (qs.get("crawlid") or [None])[0]
        if crawlid:
            # StatusController analog: poll a crawl job's Status dict
            # (StatusController.cs:25-41)
            st = self._crawl_queue.get_status(crawlid)
            if st is None:
                h._send(404, {"error": f"no crawl {crawlid}"})
                return
            h._send(200, dict(st, crawlid=crawlid))
            return
        collection = (qs.get("collection") or [None])[0]
        if not collection:
            h._send(400, {"error": "collection is required"})
            return
        eng = self.engine(collection)
        h._send(200, {
            "collection": collection,
            "doc_count": eng.doc_count(),
            "stats": eng.stats(),
        })

    # ------------------------------------------------------------ lifecycle
    def start(self) -> "ResinHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
