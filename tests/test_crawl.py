"""Crawl job analog tests (CrawlJob.cs / CrawlController.cs /
StatusController.cs): query-driven WET ingestion from a local WET store,
already-indexed skip, the first-file break quirk, error surfacing, and
the async HTTP route with status polling."""

import gzip
import json
import os
import time
import urllib.request
from urllib.parse import urlencode

import pytest

WARC_A = "crawl-data/CC-MAIN-2019-35/segments/1/warc/fileA.warc.gz"
WARC_B = "crawl-data/CC-MAIN-2019-35/segments/1/warc/fileB.warc.gz"
WET_A = "crawl-data/CC-MAIN-2019-35/segments/1/wet/fileA.warc.wet.gz"
WET_B = "crawl-data/CC-MAIN-2019-35/segments/1/wet/fileB.warc.wet.gz"


def _wet_payload(records: dict[str, str]) -> bytes:
    out = ["WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nrobots: classic\r\n"]
    for url, body in records.items():
        out.append(
            f"WARC/1.0\r\nWARC-Target-URI: {url}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}\r\n"
        )
    return gzip.compress("".join(out).encode())


@pytest.fixture(scope="module")
def crawl_root(spark, tmp_path_factory):
    """A served directory holding the source collection (WAT-analog:
    conv_id=url, role=title, tool=WARC filename, text=searchable
    metadata) and a local WET store with both files."""
    from resin_spark.build import build_index
    from resin_spark.fixtures import TRANSCRIPT_SCHEMA

    root_dir = str(tmp_path_factory.mktemp("crawlsrv"))
    src = [
        ("http://ex.com/a1", 0, "Title A1", "zebra metadata alpha",
         WARC_A, None),
        ("http://ex.com/a2", 0, "Title A2", "zebra metadata bravo",
         WARC_A, None),
        ("http://ex.com/b1", 0, "Title B1", "zebra metadata charlie",
         WARC_B, None),
    ]
    build_index(
        spark,
        spark.createDataFrame(src, schema=TRANSCRIPT_SCHEMA),
        f"{root_dir}/cc_wat",
        write_doclens=True,
    )
    wet_dir = f"{root_dir}/wet"
    for wid, recs in (
        (WET_A, {
            "http://ex.com/a1": "quixotic penguin content one",
            "http://ex.com/a2": "quixotic walrus content two",
            # present in the WET file but NOT in the search result —
            # must not be indexed (CrawlJob.cs:189-197 keeps only
            # originalResult urls)
            "http://ex.com/extra": "quixotic stranger content",
        }),
        (WET_B, {"http://ex.com/b1": "quixotic gazelle content three"}),
    ):
        path = os.path.join(wet_dir, wid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_wet_payload(recs))
    return root_dir


def test_crawl_first_file_quirk_and_field_carryover(spark, crawl_root):
    """Default run mirrors the reference job's ``break``: only the FIRST
    result's WET file is ingested; records join the original result on
    url, title (role) carried over, tool = the WET file id."""
    from resin_spark.crawl import crawl_wet, wet_file_id
    from resin_spark.executor import SearchEngine

    assert wet_file_id(WARC_A) == WET_A

    # "zebra" is in every source doc, so the OR anchor matches all three
    # (resin's order-sensitive OR only boosts docs the anchor matched)
    st = crawl_wet(spark, crawl_root, ["cc_wat"], "zebra metadata",
                   ["text"], f"{crawl_root}/wet", op="or", take=10)
    assert st["state"] == "done" and st["errors"] == []
    assert st["download"] == 100 and st["index"] == 100
    # all three source docs matched, but only the first hit's file is
    # read -> exactly the 2 result-urls of that file were written
    assert st["written"] == 2

    eng = SearchEngine(spark, f"{crawl_root}/cc_wet")
    rows = {r["conv_id"]: r for r in eng.documents().collect()}
    assert set(rows) in ({"http://ex.com/a1", "http://ex.com/a2"},
                         {"http://ex.com/b1"})
    for r in rows.values():
        assert r["role"].startswith("Title ")
        assert r["tool"] in (WET_A, WET_B)
        assert "quixotic" in r["text"]
    assert "http://ex.com/extra" not in rows


def test_crawl_all_files_and_already_indexed_skip(spark, tmp_path,
                                                  crawl_root):
    """first_file_only=False ingests every distinct file; a second run
    skips files whose records are already indexed (the reference's
    cc_wet filename probe, CrawlJob.cs:105-118)."""
    import shutil

    from resin_spark.crawl import crawl_wet
    from resin_spark.executor import SearchEngine

    root_dir = str(tmp_path / "srv2")
    shutil.copytree(crawl_root, root_dir)
    shutil.rmtree(f"{root_dir}/cc_wet", ignore_errors=True)

    args = (spark, root_dir, ["cc_wat"], "zebra metadata", ["text"],
            f"{root_dir}/wet")
    st = crawl_wet(*args, op="or", take=10, first_file_only=False)
    assert st["state"] == "done" and st["written"] == 3
    assert sorted(r["conv_id"] for r in
                  SearchEngine(spark, f"{root_dir}/cc_wet")
                  .documents().collect()) == [
        "http://ex.com/a1", "http://ex.com/a2", "http://ex.com/b1"]

    again = crawl_wet(*args, op="or", take=10, first_file_only=False)
    assert again["state"] == "done" and again["written"] == 0
    assert sorted(again["skipped_files"]) == [WET_A, WET_B]


def test_crawl_missing_wet_file_is_job_error(spark, tmp_path):
    """A result naming a WET file absent from the local store surfaces a
    job error (the reference would download it; this sandbox is
    offline)."""
    from resin_spark.build import build_index
    from resin_spark.crawl import crawl_wet
    from resin_spark.fixtures import TRANSCRIPT_SCHEMA

    root_dir = str(tmp_path / "srv3")
    src = [("http://ex.com/x", 0, "Title X", "zebra lonely doc",
            WARC_A, None)]
    build_index(spark, spark.createDataFrame(src, TRANSCRIPT_SCHEMA),
                f"{root_dir}/cc_wat", write_doclens=True)
    st = crawl_wet(spark, root_dir, ["cc_wat"], "lonely", ["text"],
                   f"{root_dir}/wet")
    assert st["state"] == "error"
    assert st["errors"] and WET_A in st["errors"][0]
    assert st["written"] == 0


def _get(srv, path, **params):
    qs = urlencode([(k, x) for k, v in params.items()
                    for x in (v if isinstance(v, list) else [v])])
    with urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}{path}?{qs}") as resp:
        return json.loads(resp.read()), resp.status


def test_http_crawl_route_and_status_poll(spark, tmp_path, crawl_root):
    """POST /crawl enqueues the job and returns 202 with the crawlid;
    GET /status?crawlid polls its live Status dict; once done the
    cc_wet collection answers /query (CrawlController.cs:41-90 ->
    StatusController.cs:25-41)."""
    import shutil

    from resin_spark.http import ResinHttpServer

    root_dir = str(tmp_path / "srv4")
    shutil.copytree(crawl_root, root_dir)
    shutil.rmtree(f"{root_dir}/cc_wet", ignore_errors=True)

    with ResinHttpServer(spark, root_dir) as srv:
        # invalid job name -> 400, like the controller's validation
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/crawl?"
            + urlencode({"collection": "cc_wat", "q": "alpha",
                         "field": "text", "job": "nope"}),
            method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/crawl?"
            + urlencode([("collection", "cc_wat"),
                         ("q", "zebra metadata"),
                         ("field", "text"), ("job", "CCC"),
                         ("OR", ""), ("take", "10"),
                         ("crawlid", "job-1")]),
            method="POST")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 202
            assert json.loads(resp.read())["crawlid"] == "job-1"

        deadline = time.monotonic() + 120
        st = None
        while time.monotonic() < deadline:
            st, code = _get(srv, "/status", crawlid="job-1")
            assert code == 200
            if st["state"] in ("done", "error"):
                break
            time.sleep(0.3)
        assert st is not None and st["state"] == "done", st
        assert st["written"] == 2

        rows, _ = _get(srv, "/query", collection="cc_wet",
                       q="quixotic", field="text", OR="", take=10)
        assert len(rows) == 2
        # unknown crawlid -> 404
        try:
            _get(srv, "/status", crawlid="nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404


def test_crawl_multi_collection_with_paging(spark, tmp_path, crawl_root):
    """A crawl spanning several source collections (the reference's
    string[] collection parameter, CrawlController.cs:41-49) routes
    through multi_search with the stored role/tool fields projected and
    skip plumbed: all named files across collections are ingested, and a
    skip past every hit writes nothing."""
    import shutil

    from resin_spark.build import build_index
    from resin_spark.crawl import crawl_wet
    from resin_spark.executor import SearchEngine
    from resin_spark.fixtures import TRANSCRIPT_SCHEMA

    root_dir = str(tmp_path / "srv_mc")
    shutil.copytree(crawl_root, root_dir)
    shutil.rmtree(f"{root_dir}/cc_wet", ignore_errors=True)
    # second source collection whose only doc names fileB
    build_index(
        spark,
        spark.createDataFrame(
            [("http://ex.com/b1", 0, "Title B1", "zebra metadata delta",
              WARC_B, None)], TRANSCRIPT_SCHEMA),
        f"{root_dir}/cc_wat2", write_doclens=True)

    args = (spark, root_dir, ["cc_wat", "cc_wat2"], "zebra metadata",
            ["text"], f"{root_dir}/wet")
    st = crawl_wet(*args, op="or", take=10, first_file_only=False)
    assert st["state"] == "done" and st["errors"] == [], st
    # hits span both collections -> both WET files read; b1 appears in
    # both sources but WET_B is read once (distinct file ids)
    assert st["written"] == 3
    rows = {r["conv_id"]: r for r in
            SearchEngine(spark, f"{root_dir}/cc_wet")
            .documents().collect()}
    assert sorted(rows) == ["http://ex.com/a1", "http://ex.com/a2",
                            "http://ex.com/b1"]
    assert rows["http://ex.com/b1"]["role"] == "Title B1"
    assert rows["http://ex.com/b1"]["tool"] == WET_B

    # skip beyond every hit: empty page, clean no-op run
    st2 = crawl_wet(spark, root_dir, ["cc_wat", "cc_wat2"],
                    "zebra metadata", ["text"], f"{root_dir}/wet",
                    op="or", take=10, skip=50)
    assert st2["state"] == "done" and st2["written"] == 0


def test_crawl_queue_rejects_live_duplicate_id(spark, tmp_path,
                                               crawl_root):
    """Re-POSTing a crawlid while its job is still live is a 409 — the
    second request must not orphan the running job's status dict or
    start a second writer on the same collection; a terminal id may be
    reused."""
    import shutil
    import threading

    from resin_spark.crawl import CrawlQueue
    from resin_spark.http import ResinHttpServer

    q = CrawlQueue()
    gate = threading.Event()

    def slow(st):
        st["state"] = "running"
        gate.wait(30)
        st["state"] = "done"
        return st

    q.enqueue(slow, "dup")
    with pytest.raises(ValueError):
        q.enqueue(slow, "dup")
    gate.set()
    deadline = time.monotonic() + 10
    while q.get_status("dup")["state"] != "done":
        assert time.monotonic() < deadline
        time.sleep(0.02)
    # terminal id is reusable (retry path)
    gate2 = threading.Event()
    gate2.set()

    def fast(st):
        st["state"] = "done"
        return st

    assert q.enqueue(fast, "dup") == "dup"

    # HTTP surface: the conflict is a 409, and the first job's status
    # stays observable
    root_dir = str(tmp_path / "srv_dup")
    shutil.copytree(crawl_root, root_dir)
    shutil.rmtree(f"{root_dir}/cc_wet", ignore_errors=True)
    with ResinHttpServer(spark, root_dir) as srv:
        params = urlencode([("collection", "cc_wat"),
                            ("q", "zebra metadata"), ("field", "text"),
                            ("job", "CCC"), ("OR", ""),
                            ("crawlid", "job-x")])
        url = f"http://{srv.host}:{srv.port}/crawl?{params}"
        with urllib.request.urlopen(
                urllib.request.Request(url, method="POST")) as resp:
            assert resp.status == 202
        # immediate duplicate: either still live (409) or already done
        # (202, terminal reuse) — never a silent replacement
        try:
            with urllib.request.urlopen(
                    urllib.request.Request(url, method="POST")) as resp:
                assert resp.status == 202
        except urllib.error.HTTPError as e:
            assert e.code == 409
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            st, _ = _get(srv, "/status", crawlid="job-x")
            if st["state"] in ("done", "error"):
                break
            time.sleep(0.3)
        assert st["state"] == "done"


def test_crawl_queue_processes_jobs_sequentially():
    """The queue is a single-consumer queue like the reference's
    AsyncJob processor: a second job (ANY crawlid) must not start while
    the first is live — two concurrent jobs targeting the same
    collection would race segment-id assignment and the conv-dim
    extension (two writers, one index)."""
    import threading

    from resin_spark.crawl import CrawlQueue

    q = CrawlQueue()
    gate = threading.Event()

    def blocking(st):
        st["state"] = "running"
        gate.wait(30)
        st["state"] = "done"
        return st

    def instant(st):
        st["state"] = "running"
        st["state"] = "done"
        return st

    id1 = q.enqueue(blocking, "seq-1")
    id2 = q.enqueue(instant, "seq-2")
    deadline = time.monotonic() + 10
    while q.get_status(id1)["state"] != "running":
        assert time.monotonic() < deadline
        time.sleep(0.01)
    time.sleep(0.2)  # give a (buggy) parallel runner time to start job2
    assert q.get_status(id2)["state"] == "queued"
    gate.set()
    deadline = time.monotonic() + 10
    while q.get_status(id2)["state"] != "done":
        assert time.monotonic() < deadline
        time.sleep(0.01)
    assert q.get_status(id1)["state"] == "done"
