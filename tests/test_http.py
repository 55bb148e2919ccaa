"""Q3 — HTTP surface tests: GET/POST /query, POST /write, GET /status
against a live in-process server (ThreadingHTTPServer on an ephemeral
port), results asserted identical to the direct SearchEngine calls."""

import json
import os
import urllib.request
from urllib.parse import urlencode

import pytest


@pytest.fixture(scope="module")
def http_server(spark, index_root):
    from resin_spark.http import ResinHttpServer

    # index_root is .../idx/collection — serve its parent so the
    # collection name routes to it
    root_dir = os.path.dirname(index_root)
    with ResinHttpServer(spark, root_dir) as srv:
        yield srv


def _get(srv, path, **params):
    qs = urlencode([(k, x) for k, v in params.items()
                    for x in (v if isinstance(v, list) else [v])])
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}?{qs}")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read()), dict(resp.headers)


def _post(srv, path, body, **params):
    qs = urlencode(params)
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}?{qs}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read()), dict(resp.headers)


def test_get_query_matches_engine(http_server, engine):
    rows, headers = _get(http_server, "/query", collection="collection",
                         q="banana", field="text", OR="", take=5)
    want = engine.topk({"or": {"text": "banana"}}, k=5)
    assert [((r["conv_id"], r["turn_idx"]), r["score"]) for r in rows] \
        == [(d, pytest.approx(s)) for d, s in want]
    assert int(headers["X-TotalDocumentCount"]) == len(rows)


def test_get_query_and_flag_and_total(http_server, engine):
    rows, headers = _get(http_server, "/query", collection="collection",
                         q="banana cantalope", field="text", AND="",
                         take=3, total="true")
    want = engine.topk({"and": {"text": "banana cantalope"}}, k=3)
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] \
        == [d for d, _ in want]
    full = engine.search({"and": {"text": "banana cantalope"}}, k=0).count()
    assert int(headers["X-TotalDocumentCount"]) == full >= len(rows)


def test_get_query_flagless_is_not_op(http_server):
    # QueryParser.cs:56-67: neither AND nor OR -> "not" -> matches nothing
    rows, _ = _get(http_server, "/query", collection="collection",
                   q="banana", field="text", take=5)
    assert rows == []


def test_post_query_dict_body(http_server, engine):
    body = {"and": {"text": "banana", "not": {"text": "apples"}}}
    rows, _ = _post(http_server, "/query", body, collection="collection",
                    take=4)
    want = engine.topk(body, k=4)
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] \
        == [d for d, _ in want]


def test_status_and_write_roundtrip(http_server, spark, tmp_path,
                                    transcripts):
    from resin_spark.build import build_index

    # a private collection so the write doesn't disturb shared fixtures
    root_dir = str(tmp_path / "httpw")
    build_index(spark, transcripts.limit(20), f"{root_dir}/c2",
                write_doclens=True)
    from resin_spark.http import ResinHttpServer

    with ResinHttpServer(spark, root_dir) as srv:
        st0, _ = _get(srv, "/status", collection="c2")
        doc = {"conv_id": "convhttp01", "turn_idx": 0, "role": "user",
               "text": "zanzibar quokka banana", "tool": "",
               "ts": "2025-06-01 10:00:00"}
        res, _ = _post(srv, "/write", [doc], collection="c2")
        assert "segment" in res
        st1, _ = _get(srv, "/status", collection="c2")
        assert st1["doc_count"] == st0["doc_count"] + 1
        rows, _ = _get(srv, "/query", collection="c2", q="zanzibar",
                       field="text", OR="", take=3)
        assert [(r["conv_id"], r["turn_idx"]) for r in rows] \
            == [("convhttp01", 0)]


def test_saveas_route(spark, tmp_path, transcripts):
    """X11 over HTTP: POST /saveas materializes the query result as a
    new collection whose /query answers equal a direct save_as twin
    (SaveAsController.cs:31-44)."""
    import urllib.error

    from resin_spark.api import save_as
    from resin_spark.build import build_index
    from resin_spark.executor import SearchEngine
    from resin_spark.http import ResinHttpServer

    root_dir = str(tmp_path / "httpsa")
    build_index(spark, transcripts.limit(60), f"{root_dir}/src",
                write_doclens=True)
    with ResinHttpServer(spark, root_dir) as srv:
        res, _ = _post(srv, "/saveas", None, collection="src", q="banana",
                       field="text", OR="", target="sub")
        assert res["target"] == "sub"
        save_as(SearchEngine(spark, f"{root_dir}/src"),
                {"or": {"text": "banana"}}, str(tmp_path / "twin"))
        twin = SearchEngine(spark, str(tmp_path / "twin"))
        sub = SearchEngine(spark, f"{root_dir}/sub")
        assert sub.doc_count() == twin.doc_count() > 0
        got, _ = _get(srv, "/query", collection="sub", q="banana",
                      field="text", OR="", take=5)
        want = twin.topk({"or": {"text": "banana"}}, k=5)
        assert [((r["conv_id"], r["turn_idx"]), r["score"]) for r in got] \
            == [(d, pytest.approx(s)) for d, s in want]
        # existing target: 409 without truncate, replaced with it
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/saveas", None, collection="src", q="banana",
                  field="text", OR="", target="sub")
        assert e.value.code == 409
        res2, _ = _post(srv, "/saveas", None, collection="src", q="banana",
                        field="text", OR="", target="sub", truncate="true")
        assert res2["target"] == "sub"
        assert SearchEngine(spark, f"{root_dir}/sub").doc_count() \
            == twin.doc_count()


def test_error_routes(http_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(http_server, "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(http_server, "/query", q="x")  # no collection
    assert e.value.code == 400


def test_get_query_phrase(http_server, engine):
    rows, headers = _get(http_server, "/query", collection="collection",
                         q="term97 hotterm", field="text", AND="",
                         phrase="true", take=5, total="true")
    want = [((r["conv_id"], r["turn_idx"]), r["score"]) for r in
            engine.phrase_search("term97 hotterm", k=5,
                                 select=["conv_id", "turn_idx"]).collect()]
    assert [((r["conv_id"], r["turn_idx"]), pytest.approx(r["score"]))
            for r in rows] == want and rows
    full = engine.phrase_search("term97 hotterm", k=0).count()
    assert int(headers["X-TotalDocumentCount"]) == full == len(rows)


def test_get_query_multi_collection_paging_and_select(spark, tmp_path,
                                                      transcripts):
    """GET /query with several collection params pages with skip and
    projects select columns, equal to the direct multi_search call —
    regression: the multi branch used to drop both params."""
    from resin_spark.build import build_index
    from resin_spark.executor import SearchEngine, multi_search
    from resin_spark.http import ResinHttpServer
    from resin_spark.query import parse_flat

    root_dir = str(tmp_path / "httpmc")
    rows = transcripts.limit(40).collect()
    half = len(rows) // 2
    build_index(spark, spark.createDataFrame(rows[:half],
                                             transcripts.schema),
                f"{root_dir}/ca", write_doclens=True)
    build_index(spark, spark.createDataFrame(rows[half:],
                                             transcripts.schema),
                f"{root_dir}/cb", write_doclens=True)
    engines = {"ca": SearchEngine(spark, f"{root_dir}/ca"),
               "cb": SearchEngine(spark, f"{root_dir}/cb")}
    q = parse_flat("banana", ["text"], op="or", select=["role"])
    want = [((r["collection"], r["conv_id"], r["turn_idx"]),
             r["role"], r["score"])
            for r in multi_search(engines, q, k=3, skip=2,
                                  select=["role"]).collect()]
    assert want, "fixture must hit both pages"
    with ResinHttpServer(spark, root_dir) as srv:
        got, _ = _get(srv, "/query", collection=["ca", "cb"],
                      q="banana", field="text", OR="", take=3, skip=2,
                      select="role")
        assert [((r["collection"], r["conv_id"], r["turn_idx"]),
                 r["role"], pytest.approx(r["score"])) for r in got] \
            == want


def test_write_visible_to_warm_engine(spark, tmp_path, transcripts):
    """refresh() must invalidate the embedded pyarrow dataset listing
    and the decoded-postings/block-stats LRUs: an engine that already
    served the queried term (warm caches) must see a subsequent append
    — regression: the stale dataset hid the new segment and the term
    LRU kept serving the pre-append postings."""
    from resin_spark.build import build_index
    from resin_spark.http import ResinHttpServer

    root_dir = str(tmp_path / "httpwarm")
    build_index(spark, transcripts.limit(20), f"{root_dir}/c3",
                write_doclens=True)
    with ResinHttpServer(spark, root_dir) as srv:
        # warm the server engine on the term we're about to append
        rows0, _ = _get(srv, "/query", collection="c3", q="banana",
                        field="text", OR="", take=50)
        doc = {"conv_id": "convwarm01", "turn_idx": 0, "role": "user",
               "text": "banana warmcachetoken", "tool": "",
               "ts": "2025-06-01 10:00:00"}
        _post(srv, "/write", [doc], collection="c3")
        # brand-new term lives only in the appended segment
        rows1, _ = _get(srv, "/query", collection="c3",
                        q="warmcachetoken", field="text", OR="", take=3)
        assert [(r["conv_id"], r["turn_idx"]) for r in rows1] \
            == [("convwarm01", 0)]
        # warmed term picks up the appended posting too
        rows2, _ = _get(srv, "/query", collection="c3", q="banana",
                        field="text", OR="", take=50)
        assert len(rows2) == len(rows0) + 1
        assert ("convwarm01", 0) in {(r["conv_id"], r["turn_idx"])
                                     for r in rows2}
