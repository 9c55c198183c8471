"""Index-management write path of the serving facade — the
reference's RequestHandlerCreateIndex / AddToIndex / DeleteIndex /
ListInputFormats over real HTTP, plus the private-index authorization
rules (server/.../RequestHandler.java:166-230 method routing)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from blacklab_spark.server import BlsServer


@pytest.fixture(scope="module")
def wserver(tiny_engine, tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("bls_data")
    srv = BlsServer(tiny_engine, corpus="tiny", data_dir=str(data_dir))
    srv.start()
    yield srv
    srv.stop()


def _req(server, path, method="GET", body=None, headers=None,
         expect=200):
    url = f"http://127.0.0.1:{server.port}{path}"
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        assert e.code == expect, (e.code, e.read())
        return e.code, e.read().decode()


def _json(server, path, method="GET", body=None, headers=None,
          expect=200):
    status, text = _req(server, path, method, body, headers, expect)
    assert status == expect, text
    return json.loads(text)


def _turn(conv, idx, text, role="user"):
    return json.dumps({"conv_id": conv, "turn_idx": idx, "role": role,
                       "text": text, "tool": None,
                       "ts": "2026-01-01T00:00:00.000Z"})


def test_input_formats(wserver):
    r = _json(wserver, "/blacklab-server/input-formats")
    fmts = r["supportedInputFormats"]
    assert "jsonl" in fmts and fmts["jsonl"]["uploadable"]
    assert "parquet" in fmts and not fmts["parquet"]["uploadable"]


def test_index_lifecycle(wserver):
    # create: empty index, registered and immediately queryable
    r = _json(wserver, "/blacklab-server/?name=mycorpus&format=jsonl",
              method="POST")
    assert r["status"] == {"indexName": "mycorpus", "status": "empty",
                           "format": "jsonl"}
    info = _json(wserver, "/blacklab-server")
    assert info["corpora"]["mycorpus"]["status"] == "empty"
    ci = _json(wserver, "/blacklab-server/mycorpus")
    assert ci["documentCount"] == 0
    h = _json(wserver, "/blacklab-server/mycorpus/hits?patt=%22visa%22")
    assert h["summary"]["numberOfHits"] == 0

    # add a first batch (delta build + synchronous compact)
    body = "\n".join([
        _turn("c1", 0, "the visa application was very good"),
        _turn("c1", 1, "please search the visa browser",
              role="assistant"),
    ]).encode()
    r = _json(wserver, "/blacklab-server/mycorpus/docs",
              method="POST", body=body)
    assert r["status"]["documentsAdded"] == 2
    assert r["status"]["documentCount"] == 2
    assert r["status"]["status"] == "available"

    h = _json(wserver, "/blacklab-server/mycorpus/hits?patt=%22visa%22")
    assert h["summary"]["numberOfHits"] == 2
    assert {x["docPid"] for x in h["hits"]} == {"c1:0", "c1:1"}

    # second batch: doc ids continue, global stats recomputed
    body = _turn("c2", 0, "visa visa visa").encode()
    r = _json(wserver, "/blacklab-server/mycorpus/docs",
              method="POST", body=body)
    assert r["status"]["documentCount"] == 3
    h = _json(wserver, "/blacklab-server/mycorpus/hits?patt=%22visa%22")
    assert h["summary"]["numberOfHits"] == 5
    tf = _json(wserver, "/blacklab-server/mycorpus/termfreq?number=3")
    assert tf["termFreq"]["visa"] == 5
    st = _json(wserver, "/blacklab-server/mycorpus/status")
    assert st["status"] == "available" and st["tokenCount"] > 0

    # delete: deregistered and gone from disk
    r = _json(wserver, "/blacklab-server/mycorpus", method="DELETE")
    assert r["status"]["status"] == "deleted"
    _json(wserver, "/blacklab-server/mycorpus", expect=404)
    assert "mycorpus" not in _json(wserver, "/blacklab-server")["corpora"]


def test_write_authorization(wserver):
    # the configured primary corpus is read-only (public-index rule)
    err = _json(wserver, "/blacklab-server/tiny/docs", method="POST",
                body=b'{"x": 1}', expect=403)
    assert err["error"]["code"] == "NOT_AUTHORIZED"
    err = _json(wserver, "/blacklab-server/tiny", method="DELETE",
                expect=403)
    assert err["error"]["code"] == "NOT_AUTHORIZED"
    # name validation + duplicate rejection
    err = _json(wserver, "/blacklab-server/?name=..%2Fevil",
                method="POST", expect=400)
    assert err["error"]["code"] == "ILLEGAL_INDEX_NAME"
    err = _json(wserver, "/blacklab-server/?name=tiny", method="POST",
                expect=400)
    assert err["error"]["code"] == "INDEX_ALREADY_EXISTS"
    # empty body rejected
    _json(wserver, "/blacklab-server/?name=guarded", method="POST")
    err = _json(wserver, "/blacklab-server/guarded/docs",
                method="POST", expect=400)
    assert err["error"]["code"] == "NO_DATA_GIVEN"
    _json(wserver, "/blacklab-server/guarded", method="DELETE")


def test_readonly_server_rejects_writes(tiny_engine):
    from blacklab_spark.server import BlsApp
    app = BlsApp(tiny_engine, corpus="tiny")   # no data_dir
    status, _, body = app.handle("/blacklab-server", {"name": ["x"]},
                                 method="POST")
    assert status == 403
    assert json.loads(body)["error"]["code"] == "NOT_AUTHORIZED"


def test_post_as_get_form_params(wserver, tiny_engine):
    """A non-docs POST with form params is handled as GET (the
    reference's large-CQL escape hatch)."""
    body = b"patt=%22visa%22"
    r = _json(wserver, "/blacklab-server/tiny/hits", method="POST",
              body=body,
              headers={"Content-Type":
                       "application/x-www-form-urlencoded"})
    assert r["summary"]["numberOfHits"] == \
        tiny_engine.find('"visa"').count() > 0


def test_docs_csv(wserver):
    status, text = _req(
        wserver,
        "/blacklab-server/tiny/docs?patt=%22visa%22&outputformat=csv")
    assert status == 200
    lines = text.strip().split("\n")
    assert lines[0] == "docPid,numberOfHits,role,lengthInTokens"
    assert len(lines) > 1 and lines[1].count(",") == 3


def test_sharing_roundtrip(wserver):
    _json(wserver, "/blacklab-server/?name=shared", method="POST")
    r = _json(wserver, "/blacklab-server/shared/sharing")
    assert r["users[]"] == []
    r = _json(wserver, "/blacklab-server/shared/sharing",
              method="POST",
              body=b"users%5B%5D=alice&users%5B%5D=bob",
              headers={"Content-Type":
                       "application/x-www-form-urlencoded"})
    assert r["status"]["code"] == "SUCCESS"
    r = _json(wserver, "/blacklab-server/shared/sharing")
    assert r["users[]"] == ["alice", "bob"]
    # survives data uploads (stored beside the index, not in it)
    _json(wserver, "/blacklab-server/shared/docs", method="POST",
          body=_turn("s1", 0, "visa ok").encode())
    r = _json(wserver, "/blacklab-server/shared/sharing")
    assert r["users[]"] == ["alice", "bob"]
    _json(wserver, "/blacklab-server/shared", method="DELETE")
    # primary corpus: read-only rule applies
    err = _json(wserver, "/blacklab-server/tiny/sharing", expect=403)
    assert err["error"]["code"] == "NOT_AUTHORIZED"


def test_docs_sort(wserver, tiny_engine):
    r = _json(wserver, "/blacklab-server/tiny/docs"
              "?patt=%22visa%22&sort=-numhits&number=5")
    counts = [d["numberOfHits"] for d in r["docs"]]
    assert counts == sorted(counts, reverse=True) and counts
    r = _json(wserver, "/blacklab-server/tiny/docs"
              "?filter=role:assistant&sort=field:conv_id&number=5")
    pids = [d["docPid"].rsplit(":", 1)[0] for d in r["docs"]]
    assert pids == sorted(pids)
    err = _json(wserver, "/blacklab-server/tiny/docs?sort=bogus",
                expect=400)
    assert err["error"]["code"] == "UNKNOWN_SORT_PROPERTY"


def test_docs_viewgroup(wserver, tiny_engine):
    """viewgroup= on grouped /docs: one group's documents, paged."""
    g = _json(wserver, "/blacklab-server/tiny/docs?group=field:role")
    ident, size = (g["docGroups"][0]["identity"],
                   g["docGroups"][0]["size"])
    r = _json(wserver, "/blacklab-server/tiny/docs"
              f"?group=field:role&viewgroup={ident}&number=10")
    assert r["summary"]["numberOfDocs"] == size
    assert 0 < len(r["docs"]) <= 10
    assert all(i["role"] == ident for i in r["docInfos"].values())


def test_input_format_management(wserver):
    """WRITE/INFO/XSLT/DELETE_INPUT_FORMAT (RequestHandlerAddFormat /
    DeleteFormat, formatInfoResponse, XslGenerator) — the remaining
    WebserviceOperation input-format group."""
    cfg = json.dumps({
        "name": "chatcsv", "baseFormat": "csv",
        "displayName": "Chat CSV", "description": "renamed columns",
        "columns": {"conv_id": "conversation", "turn_idx": "n",
                    "role": "speaker", "text": "utterance"},
        "defaults": {"tool": None, "ts": "2026-01-01 00:00:00"},
        "options": {"sep": ";"}})
    # upload as form field `data` (the reference's upload field name)
    import urllib.parse
    form = urllib.parse.urlencode({"data": cfg}).encode()
    r = _json(wserver, "/blacklab-server/input-formats", method="POST",
              body=form,
              headers={"Content-Type":
                       "application/x-www-form-urlencoded"})
    assert r["status"]["message"] == "Format added."

    # listed, marked configuration-based
    fmts = _json(wserver, "/blacklab-server/input-formats")
    f = fmts["supportedInputFormats"]["chatcsv"]
    assert f["configurationBased"] and f["uploadable"]
    assert f["displayName"] == "Chat CSV"

    # info returns the stored config
    info = _json(wserver, "/blacklab-server/input-formats/chatcsv")
    assert info["formatName"] == "chatcsv"
    assert info["configFileType"] == "json"
    assert json.loads(info["configFile"])["baseFormat"] == "csv"
    # builtin formats are code-based → NOT_FOUND (reference rule for
    # non-configuration-based formats)
    err = _json(wserver, "/blacklab-server/input-formats/jsonl",
                expect=404)
    assert err["error"]["code"] == "NOT_FOUND"

    # xslt: only for XML-based configs
    err = _json(wserver, "/blacklab-server/input-formats/chatcsv/xslt",
                expect=404)
    assert err["error"]["code"] == "NOT_FOUND"
    xcfg = json.dumps({"name": "teiish", "baseFormat": "xml"}).encode()
    _json(wserver, "/blacklab-server/input-formats", method="POST",
          body=xcfg, headers={"Content-Type": "application/json"})
    status, xslt = _req(wserver,
                        "/blacklab-server/input-formats/teiish/xslt")
    assert status == 200 and "xsl:stylesheet" in xslt

    # delete guards: builtin → 400, unknown → 404, user format → ok
    err = _json(wserver, "/blacklab-server/input-formats/jsonl",
                method="DELETE", expect=400)
    assert err["error"]["code"] == "CANNOT_DELETE_INDEX"
    err = _json(wserver, "/blacklab-server/input-formats/nope",
                method="DELETE", expect=404)
    assert err["error"]["code"] == "FORMAT_NOT_FOUND"
    r = _json(wserver, "/blacklab-server/input-formats/teiish",
              method="DELETE")
    assert r["status"]["message"] == "Format deleted."
    _json(wserver, "/blacklab-server/input-formats/teiish", expect=404)


def test_create_index_with_user_format(wserver):
    """End-to-end: corpus created with an uploaded format config,
    documents added in the USER's column layout."""
    r = _json(wserver,
              "/blacklab-server/?name=chatcorpus&format=chatcsv",
              method="POST")
    assert r["status"]["format"] == "chatcsv"
    body = ("conversation;n;speaker;utterance\n"
            "k1;0;user;the visa application was filed\n"
            "k1;1;assistant;the visa was very good\n").encode()
    r = _json(wserver, "/blacklab-server/chatcorpus/docs",
              method="POST", body=body)
    assert r["status"]["documentsAdded"] == 2
    h = _json(wserver,
              "/blacklab-server/chatcorpus/hits?patt=%22visa%22")
    assert h["summary"]["numberOfHits"] == 2
    assert {x["docPid"] for x in h["hits"]} == {"k1:0", "k1:1"}
    # format in use → cannot delete
    err = _json(wserver, "/blacklab-server/input-formats/chatcsv",
                method="DELETE", expect=400)
    assert err["error"]["code"] == "CANNOT_DELETE_INDEX"
    _json(wserver, "/blacklab-server/chatcorpus", method="DELETE")
    _json(wserver, "/blacklab-server/input-formats/chatcsv",
          method="DELETE")


def test_write_format_requires_writable_server(tiny_engine):
    from blacklab_spark.server import BlsApp
    app = BlsApp(tiny_engine, corpus="tiny")  # no data_dir
    status, _ctype, body = app.handle(
        "/blacklab-server/input-formats", {}, method="POST",
        body=b'{"name": "x", "baseFormat": "csv"}',
        content_type="application/json")
    assert status == 403
    assert json.loads(body)["error"]["code"] == "NOT_AUTHORIZED"
