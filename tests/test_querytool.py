"""QueryTool REPL (blacklab_spark/querytool.py — the reference's
tools/.../querytool/QueryToolImpl.java, SURVEY §3.3): scripted
sessions over a live engine, output assertions per command."""

from __future__ import annotations

import io
import re

from blacklab_spark.querytool import run_repl


def session(engine, *lines) -> str:
    out = io.StringIO()
    run_repl(engine, inp=list(lines), out=out)
    return out.getvalue()


def test_query_and_paging(tiny_engine):
    n = tiny_engine.find('"visa"').count()
    out = session(tiny_engine, '"visa"', "next", "prev", "page 2",
                  "pagesize 5")
    assert f"{n} hits in" in out
    assert "[visa]" in out
    # every echoed command gets a timing line (reference stats line)
    assert out.count("@ ") == 5


def test_sort_group_docs_colloc(tiny_engine):
    out = session(tiny_engine, '"visa"', "group hit:word", "hits",
                  "sort -hit:word", "docs", "colloc")
    assert re.search(r"\d+\. visa  \(\d+\)", out)      # group line
    assert re.search(r"\d+ groups", out)
    assert re.search(r"\d+\. \[conv\d+:\d+\] \d+ hits", out)
    assert re.search(r"\d+ documents", out)
    # collocations of the active single-term query
    assert re.search(r"\d+\. \w+  \(\d+\)", out)


def test_filter_and_sensitive(tiny_engine):
    base = tiny_engine.find('"visa"').count()
    filtered = tiny_engine.find('"visa"', filter="role:assistant").count()
    assert 0 < filtered < base
    out = session(tiny_engine, "filter role:assistant", '"visa"')
    assert f"{filtered} hits in" in out
    # sensitive on → word_s layer: uppercase query stops matching
    out = session(tiny_engine, "sensitive on", '"VISA"',
                  "sensitive off", '"VISA"')
    assert "0 hits in" in out and f"{base} hits in" in out


def test_doc_snippet_contents(tiny_engine):
    out = session(tiny_engine, '"visa"', "doc 1", "snippet 1",
                  "doccontents 1", "struct")
    assert "conv_id:" in out and "n_tokens:" in out
    assert "[visa]" in out
    assert "documents:" in out and "annotations:" in out


def test_switch_parser_and_errors(tiny_engine):
    out = session(tiny_engine, "switch", "visa", "sw", '"visa"')
    assert "contextql parser" in out and "corpusql parser" in out
    # contextql bare term works AND corpusql query works after switch
    assert out.count("hits in") == 2
    # bad query keeps the REPL alive; next command still runs
    out = session(tiny_engine, '"unclosed', "help")
    assert "ERROR:" in out and "Commands" in out


def test_repeat_and_clear(tiny_engine):
    out = session(tiny_engine, 'repeat 2 "visa"', "clear", "next")
    assert out.count("hits in") == 2
    assert "Query and results cleared." in out
    assert "No query active." in out


def test_exit_stops_processing(tiny_engine):
    out = session(tiny_engine, "exit", '"visa"')
    assert "hits in" not in out
