"""Interactive query REPL — the reference's QueryTool
(tools/src/main/java/nl/inl/blacklab/querytool/QueryToolImpl.java,
SURVEY §3.3) over :class:`SearchEngine`.

A line is either a command or, failing that, a query in the current
pattern language (corpusql | contextql — the reference's dual-parser
switch, ParserCorpusQl/ParserContextQl). Commands mirrored:

``prev/p  next/n  page N  pagesize N`` — paging over the current
result set; ``context N`` KWIC width; ``snippet N`` / ``snippetsize
N`` — one hit's wider concordance; ``doc N`` / ``doccontents N`` —
metadata / content store of hit N's document; ``filter <luceneql>``
(empty = clear) — metadata filter applied to subsequent queries;
``sensitive {on|off|case|diac}`` — default word-layer sensitivity
(index.setDefaultMatchSensitivity analog: on=word_s, off=word,
case=word_di, diac=word_ci); ``sort <crit>`` / ``group <crit>`` —
hit-property DSL; ``hits/docs/groups/colloc`` — switch what a page
shows; ``switch/sw`` — toggle pattern language; ``struct`` — index
metadata; ``total {on|off}``; ``repeat N <cmd>``; ``clear``; ``help``;
``exit/quit``.

Driver-side I/O only: every command materializes at most one page
(window + bounded KWIC fetch); counts are Spark aggregates.
"""

from __future__ import annotations

import re
import sys
import time

from pyspark.sql import functions as F

from blacklab_spark.engine import SearchEngine

_HELP = """\
Commands (QueryTool analog):
  <query>            run a query in the current language
  n(ext) / p(rev)    page through results      page N / pagesize N
  context N          KWIC words around hit     snippet N / snippetsize N
  doc N / doccontents N   metadata / contents of hit N's document
  filter <luceneql>  metadata filter (no argument = clear)
  sensitive on|off|case|diac   default word-layer sensitivity
  sort <crit> / group <crit>   hit-property DSL (e.g. hit:word, field:role)
  hits / docs / groups / colloc   what a results page shows
  switch (sw)        toggle corpusql <-> contextql
  struct             index structure    total on|off   repeat N <cmd>
  clear              forget current query/results
  exit / quit        leave"""

#: 'sensitive' argument → word layer (MatchSensitivity mapping used
#: by QueryToolImpl: on=SENSITIVE, case=DIACRITICS_INSENSITIVE,
#: diac=CASE_INSENSITIVE, else INSENSITIVE)
_SENS = {"on": "word_s", "yes": "word_s", "true": "word_s",
         "case": "word_di", "diac": "word_ci", "diacritics": "word_ci"}


class QueryTool:
    """State machine of one REPL session (testable without a TTY:
    feed lines to :meth:`process`, read the output stream)."""

    def __init__(self, engine: SearchEngine, out=None):
        self.engine = engine
        self.out = out or sys.stdout
        self.parser = "corpusql"
        self.pagesize = 20
        self.context = 5
        self.snippetsize = 50
        self.first = 0
        self.filter: str | None = None
        self.sensitivity: str | None = None
        self.show = "hits"
        self.show_total = True
        self.last_query: str | None = None
        self.hits = None          # current hits DataFrame
        self.sort_crit: str | None = None
        self.group_crit: str | None = None

    # -- output --------------------------------------------------------
    def line(self, s: str = "") -> None:
        print(s, file=self.out)

    def error(self, s: str) -> None:
        print(f"ERROR: {s}", file=self.out)

    # -- lifecycle ------------------------------------------------------
    def run(self, inp) -> None:
        """Read commands from an iterable of lines until exit/EOF."""
        for raw in inp:
            if not self.process(raw):
                break

    def process(self, raw: str) -> bool:
        """One command line; False = exit requested."""
        cmd = raw.strip()
        if not cmd or cmd.startswith("#"):
            return True
        t0 = time.time()
        try:
            alive = self._dispatch(cmd)
        except Exception as e:  # surface, keep the REPL alive
            self.error(str(e))
            return True
        self.line(f"@ {cmd}\t{time.time() - t0:.2f}s")
        return alive

    # -- dispatch -------------------------------------------------------
    def _dispatch(self, cmd: str) -> bool:
        lc = cmd.lower()
        action, _, args = cmd.partition(" ")
        action = action.lower()
        args = args.strip()
        if lc in ("exit", "quit", "stop"):
            return False
        if lc == "help":
            self.line(_HELP)
        elif lc in ("clear", "reset"):
            self.hits = None
            self.last_query = None
            self.sort_crit = self.group_crit = None
            self.show = "hits"
            self.first = 0
            self.line("Query and results cleared.")
        elif lc in ("next", "n"):
            self.first += self.pagesize
            self._show_page()
        elif lc in ("prev", "p"):
            self.first = max(0, self.first - self.pagesize)
            self._show_page()
        elif action == "page":
            self.first = max(0, (self._int(args, 1) - 1) * self.pagesize)
            self._show_page()
        elif action == "pagesize":
            self.pagesize = self._int(args, 20)
            self.first = 0
            self._show_page()
        elif action == "context":
            self.context = self._int(args, 5)
            self._show_page()
        elif action == "snippetsize":
            self.snippetsize = self._int(args, 50)
            self.line(f"Snippets will show {self.snippetsize} words "
                      "of context.")
        elif action == "snippet":
            self._snippet(self._int(args, 1) - 1)
        elif action == "doc":
            self._doc_meta(self._int(args, 1) - 1)
        elif action == "doccontents":
            self._doc_contents(self._int(args, 1) - 1)
        elif action == "filter":
            self.filter = args or None
            self.line(f"Filter: {self.filter or 'cleared'}.")
        elif action == "sensitive":
            layer = _SENS.get(args, "word")
            self.sensitivity = None if layer == "word" else layer
            cs = layer in ("word_s", "word_di")
            ds = layer in ("word_s", "word_ci")
            self.line("Search defaults to "
                      f"case-{'' if cs else 'in'}sensitive and "
                      f"diacritics-{'' if ds else 'in'}sensitive")
        elif lc in ("struct", "structure"):
            self._struct()
        elif action == "sort":
            self.sort_crit = args or None
            self.first = 0
            self._show_page()
        elif action == "group":
            self.group_crit = args or None
            self.show = "groups" if args else "hits"
            self.first = 0
            self._show_page()
        elif lc in ("hits", "docs", "groups", "colloc"):
            self.show = lc
            self.first = 0
            self._show_page()
        elif lc in ("switch", "sw"):
            self.parser = ("contextql" if self.parser == "corpusql"
                           else "corpusql")
            self.line(f"Now using the {self.parser} parser.")
        elif action == "total":
            self.show_total = args in ("on", "yes", "true")
            self.line(f"Total counting {'on' if self.show_total else 'off'}.")
        elif action in ("verbose", "v"):
            self.line("Verbose mode is not needed here.")
        elif action == "repeat":
            m = re.match(r"^(\d+)\s+(.*)$", args)
            if not m:
                self.error("correct is e.g.: repeat 3 \"test\"")
            else:
                self.line(f"Repeating {m.group(1)} times: {m.group(2)}")
                for _ in range(int(m.group(1))):
                    self._dispatch(m.group(2))
        else:
            # not a command: a query in the current language
            self._query(cmd)
        return True

    @staticmethod
    def _int(s: str, default: int) -> int:
        try:
            return int(s)
        except ValueError:
            return default

    # -- query + result pages --------------------------------------------
    def _query(self, q: str) -> None:
        if self.parser == "contextql":
            self.hits = self.engine.find_contextql(q, filter=self.filter)
        else:
            self.hits = self.engine.find(q, filter=self.filter,
                                         sensitivity=self.sensitivity)
        self.last_query = q
        self.first = 0
        self.sort_crit = self.group_crit = None
        self.show = "hits"
        self._show_page()

    def _require_hits(self):
        if self.hits is None:
            raise ValueError("no query active — enter a query first")
        return self.hits

    def _sorted_hits(self):
        hits = self._require_hits()
        if self.sort_crit:
            from blacklab_spark.operators.properties import sort_hits
            return sort_hits(self.engine.index, hits, self.sort_crit)
        return hits.orderBy("doc_id", "start", "end")

    def _window(self):
        return (self._sorted_hits()
                .limit(self.first + self.pagesize)
                .collect()[self.first:])

    def _show_page(self) -> None:
        if self.hits is None:
            self.line("No query active.")
            return
        if self.show == "groups":
            self._show_groups()
            return
        if self.show == "docs":
            self._show_docs()
            return
        if self.show == "colloc":
            self._show_colloc()
            return
        window = self._window()
        rows = self._kwic_rows(window)
        for i, r in enumerate(rows, start=self.first + 1):
            self.line(f"{i:5d}. [{r['conv_id']}:{r['turn_idx']}] "
                      f"{' '.join(r['left'])} [{' '.join(r['match'])}] "
                      f"{' '.join(r['right'])}")
        if self.show_total:
            n = self.hits.count()
            nd = self.hits.select("doc_id").distinct().count()
            self.line(f"{n} hits in {nd} documents")

    def _kwic_rows(self, window, context: int | None = None):
        """KWIC rows for a bounded window, in window order."""
        if not window:
            return []
        from blacklab_spark.operators.hits import kwic
        spark = self.engine.index.spark
        wdf = spark.createDataFrame(
            [(r["doc_id"], r["start"], r["end"]) for r in window],
            "doc_id long, start int, end int")
        krows = kwic(self.engine.index, wdf, context or self.context)
        by_key = {(r["doc_id"], r["start"], r["end"]): r
                  for r in krows.collect()}
        return [by_key[(r["doc_id"], r["start"], r["end"])]
                for r in window
                if (r["doc_id"], r["start"], r["end"]) in by_key]

    def _show_docs(self) -> None:
        from blacklab_spark.operators.hits import docs_from_hits
        d = docs_from_hits(self.engine.index, self._require_hits())
        rows = (d.orderBy(F.desc("n_hits"), "doc_id")
                .limit(self.first + self.pagesize)
                .collect()[self.first:])
        meta = {r["doc_id"]: r for r in self.engine.index.doc_meta
                .filter(F.col("doc_id").isin(
                    [r["doc_id"] for r in rows]))
                .select("doc_id", "conv_id", "turn_idx").collect()}
        for i, r in enumerate(rows, start=self.first + 1):
            m = meta[r["doc_id"]]
            self.line(f"{i:5d}. [{m['conv_id']}:{m['turn_idx']}] "
                      f"{r['n_hits']} hits")
        if self.show_total:
            self.line(f"{d.count()} documents")

    def _show_groups(self) -> None:
        if not self.group_crit:
            raise ValueError("no grouping active — use: group <criterion>")
        from blacklab_spark.operators.properties import group_hits
        g = group_hits(self.engine.index, self._require_hits(),
                       self.group_crit)
        keys = [c for c in g.columns if c.startswith("key_")]
        rows = (g.orderBy(F.desc("count"), *keys)
                .limit(self.first + self.pagesize)
                .collect()[self.first:])
        for i, r in enumerate(rows, start=self.first + 1):
            ident = ":".join(str(r[k]) for k in keys)
            self.line(f"{i:5d}. {ident}  ({r['count']})")
        if self.show_total:
            self.line(f"{g.count()} groups")

    def _show_colloc(self) -> None:
        q = (self.last_query or "").strip()
        m = re.fullmatch(r"""["']([^"']+)["']""", q)
        if not m or " " in m.group(1):
            raise ValueError(
                "colloc needs a single quoted-term query active")
        rows = (self.engine.collocations(m.group(1), window=self.context)
                .orderBy(F.desc("count"), "term")
                .limit(self.first + self.pagesize)
                .collect()[self.first:])
        for i, r in enumerate(rows, start=self.first + 1):
            self.line(f"{i:5d}. {r['term']}  ({r['count']})")

    # -- per-hit / per-doc ------------------------------------------------
    def _hit_at(self, idx: int):
        if idx < 0:
            raise ValueError("hit number out of range")
        rows = self._sorted_hits().limit(idx + 1).collect()
        if idx >= len(rows):
            raise ValueError("hit number out of range")
        return rows[idx]

    def _snippet(self, idx: int) -> None:
        r = self._hit_at(idx)
        rows = self._kwic_rows([r], context=self.snippetsize)
        if rows:
            k = rows[0]
            self.line(f"{' '.join(k['left'])} [{' '.join(k['match'])}] "
                      f"{' '.join(k['right'])}")

    def _doc_row(self, idx: int, cols):
        r = self._hit_at(idx)
        return (self.engine.index.doc_meta
                .filter(F.col("doc_id") == r["doc_id"])
                .select(*cols).first())

    def _doc_meta(self, idx: int) -> None:
        m = self._doc_row(idx, ["conv_id", "turn_idx", "role", "tool",
                                "ts", "n_tokens"])
        for k in ("conv_id", "turn_idx", "role", "tool", "ts",
                  "n_tokens"):
            self.line(f"{k}: {m[k]}")

    def _doc_contents(self, idx: int) -> None:
        cols = self.engine.index.doc_meta.columns
        col = "text_raw" if "text_raw" in cols else "text"
        self.line(self._doc_row(idx, [col])[col])

    def _struct(self) -> None:
        idx = self.engine.index
        layers = [c[len("tokens_"):] for c in idx.doc_meta.columns
                  if c.startswith("tokens_")]
        self.line(f"documents: {idx.n_docs}")
        self.line(f"annotations: {['word'] + layers}")
        self.line("metadata fields: conv_id, turn_idx, role, tool, ts")


def run_repl(engine: SearchEngine, inp=None, out=None) -> None:
    """Run the REPL over stdin (or any line iterable)."""
    tool = QueryTool(engine, out=out)
    tool.line("BlackLab-Spark QueryTool. Type a query, or 'help'.")
    tool.run(inp if inp is not None else sys.stdin)
