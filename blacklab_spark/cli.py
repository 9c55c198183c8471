"""CLI entry points — the ``spark-submit --py-files`` surface.

Build (cluster launch — ``blacklab_spark.zip`` from
``shipping.make_pkg_zip``; ``cli.py`` is the application file and the
zip puts the package on the driver's and every executor's sys.path):
    spark-submit --master <cluster> --py-files blacklab_spark.zip \\
        path/to/cli.py build \\
        --input /data/transcripts_parquet --out /indexes/conv \\
        [--resume] [--block-size 128] [--bucket-size 8192]
End-to-end smoke of exactly this launch: tests/test_cli.py.

Query:
    python -m blacklab_spark.cli query --index /indexes/conv \\
        --terms "visa application" [--k 10] [--mode wand|exhaustive] \\
        [--role assistant] [--json]

Mirrors the reference's IndexTool / QueryTool pair
(reference: tools/src/main/java/nl/inl/blacklab/tools/IndexTool.java:46,
querytool/QueryToolImpl.java).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build(args) -> int:
    from blacklab_spark.build import build_index
    from blacklab_spark.config import BuildConfig
    from blacklab_spark.session import get_spark
    from blacklab_spark.sources.files import read_transcripts
    spark = get_spark("blacklab-build")
    df = read_transcripts(spark, args.input, args.format)
    cfg = BuildConfig(block_size=args.block_size,
                      bucket_size=args.bucket_size,
                      store_positions=not args.no_positions,
                      preprocess=tuple(args.preprocess or ()))
    t0 = time.time()
    manifest = build_index(spark, df, args.out, cfg, resume=args.resume)
    dur = time.time() - t0
    out = {"out": args.out, "seconds": round(dur, 2),
           "turns": manifest["stats"]["n_docs"],
           "turns_per_sec": round(manifest["stats"]["n_docs"] / dur, 1),
           "stages": manifest["stages"]}
    print(json.dumps(out, indent=2))
    return 0


def _query(args) -> int:
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.session import get_spark
    given = [x for x in (args.terms, args.cql, args.contextql)
             if x is not None]
    if len(given) != 1:
        print("exactly one of --terms / --cql / --contextql required",
              file=sys.stderr)
        return 2
    spark = get_spark("blacklab-query")
    eng = SearchEngine.open(spark, args.index)
    t0 = time.time()
    filters = dict(role=args.role, tool=args.tool, conv_id=args.conv_id,
                   filter=args.filter)
    if args.cql is not None:
        # QueryTool ParserCorpusQl analog: hits frame, capped at --k
        df = eng.find(args.cql, **filters).limit(args.k)
    elif args.contextql is not None:
        # QueryTool ParserContextQl analog
        df = eng.find_contextql(args.contextql, **filters).limit(args.k)
    elif args.phrase:
        df = eng.phrase_hits(args.terms, **filters)
    else:
        df = eng.topk(args.terms, k=args.k, mode=args.mode, **filters)
    rows = [r.asDict() for r in df.collect()]
    dur = time.time() - t0
    if args.json:
        print(json.dumps({"latency_sec": round(dur, 3), "rows": rows},
                         default=str))
    else:
        for r in rows:
            print(r)
        print(f"-- {len(rows)} rows in {dur:.3f}s", file=sys.stderr)
    return 0


def _delete(args) -> int:
    from blacklab_spark.delete import delete_docs
    from blacklab_spark.index import open_index
    from blacklab_spark.session import get_spark
    spark = get_spark("blacklab-delete")
    n = delete_docs(open_index(spark, args.index), args.where)
    print(json.dumps({"index": args.index, "deleted": n}))
    return 0


def _compact(args) -> int:
    from blacklab_spark.delete import compact
    from blacklab_spark.session import get_spark
    spark = get_spark("blacklab-compact")
    t0 = time.time()
    idx = compact(spark, args.index, args.out)
    print(json.dumps({"out": args.out, "n_docs": idx.n_docs,
                      "seconds": round(time.time() - t0, 2)}))
    return 0


def start_server(index: str, corpus: str = "corpus", port: int = 8080,
                 cache_size: int = 128, data_dir: str | None = None):
    """Open the index and start the BLS-style HTTP server (returns
    the running BlsServer; the CLI wrapper blocks on it).
    ``data_dir`` enables the index-management write path."""
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.server import BlsServer
    from blacklab_spark.session import get_spark
    spark = get_spark("blacklab-serve")
    eng = SearchEngine.open(spark, index, cache_size=cache_size)
    srv = BlsServer(eng, corpus=corpus, port=port, data_dir=data_dir)
    srv.start()
    return srv


def _repl(args) -> int:
    from blacklab_spark.engine import SearchEngine
    from blacklab_spark.querytool import run_repl
    from blacklab_spark.session import get_spark
    spark = get_spark("blacklab-repl")
    run_repl(SearchEngine.open(spark, args.index))
    return 0


def _serve(args) -> int:
    srv = start_server(args.index, args.corpus, args.port,
                       args.cache_size, args.data_dir)
    print(json.dumps({"serving": f"http://127.0.0.1:{srv.port}"
                                 f"/blacklab-server/{args.corpus}",
                      "port": srv.port}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="blacklab_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from transcripts parquet")
    b.add_argument("--input", required=True)
    b.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "csv", "tsv", "xml",
                            "conllu", "txt", "iceberg"])  # = sources.files.READERS
    b.add_argument("--out", required=True)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--bucket-size", type=int, default=8192)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--preprocess", action="append", default=[],
                   metavar="NAME",
                   help="registered convert-and-tag preprocessor to "
                        "run before indexing (repeatable, applied in "
                        "order; see blacklab_spark.preprocess)")
    b.set_defaults(fn=_build)

    q = sub.add_parser("query",
                       help="BM25 top-k / phrase / CQL / ContextQL "
                            "(QueryTool analog)")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", help="BM25 top-k terms (or --phrase)")
    q.add_argument("--cql", help="corpus query language pattern → hits")
    q.add_argument("--contextql",
                   help="SRU contextual query language query")
    q.add_argument("--filter",
                   help="Lucene-classic metadata filter (filterlang="
                        "luceneql), ANDed with --role/--tool/--conv-id")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="auto",
                   choices=["auto", "wand", "exhaustive"])
    q.add_argument("--phrase", action="store_true")
    q.add_argument("--role")
    q.add_argument("--tool")
    q.add_argument("--conv-id", dest="conv_id")
    q.add_argument("--json", action="store_true")
    q.set_defaults(fn=_query)

    d = sub.add_parser("delete",
                       help="tombstone docs matching a SQL predicate "
                            "(IndexTool delete analog)")
    d.add_argument("--index", required=True)
    d.add_argument("--where", required=True,
                   help="SQL predicate over doc_meta columns, e.g. "
                        "\"conv_id = 'conv00003'\"")
    d.set_defaults(fn=_delete)

    c = sub.add_parser("compact",
                       help="rebuild the index without tombstoned docs")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=_compact)

    s = sub.add_parser("serve",
                       help="serve the index over HTTP with the "
                            "BLS-style endpoints (server.py)")
    s.add_argument("--index", required=True)
    s.add_argument("--corpus", default="corpus")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--cache-size", type=int, default=128,
                   help="serving result cache entries (0 = off)")
    s.add_argument("--data-dir", default=None,
                   help="writable root for API-created indexes "
                        "(enables create/add/delete over HTTP)")
    s.set_defaults(fn=_serve)

    r = sub.add_parser("repl",
                       help="interactive query REPL (the reference's "
                            "QueryTool, querytool.py)")
    r.add_argument("--index", required=True)
    r.set_defaults(fn=_repl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
