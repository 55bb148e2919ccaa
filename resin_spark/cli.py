"""spark-submit entry point (north-rule packaging requirement).

The reference ships a CLI dispatcher (`sir <command>`,
/root/reference/src/Sir.Cmd/Program.cs:47-122) with index / query /
optimize / truncate commands.  Spark-first equivalent:

    python -m resin_spark.cli package
        -> writes resin_spark.zip next to the repo for --py-files
    spark-submit --py-files resin_spark.zip -m ... cli.py build \
        --input /data/transcripts --root /data/index [--segments 8]
    ... cli.py search --root /data/index --q '{"and": {"text": "banana"}}'
    ... cli.py optimize --root /data/index        (segment compaction)
    ... cli.py truncate --root /data/index
    ... cli.py stream --input /data/incoming --root /data/index \
        --checkpoint /data/ckpt                   (incremental refresh)

When run via spark-submit the session comes from getOrCreate() so
cluster/master/memory flags are spark-submit's; standalone it builds a
local session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    from resin_spark.session import make_session

    return make_session(args.master, "resin_spark_cli")


def cmd_package(args) -> int:
    from resin_spark.session import package_zip

    print(package_zip())
    return 0


def cmd_build(args) -> int:
    from resin_spark.build import build_index, resume_build

    spark = _session(args)
    if args.format == "wet":
        from resin_spark.sources import read_wet_docs, transcripts_from_docs

        t = transcripts_from_docs(read_wet_docs(spark, args.input),
                                  id_col="url")
    else:
        t = spark.read.parquet(args.input)
    fn = resume_build if args.resume else build_index
    out = fn(spark, t, args.root, n_segments=args.segments,
             positions=args.positions)
    print(json.dumps(out))
    return 0


def cmd_search(args) -> int:
    from resin_spark.executor import SearchEngine

    spark = _session(args)
    eng = SearchEngine(spark, args.root, snapshot=args.snapshot)
    if args.model == "resin":
        # Resin's native char-bag cosine ranking (fuzzy/anagram matching)
        from resin_spark.resin_score import resin_topk

        docs = eng.documents().select("doc_id", "conv_id", "turn_idx", "text")
        out = (resin_topk(eng, args.q, k=args.k)
               .join(docs, "doc_id")
               .orderBy("score", ascending=False))
    elif args.phrase:
        # exact-phrase retrieval: --q is the raw phrase string, not JSON
        out = eng.phrase_search(args.q, field=args.field, k=args.k,
                                skip=args.skip)
    else:
        out = eng.search(json.loads(args.q), k=args.k, skip=args.skip)
    if getattr(args, "snippet", False) and args.model == "bm25":
        from resin_spark.docops import snippet_col
        from resin_spark.query import parse_query, query_terms
        from resin_spark.tokenizer import tokenize_py

        toks = (tokenize_py(args.q) if args.phrase else
                [t.token for t in query_terms(parse_query(json.loads(args.q)))
                 if t.field == args.field])
        if toks and args.field in out.columns:
            out = out.withColumn("snippet", snippet_col(args.field, toks))
    if args.out:
        # S9 JSON result sink (SearchController serializes results as
        # JSON; here: a file/table sink instead of an HTTP body)
        from resin_spark.api import write_results

        write_results(out, args.out, fmt=args.out_format,
                      single_file=bool(args.k))
        print(args.out)
    else:
        out.show(args.k, truncate=60)
    return 0


def cmd_write(args) -> int:
    """S8 write-session analog: append documents to an existing
    collection as one new segment."""
    from resin_spark.api import append_docs

    spark = _session(args)
    batch = spark.read.parquet(args.input)
    print(json.dumps(append_docs(spark, batch, args.root,
                                 segment=args.segment)))
    return 0


def cmd_optimize(args) -> int:
    from resin_spark.build import compact

    compact(_session(args), args.root)
    print("compacted")
    return 0


def cmd_truncate(args) -> int:
    from resin_spark.api import truncate

    truncate(_session(args), args.root)
    print("truncated")
    return 0


def cmd_truncate_index(args) -> int:
    """Drop only the index tables, keep docs (the reference's
    ``truncate-index`` command, Sir.Cmd/Program.cs:55-58 ->
    SessionFactory.TruncateIndex, SessionFactory.cs:79-110)."""
    from resin_spark.api import truncate_index

    truncate_index(_session(args), args.root)
    print("index truncated")
    return 0


def cmd_slice(args) -> int:
    """Copy the first ``length`` bytes of a file — the reference's
    ``slice`` sampling utility for cutting a test slice off a dump
    (Sir.Cmd/Program.cs:127-141).  A driver-local file op there and
    here."""
    if args.length < 0:
        print(f"slice: --length must be >= 0, got {args.length}")
        return 2
    # chunked copy (the reference streams via a bounded buffer,
    # Program.cs:133-139): a multi-GB slice must not become one
    # driver-resident bytes object
    written = 0
    with open(args.source, "rb") as src, open(args.result, "wb") as out:
        while written < args.length:
            chunk = src.read(min(1 << 20, args.length - written))
            if not chunk:
                break
            out.write(chunk)
            written += len(chunk)
    print(f"wrote {written} bytes to {args.result}")
    return 0


def cmd_stream(args) -> int:
    from resin_spark.streaming import stream_index

    spark = _session(args)
    q = stream_index(spark, args.input, args.root, args.checkpoint,
                     trigger_once=not args.continuous)
    q.awaitTermination()
    return 0


def cmd_serve(args) -> int:
    """Host the Q3 HTTP surface (http.ResinHttpServer) over a directory
    of collections — the Sir.HttpServer role: one driver process listens;
    each request runs as Spark jobs on the shared session."""
    from resin_spark.http import ResinHttpServer

    spark = _session(args)
    srv = ResinHttpServer(spark, args.root_dir, host=args.host,
                          port=args.port).start()
    print(f"serving {args.root_dir} on http://{srv.host}:{srv.port}")
    try:
        import signal
        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        srv.stop()
    return 0


def cmd_compare(args) -> int:
    """StringCompare analog (src/Sir.StringCompare/Program.cs:10-44):
    char-bag cosine of two strings under the same normalization as the
    resin scoring model — identical bags (anagrams like listen/silent)
    score 1.0.  Driver-only: no Spark session."""
    from resin_spark.resin_score import IDENTICAL_ANGLE, char_bag
    from resin_spark.tokenizer import tokenize_py
    from resin_spark.vectorspace import vec_cos_py

    bags = [char_bag("".join(tokenize_py(s))) for s in (args.a, args.b)]
    cos = (vec_cos_py(*bags) if all(bags) else
           (1.0 if bags[0] == bags[1] else 0.0))
    print(json.dumps({"cosine": round(cos, 6),
                      "identical": cos >= IDENTICAL_ANGLE}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="resin_spark")
    p.add_argument("--master", default="local[*]")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("package")

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--root", required=True)
    b.add_argument("--segments", type=int, default=1)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="positional postings: phrase queries verify "
                        "adjacency from the index (no docs scan)")
    b.add_argument("--format", choices=["parquet", "wet"], default="parquet",
                   help="input format: parquet transcripts or CommonCrawl WET")

    s = sub.add_parser("search")
    s.add_argument("--root", required=True)
    s.add_argument("--q", required=True,
                   help='JSON query, e.g. {"and": {"text": "banana"}}; '
                        "plain text when --model resin")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--skip", type=int, default=0)
    s.add_argument("--snapshot", type=int, default=None,
                   help="pin reads to a previous compaction snapshot "
                        "(time travel; see build.list_snapshots)")
    s.add_argument("--snippet", action="store_true",
                   help="add a highlight snippet column (token window "
                        "around the first matched text-field term)")
    s.add_argument("--phrase", action="store_true",
                   help="treat --q as a raw exact-phrase string (adjacent "
                        "tokens in order) instead of a JSON query")
    s.add_argument("--field", default="text",
                   help="field searched by --phrase (default: text)")
    s.add_argument("--model", choices=["bm25", "resin"], default="bm25",
                   help="bm25 (north rule) or resin char-bag cosine")
    s.add_argument("--out", default=None,
                   help="write results to this path instead of showing")
    s.add_argument("--out-format", choices=["json", "parquet"],
                   default="json")

    w = sub.add_parser("write")
    w.add_argument("--input", required=True,
                   help="parquet transcript batch to append")
    w.add_argument("--root", required=True)
    w.add_argument("--segment", type=int, default=None,
                   help="explicit segment id for retry-safe (idempotent) "
                        "appends; auto-allocated when omitted")

    o = sub.add_parser("optimize")
    o.add_argument("--root", required=True)

    t = sub.add_parser("truncate")
    t.add_argument("--root", required=True)

    ti = sub.add_parser("truncate-index",
                        help="drop the index, keep the docs")
    ti.add_argument("--root", required=True)

    sl = sub.add_parser("slice",
                        help="copy the first N bytes of a file "
                             "(dump sampling utility)")
    sl.add_argument("--source", required=True)
    sl.add_argument("--result", required=True)
    sl.add_argument("--length", type=int, required=True)

    st = sub.add_parser("stream")
    st.add_argument("--input", required=True)
    st.add_argument("--root", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--continuous", action="store_true")

    sv = sub.add_parser("serve")
    sv.add_argument("--root-dir", required=True,
                    help="directory whose subdirs are collections")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)

    cp = sub.add_parser("compare",
                        help="char-bag cosine of two strings "
                             "(StringCompare analog)")
    cp.add_argument("a")
    cp.add_argument("b")

    args = p.parse_args(argv)
    if args.cmd == "search" and args.model == "resin" and (
            args.phrase or args.snippet):
        # the resin branch takes precedence in cmd_search; silently
        # ignoring these flags would return char-bag results the user
        # didn't ask for
        p.error("--phrase/--snippet require --model bm25")
    return {
        "package": cmd_package,
        "build": cmd_build,
        "search": cmd_search,
        "write": cmd_write,
        "optimize": cmd_optimize,
        "truncate": cmd_truncate,
        "truncate-index": cmd_truncate_index,
        "slice": cmd_slice,
        "stream": cmd_stream,
        "serve": cmd_serve,
        "compare": cmd_compare,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
