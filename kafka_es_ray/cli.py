"""Runner CLI — the reference's runner entry point analog
(kafka-es-runner Main.kt:72-77: clikt subcommands wrapping the connector).

    python -m kafka_es_ray build  --input pages/ --index /tmp/idx
    python -m kafka_es_ray query  --index /tmp/idx --text "apple pie" -k 10
    python -m kafka_es_ray count  --index /tmp/idx --text "apple"
    python -m kafka_es_ray merge  --index /tmp/idx --merge-factor 8
    python -m kafka_es_ray apply  --input delta.parquet --index /tmp/idx
    python -m kafka_es_ray delete-by-query --index /tmp/idx --text "spam"

The CLI owns the Ray session (library code never calls ray.init —
the driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None) -> bool:
    """Init Ray if nobody else has; returns True when WE own the session
    (shutdown only then — never kill a caller's session)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs)
    return True


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kafka_es_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from parquet")
    b.add_argument("--input", required=True, help="parquet file/dir/glob")
    b.add_argument(
        "--format", default="parquet", choices=["parquet", "warc"],
        help="input format: parquet (default) or raw crawl archives "
        "(.warc/.warc.gz -> url/warc_ts/html rows)",
    )
    b.add_argument("--index", required=True)
    b.add_argument("--num-partitions", type=int, default=16)
    b.add_argument("--key-col", default="url")
    b.add_argument("--text-col", default="text")
    b.add_argument("--lang-col", default="lang")
    b.add_argument("--html-col", default=None)
    b.add_argument("--ts-col", default=None)
    b.add_argument("--routing-col", default=None)
    b.add_argument("--store-text", action="store_true")
    b.add_argument("--keyword-cols", default="", help="comma-separated keyword-mapped fields (terms aggs)")
    b.add_argument("--numeric-cols", default="", help="comma-separated numeric-mapped fields (range/sort/stats)")
    b.add_argument("--index-positions", action="store_true", help="index token positions (enables phrase queries)")
    b.add_argument("--resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--index", required=True, help="index dir, or an alias when --registry is given")
    q.add_argument("--registry", default=None, help="alias registry JSON (resolves --index)")
    q.add_argument("--text", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--operator", default="or", choices=["or", "and"])
    q.add_argument("--filter-lang", default=None)
    q.add_argument("--offset", type=int, default=0)
    q.add_argument("--fetch", action="store_true")
    q.add_argument("--phrase", action="store_true", help="match_phrase (requires a --index-positions build)")
    q.add_argument("--slop", type=int, default=0, help="phrase slop (window-slop semantics)")
    q.add_argument("--highlight", action="store_true", help="snippet column (requires a --store-text build)")
    q.add_argument("--range", default=None, metavar="FIELD:GTE:LTE",
                   help="numeric range filter, open side = empty (e.g. n_chars:150:400, n_chars::400)")
    q.add_argument("--sort-field", default=None, help="rank by this numeric field instead of BM25")
    q.add_argument("--sort-asc", action="store_true")
    q.add_argument("--search-after", default=None, metavar="SCORE:DOC_ID",
                   help="cursor pagination: last hit of the previous page")

    c = sub.add_parser("count", help="count matching docs (ES _count)")
    c.add_argument("--index", required=True)
    c.add_argument("--text", default=None)
    c.add_argument("--operator", default="or", choices=["or", "and"])
    c.add_argument("--prefix", default=None, help="ES prefix query instead of --text")
    c.add_argument("--wildcard", default=None, help="ES wildcard query (pre*suf) instead of --text")
    c.add_argument("--fuzzy", default=None, help="ES fuzzy query (edit distance 1) instead of --text")
    c.add_argument("--regexp", default=None, help="ES regexp query (anchored RE2) instead of --text")

    kn = sub.add_parser("knn", help="exact kNN over a dense_vector field (ES knn search)")
    kn.add_argument("--index", required=True)
    kn.add_argument("--field", required=True, help="a cfg.vector_cols field name")
    kn.add_argument("--vec", required=True, help="comma-separated query vector")
    kn.add_argument("--k", type=int, default=10)

    rr = sub.add_parser("rrf", help="hybrid BM25 + kNN search fused by reciprocal rank (ES rrf retriever)")
    rr.add_argument("--index", required=True)
    rr.add_argument("--text", required=True, help="BM25 retriever query")
    rr.add_argument("--vec", required=True, help="comma-separated kNN query vector")
    rr.add_argument("--field", required=True, help="dense_vector field for the kNN retriever")
    rr.add_argument("--k", type=int, default=10)
    rr.add_argument("--rank-window", type=int, default=100)
    rr.add_argument("--rank-constant", type=int, default=60)

    ex = sub.add_parser("explain", help="per-term BM25 breakdown for one doc (ES _explain)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--text", required=True)
    ex.add_argument("--key", required=True)

    fc = sub.add_parser("field-caps", help="mapped fields and capabilities (ES _field_caps)")
    fc.add_argument("--index", required=True)

    an = sub.add_parser("analyze", help="show analyzer token output (ES _analyze)")
    an.add_argument("--text", required=True)
    an.add_argument("--lang", default=None)

    sg = sub.add_parser("suggest", help="term (did-you-mean) or completion suggestions")
    sg.add_argument("--index", required=True)
    sg.add_argument("--probe", required=True)
    sg.add_argument("--mode", default="term", choices=["term", "completion"])
    sg.add_argument("-k", type=int, default=5)

    al = sub.add_parser("alias", help="manage index aliases (ES _aliases)")
    al.add_argument("action", choices=["add", "remove", "list"])
    al.add_argument("--registry", required=True, help="alias registry JSON path")
    al.add_argument("--name", default=None)
    al.add_argument("--indexes", nargs="*", default=None)
    al.add_argument(
        "--filter-lang", default=None,
        help="make it a FILTERED alias: searches through it apply this "
        "lang term filter (ES aliases filter analog)",
    )

    tp = sub.add_parser("template", help="manage index templates (ES _index_template)")
    tp.add_argument("action", choices=["put", "delete", "list"])
    tp.add_argument("--registry", required=True, help="registry JSON path (shared with aliases)")
    tp.add_argument("--name", default=None)
    tp.add_argument("--pattern", default=None, help="glob over new index names, e.g. 'logs-*'")
    tp.add_argument("--priority", type=int, default=0)
    tp.add_argument("--settings", default=None,
                    help='JSON EngineConfig overrides, e.g. \'{"num_partitions": 4}\'')

    eb = sub.add_parser("export-by-query", help="dump matching docs to partitioned parquet")
    eb.add_argument("--index", required=True)
    eb.add_argument("--text", required=True)
    eb.add_argument("--out", required=True)
    eb.add_argument("--operator", default="or", choices=["or", "and"])

    ro = sub.add_parser("rollover", help="roll the alias's write index when it exceeds --max-docs (ES _rollover)")
    ro.add_argument("--registry", required=True)
    ro.add_argument("--alias", required=True)
    ro.add_argument("--new-index", required=True)
    ro.add_argument("--max-docs", type=int, default=None)
    ro.add_argument("--max-age-s", type=float, default=None)
    ro.add_argument("--max-size-bytes", type=int, default=None)

    il = sub.add_parser(
        "ilm-tick",
        help="one ILM policy tick: conditional rollover + warm-generation "
        "auto-merge + retention delete (ES index-lifecycle-management analog)",
    )
    il.add_argument("--registry", required=True)
    il.add_argument("--alias", required=True)
    il.add_argument(
        "--new-index-template", required=True,
        help="format string for the next generation dir, e.g. /data/idx-gen{}",
    )
    il.add_argument("--max-docs", type=int, default=None)
    il.add_argument("--max-age-s", type=float, default=None)
    il.add_argument("--max-size-bytes", type=int, default=None)
    il.add_argument("--merge-max-segments", type=int, default=None)
    il.add_argument("--retention-generations", type=int, default=None)

    ub = sub.add_parser("update-by-query", help="set mapped fields on matching docs (ES _update_by_query)")
    ub.add_argument("--index", required=True)
    ub.add_argument("--text", required=True)
    ub.add_argument("--set", default=[], metavar="FIELD=VALUE", nargs="+",
                    help="field overrides, e.g. --set tier=gold stars=9")
    ub.add_argument("--script", default=[], metavar="FIELD=EXPR", nargs="+",
                    help="scripted numeric updates over the old values, "
                         "e.g. --script 'stars=stars * 2 + 1'")
    ub.add_argument("--operator", default="or", choices=["or", "and"])

    ri = sub.add_parser("reindex", help="rebuild from stored _source under a new config (ES _reindex)")
    ri.add_argument("--src", required=True)
    ri.add_argument("--dest", required=True)
    ri.add_argument("--num-partitions", type=int, default=None)
    ri.add_argument("--positions", action="store_true", help="index token positions (phrase queries)")
    ri.add_argument("--store-text", action="store_true")
    ri.add_argument("--query", default=None, help="ES source.query filter: reindex only matching docs")
    ri.add_argument("--script", default=[], metavar="FIELD=EXPR", nargs="+",
                    help="reindex script: numeric field = whitelisted expr "
                         "over the source numerics, e.g. --script 'stars=stars * 2'")
    ri.add_argument("--keyword-cols", default=None,
                    help="comma-separated keyword-mapped fields for the dest")
    ri.add_argument("--numeric-cols", default=None,
                    help="comma-separated numeric-mapped fields for the dest")

    sn = sub.add_parser("snapshot", help="copy the committed index state (ES _snapshot)")
    sn.add_argument("--index", required=True)
    sn.add_argument("--dest", default=None, help="plain full-copy snapshot dir")
    sn.add_argument(
        "--repo", default=None,
        help="INCREMENTAL repository dir (content-addressed blobs shared "
        "across named snapshots — unchanged segment files never re-copy)",
    )
    sn.add_argument("--name", default=None, help="snapshot name (repo mode)")

    rs = sub.add_parser("restore", help="materialize a snapshot as a fresh index")
    rs.add_argument("--snapshot", default=None, help="plain snapshot dir")
    rs.add_argument("--repo", default=None, help="repository dir (with --name)")
    rs.add_argument("--name", default=None)
    rs.add_argument("--dest", required=True)

    vf = sub.add_parser("verify", help="index integrity check (files, sort order, df)")
    vf.add_argument("--index", default=None)
    vf.add_argument(
        "--repo", default=None,
        help="verify a snapshot REPOSITORY instead: every referenced "
        "blob present with a matching content-address md5",
    )

    csn = sub.add_parser(
        "cat-snapshots", help="list a repository's snapshots (ES GET _snapshot)"
    )
    csn.add_argument("--repo", required=True)

    m = sub.add_parser("merge", help="force-merge segments (purges deletes)")
    m.add_argument("--index", required=True)
    m.add_argument("--merge-factor", type=int, default=4)

    am = sub.add_parser(
        "auto-merge",
        help="tiered merge policy: compact the smallest segments only "
        "when the live count exceeds --max-segments",
    )
    am.add_argument("--index", required=True)
    am.add_argument("--max-segments", type=int, default=8)

    a = sub.add_parser("apply", help="apply a doc/op delta batch incrementally")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--key-col", default="id")
    a.add_argument("--text-col", default="text")
    a.add_argument("--lang-col", default="lang")
    a.add_argument("--seq-col", default="seq")
    a.add_argument("--op-col", default="op")

    fo = sub.add_parser(
        "follow",
        help="tail a directory of parquet micro-batches and apply each "
        "incrementally with an offset ledger (Kafka-consumer analog)",
    )
    fo.add_argument("--input", required=True)
    fo.add_argument("--index", required=True)
    fo.add_argument("--key-col", default="id")
    fo.add_argument("--text-col", default="text")
    fo.add_argument("--lang-col", default="lang")
    fo.add_argument("--seq-col", default="seq")
    fo.add_argument("--op-col", default="op")
    fo.add_argument("--poll-s", type=float, default=1.0)
    fo.add_argument("--max-batches", type=int, default=None)
    fo.add_argument("--idle-stop-s", type=float, default=None)
    fo.add_argument(
        "--auto-merge-max-segments", type=int, default=None,
        help="run the tiered merge policy after each applied file",
    )
    fo.add_argument(
        "--alert-queries", default=None,
        help="JSON file of percolate alert queries "
        '[{"query_id": 0, "text": "...", "operator": "or"}, ...] — '
        "matches append to <index>/alerts.jsonl (ES Watcher analog)",
    )

    st = sub.add_parser("stats", help="index stats (ES _stats analog)")
    st.add_argument("--index", required=True)

    d = sub.add_parser("delete-by-query", help="tombstone all matching docs")
    d.add_argument("--index", required=True)
    d.add_argument("--text", required=True)
    d.add_argument("--operator", default="or", choices=["or", "and"])

    ci = sub.add_parser("cat-indices", help="doc counts per index (ES _cat/indices)")
    ci.add_argument("--indexes", required=True, help="comma-separated index dirs")

    cs = sub.add_parser("cat-segments", help="per-segment stats (ES _cat/segments)")
    cs.add_argument("--indexes", required=True, help="comma-separated index dirs")

    tp = sub.add_parser(
        "search-template",
        help="render a mustache template with params and search (ES _search/template)",
    )
    tp.add_argument("--index", required=True)
    tp.add_argument("--template", required=True, help="JSON source with {{var}} placeholders")
    tp.add_argument("--params", required=True, help="JSON object (one request) or array of objects")

    ms = sub.add_parser("msearch", help="run N JSON search bodies as one batch (ES _msearch)")
    ms.add_argument("--index", required=True)
    ms.add_argument("--bodies", required=True, help="JSON array of search bodies")

    args = p.parse_args(argv)
    from kafka_es_ray.config import EngineConfig

    own_session = False
    if args.cmd == "build":
        own_session = _ray_init(args.num_cpus)
        import ray.data as rd

        from kafka_es_ray.index.build import build_index

        cfg = EngineConfig(
            num_partitions=args.num_partitions,
            store_text=args.store_text,
            index_positions=args.index_positions,
            keyword_cols=tuple(c for c in args.keyword_cols.split(",") if c),
            numeric_cols=tuple(c for c in args.numeric_cols.split(",") if c),
        )
        if args.format == "warc":
            from kafka_es_ray.sources.warc import read_warc

            src_ds = read_warc(args.input)
            args.html_col = args.html_col or "html"
            args.ts_col = args.ts_col or "warc_ts"
            args.lang_col = None  # raw crawls carry no lang column
        else:
            src_ds = rd.read_parquet(args.input)
        manifest = build_index(
            src_ds,
            args.index,
            cfg,
            key_col=args.key_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            html_col=args.html_col,
            ts_col=args.ts_col,
            routing_col=args.routing_col,
            resume=args.resume,
        )
        print(json.dumps({"n_docs": manifest["n_docs"], "parts": len(manifest["parts"]), "metrics": manifest["metrics"]}))
    elif args.cmd == "query":
        from kafka_es_ray.index.aliases import resolve_full
        from kafka_es_ray.query.engine import IndexSearcher

        targets, alias_filter = (
            resolve_full(args.registry, args.index)
            if args.registry
            else ([args.index], None)
        )
        # a FILTERED alias's implicit lang filter.  ES ANDs the alias
        # filter with query filters, so an explicit --filter-lang that
        # DIFFERS from the alias's lang is the empty intersection — an
        # almost-certain operator error; refuse loudly rather than let
        # either side silently win (round-4 advice).  Equal values
        # collapse to one filter.
        if alias_filter is not None:
            if args.filter_lang and args.filter_lang != alias_filter:
                raise SystemExit(
                    f"--filter-lang {args.filter_lang!r} contradicts alias "
                    f"filter lang={alias_filter!r}: the ES AND of the two "
                    "matches nothing (drop the flag or query the index "
                    "directly)"
                )
            args.filter_lang = alias_filter
        if len(targets) > 1:
            # alias over several indexes -> the distributed multi-index path
            import pandas as pd

            own_session = _ray_init(args.num_cpus)
            from kafka_es_ray.query.engine import run_queries

            qdf = pd.DataFrame(
                {"query_id": [0], "text": [args.text], "operator": [args.operator],
                 "k": [args.k], "filter_lang": [args.filter_lang]}
            )
            print(run_queries(qdf, targets).to_pandas().to_string(index=False))
            if own_session:
                import ray

                ray.shutdown()
            return 0
        s = IndexSearcher(targets[0])
        frange = None
        if args.range:
            fld, lo, hi = args.range.split(":")
            frange = [(fld, float(lo) if lo else None, float(hi) if hi else None)]
        if args.phrase:
            res = s.search_phrase(args.text, k=args.k, slop=args.slop)
        elif args.sort_field:
            res = s.search_sorted(
                args.text, args.sort_field, ascending=args.sort_asc, k=args.k,
                operator=args.operator, filter_lang=args.filter_lang,
                filter_range=frange,
            )
        else:
            cursor = None
            if args.search_after:
                cs, cd = args.search_after.split(":")
                cursor = (float(cs), int(cd))
            res = s.search(
                args.text, k=args.k, operator=args.operator,
                filter_lang=args.filter_lang, fetch=args.fetch, offset=args.offset,
                highlight=args.highlight, filter_range=frange,
                search_after=cursor,
            )
        print(res.to_string(index=False))
    elif args.cmd == "count":
        from kafka_es_ray.query.engine import IndexSearcher

        s = IndexSearcher(args.index)
        if args.prefix:
            print(s.prefix_count(args.prefix))
        elif args.wildcard:
            print(s.wildcard_count(args.wildcard))
        elif args.fuzzy:
            print(s.fuzzy_count(args.fuzzy))
        elif args.regexp:
            print(s.regexp_count(args.regexp))
        elif args.text is None:
            p.error("count needs --text, --prefix, --wildcard, --fuzzy or --regexp")
        else:
            print(s.count(args.text, operator=args.operator))
    elif args.cmd == "knn":
        import numpy as np
        import pandas as pd

        from kafka_es_ray.query.engine import run_knn

        q = pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "vec": [[float(x) for x in args.vec.split(",")]],
                "k": np.int32(args.k),
            }
        )
        out = run_knn(q, args.index, args.field).to_pandas()
        print(out[["rank", "doc_id", "score"]].to_string(index=False))
    elif args.cmd == "rrf":
        import numpy as np
        import pandas as pd

        from kafka_es_ray.query.engine import run_rrf

        q = pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "text": [args.text],
                "vec": [[float(x) for x in args.vec.split(",")]],
                "k": np.int32(args.k),
            }
        )
        out = run_rrf(
            q, args.index, args.field,
            rank_window=args.rank_window, rank_constant=args.rank_constant,
        )
        print(out[["rank", "doc_id", "score"]].to_string(index=False))
    elif args.cmd == "explain":
        from kafka_es_ray.query.engine import IndexSearcher

        print(IndexSearcher(args.index).explain(args.text, args.key).to_string(index=False))
    elif args.cmd == "field-caps":
        from kafka_es_ray.query.engine import IndexSearcher

        print(IndexSearcher(args.index).field_caps().to_string(index=False))
    elif args.cmd == "analyze":
        from kafka_es_ray.functions.tokenizer import get_analyzer

        an_ = get_analyzer(args.lang)
        print(json.dumps({"analyzer": an_.name, "tokens": an_.tokenize(args.text)}))
    elif args.cmd == "suggest":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.query.engine import run_completion_suggest, run_term_suggest

        fn = run_term_suggest if args.mode == "term" else run_completion_suggest
        print(fn([args.probe], args.index, k=args.k).to_string(index=False))
    elif args.cmd == "alias":
        from kafka_es_ray.index.aliases import add_alias, list_aliases, remove_alias

        if args.action == "add":
            if not args.name or not args.indexes:
                p.error("alias add needs --name and --indexes")
            print(json.dumps(add_alias(
                args.registry, args.name, args.indexes,
                filter_lang=args.filter_lang,
            )))
        elif args.action == "remove":
            if not args.name:
                p.error("alias remove needs --name")
            print(json.dumps(remove_alias(args.registry, args.name)))
        else:
            print(json.dumps(list_aliases(args.registry)))
    elif args.cmd == "template":
        from kafka_es_ray.index.aliases import delete_template, list_templates, put_template

        if args.action == "put":
            if not args.name or not args.pattern or args.settings is None:
                p.error("template put needs --name, --pattern and --settings")
            print(json.dumps(put_template(
                args.registry, args.name, args.pattern,
                json.loads(args.settings), priority=args.priority,
            )))
        elif args.action == "delete":
            if not args.name:
                p.error("template delete needs --name")
            print(json.dumps(delete_template(args.registry, args.name)))
        else:
            print(json.dumps(list_templates(args.registry)))
    elif args.cmd == "export-by-query":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.incremental import export_by_query

        ds = export_by_query(args.index, args.text, args.out, operator=args.operator)
        print(json.dumps({"rows": ds.count(), "out": args.out}))
    elif args.cmd == "rollover":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.aliases import rollover

        print(json.dumps(rollover(
            args.registry, args.alias, args.new_index,
            max_docs=args.max_docs, max_age_s=args.max_age_s,
            max_size_bytes=args.max_size_bytes,
        )))
    elif args.cmd == "ilm-tick":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.aliases import ilm_tick

        print(json.dumps(ilm_tick(
            args.registry, args.alias,
            lambda g: args.new_index_template.format(g),
            max_docs=args.max_docs, max_age_s=args.max_age_s,
            max_size_bytes=args.max_size_bytes,
            merge_max_segments=args.merge_max_segments,
            retention_generations=args.retention_generations,
        )))
    elif args.cmd == "update-by-query":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.incremental import update_by_query

        fields = {}
        for kv in args.set:
            k, _, v = kv.partition("=")
            try:
                fields[k] = float(v)
            except ValueError:
                fields[k] = v
        scripts = {}
        for kv in args.script:
            k, _, v = kv.partition("=")
            scripts[k] = v
        if not fields and not scripts:
            raise SystemExit("update-by-query: need --set and/or --script")
        manifest = update_by_query(
            args.index, args.text, fields, operator=args.operator,
            set_scripts=scripts or None,
        )
        print(json.dumps({"gen": manifest.get("gen"), "n_docs": manifest["n_docs"]}))
    elif args.cmd == "reindex":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.config import EngineConfig
        from kafka_es_ray.index.reindex import reindex

        kw = {}
        if args.num_partitions:
            kw["num_partitions"] = args.num_partitions
        if args.keyword_cols:
            kw["keyword_cols"] = tuple(args.keyword_cols.split(","))
        if args.numeric_cols:
            kw["numeric_cols"] = tuple(args.numeric_cols.split(","))
        scripts = {}
        for kvs in args.script:
            k, _, v = kvs.partition("=")
            scripts[k] = v
        manifest = reindex(
            args.src, args.dest,
            EngineConfig(index_positions=args.positions, store_text=args.store_text, **kw),
            query=args.query,
            set_scripts=scripts or None,
        )
        print(json.dumps({"n_docs": manifest["n_docs"], "parts": len(manifest["parts"])}))
    elif args.cmd == "snapshot":
        if args.repo:
            if not args.name:
                p.error("snapshot --repo needs --name")
            from kafka_es_ray.index.snapshot import snapshot_to_repo

            print(json.dumps(snapshot_to_repo(args.index, args.repo, args.name)))
        else:
            if not args.dest:
                p.error("snapshot needs --dest (or --repo/--name)")
            from kafka_es_ray.index.snapshot import snapshot_index

            print(json.dumps(snapshot_index(args.index, args.dest)))
    elif args.cmd == "restore":
        if args.repo:
            if not args.name:
                p.error("restore --repo needs --name")
            from kafka_es_ray.index.snapshot import restore_from_repo

            print(json.dumps(restore_from_repo(args.repo, args.name, args.dest)))
        else:
            if not args.snapshot:
                p.error("restore needs --snapshot (or --repo/--name)")
            from kafka_es_ray.index.snapshot import restore_index

            print(json.dumps(restore_index(args.snapshot, args.dest)))
    elif args.cmd == "verify":
        if args.repo:
            from kafka_es_ray.index.snapshot import verify_repo

            rep = verify_repo(args.repo)
        else:
            if not args.index:
                p.error("verify needs --index or --repo")
            from kafka_es_ray.index.snapshot import verify_index

            rep = verify_index(args.index)
        print(json.dumps(rep))
        if not rep["ok"]:
            raise SystemExit(1)
    elif args.cmd == "cat-snapshots":
        from kafka_es_ray.index.snapshot import list_snapshots

        print(json.dumps(list_snapshots(args.repo)))
    elif args.cmd == "merge":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.merge import merge_index

        manifest = merge_index(args.index, merge_factor=args.merge_factor)
        print(json.dumps({"n_docs": manifest["n_docs"], "parts": len(manifest["parts"])}))
    elif args.cmd == "auto-merge":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.merge import auto_merge

        print(json.dumps(auto_merge(args.index, max_segments=args.max_segments)))
    elif args.cmd == "apply":
        own_session = _ray_init(args.num_cpus)
        import ray.data as rd

        from kafka_es_ray.index.incremental import apply_incremental

        manifest = apply_incremental(
            args.index,
            rd.read_parquet(args.input),
            key_col=args.key_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            seq_col=args.seq_col,
            op_col=args.op_col,
        )
        print(json.dumps({"n_docs": manifest["n_docs"], "apply_metrics": manifest["apply_metrics"]}))
    elif args.cmd == "follow":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.sources.stream import follow_directory

        alert_df = None
        if args.alert_queries:
            import pandas as pd

            alert_df = pd.read_json(args.alert_queries)
        out = follow_directory(
            args.input,
            args.index,
            key_col=args.key_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            seq_col=args.seq_col,
            op_col=args.op_col,
            poll_s=args.poll_s,
            max_batches=args.max_batches,
            idle_stop_s=args.idle_stop_s,
            auto_merge_max_segments=args.auto_merge_max_segments,
            alert_queries=alert_df,
        )
        print(json.dumps(out))
    elif args.cmd == "stats":
        from kafka_es_ray.index.segment import read_manifest

        m = read_manifest(args.index)
        print(
            json.dumps(
                {
                    "n_docs": m["n_docs"],
                    "n_segments": len(m["parts"]),
                    "num_partitions": m.get("num_partitions"),
                    "avgdl": round(float(m.get("avgdl", 0.0)), 3),
                    "n_tombstoned": m.get("n_tombstoned", 0),
                    "gen": m.get("gen", 0),
                    "analyzer_version": m.get("analyzer_version"),
                    "format_version": m.get("format_version"),
                    "metrics": m.get("metrics", {}),
                    "apply_metrics": m.get("apply_metrics", {}),
                }
            )
        )
    elif args.cmd == "delete-by-query":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.index.incremental import delete_by_query

        manifest = delete_by_query(args.index, args.text, operator=args.operator)
        print(json.dumps(manifest["last_delete_by_query"]))
    elif args.cmd == "cat-indices":
        from kafka_es_ray.query.apis import cat_indices

        print(cat_indices(args.indexes.split(",")).to_string(index=False))
    elif args.cmd == "cat-segments":
        from kafka_es_ray.query.apis import cat_segments

        print(cat_segments(args.indexes.split(",")).to_string(index=False))
    elif args.cmd == "search-template":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.query.templates import run_search_template

        params = json.loads(args.params)
        if isinstance(params, dict):
            params = [params]
        out = run_search_template(args.template, params, args.index).to_pandas()
        print(out.to_string(index=False))
    elif args.cmd == "msearch":
        own_session = _ray_init(args.num_cpus)
        from kafka_es_ray.query.apis import run_msearch

        out = run_msearch(json.loads(args.bodies), args.index).to_pandas()
        print(out.to_string(index=False))
    if own_session:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
