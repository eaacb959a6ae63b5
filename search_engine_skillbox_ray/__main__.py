"""CLI: build, search, stats, reindex — the reference's four endpoints
as commands (SURVEY §2.11).

  python -m search_engine_skillbox_ray build  --pages DIR --index DIR [--buckets N]
  python -m search_engine_skillbox_ray search --index DIR --query "..." [--site URL]
                                              [--offset K] [--limit K] [--mode or|and]
  python -m search_engine_skillbox_ray stats  --index DIR
  python -m search_engine_skillbox_ray reindex --index DIR --url URL (--html FILE | --text "...")

Owns a Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="search_engine_skillbox_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--site", default=None)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--mode", default="or", choices=["or", "and"])
    s.add_argument("--scorer", default="tfidf", choices=["tfidf", "bm25"])

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)

    r = sub.add_parser("reindex")
    r.add_argument("--index", required=True)
    r.add_argument("--url", required=True)
    r.add_argument("--html", default=None, help="path to an html file")
    r.add_argument("--text", default=None)

    args = p.parse_args(argv)

    if args.cmd == "build":
        _ray_up()
        import ray

        import search_engine_skillbox_ray as ses
        from search_engine_skillbox_ray.sources.pages import derive_sites, read_pages

        pages = read_pages(args.pages, fmt=args.format)
        sites = derive_sites(
            read_pages(args.pages, columns=["url"], fmt=args.format)
        )
        res = ses.build_index_from_pages(
            pages,
            args.index,
            sites,
            ses.BuildConfig(n_buckets=args.buckets),
            input_token=args.pages,
            pages_path=args.pages if args.format == "parquet" else None,
        )
        print(json.dumps({"result": True, "n_docs": res.n_docs, "n_terms": res.n_terms,
                          "n_postings": res.n_postings, "seconds": round(res.seconds, 2)}))
        ray.shutdown()
        return 0

    if args.cmd == "search":
        from search_engine_skillbox_ray.state.engine import SearchEngine

        eng = SearchEngine(args.index, mode=args.mode, scorer=args.scorer)
        print(json.dumps(
            eng.search(args.query, site=args.site, offset=args.offset, limit=args.limit),
            ensure_ascii=False, indent=1,
        ))
        return 0

    if args.cmd == "stats":
        from search_engine_skillbox_ray.state.engine import SearchEngine

        print(json.dumps(SearchEngine(args.index).statistics(), ensure_ascii=False, indent=1))
        return 0

    if args.cmd == "reindex":
        from search_engine_skillbox_ray.state.updater import IndexUpdater

        html = None
        if args.html:
            with open(args.html, "rb") as fh:
                html = fh.read()
        print(json.dumps(
            IndexUpdater(args.index).index_page(args.url, html=html, text=args.text),
            ensure_ascii=False,
        ))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
