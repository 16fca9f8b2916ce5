"""CLI entry — `spark-submit --py-files search_ingest_spark.zip -m ...`
or `python -m search_ingest_spark`.

Mirrors the reference's one-shot CLI flags (`/root/reference/src/app.cr:37-38,
149-163`): `--backfill` / `--reindex` run once and exit; `--query` runs a
top-k search against an existing index.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="search_ingest_spark")
    p.add_argument("--catalog", required=True, help="index catalog directory")
    p.add_argument("--pages", help="parquet path of the pages table")
    p.add_argument("--backfill", action="store_true")
    p.add_argument("--reindex", action="store_true")
    p.add_argument("--query", help="run a BM25 top-k query")
    p.add_argument("--phrase", help="run a match_phrase top-k query "
                                    "(index must be built with positions)")
    p.add_argument("--match-all", action="store_true",
                   help="conjunctive (AND) query semantics")
    p.add_argument("--filter", action="append", metavar="ATTR=VALUE",
                   help="filter-context equality over doc_attrs "
                        "(repeatable)")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--mode", default="standard", choices=["standard", "simple"])
    p.add_argument("--docs-per-shard", type=int, default=100_000)
    args = p.parse_args(argv)

    from search_ingest_spark.api import SearchIngestService
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.session import get_spark

    spark = get_spark("search_ingest_spark_cli")
    cat = Catalog(spark, args.catalog)
    svc = SearchIngestService(spark, cat, mode=args.mode,
                              docs_per_shard=args.docs_per_shard)

    if args.reindex or args.backfill:
        if not args.pages:
            p.error("--backfill/--reindex require --pages")
        pages = spark.read.parquet(args.pages)
        out = svc.reindex(pages) if args.reindex else svc.backfill(pages)
        print(json.dumps(out))
    if args.query is not None:
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, cat)
        attr_filter = dict(
            kv.split("=", 1) for kv in (args.filter or [])
        ) or None
        rows = s.topk(args.query, args.k, match_all=args.match_all,
                      attr_filter=attr_filter).collect()
        print(json.dumps({
            "query": args.query,
            "hits": [{"doc_id": r["doc_id"], "score": r["score"],
                      "rank": r["rank"]} for r in rows],
        }))
    if args.phrase is not None:
        from search_ingest_spark.query.phrase import PhraseSearcher

        rows = PhraseSearcher(spark, cat).topk(args.phrase, args.k).collect()
        print(json.dumps({
            "phrase": args.phrase,
            "hits": [{"doc_id": r["doc_id"], "score": r["score"],
                      "rank": r["rank"]} for r in rows],
        }))
    if not (args.backfill or args.reindex or args.query or args.phrase):
        print(json.dumps(svc.version()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
