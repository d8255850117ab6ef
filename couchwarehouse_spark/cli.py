"""Command-line entry point — the reference CLI, Spark-shaped.

Mirrors ``reference bin/couchwarehouse.bin.js:6-21`` option for
option: ``--database``, ``--reset``, ``--split``, ``--transform``,
``--query`` (Mango selector), ``--verbose``. Two deltas, both forced
by the environment rather than design:

* the source is a spooled changes-feed directory (JSON lines) instead
  of a live CouchDB URL — the network client is out of scope here,
  and every downstream semantic (spool → monitor lifecycle, resume,
  split, transform, selector) is identical;
* ``--databaseType`` is gone — the warehouse IS the target (parquet
  tables + Spark SQL); JDBC/ES egress lives in ``sinks/``.

Usage::

    python -m couchwarehouse_spark --feed ./landing --database mydb \\
        --warehouse-dir ./wh --split type --query '{"status":"paid"}' \\
        --sql 'SELECT count(*) FROM mydb_order'
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from collections.abc import Callable


def _load_doc_transform(path: str) -> Callable[[dict], dict]:
    """Load a user transform module exposing ``transform(doc) -> doc``
    (the reference's ``--transform ./f.js``, reference
    index.js:198-200, in Python)."""
    spec = importlib.util.spec_from_file_location("cw_user_transform", path)
    if spec is None or spec.loader is None:
        raise SystemExit(f"couchwarehouse: cannot load transform {path!r}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn = getattr(mod, "transform", None)
    if not callable(fn):
        raise SystemExit(
            f"couchwarehouse: {path!r} must define transform(doc) -> doc"
        )
    return fn


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="couchwarehouse-spark",
        description="Spool a CouchDB-style changes feed into queryable Spark tables.",
    )
    p.add_argument("--feed", "-f", required=True,
                   help="directory of spooled changes-feed JSON lines")
    p.add_argument("--database", "--db", "-d", required=True,
                   help="database name (table name prefix)")
    p.add_argument("--warehouse-dir", "-w", default="./couchwarehouse",
                   help="directory holding the warehouse tables")
    p.add_argument("--reset", "-r", action="store_true",
                   help="ignore previously loaded data and start again")
    p.add_argument("--split", "-s", default=None,
                   help="doc field that routes documents into per-type tables")
    p.add_argument("--query", "-q", default=None,
                   help="Mango selector JSON filtering the feed")
    p.add_argument("--transform", "-t", default=None,
                   help="path to a Python file defining transform(doc) -> doc")
    p.add_argument("--monitor", action="store_true",
                   help="after spooling, keep tailing the feed continuously")
    p.add_argument("--processing-time", default="10 seconds",
                   help="monitor-mode trigger interval")
    p.add_argument("--sql", default=None,
                   help="SQL to run against the warehouse after spooling (R17)")
    p.add_argument("--compact", action="store_true",
                   help="after spooling, compact fragmented bucket dirs")
    p.add_argument("--quiet", action="store_true",
                   help="suppress progress/instruction output")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    selector = None
    if args.query:
        try:
            selector = json.loads(args.query)
        except json.JSONDecodeError as exc:  # reference index.js:202-214
            raise SystemExit(f"couchwarehouse: invalid Mango selector: {exc}")

    doc_transform = _load_doc_transform(args.transform) if args.transform else None

    from couchwarehouse_spark.session import get_spark
    from couchwarehouse_spark.warehouse import Warehouse

    spark = get_spark(app_name=f"couchwarehouse_{args.database}")
    wh = Warehouse(
        spark,
        args.warehouse_dir,
        args.database,
        split=args.split,
        doc_transform=doc_transform,
        selector=selector,
        reset=args.reset,
        verbose=not args.quiet,
    )

    if args.monitor:
        q = wh.start(args.feed, monitor=True, processing_time=args.processing_time)
        try:
            q.awaitTermination()
        except KeyboardInterrupt:  # reference stops on SIGINT
            q.stop()
        return 0

    last = wh.spool(args.feed)
    if not args.quiet:
        print(f"couchwarehouse: spooled through seq {last}")
    if args.compact:
        for doc_type in wh.schemas:
            n = wh.compact(doc_type)
            if n and not args.quiet:
                print(f"couchwarehouse: compacted {n} buckets of {doc_type}")
    if args.sql:
        wh.query(args.sql).show(50, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
