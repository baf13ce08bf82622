"""CLI entry point — the reference's serving surface re-expressed.

The reference serves lineage over ``POST /fetch`` (body = SQL →
``List<ColLine>`` JSON, ``controller/ParseController.java:18-28``).
Library-first here; the CLI provides the same request/response shape:

    python -m hive_parse_lineage_spark lineage "INSERT INTO t SELECT ..."
    python -m hive_parse_lineage_spark run "SELECT ..."   # executes, prints rows
    echo "sql" | python -m hive_parse_lineage_spark lineage -
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hive_parse_lineage_spark")
    ap.add_argument("command", choices=["lineage", "run", "tables", "serve"])
    ap.add_argument("sql", nargs="?", default=None,
                    help="SQL text, or '-' to read stdin (unused by 'serve')")
    ap.add_argument("--sf-dir", default=None, help="testdata dir to register as views")
    ap.add_argument("--limit", type=int, default=20, help="row limit for 'run' output")
    ap.add_argument("--port", type=int, default=8080, help="port for 'serve'")
    ap.add_argument("--traverse-views", action="store_true",
                    help="expand view bodies to base tables in 'lineage'")
    args = ap.parse_args(argv)

    from hive_parse_lineage_spark.engine import Engine
    eng = Engine(sf_dir=args.sf_dir) if args.sf_dir else Engine(register_tables=False)

    if args.command == "serve":
        from hive_parse_lineage_spark.server import serve
        print(f"serving POST /fetch on :{args.port}", file=sys.stderr)
        serve(eng, port=args.port)
        return 0

    sql = sys.stdin.read() if args.sql == "-" else args.sql
    if sql is None:
        ap.error("sql is required for this command")

    if args.command == "lineage":
        print(json.dumps(eng.lineage(sql, traverse_views=args.traverse_views),
                         indent=2))
    elif args.command == "tables":
        from hive_parse_lineage_spark.plans.lineage import extract_lineage
        lin = extract_lineage(eng.spark, sql)
        print(json.dumps({"input_tables": sorted(lin.input_tables),
                          "output_tables": sorted(lin.output_tables),
                          "operations": [s.operation for s in lin.statements]},
                         indent=2))
    else:
        rows = eng.run(sql).limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
