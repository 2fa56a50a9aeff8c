"""CLI: run any registered query by name against a fixture directory.

    python -m flink_stream_spark list [group-substring]
    python -m flink_stream_spark run <query> [sf_dir] [--explain] [-n ROWS]
    python -m flink_stream_spark sql "<SELECT ...>" [sf_dir]

`run` builds the query's DataFrame plan and shows the first rows (and,
with --explain, the formatted physical plan). `sql` registers the
fixture tables as temp views and runs arbitrary Spark SQL over them —
the interactive stand-in for the reference's Trino shell
(reference README.md:175-179).
"""

from __future__ import annotations

import sys


def _load_registry():
    # import every operator module so the registry is fully populated
    import importlib

    for m in (
        "relational", "tpch_extra", "tpch_more", "events",
        "events_analytics", "dedup", "similarity", "text", "text_rank",
        "quality", "corpus_ops", "sampling", "multimodal", "udfs",
        "misc", "pipeline", "cdc", "graph",
    ):
        importlib.import_module(f"flink_stream_spark.operators.{m}")
    from flink_stream_spark.operators import REGISTRY

    return REGISTRY


def main(argv: list[str]) -> int:
    from flink_stream_spark import get_spark, load_tables
    from flink_stream_spark.catalog import DEFAULT_SF_DIR

    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, args = argv[0], argv[1:]
    registry = _load_registry()

    if cmd == "list":
        needle = args[0].lower() if args else ""
        for name in sorted(registry):
            spec = registry[name]
            line = f"{name}  [{spec.group or '-'}]"
            if needle in line.lower():
                print(line)
        return 0

    if cmd == "run":
        if not args:
            print("usage: run <query> [sf_dir] [--explain] [-n ROWS]")
            return 2
        name = args[0]
        rest = args[1:]
        explain = "--explain" in rest
        rest = [a for a in rest if a != "--explain"]
        n = 20
        if "-n" in rest:
            i = rest.index("-n")
            n = int(rest[i + 1])
            del rest[i : i + 2]
        sf_dir = rest[0] if rest else DEFAULT_SF_DIR
        if name not in registry:
            print(f"unknown query {name!r}; `list` shows all {len(registry)}")
            return 2
        spark = get_spark("flink_stream_spark-cli")
        df = registry[name].build(spark, sf_dir)
        if explain:
            df.explain("formatted")
        df.show(n, truncate=False)
        return 0

    if cmd == "sql":
        if not args:
            print('usage: sql "<SELECT ...>" [sf_dir]')
            return 2
        query = args[0]
        sf_dir = args[1] if len(args) > 1 else DEFAULT_SF_DIR
        spark = get_spark("flink_stream_spark-cli")
        load_tables(spark, sf_dir)
        spark.sql(query).show(50, truncate=False)
        return 0

    print(f"unknown command {cmd!r}")
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
