"""Interactive SQL REPL — the reference's CLI entry (main.rs:17-32, cli.rs)
re-expressed: readline history, engine shims active, slt-style rendering.

Usage: python tools/repl.py [sf_dir]
"""

from __future__ import annotations

import atexit
import os
import readline
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HISTORY = os.path.expanduser("~/.cache/templatedb_spark/history.txt")


def main() -> None:
    from templatedb_spark.engine import Engine
    from templatedb_spark.session import EngineConfig, build_session

    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    try:
        readline.read_history_file(HISTORY)
    except FileNotFoundError:
        pass
    atexit.register(readline.write_history_file, HISTORY)

    spark = build_session(EngineConfig(master="local[8]", shuffle_partitions=8))
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark)
    if len(sys.argv) > 1:
        engine.register_parquet_dir(sys.argv[1])
        print(f"registered tables from {sys.argv[1]}")

    print("templatedb-spark REPL — SQL, or 'exit'")
    while True:
        try:
            line = input("sql> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line.lower() in {"exit", "quit", "\\q"}:
            break
        try:
            if line.lower().startswith("explain "):
                print(engine.explain(line[8:]))
                continue
            for row in engine.format_rows(engine.sql(line).limit(50)):
                print("\t".join(row))
        except Exception as e:  # surface, keep REPL alive
            print(f"error: {e}")


if __name__ == "__main__":
    main()
