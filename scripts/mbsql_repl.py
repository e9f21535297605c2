"""MacroBase SQL REPL — the reference's primary UX
(sql/.../MacroBaseSQLRepl.java) over the Spark engine.

    python scripts/mbsql_repl.py [--base-dir DIR] [-f script.sql]

Statements end with ';'. Supports the full translated dialect: IMPORT FROM
CSV, SELECT ... FROM DIFF (...) ON ... [COMPARE BY ...], SPLIT, the
percentile() UDF in SELECT/WHERE, and any plain Spark SQL. `exit;` quits.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dir", default=os.getcwd(),
                    help="base directory for relative IMPORT paths")
    ap.add_argument("-f", "--file", default=None,
                    help="run a ;-separated SQL script instead of the REPL")
    ap.add_argument("--master", default=os.environ.get("SPARK_MASTER",
                                                       "local[*]"))
    args = ap.parse_args()

    from macrobase_spark.session import get_spark
    from macrobase_spark.sql import MacroBaseSQL

    spark = get_spark("mbsql", master=args.master)
    mb = MacroBaseSQL(spark, base_dir=args.base_dir)

    def run(text: str) -> None:
        df = mb.execute(text)
        if df is not None:
            df.show(50, truncate=False)

    if args.file:
        run(open(args.file).read())
        return

    print("MacroBase SQL on Spark — end statements with ';', 'exit;' quits")
    buf: list[str] = []
    while True:
        try:
            line = input("mbsql> " if not buf else "    -> ")
        except EOFError:
            break
        buf.append(line)
        if line.rstrip().endswith(";"):
            stmt = "\n".join(buf).strip().rstrip(";")
            buf = []
            if stmt.lower() in ("exit", "quit"):
                break
            try:
                run(stmt)
            except Exception as exc:  # keep the REPL alive on bad SQL
                print(f"error: {exc}")


if __name__ == "__main__":
    main()
