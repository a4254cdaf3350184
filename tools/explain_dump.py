"""Dump `df.explain("formatted")` for registry queries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX query [query ...]
       python tools/explain_dump.py OUTDIR SUFFIX --all

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Only builds the plan
(no execution), so it is cheap and safe to run on a loaded box. The
session mirrors bench.py's configuration so the captured plan is the
plan the bench actually times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from bench import _build_session

    registry = entry_mod.queries()
    if names == ["--all"]:
        names = list(registry)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
