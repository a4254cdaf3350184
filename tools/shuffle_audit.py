"""Per-query shuffle-volume audit: run queries() entries one at a time and
record total shuffle read/write bytes and peak single-stage shuffle from
the Spark stages REST API (spark.ui JSON endpoint, stdlib urllib).

"Measure, don't guess": the scale claims in SCALE.md / operator
docstrings are about SHUFFLE SHAPE (corpus never meets an exchange,
sketch-sized state, bounded candidate joins). This tool turns each claim
into a number at sf0.1 — e.g. embedding_pca's exchange must carry ~d²
partial-gram rows (kilobytes) while its input is megabytes, and
dedup_minhash's verify join must move far less than corpus × signature.

Usage: python tools/shuffle_audit.py [sf_dir] query [query ...]
       python tools/shuffle_audit.py --out SHUFFLE.json [sf_dir] q ...
       python tools/shuffle_audit.py --out SHUFFLE.json --all [sf_dir]
       python tools/shuffle_audit.py --merge SHUFFLE.json [sf_dir] q ...

--all audits every queries() entry (r9: SHUFFLE.json covers the full
registry; tests/test_shuffle_artifact.py guards against drift).
--merge updates named rows in an existing artifact instead of
overwriting it (incremental refresh after adding a query).

Byte counts are contention-immune (unlike wall-clock bench numbers), so
the sweep can run alongside other work; a failed query records an
"error" row rather than aborting the sweep.
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")


def audit(queries: list[str], sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4799")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4799/api/v1"
    app = json.load(urllib.request.urlopen(f"{base}/applications"))[0]["id"]

    def stages():
        return json.load(
            urllib.request.urlopen(f"{base}/applications/{app}/stages")
        )

    qs = entry.queries()
    out = {}
    for name in queries:
        before = {s["stageId"] for s in stages()}
        try:
            df = qs[name](spark, sf_dir)
            # noop sink: materialises the REAL plan. A count() here would
            # let Catalyst rewrite the aggregates (measured: a
            # 400k-distinct-key groupBy "shuffles" 472 bytes under
            # count()) and the audit would measure the rewrite, not the
            # query.
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {e}", flush=True)
            continue
        import time as _t
        _t.sleep(1)  # let stage metrics settle before reading the API
        rows = [s for s in stages() if s["stageId"] not in before]
        rd = sum(s.get("shuffleReadBytes", 0) for s in rows)
        wr = sum(s.get("shuffleWriteBytes", 0) for s in rows)
        peak = max(
            (s.get("shuffleWriteBytes", 0) for s in rows), default=0
        )
        inp = sum(s.get("inputBytes", 0) for s in rows)
        out[name] = {
            "n_stages": len(rows),
            "input_bytes": inp,
            "shuffle_read_bytes": rd,
            "shuffle_write_bytes": wr,
            "peak_stage_shuffle_write": peak,
        }
        print(
            f"{name}: stages={len(rows)} input={inp:,} "
            f"shuf_w={wr:,} shuf_r={rd:,} peak_stage_w={peak:,}",
            flush=True,
        )
    spark.stop()
    return out


def main():
    args = sys.argv[1:]
    out_path = None
    merge = False
    run_all = False
    while args and args[0] in ("--out", "--merge", "--all"):
        if args[0] == "--all":
            run_all = True
            args = args[1:]
        else:
            merge = args[0] == "--merge"
            out_path = args[1]
            args = args[2:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    if run_all:
        import __spark_entry__ as entry

        names = list(entry.queries().keys())
    res = audit(names, sf_dir)
    if out_path:
        payload = {"sf_dir": sf_dir, "queries": res}
        if merge:
            with open(out_path) as f:
                prev = json.load(f)
            prev["queries"].update(res)
            payload = prev
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
