"""Benchmark harness: runs the headline queries from __spark_entry__.queries()
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the NOOP SINK
(`df.write.format("noop")`) — the full physical plan runs, nothing
materialises on the driver. Earlier rounds used `count()`, which lets
Catalyst REWRITE the plan before timing it: a count over a final
aggregate can prune the aggregate's value expressions (measured: a
400k-distinct-key groupBy "shuffles" 472 bytes under count(), and
q1/table_profile ran 3-5x faster under count() than their real plans).
Round-5 session 3 found this while building the shuffle audit
(tools/shuffle_audit.py) and switched; numbers from earlier rounds are
therefore flattering for agg-final and map-only queries and are NOT
comparable query-for-query with the noop-sink protocol.

Measurement protocol (recorded as "protocol" in the JSON):

* Each query runs in its OWN forked JVM (a subprocess with a fresh
  SparkSession), exactly like JMH forks benchmarks. A single shared JVM
  suffers JIT profile pollution: 29 queries' generated classes share
  megamorphic call sites in the interpreted-expression and codegen runtime,
  and each newly loaded query triggers deoptimisation storms that made
  earlier-measured queries 4-15x slower with run-to-run variance of the same
  magnitude (measured: lang_id 0.7s clean vs 12.3s mid-suite). Forking
  bounds every query's profile to its own plan. Fork startup (~8s) is not
  billed.
* Within the fork the query runs once COLD, then 1-3 ADAPTIVE steady runs;
  the billed number is the MIN over the steady runs. The cold run pays
  one-time per-plan costs — Janino codegen compilation, JVM tiered-JIT
  warmup of the generated classes, parquet footer reads — that are fixed
  overhead amortised to nothing over a 100 TB job but can be 3-5x the
  steady-state time at sf0.1; it is reported separately in "cold_run_sec".
  Sample count scales with magnitude (early-exit after 1 steady run <=1 s,
  2 runs <=2 s, else 3): sub-second queries have small absolute noise,
  while multi-second queries dominate the suite total and single-run noise
  measured up to 40% on this box. Caches are cleared between runs, so
  every billed run re-executes the full plan (no result reuse — only
  compiled-code reuse).
* The result JSON is printed to stdout AND written to $SPARK_GRAFT_BENCH_OUT
  (default BENCH.json next to this file) — stdout capture windows truncate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ndr_import_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _run_single(name: str, sf_dir: str, cpus: str) -> int:
    """Fork body: run one query twice, print one JSON line."""
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    spark = _build_session(cpus)
    out = {"name": name}
    try:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out["cold"] = round(time.perf_counter() - t0, 4)
        steady = []
        for i in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            steady.append(time.perf_counter() - t0)
            # sample-count scales with magnitude: sub-second queries take
            # one steady sample (absolute noise is small), multi-second
            # queries take up to three — single-run noise measured up to
            # 40% on this box, and the heavies dominate the suite total
            if i == 0 and steady[0] <= 1.0:
                break
            if i == 1 and steady[1] <= 2.0:
                break
        out["sec"] = round(min(steady), 4)
    except Exception as e:  # noqa: BLE001
        out["error"] = f"{type(e).__name__}: {e}"
    print("BENCH_SINGLE " + json.dumps(out), flush=True)
    spark.stop()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if len(sys.argv) == 3 and sys.argv[1] == "--single":
        return _run_single(sys.argv[2], sf_dir, cpus)

    # derive sf from the dir name (e.g. .../sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry_mod  # queries() builds no session

    names = list(entry_mod.queries().keys())
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0

    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"),
    )

    load_seen: dict[str, float] = {}

    def emit() -> None:
        payload = json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                # NaN (failed/hung query) -> null: bare NaN is not JSON and
                # would make the driver's strict parse reject the artifact
                "queries": {k: (v if v == v else None) for k, v in timings.items()},
                "sf": sf,
                "protocol": "forked_jvm_min_of_adaptive_steady_runs_noop_sink",
                "cold_run_sec": cold,
                "start_load1": load_seen,
            },
            allow_nan=False,
        )
        print(payload, flush=True)
        # stdout tails get truncated by capture harnesses (BENCH_r02.json
        # lost six queries that way) — the file is the artifact of record
        try:
            with open(out_path, "w") as f:
                f.write(payload + "\n")
        except OSError as e:
            sys.stderr.write(f"bench: could not write {out_path}: {e}\n")

    # a driver-side `timeout` must still yield a JSON artifact: print the
    # queries measured so far on SIGTERM/SIGINT before exiting
    import signal

    def _on_term(signum, frame):  # noqa: ARG001
        sys.stderr.write(f"bench interrupted (signal {signum}); partial results\n")
        emit()
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # r6 VERDICT item 6: the committed batch artifact carried up to 3.8x
    # contention from OTHER processes (pytest/oracle runs sharing the
    # box), not from the serial forks themselves. Gate each fork on a
    # quiet machine so batch numbers ~= standalone numbers, and record
    # the load actually observed so a contended number can never pass
    # silently.
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "4.0"))

    def wait_quiet(deadline_s: float = 300.0) -> float:
        waited = 0.0
        load = os.getloadavg()[0]
        while load > max_load and waited < deadline_s:
            time.sleep(10.0)
            waited += 10.0
            load = os.getloadavg()[0]
        if load > max_load:
            sys.stderr.write(
                f"bench: proceeding at load {load:.1f} > {max_load} "
                f"after {waited:.0f}s wait — numbers may be contended\n"
            )
        return load

    for name in names:
        load_seen[name] = round(wait_quiet(), 2)
        # own process group so a timeout kill reaps the Spark JVM child
        # too: SIGKILLing only the python fork orphans a 24g-heap JVM
        # that keeps running the hung plan on every core and contaminates
        # all remaining measurements
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--single", name],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            start_new_session=True,
        )
        try:
            out_s, err_s = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            import signal as _signal

            try:
                os.killpg(os.getpgid(p.pid), _signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.wait()
            # one hung query must not abort the suite: record NaN, move on
            sys.stderr.write(f"bench {name} FAILED: timeout (600s)\n")
            timings[name] = float("nan")
            continue

        class _Proc:
            stdout = out_s
            stderr = err_s
            returncode = p.returncode

        proc = _Proc()
        dt = float("nan")
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_SINGLE "):
                rec = json.loads(line[len("BENCH_SINGLE "):])
                if "error" in rec:
                    sys.stderr.write(f"bench {name} FAILED: {rec['error']}\n")
                else:
                    dt = rec["sec"]
                    cold[name] = rec["cold"]
                break
        else:
            sys.stderr.write(
                f"bench {name} FAILED: no result (rc={proc.returncode})\n"
                + proc.stderr[-2000:]
                + "\n"
            )
        timings[name] = round(dt, 4) if dt == dt else dt
        if dt == dt:  # not NaN
            total += dt

    emit()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
