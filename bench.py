#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode runs every `__spark_entry__.queries()` entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], forcing full materialization with the noop
sink (no driver collect), plus a frontier-replay throughput
micro-bench over the deterministic synthetic seed corpus
(gepris_spark/sources/corpus.py). Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "frontier_urls_per_sec": ...}

`--scaling` evidences the north rule's N -> 4N criterion in-sandbox:
it re-runs the identical replay job in fresh subprocesses at two
parallelism levels (default local[8] vs local[32]) on the same input
and reports throughput at both plus efficiency = T(4N)/(4*T(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _materialize(df) -> int:
    """Force full execution without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def run_replay(spark, n_per_context: int, batch_size: int) -> dict:
    """Frontier replay throughput: seeds -> canonicalize -> URL-seen ->
    politeness schedule -> visit order, committed per micro-batch."""
    from gepris_spark.sources.corpus import gen_seeds_pdf
    from gepris_spark.streaming.microbatch import CrawlEngine, EngineConfig

    seeds_pdf = gen_seeds_pdf(n_per_context, seed=42)
    tmp = tempfile.mkdtemp(prefix="bench_replay_")
    try:
        seed_path = os.path.join(tmp, "seeds.parquet")
        seeds_pdf.to_parquet(seed_path, index=False)
        seeds = spark.read.parquet(seed_path)
        engine = CrawlEngine(
            spark, os.path.join(tmp, "state"), EngineConfig(batch_size=batch_size)
        )
        t0 = time.perf_counter()
        ledger = engine.run_seed_list(seeds)
        wall = time.perf_counter() - t0
        n_visited = sum(r["n_visited"] for r in ledger)
        return {
            "replay_sec": round(wall, 3),
            "replay_urls": int(n_visited),
            "replay_input_rows": int(len(seeds_pdf)),
            "frontier_urls_per_sec": round(n_visited / wall, 1),
            "n_batches": len(ledger),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_once(args) -> dict:
    from gepris_spark.session import get_spark

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    try:
        result: dict = {"sf": _sf_of(sf_dir), "cpus": cpus}
        if not args.replay_only:
            t0 = time.perf_counter()
            result["queries"] = run_queries(spark, sf_dir)
            result["value"] = round(time.perf_counter() - t0, 3)
            result["metric"] = "total_query_wall_seconds"
            result["unit"] = "sec"
        result.update(run_replay(spark, args.replay_seeds, args.replay_batch_size))
        if args.replay_only:
            result.update(
                metric="frontier_replay_seconds", value=result["replay_sec"], unit="sec"
            )
        return result
    finally:
        spark.stop()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_scaling(args) -> dict:
    """Same replay job at two parallelism levels in fresh subprocesses
    (fresh JVM each so executor-thread count is honest)."""
    out = {}
    for cpus in (args.scale_lo, args.scale_hi):
        cmd = [
            sys.executable,
            __file__,
            "--replay-only",
            "--cpus",
            str(cpus),
            "--replay-seeds",
            str(args.replay_seeds),
            "--replay-batch-size",
            str(args.replay_batch_size),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        out[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = out[args.scale_lo], out[args.scale_hi]
    ratio = args.scale_hi / args.scale_lo
    eff = (hi["frontier_urls_per_sec"] / lo["frontier_urls_per_sec"]) / ratio
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": -1.0,
        "scale_lo_cpus": args.scale_lo,
        "scale_hi_cpus": args.scale_hi,
        "lo_urls_per_sec": lo["frontier_urls_per_sec"],
        "hi_urls_per_sec": hi["frontier_urls_per_sec"],
        "speedup": round(hi["frontier_urls_per_sec"] / lo["frontier_urls_per_sec"], 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--replay-only", action="store_true")
    ap.add_argument("--replay-seeds", type=int, default=40_000,
                    help="seeds per context for the replay bench")
    ap.add_argument("--replay-batch-size", type=int, default=30_000)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scale-lo", type=int, default=8)
    ap.add_argument("--scale-hi", type=int, default=32)
    args = ap.parse_args()
    result = bench_scaling(args) if args.scaling else bench_once(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
