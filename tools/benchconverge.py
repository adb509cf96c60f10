#!/usr/bin/env python3
"""Convergence-verified full-catalog bench record (VERDICT r18 #1).

A single-run cpu_total on this box is +-30% (host frequency capping
inflates even executorCpuTime — proven r18), so the committed record's
headline was not comparable round-over-round. This script applies the
SAME estimator tools/scaling.py already uses for tier cells — repeats
with cooldowns, keep each query's least-disturbed measurement — to the
full catalog record:

 1. run graft.Bench (one fresh JVM) N times with a 60 s cooldown
    between runs; the FIRST run times the DuckDB oracles, later runs
    set SPARK_GRAFT_SKIP_ORACLE=1 (oracle wall does not depend on
    engine warm state, and re-timing it would double the session);
 2. after every run, check convergence: the two smallest whole-run
    cpu_totals within `TOL` (10%) of each other -> stop (a disturbed
    window inflates cpu, it never deflates it, so agreement of the two
    minima is agreement of the two least-disturbed sessions);
 3. merge-min per query by cpu_ms (each query's sec + metrics come
    from whichever run measured that query cheapest — the standard
    noise-robust estimator, per-query because disturbance is a
    per-window event, not a per-session constant);
 4. write the merged record to BENCH_LOCAL_LAST.json with
    `cpu_total_runs` (every raw run's cpu_total, the reproducibility
    evidence), `runs`, `converged`, and a recomputed `oracle_gate`.

Usage: python3 tools/benchconverge.py [sf_dir] [max_runs]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 0.10
# keep in sync with Bench.scala's gate: recall-GATE queries have no
# identical-algorithm DuckDB twin; sub-0.5 s oracles measure fixed
# overhead, not throughput
RECALL_GATE = {"hnsw_partition_search", "nsg_partition_search",
               "nndescent_index_search", "knn_graph_nndescent"}


def run_bench(sf_dir: str, idx: int, skip_oracle: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    if skip_oracle:
        env["SPARK_GRAFT_SKIP_ORACLE"] = "1"
    print(f"[converge] bench run {idx} "
          f"({'no oracle' if skip_oracle else 'with oracle'}) ...",
          flush=True)
    t0 = time.time()
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=REPO,
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open(os.path.join(REPO, "BENCH_LOCAL_LAST.json")) as f:
        rec = json.load(f)
    stash = os.path.join(REPO, "target", f"bench_run{idx}.json")
    os.makedirs(os.path.dirname(stash), exist_ok=True)
    with open(stash, "w") as f:
        json.dump(rec, f)
    print(f"[converge]   run {idx}: wall {rec['value']:.1f} s, "
          f"cpu_total {rec['cpu_total']:.1f} s "
          f"({time.time() - t0:.0f} s incl. sbt/oracle)", flush=True)
    return rec


def cpu_ms(metrics_entry) -> int:
    m = (json.loads(metrics_entry) if isinstance(metrics_entry, str)
         else metrics_entry)
    return m.get("cpu_ms", m.get("task_ms", 0))


def merge(runs: list) -> dict:
    base = dict(runs[0])  # oracle/notes/sf from the oracle-timed run
    queries, metrics = {}, {}
    for q in runs[0]["queries"]:
        best = min(runs, key=lambda r: cpu_ms(r["metrics"][q]))
        queries[q] = best["queries"][q]
        metrics[q] = best["metrics"][q]
    base["queries"] = queries
    base["metrics"] = metrics
    base["value"] = round(sum(queries.values()), 3)
    base["cpu_total"] = round(
        sum(cpu_ms(m) for m in metrics.values()) / 1000.0, 3)
    # recompute ratios with the merged spark times against run 1's
    # duck times (identical SQL on identical parquet — duck variance
    # is not what this record converges)
    oracle = {}
    for q, o in runs[0].get("oracle", {}).items():
        if q in queries and o.get("duck", 0) > 0:
            oracle[q] = {"spark": round(queries[q], 3), "duck": o["duck"],
                         "ratio": round(queries[q] / o["duck"], 2)}
    base["oracle"] = oracle
    gated = {q: o for q, o in oracle.items()
             if o["duck"] >= 0.5 and q not in RECALL_GATE}
    gt2x = sorted(q for q, o in gated.items() if o["ratio"] > 2.0)
    base["oracle_gate"] = {
        "n": len(gated),
        "ratio_max": max((o["ratio"] for o in gated.values()), default=0.0),
        "gt2x": gt2x}
    base["failed"] = sorted({f for r in runs for f in r.get("failed", [])})
    return base


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    runs = []
    while len(runs) < max_runs:
        if runs:
            time.sleep(60)  # cooldown: let the box recover from the load
        runs.append(run_bench(sf_dir, len(runs) + 1, skip_oracle=bool(runs)))
        if len(runs) >= 2:
            lo = sorted(r["cpu_total"] for r in runs)[:2]
            if lo[1] <= lo[0] * (1 + TOL):
                break
            print(f"[converge] cpu_totals {lo} not within {TOL:.0%} — "
                  f"rerunning", flush=True)
    merged = merge(runs)
    cpu_totals = [round(r["cpu_total"], 3) for r in runs]
    lo = sorted(cpu_totals)[:2]
    merged["runs"] = len(runs)
    merged["cpu_total_runs"] = cpu_totals
    merged["converged"] = bool(len(runs) >= 2 and lo[1] <= lo[0] * (1 + TOL))
    merged["merge"] = ("min-by-cpu_ms per query across %d cold JVMs "
                       "(60 s cooldowns); converged = two smallest "
                       "whole-run cpu_totals within %.0f%%"
                       % (len(runs), TOL * 100))
    with open(os.path.join(REPO, "BENCH_LOCAL_LAST.json"), "w") as f:
        json.dump(merged, f)
    print(f"[converge] merged record: wall {merged['value']:.1f} s, "
          f"cpu_total {merged['cpu_total']:.1f} s, "
          f"runs {cpu_totals}, converged={merged['converged']}, "
          f"gate n={merged['oracle_gate']['n']} "
          f"max={merged['oracle_gate']['ratio_max']} "
          f"gt2x={merged['oracle_gate']['gt2x']}", flush=True)


if __name__ == "__main__":
    main()
