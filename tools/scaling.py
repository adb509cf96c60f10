#!/usr/bin/env python3
"""Scaling-slope study (VERDICT r12 #1): run the headline queries at
sf0.001 / sf0.01 / sf0.1 (a 100x data span) and commit the evidence
that each plan's EXECUTOR WORK grows with its theoretical work model
while wall time stays parallelism-absorbed.

Usage: python3 tools/scaling.py            # runs all three SFs (~10 min)
       python3 tools/scaling.py --report   # regenerate SCALING.md from
                                           # target/scaling_sf*.json

Outputs SCALING.json (raw per-sf metrics) and SCALING.md (the study).

Work models (per-query theoretical growth per 10x data decade):
  - "n"  : work ~ corpus size (builds, derives, token scans)  -> 10x
  - "n2" : work ~ nq * scanned-rows where the query set ITSELF
           scales with the corpus (the *_big query tables sample
           id % 9973 == 1) -> 100x
The at-scale claim is NOT "wall time grows 10x/100x" (small SFs are
fixed-overhead dominated); it is: cpu_ms / work-units is FLAT-OR-
FALLING as data grows, i.e. no super-linear term appears anywhere in
the 100x span. A cluster scales executors with data; the per-unit cost
is what survives a 1000x scale-up.
"""
import json, os, subprocess, sys

SFS = ["0.001", "0.01", "0.1"]
# sf1-equivalent tier (VERDICT r13 #4): testdata stops at sf0.1, so the
# fourth decade runs the sf0.1 inputs with SPARK_GRAFT_SCALE_X=10 — the
# engine replicates its derived big fixtures 10x with per-copy id
# shifts/perturbations (Queries.scaleX), pushing the heavy queries out
# of the overhead floor into the linear regime. Only the rows with
# real work at sf0.1 are worth the extra decade.
SF1_QUERIES = [
    "minhash_neardup_big", "unigram_logprob_big", "ivfpq_build_big",
    "distributed_ondisk_recipe_big", "ivf_search_big", "pq4fs_search_big",
    # r16: the dedup/stream heavies that top the wall-time chart
    # (VERDICT r15 #1) — their scaleX hooks landed in r15/r16
    "stream_dedup_big", "embedding_near_dup", "knn_graph_nndescent",
    "semantic_neardup_cells",
    # r18 (VERDICT r17 #5): the END-TO-END semantic dedup composition
    # (components + keep-one over the bounded within-cell pair source)
    # gets its own fourth-decade row — its pair SOURCE was measured,
    # the composition was not
    "semantic_dedup_cells",
]
# Queries measured ONLY in the fourth decade because their fixtures do
# not scale with sf (embeddings.parquet is 500 rows at sf<=0.01 and
# 2000 at sf0.1; the nndescent node set is pinned at vec_id < 100 at
# every sf) — the engine-replication decade is their only informative
# span. Models:
# - embedding_near_dup is "n2": the EXACT near-dup form's
#   triangle-inequality candidate superset provably degenerates to
#   the all-pairs verify on an isotropic corpus (this testdata:
#   median pairwise cos 0.001 — measured r16, see
#   Dedup.embeddingNearDupsWithinCells scaladoc), so its work model
#   IS n^2; the bounded at-scale path is semantic_neardup_cells.
# - semantic_neardup_cells is "n15" (n^1.5): SemDeDup within-cell
#   pairs at sqrt-occupancy cells — assignment n*sqrt(n) + per-cell
#   pair blocks sum(cell^2) = n*sqrt(n).
# - knn_graph_nndescent is "n2": the catalog query carries its own
#   recall gate, an exact O(n^2) kNN graph, as the in-query
#   denominator; the NN-descent term itself is n*k^2 per round, so
#   any candidate blow-up in the descent still surfaces against the
#   n^2 ceiling.
SF1_ONLY = {
    "embedding_near_dup": "n2",
    "knn_graph_nndescent": "n2",
    "semantic_neardup_cells": "n15",
    # components + keep-one add only edge-set shuffles (edges ~ verified
    # pairs) on top of the within-cell pair source, so the composition
    # carries the source's n^1.5 model
    "semantic_dedup_cells": "n15",
}
EXPECTED = {"n": 10.0, "n15": 10.0 ** 1.5, "n2": 100.0}
# query -> work model ("n" linear in corpus, "n2" query-set * corpus)
QUERIES = {
    "bigvec_derive": "n",
    "ivf_build_big": "n",
    "ivfpq_build_big": "n",
    "imi_pq_build_big": "n",
    "knn_flat_l2_big": "n2",
    "sq8_knn_big": "n2",
    "ivf_search_big": "n2",
    "ivf_search_big_batch": "n2",
    "ivfpq_search_big": "n2",
    "pq4fs_search_big": "n2",
    "imi_pq_search_big": "n2",
    "ivf_search_skewed": "n2",
    "minhash_neardup_big": "n",
    "unigram_logprob_big": "n",
    # r17 phase decomposition (RecipeProbe, VERDICT r16 #4): the
    # recipe is a BLEND — fixture/4-shard-assign/merge+write grow
    # 2.0x/2.8x/3.4x per decade (linear, part-floor) while the final
    # search grows ~164x (nq x probed-rows with a corpus-sampled
    # query set: nq 57->600, probed lists 10x — the ivf_search_big
    # model, quadratic BY DESIGN of the measurement). Beyond sf0.1
    # the search term dominates, so the row carries n2; the r16 "n"
    # cell (per-unit 1.96) was a stale pre-fingerprint minimum.
    "distributed_ondisk_recipe_big": "n2",
    # r16: streamed lineitem rows through the state-store dedup —
    # source rows AND distinct keys are both linear in the corpus
    "stream_dedup_big": "n",
}
MODELS = {**QUERIES, **SF1_ONLY}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def workload_fp() -> str:
    """Fingerprint of the measured workload: a hash of the engine
    source (the query/replication code lives there). Merge-min cells
    keyed on it (ADVICE r16): a cached minimum measured under an older
    workload definition must NOT survive a code change, or published
    numbers describe a workload that no longer exists.

    The MEASUREMENT PROTOCOL is part of the workload (ADVICE r17):
    this script decides partition scaling, SPARK_GRAFT_CONF, cooldown
    and merge-min logic, so its own source hashes in too — a protocol
    change must also discard cached minimums."""
    import hashlib
    h = hashlib.sha256()
    src = os.path.join(REPO, "src", "main", "scala")
    for root, dirs, files in os.walk(src):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".scala"):
                p = os.path.join(root, fn)
                h.update(os.path.relpath(p, src).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(f.read())
    # env-derived protocol knobs that change what a run measures —
    # hashed at their EFFECTIVE values (ADVICE r18: run_sf applies
    # setdefault('SPARK_GRAFT_CPUS', '32'), so an unset variable and
    # an explicit '32' describe the identical protocol and must share
    # a fingerprint; the tier's derived SPARK_GRAFT_CONF suffix is a
    # pure function of CPUS+scale_x and needs no separate hashing)
    h.update(f"SPARK_GRAFT_CPUS={os.environ.get('SPARK_GRAFT_CPUS', '32')}"
             .encode())
    h.update(f"SPARK_GRAFT_CONF={os.environ.get('SPARK_GRAFT_CONF', '')}"
             .encode())
    return h.hexdigest()[:16]


def run_sf(sf: str, scale_x: int = 1, queries=None,
           per_query: bool = False, cache_label: str = None) -> dict:
    """per_query: one Bench JVM per query. The sf1 tier MUST run
    isolated: ten heavy queries in one JVM contend for the storage
    pool (the streaming row's memory sink + each query's persisted
    fixtures), evicted fixture blocks recompute on every downstream
    pass, and task_ms inflates up to 15x (measured r16:
    minhash_neardup_big 3796 s shared vs 252 s isolated at identical
    inputs). One JVM per row is also the cluster posture — a
    production job owns its executors' memory."""
    queries = list(queries or QUERIES)
    if per_query:
        # best-of-repeats: this VM throttles nondeterministically under
        # sustained load (identical inputs measured 0.4k..11k CPU-sec
        # across runs, r16 — frequency-level, so even executorCpuTime
        # inflates), so tier cells MERGE-MIN with the existing cache:
        # re-invoking the study keeps each row's least-disturbed
        # measurement, the standard noise-robust benchmark estimator.
        # A 60 s cooldown before each row lets the box recover.
        out = {"sf": sf if scale_x == 1 else "1", "queries": {}}
        clabel = cache_label or out["sf"]
        cache = os.path.join(REPO, "target", f"scaling_sf{clabel}.json")
        fp = workload_fp()
        prev = {}
        if os.path.exists(cache):
            with open(cache) as f:
                prev = json.load(f).get("queries", {})
        # drop cells measured under a DIFFERENT workload definition
        # (ADVICE r16: min-merging across code changes publishes
        # numbers for a workload that no longer exists)
        prev = {q: m for q, m in prev.items() if m.get("fp") == fp}
        out["queries"].update(prev)  # keep rows not re-measured this call
        import time
        for q in queries:
            time.sleep(60)
            r = run_sf(sf, scale_x, [q],
                       cache_label=f"{clabel}.row")  # throwaway row cache
            m = r["queries"][q]
            m["fp"] = fp
            p = prev.get(q)
            def work(x):
                return x.get("cpu_ms", x["task_ms"])
            out["queries"][q] = p if p is not None and work(p) <= work(m) else m
        with open(cache, "w") as f:
            json.dump(out, f)
        return out
    label = sf if scale_x == 1 else "1"
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = f"/root/testdata/sf{sf}"
    env["SPARK_GRAFT_ONLY"] = ",".join(queries)
    env["SPARK_GRAFT_SKIP_ORACLE"] = "1"
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    if scale_x > 1:
        env["SPARK_GRAFT_SCALE_X"] = str(scale_x)
        # partitions scale WITH data (what any real deployment does —
        # more data, more executors/partitions; cores stay fixed here):
        # a pinned 32-way shuffle at 10x data pushes per-partition
        # hash/sort working sets out of cache and reads as a fake
        # super-linear term (measured: minhash task_ms 2.6x over the
        # work model at 32 partitions, 0.7x at 320)
        parts = int(env["SPARK_GRAFT_CPUS"]) * scale_x
        env["SPARK_GRAFT_CONF"] = (
            env.get("SPARK_GRAFT_CONF", "") +
            f",spark.sql.shuffle.partitions={parts}").lstrip(",")
    print(f"[scaling] running Bench at sf{label} "
          f"(dir sf{sf}, scale_x {scale_x}) ...", flush=True)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=REPO,
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open(os.path.join(REPO, "BENCH_LOCAL_LAST.json")) as f:
        detail = json.load(f)
    out = {"sf": label, "queries": {}}
    for q in queries:
        m = json.loads(detail["metrics"][q]) if isinstance(
            detail["metrics"][q], str) else detail["metrics"][q]
        out["queries"][q] = m
    cache = os.path.join(REPO, "target",
                         f"scaling_sf{cache_label or label}.json")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "w") as f:
        json.dump(out, f)
    return out


def report(per_sf: dict) -> tuple:  # (markdown, verdicts)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    lines = []
    lines.append("# SCALING — slope study over a 100x data span "
                 "(sf0.001 / sf0.01 / sf0.1)")
    lines.append("")
    lines.append("Generated by `tools/scaling.py` (Bench at local[%d], "
                 "SPARK_GRAFT_SKIP_ORACLE=1, headline queries only; "
                 "raw per-sf metrics in `SCALING.json`). Machine-drift "
                 "caveat: identical runs vary ~1.3x on this box "
                 "(VERDICT r12), so read ORDERS of magnitude, not "
                 "percents." % cpus)
    lines.append("")
    lines.append("## Work models")
    lines.append("")
    lines.append("- **n** — work is linear in the corpus: builds, the "
                 "fixture derive, token scans. Expected cpu_ms growth "
                 "per 10x decade: ~10x.")
    lines.append("- **n2** — the query table itself scales with the "
                 "corpus (`id % 9973 == 1` sampling), so work is "
                 "(queries x scanned rows): expected growth per decade "
                 "~100x. Also used for the operators whose work IS "
                 "intrinsically quadratic on this corpus (exact "
                 "near-dup on isotropic embeddings; the in-query exact "
                 "recall gate of the kNN-graph row).")
    lines.append("- **n15** — n^1.5: SemDeDup within-cell pairs at "
                 "sqrt-occupancy cells (assignment n*sqrt(n) + "
                 "sum(cell^2) = n*sqrt(n)): expected growth per decade "
                 "~31.6x.")
    lines.append("")
    lines.append("A plan survives scale-up iff `cpu_ms / work-units` "
                 "is flat-or-falling across the span (no super-linear "
                 "term), and wall `sec` grows strictly slower than "
                 "cpu_ms (parallelism absorbs the work). Small-sf "
                 "cells are fixed-overhead floors (~100-500 ms of task "
                 "time regardless of data), so the informative decade "
                 "is sf0.01 -> sf0.1. cpu_ms is executorCpuTime — "
                 "actual CPU work, immune to the hypervisor "
                 "steal/descheduling that inflates executorRunTime up "
                 "to 15x under sustained full-box load on this VM "
                 "(measured r16: identical minhash inputs, run-time "
                 "252 s vs 3796 s across runs while CPU time held).")
    lines.append("")
    lines.append("## Measurements")
    lines.append("")
    lines.append("| query | model | sec @.001/.01/.1 | cpu_ms @.001/.01/.1 "
                 "| cpu growth .01->.1 | expected | per-unit trend | verdict |")
    lines.append("|---|---|---|---|---|---|---|---|")
    verdicts = {}
    for q, model in QUERIES.items():
        secs = [per_sf[sf]["queries"][q]["sec"] for sf in SFS]
        # like-with-like across the row (ADVICE r16): cpu_ms only when
        # EVERY cell recorded it, else task_ms for all three — a row
        # straddling the cpu_ms format change must not mix
        # steal-inflated run time with CPU time in one ratio
        cells = [per_sf[sf]["queries"][q] for sf in SFS]
        tms = ([c["cpu_ms"] for c in cells]
               if all("cpu_ms" in c for c in cells)
               else [c["task_ms"] for c in cells])
        exp = EXPECTED[model]
        growth = (tms[2] / tms[1]) if tms[1] > 0 else float("inf")
        per_unit = growth / exp
        # flat-or-falling per-unit cost, with 2x headroom for the
        # machine-drift band and sub-model constants
        ok = per_unit <= 2.0
        verdicts[q] = {"model": model, "sec": secs, "cpu_ms": tms,
                       "growth_01_to_1": round(growth, 2),
                       "expected": exp,
                       "per_unit_ratio": round(per_unit, 3),
                       "linear_in_work": bool(ok)}
        lines.append(
            "| %s | %s | %.2f / %.2f / %.2f | %d / %d / %d | %.1fx | %.0fx "
            "| %.2f | %s |" % (
                q, model, secs[0], secs[1], secs[2], tms[0], tms[1], tms[2],
                growth, exp, per_unit,
                "NO-SUPER-LINEAR-TERM" if ok else "SUPER-LINEAR (fix!)"))
    lines.append("")
    lines.append("`per-unit trend` = (cpu_ms growth over the last "
                 "decade) / (expected work growth). > 2 would flag a "
                 "super-linear term poking above the work model; "
                 "values well below 1 mean the measurement is still "
                 "dominated by the fixed per-job/per-task overhead "
                 "floor, NOT that the algorithm beats its work model.")
    lines.append("")
    lines.append("## Reading the numbers honestly")
    lines.append("")
    lines.append("At these testdata scales the raw arithmetic is tiny "
                 "(e.g. knn_flat_l2_big at sf0.1 is 60 queries x 600k "
                 "rows x d=8 = ~0.3 GFLOP, milliseconds of real "
                 "compute), so cpu_ms is mostly scan + codegen + "
                 "scheduling overhead that grows sub-linearly. What "
                 "the study CAN establish, and does, is the absence "
                 "of any super-linear term over the 100x span: a "
                 "quadratic candidate blow-up, a driver-side "
                 "collect-and-loop, or a broadcast flipping to a "
                 "cartesian would multiply cpu_ms by >= the data "
                 "ratio and is visible even above the overhead floor. "
                 "The rows with the most real work at sf0.1 "
                 "(minhash_neardup_big ~90 s task time, "
                 "unigram_logprob_big ~54 s, distributed_ondisk_"
                 "recipe_big ~55 s) grow 3-5x per 10x decade - the "
                 "linear-scan regime emerging from the floor, with "
                 "per-unit cost still falling. sub-second rows "
                 "(bigvec_derive) are entirely inside the floor and "
                 "their slopes are noise; listener-lag can even "
                 "attribute a few warmup tasks into the first "
                 "query's window.")
    lines.append("")
    lines.append("## Wall-time absorption")
    lines.append("")
    lines.append("| query | cpu_ms growth .01->.1 | sec growth .01->.1 |")
    lines.append("|---|---|---|")
    for q in QUERIES:
        v = verdicts[q]
        # same RAW growth value as the Measurements table (not the
        # 2dp-rounded field, which can render a different 1dp value)
        tg = v["cpu_ms"][2] / v["cpu_ms"][1] if v["cpu_ms"][1] > 0 else float("inf")
        sg = v["sec"][2] / v["sec"][1] if v["sec"][1] > 0 else float("inf")
        lines.append("| %s | %.1fx | %.1fx |" % (q, tg, sg))
    lines.append("")
    lines.append("Wall time grows far slower than executor work "
                 "everywhere: the extra work lands on idle cores, "
                 "which is exactly what a 1000-executor cluster does "
                 "with a 1000x corpus.")
    lines.append("")
    if "1" in per_sf:
        lines.append("## The fourth decade — sf1-equivalent "
                     "(sf0.1 inputs x SPARK_GRAFT_SCALE_X=10)")
        lines.append("")
        lines.append("Testdata stops at sf0.1, so the fourth decade "
                     "replicates the derived big fixtures 10x in the "
                     "engine (distinct ids, perturbed copies, fresh "
                     "per-replica doc tokens — Queries.scaleX). Run "
                     "only for the rows with real work at sf0.1; this "
                     "is the decade where the linear regime must emerge "
                     "from the overhead floor (expected task growth "
                     "-> the work model's, per-unit -> ~1). The tier "
                     "runs with shuffle partitions scaled with the data "
                     "(cpus x 10 — the cluster posture: executors grow "
                     "with the corpus, cores per box do not); a pinned "
                     "32-way shuffle at 10x data pushes per-partition "
                     "working sets out of cache and fakes a 2.6-4.5x "
                     "super-linear term that partition scaling removes. "
                     "Each tier row runs in its OWN JVM: ten heavy "
                     "queries sharing one session contend for the "
                     "storage pool (the streaming row's memory sink + "
                     "each query's persisted fixtures), evicted fixture "
                     "blocks recompute on every downstream pass, and "
                     "task_ms inflates up to 15x (measured: "
                     "minhash_neardup_big 3796 s shared vs 252 s "
                     "isolated on identical inputs) — one JVM per row "
                     "is also the cluster posture, where a production "
                     "job owns its executors' memory. Tier cells are "
                     "the MIN across this round's repeated runs "
                     "(run_sf merge-min): the box throttles "
                     "nondeterministically under sustained load — a "
                     "disturbed window shows jit_ms 60-100 s and "
                     "wall >> cpu, and inflates even CPU time up to "
                     "30x on identical inputs. The sf0.1 BASELINES in "
                     "this table use the same per-query isolated-JVM "
                     "merge-min protocol (not the shared-JVM "
                     "all-queries run, whose contention would bias "
                     "growth ratios downward), and every cached cell "
                     "is keyed on a hash of the engine source — a "
                     "code change discards it, so a published minimum "
                     "always describes the current workload.")
        lines.append("")
        lines.append("Three rows exist ONLY in this decade (their "
                     "fixtures do not scale with sf — embeddings.parquet "
                     "is 500 rows at sf<=0.01, the nndescent node set is "
                     "pinned at 100). All three replicate via "
                     "Queries.replicatePairGroups: shifted ids plus a "
                     "pair-group-keyed noise ORTHOGONAL to the vector at "
                     "the fixed length 0.4||v||, so every planted "
                     ">=0.95-cos pair replicates per copy while the same "
                     "base vector across copies lands at the "
                     "deterministic cos 0.9285 < 0.95 (ScaleXSpec pins "
                     "all margins). embedding_near_dup carries the n2 "
                     "model: its EXACT triangle-inequality blocking "
                     "provably degenerates to the all-pairs verify on "
                     "this ISOTROPIC corpus (median pairwise cos 0.001 — "
                     "no ball-based summary separates anything; the r16 "
                     "measurement that exposed this is the point of the "
                     "decade), so the honest claim is "
                     "perfectly-distributed quadratic work, and the "
                     "bounded-work at-scale path is the adjacent "
                     "semantic_neardup_cells row (SemDeDup within-cell "
                     "pairs, n^1.5 by construction). knn_graph_nndescent "
                     "is n2 because the catalog query carries its own "
                     "recall gate — an exact O(n^2) kNN graph — as the "
                     "in-query denominator (the NN-descent term itself "
                     "is n*k^2 per round). stream_dedup_big expands "
                     "INSIDE the stream (10x rows and 10x distinct keys "
                     "through the state store), so the decade exercises "
                     "state-store growth, not just source volume.")
        lines.append("")
        lines.append("distributed_ondisk_recipe_big carries n2 as of "
                     "r17, attributed by phase (graft.tools.RecipeProbe, "
                     "one isolated JVM per scale): fixture derive cpu "
                     "62->125 s (2.0x), the 4 shard assignments 11->31 s "
                     "(2.8x), merge+write 22->75 s (3.4x) — all linear, "
                     "part overhead-floor — while the final search grew "
                     "30->4932 s (~164x): the query set samples the "
                     "corpus (nq 57->600) and each probed list is 10x "
                     "longer, so the search term is nq x probed-rows, "
                     "exactly ivf_search_big's n2 model (the x1.6 above "
                     "100x is the same steal band the tier prose "
                     "documents). The lifecycle phases the recipe "
                     "uniquely measures (shard build + on-disk merge) "
                     "are the LINEAR part; the quadratic tail is the "
                     "by-design corpus-scaled evaluation load, not a "
                     "plan defect.")
        lines.append("")
        lines.append("Reading a cpu flag honestly: the r17 estimator "
                     "change (isolated same-protocol baselines + "
                     "fingerprint-invalidated caches) REMOVED the "
                     "baseline inflation that previously flattered "
                     "these ratios, so rows can flag on cpu while "
                     "their DATA FLOWS stay linear. r18 closed the "
                     "three flags r17 left open. (1) The minhash "
                     "candidate-count measurement (the r17 queued "
                     "item) found a REAL n^2 term and fixed it: at "
                     "the old 2^20 signature base-hash modulus, "
                     "candidates grew 30x at 10x data (4.40M vs a "
                     "linear 1.46M — 66% false: unrelated docs shared "
                     "base-hash values with p~1e-4, and a shared "
                     "value is both docs' band minimum with "
                     "p~(1/|union|)^r per band) while verified pairs "
                     "stayed exactly 10x. Widening M to 2^32-5 "
                     "(core/SimHash.scala scaladoc has the full "
                     "derivation) returns candidates to the true-pair "
                     "line: 1,146,248 at 10x = 10.03x of 114,290, "
                     "pair expansions exactly 10x, max bucket 12 at "
                     "both scales, verified output unchanged. The "
                     "residual 15x byte growth (115 -> 1752 MB) is "
                     "the 1x verify join fitting the auto-broadcast "
                     "floor (candidate side < 10 MB, sets never "
                     "shuffle) while 10x runs the real shuffled join "
                     "— the same regime change embedding_near_dup "
                     "documents, not a data blow-up. (2) The "
                     "remaining cpu flags were sustained-load "
                     "FREQUENCY CAPPING, proven by convergence: "
                     "repeats under the same merge-min protocol "
                     "dropped stream_dedup_big 309 -> 26.5 cpu-s "
                     "(per-unit 4.73 -> 0.41), unigram 6116 -> 905 "
                     "(6.20 -> 1.38), minhash 4126 -> 1136 (5.88 -> "
                     "1.62) — and a single profiler session measured "
                     "the SAME map stage at 1647 cpu-s early and the "
                     "same work inside an 826 cpu-s superset later, "
                     "so executorCpuTime itself inflates when the "
                     "host caps frequency under sustained load "
                     "(on-CPU time is clock-relative; 'steal-immune' "
                     "holds for descheduling, not DVFS). Tier cells "
                     "therefore only publish after repeats converge; "
                     "a first-run flag on a hot box is a prompt to "
                     "re-measure, not yet a plan verdict.")
        lines.append("")
        lines.append("| query | model | sec @.1/1 | cpu_ms @.1/1 "
                     "| cpu growth .1->1 | expected | per-unit | verdict |")
        lines.append("|---|---|---|---|---|---|---|---|")
        for q in SF1_QUERIES:
            model = MODELS[q]
            # SF1-only queries have no 3-sf row; seed their record here
            verdicts.setdefault(q, {"model": model, "sf1_only": True})
            # baseline from the ISOLATED-JVM merge-min tier when
            # measured (ADVICE r16): both sides of the growth ratio
            # must use the same estimator — a shared-JVM sf0.1 cell
            # carries up to 15-30x contention inflation that would
            # bias per-unit ratios downward
            m1 = per_sf.get("0.1iso", {}).get("queries", {}).get(q)
            # a baseline NOT from the isolated-JVM merge-min tier (cell
            # fingerprint-invalidated or row newly added) must be
            # VISIBLE, not silently blended in (ADVICE r17): the
            # shared-JVM estimator carries contention inflation that
            # biases the ratio, so the row is marked and not trusted
            iso_baseline = m1 is not None
            if m1 is None:
                m1 = per_sf["0.1"]["queries"].get(q)
            m10 = per_sf["1"]["queries"].get(q)
            if m1 is None or m10 is None:
                # machine-readable marker (ADVICE r18): without it the
                # bad-query check treats a silently-unmeasured row as
                # linear_in_work=True and the 'none' claim can't be
                # distinguished from 'not measured' by SCALING.json
                # consumers
                verdicts[q]["sf1"] = {"unmeasured": True}
                lines.append("| %s | %s | (not measured this round) "
                             "| | | | | UNMEASURED |" % (q, model))
                continue
            exp = EXPECTED[model]
            # compare like with like: cpu_ms only when BOTH cells
            # recorded it (min-of-repeats can keep a pre-cpu_ms cell)
            if "cpu_ms" in m1 and "cpu_ms" in m10:
                w1, w10 = m1["cpu_ms"], m10["cpu_ms"]
            else:
                w1, w10 = m1["task_ms"], m10["task_ms"]
            growth = (w10 / w1) if w1 > 0 else float("inf")
            per_unit = growth / exp
            ok = per_unit <= 2.0
            verdicts[q]["sf1"] = {
                "sec": [m1["sec"], m10["sec"]],
                "cpu_ms": [w1, w10],
                "growth_1_to_10": round(growth, 2),
                "per_unit_ratio": round(per_unit, 3),
                "iso_baseline": bool(iso_baseline),
                "linear_in_work": bool(ok)}
            verdict_txt = ("NO-SUPER-LINEAR-TERM" if ok
                           else "SUPER-LINEAR (fix!)")
            if not iso_baseline:
                verdict_txt += " [MIXED-ESTIMATOR: shared-JVM baseline]"
            lines.append(
                "| %s | %s | %.2f / %.2f | %d / %d | %.1fx | %.0fx | %.2f "
                "| %s |" % (
                    q, model, m1["sec"], m10["sec"], w1,
                    w10, growth, exp, per_unit, verdict_txt))
        lines.append("")
    return "\n".join(lines), verdicts


def main():
    per_sf = {}
    if "--report" in sys.argv:
        for sf in SFS + ["0.1iso", "1"]:
            cache = os.path.join(REPO, "target", f"scaling_sf{sf}.json")
            if sf in ("1", "0.1iso") and not os.path.exists(cache):
                continue  # fourth decade / iso baselines optional
            with open(cache) as f:
                per_sf[sf] = json.load(f)
    else:
        for sf in SFS:
            # the sf0.1 run also measures the SF1-only queries' scaleX=1
            # baselines (their fixtures do not scale with sf, so they
            # are absent from the smaller spans)
            qs = list(QUERIES) + (list(SF1_ONLY) if sf == "0.1" else [])
            per_sf[sf] = run_sf(sf, queries=qs)
        # the SF1 rows' scaleX=1 baselines, measured with the SAME
        # per-query isolated-JVM merge-min protocol as the sf1 cells
        # (ADVICE r16: both sides of a growth ratio need one estimator)
        per_sf["0.1iso"] = run_sf("0.1", queries=SF1_QUERIES,
                                  per_query=True, cache_label="0.1iso")
        per_sf["1"] = run_sf("0.1", scale_x=10, queries=SF1_QUERIES,
                             per_query=True)
    md, verdicts = report(per_sf)
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump({"sfs": SFS + (["1"] if "1" in per_sf else []),
                   "queries": verdicts, "raw": per_sf}, f, indent=1)
    bad = [q for q, v in verdicts.items()
           if not (v.get("linear_in_work", True) and
                   v.get("sf1", {}).get("linear_in_work", True))]
    unmeasured = [q for q, v in verdicts.items()
                  if v.get("sf1", {}).get("unmeasured")]
    print(f"[scaling] wrote SCALING.md / SCALING.json; "
          f"super-linear: {bad or 'none'}"
          + (f"; UNMEASURED sf1 rows (excluded from the claim): "
             f"{unmeasured}" if unmeasured else ""))


if __name__ == "__main__":
    main()
