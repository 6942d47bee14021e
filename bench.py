#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <scale factor>}

Each query is forced end-to-end with the ``noop`` sink (full
materialization on executors, nothing collected to the driver), so the
timings measure scan + shuffle + compute, not driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_fact_rebuild",   # star join + 3-key agg (fact rebuild, M3)
    "a1_groupby_agg",          # multi-key hash aggregate (A1-A3)
    "q1_pricing_summary",      # TPC-H Q1: scan-heavy wide aggregate
    "q5_local_supplier_volume",# TPC-H Q5: 6-way snowflake join
    "j1_inner_equi_broadcast", # broadcast dim join
    "j6_salted_skew_join",     # salted skew join (scale path)
    "w1_dedup_latest_per_key", # window dedup (W1)
    "m2_merge_dedup_composite",# MERGE state equation, composite key
    "e2_sessionize",           # gap sessionization (2 windows)
    "w2_window_frames",        # frame/lag/lead/rank battery (1 shuffle)
    "x1_asof_join",            # as-of join (union+window)
    "x5_range_join",           # bucketed point-in-interval join
    "x3_time_spine_rollup",    # gap-filled hourly resample
    "d2_dedup_ngram_jaccard",  # exact shingle inverted index
    "d3_dedup_minhash_lsh",    # banded minhash + verify (scale path)
    "d7_dedup_stop_shingle",   # minhash LSH + stop-shingle skew cap
    "d4_dedup_simhash",        # pigeonhole-banded simhash
    "d5l_dedup_embedding_lsh", # banded-LSH embedding pairs (scale path)
    "d14_dedup_lsh_bucket_cap",# capped banded LSH (hot-bucket defense, r9)
    "t14_pii_redact",          # PII scrub pass (regex chain, r9)
    "f31_to_char_numeric",     # numeric TO_CHAR masks (exact decimal, r11)
    "f32_agg_dialect",         # statistics agg pack (fixed-point moments, r11)
    "sql55_session_variables", # SET/$var/EXECUTE IMMEDIATE console path (r12)
    "sql57_sql_udf",           # SQL UDFs inlined via Spark native SQL fns (r12)
    "wp1_write_file_plan",     # stats-driven write file planning (r11)
    "d10_segment_boilerplate", # cross-doc segment/boilerplate removal
    "d11_semantic_dedup",      # SemDeDup cluster-then-prune
    "t12_bpe_encode",          # BPE corpus encoding (train+encode one plan)
    "v11_pq_adc_topk",         # product-quantization ADC + exact rerank
    "v1_ann_bruteforce_topk",  # brute-force cosine top-k (fold path)
    "v7_ann_matmul_topk",      # brute-force via blocked matmul (BLAS path)
    "v3_ann_ivf_topk",         # IVF cell-probed top-k (scale path)
    "v16_ann_lsh_adaptive",    # adaptive-width multiprobe LSH top-k (r11)
    "v6_kmeans_assign",        # Lloyd iteration (iterative algo rep)
    "v9_kmeans_iter3",         # 3-iteration Lloyd convergence loop
    "e5_session_window_native",# native merging session windows
    "t2_quality_score",        # text quality metrics
    "t5_tfidf_topk",           # tf-idf top-k terms
    "llm_corpus_clean",        # composite clean pipeline (quality+lang+dedup)
    "mm1_multimodal_decode",   # Arrow mapInPandas plumbing
    "x21_global_shuffle",      # training-data shuffle (1 exchange + local sort)
    "k10_tdigest_sketch_path", # t-digest quantile sketch, SHIPPED plan (no exact-audit global sort; r8)
    "e17_match_recognize_w",   # W-pattern MATCH_RECOGNIZE (chained run joins, r7)
    "sql50_match_recognize_skip", # AFTER MATCH SKIP family: Arrow greedy over the candidate relation (r9)
    "m10_multi_table_insert",  # INSERT FIRST: one scan -> 3 materialized targets
    "pl_zonemap_prune",        # micro-partition pruning (write + manifest + pruned read)
    # the delta-cycle measurement runs BEFORE the full rebuild: the
    # ~15 s pl_backfill_scale churns the heap/shuffle dirs enough to
    # inflate whatever runs next by ~30% (measured 8.8 s after vs
    # 6.4 s isolated for the identical delta cycle)
    "x28_jaro_winkler_join",   # JW fuzzy join: JVM prefilter + candidates-only Arrow DP (r12; headlined r13)
    "pl_backfill_incremental", # O(delta) fact maintenance (delta cycle only)
    "pl_backfill_scale",       # full ETL pipeline throughput (~150k orders @ sf0.1)
]


# ---------------------------------------------------------------------------
# Cross-day drift anchor (VERDICT r12 #4). The builder's ledger shows
# identical code measuring 5.8 s vs 13.5 s across machine-days; without
# an anchor, cross-round ratios conflate engine changes with host
# drift. This probe is a CONSTANT synthetic workload — pure Spark
# builtins over a pinned-partitioning range, no engine code, no input
# files — that must NEVER change across rounds. Any round's headline
# can then be normalized: value * (CAL_REFERENCE_SEC / cal_now).
# ---------------------------------------------------------------------------

# reference cal timing from the round-13 quiet bench run itself
# (min-of-3 inside the bench process, after warm-up — the same
# conditions every future round's cal is measured under). Update ONLY
# if the probe itself is ever changed (don't).
CAL_REFERENCE_SEC = 1.794


def _calibration(spark) -> None:
    # 30M rows, 32 fixed partitions, multiplicative-hash key derive,
    # 2-key agg + global sort of the 100k groups — touches shuffle,
    # codegen and sort machinery in fixed proportion
    df = (
        spark.range(0, 30_000_000, 1, 32)
        .selectExpr(
            "id % 100003 AS k",
            "(id * 2654435761) % 1000000007 AS v",
        )
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .orderBy("k")
    )
    df.write.format("noop").mode("overwrite").save()

# Untimed setup per headline entry: runs AFTER warm-up, BEFORE the
# timed loop. pl_backfill_incremental's initial load (98% of the data)
# is deliberately untimed so its number measures ONLY the delta
# maintenance cycle — the daily 100 TB path — against
# pl_backfill_scale's full rebuild.
def _prepare(spark, sf_dir: str) -> None:
    from end_to_end_etl_using_snowflake_spark.functions.scratch import scratch_dir
    from end_to_end_etl_using_snowflake_spark.plans.backfill import (
        prepare_incremental,
        synthesize_landing,
    )

    prepare_incremental(spark, sf_dir)
    # warm the full-backfill fixture cache too: landing-CSV synthesis
    # is input generation (the reference's fixtures pre-exist its
    # pipeline), so the timed pl_backfill_scale run should measure
    # ingest -> MERGE -> rebuild, not fixture creation
    synthesize_landing(spark, sf_dir, scratch_dir("bench_synth_warm_"))


def _loadavg() -> float | None:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return None


def _loadavg3() -> tuple[float | None, float | None, float | None]:
    """1 / 5 / 15-minute load averages. The 15-minute figure is the
    machine-state stamp VERDICT r14 #3 asked for: residual page-cache
    / tmpfs state from a recent heavy job (a parity sweep, a prior
    pass) inflates the bench ~20% even after the 1-minute load
    settles, and the kernel's own 15-minute smoothing is the cheapest
    honest record of "was anything heavy running recently"."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
            return float(parts[0]), float(parts[1]), float(parts[2])
    except (OSError, ValueError, IndexError):
        return None, None, None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # Contention guard (VERDICT r8 "What's wrong" #1: a bench recorded
    # under a concurrent parity sweep showed a phantom +10%/1.45x on
    # plans whose files hadn't changed). If the 1-minute load is above
    # threshold, wait for the machine to quiet down (bounded), then
    # proceed either way and RECORD the load in the output so a
    # contended artifact is self-describing instead of silently wrong.
    thresh = 0.25 * (os.cpu_count() or 8)
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "300"))
    waited = 0.0
    load = _loadavg()
    while load is not None and load > thresh and waited < max_wait:
        time.sleep(15)
        waited += 15
        load = _loadavg()

    from end_to_end_etl_using_snowflake_spark.session import get_spark

    spark = get_spark(app_name="bench")
    import __spark_entry__  # populate registry  # noqa: F401
    from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY

    # untimed warm-up of EVERY headline plan at the smallest SF: each
    # query's own whole-stage-codegen stages compile against ~1/100th
    # of the data, so the timed sf run measures steady-state scan +
    # shuffle + compute throughput, not first-run JIT (which was ~3 s
    # of the flagship's 6 s cold time). Generated code is keyed by
    # plan shape, not input size, so the small-SF run compiles exactly
    # the stages the timed run executes.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # prepare BEFORE warm-up: the incremental initial load is the
    # biggest JVM disturbance (heap growth, shuffle files); running it
    # first lets the warm-up loop re-stabilize codegen + GC right
    # before the timed loop.
    _prepare(spark, sf_dir)

    for name in HEADLINE:
        REGISTRY[name].build(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # timed: build + materialize. build() is plan construction (~ms) for
    # pure queries, but the stateful pipeline entries (pl_backfill_scale)
    # do their real work inside build — timing both keeps one rule.
    #
    # Two-level protocol (VERDICT r13 #4 — the two-quiet-runs evidence
    # is now STRUCTURAL, not a NOTES side note):
    #
    # - Each query reports the MIN of 3 timed runs per pass (VERDICT
    #   r5 #2): at these magnitudes a single run cannot distinguish a
    #   regression from a GC pause; the min is the right noise-floor
    #   estimator for deterministic repeatable work.
    # - The WHOLE timed loop runs SPARK_GRAFT_BENCH_PASSES times
    #   (default 2), each pass with its own calibration probe. The
    #   artifact carries every pass in "runs" (value + calibration +
    #   normalized), so the +/-N% same-day noise claim is readable
    #   from the JSON itself; the headline "value" is the MEDIAN of
    #   the pass totals, and "queries" keeps the per-query MIN across
    #   passes (the cross-round per-query comparator).
    # - The two backfill pipeline entries stay single-run: their build
    #   consumes prepared input state (the delta cycle applies the
    #   held-back months), so a re-run would measure a different,
    #   smaller computation. Their one measured value is reused in
    #   every pass total (documented coupling between pass totals).
    single_run = {"pl_backfill_incremental", "pl_backfill_scale"}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    # per-query contention sampling (VERDICT r9 #7 / r10 #5): sample
    # the 1-min loadavg before each query so a mid-loop external spike
    # is visible in the artifact, not just the start/end bookends. The
    # samples are SELF-INCLUSIVE (our own executor burst from the
    # previous query lingers in the 1-min average), so the per-query
    # flag uses a near-saturation threshold (0.5 * cpus) well above
    # the bench's own measured steady-state (~6-8 on 32 cpus), where
    # the start-gate keeps the stricter 0.25 * cpus on a quiet JVM.
    # With multiple passes the recorded sample is the per-query MAX
    # (worst seen), matching the conservative contended flag.
    midloop_thresh = 0.5 * (os.cpu_count() or 8)
    query_load: dict[str, float | None] = {}
    timings: dict[str, float] = {}
    single_done: dict[str, float] = {}
    runs: list[dict] = []
    # in-process quiet clock (VERDICT r14 #3): every loadavg sample
    # that exceeds the start-gate threshold resets it, so each pass
    # can stamp how long the machine had been below threshold when
    # the pass began — cross-round claims filter on clean passes.
    bench_t0 = time.monotonic()
    last_heavy = bench_t0 if (load is not None and load > thresh) else None

    def _note_load(lv: float | None) -> None:
        nonlocal last_heavy
        if lv is not None and lv > thresh:
            last_heavy = time.monotonic()

    # warm the calibration probe once before any pass measures it
    _calibration(spark)
    # 15-minute-load gate before pass 1 (VERDICT r15 "What's wrong" #1:
    # the r15 driver bench started 10 min after its own correctness
    # sweep — 1-min load had settled, 15-min load was still 6.4-6.6,
    # and the reading came out ~13% hot; the builder's same-day ledger
    # puts clean readings at loadavg_15m 1.3-2.2 and contaminated ones
    # at 3.3+). Wait (capped) for the 15-min load to decay below a
    # threshold calibrated from that ledger before the first timed
    # pass, so the recorded artifact is clean BY CONSTRUCTION. The
    # wait happens after _prepare/warm-up (which contribute ~1-2 to
    # l15 themselves on an otherwise-quiet host — the clean runs'
    # observed band), and is stamped into the artifact.
    thresh15 = float(
        os.environ.get(
            "SPARK_GRAFT_BENCH_L15_THRESH",
            str(round(0.08 * (os.cpu_count() or 8), 2)),
        )
    )
    max_wait15 = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT15", "600"))
    waited15 = 0.0
    _l1, _l5, l15_now = _loadavg3()
    while l15_now is not None and l15_now > thresh15 and waited15 < max_wait15:
        time.sleep(15)
        waited15 += 15
        _l1, _l5, l15_now = _loadavg3()
    for _ in range(passes):
        l1, l5, l15 = _loadavg3()
        _note_load(l1)
        quiet_for = round(
            time.monotonic() - (last_heavy if last_heavy is not None
                                else bench_t0), 1
        )
        quiet_floor = last_heavy is None
        cal_p = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _calibration(spark)
            cal_p = min(cal_p, time.perf_counter() - t0)
        cal_p = round(cal_p, 3)
        pass_timings: dict[str, float] = {}
        for name in HEADLINE:
            lv = _loadavg()
            _note_load(lv)
            prev = query_load.get(name)
            query_load[name] = lv if prev is None else (
                prev if lv is None else max(prev, lv)
            )
            if name in single_run:
                if name not in single_done:
                    t0 = time.perf_counter()
                    df = REGISTRY[name].build(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    single_done[name] = round(time.perf_counter() - t0, 3)
                pass_timings[name] = single_done[name]
            else:
                best = float("inf")
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    df = REGISTRY[name].build(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                pass_timings[name] = round(best, 3)
            timings[name] = round(
                min(timings.get(name, float("inf")), pass_timings[name]), 3
            )
        total_p = round(sum(pass_timings.values()), 3)
        runs.append({
            "value": total_p,
            "calibration_sec": cal_p,
            "value_normalized": round(
                total_p * (CAL_REFERENCE_SEC / cal_p), 3
            ),
            # per-pass machine state (VERDICT r14 #3): the 1/5/15-min
            # loadavg at pass start plus how long the sampled 1-min
            # load had been below the start-gate threshold. Pass 2
            # legitimately reads quiet_for ~ 0 (it starts right after
            # pass 1's own burst) — that is the page-cache
            # contamination signal, not an error. quiet_floor=true
            # means the clock never saw a heavy sample, so quiet_for
            # is only a lower bound (quiet since before the bench).
            "loadavg_start": l1,
            "loadavg_5m": l5,
            "loadavg_15m": l15,
            "quiet_for_sec": quiet_for,
            "quiet_floor": quiet_floor,
        })
    contended_queries = sorted(
        n for n, lv in query_load.items()
        if lv is not None and lv > midloop_thresh
    )
    run_values = sorted(r["value"] for r in runs)
    mid = len(run_values) // 2
    median_value = (
        run_values[mid] if len(run_values) % 2 == 1
        else round((run_values[mid - 1] + run_values[mid]) / 2, 3)
    )
    cal = sorted(r["calibration_sec"] for r in runs)[len(runs) // 2]

    end_load = _loadavg()
    # clean_pass (VERDICT r16 "What's wrong" #2): a single boolean the
    # driver's PERF comparison can filter on. True iff the 15-min gate
    # exited on its threshold (not the wait cap) AND pass 1 actually
    # started below that threshold AND the 1-min start gate was
    # satisfied — i.e. the artifact is clean by MEASUREMENT, not merely
    # by construction-on-a-good-day.
    clean_pass = bool(
        (l15_now is not None and l15_now <= thresh15)  # gate exited on
        # the threshold (not the wait cap / a failed /proc read)
        and (runs and runs[0]["loadavg_15m"] is not None
             and runs[0]["loadavg_15m"] <= thresh15)
        and not (load is not None and load > thresh)
    )
    full = {
        "metric": "headline_queries_total_runtime",
        # MEDIAN of the pass totals (the per-pass evidence is in
        # "runs"); "queries" holds the per-query MIN across passes
        "value": median_value,
        "unit": "sec",
        "runs": runs,
        "queries": timings,
        "sf": float(sf),
        # contention self-description: loadavg_start is the
        # 1-min load when the timed section was allowed to
        # begin (after waiting <= SPARK_GRAFT_BENCH_MAX_WAIT
        # for it to drop below load_threshold); contended=true
        # means external load never settled and the numbers
        # should not be compared across rounds.
        "loadavg_start": load,
        "loadavg_end": end_load,
        "load_threshold": round(thresh, 2),
        "load_waited_sec": waited,
        # 15-min gate stamps (r16): pass 1 is clean by construction
        # when load15_waited_sec < load15_max_wait (the gate exited on
        # the threshold, not the cap) — see BASELINE.md's clean rule
        "load15_threshold": round(thresh15, 2),
        "load15_waited_sec": waited15,
        "load15_max_wait": max_wait15,
        "clean_pass": clean_pass,
        "contended": bool(load is not None and load > thresh),
        # self-inclusive 1-min loadavg sampled as each query
        # started; contended_queries = samples above
        # midloop_load_threshold (see comment at the loop)
        "loadavg_per_query": query_load,
        "midloop_load_threshold": round(midloop_thresh, 2),
        "contended_queries": contended_queries,
        # drift anchor (VERDICT r12 #4): constant synthetic probe
        # timing + the headline normalized to the r13 reference
        # host-day. Cross-round comparisons should quote
        # value_normalized; a cal far from CAL_REFERENCE_SEC means
        # the host is faster/slower that day, not the engine.
        "calibration_sec": cal,
        "calibration_reference_sec": CAL_REFERENCE_SEC,
        "value_normalized": round(median_value * (CAL_REFERENCE_SEC / cal), 3),
    }
    # VERDICT r11 #1: the driver keeps only the LAST 2000 chars of
    # stdout, and r11's full JSON grew past that — the headline metric
    # fell out the front of the capture (parsed: null). The full
    # diagnostics now live in a sidecar next to this script; stdout is
    # ONE compact line, guaranteed to fit the tail capture whole. The
    # per-query timings map stays on the line while it fits (it is the
    # per-round perf signal); if the headline list ever grows past the
    # capture budget, the map is dropped from the LINE only — it is
    # always recoverable from the sidecar.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_out.json")
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "value_normalized": full["value_normalized"],
        "calibration_sec": cal,
        "runs": runs,
        "unit": "sec",
        # 2-dp on the LINE (fits ~8 more entries in the capture
        # budget); the sidecar keeps 3-dp
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": full["sf"],
        "contended": full["contended"],
        "contended_queries": contended_queries,
        "clean_pass": clean_pass,
        "detail": "bench_out.json",
    }
    # VERDICT r16 #1/#2: the per-query map is the driver's ground truth
    # for PERF_*.per_query and scaling.per_query — it must NEVER fall
    # off the printed line. When the line outgrows the ~2000-char tail
    # capture, shed the OPTIONAL diagnostics first (all recoverable
    # from the sidecar): the per-pass "runs" array, then the trailing
    # extras. "queries" is the last thing to go (additions-only
    # contract: metric/value/unit/queries/sf always print while they
    # fit at all).
    for victim in ("runs", "contended_queries", "calibration_sec",
                   "value_normalized", "queries"):
        if len(json.dumps(compact)) <= 1900:
            break
        compact.pop(victim, None)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
