#!/usr/bin/env python
"""Benchmark harness: run the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def select_retry_suspects(
    timings: dict[str, float],
    ref: dict[str, float],
    cap: int = 8,
) -> tuple[list[str], set[str]]:
    """Continuity-pass selection (unit-tested in
    tests/test_bench_protocol.py): queries whose min-of-samples sits
    >3x their last committed record (and >2 s absolute) earn ONE
    temporally-separated extra sample; queries with NO committed
    record fall back to 3x the in-run median (r10 ADVICE — without
    this a new query burst-charged across both adjacent samples is
    committed as its headline time). Returns (suspects slowest-first,
    capped, and the history-less subset)."""
    mins_sorted = sorted(timings.values())
    run_median = mins_sorted[len(mins_sorted) // 2] if mins_sorted else 0.0
    historyless = {
        n for n, t in timings.items()
        if t > 2.0 and n not in ref and t > 3 * max(run_median, 0.5)
    }
    suspects = sorted(
        (n for n, t in timings.items()
         if (t > 2.0 and n in ref and t > 3 * ref[n])
         or n in historyless),
        key=lambda n: -timings[n],
    )[:cap]
    return suspects, historyless


def select_weather_suspects(
    timings: dict[str, float],
    ref: dict[str, float],
    cap: int = 12,
    factor: float = 1.4,
    floor_s: float = 1.5,
) -> list[str]:
    """Host-weather adjudication (r12 verdict item 4, unit-tested in
    tests/test_bench_protocol.py): the continuity pass's 3x threshold
    is too coarse to self-adjudicate a loaded run — r12 left 15 false
    regressions (1.4-2.3x) for the judge to re-time by hand. A query
    whose min-of-samples sits >1.4x its last committed record (and
    >1.5 s absolute, so the cheap tail's scheduling jitter doesn't
    qualify) earns ONE temporally-separated extra sample; the
    adjudication samples and the still-elevated survivors land in the
    emitted record so the run carries its own weather verdict.
    Returns suspects slowest-first, capped."""
    return sorted(
        (
            n for n, t in timings.items()
            if n in ref and t > floor_s and t > factor * ref[n]
        ),
        key=lambda n: -timings[n],
    )[:cap]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from magmapandas_spark.relational import suite
    from magmapandas_spark.session import get_spark

    spark = get_spark(app_name="magmapandas-bench")

    # warm the JVM/IO/codegen path once so the first timed query
    # measures steady-state execution, not classloading
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Python/Arrow worker pool too — otherwise the first
    # pandas-UDF query in the run is charged ~1 worker spawn per core
    def _identity(it):
        yield from it

    spark.range(256).repartition(32).mapInPandas(
        _identity, "id long"
    ).write.format("noop").mode("overwrite").save()
    # warm the SHARED input caches the same way: the synthetic-melt
    # persist and the IVF centroid fit are one-time materializations
    # ~30 queries reuse — without this they are charged to whichever
    # query the gate rotation happens to put first in registry order
    # (r5's phantom density_viscosity "regression")
    suite.synthetic_melt(spark, sf_dir).df.write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        from magmapandas_spark.operators.similarity import (
            ivf_fit_centroids,
        )

        ivf_fit_centroids(sf_dir)
    except Exception:
        pass  # embeddings table absent at this SF — nothing to warm

    def run_once(name: str, fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop write materializes the FULL plan (incl. sorts that
        # count() would optimize away)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Measurement protocol (round 10): pass 1 times every query once;
    # pass 2 re-times queries in DESCENDING pass-1 time order (a
    # second sample matters most where the first was large) until
    # SPARK_GRAFT_BENCH_SAMPLES per query or the wall budget
    # (SPARK_GRAFT_BENCH_BUDGET_S, default 1600 s total) runs out.
    # ALL samples land in BENCH_FULL.json; the headline per-query
    # number is the MINIMUM — on a multi-tenant host the min of
    # samples estimates the plan's cost, and the recorded spread
    # quantifies host weather (r9's 378→505 s drift on byte-identical
    # code was unfalsifiable with one sample and a heuristic retry
    # pass). Budget exhaustion trims second samples off the CHEAP tail
    # first and is counted in `single_sampled`, so the record says so.
    # Budget sizing (r10 verdict item 3): the r10 run measured pass 1
    # at 545 s and a complete pass 2 at ~555 s; the old 1100 s default
    # cut 47 second samples off the cheap tail. 1600 s covers both
    # passes plus the bounded retry pass with slow-host headroom.
    n_samples = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "2")))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1600"))
    load_before = os.getloadavg()
    suite_t0 = time.perf_counter()

    qmap = suite.queries()
    samples: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    for name, fn in qmap.items():
        dt = run_once(name, fn)
        samples[name] = [round(dt, 4)]
        timings[name] = round(dt, 4)
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    for _ in range(n_samples - 1):
        for name in sorted(timings, key=lambda n: -timings[n]):
            if time.perf_counter() - suite_t0 > budget_s:
                break
            dt = run_once(name, qmap[name])
            samples[name].append(round(dt, 4))
            if dt < timings[name]:
                timings[name] = round(dt, 4)
            print(
                f"# {name}: "
                + "/".join(f"{r:.3f}" for r in samples[name]) + "s",
                file=sys.stderr,
            )
    single_sampled = sum(1 for v in samples.values() if len(v) < n_samples)

    # Continuity pass: a query whose min-of-samples still sits >3x its
    # last committed record (and >2 s absolute) gets ONE extra sample —
    # a burst can straddle both adjacent samples. The extra sample is
    # recorded like the others; bounded to the 8 worst offenders.
    ref: dict[str, float] = {}
    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    try:
        with open(bench_path) as fh:
            prior = json.load(fh)
        if prior.get("sf") == (float(sf) if sf.replace(".", "").isdigit()
                               else sf):
            ref = dict(prior.get("queries", {}))
    except Exception:
        pass
    suspects, historyless = select_retry_suspects(timings, ref)
    retried = 0
    replaced = 0
    for name in suspects:
        dt = run_once(name, qmap[name])
        retried += 1
        samples[name].append(round(dt, 4))
        if dt < timings[name]:
            print(
                f"# retry {name}: {timings[name]:.3f}s -> {dt:.3f}s "
                "(burst-charged; recording min)",
                file=sys.stderr,
            )
            timings[name] = round(dt, 4)
            replaced += 1

    # Weather-adjudication pass (r12 verdict item 4): queries still
    # >1.4x their committed record after the min-of-n and continuity
    # passes get ONE more temporally-separated sample each — the
    # sweep over the whole suspect list IS the temporal separation
    # (a burst that straddled the adjacent min-of-n samples has moved
    # on by the time the sweep returns). Survivors are named in
    # `weather_suspects` so a loaded run carries its own verdict
    # instead of leaving 1.4-2.3x false regressions for a judge to
    # re-time by hand.
    weather = select_weather_suspects(timings, ref)
    # count the adjudication samples that actually RAN — the wall
    # budget can cut the sweep short, and recording len(weather)
    # would overstate the pass (r13 ADVICE)
    weather_retried = 0
    for name in weather:
        if time.perf_counter() - suite_t0 > budget_s + 120:
            break
        dt = run_once(name, qmap[name])
        weather_retried += 1
        samples[name].append(round(dt, 4))
        if dt < timings[name]:
            print(
                f"# weather {name}: {timings[name]:.3f}s -> {dt:.3f}s "
                "(recording min)",
                file=sys.stderr,
            )
            timings[name] = round(dt, 4)
    weather_suspects = sorted(
        n for n in weather
        if n in ref and timings[n] > 1.4 * ref[n] and timings[n] > 1.5
    )

    load_after = os.getloadavg()
    total = sum(timings.values())
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "suite_total_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "sf": sf_val,
        "protocol": f"min-of-{n_samples}",
        "single_sampled": single_sampled,
        "wall_elapsed_s": round(time.perf_counter() - suite_t0, 1),
        "load_before": [round(v, 2) for v in load_before],
        "load_after": [round(v, 2) for v in load_after],
        "retried": retried,
        "replaced": replaced,
        "historyless_retried": sorted(
            n for n in suspects if n in historyless
        ),
        "weather_retried": weather_retried,
        "weather_suspects": weather_suspects,
    }
    # The complete per-query map, for humans/the judge
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"), "w"
    ) as fh:
        json.dump(full, fh)

    # The driver captures only the LAST ~2000 characters of output and
    # parses the JSON line from that window (BENCH_r02/r03 recorded
    # `parsed: None` with the front of a ~3 KB JSON line sliced off).
    # Emit a final line guaranteed to fit: slowest queries first, the
    # rest folded into queries_omitted / omitted_total_s.
    budget = 1800
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    compact = {k: v for k, v in full.items() if k != "samples"}
    included: dict[str, float] = {}
    for name, secs in slowest:
        trial = dict(compact)
        trial["queries"] = {**included, name: round(secs, 2)}
        trial["queries_omitted"] = len(timings) - len(trial["queries"])
        trial["omitted_total_s"] = round(
            sum(v for k, v in timings.items() if k not in trial["queries"]),
            2,
        )
        if len(json.dumps(trial)) > budget:
            break
        included[name] = round(secs, 2)
    out = dict(compact)
    out["queries"] = included
    out["queries_omitted"] = len(timings) - len(included)
    out["omitted_total_s"] = round(
        sum(v for k, v in timings.items() if k not in included), 2
    )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
