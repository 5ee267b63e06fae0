"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The rule requires the same job at N and 4N executors with throughput scaling
efficiency >= 0.8.  No real cluster exists in this sandbox, so (per the
driver instruction) we run the identical transcript pipeline at two
parallelism levels — ``local[N]`` and ``local[4N]`` — on the same input and
report throughput at both plus efficiency = (T_N / T_4N) / 4.

**Why N=2 (so 4N=8) by default:** the sandbox VM advertises 32 CPUs but its
aggregate compute throughput saturates at ~8 busy cores — measured with
plain numpy worker processes (no Spark): 1/2/8/16/32 procs →
103/193/662/756/882 work-units/s, i.e. the *hardware* scales 8→32 at only
0.33 efficiency.  Above 8 cores any job measures host saturation, not the
engine.  The script calibrates raw-CPU scaling for the chosen (N, 4N) pair
alongside the engine run, so the report shows the engine's efficiency
against the hardware's own ceiling.

**Why paired interleaved runs:** the sandbox shares a host and identical
runs vary up to ~3x over minutes.  Each "pair" measures BOTH levels
back-to-back in one subprocess (fresh JVM per level, warm-up excluded),
order alternating across pairs; the reported efficiency is the median of
per-pair throughput ratios, which cancels slow host drift.

Usage:  python scripts/scaling_bench.py [N] [sf] [pairs] [reps] [--update-baseline]
        python scripts/scaling_bench.py [sf] [cpus] --skew
Defaults: N=2, sf=100 (~2M turns), pairs=5, reps=2 (measured passes per
level per pair; each level's min over its reps feeds the pair ratio —
interference is one-sided, so the min is the noise-floor estimator).
Prints one JSON line; with --update-baseline rewrites the scaling section of
BENCH.md.  ``--skew`` instead profiles per-TASK wall time of the shared-
shuffle model+Gorilla job under the documented long-conversation skew and
asserts p100/p50 <= 4 (straggler-free under the skew knob).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PAIR_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import importlib
bench = importlib.import_module("bench")
from streaming_downsampling_spark.session import get_spark
out = {{}}
for cpus in {order}:
    spark = get_spark(app_name="scaling-%d" % cpus, cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT + Python worker pool spin-up, excluded from measurement
    bench.transcript_pipeline(spark, 2.0)
    secs = []
    for _ in range({reps}):
        n_turns, elapsed = bench.transcript_pipeline(spark, {sf})
        secs.append(elapsed)
    spark.stop()
    out[str(cpus)] = secs
    out["turns"] = n_turns
print(json.dumps(out))
"""


def run_pair(n: int, sf: float, flip: bool, reps: int) -> dict:
    """One interleaved pair: both levels measured back-to-back, order
    alternating across pairs so slow host drift cancels in the per-pair
    ratio.  Each level runs ``reps`` measured passes in one warm session and
    reports them all; the pair ratio later uses each level's MINIMUM — host
    interference on this shared VM is strictly additive (a neighbor can slow
    a run, never speed it up), so the per-level min is the noise-floor
    estimator and the min-ratio is variance-bounded.  Note: consecutive
    SparkSessions in one process share the JVM, so the *second* level's
    ``local[k]`` threads would be set by the first ``master`` — each level
    therefore runs in its own sub-subprocess."""
    order = [4 * n, n] if flip else [n, 4 * n]
    result: dict = {}
    for cpus in order:
        code = _PAIR_CHILD.format(repo=REPO, order=[cpus], sf=sf, reps=reps)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        result.update(json.loads(line))
    return result


def calibrate_cpu(procs: int, seconds: float = 5.0) -> float:
    """Aggregate numpy work-units/s with ``procs`` independent processes —
    the hardware's own scaling ceiling, no Spark involved."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(procs, initializer=_pin_blas) as p:
        res = p.starmap(_cpu_work, [(seconds,)] * procs)
    return sum(res) / seconds


def _pin_blas() -> None:
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"


def _cpu_work(seconds: float) -> int:
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 40, 16))
    t_end = time.time() + seconds
    n = 0
    while time.time() < t_end:
        Y = X @ X.transpose(0, 2, 1)
        np.exp(Y - Y.max(axis=2, keepdims=True))
        n += 1
    return n


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def skew_profile(sf: float = 100.0, cpus: int = 8) -> dict:
    """``--skew`` mode (round-4 verdict #8): per-TASK wall-time distribution
    of the shared-shuffle model+Gorilla kernel job under the documented
    long-conversation skew (FIXTURES.md: 1 % of conversations 100× turns —
    the datagen DEFAULT, so this is the very input the scaling numbers use).

    The engine's skew defenses are (a) grouping on (conv_id, day window) —
    a 100× conversation widens its GROUP COUNT, not any single group, (b)
    the kernel's 200-point segmentation bounding per-group O(n²) attention,
    and (c) hash partitioning spreading one conversation's day groups over
    tasks.  This mode instruments the exact ``apply_sorted`` kernel loop to
    emit one (partition, rows, sec) row per task and asserts
    p100/p50 ≤ 4 — a straggler-free profile under the skew knob.
    """
    import time

    import pandas as pd

    sys.path.insert(0, REPO)
    from pyspark import TaskContext

    from streaming_downsampling_spark.datagen import transcripts_df
    from streaming_downsampling_spark.operators._groupmap import prepare_sorted
    from streaming_downsampling_spark.operators.compress import encode_frame_fn
    from streaming_downsampling_spark.operators.downsample import model_frame_fn
    from streaming_downsampling_spark.operators.rollup import with_signal
    from streaming_downsampling_spark.session import get_spark

    spark = get_spark(app_name="skew-profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    df = (
        with_signal(transcripts_df(spark, sf=sf))
        .select("conv_id", "turn_idx", "ts", "value")
        .repartition(2 * cores)
        .persist()
    )
    n_turns = df.count()
    prepared = prepare_sorted(
        df, "1 day", "conv_id", "ts", "value", "turn_idx"
    ).persist()
    prepared.count()
    fns = [model_frame_fn(), encode_frame_fn()]

    from streaming_downsampling_spark.operators._groupmap import (
        iter_whole_group_frames,
    )

    def profiled():
        # drives the REAL production carry walk (iter_whole_group_frames is
        # the exact generator apply_sorted's kernel runs), timing the whole
        # per-task pass and emitting one stats row per task
        def kernel(batches):
            t0 = time.perf_counter()
            rows = 0
            for body in iter_whole_group_frames(batches):
                for fn in fns:
                    fn(body)
                rows += len(body)
            yield pd.DataFrame(
                {
                    "pid": [TaskContext.get().partitionId()],
                    "rows": [rows],
                    "sec": [time.perf_counter() - t0],
                }
            )

        return prepared.mapInPandas(kernel, "pid int, rows long, sec double")

    profiled().collect()  # warm-up: worker pool + JIT + cache residency
    prof = sorted(profiled().collect(), key=lambda r: r["sec"])
    secs = [r["sec"] for r in prof]
    rows = sorted(r["rows"] for r in prof)
    spark.stop()
    p50, p100 = median(secs), secs[-1]
    ratio = p100 / p50 if p50 > 0 else float("inf")
    result = {
        "mode": "skew_profile",
        "job": "model+gorilla kernels over one prepared (conv_id, day) shuffle",
        "sf": sf,
        "cpus": cpus,
        "turns": n_turns,
        "tasks": len(secs),
        "task_sec_p50": round(p50, 3),
        "task_sec_p90": round(secs[int(len(secs) * 0.9) - 1], 3),
        "task_sec_p100": round(p100, 3),
        "p100_over_p50": round(ratio, 2),
        "task_rows_p50": int(median([float(x) for x in rows])),
        "task_rows_p100": int(rows[-1]),
        "meets_le_4": ratio <= 4.0,
    }
    print(json.dumps(result))
    if ratio > 4.0:
        raise SystemExit(
            f"skew straggler: task p100/p50 = {ratio:.2f} > 4 — the "
            "segmentation + (key, window) partitioning are not absorbing "
            "the long-conversation skew"
        )
    return result


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--skew" in sys.argv:
        skew_profile(
            sf=float(args[0]) if len(args) > 0 else 100.0,
            cpus=int(args[1]) if len(args) > 1 else 8,
        )
        return
    n = int(args[0]) if len(args) > 0 else 2
    sf = float(args[1]) if len(args) > 1 else 100.0
    pairs = int(args[2]) if len(args) > 2 else 5
    reps = int(args[3]) if len(args) > 3 else 2
    cpu_lo = calibrate_cpu(n)
    cpu_hi = calibrate_cpu(4 * n)
    hw_eff = (cpu_hi / cpu_lo) / 4.0
    runs = []
    for i in range(pairs):
        runs.append(run_pair(n, sf, flip=bool(i % 2), reps=reps))
    turns = runs[0]["turns"]
    lo_all = [r[str(n)] for r in runs]        # list of per-pair rep lists
    hi_all = [r[str(4 * n)] for r in runs]
    lo_secs = [min(xs) for xs in lo_all]      # per-level noise floor in pair
    hi_secs = [min(xs) for xs in hi_all]
    ratios = [lo / hi for lo, hi in zip(lo_secs, hi_secs)]
    speedup = median(ratios)
    eff = speedup / 4.0
    best = min(lo_secs) / min(hi_secs)
    lo_sec, hi_sec = median(lo_secs), median(hi_secs)
    result = {
        "job": "transcript_pipeline (tiers + gapfill + model downsample + gorilla)",
        "sf": sf,
        "pairs": pairs,
        "reps_per_level": reps,
        "turns": turns,
        f"local[{n}]": {
            "median_sec": round(lo_sec, 2),
            "all_secs": [[round(s, 2) for s in xs] for xs in lo_all],
            "turns_per_sec": round(turns / lo_sec, 1),
        },
        f"local[{4 * n}]": {
            "median_sec": round(hi_sec, 2),
            "all_secs": [[round(s, 2) for s in xs] for xs in hi_all],
            "turns_per_sec": round(turns / hi_sec, 1),
        },
        "per_pair_speedups": [round(x, 3) for x in ratios],
        "speedup_median": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "speedup_best": round(best, 3),
        "scaling_efficiency_best": round(best / 4.0, 3),
        "meets_0.8": eff >= 0.8,
        "hw_cpu_units_per_sec": {str(n): round(cpu_lo, 1), str(4 * n): round(cpu_hi, 1)},
        "hw_scaling_efficiency": round(hw_eff, 3),
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        update_bench_md(result, n)


def update_bench_md(r: dict, n: int) -> None:
    path = os.path.join(REPO, "BENCH.md")
    lo, hi = r[f"local[{n}]"], r[f"local[{4 * n}]"]
    section = f"""## Scaling evidence (N vs 4N, north-rule criterion)

Same job, same input ({r['turns']:,} turns, transcript sf={r['sf']}); {r['pairs']}
interleaved pairs, order alternating across pairs, each level measured
{r['reps_per_level']}x inside one warm session (fresh JVM per level, one
warm-up pass excluded).  **Variance-bounded protocol:** host interference
on this shared VM is strictly additive (a neighbor can slow a run down,
never speed it up), so each level's *minimum* over its in-pair repetitions
is the noise-floor estimator; the per-pair speedup is the ratio of those
minima, and the reported efficiency is the **median over pairs**:

| cluster size proxy | median wall sec | all runs (per pair) | turns/sec |
|---|---|---|---|
| `local[{n}]` (N) | {lo['median_sec']} | {lo['all_secs']} | {lo['turns_per_sec']:,} |
| `local[{4 * n}]` (4N) | {hi['median_sec']} | {hi['all_secs']} | {hi['turns_per_sec']:,} |

Per-pair speedups: {r['per_pair_speedups']} → median {r['speedup_median']}x over a
4x core increase → **scaling efficiency {r['scaling_efficiency']}**
({'meets' if r['meets_0.8'] else 'MISSES'} the >= 0.8 criterion).
Best-vs-best across all runs: {r['speedup_best']}x → {r['scaling_efficiency_best']}.

Hardware context: this VM advertises 32 CPUs but raw numpy-process
throughput saturates near 8 busy cores (1/2/8/16/32 procs →
103/193/662/756/882 work-units/s measured once; this run's calibration for
{n} vs {4 * n} procs: {r['hw_cpu_units_per_sec'][str(n)]} vs
{r['hw_cpu_units_per_sec'][str(4 * n)]} units/s = hardware efficiency
{r['hw_scaling_efficiency']}).  The N→4N pair is chosen inside the range
where the hardware itself scales; above ~8 busy cores a measurement
reflects host saturation, not the engine.

Job under test: `bench.transcript_pipeline` — deterministic synthetic
transcripts → per-turn signal → 1m→1h→1d tier cascade → linear gap-fill →
DWT+attention model downsample → Gorilla/delta-of-delta chunk compression,
all materialized in one action (independent stages schedule concurrently).
Reproduce: `python scripts/scaling_bench.py {n} {r['sf']} {r['pairs']} --update-baseline`.
"""
    marker = "## Scaling evidence"
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    if marker in text:
        head, rest = text.split(marker, 1)
        # preserve every section after the scaling one
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        text = head + section + "\n" + tail
    else:
        text = (text + "\n" if text else "# BENCH — engine measurements\n\n") + section
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
