"""Two-cluster-size scaling benchmark (north_rule criterion).

No real cluster exists in this sandbox, so the N → 4N executor scaling
criterion is evidenced by running the IDENTICAL validation job at two
local parallelism levels (local[8] vs local[32], shuffle partitions
scaled proportionally) on the SAME cached input, reporting validated
turns/sec at each and the scaling efficiency
(T32/T8)/(32/8) — target ≥ 0.8. Results → BENCH/BASELINE.md.

Each level runs in its own subprocess so the JVM is cold/isolated.

Usage: PYTHONPATH=/root/repo python3 scripts/scaling_bench.py [n_convs]
       python3 scripts/scaling_bench.py --level 8 <fact> <conv> <tools>  (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = (8, 32)


def run_level(cpus: int, fact_p: str, conv_p: str, tools_p: str) -> None:
    from hdfs_anomaly_detection_spark.constraints import (
        TextEquals,
        ValidationRunner,
        default_transcript_checks,
    )
    from hdfs_anomaly_detection_spark.session import get_spark

    spark = get_spark(parallelism=cpus, shuffle_partitions=cpus * 2,
                      app_name=f"scaling-{cpus}")
    fact = spark.read.parquet(fact_p)
    # static reference corpus: canonical hashes precomputed ONCE at
    # baseline time (reference_hashes), not re-canonicalized per run
    ref_p = fact_p.rsplit("/", 1)[0] + "/ref_hashes"
    runner = ValidationRunner(
        default_transcript_checks() + [TextEquals("text_equals")],
        n_buckets=64,
        dims={
            "conversations": spark.read.parquet(conv_p),
            "tools": spark.read.parquet(tools_p),
        },
        reference=spark.read.parquet(ref_p),
    )
    # warm the page cache / JIT with a cheap scan so levels compare fairly
    fact.count()
    t0 = time.time()
    res = runner.run(fact)
    nv = res.violations.count()
    res.verdicts.collect()
    elapsed = time.time() - t0
    n = fact.count()
    print(json.dumps({"cpus": cpus, "elapsed": elapsed, "rows": n, "violations": nv}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        run_level(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
        return

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cache = f"{REPO}/.bench_cache/scaling_c{n_convs}"
    if not os.path.exists(f"{cache}/_DONE"):
        from hdfs_anomaly_detection_spark.fixtures import CORRUPTED, FixtureConfig, build_fixture
        from hdfs_anomaly_detection_spark.session import get_spark

        spark = get_spark(parallelism=32, shuffle_partitions=64, app_name="scaling-gen")
        cfg = FixtureConfig(
            n_conversations=n_convs,
            null_text_rate=CORRUPTED.null_text_rate,
            bad_role_rate=CORRUPTED.bad_role_rate,
            dup_rate=CORRUPTED.dup_rate,
            gap_rate=CORRUPTED.gap_rate,
            dangling_conv_rate=CORRUPTED.dangling_conv_rate,
            dangling_tool_rate=CORRUPTED.dangling_tool_rate,
        )
        fx = build_fixture(spark, cfg)
        fx.fact.repartition(128).write.mode("overwrite").parquet(f"{cache}/fact")
        fx.conversations.write.mode("overwrite").parquet(f"{cache}/conversations")
        fx.tools.write.mode("overwrite").parquet(f"{cache}/tools")
        from hdfs_anomaly_detection_spark.constraints import TextEquals
        from hdfs_anomaly_detection_spark.constraints.runner import reference_hashes
        from hdfs_anomaly_detection_spark.fixtures import clean_transcripts

        reference_hashes(
            clean_transcripts(spark, cfg), TextEquals("text_equals")
        ).repartition(128).write.mode("overwrite").parquet(f"{cache}/ref_hashes")
        open(f"{cache}/_DONE", "w").write("ok")
        spark.stop()

    results = {}
    for cpus in LEVELS:
        # pin CPU affinity: "local[N]" alone still lets GC/IO/netty threads
        # use every core, which would flatter the small level — taskset
        # models an N-core cluster honestly
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, os.path.abspath(__file__), "--level", str(cpus),
             f"{cache}/fact", f"{cache}/conversations", f"{cache}/tools"],
            capture_output=True, text=True, env={**os.environ, "PYTHONPATH": REPO},
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    lo, hi = LEVELS
    thr = {c: results[c]["rows"] / results[c]["elapsed"] for c in LEVELS}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — Two-parallelism scaling evidence (north_rule criterion)

Identical full-constraint validation job (null/domain/range checks,
salted uniqueness, referential integrity vs 2 dims, ordering window)
over the same cached {results[lo]["rows"]:,}-turn corrupted transcripts
parquet, run at two local parallelism levels (no real cluster in this
sandbox; `taskset -c 0-(N-1) … local[N]` pins the JVM to N cores so GC /
IO / shuffle threads can't borrow idle cores and flatter the small
level; shuffle partitions scaled 2×cores). The per-turn text-equality
invariant (regex canonicalization + xxhash64 vs precomputed reference
hashes) is included — it dominates per-row CPU exactly as it would at
10^12 turns:

| parallelism | wall sec | validated turns/sec |
|---|---|---|
| local[{lo}] | {results[lo]["elapsed"]:.2f} | {thr[lo]:,.0f} |
| local[{hi}] | {results[hi]["elapsed"]:.2f} | {thr[hi]:,.0f} |

**Scaling efficiency** (thr@{hi} / thr@{lo}) / ({hi}/{lo}) = **{eff:.3f}**
(north_rule target ≥ 0.8).

Violations found (identical at both levels): {results[lo]["violations"]:,} vs
{results[hi]["violations"]:,}.

Reproduce: `PYTHONPATH=. python3 scripts/scaling_bench.py {n_convs}`
"""
        )
    print(json.dumps({"efficiency": round(eff, 3), "throughput": {str(k): round(v, 1) for k, v in thr.items()}}))


if __name__ == "__main__":
    main()
