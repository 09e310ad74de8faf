"""N-vs-4N scaling experiment (BASELINE.md protocol; north-rule evidence).

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the IDENTICAL extraction job on the IDENTICAL staged
input at local[4] (N) and local[16] (4N):

* same input snapshot: a parquet corpus staged once under /tmp;
* the job is MAP-ONLY — scan -> doc-level kernel (mapInPandas) -> parquet
  sink; no shuffle (the full-extraction operator is a map; scan splits bound
  per-task input bytes, so no repartition is needed or wanted at 100 TB);
* scan width sized to the tiny corpus (1 MB splits) — at 100 TB the default
  128 MB split gives the same width naturally;
* N=4 / 4N=16: local mode runs the JVM scheduler AND one Python kernel
  worker per task on the same cores, so local[32] on a 32-vCPU box is 2x
  oversubscribed — an artifact of local mode, not of the plan; 4-vs-16
  keeps total runnable threads within the machine (the task brief allows
  any N-vs-4N pair).  local[4] runs at the saturated pure-Python kernel
  rate (~460-510 docs/s/core), so 4N is measured against an honest,
  non-degraded baseline;
* drift control: this sandbox's absolute throughput drifts over minutes and
  shows sporadic scheduler stalls, so the experiment runs ROUNDS of
  temporally-adjacent child pairs with ALTERNATING order ((N, 4N), (4N, N),
  ...) so slow windows penalize both sizes equally; each child reports its
  min of `RUNS_PER_CHILD` timed runs, efficiency is computed per round, and
  the MEDIAN round is the headline pass/fail number (best also reported);
* byte-identity guard: every run's output table must digest identically —
  the determinism claim (SURVEY.md §4.3.4) behind the scaling number.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage:  python scripts/bench_scaling.py            # full experiment
        python scripts/bench_scaling.py --child N  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(os.environ.get("SPARK_SCALE_DOCS", "64000"))
GEN_PARTS = 64
ROUNDS = int(os.environ.get("SPARK_SCALE_ROUNDS", "5"))
RUNS_PER_CHILD = int(os.environ.get("SPARK_SCALE_RUNS", "3"))
CORPUS = f"/tmp/scale_corpus_v3_{N_DOCS}"  # v3: r2 generator content (incl. JPEG images)
OUT = "/tmp/scale_out"
N_SMALL, N_BIG = 4, 16


def stage_corpus() -> None:
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.pages import corpus_df

    spark = get_spark(cores=32, app="scale-stage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, N_DOCS, parts=GEN_PARTS).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.pipeline import extracted_docs
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.pages import corpus_df

    out_dir = f"{OUT}_{cores}"
    spark = get_spark(cores=cores, app=f"scale-{cores}", extra={
        # task-side (parallel) commit — the serial job-commit rename pass
        # is a fixed cost that biases against the larger cluster
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    })
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    # warm JVM + python workers (kernel import) before timing
    extracted_docs(corpus_df(spark, 32 * cores, parts=cores)).write.format(
        "noop"
    ).mode("overwrite").save()

    src = spark.read.parquet(CORPUS)
    times = []
    for _ in range(RUNS_PER_CHILD):
        t0 = time.time()
        extracted_docs(src).write.mode("overwrite").parquet(out_dir)
        times.append(round(time.time() - t0, 3))
    best = min(times)

    digest = (
        spark.read.parquet(out_dir)
        .select("url", F.md5(F.col("text").cast("binary")).alias("h"))
        .orderBy("url")
        .agg(F.md5(F.concat_ws("|", F.collect_list(F.concat_ws(":", "url", "h"))).cast("binary")).alias("d"))
        .collect()[0]["d"]
    )
    n = spark.read.parquet(out_dir).count()
    print(json.dumps({"cores": cores, "wall_s": best, "runs": times,
                      "docs_per_sec": round(N_DOCS / best, 1),
                      "n_docs": n, "digest": digest}))
    spark.stop()


def _run_child(cores: int) -> dict:
    p = subprocess.run(
        [sys.executable, __file__, "--child", str(cores)],
        capture_output=True, text=True, cwd=str(REPO), timeout=1800,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"child {cores} failed: {p.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    stage_corpus()
    rounds = []
    digests = set()
    for i in range(ROUNDS):
        # alternate which size runs first so temporal drift within a round
        # biases neither direction
        order = (N_SMALL, N_BIG) if i % 2 == 0 else (N_BIG, N_SMALL)
        res = {c: _run_child(c) for c in order}
        rn, rb = res[N_SMALL], res[N_BIG]
        digests.update([rn["digest"], rb["digest"]])
        eff = (rb["docs_per_sec"] / rn["docs_per_sec"]) / (N_BIG / N_SMALL)
        rounds.append({"small": rn, "big": rb, "efficiency": round(eff, 3),
                       "order": f"{order[0]}->{order[1]}"})
    effs = sorted(r["efficiency"] for r in rounds)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    best = max(rounds, key=lambda r: r["efficiency"])
    eff = median_eff
    identical = len(digests) == 1
    summary = {
        "n_docs": N_DOCS,
        "cluster_sizes": [N_SMALL, N_BIG],
        "rounds": [r["efficiency"] for r in rounds],
        "median_efficiency": median_eff,
        "best_efficiency": best["efficiency"],
        "best_round": best,
        "scaling_efficiency": eff,
        "pass_efficiency_0.8": eff >= 0.8,
        "byte_identical_outputs": identical,
    }
    rs, rb = best["small"], best["big"]
    rows = "\n".join(
        f"| round {i} ({r['order']}) | {r['small']['wall_s']} | "
        f"{r['big']['wall_s']} | {r['efficiency']} |"
        for i, r in enumerate(rounds)
    )
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text(f"""# Scaling experiment (N vs 4N)

Protocol (BASELINE.md / north rule, sandbox substitution): the identical
MAP-ONLY extraction job — parquet scan ({N_DOCS} deterministic synthetic
docs: ~70% HTML / 20% PDF / 10% raw, 1% oversized ~1 MiB, heavy-host skew
30%) -> vectorized doc-level kernel (mapInPandas) -> parquet sink — run at
local[{N_SMALL}] (N) and local[{N_BIG}] (4N) in {ROUNDS} temporally-adjacent
rounds with ALTERNATING child order (this sandbox's absolute speed drifts
over minutes and shows sporadic stalls; alternation cancels the bias, and
the MEDIAN round — not the best — is the pass/fail number); each cell is
the min of {RUNS_PER_CHILD} timed runs.  No shuffle anywhere in the job:
full-corpus extraction is a map, and scan splits bound per-task memory.

| round | local[{N_SMALL}] wall s | local[{N_BIG}] wall s | efficiency |
|---|---|---|---|
{rows}

Best round: local[{N_SMALL}] {rs['docs_per_sec']} docs/s
({round(rs['docs_per_sec']/N_SMALL, 1)}/core — the saturated pure-Python
kernel rate, i.e. an honest baseline), local[{N_BIG}] {rb['docs_per_sec']}
docs/s ({round(rb['docs_per_sec']/N_BIG, 1)}/core).

- **MEDIAN scaling efficiency (throughput_4N / throughput_N) / 4 =
  {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"});
  best round {best['efficiency']:.3f}
- **Byte-identical outputs across all runs and cluster sizes: {identical}**
  (md5 over the url-sorted (url, md5(text)) stream — the determinism guard
  of SURVEY.md §4.3.4)

Raw: `{json.dumps(summary)}`
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
