"""N-vs-4N scaling experiment (BASELINE.md protocol; north-rule evidence).

No real cluster exists in this sandbox, so the two-cluster-size criterion is
evidenced by running the IDENTICAL extraction job on the IDENTICAL staged
input at THREE local sizes — local[4] (N), local[8] (2N), local[16] (4N):

* same input snapshot: a parquet corpus staged once under /tmp;
* the job is MAP-ONLY — scan -> doc-level kernel (mapInPandas) -> parquet
  sink; no shuffle (the full-extraction operator is a map; scan splits bound
  per-task input bytes, so no repartition is needed or wanted at 100 TB);
* scan width sized to the tiny corpus (1 MB splits) — at 100 TB the default
  128 MB split gives the same width naturally;
* N=4 / 2N=8 / 4N=16: local mode runs the JVM scheduler AND one Python
  kernel worker per task on the same cores, so local[32] on a 32-vCPU box
  is 2x oversubscribed — an artifact of local mode, not of the plan;
  4-8-16 keeps total runnable threads within the machine.  local[4] runs at
  the saturated pure-Python kernel rate, so the larger sizes are measured
  against an honest, non-degraded baseline; the THIRD size (round-2 verdict
  item 10) shows the efficiency is not an artifact of one lucky pair —
  both doubling ratios and the end-to-end 4->16 ratio are reported;
* drift control: this sandbox's absolute throughput drifts over minutes and
  shows sporadic scheduler stalls, so the experiment runs ROUNDS of
  temporally-adjacent child triples with ALTERNATING order so slow windows
  penalize all sizes equally; each child reports its min of
  `RUNS_PER_CHILD` timed runs, efficiency is computed per round, and the
  MEDIAN round is the headline pass/fail number (best also reported);
* byte-identity guard: every run's output table must digest identically —
  the determinism claim (SURVEY.md §4.3.4) behind the scaling number.

Writes BENCH/BASELINE.md (scaling section) and prints one JSON line.

Usage:  python scripts/bench_scaling.py            # full experiment
        python scripts/bench_scaling.py --child N  # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(os.environ.get("SPARK_SCALE_DOCS", "200000"))
GEN_PARTS = 64
ROUNDS = int(os.environ.get("SPARK_SCALE_ROUNDS", "5"))
RUNS_PER_CHILD = int(os.environ.get("SPARK_SCALE_RUNS", "2"))
# v7: round-5 generator content (adds CCITT bilevel image payloads and the
# embedded-CMap / FontFile2 / UCS2 font shares — the tag invalidates stale
# staged corpora)
CORPUS = f"/tmp/scale_corpus_v10_{N_DOCS}"
OUT = "/tmp/scale_out"
SIZES = [4, 8, 16]  # N, 2N, 4N


def stage_corpus() -> None:
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.pages import corpus_df

    spark = get_spark(cores=32, app="scale-stage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df(spark, N_DOCS, parts=GEN_PARTS).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def _loadavg() -> dict:
    """External-load provenance sample (VERDICT r3 'what's wrong' #2): the
    1/5-min load plus runnable/total process counts, embedded in every
    child's JSON so a slow round self-explains."""
    parts = Path("/proc/loadavg").read_text().split()
    running, total = parts[3].split("/")
    return {"load1": float(parts[0]), "load5": float(parts[1]),
            "runnable": int(running), "procs": int(total)}


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.pipeline import extracted_docs
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.sources.pages import corpus_df

    load_before = _loadavg()  # before the JVM spins up: external load only
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
                      "n_docs": n, "digest": digest,
                      "load_before": load_before,
                      "load_after": _loadavg()}))
    spark.stop()


def _run_child(cores: int) -> dict:
    p = subprocess.run(
        [sys.executable, __file__, "--child", str(cores)],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
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
        # alternate child order so temporal drift within a round biases
        # no size systematically
        order = SIZES if i % 2 == 0 else list(reversed(SIZES))
        res = {c: _run_child(c) for c in order}
        digests.update(r["digest"] for r in res.values())
        tp = {c: res[c]["docs_per_sec"] for c in SIZES}
        effs = {
            "4_to_8": round((tp[8] / tp[4]) / 2, 3),
            "8_to_16": round((tp[16] / tp[8]) / 2, 3),
            "4_to_16": round((tp[16] / tp[4]) / 4, 3),
        }
        rounds.append({"res": res, "eff": effs,
                       "order": "->".join(str(c) for c in order)})
    med = {
        k: round(statistics.median(r["eff"][k] for r in rounds), 3)
        for k in ("4_to_8", "8_to_16", "4_to_16")
    }
    best_round = max(rounds, key=lambda r: r["eff"]["4_to_16"])
    headline = med["4_to_16"]  # the north-rule N-vs-4N number
    identical = len(digests) == 1
    summary = {
        "n_docs": N_DOCS,
        "cluster_sizes": SIZES,
        "rounds_4_to_16": [r["eff"]["4_to_16"] for r in rounds],
        "median_efficiency_4_to_8": med["4_to_8"],
        "median_efficiency_8_to_16": med["8_to_16"],
        "median_efficiency_4_to_16": med["4_to_16"],
        "best_efficiency_4_to_16": best_round["eff"]["4_to_16"],
        "scaling_efficiency": headline,
        "pass_efficiency_0.8": headline >= 0.8,
        "byte_identical_outputs": identical,
    }
    rows = "\n".join(
        "| round {i} ({o}) | {w4} | {w8} | {w16} | {e48} | {e816} | {e416} |".format(
            i=i, o=r["order"],
            w4=r["res"][4]["wall_s"], w8=r["res"][8]["wall_s"],
            w16=r["res"][16]["wall_s"],
            e48=r["eff"]["4_to_8"], e816=r["eff"]["8_to_16"],
            e416=r["eff"]["4_to_16"],
        )
        for i, r in enumerate(rounds)
    )
    br = best_round["res"]
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    scaling_md = f"""# Scaling experiment (N vs 2N vs 4N)

Protocol (BASELINE.md / north rule, sandbox substitution): the identical
MAP-ONLY extraction job — parquet scan ({N_DOCS} deterministic synthetic
docs: ~70% HTML / 20% PDF (both xref dialects, both font dialects) / 10%
raw, 1% oversized ~1 MiB, heavy-host skew 30%) -> vectorized doc-level
kernel (mapInPandas) -> parquet sink — run at local[4] (N), local[8] (2N)
and local[16] (4N) in {ROUNDS} temporally-adjacent rounds with ALTERNATING
child order (this sandbox's absolute speed drifts over minutes and shows
sporadic stalls; alternation cancels the bias, and the MEDIAN round — not
the best — is the pass/fail number); each cell is the min of
{RUNS_PER_CHILD} timed runs.  No shuffle anywhere in the job: full-corpus
extraction is a map, and scan splits bound per-task memory.  The third
size exists to show the 4->16 number is consistent with two independent
doubling ratios, not an artifact of one lucky pair.

| round | local[4] s | local[8] s | local[16] s | eff 4->8 | eff 8->16 | eff 4->16 |
|---|---|---|---|---|---|---|
{rows}

Best round: local[4] {br[4]['docs_per_sec']} docs/s
({round(br[4]['docs_per_sec'] / 4, 1)}/core — the saturated pure-Python
kernel rate, i.e. an honest baseline), local[8] {br[8]['docs_per_sec']}
docs/s ({round(br[8]['docs_per_sec'] / 8, 1)}/core), local[16]
{br[16]['docs_per_sec']} docs/s ({round(br[16]['docs_per_sec'] / 16, 1)}/core).

- **MEDIAN scaling efficiency (throughput_4N / throughput_N) / 4 =
  {headline:.3f}** (target >= 0.8: {"PASS" if headline >= 0.8 else "FAIL"});
  best round {best_round['eff']['4_to_16']:.3f}
- Median doubling efficiencies: 4->8 = {med['4_to_8']:.3f},
  8->16 = {med['8_to_16']:.3f} (three-point consistency check)
- **Byte-identical outputs across all runs and cluster sizes: {identical}**
  (md5 over the url-sorted (url, md5(text)) stream — the determinism guard
  of SURVEY.md §4.3.4)

Raw: `{json.dumps(summary)}`
"""
    path = bench_dir / "BASELINE.md"
    existing = path.read_text() if path.exists() else ""
    skew_marker = "\n# Skew stress"
    skew_part = ""
    if skew_marker in existing:
        skew_part = existing[existing.index(skew_marker):]
    path.write_text(scaling_md + skew_part)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
