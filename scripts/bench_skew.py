"""Skew-stress benchmark: p50/p99 task time with vs without salting.

SURVEY.md §4.3.1 / round-2 verdict item 8: the corpus plants one heavy host
(30% of all docs).  This measures what that skew DOES to a host-keyed
aggregation and what the explicit two-phase salt buys, using per-task
executorRunTime quantiles from Spark's own status REST API — not wall-clock
guesswork.

Workload: the per-host MANIFEST DIGEST (the checkpoint/lineage shape the
pipeline writes per bucket): every doc contributes the line
``url:md5(html)``; per host the sorted lines concatenate into one md5.
collect_list-style aggregation cannot pre-merge map-side, so the naive
groupBy(host) ships ALL of the heavy host's lines to ONE reducer task —
the textbook skew victim.  The salted variant is the same logical result
(digests asserted byte-equal) via phase 1 on (host, salt16) — the hot
host's lines split across 16 reducers — and phase 2 flatten+sort+md5 over
the 16 pre-collected partials.

Output: one JSON line + a "# Skew stress" section appended to
BENCH/BASELINE.md (the scaling section is preserved).

Usage:  python scripts/bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.bench_scaling import CORPUS, N_DOCS, stage_corpus  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SALTS = 16


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def task_quantiles(spark, group: str) -> dict:
    """Max-p99 stage's executorRunTime quantiles for all jobs in a group."""
    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]
    stage_ids = set()
    for job in _get(f"{ui}/api/v1/applications/{app}/jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    worst = None
    for sid in sorted(stage_ids):
        try:
            summ = _get(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/0/taskSummary"
                f"?quantiles=0.05,0.5,0.99,1.0"
            )
        except Exception:
            continue  # skipped stage (no tasks ran)
        rt = summ.get("executorRunTime")
        if not rt:
            continue
        q = {"p05": rt[0], "p50": rt[1], "p99": rt[2], "max": rt[3],
             "stage": sid}
        if worst is None or q["p99"] > worst["p99"]:
            worst = q
    return worst or {}


def main() -> None:
    stage_corpus()
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.salted import host_of
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(cores=CPUS, app="skew-bench", shuffle_partitions=2 * CPUS,
                      extra={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    src = spark.read.parquet(CORPUS).select(
        host_of(F.col("url")).alias("host"),
        F.concat(F.col("url"), F.lit(":"), F.md5("html")).alias("line"),
    )

    digest = F.md5(
        F.concat_ws("\n", F.array_sort(F.collect_list("line"))).cast("binary")
    )

    def naive():
        return src.groupBy("host").agg(
            digest.alias("digest"), F.count(F.lit(1)).alias("n_docs")
        )

    def salted():
        part = (
            src.withColumn(
                "_salt", F.pmod(F.xxhash64("line"), F.lit(N_SALTS))
            )
            .groupBy("host", "_salt")
            .agg(F.collect_list("line").alias("part"),
                 F.count(F.lit(1)).alias("n"))
        )
        return part.groupBy("host").agg(
            F.md5(
                F.concat_ws(
                    "\n",
                    F.array_sort(F.flatten(F.collect_list("part"))),
                ).cast("binary")
            ).alias("digest"),
            F.sum("n").cast("long").alias("n_docs"),
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    force(naive())
    force(salted())

    results = {}
    for name, thunk in (("naive", naive), ("salted", salted)):
        walls = []
        for run in range(2):
            group = f"{name}-{run}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            force(thunk())
            walls.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
        q = task_quantiles(spark, group)  # last (steady-state) run
        results[name] = {"wall_s": min(walls), "tasks_ms": q}

    # value identity: the salt must be invisible in the digests
    a = {(r["host"], r["digest"], r["n_docs"]) for r in naive().collect()}
    b = {(r["host"], r["digest"], r["n_docs"]) for r in salted().collect()}
    assert a == b, "salted digest diverged from naive"
    heavy = max(a, key=lambda t: t[2])

    n_q, s_q = results["naive"]["tasks_ms"], results["salted"]["tasks_ms"]
    summary = {
        "n_docs": N_DOCS,
        "heavy_host_docs": heavy[2],
        "heavy_host_frac": round(heavy[2] / N_DOCS, 3),
        "n_salts": N_SALTS,
        "naive": results["naive"],
        "salted": results["salted"],
        "p99_improvement": round(
            (n_q.get("p99", 0) or 1) / max(s_q.get("p99", 1), 1), 2),
        "digests_identical": True,
    }

    md = f"""
# Skew stress: heavy host vs explicit salting (§4.3.1)

One host carries **{heavy[2]} of {N_DOCS} docs
({summary['heavy_host_frac']:.0%})**.  Workload: per-host manifest digest
(sorted ``url:md5(html)`` lines -> one md5 per host) — a collect-style
aggregation with no map-side merge, so the naive groupBy(host) ships the
whole heavy host to ONE reducer task.  Salted = identical result (digest
sets asserted byte-equal) via (host, salt%{N_SALTS}) phase 1 + flatten
phase 2.  Task times are executorRunTime quantiles of the worst stage,
from the Spark status REST API, on local[{CPUS}].

| variant | wall s | task p05 ms | task p50 ms | task p99 ms | task max ms |
|---|---|---|---|---|---|
| naive groupBy(host) | {results['naive']['wall_s']} | {n_q.get('p05')} | {n_q.get('p50')} | {n_q.get('p99')} | {n_q.get('max')} |
| salted ({N_SALTS} salts) | {results['salted']['wall_s']} | {s_q.get('p05')} | {s_q.get('p50')} | {s_q.get('p99')} | {s_q.get('max')} |

p99 task time improves **{summary['p99_improvement']}x** under the salt.
At 1000 executors the naive plan's p99 task IS the job's critical path —
the salt converts the hot key's straggler into {N_SALTS} parallel tasks,
which is why the pipeline's host rollups always aggregate through
``operators/salted.salted_agg``.

Raw: `{json.dumps(summary)}`
"""
    path = REPO / "BENCH" / "BASELINE.md"
    existing = path.read_text() if path.exists() else ""
    marker = "\n# Skew stress"
    if marker in existing:
        existing = existing[: existing.index(marker)]
    path.write_text(existing.rstrip() + "\n" + md)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
