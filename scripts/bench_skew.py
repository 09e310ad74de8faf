"""Skew-stress benchmark: p50/p99 task time with vs without salting.

SURVEY.md §4.3.1 / round-2 verdict item 8: the corpus plants one heavy host
(30% of all docs).  This measures what that skew DOES to a host-keyed
aggregation and what the explicit two-phase salt buys, using per-task
executorRunTime quantiles from Spark's own status REST API — not wall-clock
guesswork.

Workload: per-host TOP-10 largest documents ("largest pages per site") —
a collect-and-sort aggregation with no map-side merge, so the naive
groupBy(host) ships ALL of the heavy host's rows to ONE reducer task, the
textbook skew victim.  Top-K merges losslessly, so the salted variant is
the same logical result (asserted value-identical) with the hot key split
across 16 phase-1 reducers and a trivially cheap phase-2 merge of ten-row
lists.  (A non-decomposable reduction — e.g. an exact per-host sorted
digest — re-concentrates the hot key in phase 2 no matter the salt; that
shape needs bucketed sort-merge instead, and purely algebraic rollups
like q_host_salted's count/sum are already flattened by map-side
partials.  Salting pays off exactly for the decomposable-but-unmergeable-
map-side middle ground this workload represents.)

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
# Per-row content-preview size carried into the report.  Round 5: raised
# 512 -> 4096 after discovering the 512-byte rows made the heavy host's
# whole reduce ~0.3 s on an idle box (round 4's 13.4 s naive p99 is not
# reproducible on a quiet machine and predates the skew script recording
# loadavg provenance — the sandbox's documented multi-minute slow phases
# are the likely culprit).  At 4 KB the hot task concatenates+sorts
# ~240 MB in one reducer, which is the honest shape of a "largest pages
# with preview" report and demonstrates the salt on clean timings.
HEAD_CHARS = 4096


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def task_quantiles(spark, groups: list) -> dict:
    """executorRunTime quantiles of the group's worst REDUCE stage.

    Only stages that READ a shuffle qualify — the map/scan stage has
    uniformly long tasks (it reads the payload bytes) and would mask the
    reduce-side skew this benchmark measures; among reduce stages the one
    with the highest p99 is the straggler victim."""
    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]
    stage_ids = set()
    for job in _get(f"{ui}/api/v1/applications/{app}/jobs"):
        if job.get("jobGroup") in groups:
            stage_ids.update(job["stageIds"])
    by_id = {
        s["stageId"]: s
        for s in _get(f"{ui}/api/v1/applications/{app}/stages")
        if s["stageId"] in stage_ids
    }
    worst = None
    for sid in sorted(stage_ids):
        if by_id.get(sid, {}).get("shuffleReadBytes", 0) <= 0:
            continue
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
             "stage": sid, "n_tasks": by_id[sid].get("numCompleteTasks")}
        # structural skew evidence, timing-independent: how many shuffle
        # rows/bytes the hottest task received vs the median task
        srm = summ.get("shuffleReadMetrics") or {}
        for field, label in (("readRecords", "read_records"),
                             ("remoteBytesRead", None)):
            vals = srm.get(field)
            if label and vals:
                q[f"{label}_p50"] = vals[1]
                q[f"{label}_max"] = vals[3]
        tot = srm.get("totalBytesRead") or srm.get("readBytes")
        if tot:
            q["read_bytes_p50"] = tot[1]
            q["read_bytes_max"] = tot[3]
        if worst is None or q["p99"] > worst["p99"]:
            worst = q
    return worst or {}


def main() -> None:
    global LOAD_BEFORE
    LOAD_BEFORE = Path("/proc/loadavg").read_text().split()[:3]
    stage_corpus()
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.salted import host_of
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(cores=CPUS, app="skew-bench", shuffle_partitions=2 * CPUS,
                      extra={
                          "spark.ui.enabled": "true",
                          # keep the full reduce fan-out: AQE's coalescing
                          # would merge the small partitions and flatten the
                          # p50 this benchmark compares the hot task against
                          "spark.sql.adaptive.coalescePartitions.enabled":
                              "false",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # Workload: per-host TOP-10 largest documents (size desc, url
    # tie-break), each row carrying a ~0.5 KB payload slice — the "largest
    # pages per site" report shape.  The reduction is salt-DECOMPOSABLE:
    # per-(host,salt) top-10s merge losslessly into the host top-10, so
    # phase 2 touches only 16 x 10 rows per host while the naive
    # groupBy(host) collects and sorts the heavy host's full 60k rows in
    # ONE task.  (Contrast: an exact per-host sorted DIGEST is NOT
    # decomposable — its final combine re-concentrates the hot key no
    # matter the salt; that workload belongs to bucketed sort-merge, not
    # salting.  q_host_salted's count/sum rollups are the other easy case:
    # map-side partials alone flatten those.)
    src = spark.read.parquet(CORPUS).select(
        host_of(F.col("url")).alias("host"),
        F.struct(
            (-F.length("html")).cast("long").alias("neg_size"),
            F.col("url").alias("url"),
            F.substring(F.base64("html"), 1, HEAD_CHARS).alias("head"),
        ).alias("row"),
    )

    def top10(col):
        return F.slice(F.array_sort(col), 1, 10)

    def naive():
        return src.groupBy("host").agg(
            top10(F.collect_list("row")).alias("top"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    def salted():
        part = (
            src.withColumn(
                "_salt", F.pmod(F.xxhash64(F.col("row")["url"]),
                                F.lit(N_SALTS))
            )
            .groupBy("host", "_salt")
            .agg(top10(F.collect_list("row")).alias("part"),
                 F.count(F.lit(1)).alias("n"))
        )
        return part.groupBy("host").agg(
            top10(F.flatten(F.collect_list("part"))).alias("top"),
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
        groups = []
        for run in range(2):
            group = f"{name}-{run}"
            groups.append(group)
            sc.setJobGroup(group, name)
            t0 = time.time()
            force(thunk())
            walls.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
        # worst reduce stage across BOTH runs: one run can land in a sandbox
        # stall (inflating) or get a shuffle-reuse freebie (deflating)
        q = task_quantiles(spark, groups)
        results[name] = {"wall_s": min(walls), "tasks_ms": q}

    # value identity: the salt must be invisible in the result
    def key(r):
        return (r["host"], tuple(tuple(t) for t in r["top"]), r["n_docs"])

    a = {key(r) for r in naive().collect()}
    b = {key(r) for r in salted().collect()}
    assert a == b, "salted top-10 diverged from naive"
    heavy = max(a, key=lambda t: t[2])

    n_q, s_q = results["naive"]["tasks_ms"], results["salted"]["tasks_ms"]

    def imb(q):  # hottest / median task time — the wave-straggler ratio
        return round(q.get("max", 0) / max(q.get("p50", 1), 1), 1)

    def rec_ratio(q):  # hottest / median task shuffle rows — structural
        if not q.get("read_records_max"):
            return None
        return round(q["read_records_max"] / max(q.get("read_records_p50", 1), 1), 1)

    def byte_ratio(q):  # hottest / median task shuffle bytes — structural
        if not q.get("read_bytes_max"):
            return None
        return round(q["read_bytes_max"] / max(q.get("read_bytes_p50", 1), 1), 1)

    summary = {
        "n_docs": N_DOCS,
        "head_chars": HEAD_CHARS,
        "loadavg_before": LOAD_BEFORE,
        "loadavg_after": Path("/proc/loadavg").read_text().split()[:3],
        "heavy_host_docs": heavy[2],
        "heavy_host_frac": round(heavy[2] / N_DOCS, 3),
        "n_salts": N_SALTS,
        "naive": results["naive"],
        "salted": results["salted"],
        "task_time_imbalance_naive": imb(n_q),
        "task_time_imbalance_salted": imb(s_q),
        "hot_partition_records_ratio_naive": rec_ratio(n_q),
        "hot_partition_records_ratio_salted": rec_ratio(s_q),
        "hot_partition_bytes_ratio_naive": byte_ratio(n_q),
        "hot_partition_bytes_ratio_salted": byte_ratio(s_q),
        "results_identical": True,
    }

    md = f"""
# Skew stress: heavy host vs explicit salting (§4.3.1)

One host carries **{heavy[2]} of {N_DOCS} docs
({summary['heavy_host_frac']:.0%})**.  Workload: per-host TOP-10 largest
documents (size desc, url tie-break, each row carrying a
~{HEAD_CHARS / 1024:.0f} KB content preview) — the "largest
pages per site" report.  The naive groupBy(host) collects and sorts the
heavy host's full ~{heavy[2] * HEAD_CHARS / (1 << 20):.0f} MB in ONE
reducer task; the salted plan computes
per-(host, salt%{N_SALTS}) top-10s (phase 1, hot key split {N_SALTS}
ways) and merges 16 ten-row lists per host (phase 2, trivially cheap) —
top-K merges losslessly, which is exactly what makes it saltable.
Results asserted value-identical.  Task times are executorRunTime
quantiles of the worst shuffle-READING stage across both timed runs (the
map/scan stage's uniformly long tasks would mask the reduce skew), from
the Spark status REST API, on local[{CPUS}] with AQE partition coalescing
off so the reduce fan-out stays at the configured {2 * CPUS}.

| variant | wall s | task p50 ms | task max ms | max/p50 time | shuffle MB max | shuffle MB p50 | max/p50 bytes |
|---|---|---|---|---|---|---|---|
| naive groupBy(host) | {results['naive']['wall_s']} | {n_q.get('p50')} | {n_q.get('max')} | {summary['task_time_imbalance_naive']}x | {(n_q.get('read_bytes_max') or 0) / (1 << 20):.1f} | {(n_q.get('read_bytes_p50') or 0) / (1 << 20):.1f} | {summary['hot_partition_bytes_ratio_naive']}x |
| salted ({N_SALTS} salts) | {results['salted']['wall_s']} | {s_q.get('p50')} | {s_q.get('max')} | {summary['task_time_imbalance_salted']}x | {(s_q.get('read_bytes_max') or 0) / (1 << 20):.1f} | {(s_q.get('read_bytes_p50') or 0) / (1 << 20):.1f} | {summary['hot_partition_bytes_ratio_salted']}x |

**The headline is the IMBALANCE, stated two ways** — structurally
(shuffle bytes into the hottest reduce task vs the median task:
{summary['hot_partition_bytes_ratio_naive']}x naive vs
{summary['hot_partition_bytes_ratio_salted']}x salted — the salt splits
the hot partition across {N_SALTS} tasks) and in task time
(hottest/median, {summary['task_time_imbalance_naive']}x naive vs
{summary['task_time_imbalance_salted']}x salted).  Loadavg before/after:
{LOAD_BEFORE} / {summary['loadavg_after']}.

Honesty note (round 5): on an IDLE box at this corpus size the naive hot
task is sub-second — Tungsten concatenates and sorts the heavy host's
~{heavy[2] * HEAD_CHARS // (1 << 20)} MB without drama — so the
round-3/4 reports of 10x wall-clock wins (13.4 s hot tasks) are NOT
reproducible on clean timings; those runs predate this script recording
loadavg and evidently landed in the sandbox's documented slow phases.
What scales to 10^12 docs is the structural ratio: the reduce wave's
duration is its hottest task, and a task holding 30% of the corpus is
hours while its peers finish in minutes — the salt bounds the hot
partition at 1/{N_SALTS} of the key (and composes: more salts, flatter).
Phase 1 also shrinks the phase-2 shuffle to {N_SALTS} x 10 rows per
host, so the second shuffle is ~free.  The salt is explicit and keyed
(`operators/salted.salted_agg`, deterministic xxhash64 — retry-safe)
because this only works for DECOMPOSABLE reductions: top-K and algebraic
partials merge losslessly; an exact per-host sorted digest would
re-concentrate in phase 2 no matter the salt (that shape wants bucketed
sort-merge instead).

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
