"""LSH candidate-growth experiment (round-4 item 8; VERDICT.md round-3
next-round list): measure how the MinHash-LSH dedup family actually grows
with corpus size, instead of arguing the 100-TB claim from plan shape.

Design: doc_id windows n in {500, 1000, 2000, 5000} over the sf0.1
documents table (same distribution at every size — the corpus's dup
clusters grow with n, like boilerplate/template pages at web scale).  At
each n, three relations are counted and timed:

- clique pairs  (minhash_lsh_pairs): every within-bucket pair — the
  candidate RELATION q_minhash_lsh emits;
- star edges    (minhash_star_edges): doc -> bucket-hub links — identical
  connected components, edge count bounded by the 8n band rows;
- verified dups (jaccard_verify over the clique pairs at >= 0.5).

Timing: reps are temporally interleaved across sizes (size order cycles
per rep) and each cell is the min over reps — this sandbox's absolute
speed drifts over minutes (BENCH/HISTORY.md), and interleaving cancels
the bias.  /proc/loadavg is sampled before/after and embedded.

Output: one JSON line on stdout + a refreshed section in
BENCH/BASELINE.md between the LSH-GROWTH markers.

    python scripts/bench_lsh_growth.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZES = [500, 1000, 2000, 5000]
REPS = 3
SF_DIR = "/root/testdata/sf0.1"
MARK_BEGIN = "<!-- LSH-GROWTH:BEGIN -->"
MARK_END = "<!-- LSH-GROWTH:END -->"


def _loadavg() -> dict:
    parts = Path("/proc/loadavg").read_text().split()
    run, tot = parts[3].split("/")
    return {"load1": float(parts[0]), "load5": float(parts[1]),
            "load15": float(parts[2]), "runnable": int(run),
            "procs": int(tot)}


def main() -> None:
    from pdf_extractor_spark.operators.dedup import (
        _shingle_array,
        jaccard_verify,
        minhash_lsh_pairs,
        minhash_star_edges,
    )
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(cores=16, app="lsh-growth")
    spark.sparkContext.setLogLevel("ERROR")
    load_before = _loadavg()

    counts: dict[int, dict] = {n: {} for n in SIZES}
    times: dict[int, dict] = {n: {"clique": [], "star": [], "verify": []}
                              for n in SIZES}

    for rep in range(REPS):
        # cycle the size order so drift hits every size equally
        order = SIZES[rep % len(SIZES):] + SIZES[:rep % len(SIZES)]
        for n in order:
            base = _shingle_array(spark, SF_DIR, n)
            t0 = time.time()
            c = minhash_lsh_pairs(base).count()
            times[n]["clique"].append(time.time() - t0)
            counts[n]["clique"] = c
            t0 = time.time()
            s = minhash_star_edges(base).count()
            times[n]["star"].append(time.time() - t0)
            counts[n]["star"] = s
            if rep == 0:
                counts[n]["n_docs"] = base.count()
            if rep < 2:  # verify is the heavy stage; two timed runs
                t0 = time.time()
                d = (jaccard_verify(minhash_lsh_pairs(base), base)
                     .filter("verdict = 'dup'").count())
                times[n]["verify"].append(time.time() - t0)
                counts[n]["dups"] = d

    load_after = _loadavg()

    def slope(metric: str) -> float:
        """log-log growth exponent fit between the smallest and largest n."""
        lo, hi = SIZES[0], SIZES[-1]
        return math.log(counts[hi][metric] / counts[lo][metric]) / math.log(
            counts[hi]["n_docs"] / counts[lo]["n_docs"])

    rows = []
    for n in SIZES:
        c = counts[n]
        all_pairs = c["n_docs"] * (c["n_docs"] - 1) // 2
        rows.append({
            "n_docs": c["n_docs"],
            "all_pairs": all_pairs,
            "clique_pairs": c["clique"],
            "clique_sel_pct": round(100.0 * c["clique"] / all_pairs, 2),
            "star_edges": c["star"],
            "dup_pairs": c["dups"],
            "t_clique": round(min(times[n]["clique"]), 3),
            "t_star": round(min(times[n]["star"]), 3),
            "t_verify": round(min(times[n]["verify"]), 3),
        })

    result = {
        "metric": "lsh_growth",
        "sf_dir": SF_DIR,
        "sizes": SIZES,
        "rows": rows,
        "exponent_clique": round(slope("clique"), 3),
        "exponent_star": round(slope("star"), 3),
        "exponent_dups": round(slope("dups"), 3),
        "load_before": load_before,
        "load_after": load_after,
        "contended": max(load_before["load1"], load_after["load1"]) > 4.0,
    }
    print(json.dumps(result))

    md = [MARK_BEGIN, "", "# LSH candidate growth vs corpus size (§ dedup at 100 TB)", "",
          "Protocol: doc_id windows over the sf0.1 documents table (same",
          "distribution at every size; dup clusters grow with n, as",
          "boilerplate does at web scale).  Interleaved reps, min-of-rep",
          f"cells; load before/after `{json.dumps(load_before)}` /",
          f"`{json.dumps(load_after)}`.", "",
          "| n docs | all pairs | clique candidates | sel % | star edges | verified dups | t clique s | t star s | t verify s |",
          "|---|---|---|---|---|---|---|---|---|"]
    for r in rows:
        md.append(
            f"| {r['n_docs']} | {r['all_pairs']} | {r['clique_pairs']} "
            f"| {r['clique_sel_pct']} | {r['star_edges']} | {r['dup_pairs']} "
            f"| {r['t_clique']} | {r['t_star']} | {r['t_verify']} |")
    md += [
        "",
        f"Fitted log-log growth exponents (n {SIZES[0]} -> {SIZES[-1]}): "
        f"clique pairs **{result['exponent_clique']}**, "
        f"star edges **{result['exponent_star']}**, "
        f"verified dups **{result['exponent_dups']}** "
        "(1.0 = linear, 2.0 = quadratic).",
        "",
        "Reading: the clique-pair RELATION grows ~quadratically — not an",
        "algorithmic defect but the truth (verified dup pairs grow at the",
        "same exponent: when cluster sizes scale with the corpus, the pair",
        "relation is inherently O(n^2) for ANY exact method).  The LSH join",
        "still never compares non-colliding docs (selectivity column).  The",
        "scale path for dedup DECISIONS is `minhash_star_edges` -> min-label",
        "components (q_dup_clusters): identical clusters, edge count bounded",
        "by the 8n band rows — the measured star exponent above.  Pair-level",
        "verification at 100 TB applies per-bucket caps or sampling on top",
        "of the same plan.",
        "", MARK_END]

    baseline = Path(__file__).resolve().parent.parent / "BENCH" / "BASELINE.md"
    text = baseline.read_text()
    block = "\n".join(md)
    if MARK_BEGIN in text:
        pre = text[:text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END):]
        baseline.write_text(pre + block + post)
    else:
        baseline.write_text(text.rstrip() + "\n\n" + block + "\n")


if __name__ == "__main__":
    main()
