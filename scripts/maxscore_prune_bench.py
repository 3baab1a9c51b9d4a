"""Evidence that MaxScore/Block-Max pruning WINS on a skewed corpus
(the replicated bench corpus equalizes block maxima, so the main
bench can't show it). Builds the dl-skewed fixture from
tests/test_maxscore_pruning.py at a configurable size, then times
exhaustive `search` vs `search_maxscore` on the same index and
reports blocks_kept/blocks_total.

Usage: python scripts/maxscore_prune_bench.py [--docs 200000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--n-rare", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from splade_spark.operators.index_build import build_index
    from splade_spark.operators.index_query import search
    from splade_spark.operators.maxscore import search_maxscore
    from splade_spark.session import get_spark

    # UI on: the REST status API is where Spark exposes per-stage
    # bytesRead — the at-scale evidence that pruned scans read bytes
    # proportional to blocks KEPT, not blocks total
    spark = get_spark(
        app="maxscore-prune-bench",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )

    def input_bytes() -> int:
        import json as _json
        import urllib.request

        base = "http://localhost:4057/api/v1"
        apps = _json.load(urllib.request.urlopen(f"{base}/applications"))
        app_id = apps[0]["id"]
        stages = _json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages")
        )
        return sum(s.get("inputBytes", 0) for s in stages)
    # SPLADE-shaped query load: 10 mid-df terms (each in ~half the
    # docs, membership = bit j of doc_id) + one rare champion term
    # that lives only in the SHORTEST docs. dl cycles with period 4000
    # (pad count 3..503), so each term's posting blocks have strongly
    # varying block maxima — the skew Block-Max pruning exploits.
    # candidates carry tf=8 on every query term — the BM25 analog of
    # SPLADE's high impact weights on matching expansion terms; block
    # maxima of ordinary (tf=1) blocks sit at ~55-70% of the term UB,
    # which is the gap Block-Max pruning cashes in
    n_terms = 10
    cand_terms = F.repeat(
        F.lit(" " + " ".join(f"t{j}" for j in range(n_terms))), 8
    )
    mid_terms = F.concat(
        *[
            F.when(
                F.col("id").bitwiseAND(F.lit(1 << j)) == 0, F.lit(f" t{j}")
            ).otherwise(F.lit(""))
            for j in range(n_terms)
        ]
    )
    docs = spark.range(args.docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") < args.n_rare, F.lit("rare")).otherwise(F.lit("x")),
            F.when(F.col("id") < args.n_rare, cand_terms).otherwise(mid_terms),
            F.repeat(
                F.lit(" pad"), (F.lit(3) + ((F.col("id") % 4000) / 8).cast("int"))
            ),
        ).alias("text"),
    )
    idx = tempfile.mkdtemp(prefix="prune_bench_")
    t0 = time.time()
    build_index(docs, idx, n_segments=4)
    build_s = time.time() - t0

    qtext = "rare " + " ".join(f"t{j}" for j in range(n_terms))
    queries = spark.createDataFrame([(1, qtext)], "qid long, text string")

    def timed(fn):
        best = float("inf")
        for _ in range(args.reps):
            t = time.time()
            rows = fn()
            best = min(best, time.time() - t)
        return best, rows

    # block-count evidence gathered ONCE, untimed (debug_counts adds
    # two extra count jobs that must not pollute the timing)
    counts: dict = {}
    search_maxscore(spark, idx, queries, k=10, debug_counts=counts, strategy="relation").collect()
    # bytes measured on CLEAN runs (debug_counts adds metadata count
    # jobs over the full block set that would inflate the pruned side)
    b0 = input_bytes()
    search_maxscore(spark, idx, queries, k=10, strategy="relation").collect()
    bytes_pruned = input_bytes() - b0
    b0 = input_bytes()
    search(spark, idx, queries, k=10).collect()
    bytes_exhaustive = input_bytes() - b0
    t_ms, r_ms = timed(
        lambda: search_maxscore(spark, idx, queries, k=10, strategy="relation").collect()
    )
    t_ex, r_ex = timed(lambda: search(spark, idx, queries, k=10).collect())

    from splade_spark.operators.index_query import search_fused
    from splade_spark.operators.maxscore import search_maxscore_fused

    qrows = [(1, qtext)]
    t_msf, r_msf = timed(
        lambda: search_maxscore_fused(spark, idx, qrows, k=10).collect()
    )
    t_exf, r_exf = timed(lambda: search_fused(spark, idx, qrows, k=10).collect())
    for other, name in [(r_ex, "exhaustive"), (r_msf, "fused-maxscore"), (r_exf, "fused")]:
        assert {(r.doc_id, r.score) for r in r_ms} == {
            (r.doc_id, r.score) for r in other
        }, f"pruned result diverged from {name}"
    print(
        json.dumps(
            {
                "docs": args.docs,
                "build_s": round(build_s, 2),
                "blocks_total": counts["blocks_total"],
                "blocks_kept": counts["blocks_kept"],
                "kept_frac": round(counts["blocks_kept"] / counts["blocks_total"], 4),
                "maxscore_best_s": round(t_ms, 3),
                "exhaustive_best_s": round(t_ex, 3),
                "maxscore_fused_best_s": round(t_msf, 3),
                "exhaustive_fused_best_s": round(t_exf, 3),
                "fused_speedup": round(t_exf / t_msf, 3),
                "exhaustive_input_bytes": bytes_exhaustive,
                "maxscore_input_bytes": bytes_pruned,
                "pruned_bytes_frac": round(
                    bytes_pruned / max(bytes_exhaustive, 1), 4
                ),
                "lossless": True,
                "cores": args.cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
