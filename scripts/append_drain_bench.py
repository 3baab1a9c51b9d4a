"""Drain-frequency economics for append_index / stream_append.

An append re-runs finalize over ALL segments (BM25 impacts depend on
global N/avgdl/df, so the merged posting set must rewrite — there is
no correct impact-preserving append; the reference re-indexes too,
inverted_index.py:23-46 force_new). Stage A (tokenize/encode) runs
only for the NEW docs. This bench puts a number on that split so the
100 TB guidance in MIGRATION.md ("drain frequency is the knob") is
measured, not asserted: append wall vs drained fraction, against a
full rebuild of the union.

Usage: python scripts/append_drain_bench.py [--docs 400000]
         [--fracs 0.01,0.05,0.25] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_docs(spark, n: int, offset: int = 0):
    """Deterministic ~60-token docs over a 50k-term vocabulary (same
    multiplicative-hash family as batch_qps_bench)."""
    from pyspark.sql import functions as F

    P1, P2, P3 = 40503, 104729, 7919
    V, T = 50_000, 32
    tok_cols = [
        F.concat(
            F.lit("w"),
            F.pmod(
                F.col("doc_id") * P1 + F.lit(j * P2)
                + F.shiftright(F.col("doc_id"), 7) * P3,
                F.lit(V),
            ).cast("string"),
        )
        for j in range(T)
    ]
    return (
        spark.range(offset, offset + n)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", F.concat_ws(" ", *tok_cols).alias("text"))
        .repartition(64, "doc_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--fracs", default="0.01,0.05,0.25")
    ap.add_argument(
        "--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    args = ap.parse_args()
    fracs = [float(x) for x in args.fracs.split(",")]

    from splade_spark.operators.index_build import append_index, build_index
    from splade_spark.session import get_spark

    spark = get_spark(app="append-drain-bench", cores=args.cores)

    base_dir = tempfile.mkdtemp(prefix="drain_base_")
    t0 = time.time()
    build_index(synth_docs(spark, args.docs), base_dir, n_segments=4)
    base_build_s = time.time() - t0

    out = {
        "base_docs": args.docs,
        "base_build_s": round(base_build_s, 2),
        "cores": args.cores,
        "fracs": [],
    }
    for frac in fracs:
        n_new = int(args.docs * frac)
        idx = tempfile.mkdtemp(prefix=f"drain_f{int(frac * 100)}_")
        shutil.rmtree(idx)
        shutil.copytree(base_dir, idx)
        new_docs = synth_docs(spark, n_new, offset=args.docs)
        t0 = time.time()
        append_index(new_docs, idx, n_segments=2)
        append_s = time.time() - t0
        # full rebuild of the union, for the same final index state
        union_dir = tempfile.mkdtemp(prefix=f"drain_full_f{int(frac * 100)}_")
        t0 = time.time()
        build_index(
            synth_docs(spark, args.docs + n_new), union_dir, n_segments=4
        )
        rebuild_s = time.time() - t0
        out["fracs"].append(
            {
                "frac": frac,
                "new_docs": n_new,
                "append_wall_s": round(append_s, 2),
                "full_rebuild_wall_s": round(rebuild_s, 2),
                "append_vs_rebuild": round(append_s / rebuild_s, 3),
            }
        )
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(union_dir, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
