"""Measure the postings footprint of the two gap codecs on the same
corpus: build one index per codec, report postings dir bytes and
bytes/posting. Usage: python scripts/codec_size_bench.py [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    from splade_spark.operators.index_build import build_index
    from splade_spark.plans.snapshots import dir_bytes
    from splade_spark.session import get_spark
    from splade_spark.sources.pages import load_documents

    spark = get_spark(app="codec-size", cores=args.cores)
    docs = load_documents(spark, args.sf_dir).select("doc_id", "text")
    from splade_spark.engine import logical_postings

    n_postings = logical_postings(docs).count()
    out = {"sf_dir": args.sf_dir, "n_postings": n_postings}
    configs = [
        ("vbyte", dict(gap_codec="vbyte")),
        ("bitpack", dict(gap_codec="bitpack")),
        ("bitpack_qonly", dict(gap_codec="bitpack", store_impacts=False)),
    ]
    for name, kw in configs:
        idx = tempfile.mkdtemp(prefix=f"codec_{name}_")
        build_index(docs, idx, n_segments=2, **kw)
        b = dir_bytes(os.path.join(idx, "postings"))
        out[f"{name}_postings_bytes"] = b
        out[f"{name}_bytes_per_posting"] = round(b / n_postings, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
