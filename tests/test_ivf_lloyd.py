"""Lloyd-iterated IVF: the refined centroids must retrieve more of the
exact top-k than the raw seeds on a clustered corpus.

Fixture: 4 well-separated direction clusters in 16-d, points derived
deterministically from md5 so the test is seed-free. The first
IVF_CELLS seed vectors all land in cluster 0 (vec_ids are assigned
cluster-major), so seed-centroid IVF collapses most of the space into
one cell — the worst case Lloyd iterations are meant to fix.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from splade_spark.operators import ann

DIM = 16
N_CLUSTERS = 4
PER_CLUSTER = 60


def _unit(vals):
    n = sum(v * v for v in vals) ** 0.5
    return [v / n for v in vals]


def _h(s: str) -> float:
    # [-1, 1) deterministic pseudo-random
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") / 2**31 - 1.0


def _clustered_rows():
    centers = [
        _unit([_h(f"c{c}_{d}") for d in range(DIM)]) for c in range(N_CLUSTERS)
    ]
    rows = []
    vec_id = 0
    for c, center in enumerate(centers):
        for j in range(PER_CLUSTER):
            noise = [0.15 * _h(f"p{c}_{j}_{d}") for d in range(DIM)]
            rows.append(
                (vec_id, [float(x + e) for x, e in zip(center, noise)], c)
            )
            vec_id += 1
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    df = spark.createDataFrame(
        _clustered_rows(), "vec_id long, embedding array<float>, label int"
    )
    return df.persist()


def _recall_vs_exact(spark, emb, n_iters: int, k: int = 10) -> float:
    exact = ann.cosine_topk(emb, query_mod=50, k=k).select("q_id", "vec_id")
    approx = ann.ivf_cosine_topk(
        emb, query_mod=50, k=k, n_probe=1, n_iters=n_iters
    ).select("q_id", "vec_id")
    hit = exact.join(approx, ["q_id", "vec_id"]).count()
    total = exact.count()
    return hit / total


def test_lloyd_beats_seed_recall(spark, clustered):
    seed_recall = _recall_vs_exact(spark, clustered, n_iters=0)
    lloyd_recall = _recall_vs_exact(spark, clustered, n_iters=2)
    assert lloyd_recall > seed_recall, (seed_recall, lloyd_recall)
    assert lloyd_recall >= 0.8, lloyd_recall


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multi-probe must recover neighbors that landed one
    sign-flip away — strictly more candidates, higher recall vs exact."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = ann.cosine_topk(emb, k=10).select("q_id", "vec_id")
    total = exact.count()

    def recall(df):
        return exact.join(df.select("q_id", "vec_id"), ["q_id", "vec_id"]).count() / total

    # 4 planes -> 16 buckets over 500 vectors: single-bucket probing
    # sees ~1/16 of the corpus; Hamming-1 probing sees ~5/16
    r1 = recall(ann.lsh_cosine_topk(emb, k=10, dim=64, n_planes=4))
    rm = recall(ann.lsh_cosine_topk(emb, k=10, dim=64, n_planes=4, multi_probe=1))
    assert rm > r1, (r1, rm)
    assert rm >= 0.4, rm


def test_lloyd_centroids_move_toward_cluster_means(spark, clustered):
    # after 2 iterations every true cluster should own >= 1 centroid
    # cell with most of its members assigned there
    asg = ann.ivf_assign(clustered, n_iters=2, n_probe=1).join(
        clustered.select("vec_id", "label"), "vec_id"
    )
    # purity: majority label share per populated cell
    per_cell = asg.groupBy("cell", "label").count()
    w_tot = asg.groupBy("cell").count().withColumnRenamed("count", "tot")
    purity = (
        per_cell.join(w_tot, "cell")
        .groupBy("cell")
        .agg((F.max("count") / F.first("tot")).alias("purity"))
    )
    min_purity = purity.agg(F.min("purity")).first()[0]
    assert min_purity >= 0.5, min_purity
