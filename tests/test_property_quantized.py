"""Property-based identity for the QUANTIZED scoring path: random tiny
corpora through build_index -> search_quantized must match a numpy
oracle computing integer sum(q_w * d_w) over rint-quantized impacts —
the arithmetic PISA runs on the reference's exported index
(index2pisa.py:42-48 + inference_q_SPLADE.py:13,60).

Integer scores make this check EXACT (no float rounding tolerance):
any disagreement in quantization, decode, or accumulation is a hard
mismatch.
"""

from __future__ import annotations

import tempfile
from collections import Counter

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from splade_spark import DOC_SCALE, QUERY_SCALE
from splade_spark.operators.index_build import build_index
from splade_spark.operators.index_query import search_quantized
from splade_spark.oracle import OracleIndex, tokenize

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
doc_text = st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join)
corpus_st = st.dictionaries(
    st.integers(min_value=0, max_value=60), doc_text, min_size=3, max_size=12
)
query_st = st.lists(st.sampled_from(WORDS + ["zz"]), min_size=1, max_size=4).map(
    " ".join
)

K = 5


def quantized_oracle(oracle: OracleIndex, text: str, k: int):
    """[(doc_id, int_score)] by (-score, doc_id), scores > 0."""
    acc: Counter = Counter()
    for term, q_tf in Counter(tokenize(text)).items():
        q_w = min(q_tf * QUERY_SCALE, 255)
        if term in oracle.postings:
            pos, ws = oracle.postings[term]
            d_w = np.clip(np.rint(ws * DOC_SCALE), 0, 255).astype(np.int64)
            for p, w in zip(pos, d_w):
                acc[oracle.doc_ids[p]] += q_w * int(w)
    ranked = sorted(
        ((d, s) for d, s in acc.items() if s > 0), key=lambda p: (-p[1], p[0])
    )
    return ranked[:k]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st, qtexts=st.lists(query_st, min_size=1, max_size=2))
def test_quantized_search_matches_integer_oracle(spark, corpus, qtexts):
    docs = spark.createDataFrame(sorted(corpus.items()), "doc_id long, text string")
    oracle = OracleIndex(corpus)
    index_dir = tempfile.mkdtemp(prefix="propq_idx_")
    build_index(docs, index_dir, n_segments=2, n_buckets=4, block_size=4, salt_unit=8)

    qrows = [(100 + i, t) for i, t in enumerate(qtexts)]
    qdf = spark.createDataFrame(qrows, "qid long, text string")
    run = search_quantized(spark, index_dir, qdf, k=K).collect()

    got: dict[int, list[tuple[int, int]]] = {qid: [] for qid, _ in qrows}
    for r in sorted(run, key=lambda r: (r.qid, r.rank)):
        got[int(r.qid)].append((int(r.doc_id), int(r.score)))
    for qid, text in qrows:
        assert got[qid] == quantized_oracle(oracle, text, K), (qid, text)
