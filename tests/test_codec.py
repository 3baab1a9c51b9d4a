from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_spark.functions.codec import (
    decode_block,
    decode_tfs,
    encode_posting_blocks,
    quantize,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(vbyte_decode(vbyte_encode(arr), len(arr))) == values


def test_vbyte_known_bytes():
    # 0 -> 0x00; 127 -> 0x7F; 128 -> 0x80 0x01; 300 -> 0xAC 0x02
    assert vbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert vbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_posting_block_roundtrip(postings):
    doc_ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    ws = np.array([p[2] for p in postings], dtype=np.float64)
    order = np.argsort(doc_ids)
    blocks = list(encode_posting_blocks(doc_ids, tfs, ws, block_size=128))
    got_ids, got_ws, got_tfs = [], [], []
    for b in blocks:
        d, w = decode_block(
            b["first_doc_id"], b["n"], b["doc_gap_bytes"], b["impact_bytes"]
        )
        assert b["block_max"] == w.max()
        assert np.array_equal(
            np.frombuffer(b["quant_bytes"], dtype=np.uint8), quantize(w)
        )
        got_ids.append(d)
        got_ws.append(w)
        got_tfs.append(decode_tfs(b["tf_bytes"], b["n"]))
    got_ids = np.concatenate(got_ids)
    assert np.array_equal(got_ids, doc_ids[order])
    assert np.array_equal(np.concatenate(got_ws), ws[order])
    assert np.array_equal(np.concatenate(got_tfs), tfs[order])
    assert np.all(np.diff(got_ids) > 0)  # strictly ascending docids


def test_quantize_matches_reference_semantics():
    w = np.array([0.0, 0.004, 0.005, 1.0, 2.549, 2.551, 100.0])
    # np.clip(np.rint(w*100), 0, 255) — banker's rounding via rint
    expect = np.clip(np.rint(w * 100), 0, 255).astype(np.uint8)
    assert np.array_equal(quantize(w), expect)
