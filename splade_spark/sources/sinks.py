"""Run sinks — the reference's output formats.

- run.json ``{qid: {doc: score}}`` (task/evaluator.py:256-258)
- TREC 6-column ``qid Q0 doc rank score runid``
  (pisa_inference/denseEvaluation.py:81-90)
Both are derived from the run DataFrame with built-in functions and
written distributed (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_json_df(run: DataFrame) -> DataFrame:
    """(qid, run_json) — one JSON score-map per query.

    Entries are formatted with %.6f (scores are already 6-dp rounded)
    and sorted lexicographically, so the byte output is deterministic
    across engines (the DuckDB twin renders identically)."""
    entry = F.format_string('"%s":%.6f', F.col("doc_id").cast("string"), F.col("score"))
    return (
        run.groupBy("qid")
        .agg(F.sort_array(F.collect_list(entry)).alias("entries"))
        .select(
            "qid",
            F.concat(F.lit("{"), F.array_join("entries", ","), F.lit("}")).alias(
                "run_json"
            ),
        )
    )


def write_run_json(run: DataFrame, path: str) -> None:
    run_json_df(run).write.mode("overwrite").json(path)


def trec_lines_df(run: DataFrame, runid: str = "splade_spark") -> DataFrame:
    """(qid, rank, line) TREC-format lines; %.6f score so the byte
    output is deterministic across engines."""
    return run.select(
        "qid",
        "rank",
        F.format_string(
            "%d Q0 %s %d %.6f %s",
            F.col("qid"),
            F.col("doc_id").cast("string"),
            F.col("rank"),
            F.col("score"),
            F.lit(runid),
        ).alias("line"),
    )


def vector_export_df(
    documents: DataFrame,
    postings: DataFrame,
    scale: int = 100,
    rounding: str = "floor",
) -> DataFrame:
    """(doc_id, content, vector_json): the reference's quantized JSONL
    export row ``{"id", "content", "vector": {term: int}}``
    (pisa_inference/inference_SPLADE.py:70-72; quantize int(w*scale)
    clip [0,255], threshold > 0 per index2pisa.py:42-48). The
    reference has TWO quantization conventions and ``rounding``
    selects which sink is reproduced byte-for-byte:

    - ``"floor"`` (default): int() truncation — the PISA export
      (inference_SPLADE.py:70);
    - ``"rint"``: np.rint half-to-even — the BMP export
      (bmp_inference/inference_all_beir_doc_bmp.py:78), same
      convention as the in-index quant_bytes (codec.quantize).

    Entries are '"term":impact' strings sorted lexicographically so
    the JSON bytes are deterministic across engines."""
    base = F.col("impact") * scale
    rounded = F.floor(base) if rounding == "floor" else F.round(base)
    q = F.least(rounded, F.lit(255)).cast("int")
    entries = (
        postings.select("doc_id", "term", q.alias("iq"))
        .filter(F.col("iq") > 0)
        .select("doc_id", F.format_string('"%s":%d', "term", "iq").alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("e")).alias("es"))
        .select(
            "doc_id",
            F.concat(F.lit("{"), F.array_join("es", ","), F.lit("}")).alias(
                "vector_json"
            ),
        )
    )
    return documents.select("doc_id", F.col("text").alias("content")).join(
        entries, "doc_id"
    )


def write_vectors_jsonl_gz(vectors: DataFrame, path: str) -> None:
    """Gzip JSONL export (reference sink: one JSON object per doc,
    inference_SPLADE.py:43,71-72) — codec handled by the writer,
    distributed, no driver collect."""
    vectors.write.mode("overwrite").option("compression", "gzip").json(path)


def read_vectors_jsonl_gz(spark, path: str) -> DataFrame:
    """Re-scan of exported vector shards (reference analog:
    index2pisa.py:30-36 re-reads the gzip JSONL it wrote). Returns the
    exploded (doc_id, term, iq) posting view — vector_json parsed
    JVM-side with from_json, no Python."""
    raw = spark.read.schema(
        "doc_id long, content string, vector_json string"
    ).json(path)
    vec = F.from_json("vector_json", "map<string,int>")
    return (
        raw.select("doc_id", F.explode(vec).alias("term", "iq"))
        .select("doc_id", "term", "iq")
    )


def remap_run_urls(run: DataFrame, docs_dim: DataFrame) -> DataFrame:
    """(qid, url, score, rank): internal docid -> external id
    (reference analog: ``self.doc_ids[id_]`` remap,
    task/evaluator.py:242-243).

    The SMALL side of this join is the run (<= k rows per query); the
    docs dimension is O(corpus) and must never be broadcast. Hint the
    run side: Spark builds the hash table from the run and streams the
    dim scan — at 10^12 docs that is the only shape that survives."""
    return docs_dim.select("doc_id", "url").join(
        F.broadcast(run), "doc_id"
    ).select("qid", "url", "score", "rank")


def write_trec_run(run: DataFrame, path: str, runid: str = "splade_spark") -> None:
    trec_lines_df(run, runid).select("line").write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# PISA binary interchange sink
# ---------------------------------------------------------------------------


def _u32seq(values) -> bytes:
    """One PISA binary sequence: uint32-LE count, then the values
    (pisa_inference/index2pisa.py:7-15 binarySequence)."""
    import numpy as np

    arr = np.asarray(list(values), dtype=np.uint32)
    return len(arr).to_bytes(4, "little") + arr.astype("<u4").tobytes()


def write_pisa_index(
    documents: DataFrame,
    postings: DataFrame,
    out_prefix: str,
    scale: int = 100,
    threshold: int = 0,
) -> dict:
    """Export the quantized index in the reference's PISA interchange
    format (index2pisa.py:59-74): ``.docs`` = [N] then per-term docID
    sequences, ``.freqs`` = per-term quantized-impact sequences,
    ``.sizes`` = per-doc posting counts, ``.id`` = term -> term_id JSON
    map — the one artifact a migrating reference user would diff.

    Term order reproduces the reference's first-appearance enumeration
    over the exported JSONL (docs in doc_id order, vector keys
    lexicographic within a doc): sort by (first doc, term). Doc ids
    are densified to 0..N-1 scan positions via a sorted zipWithIndex
    (distributed — no single-partition window); only the final byte
    stream is driver-sequential, which the format itself forces (PISA
    consumes single files on one node).

    Returns {"n_docs", "n_terms", "n_postings"}.
    """
    import json as _json

    spark = documents.sparkSession
    dq = (
        postings.select(
            "doc_id",
            "term",
            F.least(F.floor(F.col("impact") * scale), F.lit(255)).cast("int").alias(
                "iq"
            ),
        )
        .filter(F.col("iq") > threshold)
    )
    docs_idx = (
        documents.select("doc_id")
        .orderBy("doc_id")
        .rdd.map(lambda r: r.doc_id)
        .zipWithIndex()
        .toDF(["doc_id", "idx"])
    )
    counts = dq.groupBy("doc_id").agg(F.count("*").alias("n"))
    sizes_rows = (
        docs_idx.join(counts, "doc_id", "left")
        .select("idx", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("idx")
    )
    tmin = dq.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    stream = (
        dq.join(F.broadcast(tmin), "term")
        .join(docs_idx, "doc_id")
        .select("first_doc", "term", "idx", "iq")
        .orderBy("first_doc", "term", "idx")
    )

    sizes = [r.n for r in sizes_rows.toLocalIterator()]
    n_docs = len(sizes)
    term_ids: dict[str, int] = {}
    n_postings = 0
    with open(out_prefix + ".docs", "wb") as fd, open(
        out_prefix + ".freqs", "wb"
    ) as ff:
        fd.write(_u32seq([n_docs]))
        cur_term, cur_ids, cur_ws = None, [], []

        def flush():
            nonlocal n_postings
            if cur_term is not None:
                term_ids[cur_term] = len(term_ids)
                fd.write(_u32seq(cur_ids))
                ff.write(_u32seq(cur_ws))
                n_postings += len(cur_ids)

        for r in stream.toLocalIterator():
            if r.term != cur_term:
                flush()
                cur_term, cur_ids, cur_ws = r.term, [], []
            cur_ids.append(r.idx)
            cur_ws.append(r.iq)
        flush()
    with open(out_prefix + ".sizes", "wb") as fs:
        fs.write(_u32seq(sizes))
    with open(out_prefix + ".id", "w") as fi:
        _json.dump(term_ids, fi)
    return {"n_docs": n_docs, "n_terms": len(term_ids), "n_postings": n_postings}


def read_pisa_index(prefix: str) -> dict:
    """Parse the PISA binary files back into
    {"n_docs", "sizes", "term_ids", "postings": {term: [(idx, w)...]}}
    — the round-trip check for write_pisa_index."""
    import json as _json

    import numpy as np

    def sequences(path: str):
        data = open(path, "rb").read()
        off = 0
        while off < len(data):
            n = int.from_bytes(data[off : off + 4], "little")
            off += 4
            yield np.frombuffer(data, dtype="<u4", count=n, offset=off).tolist()
            off += 4 * n

    docs_seqs = list(sequences(prefix + ".docs"))
    freq_seqs = list(sequences(prefix + ".freqs"))
    (sizes,) = list(sequences(prefix + ".sizes"))
    with open(prefix + ".id") as f:
        term_ids = _json.load(f)
    n_docs = docs_seqs[0][0]
    by_id = sorted(term_ids.items(), key=lambda kv: kv[1])
    postings = {
        term: list(zip(docs_seqs[1 + tid], freq_seqs[tid]))
        for term, tid in by_id
    }
    return {
        "n_docs": n_docs,
        "sizes": sizes,
        "term_ids": term_ids,
        "postings": postings,
    }
