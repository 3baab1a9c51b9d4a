"""DuckDB oracle SQL twins for every SQL-expressible operator.

Each string mirrors the Spark pipeline expression-for-expression
(same tokenizer regex, same BM25 formula text, same rounding and tie
rules) so the driver's row-count/schema/value-hash comparison is
exact. Shared fragments are built programmatically so constants
can't drift from the Spark side.
"""

from __future__ import annotations

from splade_spark.functions.bm25 import sql_impact
from splade_spark.synth import QID_STRIDE, QUERY_PREFIX_LEN, SQL_TOK

# Common CTE prologue: tokenization, doc lengths, corpus stats,
# per-(doc,term) tf, document frequencies, weighted postings,
# derived query terms.
BM25_CTES = f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOK} AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
dterms AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM dterms GROUP BY term),
post AS (
  SELECT d.term, d.doc_id,
         {sql_impact(tf="d.tf", dl="l.dl", df="f.df", n="s.n_docs", avgdl="s.avgdl")} AS impact
  FROM dterms d
  JOIN dl l USING (doc_id)
  JOIN dfs f USING (term)
  CROSS JOIN stats s
),
queries AS (
  SELECT doc_id AS qid, toks[1:{QUERY_PREFIX_LEN}] AS qtoks
  FROM tok WHERE doc_id % {QID_STRIDE} = 0
),
qterms AS (
  SELECT qid, term, CAST(count(*) AS DOUBLE) AS q_tf
  FROM (SELECT qid, unnest(qtoks) AS term FROM queries)
  GROUP BY qid, term
)
"""


def bm25_topk_sql(k: int) -> str:
    return (
        BM25_CTES
        + f""",
scored AS (
  SELECT q.qid, p.doc_id, round(sum(q.q_tf * p.impact), 6) AS score
  FROM post p JOIN qterms q USING (term)
  GROUP BY q.qid, p.doc_id
  HAVING round(sum(q.q_tf * p.impact), 6) > 0.0
),
ranked AS (
  SELECT qid, doc_id, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""
    )


CORPUS_STATS_SQL = (
    BM25_CTES
    + """
SELECT n_docs, round(avgdl, 6) AS avgdl,
       (SELECT count(*) FROM dfs) AS vocab_size,
       (SELECT count(*) FROM dterms) AS nnz
FROM stats
"""
)

TERM_DF_TOP_SQL = (
    BM25_CTES
    + """
SELECT term, df FROM dfs ORDER BY df DESC, term ASC LIMIT 100
"""
)

DOC_LENS_SQL = (
    BM25_CTES
    + """
SELECT doc_id, CAST(dl AS BIGINT) AS dl FROM dl
"""
)

POSTING_STATS_SQL = (
    BM25_CTES
    + """
SELECT f.term, f.df AS posting_len, round(max(p.impact), 6) AS max_impact,
       round(sum(p.impact), 6) AS sum_impact
FROM post p JOIN dfs f USING (term)
GROUP BY f.term, f.df
ORDER BY f.term
"""
)

QUERY_TERMS_SQL = (
    BM25_CTES
    + """
SELECT qid, term, CAST(q_tf AS BIGINT) AS q_tf FROM qterms ORDER BY qid, term
"""
)


def _run_ctes(k: int) -> str:
    return (
        BM25_CTES
        + f""",
scored AS (
  SELECT q.qid, p.doc_id, round(sum(q.q_tf * p.impact), 6) AS score
  FROM post p JOIN qterms q USING (term)
  GROUP BY q.qid, p.doc_id
  HAVING round(sum(q.q_tf * p.impact), 6) > 0.0
),
run AS (
  SELECT qid, doc_id, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored QUALIFY rank <= {k}
),
qrels AS (
  SELECT doc_id AS qid, doc_id, 1 AS rel FROM documents WHERE doc_id % {QID_STRIDE} = 0
),
n_rel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
hits AS (
  SELECT r.qid, min(r.rank) AS best_rank, count(*) AS n_hit
  FROM run r JOIN qrels q ON r.qid = q.qid AND r.doc_id = q.doc_id
  GROUP BY r.qid
),
pq AS (
  SELECT n.qid,
         coalesce(1.0 / h.best_rank, 0.0) AS rr,
         coalesce(h.n_hit, 0) * 1.0 / n.n_rel AS recall
  FROM n_rel n LEFT JOIN hits h USING (qid)
)
"""
    )


def mrr_sql(k: int) -> str:
    return _run_ctes(k) + f"SELECT 'mrr@{k}' AS metric, round(avg(rr), 6) AS value FROM pq"


def recall_sql(k: int) -> str:
    return (
        _run_ctes(k)
        + f"SELECT 'recall@{k}' AS metric, round(avg(recall), 6) AS value FROM pq"
    )


PER_QUERY_METRICS_SQL = (
    _run_ctes(10)
    + "SELECT qid, round(rr, 6) AS rr, round(recall, 6) AS recall FROM pq"
)
