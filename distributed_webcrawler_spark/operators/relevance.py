"""BM25 relevance search over the documents corpus — the standard lexical
ranking function (Robertson/Spärck Jones probabilistic relevance framework,
public literature) a training-data pipeline uses for corpus search, topic
filtering, and retrieval-based quality scoring.

    score(d, Q) = Σ_{t∈Q} idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        (always > 0)

Scale design (10^10-doc corpora):
- tokens are filtered to the query terms INSIDE the per-row array (a
  higher-order `filter` on the tokenized column) before exploding, so the
  explode+shuffle carries only query-term hits, not the whole corpus
  token stream.
- df/N/avgdl are tiny aggregates broadcast back via a 1-row cross join —
  the corpus is scanned once for stats, once for scoring.
- the final top-k is orderBy(...).limit(k): Spark plans that as
  TakeOrderedAndProject (per-partition heaps + driver merge), never a
  single-partition global sort.

Cross-engine float parity (the DuckDB oracle restates the formula):
idf is rounded to 9 decimals right after the ln on BOTH engines (JVM
Math.log and libm log can disagree in the last ulp), each term
contribution is rounded to 9, the final score to 6 — so summation-order
and libm differences cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def bm25_search(docs: DataFrame, query_terms: list[str], k1: float = 1.2,
                b: float = 0.75, top_n: int = 100, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Top ``top_n`` docs by BM25 score for ``query_terms`` (ties break to
    the smaller doc_id). Returns (doc_id, score)."""
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias("toks"))
    base = toks.select(
        "doc_id", F.size("toks").alias("doclen"),
        F.filter("toks", lambda t: t.isin(terms)).alias("hits"))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg("doclen").alias("avgdl"))
    tf = (base.select("doc_id", "doclen", F.explode("hits").alias("term"))
              .groupBy("doc_id", "doclen", "term").agg(F.count("*").alias("tf")))
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = (df_t.crossJoin(F.broadcast(stats))
               .select("term", "n_docs", "avgdl",
                       F.round(F.log(F.lit(1.0)
                                     + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                                     / (F.col("df") + F.lit(0.5))), 9).alias("idf")))
    contrib = (tf.join(idf, "term")
                 .select("doc_id",
                         F.round(F.col("idf") * (F.lit(k1 + 1.0) * F.col("tf"))
                                 / (F.col("tf")
                                    + F.lit(k1) * (F.lit(1.0 - b)
                                                   + F.lit(b) * F.col("doclen")
                                                   / F.col("avgdl"))),
                                 9).alias("c")))
    return (contrib.groupBy("doc_id").agg(F.round(F.sum("c"), 6).alias("score"))
                   .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                   .limit(top_n))


def bm25_oracle_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75,
                    top_n: int = 100) -> str:
    """ANSI/DuckDB restatement with the identical constants (repr of the
    same Python doubles the Spark plan embeds) and identical rounding."""
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents
),
doclens AS (SELECT doc_id, len(toks) AS doclen FROM base),
stats AS (SELECT cast(count(*) as bigint) AS n_docs, avg(doclen) AS avgdl FROM doclens),
hits AS (
  SELECT b.doc_id, u.t AS term
  FROM base b, unnest(b.toks) AS u(t)
  WHERE u.t IN ({in_list})
),
tf AS (
  SELECT h.doc_id, d.doclen, h.term, count(*) AS tf
  FROM hits h JOIN doclens d ON d.doc_id = h.doc_id
  GROUP BY h.doc_id, d.doclen, h.term
),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term, round(ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)), 9) AS idf,
         s.avgdl
  FROM df_t, stats s
),
contrib AS (
  SELECT tf.doc_id,
         round(i.idf * ({k1 + 1.0!r} * tf.tf)
               / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.doclen / i.avgdl)),
               9) AS c
  FROM tf JOIN idf i ON i.term = tf.term
)
SELECT doc_id, round(sum(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {top_n}
"""
