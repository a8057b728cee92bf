"""Training-data curation queries: sequence packing and train/test
contamination — the batch-assembly and decontamination steps of an
LLM data pipeline, declared with DuckDB oracle twins like every other
extension query (see plans/extensions.py for the conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table
from rds_to_datalake_project_spark.operators.packing import pack_sequences

# --- sequence packing --------------------------------------------------------

PACK_BUDGET = 1024
PACK_BUCKETS = 16


def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents table into 1024-token bins across 16 hash
    buckets; emits the full per-document assignment so the oracle
    checks every bin id and offset, not just summary counts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    packed = pack_sequences(
        docs, key_col="doc_id", token_col=toks, budget=PACK_BUDGET, n_buckets=PACK_BUCKETS
    )
    return packed.select(
        "doc_id", "pack_bucket", "bin_id", "bin_offset", "n_tok"
    ).orderBy("doc_id")


# DuckDB window SUM over BIGINT yields HUGEINT — cast the running
# total back to BIGINT before the div/mod arithmetic (driver
# canonicalization convention, VERDICT r1 "What's wrong" #1).
PACK_SQL = f"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
           md5(CAST(doc_id AS VARCHAR)) AS h,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
             % {PACK_BUCKETS} AS pack_bucket
    FROM documents
), w AS (
    SELECT doc_id, n_tok, pack_bucket,
           CAST(COALESCE(SUM(n_tok) OVER (
               PARTITION BY pack_bucket ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
    FROM t
)
SELECT doc_id, pack_bucket,
       pack_bucket * 4294967296 + (strt // {PACK_BUDGET}) AS bin_id,
       strt - (strt // {PACK_BUDGET}) * {PACK_BUDGET} AS bin_offset,
       n_tok
FROM w
ORDER BY doc_id
"""


# --- train/test contamination ------------------------------------------------

def contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle overlap of every held-out (md5-split) document against
    the train-side shingle vocabulary — the decontamination report an
    eval-set builder runs before training."""
    from rds_to_datalake_project_spark.operators.contamination import (
        contamination_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return contamination_report(
        docs, key_col="doc_id", text_col="text", shingle_n=3, test_permille=100
    ).orderBy("doc_id")


CONTAMINATION_SQL = """
WITH tagged AS (
    SELECT doc_id, text,
           CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 29, 4))
                     AS BIGINT) % 1000 < 100
                THEN 'test' ELSE 'train' END AS split
    FROM documents
), toks AS (
    SELECT doc_id, split,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
    FROM tagged
), sh AS (
    SELECT doc_id, split,
           list_distinct(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingles
    FROM toks
), ex AS (
    SELECT doc_id, split,
           CAST(('0x' || substring(md5(s.sh), 1, 15)) AS BIGINT) AS k
    FROM sh, unnest(shingles) AS s(sh)
), train_vocab AS (
    SELECT DISTINCT k FROM ex WHERE split = 'train'
)
SELECT e.doc_id,
       COUNT(*) AS n_sh,
       CAST(COALESCE(SUM(CASE WHEN tv.k IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(SUM(CASE WHEN tv.k IS NOT NULL THEN 1 END), 0) AS DOUBLE)
         / COUNT(*) AS contamination
FROM ex e LEFT JOIN train_vocab tv ON e.k = tv.k
WHERE e.split = 'test'
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


QUERIES = {
    "pack_documents": pack_documents,
    "contamination_docs": contamination_docs,
}

ORACLES = {
    "pack_documents": PACK_SQL,
    "contamination_docs": CONTAMINATION_SQL,
}
