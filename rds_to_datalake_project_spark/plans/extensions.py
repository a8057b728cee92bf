"""Extension query surface: training-data pipeline operators over the
``documents`` and ``embeddings`` tables (dedup, similarity search,
text analysis). These are first-class engine capabilities beyond the
reference inventory (build brief; SURVEY.md §7.2 step 7).

MinHash/SimHash entries use Spark's xxhash64 (no cross-engine twin) —
they are declared without oracle SQL and get rows-only checks; their
semantics are pinned by unit tests with planted near-duplicates
instead (tests/test_fuzzy_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.catalog import load_table
from rds_to_datalake_project_spark.operators.minhash import (
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
)
from rds_to_datalake_project_spark.operators.simhash import simhash_neardup_pairs
from rds_to_datalake_project_spark.operators.similarity import (
    cosine_topk,
    neardup_pairs_blocked,
)
from rds_to_datalake_project_spark.operators.text import (
    fingerprint,
    language_id,
    quality_metrics,
)


# --- exact dedup (hash-groupBy) ------------------------------------------------

def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(docs)
    return (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


EXACT_DEDUP_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY keep_id
"""


# --- document fingerprint -------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fp").orderBy("doc_id")


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
ORDER BY doc_id
"""


# --- text quality metrics --------------------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = quality_metrics(docs)
    return out.select(
        "doc_id", "q_chars", "q_tokens", "q_alpha", "q_digits", "q_punct",
        "q_alpha_ratio", "q_avg_token_len", "q_stopword_ratio",
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS q_chars,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS q_tokens,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INTEGER) AS q_alpha,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS q_digits,
       CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS INTEGER) AS q_punct,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS q_alpha_ratio,
       CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')) AS q_avg_token_len,
       CAST((CASE WHEN contains(concat(' ', lower(text), ' '), ' the ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' a ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' an ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' and ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' or ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' of ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' to ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' in ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' is ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' it ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' for ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' on ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' with ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' as ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' at ') THEN 1 ELSE 0 END
           + CASE WHEN contains(concat(' ', lower(text), ' '), ' by ') THEN 1 ELSE 0 END) AS DOUBLE) / 16
         AS q_stopword_ratio
FROM documents
ORDER BY doc_id
"""


# --- language identification ------------------------------------------------------

def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb repetition filters over documents
    (operators/text.py:repetition_metrics)."""
    from rds_to_datalake_project_spark.operators.text import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return (
        repetition_metrics(docs)
        .select(
            "doc_id",
            "q_dup_line_ratio",
            "q_distinct_token_ratio",
            "q_top_bigram_count",
            "q_n_bigrams",
            "q_top_bigram_ratio",
        )
        .orderBy("doc_id")
    )


# Ratios divide exact integer counts → IEEE-identical across engines.
# DuckDB lists are 1-indexed; toks[i]||' '||toks[i+1] mirrors Spark's
# slice(toks, i+1, 2) bigram.
REPETITION_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), b AS (
  SELECT doc_id, lines, toks,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1])
         ELSE [] END AS bg
  FROM t
)
SELECT doc_id,
       1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS q_dup_line_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS q_distinct_token_ratio,
       CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                d -> len(list_filter(bg, x -> x = d)))), 0) AS BIGINT) AS q_top_bigram_count,
       CAST(len(bg) AS BIGINT) AS q_n_bigrams,
       CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                d -> len(list_filter(bg, x -> x = d)))), 0) AS DOUBLE)
         / NULLIF(len(bg), 0) AS q_top_bigram_ratio
FROM b
ORDER BY doc_id
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction counts + scrubbed-text digest over documents with
    deterministic planted PII (email/phone/IP derived from doc_id), so
    the scrub path is exercised on every row regardless of corpus
    content (operators/text.py:scrub_pii)."""
    from rds_to_datalake_project_spark.operators.text import scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    out = scrub_pii(planted)
    return out.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5(F.col("text_scrubbed").cast("binary")).alias("scrub_md5"),
    ).orderBy("doc_id")


PII_SCRUB_SQL = """
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 555-000-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '\\+?\\d[\\d\\- ]{7,}\\d')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g')) AS scrub_md5
FROM planted
ORDER BY doc_id
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = language_id(docs)
    return out.select(
        "doc_id", "score_en", "score_de", "score_fr", "score_es", "pred_lang"
    ).orderBy("doc_id")


def _hits_sql(words: tuple[str, ...]) -> str:
    return " + ".join(
        f"(CASE WHEN contains(concat(' ', lower(text), ' '), ' {w} ') THEN 1 ELSE 0 END)"
        for w in words
    )


LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         {_hits_sql(("the", "and", "of", "to", "is"))} AS score_en,
         {_hits_sql(("der", "die", "und", "nicht", "ist"))} AS score_de,
         {_hits_sql(("le", "la", "et", "les", "est"))} AS score_fr,
         {_hits_sql(("el", "la", "que", "de", "es"))} AS score_es
  FROM documents
)
SELECT doc_id, score_en, score_de, score_fr, score_es,
       -- tie-break mirrors the engine's fold: first language in
       -- alphabetical array order (de, en, es, fr) reaching the max wins
       CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'unknown'
            WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
            WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
            WHEN score_es = greatest(score_en, score_de, score_fr, score_es) THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM scored
ORDER BY doc_id
"""


# --- token counting aggregate -------------------------------------------------------

def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks.cast("long")).alias("total_tokens"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


TOKEN_COUNT_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


# --- similarity search ----------------------------------------------------------------

def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_vec_id=0, k=10)


# Quantized-integer cosine (see operators/similarity.py): exact integer
# sums → the double division is bit-identical across engines.
_COS_SQL_FRAGMENT = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         CAST(list_sum(list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT) * q.qv[i])) AS DOUBLE)
         / sqrt(
             CAST(list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
                     * CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS DOUBLE)
           * CAST(list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * q.qv[i])) AS DOUBLE)
           ) AS cosine_sim
  FROM embeddings e, q
)
"""

ANN_TOPK_SQL = (
    _COS_SQL_FRAGMENT
    + """
SELECT vec_id, cosine_sim FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""
)


def neardup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_blocked(emb, block_col="label", threshold=0.25).orderBy(
        "a_id", "b_id"
    )


NEARDUP_COSINE_SQL = """
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       / sqrt(
           CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * a.qv[i])) AS DOUBLE)
         * CAST(list_sum(list_transform(range(1, len(b.qv) + 1), i -> b.qv[i] * b.qv[i])) AS DOUBLE)
         ) AS cosine_sim
FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      / sqrt(
          CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * a.qv[i])) AS DOUBLE)
        * CAST(list_sum(list_transform(range(1, len(b.qv) + 1), i -> b.qv[i] * b.qv[i])) AS DOUBLE)
        ) > 0.25
ORDER BY a_id, b_id
"""


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global duplicate groups: connected components (iterative
    min-label propagation + pointer jumping, operators/components.py)
    over the oracle-checked cosine near-dup pair graph."""
    from rds_to_datalake_project_spark.operators.components import (
        connected_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = neardup_pairs_blocked(emb, block_col="label", threshold=0.25)
    comp = connected_components(pairs.select("a_id", "b_id"))
    return comp.select(
        F.col("id").cast("long").alias("id"),
        F.col("comp").cast("long").alias("comp"),
    ).orderBy("id")


# Transitive closure via recursive CTE: comp = MIN over the reachable
# set — the same canonical label the Spark pointer-jumping loop
# converges to, so the two engines agree exactly.
NEARDUP_COMPONENTS_SQL = """
WITH RECURSIVE q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
        / sqrt(
            CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * a.qv[i])) AS DOUBLE)
          * CAST(list_sum(list_transform(range(1, len(b.qv) + 1), i -> b.qv[i] * b.qv[i])) AS DOUBLE)
          ) > 0.25
), sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM pairs
), reach(id, r) AS (
  SELECT src, src FROM sym GROUP BY src
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS comp
FROM reach
GROUP BY id
ORDER BY id
"""


# --- fuzzy dedup (rows-only driver checks; semantics pinned in unit tests) --------------

def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs).orderBy("a_id", "b_id")


def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, threshold=0.5).select("doc_id", "lang", "source").orderBy(
        "doc_id"
    )


def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard ≥ 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(docs)
    return ngram_jaccard_pairs(docs, cand, threshold=0.5).orderBy("a_id", "b_id")


def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Production defaults: hamming ≤ 3 with 4 bands of 16 bits —
    # 65k bucket values per band keeps collision sets tiny even on
    # highly self-similar corpora (h=8/9-band banding admitted ~11M
    # candidate pairs on 5k template-generated docs; h=3/4-band cuts
    # that by orders of magnitude with the same recall guarantee for
    # pairs within the threshold).
    return simhash_neardup_pairs(docs, max_hamming=3, bands=4).orderBy("a_id", "b_id")


# --- md5-mode fuzzy dedup (oracle-backed twins of the xxhash64 pipelines) -----
#
# Same operators, hash_mode="md5": every hash in the pipeline is the
# 60-bit md5-prefix integer DuckDB can replay bit-exactly, so LSH
# banding / signature / simhash logic itself gets hash-green driver
# rows (the xxhash64 defaults above remain the fast production path).

def minhash_lsh_candidates_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, hash_mode="md5").orderBy("a_id", "b_id")


def minhash_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        minhash_dedup(docs, threshold=0.5, hash_mode="md5")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def ngram_jaccard_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(docs, hash_mode="md5")
    return ngram_jaccard_pairs(docs, cand, threshold=0.5).orderBy("a_id", "b_id")


def simhash_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        simhash_neardup_pairs(docs, max_hamming=3, bands=4, hash_mode="md5")
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("a_id", "b_id")
    )


# Shared oracle prefix: shingle → 64-seed md5 minhash → 16 bands of 4
# rows → band-bucket self-join. Replays operators/minhash.py in
# hash_mode="md5" exactly: per-seed hash = md5int60("seed|shingle"),
# band string = comma-joined minhash values in seed order, bucket =
# md5int60(band string).
_MD5_LSH_CTE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ) AS shingles
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
    FROM documents
  )
), ex AS (
  SELECT doc_id, s.sh AS sh FROM sh, unnest(shingles) AS s(sh)
), mh AS (
  SELECT doc_id, r.seed AS seed,
         MIN(CAST(('0x' || substring(md5(CAST(r.seed AS VARCHAR) || '|' || ex.sh), 1, 15)) AS BIGINT)) AS h
  FROM ex, range(0, 64) AS r(seed)
  GROUP BY doc_id, r.seed
), bandstr AS (
  SELECT doc_id, seed // 4 AS band,
         string_agg(CAST(h AS VARCHAR), ',' ORDER BY seed) AS bs
  FROM mh GROUP BY doc_id, seed // 4
), buckets AS (
  SELECT doc_id, band, CAST(('0x' || substring(md5(bs), 1, 15)) AS BIGINT) AS bucket
  FROM bandstr
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
"""

MINHASH_LSH_MD5_SQL = _MD5_LSH_CTE + """
SELECT a_id, b_id FROM cand ORDER BY a_id, b_id
"""

MINHASH_NEARDUP_MD5_SQL = _MD5_LSH_CTE + """
, losers AS (
  SELECT DISTINCT c.b_id
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / len(list_distinct(sa.shingles || sb.shingles)) >= 0.5
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.b_id = d.doc_id)
ORDER BY doc_id
"""

def neardup_keep_best_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (operators/dedup.py:
    dedup_keep_best): verified near-dup clusters (md5 LSH candidates →
    exact Jaccard ≥ 0.5 → connected components) each keep their
    LONGEST member — the curation policy corpora want, vs. arbitrary
    winners. The oracle replays candidates, verify, the recursive
    closure, AND the argmax, so banding recall, component labels, and
    the keep policy are all hash-proved together."""
    from rds_to_datalake_project_spark.operators.dedup import dedup_keep_best

    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(docs, hash_mode="md5")
    pairs = ngram_jaccard_pairs(docs, cand, threshold=0.5).select("a_id", "b_id")
    out = dedup_keep_best(
        docs, pairs, "doc_id", F.length("text").cast("long")
    )
    return out.select(
        "doc_id", "score", "comp", "keeper_id", "kept"
    ).orderBy("doc_id")


NEARDUP_KEEP_BEST_MD5_SQL = _MD5_LSH_CTE.replace(
    "WITH sh AS", "WITH RECURSIVE sh AS"
) + """
, pairs AS (
  SELECT c.a_id, c.b_id FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / len(list_distinct(sa.shingles || sb.shingles)) >= 0.5
), sym AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM pairs
), reach(id, r) AS (
  SELECT src, src FROM sym GROUP BY src
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
), compx AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
), lab AS (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS score,
         COALESCE(c.comp, d.doc_id) AS comp
  FROM documents d LEFT JOIN compx c ON d.doc_id = c.id
), rk AS (
  SELECT comp, doc_id,
         ROW_NUMBER() OVER (PARTITION BY comp ORDER BY score DESC, doc_id) AS rn
  FROM lab
)
SELECT l.doc_id, l.score, l.comp, kk.doc_id AS keeper_id,
       l.doc_id = kk.doc_id AS kept
FROM lab l JOIN (SELECT comp, doc_id FROM rk WHERE rn = 1) kk
  ON l.comp = kk.comp
ORDER BY l.doc_id
"""


NGRAM_JACCARD_NEARDUP_MD5_SQL = _MD5_LSH_CTE + """
SELECT a_id, b_id, jaccard FROM (
  SELECT c.a_id, c.b_id,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / len(list_distinct(sa.shingles || sb.shingles)) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)
WHERE jaccard >= 0.5
ORDER BY a_id, b_id
"""

# SimHash md5 mode: 60-bit fingerprint (15 hex chars of md5 per
# token), majority vote per bit, 4 bands of 15 bits, Hamming ≤ 3.
SIMHASH_NEARDUP_MD5_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
  FROM documents
), ex AS (
  SELECT doc_id, len(tk) AS n,
         CAST(('0x' || substring(md5(t.tok), 1, 15)) AS BIGINT) AS h
  FROM toks, unnest(tk) AS t(tok)
), bits AS (
  SELECT doc_id, r.i AS i, SUM((h >> r.i) & 1) AS ones, MAX(n) AS n
  FROM ex, range(0, 60) AS r(i)
  GROUP BY doc_id, r.i
), fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN 2 * ones > n THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), buckets AS (
  SELECT doc_id, simhash, r.b AS band, (simhash >> (r.b * 15)) & 32767 AS bucket
  FROM fp, range(0, 4) AS r(b)
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY a_id, b_id
"""


# --- BPE-ish token budget (oracle-backed) -------------------------------------

def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budgets with the BPE-style pre-tokenizer
    (operators/text.n_bpe_tokens) next to the whitespace baseline —
    the corpus-sizing report an LLM data pipeline runs before
    training."""
    from rds_to_datalake_project_spark.operators.text import n_bpe_tokens, n_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(n_bpe_tokens(F.col("text"))).cast("long").alias("bpe_tokens"),
            F.sum(n_tokens(F.col("text"))).cast("long").alias("ws_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


BPE_TOKEN_SQL = r"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))) AS BIGINT)
         AS bpe_tokens,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""


def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 BPE merge candidates over the corpus
    (operators/text.bpe_merge_candidates) — the first vocabulary-
    induction step an LLM tokenizer trainer runs."""
    from rds_to_datalake_project_spark.operators.text import bpe_merge_candidates

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs, top_k=50)


_BPE_TABLE_MERGES = 10


def bpe_merge_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL iterative BPE trainer loop (operators/text.
    bpe_merge_table): apply the top merge, re-count, repeat — the
    ordered merge table a tokenizer replays. The oracle is the same
    loop unrolled into a DuckDB CTE chain, so every rank, pair, and
    count is hash-checked cross-engine."""
    from rds_to_datalake_project_spark.operators.text import bpe_merge_table

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_table(docs, n_merges=_BPE_TABLE_MERGES)


def _bpe_merge_table_sql(k: int) -> str:
    """The trainer loop unrolled to ``k`` merges as one DuckDB query —
    each iteration mirrors the Spark operator exactly: double-separator
    symbol encoding, pair counts weighted by word frequency, top-1 by
    (count DESC, lhs, rhs), merge applied by non-overlapping string
    replace (= greedy left-to-right application; see
    operators/text.BPE_SYM_SEP)."""
    # AS MATERIALIZED on every multiply-referenced CTE: s{i} feeds both
    # y{i+1} and s{i+1}, and b{i} is referenced four times by s{i} —
    # without the hint DuckDB inlines the chain exponentially (the
    # 10-deep chain re-opened the parquet file thousands of times).
    ss = "(chr(31) || chr(31))"
    parts = [
        r"""WITH w0 AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS tok
        FROM documents)
  WHERE len(tok) >= 2 AND NOT contains(tok, chr(31))
  GROUP BY tok
), s0 AS MATERIALIZED (
  SELECT """
        + ss
        + " || array_to_string(list_transform(range(1, len(tok)+1), i -> substr(tok, CAST(i AS INT), 1)), "
        + ss
        + ") || "
        + ss
        + """ AS seq, n
  FROM w0
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", y{i} AS (
  SELECT list_filter(string_split(seq, chr(31) || chr(31)), x -> x <> '') AS syms, n
  FROM s{i - 1}
), p{i} AS (
  SELECT struct_extract(pr, 'a') AS a, struct_extract(pr, 'b') AS b,
         CAST(SUM(n) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)), j ->
             struct_pack(a := syms[CAST(j AS INT)], b := syms[CAST(j AS INT) + 1]))) AS pr, n
    FROM y{i} WHERE len(syms) >= 2
  )
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT {i} AS merge_rank, a AS lhs, b AS rhs, cnt AS pair_count
  FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
), s{i} AS MATERIALIZED (
  SELECT replace(seq,
                 chr(31) || (SELECT lhs FROM b{i}) || chr(31) || chr(31) || (SELECT rhs FROM b{i}) || chr(31),
                 chr(31) || (SELECT lhs FROM b{i}) || (SELECT rhs FROM b{i}) || chr(31)) AS seq, n
  FROM s{i - 1}
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM b{i}" for i in range(1, k + 1))
    parts.append(f"\nSELECT * FROM (\n{union}\n) ORDER BY merge_rank")
    return "".join(parts)


BPE_MERGE_TABLE_SQL = _bpe_merge_table_sql(_BPE_TABLE_MERGES)


def bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: train the merge table
    (operators/text.bpe_merge_table), then encode every document with
    it (operators/text.bpe_encode) — per-doc pre-token, BPE-token and
    char counts, the token-budget profile of the corpus. The oracle
    replays training AND encoding (same unrolled CTE chain as
    bpe_merge_table plus a nested-replace encode), so every count is
    hash-checked cross-engine."""
    from rds_to_datalake_project_spark.operators.text import (
        bpe_encode,
        bpe_merge_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    mt = bpe_merge_table(docs, n_merges=_BPE_TABLE_MERGES)
    merges = [
        (r["lhs"], r["rhs"]) for r in mt.orderBy("merge_rank").collect()
    ]
    return bpe_encode(docs, merges).orderBy("doc_id")


def _bpe_encode_sql(k: int) -> str:
    """Training chain (shared shape with _bpe_merge_table_sql) + a
    per-document encode: each pre-token's symbol sequence replays the
    k merges as nested non-overlapping replaces, then symbols are
    counted and summed per doc."""
    ss = "(chr(31) || chr(31))"
    head = _bpe_merge_table_sql(k)
    # keep only the WITH-chain (drop the final SELECT of the trainer)
    chain = head[: head.rindex("\nSELECT * FROM (")]
    enc = (
        ss
        + " || array_to_string(list_transform(range(1, len(tok)+1), i -> substr(tok, CAST(i AS INT), 1)), "
        + ss
        + ") || "
        + ss
    )
    for i in range(1, k + 1):
        lhs, rhs = f"(SELECT lhs FROM b{i})", f"(SELECT rhs FROM b{i})"
        enc = (
            f"replace({enc}, chr(31) || {lhs} || chr(31) || chr(31) || {rhs} || chr(31),"
            f" chr(31) || {lhs} || {rhs} || chr(31))"
        )
    return (
        chain
        + f""", dt AS (
  SELECT doc_id,
         unnest(regexp_extract_all(coalesce(text, ''), ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS tok
  FROM documents
), enc AS (
  SELECT doc_id, len(tok) AS n_chars,
         len(list_filter(string_split({enc}, chr(31) || chr(31)), x -> x <> '')) AS n_syms
  FROM dt
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
         CAST(SUM(n_syms) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM enc GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_pretokens, 0) AS n_pretokens,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_chars, 0) AS n_chars
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""
    )


BPE_ENCODE_SQL = _bpe_encode_sql(_BPE_TABLE_MERGES)


BPE_MERGE_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS tok
  FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, len(tok)),
                i -> substr(tok, CAST(i AS INT), 2))) AS pair
  FROM toks WHERE len(tok) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 50
"""


def curate_documents_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (operators/curate.py) as one
    decision log: language → length → alpha → repetition gates map-
    side, survivor-only exact dedup in one fingerprint window. Every
    doc_id%50==0 document is planted twice so the duplicate gate fires
    on a known set; the oracle replays all six gates in order."""
    from rds_to_datalake_project_spark.operators.curate import curate_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = docs.unionByName(planted)
    return curate_documents(
        corpus,
        min_alpha_ratio=0.72,
        max_dup_line_ratio=0.2,
        max_top_bigram_ratio=0.05,
    ).orderBy("doc_id")


CURATE_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
), rep AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM corpus
), repb AS (
  SELECT doc_id, lines, toks,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1])
         ELSE [] END AS bg
  FROM rep
), repm AS (
  SELECT doc_id,
         1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS q_dup_line_ratio,
         CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                  d -> len(list_filter(bg, x -> x = d)))), 0) AS DOUBLE)
           / NULLIF(len(bg), 0) AS q_top_bigram_ratio
  FROM repb
), scored AS (
  SELECT c.doc_id,
         CASE WHEN greatest({_hits_sql(("the", "and", "of", "to", "is"))},
                            {_hits_sql(("der", "die", "und", "nicht", "ist"))},
                            {_hits_sql(("le", "la", "et", "les", "est"))},
                            {_hits_sql(("el", "la", "que", "de", "es"))}) = 0 THEN 'unknown'
              WHEN {_hits_sql(("der", "die", "und", "nicht", "ist"))} =
                   greatest({_hits_sql(("the", "and", "of", "to", "is"))},
                            {_hits_sql(("der", "die", "und", "nicht", "ist"))},
                            {_hits_sql(("le", "la", "et", "les", "est"))},
                            {_hits_sql(("el", "la", "que", "de", "es"))}) THEN 'de'
              WHEN {_hits_sql(("the", "and", "of", "to", "is"))} =
                   greatest({_hits_sql(("the", "and", "of", "to", "is"))},
                            {_hits_sql(("der", "die", "und", "nicht", "ist"))},
                            {_hits_sql(("le", "la", "et", "les", "est"))},
                            {_hits_sql(("el", "la", "que", "de", "es"))}) THEN 'en'
              WHEN {_hits_sql(("el", "la", "que", "de", "es"))} =
                   greatest({_hits_sql(("the", "and", "of", "to", "is"))},
                            {_hits_sql(("der", "die", "und", "nicht", "ist"))},
                            {_hits_sql(("le", "la", "et", "les", "est"))},
                            {_hits_sql(("el", "la", "que", "de", "es"))}) THEN 'es'
              ELSE 'fr' END AS pred_lang,
         length(text) AS q_chars,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / length(text) AS q_alpha_ratio,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         r.q_dup_line_ratio, r.q_top_bigram_ratio
  FROM corpus c JOIN repm r USING (doc_id)
), gated AS (
  SELECT doc_id, fp,
         CASE WHEN pred_lang <> 'en' THEN 'lang'
              WHEN q_chars < 150 THEN 'too_short'
              WHEN q_chars > 100000 THEN 'too_long'
              WHEN q_alpha_ratio < 0.72 THEN 'alpha_ratio'
              WHEN q_dup_line_ratio > 0.2 OR q_top_bigram_ratio > 0.05
                   THEN 'repetition' END AS gate
  FROM scored
), dedup AS (
  SELECT doc_id, gate,
         MIN(CASE WHEN gate IS NULL THEN doc_id END)
           OVER (PARTITION BY fp) AS keeper
  FROM gated
)
SELECT doc_id, (drop_reason IS NULL) AS keep, drop_reason
FROM (
  SELECT doc_id,
         CASE WHEN gate IS NOT NULL THEN gate
              WHEN doc_id <> keeper THEN 'duplicate' END AS drop_reason
  FROM dedup
)
ORDER BY doc_id
"""


# --- SRP cosine-LSH over embeddings (oracle-backed) ---------------------------

def srp_neardup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup candidates via signed-random-projection LSH
    (operators/srp.py): no blocking column, no trained centroids —
    the md5-derived ±1 projections and integer dot products make the
    whole pipeline (fingerprint, banding, Hamming) bit-identical in
    DuckDB.

    Band width is the recall/cost dial: this synthetic corpus has no
    true near-duplicates (closest pair is 9/60 bits apart), so the
    query widens to 15 bands / h ≤ 14 to exercise a non-empty
    guarantee set; production corpora with real duplicates use the
    operator defaults (6 bands of 10 bits, h ≤ 5 — tiny buckets)."""
    from rds_to_datalake_project_spark.operators.srp import srp_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return srp_neardup_pairs(
        emb, max_hamming=14, n_bits=60, bands=15, dim=64
    ).orderBy("a_id", "b_id")


def _srp_oracle_sql(n_bits: int = 60, bands: int = 15, dim: int = 64,
                    max_hamming: int = 14) -> str:
    """Oracle generated from the SAME ±1 matrix the Spark plan embeds
    (srp_weights is plain deterministic Python)."""
    from rds_to_datalake_project_spark.operators.srp import srp_weights

    wlit = "[" + ", ".join(
        "[" + ", ".join(str(w) for w in row) + "]"
        for row in srp_weights(n_bits, dim)
    ) + "]"
    bits = n_bits // bands
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
), fp AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(0, {n_bits}), i ->
           CASE WHEN CAST(list_sum(list_transform(range(1, {dim} + 1),
                        j -> w.W[i + 1][j] * qv[j])) AS BIGINT) > 0
                THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS srp
  FROM q, (SELECT {wlit} AS W) AS w
), buckets AS (
  SELECT vec_id, srp, r.b AS band,
         (srp >> (r.b * {bits})) & {(1 << bits) - 1} AS bucket
  FROM fp, range(0, {bands}) AS r(b)
)
SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST(bit_count(xor(a.srp, b.srp)) AS BIGINT) AS hamming
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE bit_count(xor(a.srp, b.srp)) <= {max_hamming}
ORDER BY a_id, b_id
"""


SRP_NEARDUP_SQL = _srp_oracle_sql()


# --- multimodal: REAL decode kernels + feature plumbing -----------------------

def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media decode end-to-end: synthesize genuine BMP / WAV /
    PPM files from ``documents`` keys (operators/multimodal.py
    encoders — actual headers, strides, chunk lists), then parse them
    back with the dependency-free decode kernels inside Arrow-batched
    ``mapInPandas`` and emit integer stats (geometry + pixel/sample
    sums). The payloads are deterministic in ``doc_id``, so the
    oracle states every decoded stat in closed form — hash equality
    proves the encode → parse → reduce round trip through real file
    bytes."""
    from rds_to_datalake_project_spark.operators.multimodal import (
        decode_media_stats,
        synthesize_real_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_real_media(docs, "doc_id")
    return decode_media_stats(media).orderBy("media_id")


# Closed forms (synthesize_real_media contract): images W=id%17+1,
# H=id%13+1, all channels of image row y equal (id%240)+y →
# pixel_sum = 3·W·(H·base + H(H−1)/2); audio n=id%50+1 samples of
# id%100+3i at 8 kHz → sample_sum = n·base + 3·n(n−1)/2.
MEDIA_DECODE_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/bmp'
                       WHEN 1 THEN 'audio/wav'
                       ELSE 'image/ppm' END AS mime,
       CASE WHEN doc_id % 3 <> 1
            THEN CAST(doc_id % 17 + 1 AS BIGINT) END AS width,
       CASE WHEN doc_id % 3 <> 1
            THEN CAST(doc_id % 13 + 1 AS BIGINT) END AS height,
       CASE WHEN doc_id % 3 <> 1
            THEN CAST(3 * (doc_id % 17 + 1)
                 * ((doc_id % 13 + 1) * (doc_id % 240)
                    + ((doc_id % 13 + 1) * (doc_id % 13)) // 2)
                 AS BIGINT) END AS pixel_sum,
       CASE WHEN doc_id % 3 = 1
            THEN CAST(doc_id % 50 + 1 AS BIGINT) END AS n_samples,
       CASE WHEN doc_id % 3 = 1
            THEN CAST(8000 AS BIGINT) END AS sample_rate,
       CASE WHEN doc_id % 3 = 1
            THEN CAST((doc_id % 50 + 1) * (doc_id % 100)
                 + (3 * (doc_id % 50 + 1) * (doc_id % 50)) // 2
                 AS BIGINT) END AS sample_sum
FROM documents
ORDER BY media_id
"""

def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brief's resize kernel end-to-end: synthesize real BMP/PPM
    files, nearest-neighbor resize to 8×5 inside mapInPandas
    (operators/multimodal.py resize_images), re-encode, and emit the
    resized geometry + pixel sum. NN sampling of the closed-form
    payload keeps the resized sum oracle-statable."""
    from rds_to_datalake_project_spark.operators.multimodal import (
        resize_images,
        synthesize_real_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_real_media(docs, "doc_id")
    return resize_images(media, 8, 5).drop("content").orderBy("media_id")


# Resized closed form: source row of output row y' is (y'·H)//5, and
# every channel of source row y is (id%240)+y → resized pixel_sum =
# 3·8·(5·base + Σ_{y'<5} (y'·H)//5).
MEDIA_RESIZE_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/bmp' ELSE 'image/ppm' END AS mime,
       CAST(8 AS BIGINT) AS width,
       CAST(5 AS BIGINT) AS height,
       CAST(3 * 8 * (5 * (doc_id % 240)
            + list_sum(list_transform(range(0, 5),
                       y -> (y * (doc_id % 13 + 1)) // 5))) AS BIGINT)
         AS pixel_sum
FROM documents
WHERE doc_id % 3 <> 1
ORDER BY media_id
"""


def image_ahash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: real encode → decode → perceptual
    average-hash (operators/multimodal.py:image_ahash) → banded
    Hamming join (operators/simhash.py:hash_neardup_pairs). The
    fixture's closed-form gradient images make the hash statable:
    every column is equal and the threshold is shift-invariant, so the
    64-bit hash reduces to an 8-row pattern that depends ONLY on the
    image height — the oracle joins ids on pattern equality (any
    differing pattern is ≥8 bits apart, past max_hamming=3, so
    qualifying pairs are exactly the hamming-0 ones)."""
    from rds_to_datalake_project_spark.operators.multimodal import (
        image_ahash,
        synthesize_real_media,
    )
    from rds_to_datalake_project_spark.operators.simhash import (
        hash_neardup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200  # bound the quadratic same-pattern pair count
    )
    media = synthesize_real_media(docs, "doc_id")
    pairs = hash_neardup_pairs(
        image_ahash(media), "media_id", "ahash", max_hamming=3, bands=4
    )
    return pairs.orderBy("a_id", "b_id")


IMAGE_AHASH_SQL = """
WITH img AS (
  SELECT doc_id AS media_id, (doc_id % 13) + 1 AS h
  FROM documents WHERE doc_id % 3 <> 1 AND doc_id < 200
), pat AS (
  SELECT media_id,
         list_transform(range(0, 8), r ->
           CASE WHEN 8 * ((r * h) // 8)
                     > list_sum(list_transform(range(0, 8), q -> (q * h) // 8))
                THEN 1 ELSE 0 END) AS p
  FROM img
)
SELECT a.media_id AS a_id, b.media_id AS b_id, CAST(0 AS INTEGER) AS hamming
FROM pat a JOIN pat b ON a.p = b.p AND a.media_id < b.media_id
ORDER BY a_id, b_id
"""


def audio_hash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio duplicate pairs: real WAV encode → decode → sign-of-delta
    fingerprint (operators/multimodal.py:audio_sign_hash) → banded
    Hamming join at hamming 0 (exact fingerprint match). The fixture's
    strictly-rising clips make the hash closed-form: bit i is set iff
    probe i+? stays inside the clip — a pure function of the sample
    count — so the oracle joins ids on pattern equality, reproducing
    the byte-level pipeline analytically (same proof shape as
    image_ahash_neardups)."""
    from rds_to_datalake_project_spark.operators.multimodal import (
        audio_sign_hash,
        synthesize_real_media,
    )
    from rds_to_datalake_project_spark.operators.simhash import (
        hash_neardup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200  # bound the same-length pair count
    )
    media = synthesize_real_media(docs, "doc_id")
    pairs = hash_neardup_pairs(
        audio_sign_hash(media), "media_id", "audio_hash",
        max_hamming=0, bands=4,
    )
    return pairs.orderBy("a_id", "b_id")


AUDIO_HASH_SQL = """
WITH aud AS (
  SELECT doc_id AS media_id, (doc_id % 50) + 1 AS n
  FROM documents WHERE doc_id % 3 = 1 AND doc_id < 200
), pat AS (
  SELECT media_id,
         list_transform(range(0, 64), i ->
           CASE WHEN (i * n) // 64 < n - 1 THEN 1 ELSE 0 END) AS p
  FROM aud
)
SELECT a.media_id AS a_id, b.media_id AS b_id, CAST(0 AS INTEGER) AS hamming
FROM pat a JOIN pat b ON a.p = b.p AND a.media_id < b.media_id
ORDER BY a_id, b_id
"""


def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → fixed-dim features via mapInPandas
    (operators/multimodal.py). The featurizer is the dependency-free
    byte-histogram kernel; schema/batching/pruning are the real
    engine path.

    The declared projection posexplodes the vector and recovers the
    stub's integer byte-histogram accumulator ``acc_j = feature_j *
    255 * n_bytes`` (exact: acc ≤ 255·len(text) ≪ 2^24, so the
    float32 round-trip is within 0.02 of the integer) — giving the
    harness a hashable, integer-exact row shape instead of an
    array<float> column."""
    from rds_to_datalake_project_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    feats = extract_features(media, dim=8)
    meta = media.select("media_id", "n_bytes")
    return (
        feats.select(
            "media_id",
            "mime",
            "feat_dim",
            F.posexplode("features").alias("j", "feature"),
        )
        .join(F.broadcast(meta), "media_id")
        .select(
            "media_id",
            "mime",
            "feat_dim",
            "j",
            F.round(F.col("feature").cast("double") * 255.0 * F.col("n_bytes"))
            .cast("bigint")
            .alias("acc"),
        )
        .orderBy("media_id", "j")
    )


# The stub feature is acc_j/(255·n) where acc_j sums bytes at positions
# ≡ j (mod 8); documents.text is pure ASCII (verified), so DuckDB char
# positions equal byte positions and the accumulator is reproducible
# with string ops alone.
MEDIA_FEATURES_SQL = """
SELECT d.doc_id AS media_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'image/png'
                         WHEN 1 THEN 'audio/wav'
                         ELSE 'video/mp4' END AS mime,
       8 AS feat_dim,
       CAST(u.j AS INTEGER) AS j,
       CAST(COALESCE(list_sum(list_transform(
                generate_series(CAST(u.j AS INTEGER) + 1, length(d.text), 8),
                i -> ord(substr(d.text, CAST(i AS INTEGER), 1)))), 0) AS BIGINT) AS acc
FROM documents d, unnest(generate_series(0, 7)) AS u(j)
ORDER BY media_id, j
"""


def video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rds_to_datalake_project_spark.operators.multimodal import (
        frame_sample_plan,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    return frame_sample_plan(media, every_ms=60_000, max_frames=8).orderBy(
        "media_id", "frame_ts_ms"
    )


# frame timestamps are pure integer arithmetic over the synthesized
# metadata (duration_ms = doc_id % 600000) — fully SQL-expressible.
# `//` matches Spark's double-division + cast-to-int truncation.
VIDEO_FRAME_SQL = """
SELECT d.doc_id AS media_id,
       'video/mp4' AS mime,
       CAST(u.i * 60000 AS INTEGER) AS frame_ts_ms
FROM documents d,
     unnest(generate_series(
         0, least((d.doc_id % 600000) // 60000, 7))) AS u(i)
WHERE d.doc_id % 3 = 2
ORDER BY media_id, frame_ts_ms
"""


# --- IVF two-stage ANN (coarse quantize + probe) ------------------------------

def ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign cells against 4 fixed axis-aligned centroids,
    then exact cosine over the nearest cell only. Cell assignment uses
    exact quantized-integer distances, so the full two-stage probe is
    DuckDB-oracle-able (hash-checked as of round 2)."""
    from rds_to_datalake_project_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    def axis(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v
    cells = assign_ivf_cells(emb, centroids=[(i, axis(i)) for i in range(4)])
    return ivf_topk(cells, query_vec=axis(0), probe_cells=[0], k=10)


# Integer-exact twin of the two-stage probe: quantized axis centroids
# (e_i -> 1e6 at position i+1), argmin by (dist, cid) matching the
# fold's first-wins tie-break, cosine against quantized e_0.
IVF_PROBE_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
), cents AS (
  SELECT CAST(u.cid AS INTEGER) AS cid FROM unnest(generate_series(0, 3)) AS u(cid)
), dists AS (
  SELECT q.vec_id, c.cid,
         list_sum(list_transform(range(1, len(q.qv) + 1),
           i -> (q.qv[i] - CASE WHEN i = c.cid + 1 THEN 1000000 ELSE 0 END)
              * (q.qv[i] - CASE WHEN i = c.cid + 1 THEN 1000000 ELSE 0 END))) AS d
  FROM q, cents c
), assigned AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM dists
)
SELECT q.vec_id,
       CAST(q.qv[1] * 1000000 AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * q.qv[i])) AS DOUBLE)
                * CAST(1000000000000 AS DOUBLE)) AS cosine_sim
FROM q JOIN assigned a ON q.vec_id = a.vec_id AND a.rn = 1 AND a.cid = 0
ORDER BY cosine_sim DESC, q.vec_id
LIMIT 10
"""


def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-order key over (o_custkey, o_orderkey) — the clustering
    expression behind cluster_by_zorder (operators/zorder.py), emitted
    per row so the bit interleave is oracle-checked end-to-end."""
    from rds_to_datalake_project_spark.operators.zorder import morton_key

    orders = load_table(spark, sf_dir, "orders")
    span = F.lit(1 << 16)
    return (
        orders.select(
            "o_orderkey",
            morton_key(
                F.pmod(F.col("o_custkey").cast("long"), span),
                F.pmod(F.col("o_orderkey").cast("long"), span),
            ).alias("zkey"),
        )
        .orderBy("o_orderkey")
    )


ZORDER_SQL = """
SELECT o_orderkey,
       CAST(list_sum(list_transform(range(0, 16),
         i -> (CAST(((o_custkey % 65536) >> CAST(i AS INTEGER)) & 1 AS BIGINT) << (2 * CAST(i AS INTEGER)))
            + (CAST(((o_orderkey % 65536) >> CAST(i AS INTEGER)) & 1 AS BIGINT) << (2 * CAST(i AS INTEGER) + 1)))) AS BIGINT) AS zkey
FROM orders
ORDER BY o_orderkey
"""


def hilbert_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve key over (o_custkey, o_orderkey) — the clustering
    expression behind cluster_by_hilbert (operators/hilbert.py): the
    sequential xy2d walk folded into one Catalyst `aggregate` with
    packed (x, y, d) state, emitted per row so every reflection/swap
    level is oracle-checked end-to-end (DuckDB replays the identical
    fold via list_reduce)."""
    from rds_to_datalake_project_spark.operators.hilbert import hilbert_key

    orders = load_table(spark, sf_dir, "orders")
    span = F.lit(1 << 15)
    return orders.select(
        "o_orderkey",
        hilbert_key(
            F.pmod(F.col("o_custkey").cast("long"), span),
            F.pmod(F.col("o_orderkey").cast("long"), span),
        ).alias("hkey"),
    ).orderBy("o_orderkey")


HILBERT_SQL = """
SELECT o_orderkey,
       list_reduce(
         list_prepend(CAST((o_custkey % 32768) + ((o_orderkey % 32768) << 15) AS BIGINT),
                      generate_series(14, 0, -1)),
         (acc, i) ->
           (CASE WHEN (((acc >> 15) & 32767) >> CAST(i AS INTEGER)) & 1 = 1 THEN acc & 32767
                 WHEN ((acc & 32767) >> CAST(i AS INTEGER)) & 1 = 1 THEN 32767 - ((acc >> 15) & 32767)
                 ELSE (acc >> 15) & 32767 END)
         + ((CASE WHEN (((acc >> 15) & 32767) >> CAST(i AS INTEGER)) & 1 = 1 THEN (acc >> 15) & 32767
                  WHEN ((acc & 32767) >> CAST(i AS INTEGER)) & 1 = 1 THEN 32767 - (acc & 32767)
                  ELSE acc & 32767 END) << 15)
         + (((acc >> 30)
             + (xor(3 * (((acc & 32767) >> CAST(i AS INTEGER)) & 1),
                    (((acc >> 15) & 32767) >> CAST(i AS INTEGER)) & 1) << CAST(2*i AS INTEGER))) << 30)
       ) >> 30 AS hkey
FROM orders
ORDER BY o_orderkey
"""


# --- F2/F3/F4: timestamp codec round trip -------------------------------------

def commit_key_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC commit-key + ISO-8601 codecs over the events stream."""
    from rds_to_datalake_project_spark.functions import (
        commit_key_expr,
        iso_utc,
        parse_iso,
    )

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        commit_key_expr(F.col("ts")).alias("commit_key"),
        iso_utc(F.col("ts")).alias("iso"),
        F.unix_micros(parse_iso(iso_utc(F.col("ts")))).alias("roundtrip_us"),
    ).orderBy("event_id")


COMMIT_KEY_SQL = """
SELECT event_id,
       strftime(ts, '%Y/%m/%d/%H/%Y%m%d-%H%M%S') || substring(strftime(ts, '%f'), 1, 3)
         AS commit_key,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f+00:00') AS iso,
       epoch_us(ts) AS roundtrip_us
FROM events
ORDER BY event_id
"""


# --- table profiling (data-quality pass; oracle-checked exact mode) -----------

def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rds_to_datalake_project_spark.operators.profile import profile_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return profile_table(o, exact_distinct=True).orderBy("column")


PROFILE_SQL = """
WITH stats AS (
  SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
         COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
         COUNT(DISTINCT o_orderkey) AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*),
         COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
         COUNT(DISTINCT o_custkey),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*),
         COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
         COUNT(DISTINCT o_orderstatus),
         MIN(o_orderstatus), MAX(o_orderstatus)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', COUNT(*),
         COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
         COUNT(DISTINCT o_totalprice),
         CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
  FROM orders
)
SELECT * FROM stats ORDER BY "column"
"""


# --- rolling-hash fingerprint (exact integer arithmetic, cross-engine) --------

def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rds_to_datalake_project_spark.operators.text import rolling_hash

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("rfp")).orderBy("doc_id")


ROLLING_FP_SQL = """
SELECT doc_id,
       CASE WHEN length(norm) = 0 THEN 0
            ELSE list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split_regex(norm, ''), c -> CAST(unicode(c) AS BIGINT))),
                   (acc, c) -> (acc * 131 + c) % 2147483647)
       END AS rfp
FROM (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
)
ORDER BY doc_id
"""


# --- exact n-gram Jaccard, all pairs over a sample (oracle-checked) -----------

def jaccard_allpairs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine verification of the Jaccard arithmetic itself:
    all pairs among doc_id < 60, exact 3-gram set Jaccard. (The LSH
    path reuses this exact kernel on candidate pairs only.)"""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return (
        ngram_jaccard_pairs(docs, pairs=None, threshold=0.0)
        .orderBy("a_id", "b_id")
    )


JACCARD_ALLPAIRS_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ) AS shingles
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
    FROM documents WHERE doc_id < 60
  )
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         / len(list_distinct(a.shingles || b.shingles)) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY a_id, b_id
"""


# --- deterministic sampling (reproducible curation; oracle-checked) -----------

def sample_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rds_to_datalake_project_spark.operators.sampling import (
        deterministic_sample_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_sample_per_group(docs, "source", "doc_id", quota=20)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


SAMPLE_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
WHERE rk <= 20
ORDER BY doc_id
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample: 25 docs per source drawn with
    probability ∝ n_chars (Efraimidis–Spirakis order with the
    deterministic md5 uniform) — the importance-sampling step of a
    mixture recipe, reproducible across engines."""
    from rds_to_datalake_project_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample_per_group(docs, "source", "doc_id", "n_chars", quota=25)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY -ln((CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
                        / 1152921504606846976.0) / CAST(n_chars AS DOUBLE),
                    doc_id) AS rk
  FROM documents
  WHERE CAST(n_chars AS DOUBLE) > 0
)
WHERE rk <= 25
ORDER BY doc_id
"""


def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rds_to_datalake_project_spark.operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id", test_permille=100)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("split")
    )


SPLIT_SQL = """
SELECT CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 29, 4)) AS BIGINT) % 1000 < 100
            THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents
GROUP BY 1
ORDER BY split
"""


# --- IVF training + probe (iterative algorithm; rows-only check) --------------

def ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ANN with TRAINED centroids: k-means over the corpus
    (deterministic init), assign cells, probe the query's nearest 2
    cells. Iterative — no SQL twin; pinned by unit tests instead."""
    from rds_to_datalake_project_spark.operators.ivf_train import train_ivf_centroids
    from rds_to_datalake_project_spark.operators.similarity import (
        assign_ivf_cells,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=4, iterations=3)
    cells = assign_ivf_cells(emb, centroids)
    query = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qv = [float(x) for x in query]
    # probe the 2 centroids nearest the query
    import math
    def dist(c):
        return math.fsum((a - b) ** 2 for a, b in zip(c, qv))
    probe = sorted(centroids, key=lambda cv: dist(cv[1]))[:2]
    return ivf_topk(cells, qv, [cid for cid, _ in probe], k=10)


def ngram_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production fast path of the containment detector, now on the
    full-recall prefix-filter index with the xxhash64 key family
    (operators/minhash.py containment_neardup). Because candidate
    recall is total regardless of which hash orders the prefix, the
    verified output equals brute-force all-pairs containment — so the
    formerly rows-only xxhash64 path now earns the SAME closed-form
    oracle as the md5 twin (hash ordering provably doesn't matter)."""
    from rds_to_datalake_project_spark.operators.minhash import containment_neardup

    docs = load_table(spark, sf_dir, "documents")
    return containment_neardup(
        docs, threshold=0.5, hash_mode="xxhash64"
    ).orderBy("a_id", "b_id")


def ngram_containment_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment verify over md5-mode LSH candidates
    (operators/minhash.py ngram_containment_pairs) — the near-subset
    detector Jaccard misses; the DuckDB twin replays candidates AND
    both containment directions exactly."""
    from rds_to_datalake_project_spark.operators.minhash import (
        lsh_candidate_pairs,
        ngram_containment_pairs,
        probe_partitions,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_parts = probe_partitions(docs)
    cand = lsh_candidate_pairs(docs, hash_mode="md5", input_partitions=n_parts)
    return ngram_containment_pairs(
        docs, cand, threshold=0.5, input_partitions=n_parts
    ).orderBy("a_id", "b_id")


NGRAM_CONTAINMENT_MD5_SQL = _MD5_LSH_CTE + """
SELECT a_id, b_id, containment_a_in_b, containment_b_in_a FROM (
  SELECT c.a_id, c.b_id,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / len(sa.shingles) AS containment_a_in_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / len(sb.shingles) AS containment_b_in_a
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
  WHERE len(sa.shingles) >= 1 AND len(sb.shingles) >= 1
)
WHERE greatest(containment_a_in_b, containment_b_in_a) >= 0.5
ORDER BY a_id, b_id
"""


def auto_salted_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-salted skew join, end-to-end (operators/skew.py
    salted_join(auto_salt=True)): o_orderpriority has ~5 values over
    the whole fact, so with a small per-salt budget every key is
    measured hot, derive_salt_factor picks a bounded factor, and the
    hot-only salting machinery (spread big side, replicated small
    side) must still reproduce EXACTLY the plain join the oracle
    states."""
    from rds_to_datalake_project_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dim = (
        orders.select(F.col("o_orderpriority").alias("pr_key"))
        .distinct()
        .withColumn("pr_label", F.concat(F.lit("P-"), F.col("pr_key")))
    )
    return (
        salted_join(
            orders,
            dim,
            on=[("o_orderpriority", "pr_key")],
            auto_salt=True,
            sample_fraction=1.0,  # deterministic measurement
            rows_per_salt=200,
        )
        .select("o_orderkey", "o_orderpriority", "pr_label", "o_totalprice")
        .orderBy("o_orderkey")
    )


AUTO_SALT_SQL = """
SELECT o_orderkey, o_orderpriority,
       'P-' || o_orderpriority AS pr_label,
       o_totalprice
FROM orders
ORDER BY o_orderkey
"""


def containment_prefix_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-RECALL near-subset detection: prefix-filter containment
    index (operators/minhash.py containment_candidate_pairs) + exact
    verify. Candidate recall is total by the pigeonhole guarantee, so
    the DuckDB twin is simply brute-force all-pairs containment — no
    index replay needed; any missing or extra pair hash-fails."""
    from rds_to_datalake_project_spark.operators.minhash import containment_neardup

    docs = load_table(spark, sf_dir, "documents")
    return containment_neardup(docs, threshold=0.5, hash_mode="md5").orderBy(
        "a_id", "b_id"
    )


CONTAINMENT_PREFIX_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ) AS shingles
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
    FROM documents
  )
)
SELECT a_id, b_id, containment_a_in_b, containment_b_in_a FROM (
  SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / len(sa.shingles) AS containment_a_in_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / len(sb.shingles) AS containment_b_in_a
  FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
  WHERE len(sa.shingles) >= 1 AND len(sb.shingles) >= 1
)
WHERE greatest(containment_a_in_b, containment_b_in_a) >= 0.5
ORDER BY a_id, b_id
"""


def hot_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew report over the orders fact's join key
    (operators/skew.py hot_keys): the customers whose order counts
    would dominate a hash partition of a customer join."""
    from rds_to_datalake_project_spark.operators.skew import hot_keys

    orders = load_table(spark, sf_dir, "orders")
    return hot_keys(orders, ["o_custkey"], min_count=5, top_k=50)


HOT_KEYS_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 5
ORDER BY n_rows DESC, o_custkey
LIMIT 50
"""


def sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SQ8 ANN (operators/similarity.py sq8_topk): 8-bit
    scalar-quantized approximate scan → exact cosine rerank. Both
    stages are integer-exact, so the DuckDB twin replays them
    bit-for-bit."""
    from rds_to_datalake_project_spark.operators.similarity import sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(emb, query_vec_id=0, k=10, rerank=64)


SQ8_ANN_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), dims AS (
  SELECT p.i AS pos, MIN(e.v[p.i]) AS lo, MAX(e.v[p.i]) AS hi
  FROM e, unnest(range(1, len(e.v) + 1)) AS p(i)
  GROUP BY p.i
), b AS (
  SELECT list(lo ORDER BY pos) AS lo_l, list(hi ORDER BY pos) AS hi_l FROM dims
), codes AS (
  SELECT e.vec_id, e.v,
         list_transform(range(1, len(e.v) + 1), i ->
           CASE WHEN b.hi_l[i] = b.lo_l[i] THEN CAST(0 AS BIGINT)
                ELSE CAST(round(255 * (e.v[i] - b.lo_l[i])
                                / (b.hi_l[i] - b.lo_l[i])) AS BIGINT)
           END) AS code
  FROM e CROSS JOIN b
), q AS (
  SELECT code AS qcode,
         list_transform(v, x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
  FROM codes WHERE vec_id = 0
), cand AS (
  SELECT c.vec_id, c.v,
         CAST(list_sum(list_transform(range(1, len(c.code) + 1),
              i -> (c.code[i] - 128) * (q.qcode[i] - 128))) AS BIGINT)
           AS approx_score
  FROM codes c CROSS JOIN q
  ORDER BY approx_score DESC, c.vec_id
  LIMIT 64
), rerank AS (
  SELECT cand.vec_id, cand.approx_score,
         CAST(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[i] * q.qv[i])) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)
              * CAST(list_sum(list_transform(q.qv, x -> x * x)) AS DOUBLE))
           AS cosine_sim
  FROM (SELECT vec_id, approx_score,
               list_transform(v, x -> CAST(round(x * 1000000) AS BIGINT)) AS cv
        FROM cand) cand
  CROSS JOIN q
)
SELECT vec_id, approx_score, cosine_sim
FROM rerank
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms (operators/text.py
    tfidf_terms, undampened scoring — see its docstring for why the
    hash-checked variant drops the ln)."""
    from rds_to_datalake_project_spark.operators.text import tfidf_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_terms(docs, top_k=3, dampened=False).orderBy(
        "doc_id", "term_rank"
    )


TFIDF_SQL = """
WITH terms AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms WHERE term <> '' GROUP BY doc_id, term
), dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df_docs FROM tf GROUP BY term
), n AS (
    SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
           CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df_docs AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term_rank, term, tf, df_docs, score
FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS term_rank
    FROM scored
)
WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""


def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style passage-level boilerplate removal: 10-word
    windows, strip windows shared by >1 distinct document, reassemble
    (operators/passages.py). clean_text is hash-compared verbatim."""
    from rds_to_datalake_project_spark.operators.passages import passage_dedup

    docs = load_table(spark, sf_dir, "documents")
    return passage_dedup(docs, window=10, max_docs=1).orderBy("doc_id")


PASSAGE_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS toks
  FROM documents
), seg AS (
  SELECT doc_id, CAST(i AS INTEGER) AS widx,
         array_to_string(
           list_slice(toks, CAST(i*10+1 AS BIGINT), CAST(i*10+10 AS BIGINT)),
           ' ') AS passage
  FROM toks,
       UNNEST(range(0, greatest(CAST(ceil(len(toks)/10.0) AS BIGINT), 1))) AS t(i)
), shared AS (
  SELECT passage FROM seg GROUP BY passage
  HAVING COUNT(DISTINCT doc_id) > 1
), flagged AS (
  SELECT seg.doc_id, seg.widx, seg.passage,
         shared.passage IS NOT NULL AS removed
  FROM seg LEFT JOIN shared ON seg.passage = shared.passage
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_passages,
  CAST(coalesce(sum(CAST(removed AS INT)), 0) AS BIGINT) AS n_removed,
  coalesce(string_agg(CASE WHEN NOT removed THEN passage END,
                      ' ' ORDER BY widx), '') AS clean_text
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM cross-entropy quality scores, self-scored
    over the documents corpus (operators/text.py bigram_lm_score —
    Laplace alpha=1, xent rounded to 4dp for cross-engine parity)."""
    from rds_to_datalake_project_spark.operators.text import bigram_lm_score

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_score(docs).orderBy("doc_id")


BIGRAM_LM_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z]+'),
                     x -> x <> '') AS toks
  FROM documents
), vocab AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT unnest(toks) AS w FROM toks)
), big AS (
  SELECT doc_id, toks[CAST(i AS BIGINT)] AS w1, toks[CAST(i+1 AS BIGINT)] AS w2
  FROM toks, UNNEST(range(1, len(toks))) AS t(i)
), cb AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_big FROM big GROUP BY w1, w2
), cp AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c_pre FROM big GROUP BY w1
), scored AS (
  SELECT b.doc_id, cb.c_big, cp.c_pre
  FROM big b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
             JOIN cp ON b.w1 = cp.w1
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN c_big < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
         round(-avg(ln((c_big + 1.0) / (c_pre + 1.0 * v))), 4) AS xent
  FROM scored CROSS JOIN vocab GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.n_unseen, 0) AS n_unseen,
       a.xent AS xent
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "exact_dedup_docs": exact_dedup_docs,
    "passage_dedup_docs": passage_dedup_docs,
    "bigram_lm_quality": bigram_lm_quality,
    "tfidf_top_terms": tfidf_top_terms,
    "sq8_ann_topk": sq8_ann_topk,
    "hot_order_customers": hot_order_customers,
    "ngram_containment_md5": ngram_containment_md5,
    "containment_prefix_md5": containment_prefix_md5,
    "auto_salted_priority_join": auto_salted_priority_join,
    "ngram_containment_neardup": ngram_containment_neardup,
    "media_resize_stats": media_resize_stats,
    "image_ahash_neardups": image_ahash_neardups,
    "audio_hash_neardups": audio_hash_neardups,
    "bpe_merge_pairs": bpe_merge_pairs,
    "bpe_merge_table": bpe_merge_table_q,
    "bpe_encode_counts": bpe_encode_counts,
    "curate_documents_decisions": curate_documents_decisions,
    "doc_fingerprint": doc_fingerprint,
    "text_quality": text_quality,
    "repetition_quality": repetition_quality,
    "pii_scrub": pii_scrub,
    "lang_id": lang_id,
    "token_count_by_source": token_count_by_source,
    "ann_topk_cosine": ann_topk_cosine,
    "neardup_cosine_pairs": neardup_cosine_pairs,
    "neardup_components": neardup_components,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "minhash_neardup": minhash_neardup,
    "ngram_jaccard_neardup": ngram_jaccard_neardup,
    "simhash_neardup": simhash_neardup,
    "minhash_lsh_candidates_md5": minhash_lsh_candidates_md5,
    "minhash_neardup_md5": minhash_neardup_md5,
    "ngram_jaccard_neardup_md5": ngram_jaccard_neardup_md5,
    "neardup_keep_best_md5": neardup_keep_best_md5,
    "simhash_neardup_md5": simhash_neardup_md5,
    "srp_neardup_embeddings": srp_neardup_embeddings,
    "bpe_token_stats": bpe_token_stats,
    "media_feature_extract": media_feature_extract,
    "media_decode_stats": media_decode_stats,
    "video_frame_plan": video_frame_plan,
    "ivf_probe_topk": ivf_probe_topk,
    "zorder_key_orders": zorder_key_orders,
    "hilbert_key_orders": hilbert_key_orders,
    "commit_key_codec": commit_key_codec,
    "profile_orders": profile_orders,
    "rolling_fingerprint": rolling_fingerprint,
    "jaccard_allpairs_sample": jaccard_allpairs_sample,
    "sample_docs_per_source": sample_docs_per_source,
    "weighted_sample_docs": weighted_sample_docs,
    "train_test_split_counts": train_test_split_counts,
    "ivf_trained_topk": ivf_trained_topk,
}

# xxhash64-based ops have no DuckDB twin → no oracle entry (driver
# records rows-only checks for them, per the contract).
ORACLES = {
    "exact_dedup_docs": EXACT_DEDUP_SQL,
    "passage_dedup_docs": PASSAGE_DEDUP_SQL,
    "bigram_lm_quality": BIGRAM_LM_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "sq8_ann_topk": SQ8_ANN_SQL,
    "hot_order_customers": HOT_KEYS_SQL,
    "ngram_containment_md5": NGRAM_CONTAINMENT_MD5_SQL,
    "containment_prefix_md5": CONTAINMENT_PREFIX_SQL,
    "ngram_containment_neardup": CONTAINMENT_PREFIX_SQL,
    "auto_salted_priority_join": AUTO_SALT_SQL,
    "media_resize_stats": MEDIA_RESIZE_SQL,
    "image_ahash_neardups": IMAGE_AHASH_SQL,
    "audio_hash_neardups": AUDIO_HASH_SQL,
    "bpe_merge_pairs": BPE_MERGE_SQL,
    "bpe_merge_table": BPE_MERGE_TABLE_SQL,
    "bpe_encode_counts": BPE_ENCODE_SQL,
    "curate_documents_decisions": CURATE_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "repetition_quality": REPETITION_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "lang_id": LANG_ID_SQL,
    "token_count_by_source": TOKEN_COUNT_SQL,
    "ann_topk_cosine": ANN_TOPK_SQL,
    "neardup_cosine_pairs": NEARDUP_COSINE_SQL,
    "neardup_components": NEARDUP_COMPONENTS_SQL,
    "ivf_probe_topk": IVF_PROBE_SQL,
    "zorder_key_orders": ZORDER_SQL,
    "hilbert_key_orders": HILBERT_SQL,
    "commit_key_codec": COMMIT_KEY_SQL,
    "profile_orders": PROFILE_SQL,
    "rolling_fingerprint": ROLLING_FP_SQL,
    "jaccard_allpairs_sample": JACCARD_ALLPAIRS_SQL,
    "minhash_lsh_candidates_md5": MINHASH_LSH_MD5_SQL,
    "minhash_neardup_md5": MINHASH_NEARDUP_MD5_SQL,
    "ngram_jaccard_neardup_md5": NGRAM_JACCARD_NEARDUP_MD5_SQL,
    "neardup_keep_best_md5": NEARDUP_KEEP_BEST_MD5_SQL,
    "simhash_neardup_md5": SIMHASH_NEARDUP_MD5_SQL,
    "srp_neardup_embeddings": SRP_NEARDUP_SQL,
    "bpe_token_stats": BPE_TOKEN_SQL,
    "media_feature_extract": MEDIA_FEATURES_SQL,
    "media_decode_stats": MEDIA_DECODE_SQL,
    "video_frame_plan": VIDEO_FRAME_SQL,
    "sample_docs_per_source": SAMPLE_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "train_test_split_counts": SPLIT_SQL,
}


def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier inference over the corpus
    (operators/text.hashed_linear_score): fasttext-style
    unigram+bigram hashing-trick features, integer weights, exact
    int64 logits — the "apply a trained quality model at 100 TB"
    pattern as one map-only codegen'd pass. The oracle replays
    features, buckets, and weights bit-for-bit."""
    from rds_to_datalake_project_spark.operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_score(docs, dims=1024).orderBy("doc_id")


QUALITY_MODEL_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9'']+') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         list_concat(
           toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    j -> toks[j] || ' ' || toks[j + 1])
                ELSE [] END
         ) AS feats
  FROM t
), b AS (
  SELECT doc_id,
         list_transform(feats, ft ->
           CAST(('0x' || substring(md5(ft), 1, 15)) AS BIGINT) % 1024
         ) AS buckets
  FROM f
), s AS (
  SELECT doc_id,
         CAST(len(buckets) AS BIGINT) AS n_features,
         CAST(coalesce(
           list_sum(list_transform(buckets, bk -> (bk % 1001) - 500)), 0
         ) AS BIGINT) AS logit
  FROM b
)
SELECT doc_id, n_features, logit, (logit >= 0) AS keep_doc
FROM s
ORDER BY doc_id
"""

QUERIES["quality_model_scores"] = quality_model_scores
ORACLES["quality_model_scores"] = QUALITY_MODEL_SQL


def lexical_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative OOV/novelty rates per document
    (operators/text.lexical_novelty): vocabulary pass + token-level
    frequency join, exact integer counts, one double division."""
    from rds_to_datalake_project_spark.operators.text import lexical_novelty

    docs = load_table(spark, sf_dir, "documents")
    return lexical_novelty(docs, min_freq=3).orderBy("doc_id")


LEXICAL_NOVELTY_SQL = """
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9'']+')) AS term
  FROM documents
), vocab AS (
  SELECT term, COUNT(*) AS freq FROM occ GROUP BY term
), per_doc AS (
  SELECT occ.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN vocab.freq < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM occ JOIN vocab ON occ.term = vocab.term
  GROUP BY occ.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_rare, 0) AS n_rare,
       CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN CAST(COALESCE(p.n_rare, 0) AS DOUBLE)
                 / CAST(p.n_tokens AS DOUBLE)
            ELSE 0.0 END AS rare_rate
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""

QUERIES["lexical_novelty_scores"] = lexical_novelty_scores
ORACLES["lexical_novelty_scores"] = LEXICAL_NOVELTY_SQL


_IVFQ_K, _IVFQ_ITERS = 4, 3


def ivf_quantized_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END hash-checked IVF: fixed-point k-means training
    (operators/ivf_train.train_ivf_centroids_quantized — integer
    distances, floored-mean updates), integer cell assignment, 2-cell
    probe, exact quantized-cosine top-k. Unlike ivf_trained_topk
    (float Lloyd, rows-only by contract) every stage here replays
    bit-for-bit in the DuckDB twin — the trainer loop unrolled as
    CTEs."""
    from rds_to_datalake_project_spark.operators.ivf_train import (
        _assign_cells_quantized,
        train_ivf_centroids_quantized,
    )
    from rds_to_datalake_project_spark.operators.similarity import (
        cosine_q,
        quantize,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids_quantized(
        emb, k=_IVFQ_K, iterations=_IVFQ_ITERS
    )
    q = emb.select(F.col("vec_id"), quantize("embedding").alias("__qv"))
    assigned = _assign_cells_quantized(q, cents)
    qv = [
        int(v)
        for v in q.filter(F.col("vec_id") == 1).collect()[0]["__qv"]
    ]
    scored = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qv, vec)), cid)
        for cid, vec in cents
    )
    probe = [cid for _d, cid in scored[:2]]
    qarr = F.array(*[F.lit(v).cast("long") for v in qv])
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(
            "vec_id",
            F.col("cell").alias("ivf_cell"),
            cosine_q(F.col("__qv"), qarr).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


def _ivfq_assign_chain(k: int, iters: int) -> str:
    """Shared DuckDB CTE chain replaying the fixed-point trainer +
    final cell assignment (``fin``) — every CTE mirrors the Spark
    operator exactly (seeds by smallest id, (d, cid) argmin ties,
    floor(double(SUM)/COUNT) updates, empty cells keep their
    centroid). Consumed by the trained-IVF probe and semantic-dedup
    oracles."""
    dist = (
        "CAST(list_sum(list_transform(range(1, len(e.qv) + 1), "
        "j -> (e.qv[j] - c.qc[j]) * (e.qv[j] - c.qc[j]))) AS BIGINT)"
    )
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qv AS qc
  FROM (SELECT vec_id, qv FROM e ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", a{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN c{i - 1} c
  ) WHERE rn = 1
), s{i} AS (
  SELECT a.cid, p.j,
         CAST(floor(CAST(SUM(e.qv[p.j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM a{i} a JOIN e ON e.vec_id = a.vec_id, unnest(range(1, len(e.qv) + 1)) AS p(j)
  GROUP BY a.cid, p.j
), l{i} AS (
  SELECT cid, list(m ORDER BY j) AS qc FROM s{i} GROUP BY cid
), c{i} AS MATERIALIZED (
  SELECT p.cid, COALESCE(l.qc, p.qc) AS qc
  FROM c{i - 1} p LEFT JOIN l{i} l ON l.cid = p.cid
)"""
        )
    parts.append(
        f""", fin AS MATERIALIZED (
  SELECT vec_id, cid AS ivf_cell FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    return "".join(parts)


def _ivf_quantized_sql(k: int, iters: int) -> str:
    """Trained-IVF 2-cell probe on top of the shared assignment chain."""
    return _ivfq_assign_chain(k, iters) + f""", q AS (
  SELECT qv FROM e WHERE vec_id = 1
), probe AS (
  SELECT c.cid FROM c{iters} c CROSS JOIN q
  ORDER BY CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
            j -> (q.qv[j] - c.qc[j]) * (q.qv[j] - c.qc[j]))) AS BIGINT), c.cid
  LIMIT 2
)
SELECT e.vec_id, fin.ivf_cell,
       CAST(list_sum(list_transform(range(1, len(e.qv) + 1), j -> e.qv[j] * q.qv[j])) AS DOUBLE)
       / sqrt(CAST(list_sum(list_transform(e.qv, x -> x * x)) AS DOUBLE)
            * CAST(list_sum(list_transform(q.qv, x -> x * x)) AS DOUBLE)) AS cosine_sim
FROM e JOIN fin ON fin.vec_id = e.vec_id CROSS JOIN q
WHERE fin.ivf_cell IN (SELECT cid FROM probe)
ORDER BY cosine_sim DESC, e.vec_id
LIMIT 10"""


IVF_QUANTIZED_SQL = _ivf_quantized_sql(_IVFQ_K, _IVFQ_ITERS)

QUERIES["ivf_quantized_trained_topk"] = ivf_quantized_trained_topk
ORACLES["ivf_quantized_trained_topk"] = IVF_QUANTIZED_SQL


# The synthetic embeddings have no planted >0.5-cosine twins, so the
# driver query runs SemDeDup in its aggressive diversity-pruning mode
# (the paper prunes up to ~50% of web corpora) — 0.40 exercises real
# drop decisions at every SF; the operator default stays 0.95.
_SEMDEDUP_THRESHOLD = 0.40


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end: fixed-point k-means cells (the hash-checked
    trainer) + within-cell cosine pruning — drop any vector whose cell
    holds a lower-id vector with cosine >= 0.95
    (operators/similarity.py semantic_dedup). Every stage replays
    bit-for-bit in the DuckDB twin."""
    from rds_to_datalake_project_spark.operators.ivf_train import (
        _assign_cells_quantized,
        train_ivf_centroids_quantized,
    )
    from rds_to_datalake_project_spark.operators.similarity import (
        quantize,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids_quantized(emb, k=_IVFQ_K, iterations=_IVFQ_ITERS)
    q = emb.select(F.col("vec_id"), quantize("embedding").alias("__qv"))
    assigned = _assign_cells_quantized(q, cents).withColumnRenamed(
        "cell", "ivf_cell"
    )
    return semantic_dedup(
        assigned,
        block_col="ivf_cell",
        threshold=_SEMDEDUP_THRESHOLD,
        vec_col="__qv",
        quantized=True,
    ).orderBy("vec_id")


def _semantic_dedup_sql(k: int, iters: int, threshold: float) -> str:
    """Within-cell SemDeDup pruning on top of the shared trained-cell
    assignment chain."""
    return _ivfq_assign_chain(k, iters) + f""", pairs AS (
  SELECT fb.vec_id AS bid, fa.vec_id AS aid,
         CAST(list_sum(list_transform(range(1, len(ea.qv) + 1),
              j -> ea.qv[j] * eb.qv[j])) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(ea.qv, x -> x * x)) AS DOUBLE)
              * CAST(list_sum(list_transform(eb.qv, x -> x * x)) AS DOUBLE)) AS sim
  FROM fin fa JOIN fin fb
    ON fa.ivf_cell = fb.ivf_cell AND fa.vec_id < fb.vec_id
  JOIN e ea ON ea.vec_id = fa.vec_id
  JOIN e eb ON eb.vec_id = fb.vec_id
), dup AS (
  SELECT bid, CAST(MIN(aid) AS BIGINT) AS dup_of,
         CAST(COUNT(*) AS BIGINT) AS n_similar
  FROM pairs WHERE sim >= {threshold} GROUP BY bid
)
SELECT fin.vec_id, CAST(fin.ivf_cell AS INTEGER) AS ivf_cell,
       dup.dup_of IS NULL AS keep, dup.dup_of,
       COALESCE(dup.n_similar, 0) AS n_similar
FROM fin LEFT JOIN dup ON dup.bid = fin.vec_id
ORDER BY fin.vec_id"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql(
    _IVFQ_K, _IVFQ_ITERS, _SEMDEDUP_THRESHOLD
)

QUERIES["semantic_dedup_embeddings"] = semantic_dedup_embeddings
ORACLES["semantic_dedup_embeddings"] = SEMANTIC_DEDUP_SQL


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-grade equi-width histogram of order totals
    (operators/profile.column_histogram): fixed [0, 600000) range, 24
    buckets, exact integer counts — the distribution sketch a cost
    model or skew advisory reads."""
    from rds_to_datalake_project_spark.operators.profile import column_histogram

    orders = load_table(spark, sf_dir, "orders")
    return column_histogram(orders, "o_totalprice", 0.0, 600_000.0, 24)


PRICE_HISTOGRAM_SQL = """
WITH params AS (
  SELECT 0.0 AS lo, 600000.0 AS hi, 24 AS nb
), buckets AS (
  SELECT CAST(b.b AS INT) AS bucket,
         p.lo + b.b * (p.hi - p.lo) / p.nb AS lo_edge,
         p.lo + (b.b + 1) * (p.hi - p.lo) / p.nb AS hi_edge
  FROM params p, unnest(range(0, 24)) AS b(b)
), counts AS (
  SELECT LEAST(p.nb - 1, GREATEST(0,
           CAST(floor((CAST(o.o_totalprice AS DOUBLE) - p.lo)
                      / ((p.hi - p.lo) / p.nb)) AS INT))) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders o CROSS JOIN params p
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1
)
SELECT b.bucket, b.lo_edge, b.hi_edge,
       COALESCE(c.n_rows, 0) AS n_rows
FROM buckets b LEFT JOIN counts c ON c.bucket = b.bucket
ORDER BY b.bucket
"""

QUERIES["price_histogram"] = price_histogram
ORACLES["price_histogram"] = PRICE_HISTOGRAM_SQL


_HQ_PCTS = (25, 50, 75, 90, 99)


def histogram_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-CDF quantile brackets of order totals
    (operators/profile.histogram_quantiles) — the mergeable,
    one-scan scale path beside the exact-sort percentile query.
    Integer rank inversion over fixed edges makes the sketch
    deterministic enough to hash-check cross-engine, which
    approx_percentile never could."""
    from rds_to_datalake_project_spark.operators.profile import (
        histogram_quantiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    return histogram_quantiles(
        orders, "o_totalprice", 0.0, 600_000.0, 24, list(_HQ_PCTS)
    )


HISTOGRAM_QUANTILES_SQL = f"""
WITH params AS (
  SELECT 0.0 AS lo, 600000.0 AS hi, 24 AS nb
), counts AS (
  SELECT LEAST(p.nb - 1, GREATEST(0,
           CAST(floor((CAST(o.o_totalprice AS DOUBLE) - p.lo)
                      / ((p.hi - p.lo) / p.nb)) AS INT))) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders o CROSS JOIN params p
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1
), buckets AS (
  SELECT CAST(b.b AS INT) AS bucket,
         p.lo + b.b * (p.hi - p.lo) / p.nb AS lo_edge,
         p.lo + (b.b + 1) * (p.hi - p.lo) / p.nb AS hi_edge,
         COALESCE(c.n_rows, 0) AS n_rows
  FROM params p, unnest(range(0, 24)) AS b(b)
  LEFT JOIN counts c ON c.bucket = CAST(b.b AS INT)
), cum AS (
  SELECT bucket, lo_edge, hi_edge,
         SUM(n_rows) OVER (ORDER BY bucket) AS cum,
         SUM(n_rows) OVER () AS total
  FROM buckets
), pts AS (
  SELECT p, (c.total * p + 99) // 100 AS rank, c.total, c.bucket, c.cum
  FROM cum c CROSS JOIN (SELECT unnest({list(_HQ_PCTS)}) AS p)
), hit AS (
  SELECT p, total, rank, MIN(bucket) AS bucket
  FROM pts WHERE cum >= rank GROUP BY p, total, rank
)
SELECT h.p, CAST(h.total AS BIGINT) AS total, CAST(h.rank AS BIGINT) AS rank,
       h.bucket, b.lo_edge, b.hi_edge
FROM hit h JOIN buckets b ON b.bucket = h.bucket
ORDER BY h.p
"""

QUERIES["histogram_quantiles_price"] = histogram_quantiles_price
ORACLES["histogram_quantiles_price"] = HISTOGRAM_QUANTILES_SQL


def grouped_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP histogram-CDF quantiles (dims=o_orderpriority): the
    cumulative window partitions by the group key — groups spread
    across executors, each CDF inversion over its own 24 buckets."""
    from rds_to_datalake_project_spark.operators.profile import (
        histogram_quantiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    return histogram_quantiles(
        orders,
        "o_totalprice",
        0.0,
        600_000.0,
        24,
        [50, 90],
        dims=["o_orderpriority"],
    )


GROUPED_QUANTILES_SQL = """
WITH params AS (
  SELECT 0.0 AS lo, 600000.0 AS hi, 24 AS nb
), counts AS (
  SELECT o.o_orderpriority,
         LEAST(p.nb - 1, GREATEST(0,
           CAST(floor((CAST(o.o_totalprice AS DOUBLE) - p.lo)
                      / ((p.hi - p.lo) / p.nb)) AS INT))) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders o CROSS JOIN params p
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1, 2
), spine AS (
  SELECT DISTINCT c.o_orderpriority, CAST(b.b AS INT) AS bucket,
         p.lo + b.b * (p.hi - p.lo) / p.nb AS lo_edge,
         p.lo + (b.b + 1) * (p.hi - p.lo) / p.nb AS hi_edge
  FROM counts c, params p, unnest(range(0, 24)) AS b(b)
), dense AS (
  SELECT s.o_orderpriority, s.bucket, s.lo_edge, s.hi_edge,
         COALESCE(c.n_rows, 0) AS n_rows
  FROM spine s LEFT JOIN counts c
    ON c.o_orderpriority = s.o_orderpriority AND c.bucket = s.bucket
), cum AS (
  SELECT o_orderpriority, bucket, lo_edge, hi_edge,
         SUM(n_rows) OVER (PARTITION BY o_orderpriority ORDER BY bucket) AS cum,
         SUM(n_rows) OVER (PARTITION BY o_orderpriority) AS total
  FROM dense
), pts AS (
  SELECT o_orderpriority, p, (total * p + 99) // 100 AS rank, total, bucket, cum
  FROM cum CROSS JOIN (SELECT unnest([50, 90]) AS p)
), hit AS (
  SELECT o_orderpriority, p, total, rank, MIN(bucket) AS bucket
  FROM pts WHERE cum >= rank GROUP BY 1, 2, 3, 4
)
SELECT h.o_orderpriority, h.p, CAST(h.total AS BIGINT) AS total,
       CAST(h.rank AS BIGINT) AS rank, h.bucket, d.lo_edge, d.hi_edge
FROM hit h JOIN (SELECT DISTINCT o_orderpriority, bucket, lo_edge, hi_edge
                 FROM dense) d
  ON d.o_orderpriority = h.o_orderpriority AND d.bucket = h.bucket
ORDER BY h.o_orderpriority, h.p
"""

QUERIES["grouped_quantiles_by_priority"] = grouped_quantiles_by_priority
ORACLES["grouped_quantiles_by_priority"] = GROUPED_QUANTILES_SQL


def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (operators/profile.equidepth_histogram):
    ntile(10) over order totals per priority — the skew-proof
    histogram form; totally-ordered by (value, orderkey) so bucket
    assignment is deterministic and hash-checkable."""
    from rds_to_datalake_project_spark.operators.profile import (
        equidepth_histogram,
    )

    orders = load_table(spark, sf_dir, "orders")
    return equidepth_histogram(
        orders, "o_totalprice", 10, "o_orderkey", dims=["o_orderpriority"]
    )


EQUIDEPTH_SQL = """
SELECT o_orderpriority, CAST(bucket AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders WHERE o_totalprice IS NOT NULL
)
GROUP BY o_orderpriority, bucket
ORDER BY o_orderpriority, bucket
"""

QUERIES["equidepth_price_histogram"] = equidepth_price_histogram
ORACLES["equidepth_price_histogram"] = EQUIDEPTH_SQL


def zorder3_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-dimensional Morton key over (custkey, orderkey, price-bucket)
    — the N-dim generalization behind cluster_by_zorder_n
    (operators/zorder.py), emitted per row so the full interleave is
    oracle-checked."""
    from rds_to_datalake_project_spark.operators.zorder import morton_key_n

    orders = load_table(spark, sf_dir, "orders")
    bits = 21  # 3 dims × 21 bits = 63
    span = F.lit(1 << bits)
    dims = [
        F.pmod(F.col("o_custkey").cast("long"), span),
        F.pmod(F.col("o_orderkey").cast("long"), span),
        F.pmod(F.floor(F.col("o_totalprice")).cast("long"), span),
    ]
    return orders.select(
        "o_orderkey", morton_key_n(dims, bits).alias("zkey")
    ).orderBy("o_orderkey")


ZORDER3_SQL = """
SELECT o_orderkey,
       CAST(list_sum(list_transform(range(0, 21), i ->
           (CAST(((o_custkey % 2097152) >> CAST(i AS INTEGER)) & 1 AS BIGINT)
             << (3 * CAST(i AS INTEGER)))
         + (CAST(((o_orderkey % 2097152) >> CAST(i AS INTEGER)) & 1 AS BIGINT)
             << (3 * CAST(i AS INTEGER) + 1))
         + (CAST(((CAST(floor(o_totalprice) AS BIGINT) % 2097152) >> CAST(i AS INTEGER)) & 1 AS BIGINT)
             << (3 * CAST(i AS INTEGER) + 2))
       )) AS BIGINT) AS zkey
FROM orders
ORDER BY o_orderkey
"""

QUERIES["zorder3_key_orders"] = zorder3_key_orders
ORACLES["zorder3_key_orders"] = ZORDER3_SQL


def embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift report (operators/embedding_stats.py)
    between the embeddings corpus and a deterministically perturbed
    state (every third vector shifted +0.25 per component — a stand-in
    for an encoder rev). The drifted flag is cross-multiplied int64,
    so the oracle's replay is bit-exact; the shift of 0.25/3 ≈ 0.083
    clears the 0.05 threshold on every dimension."""
    from rds_to_datalake_project_spark.operators.embedding_stats import (
        embedding_drift_report,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        )
    )
    mod = e.select(
        F.when(
            F.col("vec_id") % 3 == 0,
            F.transform(
                F.col("embedding"), lambda x: x.cast("double") + F.lit(0.25)
            ),
        )
        .otherwise(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        )
        .alias("embedding")
    )
    return embedding_drift_report(base, mod, "embedding").orderBy("pos")


EMBEDDING_DRIFT_SQL = """
WITH base AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), mod AS (
  SELECT CASE WHEN vec_id % 3 = 0
              THEN list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.25e0)
              ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
  FROM embeddings
), sa AS (
  SELECT CAST(p.i - 1 AS INTEGER) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM(CAST(round(b.v[p.i] * 1000000) AS BIGINT)) AS BIGINT) AS sum_a_u
  FROM base b, unnest(range(1, len(b.v) + 1)) AS p(i)
  GROUP BY 1
), sb AS (
  SELECT CAST(p.i - 1 AS INTEGER) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(CAST(round(m.v[p.i] * 1000000) AS BIGINT)) AS BIGINT) AS sum_b_u
  FROM mod m, unnest(range(1, len(m.v) + 1)) AS p(i)
  GROUP BY 1
)
SELECT sa.pos, n_a, n_b, sum_a_u, sum_b_u,
       CAST(sum_a_u AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a_u,
       CAST(sum_b_u AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b_u,
       abs(sum_a_u * n_b - sum_b_u * n_a) > 50000 * n_a * n_b AS drifted
FROM sa JOIN sb ON sa.pos = sb.pos
ORDER BY sa.pos
"""

QUERIES["embedding_dim_drift"] = embedding_dim_drift
ORACLES["embedding_dim_drift"] = EMBEDDING_DRIFT_SQL
