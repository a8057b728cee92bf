"""Round-8 corpus-quality operators: passage-level dedup, bigram-LM
scoring, SemDeDup semantic dedup. Semantics pinned with planted
fixtures; driver queries cover oracle parity at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_datalake_project_spark.operators.passages import (
    passage_dedup,
    split_passages,
)
from rds_to_datalake_project_spark.operators.similarity import semantic_dedup
from rds_to_datalake_project_spark.operators.text import bigram_lm_score

BOILER = "terms of service apply to all users of this site"  # 10 words


def _docs(spark):
    rows = [
        (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, BOILER + " one two three four five six seven eight nine ten"),
        (3, "unique words entirely here nothing shared with any other doc"),
        (4, ""),  # empty doc must survive with empty clean_text
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestPassageDedup:
    def test_shared_window_stripped_everywhere(self, spark):
        out = {
            r.doc_id: r
            for r in passage_dedup(_docs(spark), window=10).collect()
        }
        # docs 1 and 2 share the 10-word boilerplate window; it is
        # removed from BOTH, their unique tails survive in order
        assert out[1].n_removed == 1 and out[2].n_removed == 1
        assert out[1].clean_text.startswith("alpha beta gamma")
        assert out[2].clean_text.endswith("nine ten")
        assert BOILER not in out[1].clean_text
        # doc 3 is untouched, doc 4 is empty but present
        assert out[3].n_removed == 0
        assert out[3].clean_text == "unique words entirely here nothing shared with any other doc"
        assert out[4].clean_text == ""
        assert len(out) == 4

    def test_max_docs_loosens_threshold(self, spark):
        # max_docs=2 tolerates a passage in up to 2 docs -> nothing removed
        out = passage_dedup(_docs(spark), window=10, max_docs=2)
        assert out.agg(F.sum("n_removed")).collect()[0][0] == 0

    def test_hashed_mode_matches_exact(self, spark):
        docs = _docs(spark)
        exact = sorted(
            passage_dedup(docs, window=10).collect(), key=lambda r: r.doc_id
        )
        hashed = sorted(
            passage_dedup(docs, window=10, hashed=True).collect(),
            key=lambda r: r.doc_id,
        )
        assert [tuple(r) for r in exact] == [tuple(r) for r in hashed]

    def test_delimiter_mode(self, spark):
        df = spark.createDataFrame(
            [(1, "shared para\nuniq one"), (2, "shared para\nuniq two")],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r
            for r in passage_dedup(df, delimiter="\n", max_docs=1).collect()
        }
        assert out[1].n_removed == 1 and out[1].clean_text == "uniq one"
        assert out[2].clean_text == "uniq two"

    def test_split_passages_window_boundaries(self, spark):
        words = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(25)]
        df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
        segs = split_passages(df, window=10).orderBy("widx").collect()
        assert [len(s.passage.split()) for s in segs] == [10, 10, 5]
        assert segs[0].passage.startswith("waa ")
        assert segs[2].passage.endswith(words[-1])

    def test_window_validation(self, spark):
        with pytest.raises(ValueError):
            split_passages(_docs(spark), window=0).collect()


class TestBigramLM:
    def test_repetition_scores_lower_than_novelty(self, spark):
        # "a b" repeated is maximally predictable; the all-distinct doc
        # has only singleton bigrams -> strictly higher cross-entropy
        df = spark.createDataFrame(
            [(1, "a b " * 20), (2, "q w e r t y u i o p z x c v")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in bigram_lm_score(df).collect()}
        assert out[1].xent < out[2].xent
        assert out[2].n_unseen == out[2].n_bigrams  # all singletons
        assert out[1].n_unseen == 0

    def test_short_docs_get_null_xent(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "two tokens")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in bigram_lm_score(df).collect()}
        assert out[1].n_bigrams == 0 and out[1].xent is None
        assert out[2].n_bigrams == 0 and out[2].xent is None
        assert out[3].n_bigrams == 1 and out[3].xent is not None

    def test_separate_train_corpus(self, spark):
        train = spark.createDataFrame(
            [(100, "the cat sat on the mat " * 5)], ["doc_id", "text"]
        )
        score = spark.createDataFrame(
            [(1, "the cat sat"), (2, "purple elephant quantum")],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r for r in bigram_lm_score(score, train=train).collect()
        }
        # in-domain doc: every bigram seen in training
        assert out[1].n_unseen == 0
        # fully OOV doc: smoothing floor 1/V for every bigram, finite xent
        assert out[2].n_unseen == out[2].n_bigrams == 2
        assert out[1].xent < out[2].xent


class TestSemanticDedup:
    def _frame(self, spark):
        # cell 0: v1 ~ v2 (near-identical), v3 orthogonal
        # cell 1: v4 alone
        rows = [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.999, 0.01, 0.0]),
            (3, 0, [0.0, 1.0, 0.0]),
            (4, 1, [0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(rows, ["vec_id", "cell", "embedding"])

    def test_drops_lowest_id_wins(self, spark):
        out = {
            r.vec_id: r
            for r in semantic_dedup(
                self._frame(spark), block_col="cell", threshold=0.95
            ).collect()
        }
        assert out[1].keep and out[1].dup_of is None
        assert not out[2].keep and out[2].dup_of == 1 and out[2].n_similar == 1
        assert out[3].keep and out[4].keep
        assert len(out) == 4

    def test_blocks_isolate_pairs(self, spark):
        # identical vectors in DIFFERENT cells are never compared
        rows = [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])]
        df = spark.createDataFrame(rows, ["vec_id", "cell", "embedding"])
        out = semantic_dedup(df, block_col="cell", threshold=0.9).collect()
        assert all(r.keep for r in out)

    def test_quantized_input_path(self, spark):
        from rds_to_datalake_project_spark.operators.similarity import quantize

        df = self._frame(spark).withColumn("__qv", quantize("embedding"))
        out = semantic_dedup(
            df, block_col="cell", threshold=0.95, vec_col="__qv", quantized=True
        ).collect()
        assert sum(0 if r.keep else 1 for r in out) == 1
