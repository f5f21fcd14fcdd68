"""Randomized parity of the pure-Python oracle twins against the live
Spark operators — guards the golden generators against future drift on
inputs beyond the fixed driver corpus (edge whitespace, punctuation,
short docs, repeated tokens)."""

import random
import sys

import pytest

sys.path.insert(0, "tools")


def _random_texts(n: int, seed: int = 99) -> list[str]:
    rng = random.Random(seed)
    words = ["alpha", "beta", "g", "delta!", "42", "x,y", "the", "a."]
    out = ["", " ", "a", "  \t mixed   whitespace \t here "]
    for _ in range(n):
        k = rng.randint(1, 40)
        sep = rng.choice([" ", "  ", " \t "])
        out.append(sep.join(rng.choice(words) for _ in range(k)))
    return out


class TestTwinParity:
    def test_simhash_and_winnowing_twins_match_spark(self, spark):
        import oracle_twins as tw
        from gocrd_spark.operators.dedup import simhash64
        from gocrd_spark.operators.textstats import winnowing_fingerprints

        texts = _random_texts(40)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got_sim = {r.doc_id: r.simhash for r in simhash64(df, n=2).collect()}
        got_win = {
            r.doc_id: list(r.fingerprints)
            for r in winnowing_fingerprints(df).collect()
        }
        for i, t in enumerate(texts):
            assert got_sim[i] == tw.simhash64(t, n=2), f"simhash diverged: {t!r}"
            assert got_win[i] == tw.winnowing_fingerprints(t), f"winnow diverged: {t!r}"

    def test_twin_rejects_non_ascii(self):
        import oracle_twins as tw

        with pytest.raises(ValueError):
            tw.norm_text("ſchaͤdlich")


class TestFlagshipPlanShape:
    def test_extraction_has_exactly_one_exchange(self, spark):
        """The salted plan is Scan -> ONE Exchange -> MapInPandas; a
        second shuffle appearing here means a plan regression."""
        from gocrd_spark import datagen
        from gocrd_spark.pipeline import extract_pages

        pages = datagen.pages_df(spark, 50, num_partitions=4)
        plan = (
            extract_pages(pages, num_partitions=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # count Exchange operators, excluding AQE's reuse wrappers
        n_exchange = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n_exchange == 1, plan[:2000]
