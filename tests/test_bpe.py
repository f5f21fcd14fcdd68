"""Distributed BPE: hand-computed merges on the classic toy corpus,
Spark-vs-twin parity (independent implementations), greedy-merge edge
cases, early stop, and encode determinism."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture()
def toy(spark):
    # the classic Sennrich example corpus: low x5, lower x2, newest x6,
    # widest x3 — written as documents
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


class TestBpeTrain:
    def test_classic_corpus_first_merges(self, spark, toy):
        """Hand-derivable: 'est</w>' dominates (newest 6 + widest 3 = 9
        pairs of (e,s) and (s,t</w>)); the first merges must build it.
        Pair counts at rank 0: (e,s)=9, (s,t</w>)=9, (w,e)=8(lower?) —
        count: newest has (n,e)(e,w)(w,e)(e,s)(s,t</w>) x6; widest
        (w,i)(i,d)(d,e)(e,s)(s,t</w>) x3; low (l,o)(o,w</w>) x5; lower
        (l,o)(o,w)(w,e)(e,r</w>) x2. So (e,s)=9, (s,t</w>)=9, (w,e)=8,
        (l,o)=7 ... tie 9/9 breaks lexicographically: ('e','s') first."""
        from gocrd_spark.operators.bpe import bpe_train

        merges = bpe_train(toy, n_merges=4, min_pair_count=2)
        assert merges[0] == (0, "e", "s")
        assert merges[1] == (1, "es", "t</w>")
        # rank 2: after est</w> forms, (w,e) survives only in lower (2);
        # (l,o) = low 5 + lower 2 = 7 wins
        assert merges[2] == (2, "l", "o")

    def test_spark_equals_twin_on_fixture(self, docs):
        """The distributed trainer and the single-node dict-counter twin
        must produce the IDENTICAL ordered merge list on the shared docs
        fixture — the same independence the driver golden relies on."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import oracle_twins as tw

        from gocrd_spark.operators.bpe import bpe_train

        rows = sorted(
            (r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()
        )
        spark_merges = bpe_train(docs, n_merges=12, min_pair_count=2)
        twin_merges = tw.bpe_train(rows, n_merges=12, min_pair_count=2)
        assert spark_merges == twin_merges

    def test_early_stop_below_min_count(self, spark):
        from gocrd_spark.operators.bpe import bpe_train

        docs = spark.createDataFrame(
            [(0, "ab cd ef")], "doc_id long, text string"
        )  # every pair occurs once
        assert bpe_train(docs, n_merges=10, min_pair_count=2) == []

    def test_greedy_overlap_semantics(self, spark):
        """'aaaa' under merge (a,a): greedy left-to-right gives
        [aa, aa, ...] — the fold must not re-merge across a fresh
        merge result."""
        from gocrd_spark.operators.bpe import bpe_train

        docs = spark.createDataFrame(
            [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
        )
        merges = bpe_train(docs, n_merges=1, min_pair_count=2)
        # pairs of 'aaaa' = (a,a)x2 + (a,a</w>): top pair is (a,a) 6x
        assert merges == [(0, "a", "a")]


class TestBpeBatchedTraining:
    """VERDICT r04 #6: batched merge selection must be BIT-IDENTICAL to
    the per-merge trainer — the truncation rule in _select_batch is a
    proof, these are its executable checks."""

    def test_batch_equals_per_merge_on_fixture(self, docs):
        """batch=8 (the default) vs batch=1 (the sequential algorithm)
        on the 500-doc fixture, past several batch rounds."""
        from gocrd_spark.operators.bpe import bpe_train

        batched = bpe_train(docs, n_merges=24, min_pair_count=2, batch=8)
        sequential = bpe_train(docs, n_merges=24, min_pair_count=2, batch=1)
        assert batched == sequential and len(batched) == 24

    def test_randomized_tiny_alphabet_forces_collisions(self, spark):
        """Random {a,b,c}-soup corpora: with 3 letters, merges rapidly
        produce strings that COLLIDE with later top pairs' concatenations
        (e.g. symbol 'ab' existing while ('a','b') re-tops via another
        decomposition) — the exactness hole _select_batch's singleton
        path exists for. Batched Spark must equal the per-merge twin on
        every seed."""
        import random
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import oracle_twins as tw

        from gocrd_spark.operators.bpe import bpe_train

        for seed in (11, 23, 47):
            rng = random.Random(seed)
            rows = [
                (
                    i,
                    " ".join(
                        "".join(
                            rng.choice("abc")
                            for _ in range(rng.randint(1, 6))
                        )
                        for _ in range(30)
                    ),
                )
                for i in range(8)
            ]
            docs = spark.createDataFrame(rows, "doc_id long, text string")
            got = bpe_train(docs, n_merges=10, min_pair_count=2, batch=4)
            want = tw.bpe_train(sorted(rows), n_merges=10, min_pair_count=2)
            assert got == want, f"seed {seed}: {got} != {want}"

    def test_select_batch_truncation_rules(self):
        """Driver-side unit checks of the selection invariants:
        - conflict truncates the prefix AND drops selected pairs whose
          count does not strictly dominate the conflict's;
        - a collision pair is only ever a singleton batch;
        - a full-table scan with no conflict keeps the whole prefix;
        - a partial scan bounds by the tail count."""
        from gocrd_spark.operators.bpe import _select_batch

        def row(a, b, n):
            return {"a": a, "b": b, "n": n}

        # conflict at n=5: (c,d) at 5 is NOT > 5 -> dropped, (a,b) kept
        rows = [row("a", "b", 9), row("c", "d", 5), row("b", "x", 5)]
        sel, stop = _select_batch(rows, 8, 2, True, set())
        assert sel == [("a", "b")] and not stop

        # same but (c,d) at 7 strictly dominates the conflict -> kept
        rows = [row("a", "b", 9), row("c", "d", 7), row("b", "x", 5)]
        sel, _ = _select_batch(rows, 8, 2, True, set())
        assert sel == [("a", "b"), ("c", "d")]

        # collision ('ab' pre-exists): singleton even with room
        rows = [row("a", "b", 9), row("c", "d", 7)]
        sel, _ = _select_batch(rows, 8, 2, True, {"ab"})
        assert sel == [("a", "b")]

        # collision ranked second: batch ends before it
        rows = [row("c", "d", 9), row("a", "b", 7), row("e", "f", 6)]
        sel, _ = _select_batch(rows, 8, 2, True, {"ab"})
        assert sel == [("c", "d")]

        # full table, disjoint: everything kept, no tail bound
        rows = [row("a", "b", 9), row("c", "d", 3), row("e", "f", 2)]
        sel, _ = _select_batch(rows, 8, 2, True, set())
        assert sel == [("a", "b"), ("c", "d"), ("e", "f")]

        # PARTIAL table (top-T of a bigger one): tail count 2 bounds —
        # (e,f) at 2 is not strictly above it -> dropped
        sel, _ = _select_batch(rows, 8, 2, False, set())
        assert sel == [("a", "b"), ("c", "d")]

        # sub-threshold rows neither select nor threaten
        rows = [row("a", "b", 9), row("c", "d", 1)]
        sel, stop = _select_batch(rows, 8, 2, False, set())
        assert sel == [("a", "b")] and not stop

        # empty / all-below-threshold -> stop training
        assert _select_batch([], 8, 2, True, set()) == ([], True)
        assert _select_batch([row("a", "b", 1)], 8, 2, True, set()) == ([], True)


class TestBpeEncode:
    def test_encode_matches_twin(self, docs):
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import oracle_twins as tw

        from gocrd_spark.operators.bpe import bpe_encode, bpe_train

        rows = sorted(
            (r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()
        )
        merges = bpe_train(docs, n_merges=8, min_pair_count=2)
        got = sorted(
            (r.doc_id, r.n_tokens, r.n_unique_tokens)
            for r in bpe_encode(docs, merges).collect()
        )
        assert got == tw.bpe_encode(rows, merges)

    def test_vocab_structure_and_twin_parity(self, spark, toy, docs):
        """Vocab = sorted alphabet at ids 0..A-1, merged tokens at
        A+rank; Spark == twin on the shared fixture."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import oracle_twins as tw

        from gocrd_spark.operators.bpe import bpe_train, bpe_vocab

        merges = bpe_train(toy, n_merges=3, min_pair_count=2)
        rows = sorted(
            (r.token_id, r.token) for r in bpe_vocab(toy, merges).collect()
        )
        alpha = [t for i, t in rows if i < len(rows) - 3]
        assert alpha == sorted(alpha)  # lexicographic id order
        merged_tail = [t for i, t in rows[-3:]]
        assert merged_tail == [a + b for _, a, b in merges]
        # ids contiguous from 0
        assert [i for i, _ in rows] == list(range(len(rows)))

        drows = sorted(
            (r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()
        )
        dmerges = bpe_train(docs, n_merges=6, min_pair_count=2)
        got = sorted(
            (r.token_id, r.token)
            for r in bpe_vocab(docs, dmerges).collect()
        )
        assert got == tw.bpe_vocab(drows, dmerges)

    def test_no_merges_is_char_count(self, spark):
        """With zero merges every word tokenizes to its characters
        (last char carrying </w>)."""
        from gocrd_spark.operators.bpe import bpe_encode

        docs = spark.createDataFrame(
            [(0, "abc de")], "doc_id long, text string"
        )
        (r,) = bpe_encode(docs, []).collect()
        # abc -> [a, b, c</w>]; de -> [d, e</w>] = 5 tokens, all unique
        assert (r.n_tokens, r.n_unique_tokens) == (5, 5)
