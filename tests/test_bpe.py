"""Distributed BPE merge learning vs a single-node reference implementation.

The reference implements Sennrich et al. 2016 directly on the collected
word-frequency dict (the paper's own formulation); the distributed learner
must reproduce the EXACT merge sequence, tie-breaks included.
"""

from collections import Counter

from pyspark.sql import functions as F

from arthur_redshift_etl_spark.operators import bpe

SF = "/root/testdata/sf0.001"


def reference_bpe(word_counts, n_merges, min_count=2):
    vocab = {tuple(list(w) + [bpe.END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties by lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), pc = best
        if pc < min_count:
            break
        merges.append((a, b, pc))
        new_vocab = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_exactly(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = bpe.learn_bpe_merges(docs, n_merges=12)
    wc = {
        r["w"]: r["cnt"]
        for r in bpe.word_frequency_table(docs).collect()
    }
    want = reference_bpe(wc, n_merges=12)
    assert got == want
    assert len(got) == 12
    # merge counts are non-increasing only in the greedy sense per step on
    # its own table, but every recorded pair_count must be >= min_count
    assert all(pc >= 2 for _, _, pc in got)


def test_bpe_early_stop_and_determinism(spark):
    tiny = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab cd")], "doc_id long, text string"
    )
    got = bpe.learn_bpe_merges(tiny, n_merges=50, min_count=2)
    wc = {r["w"]: r["cnt"] for r in bpe.word_frequency_table(tiny).collect()}
    want = reference_bpe(wc, n_merges=50)
    assert got == want
    # 'a'+'b' is the clear first merge (4 occurrences)
    assert got[0][:2] == ("a", "b") and got[0][2] == 4
    # rerun gives the identical sequence (tie-break determinism)
    assert bpe.learn_bpe_merges(tiny, n_merges=50, min_count=2) == got


def test_bpe_encode_round_trip_and_reference_parity(spark):
    """encode_tokens: token counts equal the reference encoder's, and the
    symbol-join invariant holds (merges only concatenate, so total chars
    are preserved — n_tokens decreases monotonically with more merges)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe.learn_bpe_merges(docs, n_merges=8)

    def ref_encode_word(word, rules):
        syms = list(word) + [bpe.END]
        for a, b, m in rules:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    rules = [(a, b, a + b) for a, b, _ in merges]
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe.encode_tokens(docs, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in texts.items():
        ws = [w.lower() for w in text.split() if w]
        want = (len(ws), sum(ref_encode_word(w, rules) for w in ws))
        assert got[doc_id] == want, doc_id

    # more merges => never more tokens
    fewer = {r["doc_id"]: r["n_tokens"]
             for r in bpe.encode_tokens(docs, merges[:3]).collect()}
    assert all(got[d][1] <= fewer[d] for d in got)


def test_encode_word_boundaries_match_learner_on_unicode_whitespace(spark):
    """U+00A0 is NOT a word boundary for the learner (Java \\s is ASCII);
    encode must agree, or token counts are measured against a vocabulary
    learned from different words."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab"), (2, "ab ab")], "doc_id long, text string"
    )
    wc = {r["w"]: r["cnt"] for r in bpe.word_frequency_table(docs).collect()}
    assert wc == {"ab ab": 2, "ab": 2}  # learner keeps nbsp-joined word
    merges = bpe.learn_bpe_merges(docs, n_merges=2)
    got = {r["doc_id"]: r["n_words"] for r in bpe.encode_tokens(docs, merges).collect()}
    assert got == {1: 2, 2: 2}  # encode splits identically: 2 words each
