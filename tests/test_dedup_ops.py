"""Unit tests for the dedup operator family (reference has no analogue —
these are the north-star scale operators; see COVERAGE.md).

The key property for ``ngram_jaccard_join``: prefix filtering is EXACT —
identical pairs to brute-force Jaccard over all document pairs.
"""

import itertools

import pytest

from arthur_redshift_etl_spark.operators import dedup as dd


def brute_force_jaccard(docs, n=3, threshold=0.5):
    """All-pairs shingle Jaccard in plain Python."""
    def shingles(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {doc_id: shingles(text) for doc_id, text in docs}
    out = {}
    for (ida, sa), (idb, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out[(ida, idb)] = j
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
    (4, "completely different text with no overlap whatsoever here at all"),
    (5, "another unrelated document about spark dataframes and shuffles"),
    (6, "the quick brown fox naps under the lazy dog today somehow"),  # partial
    (7, "a b c"),  # single shingle
    (8, "a b c"),  # its duplicate
]


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_ngram_jaccard_join_matches_brute_force(spark, threshold):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(df, threshold=threshold).collect()
    }
    want = brute_force_jaccard(CORPUS, threshold=threshold)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, abs=1e-12)


def test_ngram_jaccard_prefix_prunes_common_shingles(spark):
    """Documents sharing only a very common shingle (below threshold) must
    not survive; rare-shingle near-dups must."""
    docs = [(i, f"common shingle here unique{i} word{i} tail{i}") for i in range(20)]
    docs.append((100, "rare alpha beta gamma delta epsilon"))
    docs.append((101, "rare alpha beta gamma delta zeta"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in dd.ngram_jaccard_join(df, threshold=0.5).collect()}
    assert got == {(100, 101)}
