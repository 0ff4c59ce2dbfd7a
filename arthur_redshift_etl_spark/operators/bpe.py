"""Distributed BPE merge learning (Sennrich et al. 2016, ACL).

The classic byte-pair-encoding vocabulary learner, restructured for Spark's
execution model.  The key scalability property comes from the algorithm
itself: BPE statistics are a function of the WORD-FREQUENCY table, not the
corpus — so the corpus is scanned exactly once (one partial-aggregatable
groupBy into ``(word, count)``), and every merge iteration runs over the
vocabulary table, which is orders of magnitude smaller (distinct words vs
total tokens; at 100 TB: ~10^7 rows vs ~10^13).

Per iteration:

- adjacent symbol pairs come from ``arrays_zip`` over shifted ``slice``s
  (JVM, codegen — the same anti-quadratic shape as dedup shingling);
- pair counts are a partial-aggregatable groupBy weighted by word count;
- the argmax is ``orderBy(count desc, pair asc).limit(1)`` — ONE row to
  the driver per iteration (metadata, same class as k-means' convergence
  scalar; inherent to any iterative fixpoint);
- the merge is applied to the vocabulary's symbol arrays in an
  Arrow-batched ``mapInPandas`` (adjacent-pair rewriting is inherently
  sequential per word — the declared Python-batch exception), and the new
  vocabulary is localCheckpoint'd (constant-size plans); superseded
  checkpoints are released via reference-drop + ContextCleaner, with a
  periodic Python GC so py4j hands the references back promptly.

Ties break by (count desc, left asc, right asc) so the merge sequence is
deterministic and reproducible by a single-node reference implementation
(exact-equality tested).

No reference analog (reference is an ETL orchestrator); built from the
public BPE paper as part of the training-data pipeline surface.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequency_table(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """One corpus scan → (word, cnt).  The only pass that touches the data."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    w = F.explode(F.split(txt, r"\s+")).alias("w")
    return (
        docs.select(w)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word_col: str) -> F.Column:
    """word → [c1, c2, ..., cn, </w>] without split-by-empty edge cases."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(F.col(word_col))),
        lambda i: F.col(word_col).substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency — one groupBy."""
    n = F.size(F.col("syms"))
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, n - 1).alias("a"),
        F.slice(F.col("syms"), 2, n - 1).alias("b"),
    )
    return (
        vocab.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), F.col("cnt"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite adjacent (left, right) → left+right in every symbol array.

    Sequential within a word (a merge consumes its right neighbor, so the
    scan position after a merge depends on the previous decision) — the
    one genuinely non-relational step, Arrow-batched.
    """
    merged = left + right

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                s = list(syms)
                res: List[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out_syms.append(res)
            yield pd.DataFrame({"syms": out_syms, "cnt": pdf["cnt"]})

    return vocab.mapInPandas(run, "syms array<string>, cnt bigint")


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
    lowercase: bool = True,
) -> List[Tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges; returns [(left, right, pair_count)].

    Stops early when the best remaining pair falls under ``min_count``.
    """
    spark = docs.sparkSession
    vocab = word_frequency_table(docs, text_col, lowercase).select(
        _initial_symbols("w").alias("syms"), F.col("cnt")
    )
    # Iterative loops on growing lineage are quadratic in Catalyst analysis
    # time (cache truncates execution, NOT the logical plan) —
    # localCheckpoint truncates both, so each iteration plans a constant-
    # size job.  Checkpoint FIRST, then count the checkpointed blocks: the
    # reverse order would run the corpus-sized word-frequency groupBy twice
    # (once for the count, once recomputed by the eager checkpoint),
    # breaking the one-corpus-scan contract in the module docstring.
    # Partition count is then sized to the VOCAB (typically orders of
    # magnitude below the corpus): tiny vocabularies would otherwise pay
    # shuffle-partitions × task overhead per iteration for rows that fit
    # in one task.  (localCheckpoint state is executor-local; an iterative
    # fixpoint restarts from scratch on executor loss, which is the right
    # trade for ephemeral loop state.)
    vocab = vocab.localCheckpoint()
    n_vocab = vocab.count()  # vocab-sized job over checkpointed blocks
    parts = max(1, min(spark.sparkContext.defaultParallelism, n_vocab // 65536 + 1))
    # The checkpoint's partition count is whatever the (possibly
    # AQE-coalesced) word-frequency groupBy produced — comparing against
    # the session's static shuffle width would MISS the coalesced case
    # (AQE packs a big vocab into 4 partitions, every merge iteration then
    # runs 4-wide on a 32-core box).  Read the real count from the JVM-side
    # RDD handle of the already-materialized checkpoint blocks — unlike the
    # Python ``df.rdd`` property this builds no Python-serialization
    # lineage — and resize only on actual mismatch.
    actual = vocab._jdf.rdd().getNumPartitions()
    if actual != parts:
        vocab = vocab.repartition(parts).localCheckpoint()
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_count:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pair_count"])
        merges.append((a, b, pc))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
        # Superseded checkpoints are freed by Spark's ContextCleaner once
        # their reference is dropped (the reassignment above) — there is no
        # public API to free localCheckpoint blocks eagerly.  Collect the
        # Python side periodically so py4j releases the JVM references
        # promptly on long merge runs instead of letting n_merges vocab
        # copies await interpreter GC in executor storage.
        if len(merges) % 32 == 0:
            import gc

            gc.collect()
    return merges


def merges_as_dataframe(spark, merges: List[Tuple[str, str, int]]) -> DataFrame:
    rows = [(i, a, b, a + b, pc) for i, (a, b, pc) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count long"
    )


def encode_tokens(
    docs: DataFrame,
    merges: List[Tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize with a learned merge table → (id, n_words, n_tokens).

    The encode half of BPE: each word starts as chars+``</w>`` and the
    merge rules are applied in learned rank order (the standard greedy
    encode).  The merge list is closure-captured (it is vocabulary
    metadata, a few thousand pairs at most) and the whole step is one
    Arrow-batched map — no shuffle, embarrassingly parallel over
    documents, so it scales exactly like any map-only scan.  Token counts
    feed the batching/packing operators; the join-of-symbols invariant
    (merges only concatenate adjacent symbols) makes the output
    round-trip checkable.
    """
    rules = [(a, b, a + b) for a, b, _ in merges]
    # Tokenize with the SAME word boundaries the learner used: Java's \s+
    # (word_frequency_table) is ASCII-only, while Python's str.split()
    # splits on all Unicode whitespace — a document containing U+00A0
    # would otherwise be counted against a vocabulary learned from
    # different words.
    import re

    ws_re = re.compile(r"[ \t\r\n\x0b\x0c]+")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def encode_word(word: str) -> int:
            syms = list(word) + [END]
            for a, b, m in rules:
                i, res = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(m)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            return len(syms)

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf[text_col]:
                ws = [w for w in ws_re.split(text or "") if w]
                if lowercase:
                    ws = [w.lower() for w in ws]
                n_words.append(len(ws))
                n_tokens.append(sum(encode_word(w) for w in ws))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_words": n_words, "n_tokens": n_tokens}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_words long, n_tokens long"
    )
