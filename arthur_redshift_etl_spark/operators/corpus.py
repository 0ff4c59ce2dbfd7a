"""Corpus-preparation operators for LLM training-data pipelines.

Beyond dedup/sampling (operators/dedup.py, operators/sampling.py), a
pretraining pipeline needs four more standard passes, implemented here as
pure DataFrame compositions (JVM-side, codegen'd, no Python UDFs):

- **decontamination** — drop/flag training documents that share word
  n-grams with an evaluation/benchmark set (the standard defense against
  benchmark leakage).  The eval side is small by construction, so the
  overlap join is a broadcast hash join: the big train side never
  shuffles for the join itself, only for the per-document overlap count
  (partial-agg on doc_id).
- **repetition stats** — Gopher-style repetition signals (top-bigram
  mass fraction, distinct-token ratio): excessive repetition is the
  cheapest high-precision garbage detector for web text.
- **sequence packing** — assign documents to fixed token-budget bins by
  contiguous cumulative sum, sharded so no window ever sees more than one
  shard (the 100 TB layout: shard count scales with cluster size; each
  shard's cumsum is an independent window partition).
- **domain-mix resampling** — deterministically downsample each source
  domain to a uniform target mix with hash-Bernoulli arithmetic
  (engine-reproducible, shuffle-free on the data path; only the tiny
  per-domain count aggregate shuffles, and it is broadcast back).

Reference parity: the reference has no corpus operators (it is an ELT
orchestrator); these extend the engine toward the BASELINE.json north star
(large-scale training-data preparation) on the same Relation model.

Scale notes: every operator's big-side dataflow is scan → project/explode →
(at most) one partial-aggregatable shuffle on a well-distributed key
(doc_id).  Nothing collects to the driver; small aggregates re-enter the
plan as broadcast joins.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingle_hashes
from .sampling import KNUTH, MOD


def decontaminate_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    eval_mod: int = 97,
) -> DataFrame:
    """Per-train-document count of distinct word n-grams shared with the
    eval set (here: documents whose id ≡ 0 mod ``eval_mod``).

    Returns (id, n_overlap) for contaminated documents only — output
    scales with contamination, not corpus size.  Shingles travel as 60-bit
    md5 hashes (8 bytes, not strings); the eval shingle set is broadcast.
    """
    shingle = doc_shingle_hashes(docs, id_col, text_col, n)
    is_eval = F.col(id_col) % eval_mod == 0
    eval_h = shingle.filter(is_eval).select("h").distinct()
    return (
        shingle.filter(~is_eval)
        .join(F.broadcast(eval_h), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    - ``top_bigram_frac``: share of word-bigram occurrences taken by the
      single most frequent bigram (high → templated/repeated text);
    - ``distinct_token_ratio``: |set(tokens)| / |tokens| (low → loops).

    The bigram pass is explode → count(doc, bigram) → max/sum per doc:
    two shuffles, both partial-aggregatable, both keyed on doc_id (never
    on the bigram itself, so hot bigrams cannot skew a partition).  The
    distinct-token ratio is row-local (no shuffle).
    """
    toks = F.split(F.col(text_col), " ")
    # guard: sequence(1, 0) counts DOWN in Spark — single-token docs would
    # index element 0; give them an empty bigram set instead
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
    )
    per_bigram = (
        docs.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("total_bigrams"))
    )
    row_local = docs.select(
        F.col(id_col),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("distinct_token_ratio"),
    )
    return per_bigram.join(row_local, id_col).select(
        F.col(id_col),
        (F.col("top_cnt").cast("double") / F.col("total_bigrams").cast("double")).alias(
            "top_bigram_frac"
        ),
        "distinct_token_ratio",
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Contiguous greedy packing of documents into fixed token budgets.

    Documents are concatenated in id order within a shard; bin k holds the
    tokens in [k*budget, (k+1)*budget) of the running stream (documents may
    straddle bins — the standard pretraining chunking).  A document's bin is
    where its first token lands.  Returns per-(shard, bin) accounting.

    Sharding bounds window state: each cumsum partition is corpus/shards —
    at 100 TB raise ``shards`` so a shard fits an executor's task.
    """
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    shard = (F.col(id_col) % shards).cast("long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bin = (
        docs.select(F.col(id_col), shard.alias("shard"), n_tokens.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget).cast("long"),
        )
    )
    return with_bin.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
    )


def domain_mix_resample(
    docs: DataFrame, id_col: str = "doc_id", domain_col: str = "source"
) -> DataFrame:
    """Deterministic uniform-mix resampling accounting per source domain.

    Every domain is hash-Bernoulli downsampled toward the smallest
    domain's row count: P(keep) = min_count / domain_count, decided by
    the same Knuth-hash arithmetic as sampling.split_assign so the kept
    set is engine-reproducible.  Returns (domain, n_before, n_after).

    The per-row decision is a scan-side projection; only the per-domain
    counts (|domains| rows) shuffle, then broadcast-join back.
    """
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_before"))
    min_count = counts.agg(F.min("n_before").alias("min_count"))
    rates = counts.join(F.broadcast(min_count)).withColumn(
        "rate", F.col("min_count").cast("double") / F.col("n_before").cast("double")
    )
    u = (F.col(id_col).cast("long") * F.lit(KNUTH)) % F.lit(MOD) % F.lit(1_000_000)
    kept = (
        docs.join(F.broadcast(rates.select(domain_col, "rate")), domain_col)
        .filter(u.cast("double") < F.col("rate") * 1_000_000.0)
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return counts.join(kept, domain_col, "left").select(
        F.col(domain_col),
        "n_before",
        F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
    )


def quality_funnel(
    docs: DataFrame, rules: Sequence[Tuple[str, F.Column]]
) -> DataFrame:
    """Sequential filter-funnel accounting: docs dropped by each rule given
    all previous rules passed, plus the remaining count.

    One scan, no shuffle on the data path (a single global aggregate of
    |rules| counters with map-side partial aggregation), then the tiny
    counter row is unpivoted driver-free via stack().
    """
    aggs = [F.count(F.lit(1)).alias("c0")]
    conj = None
    for i, (_, cond) in enumerate(rules, start=1):
        conj = cond if conj is None else (conj & cond)
        aggs.append(F.sum(conj.cast("long")).alias(f"c{i}"))
    counters = docs.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', c{i - 1} - c{i}, c{i}"
        for i, (name, _) in enumerate(rules, start=1)
    )
    return counters.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule_idx, rule_name, dropped, remaining)"
    ).select(
        F.col("rule_idx").cast("int"),
        "rule_name",
        F.col("dropped").cast("long"),
        F.col("remaining").cast("long"),
    )


def chunk_dedup_rebuild(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Corpus-wide chunk-level dedup with document rebuild (RefinedWeb-style
    line/chunk dedup, adapted to token windows since these documents have no
    line structure).

    Every document is cut into disjoint ``chunk_tokens``-token chunks; a
    chunk whose text already occurred anywhere in the corpus (first
    occurrence = smallest ``(doc_id, pos)``) is dropped, and each document
    is re-assembled from its surviving chunks in position order.  This is
    the pass that strips boilerplate shared across pages (headers, nav
    bars, license blurbs) while keeping one canonical copy.

    Returns ``(id, n_chunks, kept_chunks, rebuilt_md5)`` where
    ``rebuilt_md5`` is the digest of the re-assembled text (NULL when every
    chunk was dropped) — digest not text, so the result stays hashable
    against the SQL oracle without shipping full documents.

    Scale shape (100 TB): chunk rows carry an 8-byte-equivalent md5 key;
    the first-occurrence table is one partial-aggregatable ``groupBy(h)``
    (map-side combine collapses within-partition repeats), the winner join
    shuffles on the same well-spread hash key (AQE handles hot boilerplate
    chunks via skew-join split), and the rebuild is one ``groupBy(id)``
    whose state per document is bounded by the document itself.  Nothing
    touches the driver.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
    chunks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                # size(toks) >= 1 (split of any string is non-empty), so the
                # sequence is never descending
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
                ),
            )
        ).alias("pos", "chunk"),
    )
    hashed = chunks.withColumn("h", F.md5("chunk"))
    first = hashed.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    flagged = hashed.join(first, "h").withColumn(
        "is_kept",
        (F.col(f"first.{id_col}") == F.col(id_col))
        & (F.col("first.pos") == F.col("pos")),
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("is_kept"), F.struct("pos", "chunk"))
                )
            ),
            lambda s: s.chunk,
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("is_kept").cast("long")).alias("kept_chunks"),
        F.when(
            F.sum(F.col("is_kept").cast("long")) > 0, F.md5(kept_text)
        ).alias("rebuilt_md5"),
    )


def batch_by_length(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed training batches: minimize padding waste.

    Sorting by token count before slicing into fixed-count batches puts
    similar-length documents together, so each batch pads to roughly its
    own length instead of the corpus maximum — the standard dynamic-
    batching trick.  The global order comes from the distributed two-phase
    rank (``identity.global_row_number``: range repartition + metadata
    prefix sum — no single-task sort), batch id is integer division, and
    the per-batch accounting (padding = n_docs·max_tokens − sum_tokens)
    is one partial-aggregatable groupBy on a dense integer key.
    """
    from .identity import global_row_number

    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    sized = docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
    ranked, _total = global_row_number(
        sized, ["n_tokens", id_col], row_number_column="__grn"
    )
    return (
        ranked.withColumn(
            "batch_id", F.expr(f"(__grn - 1) div {batch_size}").cast("long")
        )
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "padding_waste",
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")).cast(
                "long"
            ),
        )
    )


def decontaminate_semantic(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.30,
) -> DataFrame:
    """Train docs embedding-similar to ANY eval doc (cross-set contamination).

    The semantic complement to the exact n-gram ``decontaminate_overlap``:
    paraphrased eval leakage survives n-gram checks but not embedding
    similarity.  Eval sets are benchmark-sized (thousands), so the
    normalized eval vectors broadcast and the whole check is a map-only
    scored scan of train — no shuffle grows with the corpus; output (train
    id, n_eval_hits, max_sim) scales with contamination.  Exact — every
    (train, eval) pair is scored; the broadcast side is the small one by
    construction, which is what makes exactness affordable here when it
    is not for corpus-vs-corpus dedup.
    """
    from .similarity import dot, normalized

    tr = normalized(train, id_col, "train_id", vec_col, "tv")
    ev = normalized(eval_set, id_col, "eval_id", vec_col, "ev")
    return (
        tr.join(F.broadcast(ev))
        .select(
            "train_id",
            F.col("eval_id"),
            dot(F.col("tv"), F.col("ev")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("sim").alias("max_sim"),
        )
    )
