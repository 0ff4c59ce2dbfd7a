"""Independent-implementation parity for the round-4 catalog additions.

The DuckDB oracles already pin engine-vs-engine equality; these tests pin
the ALGORITHMS against a third implementation (numpy for the PCA
fixed-point recurrence, pure Python for the bigram LM) so an error shared
by both SQL formulations can't hide.
"""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from arthur_redshift_etl_spark.workload import REGISTRY

SF = "/root/testdata/sf0.001"


def test_pca_power_iteration_matches_numpy_fixed_point(spark):
    out = {
        r["dim"]: r["component"]
        for r in REGISTRY["pca_power_iteration"].fn(spark, SF).collect()
    }
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(x * 10000).astype(np.int64)
    dot0 = q.sum(axis=1)  # exact int64
    s1 = (q * dot0[:, None]).sum(axis=0)  # exact int64
    v1 = s1.astype(np.float64) / math.sqrt(float((s1.astype(np.float64) ** 2).sum()))
    dot1 = np.floor(q.astype(np.float64) @ v1).astype(np.int64)
    s2 = (q * dot1[:, None]).sum(axis=0)  # exact int64
    v2 = s2.astype(np.float64) / math.sqrt(float((s2.astype(np.float64) ** 2).sum()))

    assert sorted(out) == list(range(x.shape[1]))
    for j, want in enumerate(v2):
        assert out[j] == pytest.approx(want, abs=1e-12), (j, out[j], want)
    # the result is a unit vector
    assert sum(v * v for v in out.values()) == pytest.approx(1.0, abs=1e-9)
    # power iteration monotonically increases the Rayleigh quotient of the
    # (uncentered) second-moment matrix — the property that holds even on
    # this data's near-flat spectrum, where absolute alignment with the top
    # eigenvector after two iterations is legitimately small
    g = x.T @ x
    spark_v = np.array([out[j] for j in range(x.shape[1])])
    start = np.ones(x.shape[1]) / math.sqrt(x.shape[1])
    assert float(spark_v @ g @ spark_v) > float(start @ g @ start)


def test_doc_lm_crossentropy_matches_pure_python(spark):
    out = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in REGISTRY["doc_lm_crossentropy"].fn(spark, SF).collect()
    }
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    token_lists = {
        int(d): t.split(" ") for d, t in zip(docs["doc_id"], docs["text"])
    }
    c2, c1 = {}, {}
    for toks in token_lists.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    vsz = len({b for (_, b) in c2})
    for doc_id, toks in token_lists.items():
        if len(toks) < 2:
            assert doc_id not in out
            continue
        n = len(toks) - 1
        ce = -sum(
            math.log((c2[(a, b)] + 1) / (c1[a] + vsz))
            for a, b in zip(toks, toks[1:])
        ) / n
        got_n, got_ce = out[doc_id]
        assert got_n == n, doc_id
        assert got_ce == pytest.approx(ce, rel=1e-12), doc_id
    assert len(out) == sum(1 for t in token_lists.values() if len(t) >= 2)
    # smoothing keeps every probability < 1, so cross-entropy is positive
    assert all(ce > 0 for _, ce in out.values())
