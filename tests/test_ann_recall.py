"""ANN quality gates at sf0.1 (VERDICT r5 ask #6): recall@5 of the
approximate searchers against the sim1 brute-force baseline, with
pinned floors.

The sf0.1 embeddings are RANDOM vectors (measured: top-5 neighbour
cosine ~0.37, random-pair ~0.0, label uncorrelated with cosine), which
bounds what hyperplane LSH can honestly achieve: reaching 0.9 recall on
unstructured data requires candidate sets approaching the whole corpus
(1-(1-p^b)^T with per-bit p≈0.62 forces T≈40 at b=6 and ~60% random
collisions).  So the floors are split by what each searcher claims:

  - IVF (the scale path, probe-bounded): pinned ≥0.9 at nprobe=12/16
    cells, refined and unrefined — high recall on ANY data because the
    probed fraction is explicit.
  - LSH on the random sf0.1 corpus: pinned at its measured deterministic
    floor, plus a monotonicity pin (more tables/fewer bits ⇒ recall up).
  - LSH on a CLUSTERED corpus (100 tight clusters, within-cluster
    cosine ~0.9 — the data LSH is actually for): default config pinned
    ≥0.9 recall@5.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_common_spark.operators import similarity as SIM

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF01}/embeddings.parquet"), reason="sf0.1 testdata absent"
)


@pytest.fixture(scope="module")
def sf01_emb(spark):
    return spark.read.parquet(f"{SF01}/embeddings.parquet")


@pytest.fixture(scope="module")
def sf01_exact(spark, sf01_emb):
    queries = sf01_emb.where(F.col("vec_id") < 20)
    rows = SIM.brute_force_topk(sf01_emb, queries, k=5).collect()
    return queries, {(r["query_id"], r["neighbor_id"]) for r in rows}


def _recall(rows, exact_set):
    s = {(r["query_id"], r["neighbor_id"]) for r in rows}
    return len(s & exact_set) / len(exact_set)


def test_ivf_recall_gate_sf01(sf01_emb, sf01_exact):
    """IVF probing 12/16 cells: ≥0.9 recall@5 (measured 0.95,
    deterministic centroid sample)."""
    queries, exact_set = sf01_exact
    got = SIM.ivf_topk(sf01_emb, queries, k=5, n_centroids=16, nprobe=12).collect()
    r = _recall(got, exact_set)
    assert r >= 0.9, f"IVF recall@5 {r} < 0.9"


def test_ivf_refined_recall_gate_sf01(spark, sf01_emb, sf01_exact):
    """One Lloyd sweep then search: recall must stay high (measured
    0.94; the floor allows float-summation-order wobble in the
    refinement, which is deterministic only up to association order)."""
    queries, exact_set = sf01_exact
    cents = SIM.sample_centroids(sf01_emb, "vec_id", "embedding", 16)
    refined = SIM.refine_centroids(sf01_emb, cents, sweeps=1)
    got = SIM.ivf_topk(sf01_emb, queries, k=5, nprobe=12, centroids=refined).collect()
    r = _recall(got, exact_set)
    assert r >= 0.85, f"refined-IVF recall@5 {r} < 0.85"


def test_lsh_recall_floor_and_knob_sf01(sf01_emb, sf01_exact):
    """LSH on the random corpus: the default (8x6) config's recall is
    deterministic — pin its floor — and widening tables / narrowing bits
    must raise recall (the documented trade: candidate volume up)."""
    queries, exact_set = sf01_exact
    default = SIM.lsh_topk(sf01_emb, queries, k=5).collect()
    r_default = _recall(default, exact_set)
    assert r_default >= 0.25, f"default LSH recall@5 collapsed: {r_default}"
    wide = SIM.lsh_topk(sf01_emb, queries, k=5, n_tables=24, n_bits=5).collect()
    r_wide = _recall(wide, exact_set)
    assert r_wide >= 0.6, f"24x5 LSH recall@5 {r_wide} < 0.6"
    assert r_wide > r_default


def test_lsh_recall_gate_clustered(spark):
    """On data with real neighbourhood structure (100 clusters of 20,
    within-cluster cosine ~0.9), the DEFAULT LSH config clears 0.9
    recall@5 (measured 0.93, deterministic seed)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(100, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in centers:
        for _ in range(20):
            v = c + 0.04 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v], 0))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact_set = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }
    got = SIM.lsh_topk(emb, queries, k=5).collect()
    r = _recall(got, exact_set)
    assert r >= 0.9, f"clustered LSH recall@5 {r} < 0.9"


def _clustered_corpus(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(100, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in centers:
        for _ in range(20):
            v = c + 0.04 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v], 0))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_pq_cluster_precision_and_rerank(spark):
    """PQ with untrained (sampled) codebooks preserves CLUSTER-level
    structure under 8x compression — all retrieved neighbours come from
    the query's true cluster (measured 0.99-1.0) — but ties within a
    cluster, so exact recall needs the standard ADC-shortlist + true-
    vector re-rank, which restores ≥0.9 recall@5 (measured 1.0)."""
    emb = _clustered_corpus(spark)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    got = SIM.pq_topk(emb, queries, k=5, n_codes=64).collect()
    same = sum(1 for r in got if r["neighbor_id"] // 20 == r["query_id"] // 20)
    assert same / len(got) >= 0.95, f"cluster precision {same/len(got)}"

    exact_set = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }
    rr = SIM.pq_topk(emb, queries, k=5, n_codes=64, rerank=40).collect()
    r = _recall(rr, exact_set)
    assert r >= 0.9, f"PQ+rerank recall@5 {r} < 0.9"
