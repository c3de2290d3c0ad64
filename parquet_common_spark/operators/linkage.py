"""Fuzzy record linkage (entity resolution): multi-pass blocking +
Jaro-Winkler scoring — the approximate-match arm of the dedup family
(exact/MinHash/SimHash live in operators/dedup.py).

Scale posture: candidate generation is a UNION of self-equi-joins on
BLOCKING KEYS, never an all-pairs comparison — the per-block pair count
is Σ|block|², bounded by the blocking-key design (an explicit data
contract, the standard ER posture; multi-pass union buys recall without
widening any single block) and — when ``max_block_rows`` is set —
enforced at runtime by a per-pass block-size prefilter that drops
degenerate blocks before the self-join.  Duplicate candidates across passes
collapse with one distinct on the (id, id) pair BEFORE scoring, so each
pair is scored once.  Scoring is a map-only Arrow-batched pandas UDF
over the joined pairs; skewed blocks are ordinary hot equi-keys (AQE).

The similarity is the CLASSIC Jaro-Winkler (match window
max(l1,l2)//2-1, transpositions = mismatches//2, Winkler prefix boost
p=0.1 over prefixes ≤ 4 applied above the 0.7 boost threshold) —
pinned against DuckDB's independent `jaro_winkler_similarity`
implementation by a randomized differential in tests AND by the gr/er
registry oracle, a true cross-engine check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def jaro_similarity(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m2 = [False] * l2
    matched1 = []
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m2[j] = True
                matched1.append(i)
                break
    m = len(matched1)
    if m == 0:
        return 0.0
    seq2 = [s2[j] for j in range(l2) if m2[j]]
    mismatches = sum(1 for i, c2 in zip(matched1, seq2) if s1[i] != c2)
    t = mismatches // 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    j = jaro_similarity(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def _jaro_winkler_udf():
    # created lazily: pandas_udf needs an active SparkSession
    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    return jw


def blocked_linkage(
    df: DataFrame,
    id_col: str,
    name_col: str,
    blocking: list[list[str]],
    threshold: float,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Candidate pairs from every blocking pass, deduplicated, scored,
    filtered to ``round(sim, 6) >= threshold``.  Returns
    ``(id_1, id_2, name_1, name_2, sim)`` with ``id_1 < id_2``.

    ``max_block_rows`` is the degenerate-block flood guard (the
    ``band_cap``/``max_doc_freq`` pattern from operators/dedup.py): the
    pair count is Σ|block|² per pass, so one mis-chosen blocking key —
    a fixed-cardinality column at 100 TB, an empty-string key covering
    half the corpus — silently turns the self-join quadratic.  With a
    cap set, each pass first counts rows per blocking-key tuple (one
    (keys, count) groupBy — never names) and DROPS blocks larger than
    the cap before the self-join, bounding per-block fan-out at cap².
    Recall posture is the standard ER one: a pair lost to a flooded
    block is recovered by a LATER, more selective pass — never by
    widening the block.  ``None`` (default) keeps exact semantics.
    """
    left = df.select(
        F.col(id_col).alias("id_1"),
        F.col(name_col).alias("name_1"),
        *{c for pass_ in blocking for c in pass_},
    )
    right = df.select(
        F.col(id_col).alias("id_2"),
        F.col(name_col).alias("name_2"),
        *{c for pass_ in blocking for c in pass_},
    )
    cand = None
    for keys in blocking:
        l_pass, r_pass = left, right
        if max_block_rows is not None:
            ok = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_blk_rows"))
                .where(F.col("_blk_rows") <= max_block_rows)
                .select(*keys)
            )
            l_pass = left.join(ok, on=list(keys), how="inner")
            r_pass = right.join(ok, on=list(keys), how="inner")
        pairs = l_pass.join(r_pass, on=list(keys), how="inner").where(
            F.col("id_1") < F.col("id_2")
        ).select("id_1", "id_2", "name_1", "name_2")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()  # score each pair once across passes
    scored = cand.withColumn(
        "sim", F.round(_jaro_winkler_udf()(F.col("name_1"), F.col("name_2")), 6)
    )
    return scored.where(F.col("sim") >= F.lit(threshold))
