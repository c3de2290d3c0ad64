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


def entity_linkage(
    df: DataFrame,
    name_col: str,
    blocking: list[list[str]],
    threshold: float,
) -> DataFrame:
    """Aggregate-then-link: entity-level record linkage whose output and
    compute are LINEAR in the record count even when exact duplicates
    dominate the corpus.

    ``blocked_linkage`` materializes record-level candidate pairs, so on
    a corpus where many records share one name (web crawls: boilerplate
    titles; here: the driver's `part` table has 64 distinct names at
    EVERY scale factor) both the candidate set and the RESULT SET are
    Θ(n²/k) — no blocking-key choice can fix that, because the quadratic
    lives in the output contract, not the plan (measured r12: 84M →
    8.4B candidates across sf1→sf10).  The scalable formulation keeps
    the exact same match semantics but reports them at the entity
    level: each qualifying record pair depends only on the two rows'
    (name, blocking-keys) equivalence classes, so

        1. collapse records to per-(blocking-keys…, name) counts —
           ONE scan of ``df``, the only n-proportional work; every
           coarser pass grouping re-aggregates this tiny frame;
        2. count qualifying record pairs per unordered distinct NAME
           pair by inclusion–exclusion over the pass subsets (a pair is
           in the union of passes; |A∪B| = |A|+|B|−|A∩B|, generalized):
           within a subset's blocks, cross-name pairs contribute
           c_a·c_b and same-name pairs c·(c−1)/2;
        3. score ONLY the distinct name pairs (bounded by the entity
           vocabulary, not the corpus) with Jaro-Winkler and threshold.

    Returns ``(name_1, name_2, sim, n_pairs)`` with ``name_1 <= name_2``
    (equal only for same-name entity pairs) — the exact aggregation of
    ``blocked_linkage``'s record pairs by unordered name pair (pinned by
    tests/test_operators.py::test_entity_linkage_matches_blocked).
    All joins are on per-block entity frames Catalyst auto-broadcasts;
    nothing record-proportional ever shuffles.
    """
    from functools import reduce
    from itertools import combinations

    if not 1 <= len(blocking) <= 4:
        raise ValueError("entity_linkage supports 1-4 blocking passes")
    all_keys = sorted({c for pass_ in blocking for c in pass_})
    base = (
        df.groupBy(*all_keys, F.col(name_col).alias("_nm"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    terms: list[DataFrame] = []
    for k in range(1, len(blocking) + 1):
        sign = 1 if k % 2 == 1 else -1
        for combo in combinations(range(len(blocking)), k):
            keys = sorted({c for i in combo for c in blocking[i]})
            g = base.groupBy(*keys, "_nm").agg(F.sum("_c").alias("_c"))
            a = g.select(
                *keys, F.col("_nm").alias("name_1"), F.col("_c").alias("_ca")
            )
            b = g.select(
                *keys, F.col("_nm").alias("name_2"), F.col("_c").alias("_cb")
            )
            cross = (
                a.join(b, on=keys)
                .where(F.col("name_1") < F.col("name_2"))
                .select(
                    "name_1",
                    "name_2",
                    (F.lit(sign) * F.col("_ca") * F.col("_cb")).alias("_np"),
                )
            )
            same = g.select(
                F.col("_nm").alias("name_1"),
                F.col("_nm").alias("name_2"),
                (F.lit(sign) * F.expr("_c * (_c - 1) DIV 2")).alias("_np"),
            )
            terms += [cross, same]
    signed = reduce(lambda x, y: x.unionByName(y), terms)
    tot = (
        signed.groupBy("name_1", "name_2")
        .agg(F.sum("_np").cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") > 0)
    )
    jw = _jaro_winkler_udf()
    return (
        tot.withColumn("sim", F.round(jw(F.col("name_1"), F.col("name_2")), 6))
        .where(F.col("sim") >= F.lit(threshold))
        .select("name_1", "name_2", "sim", "n_pairs")
    )
