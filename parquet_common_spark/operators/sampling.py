"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent on partitioning (Bernoulli per partition
with a per-partition RNG), so the same seed gives DIFFERENT rows when the
partition layout changes — useless for reproducible dataset curation at
scale, where partitioning is an execution detail.  These operators sample
on a HASH of the row key instead: the decision is a pure function of the
data, so results are identical across partitionings, engines, cluster
sizes, and reruns — and therefore oracle-checkable.

Hash: the same Knuth-multiplicative BIGINT mix the IVF sampler uses
(`(key*2654435761 + 40503) % 999999937` — plain int64 arithmetic, no
overflow for keys < ~3.4e9, expressible in any engine).  For string keys,
the cross-engine polynomial char hash (operators/text.py) feeds the mix.

  - sample_fraction: keep rows whose mix lands below fraction*M — a
    fixed-rate Bernoulli sample that is deterministic per key.  Map-only:
    no shuffle, prunes at full scan speed, composes with pushdown.
  - stratified_fixed: exactly k rows per stratum, chosen as the k
    smallest mix values (a deterministic reservoir): one shuffle on the
    stratum key, per-partition top-k heaps before the exchange
    (rank-over-window; Catalyst plans partial TakeOrdered per partition
    when followed by the filter).

At 100 TB: sample_fraction is embarrassingly parallel; stratified_fixed
shuffles only (stratum, mix, key) triples — project before sampling when
the payload is wide, then semi-join back on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

MIX_MULT = 2_654_435_761
MIX_ADD = 40_503
MIX_MOD = 999_999_937


def key_mix(key: Column) -> Column:
    """Deterministic pseudo-uniform BIGINT in [0, MIX_MOD) from an
    integer key column."""
    return (key.cast("long") * F.lit(MIX_MULT) + F.lit(MIX_ADD)) % F.lit(MIX_MOD)


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep rows with mix(key) < fraction * MIX_MOD.  Deterministic,
    partition-independent, map-only."""
    threshold = int(fraction * MIX_MOD)
    return df.where(key_mix(F.col(key_col)) < F.lit(threshold))


def stratified_fixed(
    df: DataFrame, strata_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest
    mix(key) values, key ascending as the (measure-zero) tie-break."""
    w = Window.partitionBy(*strata_cols).orderBy(
        key_mix(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_srk", F.row_number().over(w))
        .where(F.col("_srk") <= k)
        .drop("_srk")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weight_of_domain,
    budget: int,
) -> DataFrame:
    """Domain-mixture sampling: draw a deterministic sample whose domain
    proportions approach target weights under a total row ``budget``
    (the "data mixing" step of training-set assembly).

    ``weight_of_domain`` maps the domain Column to an INTEGER weight
    expression (a pure function of the domain value, so both engines
    can recompute it).  Domain d with n_d rows gets keep-rate
    ``min(1, (w_d * budget) / (sum_w * n_d))`` — proportional
    allocation, capped at taking the whole domain; rows are kept by the
    partition-independent mix(key) threshold, so the sample is a
    deterministic subset (and a SUPERSET relation holds across growing
    budgets: larger budget == strictly more of the same rows).

    The rate arithmetic is integer-products-then-ONE-division, so Spark
    and the oracle agree bitwise on the threshold.

    Plan shape at 100 TB: one low-cardinality groupBy (map-side
    combined) to count domains, a scalar total, a broadcast of the tiny
    rates frame, then a map-only filter over the full corpus — the
    corpus itself never shuffles.

    Returns the sampled rows with a ``_rate`` column attached (callers
    drop or round it).
    """
    per = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    per = per.withColumn("_w", weight_of_domain(F.col(domain_col)).cast("long"))
    tot = per.agg(F.sum("_w").alias("_sw"))
    rates = per.crossJoin(F.broadcast(tot)).select(
        domain_col,
        F.least(
            F.lit(1.0),
            (F.col("_w") * F.lit(int(budget))).cast("double")
            / (F.col("_sw") * F.col("_n")).cast("double"),
        ).alias("_rate"),
    )
    joined = df.join(F.broadcast(rates), on=domain_col)
    return joined.where(
        key_mix(F.col(key_col))
        < F.floor(F.col("_rate") * F.lit(MIX_MOD)).cast("long")
    )


def shuffle_order(
    df: DataFrame, key_col: str, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    pseudo-random but REPRODUCIBLE position given by ``mix(key + seed)``
    (ties broken by the key itself), and the output is globally sorted
    by that position.

    ``df.orderBy(rand(seed))`` is partition-layout-dependent (same
    problem as ``sample()`` above); hashing the key makes the epoch
    order a pure function of (data, seed) — rerunning the epoch, or
    running it on a different cluster size, yields byte-identical
    shard contents.  Different seeds give independent epoch orders.

    Scale shape: one range exchange (Spark samples the mix column to
    pick balanced boundaries) followed by a per-partition sort — the
    standard distributed total-order plan, no single-task collapse.
    Writers consume it with ``df.write`` per partition; downstream
    pack/batch operators see a stable order.
    """
    pos = key_mix(F.col(key_col) + F.lit(int(seed)))
    out = df.withColumn("_pos", pos)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "_pos", key_col)
        return out.sortWithinPartitions("_pos", key_col)
    return out.orderBy("_pos", key_col)

def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    budget: int,
    weight_scale: int = 1000,
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/XLM-R upsampling
    rule, alpha = 0.5): domain d is drawn with probability
    ``p_d ∝ n_d^alpha``, so low-resource domains are boosted relative
    to proportional sampling while huge domains are tempered.

    Unlike :func:`mixture_sample` (explicit target weights), the weight
    here is a function of the OBSERVED domain size: ``w_d =
    floor(sqrt(n_d) * weight_scale)`` — sqrt is the alpha=0.5
    temperature, quantized to an integer so the weight total is exact
    integer arithmetic in any engine (IEEE sqrt is correctly rounded,
    so both sides compute the identical double before the floor).
    Keep-rate then follows the proportional-allocation form
    ``min(1, w_d * budget / (sum_w * n_d))`` with integer products and
    ONE division — bitwise reproducible, and monotone in budget
    (larger budget keeps a superset of rows).

    Plan at 100 TB: one low-cardinality map-side-combined groupBy for
    the counts, a broadcast of the tiny rates frame, then a map-only
    hash-threshold filter — the corpus never shuffles.
    """
    per = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    per = per.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n")) * F.lit(int(weight_scale))).cast("long")
    )
    tot = per.agg(F.sum("_w").alias("_sw"))
    rates = per.crossJoin(F.broadcast(tot)).select(
        domain_col,
        F.least(
            F.lit(1.0),
            (F.col("_w") * F.lit(int(budget))).cast("double")
            / (F.col("_sw") * F.col("_n")).cast("double"),
        ).alias("_rate"),
    )
    joined = df.join(F.broadcast(rates), on=domain_col)
    return joined.where(
        key_mix(F.col(key_col))
        < F.floor(F.col("_rate") * F.lit(MIX_MOD)).cast("long")
    )


def split_psi(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    train_frac: float = 0.8,
) -> DataFrame:
    """Population Stability Index between a deterministic train/val
    split: the standard drift check that a hash-split did not skew the
    domain mixture (run before training; PSI > 0.2 on any domain is the
    classic "investigate" threshold).

    The split is the same partition-independent ``mix(key) <
    train_frac * M`` rule as :func:`sample_fraction`, so the report is
    reproducible anywhere.  Smoothing: add-half on counts with the
    domain cardinality in the denominator (``p = (2n+1) / (2N+S)``),
    which keeps every probability positive when a domain misses one
    side AND keeps the arithmetic engine-exact: every product and
    division is a single pinned-order IEEE double op, so both engines
    take ``ln`` of the identical double.  (The cross products are
    computed in DOUBLES, not int64 — ``(2n+1)*(2N+S)`` would overflow
    long at ~1e12-row domains; the double form is safe at any scale
    and loses exactness only above 2^53, identically on both sides.)

    Returns one row per domain: counts on each side and the domain's
    PSI term ``(p_t - p_v) * ln(p_t / p_v)`` (rounded; callers sum for
    the scalar index).  Plan: one map-side-combined groupBy over the
    tiny domain key set plus a broadcast of the two totals — the corpus
    is scanned once, map-only.
    """
    thr = int(train_frac * MIX_MOD)
    is_train = (key_mix(F.col(key_col)) < F.lit(thr)).cast("long")
    per = df.groupBy(domain_col).agg(
        F.sum(is_train).alias("n_train"),
        F.sum(F.lit(1) - is_train).alias("n_val"),
    )
    tot = per.agg(
        F.sum("n_train").alias("_nt"),
        F.sum("n_val").alias("_nv"),
        F.count(F.lit(1)).alias("_s"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # p_t = (2*n_train+1)/(2*N_t+S); p_v likewise.  Integer-exact
    # numerators/denominators cast to double BEFORE the cross products
    # (int64 products overflow at ~1e12-row domains; the double form is
    # scale-safe and bit-identical across engines).
    num_t = (2 * F.col("n_train") + 1).cast("double")
    num_v = (2 * F.col("n_val") + 1).cast("double")
    den_t = (2 * F.col("_nt") + F.col("_s")).cast("double")
    den_v = (2 * F.col("_nv") + F.col("_s")).cast("double")
    p_t = num_t / den_t
    p_v = num_v / den_v
    ratio = (num_t * den_v) / (num_v * den_t)
    return j.select(
        domain_col,
        F.col("n_train"),
        F.col("n_val"),
        F.round(p_t, 6).alias("p_train"),
        F.round(p_v, 6).alias("p_val"),
        F.round((p_t - p_v) * F.log(ratio), 6).alias("psi_term"),
    )


def fixed_k_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, salts: int = 8
) -> DataFrame:
    """Skew-proof deterministic k-per-group sample: the k smallest
    ``key_mix`` values per group, selected in TWO bounded phases instead
    of one window over the whole group.

    Phase 1 ranks within ``(group, salt)`` where ``salt = key % salts``;
    phase 2 re-ranks the ≤ ``salts * k`` survivors per group.  Any row in
    a group's global top-k is also in its salt-bucket's top-k (fewer than
    k rows of that bucket precede it), so the two-phase result equals the
    single-window result exactly — but no task ever sorts more than
    ``|group| / salts`` rows, which is what makes a 10-billion-row hot
    group (one source owning half the corpus) survivable.  The oracle is
    the single-window ROW_NUMBER form.

    Returns ``(group, key, rank)`` with rank in [1, k].
    """
    mix = key_mix(F.col(key_col))
    salted = df.select(
        F.col(group_col), F.col(key_col), mix.alias("_mix")
    ).withColumn("_salt", F.pmod(F.col(key_col).cast("long"), F.lit(salts)))
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_mix", key_col)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy("_mix", key_col)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(group_col, key_col, F.col("rank").cast("int").alias("rank"))
    )


def curriculum_order(
    df: DataFrame,
    group_col: str,
    difficulty_col: str,
    key_col: str,
    bucket_width: int,
) -> DataFrame:
    """Curriculum ordering with source interleaving: bucket documents by
    a difficulty score (fixed-width buckets — data-independent, no
    global quantile pass), rank within ``(group, bucket)``, and emit the
    composite sort key ``(bucket, slot, group)`` that defines the
    training order.

    Consuming rows ordered by ``(bucket, slot, group, key)`` yields
    easy→hard progression with round-robin interleaving across groups
    inside each difficulty band — no long same-source runs.  All state
    is per ``(group, bucket)`` partition; the total order is carried by
    the composite key, NOT by a global window, so the plan has no
    single-task stage at any scale.
    """
    bucket = F.floor(F.col(difficulty_col).cast("long") / F.lit(bucket_width)).cast(
        "long"
    )
    w = Window.partitionBy(group_col, "_bucket").orderBy(difficulty_col, key_col)
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("slot", F.row_number().over(w))
        .select(
            F.col(key_col),
            F.col(group_col),
            F.col("_bucket").alias("bucket"),
            F.col("slot").cast("int").alias("slot"),
        )
    )
