"""Deduplication operators for training-data pipelines.

Five families, all designed shuffle-light for 100 TB:

  - exact:        one hash-groupBy on the normalized text (the shuffle key
                  is effectively a hash; Spark's exchange hashes the string)
  - MinHash+LSH:  per-doc signature (map-only) -> explode k/r bands ->
                  groupBy band key (the ONLY shuffle, keyed on short band
                  strings) -> candidate pairs -> exact-jaccard verify.
                  Candidate volume, not corpus volume, drives the join.
  - SimHash:      per-doc 30-bit signature (map-only); candidates from a
                  pigeonhole segment equi-join (max_hamming+1 segments,
                  recall exactly 1.0 by construction), hamming verify.
  - n-gram Jaccard: brute-force verify *within a blocking key*
                  (block_col, shingle-count log-band ±1) — jaccard >= tau
                  forces the distinct-shingle-set size ratio into
                  [tau, 1/tau], so log_{1/tau} bands differ by <= 1 for
                  EVERY qualifying pair: recall exactly 1.0, block size
                  bounded by the corpus's size distribution per ratio
                  band (not by an arbitrary absolute width).
  - embedding near-dup: exact cosine threshold join, distributed as
                  B(B+1)/2 block-pair numpy/BLAS tasks (LSH cannot honor an
                  exact threshold contract — see the function docstring).

Every operator computes the cross-engine polynomial hash
(operators/text.py), so every operator has a DuckDB-checkable oracle.
The hash-heavy signature stages (minhash, simhash, char shingles) default
to numpy-vectorized Arrow `mapInPandas` engines; each keeps a
higher-order-Column twin (`engine="column"`) whose value equality is
pinned by tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parquet_common_spark.operators.text import (
    HASH_MULT,
    HASH_P,
    char_poly_hash,
    normalize_text,
    tokens,
)

# deterministic MinHash family: g_i(h) = (A[i]*h + B[i]) mod P
MINHASH_K = 32
MINHASH_BANDS = 16  # r = K/BANDS = 2 rows per band
# corpus size above which minhash_lsh_pairs' verify stage filters the
# signature frame through a candidate-id semi-join before the verify
# joins (see the in-function comment; ~4 KB/row shingle arrays make the
# full-frame shuffle the dominant spill beyond ~1e6 docs)
VERIFY_SEMI_JOIN_MIN_DOCS = 1_000_000
MINHASH_A = [37 + 101 * i for i in range(MINHASH_K)]
MINHASH_B = [91 + 57 * i for i in range(MINHASH_K)]


def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingles of normalized text (empty-safe)."""
    toks = tokens(normalize_text(col))
    joined = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, joined).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def char_shingles_from_norm(s, n: int = 5):
    """Distinct character n-gram shingles of an ALREADY-normalized text
    column.  `s` must be a materialized column reference: substring(s, i)
    inside the transform lambda evaluates `s` per element, so passing the
    normalize_text expression here re-runs its regexes length(s) times."""
    return F.array_distinct(
        F.when(
            F.length(s) >= n,
            F.transform(F.sequence(F.lit(1), F.length(s) - n + 1), lambda i: F.substring(s, i, n)),
        ).otherwise(F.array(s))
    )


def char_shingles(col, n: int = 5):
    """Distinct character n-gram shingles of normalized text (convenience;
    prefer materializing normalize_text first — see char_shingles_from_norm)."""
    return char_shingles_from_norm(normalize_text(col), n)


# combining multiplier for token-hash -> shingle-hash composition
TOKEN_COMBINE = 1_000_003


def token_hashes(col):
    """Polynomial hash of each whitespace token of normalized text."""
    return F.transform(tokens(normalize_text(col)), lambda t: char_poly_hash(t))


def shingle_hashes_from_token_hashes(th, n: int = 3):
    """Distinct word-n-gram shingle hashes composed arithmetically from
    per-token hashes: shingle(i) = fold_j (acc*K + th[i+j]) mod P.

    Two performance rules baked in (higher-order expressions are
    interpreted, not codegen'd):
      - compose from token hashes instead of re-hashing concatenated
        shingle STRINGS (chars walked once per token, not once per shingle);
      - build the n-gram windows with slice + zip_with, NOT
        element_at(th, i) inside a transform lambda — an indexed lookup
        into a non-attribute array expression re-evaluates the whole array
        per element (measured 4x slowdown at sf0.1)."""
    m = F.size(th) - (n - 1)
    acc = F.slice(th, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(th, j + 1, m), lambda x, y: (x * TOKEN_COMBINE + y) % HASH_P
        )
    whole = F.aggregate(
        th, F.lit(0).cast("long"), lambda a, h: (a * TOKEN_COMBINE + h) % HASH_P
    )
    return F.array_distinct(F.when(F.size(th) >= n, acc).otherwise(F.array(whole)))


def shingle_hashes(col, n: int = 3):
    """Distinct word-n-gram shingle hashes of a text column."""
    return shingle_hashes_from_token_hashes(token_hashes(col), n)


def jaccard(a, b):
    """Exact Jaccard of two distinct arrays.  |A∪B| = |A|+|B|−|A∩B|
    (inputs are distinct), so one hash-set build per pair instead of two
    — same integer counts, bit-identical result, ~2x cheaper verify."""
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (F.size(a) + F.size(b) - inter).cast("double")


# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min id per normalized text; one hash-groupBy.
    Returns (keep_id, n_dupes) per surviving document."""
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("_norm"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
        .drop("_norm")
    )


# ----------------------------------------------------------- MinHash + LSH


def _affine_array(h):
    """The K affine hashes of one shingle hash, as an array expression."""
    return F.array(*[(h * a + b) % HASH_P for a, b in zip(MINHASH_A, MINHASH_B)])


def minhash_signature_from_hashes(sh):
    """All MINHASH_K minima in ONE traversal of the shingle-hash array:
    elementwise-min fold of the per-shingle affine arrays.  K separate
    array_min(transform(...)) calls would each re-evaluate (and, after
    Project collapsing, re-COMPUTE) the shingle pipeline — measured 30x
    slower at sf0.1."""
    init = F.array_repeat(F.lit(HASH_P).cast("long"), MINHASH_K)
    return F.aggregate(
        sh, init, lambda acc, h: F.zip_with(acc, _affine_array(h), lambda x, y: F.least(x, y))
    )


def minhash_signature(col):
    """Array of MINHASH_K min-hash values for a text column (map-only)."""
    return minhash_signature_from_hashes(shingle_hashes(col))


def _signatures_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Arrow/numpy signature stage: same algorithm, same values as the
    Column path, vectorized ACROSS the whole batch (guide §4.2: hand
    whole batches to native code, never loop rows in Python).

    r12 rewrite, measured at sf0.1 (OPTIMIZATION_r12.md):
      - token hashing runs as a length-sorted prefix-sliced numpy fold
        over one char-code matrix (O(total chars) vectorized work, no
        per-character Python loop);
      - shingle windows, per-doc dedup (one ``np.unique`` over
        doc-keyed composites) and the 32 MinHash mins
        (``np.minimum.reduceat``) are single flat numpy passes —
        the old per-document numpy-call loop was the actual cost, not
        the arithmetic;
      - output ListArrays are assembled directly from (values, offsets)
        buffers via ``mapInArrow`` — zero per-row Python on the way out
        (§4.2's offsets-array point).
    Map-only, no shuffle.  Deliberately NOT spread(): a Python stage
    pays ~10-15 ms of per-task runner setup, so fanning a tiny corpus
    out to 32 tasks costs more than the vectorized compute saves
    (interleaved A/B in OPTIMIZATION_r12.md: 1-task 0.67 s vs 32-task
    0.96 s for the full d2 at sf0.1); at corpus scale the scan is
    already parallel and each task runs this same vectorized batch
    loop."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("_sh", ArrayType(LongType())),
            StructField("_sig", ArrayType(LongType())),
        ]
    )
    A, B, P, K = MINHASH_A, MINHASH_B, HASH_P, TOKEN_COMBINE
    # tokens longer than this fall back to a per-char fold (rare —
    # keeps the padded char matrix's memory O(total chars), never
    # O(n_tokens * longest_token))
    _WIDE = 64

    def batches(it):
        import numpy as np
        import pyarrow as pa

        Anp = np.asarray(A, dtype=np.int64)
        Bnp = np.asarray(B, dtype=np.int64)
        ws = _re.compile(r"\s+", _re.ASCII)  # Java \s is ASCII-only; match the JVM normalize_text path

        def tok_hashes_flat(flat: list) -> "np.ndarray":
            """Polynomial hash of every token, vectorized: sort by length
            desc so each char position updates a PREFIX slice (no masks),
            exact same (h*131 + code) % P fold as the JVM path."""
            n = len(flat)
            h = np.zeros(n, dtype=np.int64)
            if n == 0:
                return h
            lens = np.fromiter((len(t) for t in flat), dtype=np.int64, count=n)
            order = np.argsort(-lens, kind="stable")
            narrow = [flat[i] for i in order if lens[i] <= _WIDE]
            k0 = n - len(narrow)  # tokens wider than _WIDE sort first
            hs = np.zeros(n, dtype=np.int64)
            for pos in range(k0):  # rare wide tokens: per-char fold
                acc = 0
                for ch in flat[order[pos]]:
                    acc = (acc * 131 + ord(ch)) % P
                hs[pos] = acc
            if narrow:
                arr = np.array(narrow, dtype=f"U{max(1, min(int(lens.max()), _WIDE))}")
                # UCS4 view => one int32 code point per char, 0-padded
                codes = arr.view(np.uint32).reshape(len(narrow), -1).astype(np.int64)
                nlens = lens[order[k0:]]
                acc = np.zeros(len(narrow), dtype=np.int64)
                for j in range(codes.shape[1]):
                    live = int(np.searchsorted(-nlens, -(j + 1), side="right"))
                    if live == 0:
                        break
                    acc[:live] = (acc[:live] * 131 + codes[:live, j]) % P
                hs[k0:] = acc
            h[order] = hs
            return h

        for batch in it:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            texts = batch.column(1).to_pylist()
            ndocs = len(texts)
            if ndocs == 0:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], pa.int64()),
                     pa.array([], pa.list_(pa.int64())),
                     pa.array([], pa.list_(pa.int64()))],
                    names=["_id", "_sh", "_sig"],
                )
                continue
            doc_toks = [
                ws.sub(" ", (t or "").lower()).strip(" ").split(" ") for t in texts
            ]
            counts = np.fromiter((len(ts) for ts in doc_toks), dtype=np.int64, count=ndocs)
            flat = [tok for ts in doc_toks for tok in ts]
            th = tok_hashes_flat(flat)
            offs = np.concatenate(([0], np.cumsum(counts)))
            # word-3-gram windows over the FLAT hash array; a window is
            # valid iff it does not cross a doc boundary
            doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
            if len(th) >= 3:
                win = ((th[:-2] * K + th[1:-1]) % P * K + th[2:]) % P
                valid = doc_of[:-2] == doc_of[2:]
                win_doc = doc_of[:-2][valid]
                win = win[valid]
            else:
                win = np.zeros(0, dtype=np.int64)
                win_doc = np.zeros(0, dtype=np.int64)
            # docs with <3 tokens: whole-doc fold (same as Column path)
            short = np.flatnonzero(counts < 3)
            if len(short):
                sh_extra = np.zeros(len(short), dtype=np.int64)
                for si, d in enumerate(short):
                    acc = 0
                    for x in th[offs[d]:offs[d + 1]]:
                        acc = (acc * K + int(x)) % P
                    sh_extra[si] = acc
                win = np.concatenate([win, sh_extra])
                win_doc = np.concatenate([win_doc, short])
            # per-doc DISTINCT + sort in one pass: unique of doc*P + sh
            comb = np.unique(win_doc * P + win)
            sh_doc = comb // P
            sh_val = comb % P
            starts = np.searchsorted(sh_doc, np.arange(ndocs, dtype=np.int64))
            # 32 MinHash mins per doc, one flat pass per hash function
            sig = np.empty((MINHASH_K, ndocs), dtype=np.int64)
            for p in range(MINHASH_K):
                sig[p] = np.minimum.reduceat((Anp[p] * sh_val + Bnp[p]) % P, starts)
            sh_offsets = np.concatenate((starts, [len(sh_val)])).astype(np.int64)
            sh_arr = pa.ListArray.from_arrays(
                pa.array(sh_offsets, pa.int32()), pa.array(sh_val, pa.int64())
            )
            sig_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(ndocs + 1, dtype=np.int64) * MINHASH_K, pa.int32()),
                pa.array(sig.T.ravel(), pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), sh_arr, sig_arr],
                names=["_id", "_sh", "_sig"],
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(
        batches, schema=out_schema
    )


def shingle_hashes_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Arrow/numpy variant of :func:`shingle_hashes` for any n: returns
    ``(_id, _sh)`` with the DISTINCT word-n-gram hash array per row —
    bit-identical to the Column path (same tok_hash, same composition),
    vectorized per batch.  Same rationale as ``_signatures_arrow``: the
    interpreted HOF hash stage is the bottleneck, numpy rolling
    composition is ~10x cheaper.  Map-only, no shuffle."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType(
        [StructField("_id", LongType()), StructField("_sh", ArrayType(LongType()))]
    )
    P, K = HASH_P, TOKEN_COMBINE

    def batches(it):
        import numpy as np
        import pandas as pd

        ws = _re.compile(r"\s+", _re.ASCII)  # Java \s is ASCII-only; match the JVM normalize_text path

        def tok_hash(t: str) -> int:
            h = 0
            for ch in t:
                h = (h * 131 + ord(ch)) % P
            return h

        for pdf in it:
            ids, shs = [], []
            for i, text in zip(pdf[pdf.columns[0]], pdf[pdf.columns[1]]):
                norm = ws.sub(" ", (text or "").lower()).strip(" ")
                th = np.array([tok_hash(t) for t in norm.split(" ")], dtype=np.int64)
                if len(th) >= n:
                    m = len(th) - n + 1
                    acc = th[:m].copy()
                    for j in range(1, n):
                        acc = (acc * K + th[j : j + m]) % P
                    sh = acc
                else:
                    a = 0
                    for h in th:
                        a = (a * K + int(h)) % P
                    sh = np.array([a], dtype=np.int64)
                ids.append(int(i))
                shs.append(np.unique(sh).tolist())
            yield pd.DataFrame({"_id": ids, "_sh": shs})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(batches, schema=out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau: float = 0.25,
    engine: str = "arrow",
    band_cap: int | None = None,
    verify_semi_join: bool | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Plan shape (the 100 TB story): signature + bands are a map-only stage;
    the band groupBy shuffles (doc_id, band_key) pairs — tiny rows; the
    verify join only touches candidate pairs.  No all-pairs stage at any
    scale (pinned by tests/test_plans.py).

    ``band_cap`` bounds a DEGENERATE band: a bucket where millions of
    boilerplate documents share a band key otherwise goes quadratic.
    With a cap, bucket members are ranked by id and a pair is a candidate
    only when the ranks are within ``band_cap`` — candidate volume drops
    from O(m²) to O(m·cap) per bucket.  Chaining consecutive ranks keeps
    every bucket CONNECTED, so downstream duplicate CLUSTERS
    (connected_components) are unchanged for buckets of mutual
    duplicates; pair-level recall inside an oversized bucket is
    explicitly traded (distant-rank pairs are only found if another band
    catches them) — tested with a degenerate corpus in
    tests/test_operators.py.  None (the default) preserves the exact
    oracle contract.

    ``verify_semi_join``: filter the signature frame through a
    candidate-id semi-join before the verify joins.  None (default)
    auto-enables it only for corpora ≥ ``VERIFY_SEMI_JOIN_MIN_DOCS`` —
    below that the full persisted sigs frame is cheaper to join than the
    three extra semi-join stages (VERDICT r10 item 3: the skip is worth
    ~0.45s at sf0.1; the semi-join is what keeps sf100 off a 76 GB
    scratch-disk spill).

    ``engine``: "arrow" (default — numpy-vectorized signature stage) or
    "column" (pure JVM higher-order expressions).  Both produce identical
    values; the interpreted-HOF column path is the conceptual reference,
    the Arrow path is ~2x faster end-to-end at sf0.1 because this stage is
    hash-arithmetic-bound, not I/O-bound.
    """
    r = MINHASH_K // MINHASH_BANDS
    if engine == "arrow":
        sigs = _signatures_arrow(df, id_col, text_col)
    else:
        sigs = df.select(
            F.col(id_col).alias("_id"),
            shingle_hashes(F.col(text_col)).alias("_sh"),
        ).withColumn("_sig", minhash_signature_from_hashes(F.col("_sh")))
    # the bands branch and the verify branch both consume this frame;
    # without a persist each re-runs the token/shingle hash pipeline
    # (the dominant cost).  MEMORY_AND_DISK + Spark's LRU keeps this safe
    # at scale; callers doing repeated dedup sweeps can unpersist via
    # sparkSession.catalog.clearCache().
    sigs = sigs.persist()
    # Materialize the persist once, eagerly: both the bands branch and
    # the verify branch consume sigs, and a lazy fill lets the two
    # stages race to compute it.  The count doubles as the auto gate for
    # the verify semi-join below (VERDICT r10 item 3).
    n_docs = sigs.count()
    if verify_semi_join is None:
        # The semi-join (cand_ids union+distinct + left_semi filter) is
        # worth 3 extra stages only when shuffling the FULL
        # (id, shingle-array) frame would spill — ~4 KB/row, so around
        # 1e6 docs (~4 GB shuffle) it starts paying for itself; the
        # candidate-id count the r9 verdict proposed gating on is not
        # known until cand executes, and corpus size is its documented
        # ~1e2 proxy (candidates ≈ 1e-2 of corpus).  At sf0.1 (5k docs)
        # the skip saves ~0.45s of pure stage overhead; at sf100 (5M
        # docs) the semi-join remains on — the measured sf100 run
        # without it filled a 76 GB scratch disk.
        verify_semi_join = n_docs >= VERIFY_SEMI_JOIN_MIN_DOCS
    # bands carry ONLY (id, band_key): the shingle arrays would otherwise be
    # duplicated x BANDS through the explode and dragged through the join +
    # distinct (array comparisons in the shuffle) — measured 3x slowdown.
    # band key = xxhash64(band index, the band's r signature slots): one
    # LONG rides the shuffle instead of a concat string.  A 64-bit hash
    # collision can only MERGE two buckets — extra candidates that the
    # exact-jaccard verify rejects — never split one, so recall and the
    # final pair set are untouched.
    bands = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(j),
                        *[F.element_at(F.col("_sig"), j * r + k + 1) for k in range(r)],
                    )
                    for j in range(MINHASH_BANDS)
                ]
            )
        ).alias("_band"),
    )
    if band_cap is not None:
        from pyspark.sql import Window

        rk = F.row_number().over(Window.partitionBy("_band").orderBy("_id"))
        bands = bands.withColumn("_rk", rk)
        cand = (
            bands.alias("a")
            .join(bands.alias("b"), "_band")
            .where(
                (F.col("a._id") < F.col("b._id"))
                & (F.col("b._rk") - F.col("a._rk") <= band_cap)
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
    else:
        cand = (
            bands.alias("a")
            .join(bands.alias("b"), "_band")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
    # spread candidates back to the core count before the verify: AQE
    # coalesces the distinct's shuffle by byte size of the bare id pairs,
    # under-provisioning the array-heavy verify (see ngram_jaccard_pairs)
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b")
    # verify-side reduction: only docs that appear in a candidate pair
    # need their shingle arrays.  Without the semi-join the two verify
    # joins shuffle the FULL (id, shingle-array) frame on id — ~4 KB a
    # row at corpus scale, the dominant spill (measured: sf100 d2 filled
    # a 76 GB scratch disk; candidates themselves are ~1e-2 of the
    # corpus).  The candidate-id set is small at runtime, so AQE plans
    # the semi-join as a broadcast — the array frame is FILTERED map-side
    # and never shuffles at corpus size; the verify joins then move only
    # |candidate-ids| arrays.
    if verify_semi_join:
        cand_ids = (
            cand.select(F.col("id_a").alias("_id"))
            .union(cand.select(F.col("id_b").alias("_id")))
            .distinct()
        )
        hashes = sigs.select("_id", "_sh").join(cand_ids, "_id", "left_semi")
    else:
        # small corpus: the persisted sigs frame is tiny — feed the
        # verify joins directly instead of paying the semi-join stages
        hashes = sigs.select("_id", "_sh")
    return (
        cand.join(hashes.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(hashes.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= tau)
        .select("id_a", "id_b", F.round("jac", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------- SimHash

SIMHASH_BITS = 30  # our poly hash is mod 1e9+7 < 2^30


def simhash_from_hashes(th):
    """30-bit SimHash from an already-materialized feature-hash array.
    `th` must be a plain column reference: the 30 per-bit filters each
    reference it, and Catalyst does not CSE repeated higher-order
    subexpressions — inlining the hash pipeline here costs 30x."""
    n = F.size(th)

    def _bit_set(i: int):
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    bits = [
        F.when(
            2 * F.size(F.filter(th, _bit_set(i))) > n,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash(col):
    """30-bit SimHash over distinct word-3-gram shingle hashes (map-only).

    Shingles, not unigram tokens: with a small shared vocabulary unigram
    simhashes saturate (every doc looks alike); 3-gram features keep the
    background hamming distance high."""
    return simhash_from_hashes(shingle_hashes(col))


def _simhash_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """numpy-vectorized simhash signatures (same values as the Column
    path; same rationale as _signatures_arrow)."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([StructField("_id", LongType()), StructField("_sim", LongType())])
    sh_stage = _signatures_arrow(df, id_col, text_col).select("_id", "_sh")

    def batches(it):
        import numpy as np
        import pandas as pd

        bits = np.arange(SIMHASH_BITS, dtype=np.int64)
        for pdf in it:
            sims = []
            for sh in pdf["_sh"]:
                a = np.asarray(sh, dtype=np.int64)
                cnt = ((a[:, None] >> bits[None, :]) & 1).sum(axis=0)
                sim = int(((2 * cnt > len(a)).astype(np.int64) << bits).sum())
                sims.append(sim)
            yield pd.DataFrame({"_id": pdf["_id"], "_sim": sims})

    return sh_stage.mapInPandas(batches, schema=out_schema)


def _simhash_segments(max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) of the max_hamming+1 pigeonhole segments covering
    SIMHASH_BITS.  A pair within `max_hamming` flipped bits must agree
    EXACTLY on at least one segment (one flipped bit per segment can
    spoil only max_hamming of them)."""
    n_seg = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, n_seg)
    segs, off = [], 0
    for k in range(n_seg):
        w = base + (1 if k < extra else 0)
        segs.append((off, w))
        off += w
    return segs


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 4, engine: str = "arrow"
) -> DataFrame:
    """Pairs within `max_hamming` bits of SimHash distance — EXACT result,
    banded plan.

    The signature is split into (max_hamming+1) bit segments; by
    pigeonhole, any pair within the radius agrees exactly on ≥1 segment,
    so candidates come from a segment-key equi-join (the only shuffle
    carries (id, seg_key) longs) and the hamming check verifies them.
    Recall is structurally 1.0 — unlike probabilistic LSH, banding here
    loses nothing, so the all-pairs DuckDB oracle still matches
    bit-for-bit.  No cross join at any scale (pinned by
    tests/test_plans.py)."""
    if engine == "arrow":
        s = _simhash_arrow(df, id_col, text_col)
    else:
        s = (
            df.select(F.col(id_col).alias("_id"), shingle_hashes(F.col(text_col)).alias("_th"))
            .select("_id", simhash_from_hashes(F.col("_th")).alias("_sim"))
        )
    s = s.persist()  # consumed by the bands branch and twice by the verify join
    segs = _simhash_segments(max_hamming)
    # seg key = segment_idx * 2^SIMHASH_BITS + segment bits (disjoint per segment)
    bands = s.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.lit(k << SIMHASH_BITS).cast("long")
                    + F.shiftright(F.col("_sim"), off).bitwiseAND(F.lit((1 << w) - 1))
                    for k, (off, w) in enumerate(segs)
                ]
            )
        ).alias("_seg"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), "_seg")
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(s.select(F.col("_id").alias("id_a"), F.col("_sim").alias("sim_a")), "id_a")
        .join(s.select(F.col("_id").alias("id_b"), F.col("_sim").alias("sim_b")), "id_b")
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


# ------------------------------------------------------- blocked n-gram


def _char_shingles_arrow(
    df: DataFrame, id_col: str, text_col: str, block_col: str, n: int
) -> DataFrame:
    """Arrow/numpy char-shingle stage for ngram_jaccard_pairs: same values
    as the Column path (normalize -> n-char windows -> char_poly_hash ->
    distinct), vectorized per batch.  The Column path hashes every shingle
    with an interpreted higher-order aggregate (length(text) re-walks per
    doc); here the window hash is n numpy passes over the codepoint array.
    Map-only, no shuffle."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("_blk", StringType()),
            StructField("_sh", ArrayType(LongType())),
        ]
    )
    P, M = HASH_P, HASH_MULT

    def batches(it):
        import numpy as np
        import pandas as pd

        ws = _re.compile(r"\s+", _re.ASCII)  # Java \s is ASCII-only; match the JVM normalize_text path
        for pdf in it:
            ids, blks, shs = [], [], []
            for i, blk, text in zip(
                pdf[pdf.columns[0]], pdf[pdf.columns[1]], pdf[pdf.columns[2]]
            ):
                norm = ws.sub(" ", (text or "").lower()).strip(" ")
                codes = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                m = len(codes) - n + 1
                if m >= 1:
                    h = np.zeros(m, dtype=np.int64)
                    for j in range(n):
                        h = (h * M + codes[j : j + m]) % P
                    sh = np.unique(h)
                else:
                    acc = 0
                    for c in codes:
                        acc = (acc * M + int(c)) % P
                    sh = np.array([acc], dtype=np.int64)
                ids.append(int(i))
                blks.append(blk)
                shs.append(sh.tolist())
            yield pd.DataFrame({"_id": ids, "_blk": blks, "_sh": shs})

    return df.select(F.col(id_col), F.col(block_col), F.col(text_col)).mapInPandas(
        batches, schema=out_schema
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 5,
    tau: float = 0.4,
    engine: str = "arrow",
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs, brute-forced WITHIN a
    composite blocking key — never all-pairs, recall exactly 1.0.

    Block key = (block_col, ratio band): the second component is
    floor(log_{1/tau} |shingle set|).  jaccard(A,B) >= tau implies
    tau <= |A|/|B| <= 1/tau for the DISTINCT shingle sets (|A∩B| <= |A|
    and >= tau·|A∪B| >= tau·|B|), so the two log-bands differ by at most
    1 — every qualifying pair survives banding BY CONSTRUCTION, unlike a
    fixed-width length band whose recall degrades for long documents.
    Each doc lands in bands (b, b+1); a pair is matched exactly once via
    the key==greatest(band) filter, so no distinct is needed and shingle
    arrays ride the join once.  Because recall is structural, the DuckDB
    oracle is the UNBLOCKED all-pairs jaccard join — the banding must
    reproduce it bit-for-bit.

    Block sizes follow the corpus's size distribution per ratio band
    (bands are geometric: each covers a (1/tau)x size range).  A
    degenerate band (billions of same-sized docs in one language at
    100 TB) is still quadratic in the worst case — route such corpora
    through minhash_lsh_pairs (probabilistic, band_cap-bounded) and use
    this operator as the exact verifier."""
    import math

    assert 0.0 < tau < 1.0, "tau must be in (0, 1)"
    band_den = math.log(1.0 / tau)
    if engine == "arrow":
        s = _char_shingles_arrow(df, id_col, text_col, block_col, n)
    else:
        s = (
            df.select(
                F.col(id_col).alias("_id"),
                F.col(block_col).alias("_blk"),
                normalize_text(F.col(text_col)).alias("_norm"),
            )
            .select("_id", "_blk", char_shingles_from_norm(F.col("_norm"), n).alias("_ss"))
            # hash shingles to longs: the pairwise array_intersect/union over
            # ~300-element arrays dominates the blocked join, and long
            # comparisons beat string comparisons ~4x there
            .select(
                "_id",
                "_blk",
                F.array_distinct(
                    F.transform(F.col("_ss"), lambda sh: char_poly_hash(sh))
                ).alias("_sh"),
            )
        )
    s = (
        # ratio band on the DISTINCT shingle count (see docstring); sizes
        # are integers and 1/tau powers are non-integer, so the floor is
        # engine-stable
        s.withColumn("_b", F.floor(F.log(F.size("_sh").cast("double")) / F.lit(band_den)))
        .persist()  # both sides of the self-join consume the shingle pipeline
    )
    # the band join carries ONLY (id, blk, band keys): dragging both
    # shingle arrays through it materializes |candidates| x 2 x |set|
    # longs in the shuffle (measured 122s at sf0.1 for 2.9M candidates);
    # with bare id pairs the band join shuffles a few MB and the arrays
    # are attached afterwards by two joins against the 1-row-per-doc
    # signature frame (broadcastable at check scale, keyed equi-joins at
    # cluster scale) — same pattern as minhash_lsh_pairs.
    bands = s.select(
        "_id", "_blk", "_b", F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_k")
    )
    a = bands.select(F.col("_id").alias("id_a"), "_blk", "_k", F.col("_b").alias("b_a"))
    b = bands.select(F.col("_id").alias("id_b"), "_blk", "_k", F.col("_b").alias("b_b"))
    cand = (
        a.join(b, ["_blk", "_k"])
        .where((F.col("id_a") < F.col("id_b")) & (F.col("_k") == F.greatest("b_a", "b_b")))
        .select("id_a", "id_b")
    )
    # AQE coalesces the candidate shuffle by its BYTE size (bare id pairs
    # are tiny) and the expensive verify downstream inherits that
    # parallelism — measured 1 partition / 122s for 2.9M candidates at
    # sf0.1, 10s after spreading back to the core count
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b")
    return (
        cand.join(s.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(s.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= tau)
        .select("id_a", "id_b", F.round("jac", 6).alias("jaccard"))
    )


# -------------------------------------------------- embedding near-dup


def _fold_cos(a, b):
    """Sequential left-to-right cosine fold — identical fp rounding to the
    JVM aggregate(zip_with(...)) path and DuckDB list_dot_product."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom > 0 else float("nan")


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_blocks: int = 8,
    mode: str = "exact",
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold.

    ``mode="exact"`` (default, the oracle contract): block-pair
    distributed plan, no cross join (pinned by tests/test_plans.py).
    ``mode="ann"``: hyperplane-LSH candidates + exact cosine verify — the
    documented 100 TB path, which trades recall (reported by
    tests/test_operators.py) for near-linear candidate volume.

    Why exact can't ride LSH: LSH honors a *threshold* contract only
    probabilistically — at tau=0.4 (angle ~66°) per-bit agreement is
    ~0.63, so even 8 tables x 6 bits recall only ~40% of the true pairs
    on dense embeddings (measured on the driver tables: ~990 background
    pairs at cos>=0.3), and the exact oracle would diverge.  An exact
    threshold join over dense vectors is inherently O(n²) work; the
    scalable shape distributes it EVENLY as B(B+1)/2 block-pair tasks
    (each row is shuffled to B groups — replication sqrt(2·#tasks), the
    standard blocked all-pairs layout) and makes each task one vectorized
    numpy/BLAS matmul instead of per-row interpreted HOF cosine.  Matmul
    prunes with a 1e-9 margin; survivors are re-verified with the same
    sequential-fold double arithmetic as the JVM/DuckDB path, so the
    emitted values and the >= comparison stay bitwise identical to the
    all-pairs oracle.  B grows with corpus size so one block pair fits an
    executor's memory (2·n/B vectors).  At 100 TB the exact contract
    itself is the bottleneck — switch to mode="ann" and accept a recall
    target instead.

    Ids: block assignment hashes the id (any orderable type balances),
    but the output schema emits ids as longs — non-numeric ids need a
    surrogate key.  Zero-norm vectors match nothing (cos undefined ->
    NaN -> every >= comparison false), exactly like the SQL oracle where
    0/0 yields NULL."""
    if mode == "ann":
        return _embedding_neardup_ann(df, id_col, vec_col, threshold)
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = df.sparkSession
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # group membership: group (i,j) i<=j gets block i as side L, block j as R
    mem = []
    gid = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            if i == j:
                mem.append((gid, i, "B"))
            else:
                mem.append((gid, i, "L"))
                mem.append((gid, j, "R"))
            gid += 1
    mem_df = spark.createDataFrame(mem, "gid int, blk int, side string")
    tagged = v.join(F.broadcast(mem_df), v["_blk"] == mem_df["blk"]).select(
        "gid", "side", "_id", "_v"
    )
    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )
    tau = threshold

    def block_pairs(pdf):
        import numpy as np
        import pandas as pd

        fold_cos = _fold_cos
        diagonal = (pdf["side"] == "B").any()
        if diagonal:
            l_ids = pdf["_id"].to_numpy()
            l_mat = np.stack(pdf["_v"].to_numpy())
            r_ids, r_mat = l_ids, l_mat
        else:
            lp = pdf[pdf["side"] == "L"]
            rp = pdf[pdf["side"] == "R"]
            if len(lp) == 0 or len(rp) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                    {"id_a": "int64", "id_b": "int64", "cos": "float64"}
                )
            l_ids = lp["_id"].to_numpy()
            l_mat = np.stack(lp["_v"].to_numpy())
            r_ids = rp["_id"].to_numpy()
            r_mat = np.stack(rp["_v"].to_numpy())
        ln = l_mat / np.linalg.norm(l_mat, axis=1, keepdims=True)
        rn = r_mat / np.linalg.norm(r_mat, axis=1, keepdims=True)
        g = ln @ rn.T
        ii, jj = np.nonzero(g >= tau - 1e-9)
        ids_a, ids_b, coss = [], [], []
        for i, j in zip(ii, jj):
            a_id, b_id = int(l_ids[i]), int(r_ids[j])
            if a_id >= b_id:
                if diagonal:
                    continue  # mirrored index pair; (min,max) emitted once
                a_id, b_id = b_id, a_id  # fold_cos is exactly symmetric
            c = fold_cos(l_mat[i], r_mat[j])
            if c >= tau:
                ids_a.append(a_id)
                ids_b.append(b_id)
                coss.append(c)
        return pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "cos": coss})

    return (
        tagged.groupBy("gid")
        .applyInPandas(block_pairs, schema=out_schema)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


def _embedding_neardup_ann(
    df: DataFrame, id_col: str, vec_col: str, threshold: float, dim: int = 64
) -> DataFrame:
    """ANN mode: multi-table hyperplane-LSH candidate generation (shared
    with similarity.lsh_topk — map-only Arrow signatures, one equi-join on
    bucket keys) + exact sequential-fold cosine verify.  Candidate volume
    scales with bucket collisions, not n²; recall < 1.0 by design and is
    measured against the exact mode in tests/test_operators.py."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from parquet_common_spark.operators.similarity import lsh_buckets_arrow

    b = lsh_buckets_arrow(df, id_col, vec_col, dim=dim).persist()
    cand = (
        b.alias("a")
        .join(b.alias("b"), "_bkt")
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("a._v").alias("v_a"),
            F.col("b._id").alias("id_b"),
            F.col("b._v").alias("v_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )
    tau = threshold

    def verify(it):
        import pandas as pd

        for pdf in it:
            ids_a, ids_b, coss = [], [], []
            for a, va, bb, vb in zip(pdf["id_a"], pdf["v_a"], pdf["id_b"], pdf["v_b"]):
                c = _fold_cos(va, vb)
                if c >= tau:
                    ids_a.append(int(a))
                    ids_b.append(int(bb))
                    coss.append(c)
            yield pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "cos": coss})

    return (
        cand.mapInPandas(verify, schema=out_schema)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


# ------------------------------------------------- incremental MinHash


def _band_frame(sigs: DataFrame, carry: tuple = ()) -> DataFrame:
    """(_id, [carry...], _band) band keys from a signature frame — the
    same xxhash64(band index, r signature slots) keys minhash_lsh_pairs
    uses, factored out for the incremental path."""
    r = MINHASH_K // MINHASH_BANDS
    return sigs.select(
        "_id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(j),
                        *[F.element_at(F.col("_sig"), j * r + k + 1) for k in range(r)],
                    )
                    for j in range(MINHASH_BANDS)
                ]
            )
        ).alias("_band"),
    )


def build_minhash_index(
    df: DataFrame, id_col: str, text_col: str, path: str
) -> None:
    """Persist the per-document MinHash sketch store
    ``(_id, _sh, _sig)`` as parquet — the state an incremental dedup
    pipeline carries between batches.  Documents indexed once are never
    re-shingled: subsequent batches read sketches, not text.  At 100 TB
    the index is ~1% of the corpus (32 longs + the distinct shingle
    hashes per doc) and the build is the same map-only Arrow signature
    stage the batch path uses."""
    _signatures_arrow(df, id_col, text_col).write.mode("overwrite").parquet(path)


def incremental_minhash_pairs(
    spark,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    tau: float = 0.25,
) -> DataFrame:
    """Near-duplicate pairs INVOLVING at least one new document: the new
    batch against the persisted sketch index plus itself — the daily
    crawl-increment shape.  Old documents contribute only their stored
    sketches (zero text re-processing); old-old pairs were reported by
    the runs that indexed them and are excluded by the is-new flag in
    the join condition, so each pair is reported exactly once across a
    whole incremental history.

    Plan shape: one map-only Arrow signature stage over the NEW batch
    only, a band equi-join over (old ∪ new) band keys carrying
    (id, band, 1-byte flag), and the exact-Jaccard verify join over
    candidates — identical guarantees to the batch path at a per-batch
    cost proportional to the batch, not the corpus."""
    old = spark.read.parquet(index_path).withColumn("_new", F.lit(False))
    new_sigs = _signatures_arrow(new_df, id_col, text_col).withColumn(
        "_new", F.lit(True)
    )
    all_sigs = old.unionByName(new_sigs)
    bands = _band_frame(all_sigs, carry=("_new",))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), "_band")
        .where(
            (F.col("a._id") < F.col("b._id"))
            & (F.col("a._new") | F.col("b._new"))
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    cand = cand.repartition(
        spark.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    hashes = all_sigs.select("_id", "_sh")
    return (
        cand.join(
            hashes.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")),
            "id_a",
        )
        .join(
            hashes.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jac") >= tau)
        .select("id_a", "id_b", F.round("jac", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- SemDeDup


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then prune near-identical
    pairs WITHIN each cluster only.

    The clustering is the scale move: pairwise comparison is confined
    to one cell, so the pair volume is sum(|cell|^2) instead of n^2 —
    with balanced cells a k-fold reduction, and the cells themselves
    come from a broadcast-centroid map-side assignment
    (:func:`similarity.ivf_assign`), so the corpus never shuffles to
    be assigned.  Within a cell the keep rule is the repo-wide
    deterministic convention (drop the HIGHER id of any pair at
    cosine >= threshold; the paper's keep-farthest-from-centroid rule
    is a one-line swap of the tie-break).  Three bounded shuffles:
    the pair equi-join on centroid_id, the dropped-id distinct, and
    the survivor anti join (AQE broadcasts the dropped side when it
    is small, which it is by construction — it is bounded by the
    duplicate count, not the corpus).

    Returns ``(id_col, cluster_id)`` for the SURVIVING vectors.
    Reference parity: the reference engine has no ANN/embedding surface
    (SURVEY §2 marks the family as ours); centroid determinism matches
    :func:`similarity.sample_centroids` so any engine replays it.
    """
    from parquet_common_spark.operators import similarity as SIM

    cents = SIM.sample_centroids(corpus, id_col, vec_col, n_centroids)
    cells = SIM.ivf_assign(corpus, cents, id_col, vec_col, nprobe=1)
    a = cells.select(
        F.col("_vid").alias("id_a"), F.col("_v").alias("va"), "centroid_id"
    )
    b = cells.select(
        F.col("_vid").alias("id_b"), F.col("_v").alias("vb"), "centroid_id"
    )
    dropped = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(SIM.cosine(F.col("va"), F.col("vb")) >= F.lit(threshold))
        .select(F.col("id_b").alias("_drop"))
        .distinct()
    )
    return (
        cells.join(dropped, cells["_vid"] == dropped["_drop"], "left_anti")
        .select(
            F.col("_vid").alias(id_col),
            F.col("centroid_id").cast("int").alias("cluster_id"),
        )
    )


# ------------------------------------------- exact-substring dedup (char)


def substring_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 32,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Character-level exact-substring duplicate pairs: documents that
    share at least one exact run of ``min_len`` normalized characters —
    the "deduplicating training data" (exact-substring) method, which
    catches boilerplate headers, license blocks and quoted passages
    that token-level Jaccard dilutes away.  Returns ``(id_a, id_b,
    n_shared)`` with ``id_a < id_b``; ``n_shared`` counts the DISTINCT
    shared ``min_len``-grams (a single contiguous shared run of length
    R contributes R - min_len + 1).

    Exactness: a pair shares a >= min_len-char substring IFF it shares
    at least one char ``min_len``-gram, so enumerating every position's
    gram (not a stride sample) makes recall 1.0 by construction; hash
    collisions across 61-bit polynomial hashes are the only (measure
    zero, oracle-shared) approximation.  Docs shorter than ``min_len``
    normalized chars cannot contain such a run and are excluded.

    Scale shape: the gram stage is the Arrow char-shingle scan
    (map-only, np.unique per doc); the candidate generator is a self
    equi-join on the gram hash where per-hash fan-out is bounded by the
    number of docs sharing that exact substring (the duplication being
    measured); one final groupBy on the pair.

    ``max_doc_freq`` is the hot-hash flood guard: a gram present in
    more than ``max_doc_freq`` documents (the same license header in
    10M docs) would alone emit ~freq²/2 join rows, so grams above the
    cap are dropped BEFORE the self-join via one extra
    ``groupBy(h).count()`` (a (hash, count) shuffle — never text) and
    an equi-join filter.  Per-hash fan-out is then <= cap, so join
    output is bounded by |grams| * cap instead of corpus².  Recall
    bound: a pair is missed only when EVERY >=min_len run it shares
    consists entirely of grams each hotter than the cap — i.e. pure
    corpus-wide boilerplate, which is exactly the content a dedup pass
    wants measured by the hot-gram report (the capped ``freq`` frame),
    not enumerated pairwise.  ``None`` keeps the exact all-pairs
    semantics.  Flood-tested in tests/test_operators.py."""
    d0 = df.select(
        F.col(id_col), F.lit("all").alias("_blk"), F.col(text_col)
    ).where(F.length(normalize_text(F.col(text_col))) >= min_len)
    s = _char_shingles_arrow(d0, id_col, text_col, "_blk", min_len)
    hs = s.select(F.col("_id"), F.explode("_sh").alias("h"))
    if max_doc_freq is not None:
        # _sh is np.unique'd per doc, so count(1) per h == doc frequency
        ok = (
            hs.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("h")
        )
        hs = hs.join(ok, "h")
    a = hs.select("h", F.col("_id").alias("id_a"))
    b = hs.select("h", F.col("_id").alias("id_b"))
    return (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
