"""Training-data pipeline operators exposed as oracle-checked registry
queries over the documents/embeddings tables.

The DuckDB oracle SQL strings are *generated* from the same constants as
the Spark operators (hash family, band layout, thresholds), so both
engines execute the identical algorithm.  Intermediate representations
(band-key strings etc.) only need within-engine equality; the final
row sets must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_common_spark.operators import dedup as D
from parquet_common_spark.operators import similarity as SIM
from parquet_common_spark.operators import text as T
from parquet_common_spark.plans.common import load, query

# ---------------------------------------------------------------- SQL helpers

_P = T.HASH_P
_NORM = r"trim(regexp_replace(lower({c}), '\s+', ' ', 'g'))"
_TOKS = r"string_split_regex(" + _NORM + r", '\s+')"
_RAW_TOKS = r"string_split_regex(trim(lower({c})), '\s+')"


def _phash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * {T.HASH_MULT} + b) % {_P})"
    )


def _stop_hits(col: str, words) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_RAW_TOKS.format(c=col)}, t -> t IN ({inlist})))"


# ----------------------------------------------------------------- d1: exact


@query(
    "d1_exact_dedup",
    f"""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
    FROM documents
    GROUP BY {_NORM.format(c='text')}
    ORDER BY keep_id
    """,
)
def d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return D.exact_dedup(docs, "text", "doc_id").orderBy("keep_id")


# ---------------------------------------------------------- d2: MinHash LSH

_SH_TAU = 0.25
_r = D.MINHASH_K // D.MINHASH_BANDS
_sig_sql = ", ".join(
    f"list_min(list_transform(sh, h -> ({a} * h + {b}) % {_P}))"
    for a, b in zip(D.MINHASH_A, D.MINHASH_B)
)
_band_sql = ", ".join(
    "'" + str(j) + "_' || " + " || '_' || ".join(
        f"CAST(sig[{j * _r + k + 1}] AS VARCHAR)" for k in range(_r)
    )
    for j in range(D.MINHASH_BANDS)
)

_K = D.TOKEN_COMBINE
_SHINGLE_CTES = f"""t0 AS (SELECT doc_id AS id,
             list_transform({_TOKS.format(c='text')}, t -> {_phash('t')}) AS th
           FROM documents),
    docs AS (SELECT id,
             list_distinct(CASE WHEN len(th) >= 3
                  THEN list_transform(generate_series(1, len(th) - 2),
                                      i -> (((th[i] * {_K} + th[i+1]) % {_P}) * {_K} + th[i+2]) % {_P})
                  ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th), (a, b) -> (a * {_K} + b) % {_P})]
                  END) AS sh
           FROM t0)"""

_D2_SQL = f"""
    WITH {_SHINGLE_CTES},
    sigs AS (SELECT id, sh, [{_sig_sql}] AS sig FROM docs),
    bands AS (SELECT id, unnest([{_band_sql}]) AS band FROM sigs),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
    pairs AS (SELECT id_a, id_b,
                CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                / CAST(len(list_distinct(da.sh || db.sh)) AS DOUBLE) AS jac
              FROM cand JOIN docs da ON da.id = cand.id_a JOIN docs db ON db.id = cand.id_b)
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM pairs WHERE jac >= {_SH_TAU}
    ORDER BY id_a, id_b
"""


_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}
_PAIRS_CACHE_MAX = 4  # (appId, sf_dir) entries; LRU-evicted + unpersisted


def clear_pairs_cache() -> None:
    """Unpersist and drop every cached pair set.  bench.py calls this
    after its warm-up so a timed d2 run always includes the pair
    computation (a warm-up that happens to populate the cache would
    otherwise make the reported time a cache read)."""
    while _PAIRS_CACHE:
        _, old = _PAIRS_CACHE.popitem()
        old.unpersist()


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2/d6/c1 all consume the same LSH pair set; compute it once per
    (session, sf_dir) and persist — the cross-query analogue of the
    reference's pluggable predicate-result cache
    (/root/reference/search/constraint_cache.go:16-33).  Bounded: the
    oldest entry is unpersisted and dropped beyond _PAIRS_CACHE_MAX, so a
    long-lived session sweeping many sf_dirs can't pin unbounded executor
    memory.  Staleness caveat: regenerating an sf_dir's parquet within
    one application requires clearing the entry (same contract as the
    reference's cache, which keys on immutable shard identity)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIRS_CACHE:
        while len(_PAIRS_CACHE) >= _PAIRS_CACHE_MAX:
            _, old = _PAIRS_CACHE.popitem()
            old.unpersist()
        docs = load(spark, sf_dir, "documents")["documents"]
        _PAIRS_CACHE[key] = D.minhash_lsh_pairs(docs, "doc_id", "text", tau=_SH_TAU).persist()
    return _PAIRS_CACHE[key]


@query("d2_minhash_lsh_dedup", _D2_SQL, headline=True)
def d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(spark, sf_dir).orderBy("id_a", "id_b")


# -------------------------------------------------------------- d3: SimHash

_HAM_MAX = 3
_simhash_terms = " + ".join(
    f"CASE WHEN 2 * len(list_filter(th, h -> ((h >> {i}) & 1) = 1)) > len(th) "
    f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for i in range(D.SIMHASH_BITS)
)

_D3_SQL = f"""
    WITH {_SHINGLE_CTES.replace(' AS sh', ' AS th').replace('docs AS', 'd0 AS')},
    s AS (SELECT id, {_simhash_terms} AS sim FROM d0)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM s a JOIN s b ON a.id < b.id
    WHERE bit_count(xor(a.sim, b.sim)) <= {_HAM_MAX}
    ORDER BY id_a, id_b
"""


@query("d3_simhash_dedup", _D3_SQL)
def d3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=_HAM_MAX).orderBy("id_a", "id_b")


# ----------------------------------------------------- d4: blocked n-gram

_NG_TAU = 0.4
# The oracle is the UNBLOCKED all-pairs jaccard join within a language:
# the Spark side's shingle-count log-banding has recall exactly 1.0 by
# construction (jaccard >= tau bounds the set-size ratio), so the banded
# plan must reproduce the unbanded answer bit-for-bit.
_D4_SQL = f"""
    WITH t0 AS (SELECT doc_id AS id, lang, {_NORM.format(c='text')} AS s FROM documents),
    t0b AS (SELECT id, lang,
             list_distinct(CASE WHEN length(s) >= 5
                  THEN list_transform(generate_series(1, length(s) - 4), i -> substr(s, i, 5))
                  ELSE [s] END) AS ss
           FROM t0),
    t1 AS (SELECT id, lang, list_distinct(list_transform(ss, sg -> {_phash('sg')})) AS sh FROM t0b)
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 6) AS jaccard
    FROM t1 a JOIN t1 b ON a.lang = b.lang AND a.id < b.id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= {_NG_TAU}
    ORDER BY id_a, id_b
"""


@query("d4_ngram_jaccard_dedup", _D4_SQL)
def d4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", "lang", n=5, tau=_NG_TAU).orderBy(
        "id_a", "id_b"
    )


# ------------------------------------------------- d5: embedding near-dup

_COS_TAU = 0.4
_COSSQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_D5_SQL = f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND({_COSSQL.format(a='a.e', b='b.e')}, 5) AS cos
    FROM v a JOIN v b ON a.id < b.id
    WHERE {_COSSQL.format(a='a.e', b='b.e')} >= {_COS_TAU}
    ORDER BY id_a, id_b
"""


@query("d5_embedding_neardup", _D5_SQL)
def d5(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # r12 (finding 2): the final orderBy's range sampling re-executes the
    # O(block^2) pairwise-cosine applyInPandas stage unless a shuffle
    # materializes it first; one hash repartition of the narrow
    # (id_a, id_b, cos) pair rows makes sampling read shuffle output.
    return (
        D.embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=_COS_TAU)
        .repartition("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------- d10: SemDeDup

_D10_CENTROIDS = 8


def _d10_sql() -> str:
    # Replays semdedup exactly: portable-mix centroid sample, nearest-cell
    # assignment with the (cos DESC, centroid_id) tie-break, within-cell
    # pair prune at the d5 tau, survivors via anti join.  Same
    # left-to-right dot fold on both engines.
    cos_vc = _COSSQL.format(a="e", b="cvec")
    cos_ab = _COSSQL.format(a="a.e", b="b.e")
    return f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    samp AS (SELECT id, e FROM v
             ORDER BY (id * 2654435761 + 40503) % 999999937, id LIMIT {_D10_CENTROIDS}),
    cent AS (SELECT ROW_NUMBER() OVER (ORDER BY id) AS centroid_id, e AS cvec FROM samp),
    ca AS (SELECT v.id, v.e, centroid_id,
                  ROW_NUMBER() OVER (PARTITION BY v.id
                                     ORDER BY {cos_vc} DESC, centroid_id) AS rk
           FROM v, cent),
    cells AS (SELECT id, e, centroid_id FROM ca WHERE rk = 1),
    dropped AS (SELECT DISTINCT b.id AS drop_id
                FROM cells a JOIN cells b USING (centroid_id)
                WHERE a.id < b.id AND {cos_ab} >= {_COS_TAU})
    SELECT id AS vec_id, CAST(centroid_id AS INT) AS cluster_id
    FROM cells WHERE id NOT IN (SELECT drop_id FROM dropped)
    ORDER BY vec_id
    """


@query("d10_semdedup", _d10_sql())
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-then-prune semantic dedup — the within-cell
    variant of d5's exact pair contract (pair volume sum(|cell|^2), not
    n^2)."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return D.semdedup(
        emb, "vec_id", "embedding", n_centroids=_D10_CENTROIDS, threshold=_COS_TAU
    ).orderBy("vec_id")


# ------------------------------------------------------------- text analysis


@query(
    "t1_token_stats",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{T.BPE_ISH_PATTERN}'))) AS BIGINT) AS sum_bpe_tokens,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count(F.col("text"))).cast("long").alias("sum_tokens"),
            F.sum(T.bpe_ish_token_count(F.col("text"))).cast("long").alias("sum_bpe_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


_QUALITY_SQL = f"""ROUND(
      0.25 * least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0)
    + 0.25 * (CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END)
    + 0.25 * (1.0 - CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END)
    + 0.25 * least(4.0 * (CASE WHEN len(string_split_regex(trim(text), '\\s+')) > 0
              THEN CAST({_stop_hits('text', T.STOPWORDS['en'])} AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
              ELSE 0.0 END), 1.0), 6)"""


@query(
    "t2_quality_scores",
    f"""
    SELECT doc_id, {_QUALITY_SQL} AS quality
    FROM documents ORDER BY doc_id
    """,
    headline=True,
)
def t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sort FIRST on the scan column, score AFTER (guide §1.2/§2.4): an
    # ``orderBy`` above the regex-heavy projection makes the range
    # exchange's boundary-sampling job re-execute the projection — the
    # whole quality pass ran TWICE (and, on a single-row-group file,
    # serially).  Range-partitioning the narrow (doc_id, text) frame
    # samples only the scan, the per-partition sort preserves the exact
    # ORDER BY doc_id contract (doc_id is unique), and the quality
    # projection runs once, parallel, above the sort.  Measured
    # 0.85 -> 0.44 s at sf0.1; same rows, same order (pinned by pytest).
    docs = load(spark, sf_dir, "documents")["documents"]
    ordered = (
        docs.select("doc_id", "text")
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
    )
    return ordered.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


_langscore = {lang: _stop_hits("text", T.STOPWORDS[lang]) for lang in T.LANG_ORDER}
_best = "greatest(" + ", ".join(_langscore.values()) + ")"
_langcase = "CASE " + " ".join(
    f"WHEN {_langscore[lang]} = {_best} AND {_best} > 0 THEN '{lang}'" for lang in T.LANG_ORDER
) + " ELSE 'und' END"


@query(
    "t3_lang_id",
    f"""
    SELECT lang, {_langcase} AS predicted, COUNT(*) AS n
    FROM documents
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
)
def t3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return (
        docs.groupBy("lang", T.lang_id(F.col("text")).alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "t4_fingerprints",
    f"""
    SELECT doc_id, {_phash(_NORM.format(c='text'))} AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def t4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # t2-class fix (r12): sort the narrow scan columns first so the
    # range exchange's sampling never re-executes the interpreted
    # char_poly_hash projection, which then runs once and in parallel.
    docs = load(spark, sf_dir, "documents")["documents"]
    ordered = (
        docs.select("doc_id", "text")
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
    )
    return ordered.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


# --------------------------------------------------------- similarity search


@query(
    "sim1_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (SELECT query_id, neighbor_id, {_COSSQL.format(a='qv', b='cv')} AS cos
               FROM q, c WHERE query_id <> neighbor_id),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(cos, 5) AS cos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
    """,
    headline=True,
)
def sim1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=5).orderBy(
        "query_id", "rank"
    )


def _planes_literal(dim: int = 64) -> str:
    """The LSH hyperplanes as a DuckDB DOUBLE[][] literal.  Generated from
    the SAME ``_plane_component`` arithmetic the Spark side uses, and
    Python float repr round-trips exactly, so both engines hold
    bit-identical plane vectors."""
    n = SIM.N_TABLES * SIM.N_BITS
    return (
        "["
        + ", ".join(
            "[" + ", ".join(repr(SIM._plane_component(p, d)) for d in range(dim)) + "]"
            for p in range(n)
        )
        + "]"
    )


def _sim2_sql() -> str:
    # Bucket bits replayed in SQL: bit b of table t is
    # sign(list_dot_product(e, plane[t*N_BITS+b])).  The Spark side folds
    # the dot left-to-right (cumsum Arrow engine == aggregate/zip_with
    # fold == DuckDB's list_dot_product), so the SIGNS agree bit-for-bit
    # and the candidate sets are identical — same verification pattern as
    # d5 (candidates -> exact cosine -> rank).
    bits = "\n           ".join(
        f"+ (CASE WHEN list_dot_product(e, P[t*{SIM.N_BITS}+{b + 1}]) > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(SIM.N_BITS)
    )
    return f"""
    WITH pl AS (SELECT {_planes_literal()}::DOUBLE[][] AS P),
    v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    bk AS (
      SELECT id, e,
             CAST(t * {1 << SIM.N_BITS} AS BIGINT)
           {bits} AS bkt
      FROM v, pl, generate_series(0, {SIM.N_TABLES - 1}) AS g(t)),
    qb AS (SELECT * FROM bk WHERE id < 5),
    cand AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, q.e AS qe, c.e AS ce
             FROM qb q JOIN bk c ON q.bkt = c.bkt AND q.id <> c.id),
    scored AS (SELECT query_id, neighbor_id, {_COSSQL.format(a="qe", b="ce")} AS cos FROM cand),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(cos, 5) AS cos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
    """


@query("sim2_lsh_topk", _sim2_sql())
def sim2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.lsh_topk(emb, emb.where(F.col("vec_id") < 5), k=5).orderBy("query_id", "rank")


# ------------------------------------------------------------- multimodal


@query(
    "mm1_media_metadata",
    """
    SELECT doc_id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN (doc_id % 3) IN (0, 2)
                THEN octet_length(encode(text)) % 640 + 1 ELSE 0 END AS INT) AS width,
           CAST(CASE WHEN (doc_id % 3) IN (0, 2)
                THEN octet_length(encode(text)) % 480 + 1 ELSE 0 END AS INT) AS height,
           CAST(CASE WHEN (doc_id % 3) = 0 THEN 1
                     WHEN (doc_id % 3) = 2 THEN octet_length(encode(text)) % 300 + 1
                     ELSE octet_length(encode(text)) % 48000 + 1 END AS INT) AS n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the real mapInPandas/Arrow plumbing; the decode itself is
    the documented stub, mirrored arithmetically in the oracle."""
    from parquet_common_spark.operators.multimodal import attach_fake_media, decode_media

    # t2-class fix (r12): orderBy ABOVE the Python decode stage made the
    # range exchange's boundary sampling decode every payload a second
    # time.  Sort the narrow source rows first (range partitions are
    # ordered, mapInPandas is row-wise per batch), decode once.
    docs = load(spark, sf_dir, "documents")["documents"]
    ordered = (
        docs.select("doc_id", "text")
        .repartitionByRange("doc_id")
        .sortWithinPartitions("doc_id")
    )
    return decode_media(attach_fake_media(ordered))


@query(
    "mm2_frame_sampling",
    """
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
    calc AS (
      SELECT doc_id, n, CAST(n % 300 + 1 AS INT) AS n_frames,
             generate_series(0, CAST(n % 300 AS INT), 10) AS idxs
      FROM v)
    SELECT doc_id, n_frames,
           CAST(len(idxs) AS BIGINT) AS n_sampled,
           CAST(list_sum(idxs) AS BIGINT) AS sum_frame_idx,
           CAST(list_sum(list_transform(idxs, i -> LEAST(16, n - (i % n)))) AS BIGINT)
             AS frame_bytes
    FROM calc ORDER BY doc_id
    """,
)
def mm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the variable-fan-out mapInPandas path
    (one output row per sampled frame), aggregated back per doc; the
    oracle replays the deterministic stub-frame arithmetic (every-10th
    frame index, 16-byte payload slices clipped at the payload end)."""
    from parquet_common_spark.operators.multimodal import (
        attach_fake_media,
        decode_media,
        sample_frames,
    )

    docs = load(spark, sf_dir, "documents")["documents"]
    # r12 (guide §4.1): only video rows are ever used, but media_type is
    # a native column computed BELOW the opaque Python stages — filtering
    # before them ships 1/3 of the payload bytes across the JVM→Python
    # boundary (twice: decode branch + frame branch) instead of all of
    # them.  Row-wise stages, so filter-below ≡ filter-above.
    vid = attach_fake_media(docs).where(F.col("media_type") == "video")
    frames = sample_frames(vid, every_k=10)
    agg = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("sum_frame_idx"),
        F.sum(F.length("frame_payload")).cast("long").alias("frame_bytes"),
    )
    # r12 (finding 2, join form): the final orderBy's range sampling
    # re-executes any join input that is NOT a materialized exchange —
    # here the Python decode branch ran twice.  A hash repartition of
    # the narrow (doc_id, n_frames) rows puts the decode below a shuffle
    # stage that AQE materializes once; sampling then reads shuffle
    # output, not the Python lineage.
    dec = (
        decode_media(vid)
        .where(F.col("media_type") == "video")
        .select("doc_id", "n_frames")
        .repartition("doc_id")
    )
    return dec.join(agg, "doc_id").select(
        "doc_id", "n_frames", "n_sampled", "sum_frame_idx", "frame_bytes"
    ).orderBy("doc_id")


@query(
    "mm3_resize_geometry",
    """
    WITH img AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 0),
    geo AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
             n % 640 + 1 AS w0, n % 480 + 1 AS h0
      FROM img)
    SELECT doc_id, n_bytes,
           CAST(CASE WHEN GREATEST(w0, h0) > 256
                THEN GREATEST(CAST(trunc(w0 * (256.0 / GREATEST(w0, h0))) AS INT), 1)
                ELSE w0 END AS INT) AS width,
           CAST(CASE WHEN GREATEST(w0, h0) > 256
                THEN GREATEST(CAST(trunc(h0 * (256.0 / GREATEST(w0, h0))) AS INT), 1)
                ELSE h0 END AS INT) AS height
    FROM geo ORDER BY doc_id
    """,
)
def mm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize-to-max-side geometry through the mapInPandas resize
    path; the oracle mirrors the stub decode + scale arithmetic (scale =
    256/max_side computed first, then per-axis truncation — the exact
    operation order of resize_media)."""
    from parquet_common_spark.operators.multimodal import attach_fake_media, resize_media
    from parquet_common_spark.plans.common import presorted

    # t2-class fix (r12): sort the narrow source before the Python
    # resize stage instead of orderBy above it (boundary sampling was
    # resizing every image twice); filter/select above a row-wise map
    # preserve the presorted order.
    docs = load(spark, sf_dir, "documents")["documents"]
    # r12 (guide §4.1): only image rows are used, and media_type is a
    # native column — filter BELOW the opaque Python resize so 1/3 of
    # the payload bytes cross the JVM→Python boundary.  A row-wise
    # filter preserves the presorted partition order.
    media = attach_fake_media(presorted(docs.select("doc_id", "text"), "doc_id")).where(
        F.col("media_type") == "image"
    )
    out = resize_media(media, max_side=256)
    # No final orderBy: rows already leave the row-wise resize in
    # doc_id order via the presort (mm1/mm4 shape) — a top-level
    # orderBy would range-sample THROUGH the Python stage, resizing
    # every image a second time.
    return out.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        "width",
        "height",
    )


@query(
    "mm4_audio_features",
    """
    SELECT doc_id,
           CAST(NULL AS INT) AS n_channels,
           CAST(NULL AS INT) AS sample_rate,
           CAST(octet_length(encode(text)) % 48000 + 1 AS BIGINT) AS n_frames,
           CAST(NULL AS DOUBLE) AS duration_s,
           CAST(NULL AS DOUBLE) AS rms,
           CAST(NULL AS DOUBLE) AS peak
    FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id
    """,
)
def mm4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features through the Arrow map-only path.  The corpus's
    synthetic payloads carry no WAV magic, so geometry is the
    deterministic fallback (mirrored arithmetically in the oracle) and
    the signal stats are honestly NULL; the REAL decode path — PCM
    8/16/24/32-int + IEEE-float to RMS/peak — is pinned by
    tests/test_mediacodec.py over synthesized sine WAVs."""
    from parquet_common_spark.operators.multimodal import attach_fake_media, audio_features
    from parquet_common_spark.plans.common import presorted

    # t2-class fix (r12): presort below the Python stage, decode once.
    docs = load(spark, sf_dir, "documents")["documents"]
    return audio_features(
        attach_fake_media(presorted(docs.select("doc_id", "text"), "doc_id"))
    )


@query(
    "x2_doc_chunking",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE doc_id < 300),
    c AS (
      SELECT doc_id, toks,
             CAST(CEIL(len(toks) / 24.0) AS INT) AS n_chunks
      FROM t),
    e AS (
      SELECT doc_id, toks, i.range AS chunk_idx
      FROM c, range(64) i
      WHERE i.range < GREATEST(n_chunks, 1)),
    w AS (
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             toks[chunk_idx*24 + 1 : LEAST(chunk_idx*24 + 32, len(toks))] AS win
      FROM e)
    SELECT doc_id, chunk_idx,
           CAST(len(win) AS INT) AS n_chunk_tokens,
           array_to_string(win, ' ') AS chunk_text
    FROM w ORDER BY doc_id, chunk_idx
    """,
)
def x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking (32-token windows, 8-token overlap,
    stride 24) — the context-window prep step, map-only Column
    expressions with posexplode fan-out (operators/text.py
    chunk_documents); the oracle replays the slice arithmetic with
    DuckDB list slicing.  range(64) bounds the oracle's index table —
    the corpus max is well under 64 chunks/doc (ceil guard in tests)."""
    from parquet_common_spark.operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")["documents"].where(F.col("doc_id") < 300)
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8).orderBy(
        "doc_id", "chunk_idx"
    )


@query(
    "mm5_png_pixel_checksum",
    """
    WITH d AS (SELECT doc_id, CAST(doc_id % 12 + 4 AS INT) AS width,
                      CAST(doc_id % 16 + 5 AS INT) AS height
               FROM documents WHERE doc_id < 64),
    g AS (SELECT d.doc_id, d.width, d.height,
                 x.range AS x, y.range AS y, c.range AS c
          FROM d, range(16) x, range(21) y, range(3) c
          WHERE x.range < d.width AND y.range < d.height)
    SELECT doc_id, width, height,
           CAST(SUM((doc_id + x + y + 7*c) % 256) AS BIGINT) AS pixel_sum
    FROM g GROUP BY doc_id, width, height ORDER BY doc_id
    """,
)
def mm5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL PNG codec through the driver gate: deterministic pixel
    arrays are encoded with cycling filter types 0-4 (exercising every
    unfilter path), decoded back, and pixel-checksummed inside an Arrow
    map stage.  PNG is lossless, so the checksum equals the closed-form
    sum the DuckDB oracle computes from the pixel definition — any
    filter/inflate/unfilter defect breaks the hash.  (JPEG is lossy and
    therefore pytest-pinned instead: decode(progressive)==
    decode(baseline) identity and quantization-error bounds.)"""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 64).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("pixel_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import mediacodec as MC

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "pixel_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 12 + 4, d % 16 + 5
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                pixels = ((d + x + y + 7 * c) % 256).astype(np.uint8)
                data = MC.encode_png(pixels, filters=[0, 1, 2, 3, 4])
                dw, dh, got = MC.decode_png(data)
                out["doc_id"].append(d)
                out["width"].append(dw)
                out["height"].append(dh)
                out["pixel_sum"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ------------------------------------- d6: duplicate clusters (iterative)

_D6_SQL = f"""
    WITH RECURSIVE {_SHINGLE_CTES},
    sigs AS (SELECT id, sh, [{_sig_sql}] AS sig FROM docs),
    bands AS (SELECT id, unnest([{_band_sql}]) AS band FROM sigs),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN docs da ON da.id = cand.id_a JOIN docs db ON db.id = cand.id_b
              WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(da.sh || db.sh)) AS DOUBLE) >= {_SH_TAU}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src AS id, dst AS peer FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src
    ),
    labels AS (
      SELECT id, least(id, MIN(peer)) AS component FROM reach GROUP BY id)
    SELECT MIN(id) AS keep_id, COUNT(*) AS n_members
    FROM labels GROUP BY component ORDER BY keep_id
"""


@query("d6_duplicate_clusters", _D6_SQL)
def d6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs -> connected components -> one survivor per
    duplicate cluster (iterative min-label propagation; oracle reaches the
    same fixpoint via WITH RECURSIVE)."""
    from parquet_common_spark.operators.components import dedup_clusters

    pairs = _minhash_pairs(spark, sf_dir)
    return dedup_clusters(pairs).orderBy("keep_id")


# ----------------------------------- c1: end-to-end curation pipeline

_C1_SQL = f"""
    WITH {_SHINGLE_CTES},
    sigs AS (SELECT id, sh, [{_sig_sql}] AS sig FROM docs),
    bands AS (SELECT id, unnest([{_band_sql}]) AS band FROM sigs),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN docs da ON da.id = cand.id_a JOIN docs db ON db.id = cand.id_b
              WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(da.sh || db.sh)) AS DOUBLE) >= {_SH_TAU}),
    dropped AS (SELECT DISTINCT id_b AS id FROM pairs)
    SELECT d.doc_id, {_QUALITY_SQL} AS quality
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM dropped)
      AND {_langcase} = 'en'
      AND {_QUALITY_SQL} >= 0.5
      AND len(string_split_regex(trim(text), '\\s+')) >= 10
    ORDER BY d.doc_id
"""


@query("c1_curation_pipeline", _C1_SQL)
def c1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the pipeline operators as ONE declarative plan:
    near-dup removal (keep the lower doc_id of each LSH pair) + language
    filter + quality floor + minimum length — the canonical pretraining
    curation query shape."""
    docs = load(spark, sf_dir, "documents")["documents"]
    pairs = _minhash_pairs(spark, sf_dir)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        docs.join(dropped, "doc_id", "left_anti")
        .where(T.lang_id(F.col("text")) == "en")
        .withColumn("quality", T.quality_score(F.col("text")))
        .where(F.col("quality") >= 0.5)
        .where(T.token_count(F.col("text")) >= 10)
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


# ------------------------------------------------------ t5: TF-IDF terms

_T5_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex({_NORM.format(c='text')}, '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
    scored AS (SELECT t.doc_id, t.term,
                      t.tf * ln(CAST(nd AS DOUBLE) / dfreq) AS tfidf
               FROM tf t JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (SELECT doc_id, term, tfidf,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rk
               FROM scored)
    SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rank
"""


@query("t5_tfidf_terms", _T5_SQL)
def t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy("doc_id", "rank")


# --------------------------------------------- sim4: int8-quantized top-k

# Quantized cosine is scale-free (the per-vector scales cancel), so the
# whole search is integer dot products — exact in any engine, no float
# fold alignment required.  The oracle replays the quantizer
# (floor(x/s + 0.5), the portable half-up) and the integer-dot ranking.
_SIM4_SQL = """
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sc AS (SELECT id, GREATEST(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127.0 AS s, e
           FROM v),
    q AS (SELECT id, CAST(list_transform(e, x -> floor(x / s + 0.5)) AS DOUBLE[]) AS qv
          FROM sc),
    qq AS (SELECT * FROM q WHERE id < 5),
    scored AS (
      SELECT a.id AS query_id, b.id AS neighbor_id,
             list_dot_product(a.qv, b.qv)
             / (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) AS qcos
      FROM qq a, q b WHERE a.id <> b.id),
    ranked AS (SELECT query_id, neighbor_id, qcos,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(qcos, 5) AS qcos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
"""


@query("sim4_quantized_topk", _SIM4_SQL)
def sim4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_common_spark.operators import quantize as Q

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return Q.quantized_topk(emb, emb.where(F.col("vec_id") < 5), k=5).orderBy(
        "query_id", "rank"
    )


# ------------------------------------------------ deterministic sampling

_SAMPLE_FRACTION = 0.2
_STRATUM_K = 20


def _sampling_sqls() -> tuple[str, str]:
    from parquet_common_spark.operators import sampling as SP

    mix = f"(doc_id * {SP.MIX_MULT} + {SP.MIX_ADD}) % {SP.MIX_MOD}"
    threshold = int(_SAMPLE_FRACTION * SP.MIX_MOD)
    p2 = f"""
    SELECT doc_id, lang FROM documents
    WHERE {mix} < {threshold}
    ORDER BY doc_id
    """
    p3 = f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {mix}, doc_id) AS rk
      FROM documents)
    SELECT doc_id, lang FROM ranked WHERE rk <= {_STRATUM_K}
    ORDER BY lang, doc_id
    """
    return p2, p3


_P2_SQL, _P3_SQL = _sampling_sqls()


@query("p2_deterministic_sample", _P2_SQL)
def p2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated Bernoulli sample: partition-independent (unlike
    df.sample), so the exact row set is reproducible anywhere — the
    property that makes dataset curation auditable."""
    from parquet_common_spark.operators import sampling as SP

    docs = load(spark, sf_dir, "documents")["documents"]
    return SP.sample_fraction(docs, "doc_id", _SAMPLE_FRACTION).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


@query("p3_stratified_sample", _P3_SQL)
def p3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir: exactly k docs per language,
    chosen by the hash order (stable across partitionings/engines)."""
    from parquet_common_spark.operators import sampling as SP

    docs = load(spark, sf_dir, "documents")["documents"]
    return SP.stratified_fixed(docs, ["lang"], "doc_id", _STRATUM_K).select(
        "doc_id", "lang"
    ).orderBy("lang", "doc_id")


def _sim3_sql(n_centroids: int = 8, nprobe: int = 4) -> str:
    # Replays ivf_topk exactly: portable-mix centroid sample, nearest-cell
    # assignment (nprobe=1 corpus, nprobe=N queries) with the same
    # (cos DESC, centroid_id) tie-break, candidates via centroid equi-join,
    # exact cosine re-rank.  Every float compare uses the same
    # left-to-right dot fold on both engines.
    cos_vc = _COSSQL.format(a="e", b="cvec")
    return f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    samp AS (SELECT id, e FROM v
             ORDER BY (id * 2654435761 + 40503) % 999999937, id LIMIT {n_centroids}),
    cent AS (SELECT ROW_NUMBER() OVER (ORDER BY id) AS centroid_id, e AS cvec FROM samp),
    ca AS (SELECT v.id, v.e, centroid_id,
                  ROW_NUMBER() OVER (PARTITION BY v.id
                                     ORDER BY {cos_vc} DESC, centroid_id) AS rk
           FROM v, cent),
    cells AS (SELECT id AS neighbor_id, e AS ce, centroid_id FROM ca WHERE rk = 1),
    qa AS (SELECT q.id, q.e, centroid_id,
                  ROW_NUMBER() OVER (PARTITION BY q.id
                                     ORDER BY {cos_vc} DESC, centroid_id) AS rk
           FROM (SELECT * FROM v WHERE id < 5) q, cent),
    probes AS (SELECT id AS query_id, e AS qe, centroid_id FROM qa WHERE rk <= {nprobe}),
    cand AS (SELECT DISTINCT query_id, neighbor_id, qe, ce
             FROM probes JOIN cells USING (centroid_id)
             WHERE query_id <> neighbor_id),
    scored AS (SELECT query_id, neighbor_id, {_COSSQL.format(a="qe", b="ce")} AS cos FROM cand),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(cos, 5) AS cos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
    """


@query("sim3_ivf_topk", _sim3_sql())
def sim3(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=5, n_centroids=8, nprobe=4).orderBy(
        "query_id", "rank"
    )


# ------------------------------------------- d7: benchmark decontamination

# Benchmark split = source 'src0' (the held-out "eval suite"); corpus =
# every other source.  n=3 token-grams give real overlap signal at the
# synthetic corpus's ~30-word vocabulary; production pipelines use
# n=8..13 — the parameter, not the plan, changes.
_DC_N = 3
_DC_MIN_HITS = 5
_DC_BENCH_SRC = "src0"

# shingle CTE carrying the source column (same hash family as d2/d3/d4)
_DC_CTES = f"""t0 AS (SELECT doc_id AS id, source,
             list_transform({_TOKS.format(c='text')}, t -> {_phash('t')}) AS th
           FROM documents),
    d AS (SELECT id, source,
             list_distinct(CASE WHEN len(th) >= {_DC_N}
                  THEN list_transform(generate_series(1, len(th) - {_DC_N - 1}),
                                      i -> (((th[i] * {_K} + th[i+1]) % {_P}) * {_K} + th[i+2]) % {_P})
                  ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th), (a, b) -> (a * {_K} + b) % {_P})]
                  END) AS sh
           FROM t0)"""

_D7_SQL = f"""
    WITH {_DC_CTES},
    bench AS (SELECT DISTINCT unnest(sh) AS h FROM d WHERE source = '{_DC_BENCH_SRC}'),
    corpus AS (SELECT id, unnest(sh) AS h FROM d WHERE source <> '{_DC_BENCH_SRC}'),
    hits AS (SELECT c.id,
                    COUNT(*) AS n_shingles,
                    COUNT(b.h) AS n_hits
             FROM corpus c LEFT JOIN bench b ON c.h = b.h
             GROUP BY c.id)
    SELECT id AS doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_hits AS BIGINT) AS n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS hit_frac,
           n_hits >= {_DC_MIN_HITS} AS contaminated
    FROM hits ORDER BY doc_id
"""


@query("d7_benchmark_decontam", _D7_SQL)
def d7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_common_spark.operators import decontam as DC

    docs = load(spark, sf_dir, "documents")["documents"]
    bench = docs.where(F.col("source") == _DC_BENCH_SRC)
    corpus = docs.where(F.col("source") != _DC_BENCH_SRC)
    return (
        DC.contamination(
            corpus, bench, "doc_id", "text", n=_DC_N, min_hits=_DC_MIN_HITS
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- t6: Gopher repetition filters

# Thresholds calibrated so the synthetic corpus splits (sf0.01 medians:
# dup_token_frac 0.54, top_bigram_frac 0.069); production Gopher uses
# top-2gram <= 0.20 (Rae et al. 2021 Table A1) — same rule, same knob.
_REP_DUP_MAX = 0.60
_REP_TOP2_MAX = 0.20

_T6_SQL = f"""
    WITH t0 AS (SELECT doc_id, {_TOKS.format(c='text')} AS toks FROM documents),
    g AS (SELECT doc_id, toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(generate_series(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END AS grams
          FROM t0),
    m AS (SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS dupf,
           list_reverse_sort(list_transform(list_distinct(grams),
               x -> {{'c': len(list_filter(grams, y -> y = x)), 'g': x}}))[1] AS top,
           list_sum(list_transform(toks, t -> length(t))) AS total_chars
          FROM g),
    r AS (SELECT doc_id,
           ROUND(dupf, 6) AS dup_token_frac,
           top.g AS top_bigram,
           CAST(top.c AS BIGINT) AS top_bigram_count,
           ROUND(CASE WHEN top.g IS NOT NULL AND total_chars > 0
                THEN CAST(top.c * length(replace(top.g, ' ', '')) AS DOUBLE) / total_chars
                ELSE 0.0 END, 6) AS top_bigram_frac
          FROM m)
    SELECT doc_id, dup_token_frac, top_bigram, top_bigram_count, top_bigram_frac,
           dup_token_frac <= {_REP_DUP_MAX} AND top_bigram_frac <= {_REP_TOP2_MAX} AS keep
    FROM r ORDER BY doc_id
"""


@query("t6_repetition_filters", _T6_SQL)
def t6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # t2-class fix (r12): presort below the interpreted bigram HOFs —
    # the orderBy's boundary sampling was running the whole O(|grams|^2)
    # top_bigram stage twice (see plans/common.presorted).
    from parquet_common_spark.plans.common import presorted

    docs = load(spark, sf_dir, "documents")["documents"]
    staged = (
        presorted(docs.select("doc_id", "text"), "doc_id")
        .withColumn("_toks", T.tokens(T.normalize_text(F.col("text"))))
        .withColumn("_grams", T.word_bigrams(F.col("_toks")))
        .withColumn("_top", T.top_bigram(F.col("_grams")))
    )
    dupf = F.round(T.duplicate_token_fraction(F.col("_toks")), 6)
    # reuse the materialized _top column: a second top_bigram tree is not
    # CSE'd (HOFs are CodegenFallback) and would double the dominant cost
    topf = F.round(
        T.top_bigram_char_fraction(F.col("_grams"), F.col("_toks"), F.col("_top")), 6
    )
    return (
        staged.select(
            "doc_id",
            dupf.alias("dup_token_frac"),
            F.col("_top")["g"].alias("top_bigram"),
            F.col("_top")["c"].cast("long").alias("top_bigram_count"),
            topf.alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_token_frac") <= _REP_DUP_MAX)
            & (F.col("top_bigram_frac") <= _REP_TOP2_MAX),
        )
    )


# --------------------------------------------------- t7: PII redaction

# The synthetic corpus contains no organic PII, so the query plants it
# deterministically from driver data (doc_id arithmetic) IN BOTH
# ENGINES, then exercises the real detection/redaction bank end-to-end.
# The operator itself (operators/pii.py) is generic.

_PII_TEXT_SQL = """concat(text,
      CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END,
      CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END,
      CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END)"""


def _pii_sql_counts() -> str:
    from parquet_common_spark.operators.pii import PII_PATTERNS

    cols = [
        f"CAST(len(regexp_extract_all(pt, '{p}')) AS BIGINT) AS n_{n}"
        for n, p, _ in PII_PATTERNS
    ]
    red = "pt"
    for _, p, tok in PII_PATTERNS:
        red = f"regexp_replace({red}, '{p}', '{tok}', 'g')"
    return ", ".join(cols) + f", {red} AS redacted"


_T7_SQL = f"""
    WITH t0 AS (SELECT doc_id, {_PII_TEXT_SQL} AS pt FROM documents)
    SELECT doc_id, {_pii_sql_counts()}
    FROM t0 ORDER BY doc_id
"""


@query("t7_pii_redaction", _T7_SQL)
def t7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_common_spark.operators import pii as PII

    docs = load(spark, sf_dir, "documents")["documents"]
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" from 10.0."), F.col("doc_id") % 256, F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
    )
    # t2-class fix (r12): presort below the regex bank so sampling
    # never re-runs detection/redaction (plans/common.presorted).
    from parquet_common_spark.plans.common import presorted

    staged = presorted(docs.select("doc_id", "text"), "doc_id").withColumn(
        "pt", planted
    )
    counts = PII.pii_counts(F.col("pt"))
    return staged.select(
        "doc_id",
        *[c.cast("long").alias(f"n_{n}") for n, c in counts.items()],
        PII.redact_pii(F.col("pt")).alias("redacted"),
    )


# ------------------------------------------------ p4: mixture sampling

from parquet_common_spark.operators import sampling as SMP  # noqa: E402

# Non-uniform target mixture: domain weight = (source index % 3) + 1,
# a pure function of the domain value both engines recompute.
_P4_BUDGET = 200

_P4_SQL = f"""
    WITH per AS (SELECT source, COUNT(*) AS n,
                        (CAST(substr(source, 4) AS INT) % 3) + 1 AS w
                 FROM documents GROUP BY source),
    tot AS (SELECT SUM(w) AS sw FROM per),
    r AS (SELECT source,
                 LEAST(1.0, CAST(w * {_P4_BUDGET} AS DOUBLE) / CAST(sw * n AS DOUBLE)) AS rate
          FROM per, tot)
    SELECT d.doc_id, d.source, ROUND(r.rate, 6) AS rate
    FROM documents d JOIN r ON d.source = r.source
    WHERE (d.doc_id * {SMP.MIX_MULT} + {SMP.MIX_ADD}) % {SMP.MIX_MOD}
          < CAST(floor(r.rate * {SMP.MIX_MOD}) AS BIGINT)
    ORDER BY d.doc_id
"""


@query("p4_mixture_sample", _P4_SQL)
def p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    out = SMP.mixture_sample(
        docs,
        "source",
        "doc_id",
        lambda d: (F.substring(d, 4, 10).cast("int") % 3) + 1,
        budget=_P4_BUDGET,
    )
    return out.select(
        "doc_id", "source", F.round(F.col("_rate"), 6).alias("rate")
    ).orderBy("doc_id")


# ---------------------------------------------- p5: sequence packing

_P5_BUDGET = 512

_P5_SQL = f"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY source, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / {_P5_BUDGET}) AS BIGINT) AS pack_id,
           CAST((cum_tokens - n_tokens) % {_P5_BUDGET} AS BIGINT) AS pack_offset
    FROM c ORDER BY doc_id
"""


@query("p5_sequence_packing", _P5_SQL)
def p5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_common_spark.operators import packing as PK

    docs = load(spark, sf_dir, "documents")["documents"]
    with_tokens = docs.select(
        "doc_id", "source", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    out = PK.pack_sequences(
        with_tokens, ["source", "doc_id"], "n_tokens", budget=_P5_BUDGET
    )
    # r12 (finding 2): one hash repartition of the narrow packed rows
    # materializes the prefix-sum MapInPandas stage under a shuffle, so
    # the final orderBy's range sampling does not re-execute it.
    return (
        out.select(
            "doc_id", "source", "n_tokens", "cum_tokens", "pack_id", "pack_offset"
        )
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ------------------------- c2: curation pipeline v2 (r5 ops composed)

# decontaminate -> repetition-filter -> redact PII -> pack sequences;
# the end-to-end shape of a modern pretraining curation pass.  Every
# stage reuses the single-op query's exact constants, so the oracle is
# assembled from the same SQL fragments.
_C2_BUDGET = 512

_C2_SQL = f"""
    WITH {_DC_CTES},
    bench AS (SELECT DISTINCT unnest(sh) AS h FROM d WHERE source = '{_DC_BENCH_SRC}'),
    corpus AS (SELECT id, unnest(sh) AS h FROM d WHERE source <> '{_DC_BENCH_SRC}'),
    hits AS (SELECT c.id, COUNT(b.h) AS n_hits
             FROM corpus c LEFT JOIN bench b ON c.h = b.h GROUP BY c.id),
    clean AS (SELECT doc.* FROM documents doc
              JOIN hits ON doc.doc_id = hits.id
              WHERE hits.n_hits < {_DC_MIN_HITS}),
    ct0 AS (SELECT doc_id, {_TOKS.format(c='text')} AS toks FROM clean),
    cg AS (SELECT doc_id, toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END AS grams
           FROM ct0),
    cm AS (SELECT doc_id,
            ROUND(CASE WHEN len(toks) > 0
                 THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                 ELSE 0.0 END, 6) AS dupf,
            list_reverse_sort(list_transform(list_distinct(grams),
                x -> {{'c': len(list_filter(grams, y -> y = x)), 'g': x}}))[1] AS top,
            list_sum(list_transform(toks, t -> length(t))) AS total_chars
           FROM cg),
    cr AS (SELECT doc_id, dupf,
            ROUND(CASE WHEN top.g IS NOT NULL AND total_chars > 0
                 THEN CAST(top.c * length(replace(top.g, ' ', '')) AS DOUBLE) / total_chars
                 ELSE 0.0 END, 6) AS topf
           FROM cm),
    kept AS (SELECT c.doc_id, c.source, c.text FROM clean c
             JOIN cr ON c.doc_id = cr.doc_id
             WHERE cr.dupf <= {_REP_DUP_MAX} AND cr.topf <= {_REP_TOP2_MAX}),
    pii AS (SELECT doc_id, source, {_PII_TEXT_SQL} AS pt FROM kept),
    red AS (SELECT doc_id, source, {{red}} AS rtext FROM pii),
    tok AS (SELECT doc_id, source,
                   CAST(len(string_split_regex(trim(rtext), '\\s+')) AS BIGINT) AS n_tokens
            FROM red),
    cum AS (SELECT doc_id, source, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY source, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM tok)
    SELECT doc_id, source, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(floor((cum_tokens - n_tokens) / {_C2_BUDGET}) AS BIGINT) AS pack_id,
           CAST((cum_tokens - n_tokens) % {_C2_BUDGET} AS BIGINT) AS pack_offset
    FROM cum ORDER BY doc_id
"""


def _c2_sql() -> str:
    from parquet_common_spark.operators.pii import PII_PATTERNS

    red = "pt"
    for _, p, tokn in PII_PATTERNS:
        red = f"regexp_replace({red}, '{p}', '{tokn}', 'g')"
    return _C2_SQL.replace("{red}", red)


@query("c2_curation_pipeline_v2", _c2_sql())
def c2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_common_spark.operators import decontam as DC
    from parquet_common_spark.operators import packing as PK
    from parquet_common_spark.operators import pii as PII

    docs = load(spark, sf_dir, "documents")["documents"]
    bench_docs = docs.where(F.col("source") == _DC_BENCH_SRC)
    corpus = docs.where(F.col("source") != _DC_BENCH_SRC)
    clean = DC.decontaminate(
        corpus, bench_docs, "doc_id", "text", n=_DC_N, min_hits=_DC_MIN_HITS
    )
    staged = (
        clean.withColumn("_toks", T.tokens(T.normalize_text(F.col("text"))))
        .withColumn("_grams", T.word_bigrams(F.col("_toks")))
    )
    dupf = F.round(T.duplicate_token_fraction(F.col("_toks")), 6)
    topf = F.round(T.top_bigram_char_fraction(F.col("_grams"), F.col("_toks")), 6)
    kept = (
        staged.withColumn("_dupf", dupf)
        .withColumn("_topf", topf)
        .where((F.col("_dupf") <= _REP_DUP_MAX) & (F.col("_topf") <= _REP_TOP2_MAX))
        .select("doc_id", "source", "text")
    )
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" from 10.0."), F.col("doc_id") % 256, F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
    )
    red = kept.withColumn("_rtext", PII.redact_pii(planted))
    with_tokens = red.select(
        "doc_id", "source", T.token_count(F.col("_rtext")).cast("long").alias("n_tokens")
    )
    packed = PK.pack_sequences(
        with_tokens, ["source", "doc_id"], "n_tokens", budget=_C2_BUDGET
    )
    # r12 (finding 2): materialize the prefix-sum MapInPandas stage (and
    # the whole curation lineage below it) under a hash shuffle so the
    # final orderBy's range sampling does not re-execute it.
    return (
        packed.select(
            "doc_id", "source", "n_tokens", "cum_tokens", "pack_id", "pack_offset"
        )
        .repartition("doc_id")
        .orderBy("doc_id")
    )


@query(
    "x3_bpe_pair_counts",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    e AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
      FROM t)
    SELECT a.tok || ' ' || b.tok AS pair, COUNT(*) AS cnt
    FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 100
    """,
)
def x3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token-pair frequencies — one BPE merge-selection round
    (the inner loop of tokenizer training).  Spark side is a map-only
    pair generator (sequence/element_at Column exprs, posexplode) plus
    ONE map-side-combined hash aggregation; the oracle enumerates the
    same pairs with a positional self-join."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.bpe_pair_counts(docs, "text", top_n=100)


@query(
    "x4_oov_rate",
    r"""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    v AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS freq FROM t
        GROUP BY token ORDER BY freq DESC, token LIMIT 16)),
    j AS (
      SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS known
      FROM t LEFT JOIN v ON t.token = v.token)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(known) AS BIGINT) AS n_known,
           ROUND(1.0 - SUM(known) * 1.0 / COUNT(*), 6) AS oov_rate
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
)
def x4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-16
    vocabulary — the tokenizer-coverage check.  Vocab is built with one
    bounded aggregation and BROADCAST to the corpus scan (the corpus
    never shuffles for the membership probe); per-doc stats are the one
    remaining groupBy.  The synthetic corpus has 31 distinct tokens, so
    top-16 splits known/unknown nontrivially."""
    docs = load(spark, sf_dir, "documents")["documents"]
    vocab = T.top_vocabulary(docs, "text", size=16)
    return T.oov_stats(docs, "doc_id", "text", vocab).orderBy("doc_id")


@query(
    "t8_unigram_ppl",
    r"""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    v AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
    tot AS (SELECT SUM(cnt) AS n FROM v),
    j AS (
      SELECT t.doc_id, ln(v.cnt * 1.0 / tot.n) AS lp
      FROM t JOIN v USING (token) CROSS JOIN tot)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(lp), 6) AS avg_logprob,
           ROUND(EXP(-AVG(lp)), 6) AS ppl
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
)
def t8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM pseudo-perplexity per document — the perplexity-filter
    quality signal.  The model is ONE map-side-combined aggregation;
    scoring is a broadcast join + ONE per-doc groupBy; the corpus never
    shuffles for the model lookup."""
    docs = load(spark, sf_dir, "documents")["documents"]
    model = T.unigram_model(docs, "text")
    return T.doc_perplexity(docs, "doc_id", "text", model).orderBy("doc_id")


# ------------------------------------- t9: linear quality classifier


@query(
    "t9_quality_classifier",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_transform(
               string_split({_NORM.format(c='text')}, ' '),
               t -> (({_phash('t')} % {T.CLS_DIM}) * {T.CLS_MULT} % {T.CLS_MOD})
                    * 1.0 / {T.CLS_MOD} - 0.5) AS ws
      FROM documents),
    s AS (
      SELECT doc_id,
             len(ws) AS n_tokens,
             list_reduce(list_prepend(0.0, ws), (a, b) -> a + b) / len(ws) AS raw
      FROM w)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(1.0 / (1.0 + EXP(-8.0 * raw)), 6) AS quality_prob,
           raw >= 0 AS keep
    FROM s ORDER BY doc_id
    """,
)
def t9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier (see
    operators/text.py quality_classifier): map-only Column expressions,
    zero shuffles, no Python in the hot path; the oracle replays the
    hash, weight formula, fold order, and sigmoid exactly."""
    # t2-class fix (r12): presort below the classifier projection
    # (plans/common.presorted); the hash/fold feature stage runs once.
    from parquet_common_spark.plans.common import presorted

    docs = load(spark, sf_dir, "documents")["documents"]
    s = presorted(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", T.quality_classifier(F.col("text")).alias("_s")
    )
    return s.select(
        "doc_id",
        F.col("_s.n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("_s.prob"), 6).alias("quality_prob"),
        (F.col("_s.raw") >= 0).alias("keep"),
    )


# ------------------------------------------- d8: incremental MinHash

_D8_SPLIT = 300
# the incremental result == the full-corpus d2 pair set restricted to
# pairs touching the new batch (id_a < id_b and new ids are the high
# range, so "touches new" == id_b >= split)
_D8_SQL = _D2_SQL.replace(
    f"WHERE jac >= {_SH_TAU}",
    f"WHERE jac >= {_SH_TAU} AND id_b >= {_D8_SPLIT}",
)


@query("d8_incremental_dedup", _D8_SQL)
def d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: the corpus splits into an
    already-indexed half (doc_id < 300, persisted as a MinHash sketch
    store via build_minhash_index) and a new batch (doc_id >= 300)
    deduped against the index + itself with zero re-shingling of the
    old half.  The oracle is the batch d2 computation restricted to
    pairs touching the new batch — the incremental path must reproduce
    the batch answer bit-for-bit."""
    import tempfile

    docs = load(spark, sf_dir, "documents")["documents"]
    old = docs.where(F.col("doc_id") < _D8_SPLIT)
    new = docs.where(F.col("doc_id") >= _D8_SPLIT)
    idx = tempfile.mkdtemp(prefix="pcs_minhash_idx_")
    D.build_minhash_index(old, "doc_id", "text", idx)
    return D.incremental_minhash_pairs(
        spark, new, "doc_id", "text", idx, tau=_SH_TAU
    ).orderBy("id_a", "id_b")


# --------------------------------------- x5: inter-document dup n-grams

# RefinedWeb/Gopher-style CROSS-document duplicated-n-gram fraction
# (t6 measures repetition WITHIN a doc): per doc, the fraction of its
# distinct 3-gram shingles that also occur in at least one OTHER doc.
_X5_SQL = f"""
    WITH {_SHINGLE_CTES},
    g AS (SELECT id, unnest(sh) AS h FROM docs),
    c AS (SELECT h, COUNT(DISTINCT id) AS nd FROM g GROUP BY h)
    SELECT g.id AS doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(SUM(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS shared_frac
    FROM g JOIN c USING (h)
    GROUP BY g.id ORDER BY doc_id
"""


@query("x5_interdoc_dup_ngrams", _X5_SQL)
def x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of distinct 3-gram shingles shared with any
    other document — the cross-document boilerplate signal.  Plan: one
    explode (generator), ONE groupBy on the shingle hash (distinct-doc
    count), a join back on the SAME key (co-partitioned — no extra
    exchange of the gram stream), and ONE per-doc groupBy.  Key space
    is the distinct shingle universe; at 100 TB both shuffles carry
    (hash, count) pairs, never text."""
    docs = load(spark, sf_dir, "documents")["documents"]
    grams = docs.select(
        F.col("doc_id"), F.explode(D.shingle_hashes(F.col("text"))).alias("h")
    )
    counts = grams.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        grams.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("long").alias("n_shared"),
            F.round(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- sim5: product quantization

def _sim5_sql(n_sub: int = 8, n_codes: int = 8, sd: int = 8) -> str:
    # Replays pq_topk exactly: portable-mix codebook rows sliced per
    # subspace, L2 argmin via |c|^2 - 2 x.c (sequential dot folds both
    # engines), decode-then-fold-dot ADC scoring, (score DESC, id)
    # rank.  list(c ORDER BY m) + flatten rebuilds the decoded vector
    # in subspace order.
    return f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    samp AS (SELECT id, e FROM v
             ORDER BY (id * 2654435761 + 40503) % 999999937, id LIMIT {n_codes}),
    cent AS (SELECT ROW_NUMBER() OVER (ORDER BY id) AS cid, e FROM samp),
    sub AS (SELECT cid, m.range AS m, e[m.range*{sd}+1 : m.range*{sd}+{sd}] AS c
            FROM cent, range({n_sub}) m),
    xs AS (SELECT id, m.range AS m, e[m.range*{sd}+1 : m.range*{sd}+{sd}] AS x
           FROM v, range({n_sub}) m),
    enc AS (SELECT id, m, cid, c,
              ROW_NUMBER() OVER (PARTITION BY id, m
                ORDER BY list_dot_product(c, c) - 2*list_dot_product(x, c) ASC, cid) AS rk
            FROM xs JOIN sub USING (m)),
    dec AS (SELECT id, flatten(list(c ORDER BY m)) AS xhat
            FROM enc WHERE rk = 1 GROUP BY id),
    q AS (SELECT id AS query_id, e AS qe FROM v WHERE id < 5),
    scored AS (SELECT query_id, dec.id AS neighbor_id,
                      list_dot_product(qe, xhat) AS score
               FROM q, dec WHERE dec.id <> query_id),
    ranked AS (SELECT query_id, neighbor_id, score,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(score, 5) AS score, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
    """


@query("sim5_pq_topk", _sim5_sql())
def sim5(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.pq_topk(emb, emb.where(F.col("vec_id") < 5), k=5).orderBy(
        "query_id", "rank"
    )


# ----------------------------------------- d9: span-level decontamination

def _d9_sql() -> str:
    # hits = 1-based shingle positions whose 3-gram hash is in the bench
    # set; token j is masked when a hit h covers it (h <= j <= h+2)
    return f"""
    WITH t0 AS (SELECT doc_id AS id, source, {_TOKS.format(c='text')} AS toks
                FROM documents),
    t1 AS (SELECT id, source, toks,
                  list_transform(toks, t -> {_phash('t')}) AS th
           FROM t0),
    bench0 AS (SELECT id, th FROM t1 WHERE source = '{_DC_BENCH_SRC}'),
    benchsh AS (SELECT DISTINCT unnest(
                  CASE WHEN len(th) >= 3
                  THEN list_transform(generate_series(1, len(th) - 2),
                        i -> (((th[i] * {_K} + th[i+1]) % {_P}) * {_K} + th[i+2]) % {_P})
                  ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th), (a, b) -> (a * {_K} + b) % {_P})]
                  END) AS h
                FROM bench0),
    barr AS (SELECT list(h) AS bh FROM benchsh),
    c AS (SELECT id, toks, th FROM t1 WHERE source <> '{_DC_BENCH_SRC}'),
    h AS (SELECT id, toks,
                 CASE WHEN len(th) >= 3 THEN
                   list_filter(generate_series(1, len(th) - 2),
                     i -> list_contains(bh, (((th[i] * {_K} + th[i+1]) % {_P}) * {_K} + th[i+2]) % {_P}))
                 ELSE [] END AS hits
          FROM c, barr)
    SELECT id AS doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(generate_series(1, len(toks)),
                j -> len(list_filter(hits, hh -> j >= hh AND j <= hh + 2)) > 0))
             AS BIGINT) AS n_masked,
           array_to_string(list_transform(generate_series(1, len(toks)),
                j -> CASE WHEN len(list_filter(hits, hh -> j >= hh AND j <= hh + 2)) > 0
                          THEN '__MASK__' ELSE toks[j] END), ' ') AS cleaned_text
    FROM h ORDER BY doc_id
    """


@query("d9_span_decontam", _d9_sql())
def d9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (the masking variant of d7): tokens
    covered by a benchmark-overlapping 3-gram are replaced, the rest of
    the document survives.  Map-only Column expressions after a one-row
    broadcast of the benchmark n-gram array."""
    from parquet_common_spark.operators.decontam import mask_contaminated_spans

    docs = load(spark, sf_dir, "documents")["documents"]
    bench = docs.where(F.col("source") == _DC_BENCH_SRC)
    corpus = docs.where(F.col("source") != _DC_BENCH_SRC)
    return mask_contaminated_spans(corpus, bench, "doc_id", "text", n=_DC_N).orderBy(
        "doc_id"
    )


# ------------------------------------- d11: train/val split leakage audit

# key_mix constants (operators/sampling.py) — the split is a pure
# function of the id, reproduced verbatim in the oracle
_MIX = "((({id}) * 2654435761 + 40503) % 999999937)"
_D11_VAL_PERMILLE = 100

_D11_SQL = f"""
    WITH {_DC_CTES},
    s AS (SELECT id, sh,
             CASE WHEN {_MIX.format(id='id')} % 1000 < {_D11_VAL_PERMILLE}
                  THEN 'val' ELSE 'train' END AS split
          FROM d),
    train_h AS (SELECT DISTINCT h
                FROM (SELECT unnest(sh) AS h FROM s WHERE split = 'train')),
    probe AS (SELECT id, unnest(sh) AS h FROM s WHERE split = 'val'),
    agg AS (SELECT p.id, COUNT(*) AS n_shingles, COUNT(t.h) AS n_leaked
            FROM probe p LEFT JOIN train_h t ON p.h = t.h
            GROUP BY p.id)
    SELECT id AS doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_leaked AS BIGINT) AS n_leaked,
           n_leaked > 0 AS leaked
    FROM agg ORDER BY doc_id
    """


@query("d11_split_leakage", _D11_SQL)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split hygiene audit: deterministic ~10% val split, then per val
    document the count of its distinct 3-gram hashes that also occur in
    any train document (the leakage a contamination-blind random split
    ships to eval)."""
    from parquet_common_spark.operators.decontam import split_leakage

    docs = load(spark, sf_dir, "documents")["documents"]
    return split_leakage(
        docs, "doc_id", "text", n=_DC_N, val_permille=_D11_VAL_PERMILLE, seed=0
    ).orderBy("doc_id")


# -------------------------------------------- p6: deterministic epoch order

_P6_SEED = 17
_P6_TAKE = 200

_P6_SQL = f"""
    SELECT doc_id, pos FROM (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY {_MIX.format(id=f'doc_id + {_P6_SEED}')}, doc_id
               ) AS pos
        FROM documents)
    WHERE pos <= {_P6_TAKE} ORDER BY pos
    """


@query("p6_epoch_shuffle", _P6_SQL)
def p6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle (epoch reshuffle by
    seed): the first rows of the seed-17 epoch order.  The full-corpus
    form is a range exchange + per-partition sort (sampling.shuffle_order);
    the registry query takes the global head, which Catalyst plans as
    TakeOrdered (per-partition heaps, no full sort).  The row_number
    window runs AFTER the limit, over the already-tiny head."""
    from pyspark.sql import Window
    from parquet_common_spark.operators import sampling as S

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")
    head = S.shuffle_order(docs, "doc_id", seed=_P6_SEED).limit(_P6_TAKE)
    w = Window.orderBy("_pos", "doc_id")
    return (
        head.withColumn("pos", F.row_number().over(w))
        .select("doc_id", "pos")
        .orderBy("pos")
    )


# ---------------------------------------- x6: cross-source overlap matrix

# hot-hash flood guard, mirrored in the oracle (see text.source_overlap)
_X6_CAP = 64

_X6_SQL = f"""
    WITH {_DC_CTES},
    g AS (SELECT id, unnest(sh) AS h, source FROM d),
    ok AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) <= {_X6_CAP}),
    hs AS (SELECT DISTINCT h, source FROM g JOIN ok USING (h)),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b
              FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source)
    SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b
    """


@query("x6_source_overlap", _X6_SQL)
def x6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: distinct 3-gram hashes shared by
    each unordered source pair — the corpus-audit view for spotting
    mirrored crawls before mixing sources into a run.  Runs WITH the
    hot-hash flood guard (max_doc_freq) so the capped semantics are
    what the oracle hash-checks."""
    from parquet_common_spark.operators.text import source_overlap

    docs = load(spark, sf_dir, "documents")["documents"]
    return source_overlap(
        docs, "source", "text", "doc_id", n=_DC_N, max_doc_freq=_X6_CAP
    ).orderBy("src_a", "src_b")


# ------------------------- p7: temperature-based mixture (alpha = 0.5)

_P7_BUDGET = 200
_P7_SCALE = 1000

_P7_SQL = f"""
    WITH per AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n,
                 CAST(floor(sqrt(CAST(n AS DOUBLE)) * {_P7_SCALE}) AS BIGINT) AS w
          FROM per),
    tot AS (SELECT SUM(w) AS sw FROM w),
    r AS (SELECT source,
                 LEAST(1.0, CAST(w * {_P7_BUDGET} AS DOUBLE)
                            / CAST(sw * n AS DOUBLE)) AS rate
          FROM w, tot)
    SELECT d.doc_id, d.source, ROUND(r.rate, 6) AS rate
    FROM documents d JOIN r ON d.source = r.source
    WHERE (d.doc_id * {SMP.MIX_MULT} + {SMP.MIX_ADD}) % {SMP.MIX_MOD}
          < CAST(floor(r.rate * {SMP.MIX_MOD}) AS BIGINT)
    ORDER BY d.doc_id
"""


@query("p7_temperature_mixture", _P7_SQL)
def p7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/XLM-R-style temperature upsampling (p_d proportional to
    n_d^0.5): the mixture weight is a deterministic function of the
    OBSERVED domain sizes instead of p4's supplied targets — the other
    half of the mixture-construction surface."""
    docs = load(spark, sf_dir, "documents")["documents"]
    out = SMP.temperature_mixture(
        docs, "source", "doc_id", budget=_P7_BUDGET, weight_scale=_P7_SCALE
    )
    return out.select(
        "doc_id", "source", F.round(F.col("_rate"), 6).alias("rate")
    ).orderBy("doc_id")


# --------------------------- x7: train/val split drift report (PSI)

_X7_FRAC = 0.8
_X7_THR = int(_X7_FRAC * SMP.MIX_MOD)

_X7_SQL = f"""
    WITH s AS (SELECT source,
                      CASE WHEN (doc_id * {SMP.MIX_MULT} + {SMP.MIX_ADD})
                                % {SMP.MIX_MOD} < {_X7_THR}
                           THEN 1 ELSE 0 END AS it
               FROM documents),
    per AS (SELECT source,
                   CAST(SUM(it) AS BIGINT) AS n_train,
                   CAST(SUM(1 - it) AS BIGINT) AS n_val
            FROM s GROUP BY source),
    tot AS (SELECT CAST(SUM(n_train) AS BIGINT) AS nt,
                   CAST(SUM(n_val) AS BIGINT) AS nv,
                   CAST(COUNT(*) AS BIGINT) AS s
            FROM per)
    SELECT source, n_train, n_val,
           ROUND(CAST(2 * n_train + 1 AS DOUBLE) / CAST(2 * nt + s AS DOUBLE), 6)
             AS p_train,
           ROUND(CAST(2 * n_val + 1 AS DOUBLE) / CAST(2 * nv + s AS DOUBLE), 6)
             AS p_val,
           ROUND((CAST(2 * n_train + 1 AS DOUBLE) / CAST(2 * nt + s AS DOUBLE)
                  - CAST(2 * n_val + 1 AS DOUBLE) / CAST(2 * nv + s AS DOUBLE))
                 * ln((CAST(2 * n_train + 1 AS DOUBLE) * CAST(2 * nv + s AS DOUBLE))
                      / (CAST(2 * n_val + 1 AS DOUBLE) * CAST(2 * nt + s AS DOUBLE))), 6)
             AS psi_term
    FROM per, tot ORDER BY source
"""


@query("x7_split_drift", _X7_SQL)
def x7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift report between the deterministic
    hash-split train/val halves — the pre-training sanity check that the
    split did not skew the domain mixture."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return SMP.split_psi(docs, "source", "doc_id", train_frac=_X7_FRAC).orderBy(
        "source"
    )


# ------------------------ sim6: contrastive hard-negative mining

_SIM6_SQL = f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS ql
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                 label AS cl
          FROM embeddings),
    scored AS (SELECT query_id, neighbor_id, {{cos}} AS cos
               FROM q, c WHERE query_id <> neighbor_id AND ql <> cl),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored)
    SELECT query_id, neighbor_id, ROUND(cos, 5) AS cos, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
""".format(cos=_COSSQL.format(a="qv", b="cv"))


@query("sim6_hard_negatives", _SIM6_SQL)
def sim6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: the k nearest corpus vectors with a label
    DIFFERENT from the query's — the contrastive-training batch
    construction step (triplet / InfoNCE)."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.hard_negatives(
        emb, emb.where(F.col("vec_id") < 5), label_col="label", k=5
    ).orderBy("query_id", "rank")


# --------------------- t10: interpolated bigram LM perplexity filter

_T10_SQL = r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    e AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
      FROM t),
    p AS (
      SELECT a.doc_id, a.tok AS ta, b.tok AS tb
      FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
    bc AS (SELECT ta, tb, COUNT(*) AS cab FROM p GROUP BY ta, tb),
    uni AS (SELECT tok AS token, COUNT(*) AS cnt FROM e GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS n FROM uni),
    m AS (
      SELECT bc.ta, bc.tb,
             ln(0.75 * (CAST(cab AS DOUBLE) / CAST(ua.cnt AS DOUBLE))
                + 0.25 * (CAST(ub.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS lp
      FROM bc
      JOIN uni ua ON bc.ta = ua.token
      JOIN uni ub ON bc.tb = ub.token
      CROSS JOIN tot),
    j AS (SELECT p.doc_id, m.lp
          FROM p JOIN m ON p.ta = m.ta AND p.tb = m.tb)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(lp), 6) AS avg_logprob,
           ROUND(EXP(-AVG(lp)), 6) AS ppl
    FROM j GROUP BY doc_id ORDER BY doc_id
"""


@query("t10_bigram_ppl", _T10_SQL)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer-interpolated bigram-LM perplexity per document —
    the next rung of the CCNet LM-filter ladder above t8's unigram
    model.  Model = two map-side-combined groupBys + broadcast unigram
    lookups; scoring = broadcast model join + ONE per-doc groupBy."""
    docs = load(spark, sf_dir, "documents")["documents"]
    model = T.bigram_model(docs, "text")
    return T.doc_bigram_perplexity(docs, "doc_id", "text", model).orderBy("doc_id")


# --------------------- p8: length-bucketed batch construction

_P8_WIDTH = 16
_P8_MAXB = 15
_P8_BATCH = 8

_P8_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, n_tok,
             LEAST(CAST(floor(CAST(n_tok AS DOUBLE) / {_P8_WIDTH}) AS BIGINT),
                   {_P8_MAXB}) AS bucket
      FROM t),
    r AS (
      SELECT bucket, n_tok,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS idx
      FROM b),
    g AS (
      SELECT bucket,
             CAST(floor(CAST(idx - 1 AS DOUBLE) / {_P8_BATCH}) AS BIGINT)
               AS batch_id,
             n_tok
      FROM r)
    SELECT bucket, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tok) AS BIGINT) AS max_len,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE)
                 / CAST(COUNT(*) * MAX(n_tok) AS DOUBLE), 6) AS pad_efficiency
    FROM g GROUP BY bucket, batch_id ORDER BY bucket, batch_id
"""


@query("p8_length_buckets", _P8_SQL)
def p8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch construction with per-batch padding
    efficiency — the packing alternative for padded (non-concatenated)
    training.  The within-bucket row index reuses the distributed
    prefix sum (packing.global_cumsum) instead of a per-bucket window,
    so the scan stays fully parallel at 100 TB."""
    from parquet_common_spark.operators import packing as PK

    docs = load(spark, sf_dir, "documents")["documents"]
    with_tokens = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tok")
    )
    out = PK.length_bucketed_batches(
        with_tokens, "doc_id", "n_tok",
        bucket_width=_P8_WIDTH, max_bucket=_P8_MAXB, batch_size=_P8_BATCH,
    )
    return out.orderBy("bucket", "batch_id")


# ------------------------ sim7: MMR-diversified re-rank

_SIM7_K = 3
_SIM7_POOL = 20
_SIM7_LAM = 0.7
# the kernel computes (1 - lam) in float arithmetic; repr() round-trips
# the exact double so the SQL literal matches bit-for-bit
_SIM7_OML = repr(1.0 - _SIM7_LAM)


def _sim7_sql() -> str:
    cos_qc = _COSSQL.format(a="qv", b="cv")
    cos_c1 = _COSSQL.format(a="p.cv", b="s1.v1")
    cos_c2 = _COSSQL.format(a="p.cv", b="s2.v2")
    return f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (SELECT query_id, neighbor_id, cv, {cos_qc} AS cos
               FROM q, c WHERE query_id <> neighbor_id),
    pool AS (SELECT * FROM (
        SELECT query_id, neighbor_id, cv, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= {_SIM7_POOL}),
    s1 AS (SELECT query_id, neighbor_id AS n1, cv AS v1, cos AS sc1
           FROM pool WHERE rn = 1),
    r2 AS (SELECT p.query_id, p.neighbor_id, p.cv, p.cos,
                  {_SIM7_LAM} * p.cos - {_SIM7_OML} * ({cos_c1}) AS score
           FROM pool p JOIN s1 ON p.query_id = s1.query_id
           WHERE p.neighbor_id <> s1.n1),
    s2 AS (SELECT query_id, neighbor_id AS n2, cv AS v2, score AS sc2 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id) AS rr
            FROM r2) WHERE rr = 1),
    r3 AS (SELECT p.query_id, p.neighbor_id, p.cos,
                  {_SIM7_LAM} * p.cos
                  - {_SIM7_OML} * GREATEST({cos_c1}, {cos_c2}) AS score
           FROM pool p
           JOIN s1 ON p.query_id = s1.query_id
           JOIN s2 ON p.query_id = s2.query_id
           WHERE p.neighbor_id <> s1.n1 AND p.neighbor_id <> s2.n2),
    s3 AS (SELECT query_id, neighbor_id AS n3, score AS sc3 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id) AS rr
            FROM r3) WHERE rr = 1)
    SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,
           ROUND(score, 5) AS score
    FROM (
      SELECT query_id, n1 AS neighbor_id, 1 AS mmr_rank, sc1 AS score FROM s1
      UNION ALL SELECT query_id, n2, 2, sc2 FROM s2
      UNION ALL SELECT query_id, n3, 3, sc3 FROM s3)
    ORDER BY query_id, mmr_rank
    """


@query("sim7_mmr_rerank", _sim7_sql())
def sim7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k over the brute-force
    candidate pool — greedy selection unrolled step-by-step in the
    oracle (rank 1 = pure-relevance argmax; later ranks maximize
    lam*cos - (1-lam)*max-sim-to-selected).  The quadratic part is
    pool^2 inside a per-query applyInPandas group, never corpus^2."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # r12 (finding 2): one hash repartition of the narrow reranked rows
    # materializes the greedy applyInPandas stage under a shuffle, so the
    # final orderBy's range sampling does not re-execute it.
    return (
        SIM.mmr_topk(
            emb, emb.where(F.col("vec_id") < 3),
            k=_SIM7_K, pool=_SIM7_POOL, lam=_SIM7_LAM,
        )
        .repartition("query_id")
        .orderBy("query_id", "mmr_rank")
    )


# --------------------------- t11: Flesch reading-ease readability

_T11_SQL = r"""
    WITH s AS (
      SELECT doc_id,
             CAST(GREATEST(len(string_split_regex(trim(text), '\s+')), 1)
                  AS DOUBLE) AS w,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS sn,
             CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                  AS DOUBLE) AS sy
      FROM documents)
    SELECT doc_id,
           CAST(w AS BIGINT) AS n_words,
           CAST(sn AS BIGINT) AS n_sentences,
           CAST(sy AS BIGINT) AS n_syllables,
           ROUND(206.835 - 1.015 * (w / sn) - 84.6 * (sy / w), 6) AS flesch
    FROM s ORDER BY doc_id
"""


@query("t11_readability", _T11_SQL)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from three JVM regexp counts —
    map-only Column expressions, zero shuffles, zero Python (see
    text.readability)."""
    # t2-class fix (r12): presort below the regex projections
    # (plans/common.presorted); each regexp_count runs once.
    from parquet_common_spark.plans.common import presorted

    docs = load(spark, sf_dir, "documents")["documents"]
    src = presorted(docs.select("doc_id", "text"), "doc_id")
    words = F.greatest(F.size(T.tokens(F.col("text"))), F.lit(1))
    sents = F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1))
    sylls = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")), F.lit(1)
    )
    return src.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        F.round(T.readability(F.col("text")), 6).alias("flesch"),
    )


# ------------------------------- x9: Zipf-exponent corpus health

_X9_TOP = 20

_X9_SQL = rf"""
    WITH t AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    c AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY token),
    r AS (SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank, freq
          FROM c ORDER BY freq DESC, token LIMIT {_X9_TOP}),
    xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
           FROM r),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sx2
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_tokens_ranked,
           ROUND((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n, 6)
             AS intercept
    FROM s
"""


@query("x9_zipf_fit", _X9_SQL)
def x9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law OLS fit over the top-20 token frequencies — the
    corpus-health profile check (see text.zipf_fit): one token groupBy,
    a TakeOrdered head, closed-form regression over the tiny frame."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.zipf_fit(docs, "text", top_n=_X9_TOP)


# -------------------- d12: exact-substring (character-run) dedup

_D12_LEN = 32
# hot-hash flood guard: grams in more docs than this are dropped before
# the pair self-join (mirrored in the oracle — the CAPPED semantics are
# what's hash-checked)
_D12_CAP = 64

_D12_SQL = f"""
    WITH t0 AS (SELECT doc_id AS id, {_NORM.format(c='text')} AS s FROM documents),
    t1 AS (SELECT id,
                  list_distinct(list_transform(
                      generate_series(1, length(s) - {_D12_LEN - 1}),
                      i -> {_phash(f'substr(s, i, {_D12_LEN})')})) AS sh
           FROM t0 WHERE length(s) >= {_D12_LEN}),
    e AS (SELECT id, unnest(sh) AS h FROM t1),
    ok AS (SELECT h FROM e GROUP BY h HAVING COUNT(*) <= {_D12_CAP}),
    e2 AS (SELECT e.id, e.h FROM e JOIN ok USING (h))
    SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM e2 a JOIN e2 b ON a.h = b.h AND a.id < b.id
    GROUP BY id_a, id_b ORDER BY id_a, id_b
"""


@query("d12_substring_dedup", _D12_SQL)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate pairs (shared 32-char normalized runs)
    — the character-level dedup the token-family (d1-d4) can't express;
    see dedup.substring_dup_pairs for the recall-1.0 argument and the
    100 TB join posture.  Runs WITH the hot-hash flood guard
    (max_doc_freq) so the capped semantics — the shape that survives a
    boilerplate flood — are what the oracle hash-checks."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return D.substring_dup_pairs(
        docs, "doc_id", "text", min_len=_D12_LEN, max_doc_freq=_D12_CAP
    ).orderBy("id_a", "id_b")


# ------------------- p9: best-within-token-budget curation selection

_P9_BUDGET = 2000

_P9_SQL = rf"""
    WITH q AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, quality, n_tokens,
             SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM q)
    SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens - n_tokens < {_P9_BUDGET}
    ORDER BY doc_id
"""


@query("p9_quality_budget_selection", _P9_SQL)
def p9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy highest-quality-first selection under a global token
    budget — "the best 2000 tokens of the corpus" (see
    packing.select_best_within_budget): the ranking+cumsum is the
    distributed prefix sum over (quality desc, doc_id), the keep test a
    map-only comparison; deterministic and budget-monotone."""
    from parquet_common_spark.operators import packing as PK

    docs = load(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    out = PK.select_best_within_budget(
        scored, "doc_id", "n_tokens", "quality", budget=_P9_BUDGET
    )
    # r12 (finding 2): materialize the prefix-sum MapInPandas stage under
    # a hash shuffle so the final orderBy's range sampling does not
    # re-execute it.
    return (
        out.select("doc_id", "quality", "n_tokens", "cum_tokens")
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ----------------------- x10: vocabulary coverage curve

_X10_SQL = r"""
    WITH t AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
    cu AS (SELECT token, cnt,
                  SUM(cnt) OVER (ORDER BY cnt DESC, token
                                 ROWS UNBOUNDED PRECEDING) AS cum
           FROM c),
    tot AS (SELECT SUM(cnt) AS t FROM c)
    SELECT CAST(MAX(tot.t) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN CAST(cum AS DOUBLE) < 0.5 * CAST(tot.t AS DOUBLE)
                    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS v_50,
           CAST(SUM(CASE WHEN CAST(cum AS DOUBLE) < 0.75 * CAST(tot.t AS DOUBLE)
                    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS v_75,
           CAST(SUM(CASE WHEN CAST(cum AS DOUBLE) < 0.9 * CAST(tot.t AS DOUBLE)
                    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS v_90,
           CAST(SUM(CASE WHEN CAST(cum AS DOUBLE) < 0.99 * CAST(tot.t AS DOUBLE)
                    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS v_99
    FROM cu, tot
"""


@query("x10_vocab_coverage", _X10_SQL)
def x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (smallest vocab covering 50/75/90/99 %
    of token occurrences) — the tokenizer-sizing metric; distributed
    prefix sum over (freq desc, token), no single-task window (see
    text.vocab_coverage)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.vocab_coverage(docs, "text", thresholds=(0.5, 0.75, 0.9, 0.99))


# ------------- p11: skew-proof fixed-k-per-group deterministic sample

_P11_K = 20
_P11_SALTS = 8

_P11_SQL = f"""
    WITH r AS (SELECT doc_id, source,
                      ROW_NUMBER() OVER (PARTITION BY source
                          ORDER BY (doc_id * {SMP.MIX_MULT} + {SMP.MIX_ADD})
                                   % {SMP.MIX_MOD}, doc_id) AS rn
               FROM documents)
    SELECT doc_id, source, CAST(rn AS INT) AS rank
    FROM r WHERE rn <= {_P11_K} ORDER BY source, rank
"""


@query("p11_per_group_sample", _P11_SQL)
def p11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-source sample selected in TWO bounded phases
    (salt-bucket top-k, then top-k of the ≤ salts*k survivors) — exactly
    equal to the single-window ROW_NUMBER oracle, but no task ever sorts
    more than |group|/salts rows, which is what survives a source owning
    half a 100 TB corpus (see sampling.fixed_k_per_group)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return SMP.fixed_k_per_group(
        docs, "source", "doc_id", k=_P11_K, salts=_P11_SALTS
    ).orderBy("source", "rank")


# ------------- p12: curriculum ordering with source interleaving

_P12_WIDTH = 100

_P12_SQL = f"""
    SELECT doc_id, source,
           CAST(floor(n_chars / {_P12_WIDTH}) AS BIGINT) AS bucket,
           CAST(ROW_NUMBER() OVER (PARTITION BY source, floor(n_chars / {_P12_WIDTH})
                                   ORDER BY n_chars, doc_id) AS INT) AS slot
    FROM documents
    ORDER BY bucket, slot, source
"""


@query("p12_curriculum_order", _P12_SQL)
def p12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: fixed-width difficulty buckets (length as
    the difficulty proxy — data-independent, no global quantile pass)
    ranked within (source, bucket); consuming by (bucket, slot, source)
    yields easy→hard progression with round-robin source interleaving
    and no global window anywhere (see sampling.curriculum_order)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return SMP.curriculum_order(
        docs, "source", "n_chars", "doc_id", bucket_width=_P12_WIDTH
    ).orderBy("bucket", "slot", "source")


# ------------- x8: held-out n-gram novelty per source

_X8_FRAC = 0.8
_X8_THR = int(_X8_FRAC * SMP.MIX_MOD)

_X8_SQL = f"""
    WITH {_DC_CTES},
    g AS (SELECT id, source, unnest(sh) AS h,
                 ((id * {SMP.MIX_MULT} + {SMP.MIX_ADD}) % {SMP.MIX_MOD})
                   < {_X8_THR} AS tr
          FROM d),
    train AS (SELECT DISTINCT h FROM g WHERE tr),
    val AS (SELECT DISTINCT source, h FROM g WHERE NOT tr),
    novel AS (SELECT v.source, v.h
              FROM val v LEFT JOIN train t USING (h) WHERE t.h IS NULL),
    pv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_val_grams
           FROM val GROUP BY source),
    pn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_novel
           FROM novel GROUP BY source)
    SELECT pv.source, n_val_grams,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(CAST(COALESCE(n_novel, 0) AS DOUBLE) / n_val_grams, 6)
             AS novelty_rate
    FROM pv LEFT JOIN pn USING (source) ORDER BY source
"""


@query("x8_ngram_novelty", _X8_SQL)
def x8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out 3-gram novelty per source: the fraction of the val
    split's distinct gram hashes never seen in train — low novelty means
    the split leaks train phrasing.  Train reduces to DISTINCT hashes
    (vocabulary-bounded, not corpus-bounded); novelty is one left-anti
    equi-join; no self-join, so no hot-hash flood surface (see
    text.split_novelty)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.split_novelty(
        docs, "source", "text", "doc_id", n=_DC_N, train_frac=_X8_FRAC
    ).orderBy("source")


# ------------- t13: BM25 retrieval top-k

_T13_QUERIES = [(0, "table scan fast"), (1, "stream window agg"),
                (2, "customer order value")]
_T13_K = 10
_T13_K1 = 1.2
_T13_B = 0.75

_T13_VALUES = ", ".join(
    f"({qid}, '{tok}')"
    for qid, qtext in _T13_QUERIES
    for tok in dict.fromkeys(qtext.split())
)

# float discipline: the non-binary-exact constants (2.2, 1.2) are CAST
# AS DOUBLE so DuckDB doesn't run them as DECIMALs; per-term scores are
# rounded to 9dp and summed as exact decimals (order-insensitive), the
# final 6dp round happens on the double cast (tie probability
# measure-zero, unlike rounding the exact decimal — see dsum docstring).
_T13_SQL = f"""
    WITH q(query_id, tok) AS (VALUES {_T13_VALUES}),
    toks AS (SELECT doc_id, unnest({_RAW_TOKS.format(c='text')}) AS tok
             FROM documents),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    tf AS (SELECT q.query_id, t.doc_id, q.tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks t JOIN q ON t.tok = q.tok GROUP BY 1, 2, 3),
    dfreq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tf GROUP BY tok),
    scored AS (SELECT tf.query_id, tf.doc_id,
        ROUND(CAST(SUM(CAST(ROUND(
            ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * (tf * CAST({_T13_K1 + 1.0} AS DOUBLE))
            / (tf + CAST({_T13_K1} AS DOUBLE)
                    * ({1.0 - _T13_B} + {_T13_B} * dl / avgdl)), 9)
          AS DECIMAL(27,9))) AS DOUBLE), 6) AS score
        FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY tf.query_id, tf.doc_id),
    r AS (SELECT query_id, doc_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank
    FROM r WHERE rn <= {_T13_K} ORDER BY query_id, rank
"""


@query("t13_bm25_retrieval", _T13_SQL)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over the corpus for a literal query set —
    the relevance scorer for topical data curation.  One corpus token
    explode feeds doc lengths and the broadcast-term postings; document
    frequencies and (n_docs, avgdl) are vocabulary-sized broadcasts;
    the per-query top-k is the two-phase salted ranking (see
    text.bm25_topk)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.bm25_topk(
        docs, _T13_QUERIES, "text", "doc_id", k=_T13_K, k1=_T13_K1, b=_T13_B
    ).orderBy("query_id", "rank")


# ------------- c3: canonical selection — keep the BEST doc per cluster

_C3_SQL = f"""
    WITH RECURSIVE {_SHINGLE_CTES},
    sigs AS (SELECT id, sh, [{_sig_sql}] AS sig FROM docs),
    bands AS (SELECT id, unnest([{_band_sql}]) AS band FROM sigs),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN docs da ON da.id = cand.id_a JOIN docs db ON db.id = cand.id_b
              WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(da.sh || db.sh)) AS DOUBLE) >= {_SH_TAU}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT src AS id, dst AS peer FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src
    ),
    labels AS (
      SELECT id, least(id, MIN(peer)) AS component FROM reach GROUP BY id),
    q AS (SELECT d.doc_id AS id, {_QUALITY_SQL} AS quality FROM documents d),
    m AS (SELECT l.component, l.id, q.quality,
                 ROW_NUMBER() OVER (PARTITION BY l.component
                                    ORDER BY q.quality DESC, l.id) AS rn,
                 COUNT(*) OVER (PARTITION BY l.component) AS n_members
          FROM labels l JOIN q ON q.id = l.id)
    SELECT component AS cluster_id, id AS keep_id, quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM m WHERE rn = 1 AND n_members >= 2 ORDER BY cluster_id
"""


@query("c3_canonical_selection", _C3_SQL)
def c3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document election: d6's duplicate clusters, but the
    survivor is the HIGHEST-QUALITY member (t2's deterministic scorer,
    doc_id tie-break) instead of the min id — the real curation step
    where clusters keep their best representative.  Reuses the cached
    LSH pair set and the batched pointer-jumping components; the
    election is two windows over cluster-sized partitions."""
    from pyspark.sql import Window

    from parquet_common_spark.operators.components import connected_components

    pairs = _minhash_pairs(spark, sf_dir)
    cc = connected_components(pairs)
    docs = load(spark, sf_dir, "documents")["documents"]
    q = docs.select(
        F.col("doc_id").alias("id"), T.quality_score(F.col("text")).alias("quality")
    )
    m = cc.join(q, "id")
    wn = Window.partitionBy("component")
    wr = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("id"))
    return (
        m.withColumn("n_members", F.count(F.lit(1)).over(wn))
        .withColumn("rn", F.row_number().over(wr))
        .where((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            F.col("component").alias("cluster_id"),
            F.col("id").alias("keep_id"),
            "quality",
            F.col("n_members").cast("long").alias("n_members"),
        )
        .orderBy("cluster_id")
    )


# ------------- x11: dedup savings accounting (dataset-card metric)

_X11_SQL = f"""
    WITH d AS (SELECT doc_id, source, {_NORM.format(c='text')} AS norm,
                      len({_TOKS.format(c='text')}) AS n_tok
               FROM documents),
    keep AS (SELECT norm, MIN(doc_id) AS keep_id FROM d GROUP BY norm)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN doc_id = keep_id THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           ROUND(1.0 - CAST(SUM(CASE WHEN doc_id = keep_id THEN n_tok ELSE 0 END)
                            AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6)
             AS token_savings
    FROM d JOIN keep USING (norm)
    GROUP BY source ORDER BY source
"""


@query("x11_dedup_savings", _X11_SQL)
def x11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card accounting for exact dedup: per source, documents
    and tokens kept under keep-first (min doc_id per normalized text)
    semantics, and the token savings rate.  The keep set comes from a
    map-side-combined groupBy(norm).min — NOT a per-norm window — so a
    boilerplate flood (one norm owning half the corpus) stays a partial
    aggregate, never a single-task sort."""
    docs = load(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "doc_id",
        "source",
        T.normalize_text(F.col("text")).alias("norm"),
        T.token_count(F.col("text")).alias("n_tok"),
    )
    keep = d.groupBy("norm").agg(F.min("doc_id").alias("keep_id"))
    j = d.join(keep, "norm")
    kept = (F.col("doc_id") == F.col("keep_id")).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(kept * F.col("n_tok")).cast("long").alias("tokens_kept"),
            F.round(
                F.lit(1.0)
                - F.sum(kept * F.col("n_tok")).cast("double")
                / F.sum("n_tok").cast("double"),
                6,
            ).alias("token_savings"),
        )
        .orderBy("source")
    )


@query(
    "mm6_flac_checksum",
    """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 300 + 40 AS BIGINT) AS n_frames,
                      CAST(doc_id % 2 + 1 AS INT) AS n_channels
               FROM documents WHERE doc_id < 48),
    g AS (SELECT d.doc_id, d.n_frames, d.n_channels,
                 i.range AS i, c.range AS c
          FROM d, range(340) i, range(2) c
          WHERE i.range < d.n_frames AND c.range < d.n_channels)
    SELECT doc_id, n_frames, n_channels,
           CAST(SUM((doc_id*37 + i*11 + c*13) % 4001 - 2000) AS BIGINT)
             AS sample_sum
    FROM g GROUP BY doc_id, n_frames, n_channels ORDER BY doc_id
    """,
)
def mm6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL FLAC codec through the driver gate (same discipline as
    mm5's PNG pin): deterministic PCM per doc is encoded with cycling
    subframe types (verbatim / fixed1 / fixed2 / LPC) and stereo modes
    (independent / mid-side), decoded back with
    functions/flaccodec.flac_samples (Rice partitions, predictors, CRC
    verification on every frame), and sample-checksummed in an Arrow
    map stage.  FLAC is lossless, so the checksum equals the
    closed-form sum the DuckDB oracle computes from the sample
    definition — any Rice/predictor/bit-packing/decorrelation defect
    breaks the hash."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 48).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("n_channels", IntegerType()),
            StructField("sample_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import flaccodec as FC

        subs = ["verbatim", "fixed1", "fixed2", "lpc"]
        for pdf in it:
            out = {"doc_id": [], "n_frames": [], "n_channels": [], "sample_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 300 + 40
                nch = d % 2 + 1
                i = np.arange(n)[:, None]
                c = np.arange(nch)[None, :]
                pcm = ((d * 37 + i * 11 + c * 13) % 4001 - 2000).astype(np.int64)
                mode = "ms" if nch == 2 else "indep"
                data = FC.flac_encode(
                    pcm, rate=8000, bits=16, blocksize=64,
                    stereo_mode=mode, subframe=subs[d % 4],
                    partition_order=(d % 3) if subs[d % 4] != "verbatim" else 0,
                )
                got, _rate = FC.flac_samples(data)
                assert got.shape == (n, nch)
                out["doc_id"].append(d)
                out["n_frames"].append(n)
                out["n_channels"].append(nch)
                out["sample_sum"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


@query(
    "gr1_pagerank",
    """
    WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    edges AS (SELECT CAST(p AS BIGINT) AS src, CAST(1000000 + s AS BIGINT) AS dst FROM e0
              UNION ALL
              SELECT CAST(1000000 + s AS BIGINT), CAST(p AS BIGINT) FROM e0),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM deg, nn),
    r1 AS (SELECT x.node, 0.15 / nn.n + 0.85 * x.contrib AS rank
           FROM (SELECT e.dst AS node, SUM(r.rank / g.outdeg) AS contrib
                 FROM edges e JOIN r0 r ON r.node = e.src
                 JOIN deg g ON g.node = e.src GROUP BY e.dst) x, nn),
    r2 AS (SELECT x.node, 0.15 / nn.n + 0.85 * x.contrib AS rank
           FROM (SELECT e.dst AS node, SUM(r.rank / g.outdeg) AS contrib
                 FROM edges e JOIN r1 r ON r.node = e.src
                 JOIN deg g ON g.node = e.src GROUP BY e.dst) x, nn),
    r3 AS (SELECT x.node, 0.15 / nn.n + 0.85 * x.contrib AS rank
           FROM (SELECT e.dst AS node, SUM(r.rank / g.outdeg) AS contrib
                 FROM edges e JOIN r2 r ON r.node = e.src
                 JOIN deg g ON g.node = e.src GROUP BY e.dst) x, nn)
    SELECT node, ROUND(rank * nn.n, 6) AS rel_rank
    FROM r3, nn ORDER BY rel_rank DESC, node LIMIT 25
    """,
)
def gr1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the SYMMETRIZED part<->supplier bipartite graph
    (authority scoring, the iterative-graph operator class alongside
    d6's connected components).  3 synchronous iterations, damping
    0.85; symmetrizing guarantees out-degree >= 1 everywhere, so there
    is no dangling mass and the oracle's chained CTEs replay the exact
    recurrence.  Reported as rank RELATIVE to uniform (rank * N,
    rounded 6dp) so the hash compares ~1.0-scale numbers, and ordered
    by (rel_rank DESC, node) for a total order.  Scale shape: one
    join + one groupBy per iteration over |edges| rows; the edge
    invariant's exchange is reused across iterations (ReusedExchange);
    ranks never exceeds |nodes| rows."""
    from parquet_common_spark.operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    pairs = li.select(
        F.col("l_partkey").cast("long").alias("p"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    edges = pairs.select(
        F.col("p").alias("src"), (F.lit(1_000_000) + F.col("s")).alias("dst")
    ).unionAll(
        pairs.select(
            (F.lit(1_000_000) + F.col("s")).alias("src"), F.col("p").alias("dst")
        )
    )
    nodes = edges.select("src").distinct()
    n = nodes.count()
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return (
        ranks.select(
            "node", F.round(F.col("rank") * F.lit(float(n)), 6).alias("rel_rank")
        )
        .orderBy(F.desc("rel_rank"), "node")
        .limit(25)
    )


@query(
    "er1_record_linkage",
    """
    WITH g12 AS (SELECT p_brand AS b, p_type AS t, p_size AS s,
                        p_name AS nm, count(*) AS c
                 FROM part GROUP BY 1, 2, 3, 4),
    g1 AS (SELECT b, s, nm, SUM(c) AS c FROM g12 GROUP BY 1, 2, 3),
    g2 AS (SELECT t, s, nm, SUM(c) AS c FROM g12 GROUP BY 1, 2, 3),
    p1 AS (SELECT a.nm AS nm1, x.nm AS nm2, SUM(a.c * x.c) AS np
           FROM g1 a JOIN g1 x ON a.b = x.b AND a.s = x.s AND a.nm < x.nm
           GROUP BY 1, 2
           UNION ALL
           SELECT nm, nm, SUM((c * (c - 1)) // 2) FROM g1 GROUP BY nm),
    p2 AS (SELECT a.nm AS nm1, x.nm AS nm2, SUM(a.c * x.c) AS np
           FROM g2 a JOIN g2 x ON a.t = x.t AND a.s = x.s AND a.nm < x.nm
           GROUP BY 1, 2
           UNION ALL
           SELECT nm, nm, SUM((c * (c - 1)) // 2) FROM g2 GROUP BY nm),
    p12 AS (SELECT a.nm AS nm1, x.nm AS nm2, SUM(a.c * x.c) AS np
            FROM g12 a JOIN g12 x
              ON a.b = x.b AND a.t = x.t AND a.s = x.s AND a.nm < x.nm
            GROUP BY 1, 2
            UNION ALL
            SELECT nm, nm, SUM((c * (c - 1)) // 2) FROM g12 GROUP BY nm),
    tot AS (SELECT nm1, nm2, CAST(SUM(np) AS BIGINT) AS n_pairs
            FROM (SELECT nm1, nm2, np FROM p1
                  UNION ALL SELECT nm1, nm2, np FROM p2
                  UNION ALL SELECT nm1, nm2, -np FROM p12)
            GROUP BY 1, 2 HAVING SUM(np) > 0)
    SELECT nm1 AS name_1, nm2 AS name_2,
           round(jaro_winkler_similarity(nm1, nm2), 6) AS sim, n_pairs
    FROM tot
    WHERE round(jaro_winkler_similarity(nm1, nm2), 6) >= 0.93
    ORDER BY name_1, name_2
    """,
)
def er1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage (entity resolution), aggregate-then-link:
    multi-pass blocking over parts — (brand, size) for precision plus
    (type, size) for recall — with records collapsed to per-(block,
    name) counts BEFORE pairing, qualifying record pairs counted per
    distinct name pair by inclusion-exclusion across the two passes,
    and only the distinct name pairs Jaro-Winkler-scored (Arrow-batched
    UDF) at the 0.93 threshold.  Returns (name_1, name_2, sim, n_pairs).

    Redesigned r12 from record-level pair output: the driver's part
    table has 64 distinct names at EVERY sf, so the old output itself
    was Θ(n²/k) — 156 → 15.6k → 2.46M matched pairs across
    sf0.01→sf0.1→sf1, with 8.4B candidates at sf10.  The entity-level
    result carries the same information (its n_pairs aggregates the old
    rows exactly) at O(vocabulary²) output and one-linear-scan compute
    (operators/linkage.py::entity_linkage).  Still a TRUE cross-engine
    differential: the oracle re-derives the counts independently and
    scores with DuckDB's own `jaro_winkler_similarity` C++
    implementation (my Python JW is additionally fuzz-pinned against
    it, 5000 random pairs, tests/test_operators.py)."""
    from parquet_common_spark.operators.linkage import entity_linkage

    part = load(spark, sf_dir, "part")["part"]
    return entity_linkage(
        part,
        name_col="p_name",
        blocking=[["p_brand", "p_size"], ["p_type", "p_size"]],
        threshold=0.93,
    ).orderBy("name_1", "name_2")


@query(
    "sim8_radius_search",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 25),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings WHERE vec_id >= 25)
    SELECT query_id, neighbor_id,
           ROUND({_COSSQL.format(a='qv', b='cv')}, 6) AS cos
    FROM q, c
    WHERE ROUND({_COSSQL.format(a='qv', b='cv')}, 6) >= 0.3
    ORDER BY query_id, neighbor_id
    """,
)
def sim8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact radius search (ALL corpus vectors within cosine >= 0.3 of
    each query) — the all-neighbors companion to sim1's top-k; what
    near-dup sweeps actually want.  One map-only Arrow pass over the
    corpus with the query block riding along, NO shuffle at all (the
    radius predicate is local, unlike top-k's global window); cosines
    use the family's shared left-to-right accumulation so the DuckDB
    oracle is hash-exact at 6dp."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    # r12 (finding 2): the radius pass itself stays map-only; one hash
    # repartition of the narrow result pairs materializes it under a
    # shuffle so the final orderBy's range sampling reads shuffle output
    # instead of running the corpus x query cosine pass a second time.
    return (
        SIM.radius_search(
            emb.where(F.col("vec_id") >= 25),
            emb.where(F.col("vec_id") < 25),
            tau=0.3,
        )
        .repartition("query_id", "neighbor_id")
        .orderBy("query_id", "neighbor_id")
    )


@query(
    "x12_mixing_solver",
    """
    WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                        AS n_tokens
               FROM documents GROUP BY source),
    g AS (SELECT SUM(pow(n_tokens, 0.7)) AS z,
                 SUM(n_tokens) AS total FROM t)
    SELECT source, n_docs, n_tokens,
           ROUND(pow(n_tokens, 0.7) / g.z, 6) AS weight,
           ROUND(LEAST(1.0,
                 0.6 * g.total * pow(n_tokens, 0.7) / g.z / n_tokens), 6)
             AS rate,
           ROUND(ROUND(LEAST(1.0,
                 0.6 * g.total * pow(n_tokens, 0.7) / g.z / n_tokens), 6)
                 * n_tokens, 3) AS expected_tokens,
           (0.6 * g.total * pow(n_tokens, 0.7) / g.z >= n_tokens) AS capped
    FROM t, g ORDER BY source
    """,
)
def x12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing solver: temperature-scaled source weights
    (w_s ∝ T_s^0.7, the standard up-weight-the-tail mixing rule) turned
    into per-source SAMPLING RATES against a 60%-of-corpus token
    budget, with rate capped at 1 (a source can't contribute more than
    it has — the cap is reported so the budget owner sees the deficit).
    One groupBy over the corpus + a 1-row global broadcast; the solver
    itself is per-source arithmetic over |sources| rows.  Downstream,
    the rate feeds p2's deterministic hash-gate (sample each source at
    rate_s), making the whole mixing step reproducible."""
    docs = load(spark, sf_dir, "documents")["documents"]
    t = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )
    g = t.agg(
        F.sum(F.pow(F.col("n_tokens"), F.lit(0.7))).alias("z"),
        F.sum("n_tokens").alias("total"),
    ).withColumn("_k", F.lit(1))
    j = t.withColumn("_k", F.lit(1)).join(F.broadcast(g), "_k")
    raw_rate = (
        F.lit(0.6) * F.col("total") * F.pow(F.col("n_tokens"), F.lit(0.7))
        / F.col("z") / F.col("n_tokens")
    )
    rate = F.round(F.least(F.lit(1.0), raw_rate), 6)
    return (
        j.select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.pow(F.col("n_tokens"), F.lit(0.7)) / F.col("z"), 6
            ).alias("weight"),
            rate.alias("rate"),
            F.round(rate * F.col("n_tokens"), 3).alias("expected_tokens"),
            # same float-op order as the oracle's predicate (no division
            # by n_tokens before the compare) so boundary cases agree
            (
                F.lit(0.6) * F.col("total")
                * F.pow(F.col("n_tokens"), F.lit(0.7)) / F.col("z")
                >= F.col("n_tokens")
            ).alias("capped"),
        )
        .orderBy("source")
    )


# ================================================================ round 9
# gr2: label-propagation communities (iterative family, integer-exact)

_GR2_SQL = """
    WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                FROM lineitem WHERE l_quantity = 1),
    edges AS (SELECT CAST(p AS BIGINT) AS src, CAST(1000000 + s AS BIGINT) AS dst FROM e0
              UNION ALL
              SELECT CAST(1000000 + s AS BIGINT), CAST(p AS BIGINT) FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS label FROM nodes),
    l1 AS (SELECT l.node, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
           FROM l0 l LEFT JOIN (SELECT e.dst AS node, MIN(x.label) AS mn
                                FROM edges e JOIN l0 x ON x.node = e.src
                                GROUP BY e.dst) m USING (node)),
    l2 AS (SELECT l.node, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
           FROM l1 l LEFT JOIN (SELECT e.dst AS node, MIN(x.label) AS mn
                                FROM edges e JOIN l1 x ON x.node = e.src
                                GROUP BY e.dst) m USING (node)),
    l3 AS (SELECT l.node, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
           FROM l2 l LEFT JOIN (SELECT e.dst AS node, MIN(x.label) AS mn
                                FROM edges e JOIN l2 x ON x.node = e.src
                                GROUP BY e.dst) m USING (node))
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS min_node
    FROM l3 GROUP BY label ORDER BY n_nodes DESC, community LIMIT 25
"""


@query("gr2_label_propagation", _GR2_SQL)
def gr2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous min-label propagation (3
    fixed iterations) on the SPARSE part<->supplier co-occurrence graph
    (quantity-1 line items only — the full graph is connected within 3
    hops, so the sparsified slice is what exhibits community structure:
    90 communities over ~950 nodes at sf0.01).  Integer-exact — no
    float accumulation anywhere — so the oracle match is bit-for-bit.
    Deterministic counterpart of random-tie-break LPA; see
    operators/graph.py::label_propagation for the per-iteration
    join+groupBy(min) scale shape."""
    from parquet_common_spark.operators.graph import label_propagation

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    e0 = (
        li.where(F.col("l_quantity") == 1)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    edges = e0.select(
        F.col("l_partkey").cast("long").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("dst"),
    ).unionAll(
        e0.select(
            (F.lit(1000000) + F.col("l_suppkey")).cast("long").alias("src"),
            F.col("l_partkey").cast("long").alias("dst"),
        )
    )
    return (
        label_propagation(edges, iterations=3)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_node"),
        )
        .select(F.col("label").alias("community"), "n_nodes", "min_node")
        .orderBy(F.desc("n_nodes"), "community")
        .limit(25)
    )


# ---------------------------------------------- km1: quantized k-means

_KM_K, _KM_DIM, _KM_ITERS = 4, 64, 2


def _km1_sql(k: int = _KM_K, dim: int = _KM_DIM) -> str:
    """Unrolled 2-iteration Lloyd's k-means, quantized to BIGINT inputs
    so every cross-row aggregation is exact integer arithmetic; only
    per-row fixed-order double expressions remain (same left-to-right
    association as the Spark F.aggregate fold)."""
    qcols = ", ".join(
        f"CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE) * 1000) AS BIGINT) AS q_{i}"
        for i in range(dim)
    )
    dist_int = " + ".join(
        f"(e.q_{i} - c.c_{i}) * (e.q_{i} - c.c_{i})" for i in range(dim)
    )
    dist_dbl = " + ".join(
        f"(CAST(e.q_{i} AS DOUBLE) - c.c_{i}) * (CAST(e.q_{i} AS DOUBLE) - c.c_{i})"
        for i in range(dim)
    )
    sums = ", ".join(f"SUM(e.q_{i}) AS s_{i}" for i in range(dim))
    cdiv = ", ".join(f"CAST(s_{i} AS DOUBLE) / n AS c_{i}" for i in range(dim))
    norm = " + ".join(f"c_{i} * c_{i}" for i in range(dim))
    ccols0 = ", ".join(f"q_{i} AS c_{i}" for i in range(dim))

    def assign(prev: str, dist: str) -> str:
        return (
            f"(SELECT vec_id, cid AS cluster FROM ("
            f"SELECT e.vec_id, c.cid, ROW_NUMBER() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn "
            f"FROM e CROSS JOIN {prev} c) WHERE rn = 1)"
        )

    def update(a: str) -> str:
        return (
            f"(SELECT cid, {cdiv} FROM (SELECT {a}.cluster AS cid, "
            f"COUNT(*) AS n, {sums} FROM {a} JOIN e USING (vec_id) "
            f"GROUP BY {a}.cluster))"
        )

    return f"""
    WITH e AS (SELECT vec_id, {qcols} FROM embeddings),
    c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, {ccols0}
           FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k})),
    a0 AS {assign('c0', dist_int)},
    c1 AS {update('a0')},
    a1 AS {assign('c1', dist_dbl)},
    c2 AS {update('a1')},
    a2 AS {assign('c2', dist_dbl)},
    prof AS (SELECT a2.cluster AS cid, COUNT(*) AS n, {sums}
             FROM a2 JOIN e USING (vec_id) GROUP BY a2.cluster),
    fin AS (SELECT cid, n, {cdiv} FROM prof)
    SELECT cid AS cluster, CAST(n AS BIGINT) AS n_vecs,
           ROUND(SQRT({norm}), 6) AS centroid_norm
    FROM fin ORDER BY cluster
    """


@query("km1_kmeans_profile", _km1_sql())
def km1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 update rounds + final assignment) over
    the embeddings table, deterministic end-to-end: integer-quantized
    inputs, lowest-id seeding, lexicographic (dist, cid) argmin, exact
    integer centroid sums.  Output is the cluster-size profile + each
    final cluster's mean-vector L2 norm.  See operators/clustering.py
    for the broadcast-centroid / one-groupBy-per-iteration 100 TB
    shape."""
    from parquet_common_spark.operators.clustering import kmeans_cluster_profile

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    return kmeans_cluster_profile(
        spark, emb, k=_KM_K, iterations=_KM_ITERS, dim=_KM_DIM
    )


# ------------------------------- sim9: inverted-index sparse cosine join

_SIM9_MAXDF, _SIM9_TAU = 50, 0.5

_SIM9_SQL = f"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex({_NORM.format(c='text')}, '\\s+')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
    keep AS (SELECT tok FROM tf GROUP BY tok HAVING COUNT(*) <= {_SIM9_MAXDF}),
    tff AS (SELECT tf.doc_id, tf.tok, tf.tf FROM tf JOIN keep USING (tok)),
    norms AS (SELECT doc_id, SUM(tf * tf) AS nn FROM tff GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    SUM(a.tf * b.tf) AS dot
             FROM tff a JOIN tff b USING (tok)
             WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           ROUND(CAST(d.dot AS DOUBLE) / SQRT(CAST(na.nn * nb.nn AS DOUBLE)), 6) AS cos
    FROM dots d
    JOIN norms na ON na.doc_id = d.id_a
    JOIN norms nb ON nb.doc_id = d.id_b
    WHERE ROUND(CAST(d.dot AS DOUBLE) / SQRT(CAST(na.nn * nb.nn AS DOUBLE)), 6)
          >= {_SIM9_TAU}
    ORDER BY id_a, id_b
"""


@query("sim9_sparse_cosine", _SIM9_SQL)
def sim9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse count-vector cosine similarity via an INVERTED-INDEX
    self-join (the classic all-pairs-similarity shape: postings joined
    on term, never documents x documents), integer-exact dot products
    and norms with a single per-pair float division.  The
    ``max_doc_freq`` prefilter is the hot-term flood guard (same cap
    family as dedup.py's band_cap / linkage's max_block_rows): a term
    in more than {_SIM9_MAXDF} docs would alone emit ~df^2/2 join rows,
    so ubiquitous terms are dropped BEFORE the self-join, bounding
    per-term fan-out.  On this synthetic corpus the pairs clearing
    tau={_SIM9_TAU} are the exact-duplicate classes; partial-overlap
    discrimination is pinned by pytest on a hand-built corpus."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return T.sparse_cosine_pairs(
        docs, "doc_id", "text", max_doc_freq=_SIM9_MAXDF, tau=_SIM9_TAU
    ).orderBy("id_a", "id_b")


# ----------------------------------- dq4: robust MAD anomaly profile

_DQ4_K = 4.4478  # 3 * 1.4826 (the normal-consistency MAD scale), one constant

_DQ4_SQL = f"""
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > {_DQ4_K} * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""


@query("dq4_mad_anomalies", _DQ4_SQL)
def dq4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly profile per event type: median / MAD (median
    absolute deviation) and the count of |v - med| > 3σ-equivalent
    (3 * 1.4826 * MAD) outliers — the data-quality family's robust arm
    (dq3's drift uses means; MAD survives the heavy tails that wreck
    z-scores).  Medians are exact interpolating percentiles — order
    statistics, not float accumulation — so both engines agree
    bit-for-bit; the threshold is ONE multiply on each side.  Scale:
    two groupBy passes (exact percentile needs the group's values;
    Spark's percentile is a sort-based exact aggregate) + a broadcast
    join of the per-type scalars back onto events."""
    ev = load(spark, sf_dir, "events")["events"]
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(_DQ4_K) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


# ------------------------- p13: deterministic train/val/test split

_P13_TRAIN, _P13_VAL = 0.8, 0.1  # test = remainder
_MIX_MULT, _MIX_ADD, _MIX_MOD = 2_654_435_761, 40_503, 999_999_937

_P13_SQL = f"""
    WITH g AS (SELECT doc_id, lang,
                      len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                      (doc_id * {_MIX_MULT} + {_MIX_ADD}) % {_MIX_MOD} AS mix
               FROM documents),
    s AS (SELECT doc_id, lang, n_tok,
                 CASE WHEN mix < {int(_P13_TRAIN * _MIX_MOD)} THEN 'train'
                      WHEN mix < {int((_P13_TRAIN + _P13_VAL) * _MIX_MOD)} THEN 'val'
                      ELSE 'test' END AS split
          FROM g)
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM s GROUP BY split, lang ORDER BY split, lang
"""


@query("p13_hash_split", _P13_SQL)
def p13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by the shared
    Knuth-multiplicative key mix (operators/sampling.py) — the split a
    training pipeline must be able to REPRODUCE anywhere: the decision
    is a pure function of doc_id, so it is identical across
    partitionings, engines, and reruns, and provably disjoint +
    exhaustive (one CASE over one hash; pinned by pytest).  Map-only —
    no shuffle beyond the profile groupBy; at 100 TB the split is a
    free scan-time gate that composes with pushdown.  Output is the
    per-(split, lang) profile a curation report needs."""
    from parquet_common_spark.operators.sampling import key_mix

    docs = load(spark, sf_dir, "documents")["documents"]
    mix = key_mix(F.col("doc_id"))
    split = (
        F.when(mix < F.lit(int(_P13_TRAIN * _MIX_MOD)), F.lit("train"))
        .when(mix < F.lit(int((_P13_TRAIN + _P13_VAL) * _MIX_MOD)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
            split.alias("split"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split", "lang")
    )


# --------------------------- t12: char-entropy quality fingerprint

_T12_SQL = f"""
    WITH chars AS (
      SELECT doc_id,
             unnest(string_split({_NORM.format(c='text')}, '')) AS ch
      FROM documents),
    cnt AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
            FROM chars GROUP BY doc_id, ch),
    folded AS (
      SELECT doc_id, SUM(c) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                                           ORDER BY ch)),
                         (a, b) -> a + b) AS sclog
      FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           ROUND(log2(CAST(n AS DOUBLE)) - sclog / CAST(n AS DOUBLE), 6)
             AS char_entropy,
           CAST(n AS BIGINT) AS n_chars
    FROM folded ORDER BY doc_id
"""


@query("t12_char_entropy", _T12_SQL)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy over normalized text —
    the compression-ratio-style quality signal (near-zero entropy =
    degenerate repetition, the classic garbage filter; complements t6's
    token-level repetition ratios).  Entropy is computed as
    ``log2(n) - (Σ c·log2 c)/n`` with the Σ folded in SORTED char order
    (list_reduce / F.aggregate over a sort_array-ed per-doc list), so
    the float accumulation order is identical in both engines — the
    same fixed-order-fold discipline as the cosine/distance kernels.
    Scale: one explode + one (doc, char) groupBy with map-side combine
    (alphabet-bounded fan-in), one per-doc fold; no joins."""
    docs = load(spark, sf_dir, "documents")["documents"]
    cnt = (
        docs.select(
            "doc_id",
            F.explode(F.split(T.normalize_text(F.col("text")), "")).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    folded = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("ch"), F.col("c")))
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + x["c"].cast("double") * F.log2(x["c"].cast("double")),
        ).alias("sclog"),
    )
    return folded.select(
        "doc_id",
        F.round(
            F.log2(F.col("n").cast("double"))
            - F.col("sclog") / F.col("n").cast("double"),
            6,
        ).alias("char_entropy"),
        F.col("n").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


# -------------------- gr3: triangle counting (clustering structure)

_GR3_SQL = """
    WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                FROM lineitem WHERE l_quantity = 1),
    proj AS (SELECT DISTINCT a.s AS u, b.s AS v
             FROM e0 a JOIN e0 b ON a.p = b.p AND a.s < b.s),
    tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM proj e1 JOIN proj e2 ON e2.u = e1.v
            JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v),
    node_tri AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY node)
    SELECT node, n_tri FROM node_tri ORDER BY n_tri DESC, node LIMIT 25
"""


@query("gr3_triangle_count", _GR3_SQL)
def gr3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts on the one-mode PROJECTION of the
    sparse (quantity-1) part<->supplier graph: suppliers are adjacent
    iff they share a part; triangles measure local cohesion (the
    link-ring signal).  The projection itself is the standard bipartite
    fold — a self equi-join on the part key with u < v orientation, so
    each undirected edge exists exactly once and the oriented wedge
    join counts each triangle exactly once.  Integer-exact throughout.
    See operators/graph.py::triangle_count for the wedge-join scale
    argument (degree orientation documented as the O(m^1.5) production
    refinement)."""
    from parquet_common_spark.operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    e0 = (
        li.where(F.col("l_quantity") == 1)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = e0.select("p", F.col("s").alias("u"))
    b = e0.select("p", F.col("s").alias("v"))
    proj = (
        a.join(b, "p")
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .distinct()
    )
    return (
        triangle_count(proj)
        .orderBy(F.desc("n_tri"), "node")
        .limit(25)
    )


# ---------------- mm7: lossless JPEG (SOF3) pin through the gate

_MM7_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 13 + 4 AS BIGINT) AS h,
                      CAST(doc_id % 9 + 4 AS BIGINT) AS w,
                      CAST(1 + 2 * (doc_id % 2) AS INT) AS n_comp,
                      CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 12
                           ELSE 16 END AS INT) AS prec
               FROM documents WHERE doc_id < 36),
    g AS (SELECT d.doc_id, d.h, d.w, d.n_comp, d.prec,
                 y.range AS y, x.range AS x, c.range AS c
          FROM d, range(17) y, range(13) x, range(3) c
          WHERE y.range < d.h AND x.range < d.w AND c.range < d.n_comp)
    SELECT doc_id, h, w, n_comp,
           CAST(SUM((doc_id*31 + y*7 + x*3 + c*17)
                    % (1::BIGINT << prec)) AS BIGINT) AS pixel_sum
    FROM g GROUP BY doc_id, h, w, n_comp ORDER BY doc_id
"""


@query("mm7_lossless_jpeg_checksum", _MM7_SQL)
def mm7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL SOF3 lossless-JPEG codec through the driver gate (the
    mm5/mm6 lossless-pin discipline): deterministic images per doc are
    encoded with cycling predictors 1-7, precisions 8/12/16, 1- and
    3-component interleaving, and periodic restart intervals, decoded
    back with functions/jpeglossless.decode_jpeg_lossless (Annex H
    prediction, SSSS-category Huffman, modulo-2^16 reconstruction), and
    pixel-checksummed in an Arrow map stage.  Lossless, so the checksum
    equals the closed-form sum the DuckDB oracle computes from the
    pixel definition — any predictor/EXTEND/bit-packing defect breaks
    the hash."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 36).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("h", LongType()),
            StructField("w", LongType()),
            StructField("n_comp", IntegerType()),
            StructField("pixel_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import jpeglossless as JL

        for pdf in it:
            out = {"doc_id": [], "h": [], "w": [], "n_comp": [], "pixel_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = d % 13 + 4, d % 9 + 4
                nc = 1 + 2 * (d % 2)
                prec = (8, 12, 16)[d % 3]
                y = np.arange(h)[:, None, None]
                x = np.arange(w)[None, :, None]
                c = np.arange(nc)[None, None, :]
                img = ((d * 31 + y * 7 + x * 3 + c * 17) % (1 << prec)).astype(
                    np.int64
                )
                data = JL.encode_jpeg_lossless(
                    img,
                    predictor=d % 7 + 1,
                    precision=prec,
                    restart_interval=5 if d % 4 == 0 else 0,
                )
                hh, ww, got = JL.decode_jpeg_lossless(data)
                assert (hh, ww) == (h, w) and got.shape == (h, w, nc)
                assert np.array_equal(got.astype(np.int64), img)
                out["doc_id"].append(d)
                out["h"].append(h)
                out["w"].append(w)
                out["n_comp"].append(nc)
                out["pixel_sum"].append(int(img.sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# -------------------------------------------- mm8: GIF frame checksum

_MM8_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 11 + 6 AS INT) AS width,
                      CAST(doc_id % 13 + 7 AS INT) AS height,
                      CAST(doc_id % 3 + 1 AS INT) AS n_frames,
                      CAST(CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 16
                           ELSE 256 END AS BIGINT) AS pal
               FROM documents WHERE doc_id < 64),
    g AS (SELECT d.doc_id, d.width, d.height, d.n_frames,
                 (d.doc_id + 3*x.range + 5*y.range + 11*f.range) % d.pal AS i
          FROM d, range(17) x, range(20) y, range(3) f
          WHERE x.range < d.width AND y.range < d.height
            AND f.range < d.n_frames)
    SELECT doc_id, width, height, n_frames,
           CAST(SUM((i*17) % 256 + (i*29) % 256 + (i*43) % 256) AS BIGINT)
             AS rgb_sum
    FROM g GROUP BY doc_id, width, height, n_frames ORDER BY doc_id
"""


@query("mm8_gif_frame_checksum", _MM8_SQL)
def mm8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL GIF codec through the driver gate (the mm5/mm6/mm7
    lossless-pin discipline): deterministic indexed frames + palette
    per doc are encoded as GIF89a (cycling palette sizes 4/16/256,
    1-3 animation frames, interlaced on odd docs — exercising the LZW
    variable-width coder, the 4-pass row ordering, and multi-frame
    compositing), decoded back with functions/gifcodec.gif_frames, and
    RGB-checksummed in an Arrow map stage.  GIF is lossless for
    indexed input, so the checksum equals the closed-form sum the
    DuckDB oracle computes from the index/palette definition — any
    LZW/interlace/compositing defect breaks the hash.  Scale shape:
    map-only mapInPandas over ids, no shuffle (same posture as mm5)."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 64).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", IntegerType()),
            StructField("rgb_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import gifcodec as GC

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "n_frames": [], "rgb_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 11 + 6, d % 13 + 7
                nf = d % 3 + 1
                k = (4, 16, 256)[d % 3]
                pal = np.stack(
                    [
                        (np.arange(k) * 17) % 256,
                        (np.arange(k) * 29) % 256,
                        (np.arange(k) * 43) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                f = np.arange(nf)[:, None, None]
                y = np.arange(h)[None, :, None]
                x = np.arange(w)[None, None, :]
                idx = ((d + 3 * x + 5 * y + 11 * f) % k).astype(np.uint8)
                data = GC.encode_gif(idx, pal, interlace=bool(d % 2), disposal=1)
                frames, _delays = GC.gif_frames(data)
                assert frames.shape == (nf, h, w, 3)
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["rgb_sum"].append(int(frames.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------- gr4: k-hop reachability

_GR4_SQL = """
    WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    edges AS (SELECT CAST(p AS BIGINT) AS src, CAST(1000000 + s AS BIGINT) AS dst
              FROM e0
              UNION ALL
              SELECT CAST(1000000 + s AS BIGINT), CAST(p AS BIGINT) FROM e0),
    r0 AS (SELECT DISTINCT CAST(1000000 + s_suppkey AS BIGINT) AS node, 0 AS dist
           FROM supplier WHERE s_suppkey % 10 = 0),
    n1 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN r0 ON r0.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM r0)),
    r1 AS (SELECT node, dist FROM r0 UNION ALL SELECT node, 1 FROM n1),
    n2 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN n1 ON n1.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM r1)),
    r2 AS (SELECT node, dist FROM r1 UNION ALL SELECT node, 2 FROM n2),
    n3 AS (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN n2 ON n2.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM r2)),
    r3 AS (SELECT node, dist FROM r2 UNION ALL SELECT node, 3 FROM n3)
    SELECT CAST(dist AS INT) AS dist, COUNT(*) AS n_nodes,
           MIN(node) AS min_node, MAX(node) AS max_node,
           CAST(SUM(node) AS BIGINT) AS node_sum
    FROM r3 GROUP BY dist ORDER BY dist
"""


@query("gr4_khop_reachability", _GR4_SQL)
def gr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS (operators/graph.k_hop) over the symmetrized
    part<->supplier graph, sources = every-10th supplier (non-empty at all SFs): per-hop-level
    node counts plus min/max/sum of node ids (so the hash pins set
    MEMBERSHIP per level, not just cardinality).  The oracle replays
    the exact frontier recurrence as chained CTEs (fresh level =
    neighbors of the previous FRONTIER minus everything reached) —
    the frontier-expansion member of the iterative-graph family next
    to gr1 value iteration, gr2 label flow, d6 pointer jumping.
    Scale shape: one join + one distinct + one anti-join per hop, all
    hash-partitioned on node id; reached <= |nodes| rows throughout;
    k fixed at 3."""
    from parquet_common_spark.operators.graph import k_hop

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    sup = load(spark, sf_dir, "supplier")["supplier"]
    pairs = li.select(
        F.col("l_partkey").cast("long").alias("p"),
        F.col("l_suppkey").cast("long").alias("s"),
    ).distinct()
    edges = pairs.select(
        F.col("p").alias("src"), (F.lit(1_000_000) + F.col("s")).alias("dst")
    ).unionAll(
        pairs.select(
            (F.lit(1_000_000) + F.col("s")).alias("src"), F.col("p").alias("dst")
        )
    )
    sources = sup.where(F.col("s_suppkey") % 10 == 0).select(
        (F.lit(1_000_000) + F.col("s_suppkey").cast("long")).alias("node")
    )
    reached = k_hop(edges, sources, k=3)
    return (
        reached.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
            F.sum("node").alias("node_sum"),
        )
        .orderBy("dist")
    )


# -------------------------------- io1: multi-format interop roundtrip

_IO1_SQL = """
    WITH base AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
               AS revenue,
             CAST(MAX(l_shipdate) AS DATE) AS last_ship
      FROM lineitem WHERE l_orderkey % 7 = 0
      GROUP BY l_returnflag, l_linestatus)
    SELECT fmt.f AS fmt, l_returnflag, l_linestatus, n, revenue, last_ship
    FROM base, (VALUES ('orc'), ('csv'), ('json')) fmt(f)
    ORDER BY fmt, l_returnflag, l_linestatus
"""


@query("io1_format_roundtrip", _IO1_SQL)
def io1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format lakehouse interop: a lineitem slice is WRITTEN to
    ORC, CSV and JSON with Spark's native connectors, READ BACK
    (explicit schema on the text formats — schema inference is a scan
    tax and a correctness hazard at scale), and aggregated identically
    per format.  All three roundtrips are lossless for this schema
    (bigint/int/double/varchar/timestamp), so the oracle is the same
    aggregate computed once from the parquet source and fanned out
    over the three format labels — any serializer/parser fidelity
    break (double formatting, timestamp zone drift, CSV quoting)
    diverges the hash.  Scale shape: the write is a map-only fan-out
    of the filtered slice (predicate pushed to the parquet scan); each
    read-back aggregates map-side into |flags|x|status| groups.
    Artifacts land under /tmp/pcs_io/<sf-tag>, overwritten per run."""
    import os

    from parquet_common_spark.plans.common import dsum

    li = load(spark, sf_dir, "lineitem")["lineitem"].where(
        F.col("l_orderkey") % 7 == 0
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = f"/tmp/pcs_io/{tag}"
    li.write.mode("overwrite").orc(base + "/orc")
    li.write.mode("overwrite").option("header", True).csv(base + "/csv")
    li.write.mode("overwrite").json(base + "/json")
    schema = li.schema
    parts = []
    for fmt in ("orc", "csv", "json"):
        if fmt == "orc":
            df = spark.read.orc(base + "/orc")
        elif fmt == "csv":
            df = spark.read.schema(schema).option("header", True).csv(base + "/csv")
        else:
            df = spark.read.schema(schema).json(base + "/json")
        parts.append(
            df.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum(F.col("l_extendedprice")).alias("revenue"),
                F.max("l_shipdate").cast("date").alias("last_ship"),
            )
            .select(
                F.lit(fmt).alias("fmt"),
                "l_returnflag",
                "l_linestatus",
                "n",
                "revenue",
                "last_ship",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fmt", "l_returnflag", "l_linestatus")


# ----------------------------------- p14: size-balanced output shards

_P14_SQL = """
    WITH c AS (SELECT doc_id, n_chars,
                      SUM(n_chars) OVER (ORDER BY doc_id) AS cum
               FROM documents),
    t AS (SELECT CAST(CEIL(SUM(n_chars) / 8.0) AS BIGINT) AS target
          FROM documents)
    SELECT CAST(FLOOR((GREATEST(cum, 1) - 1) / t.target) AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c, t
    GROUP BY 1 ORDER BY shard
"""


@query("p14_size_balanced_shards", _P14_SQL)
def p14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-balanced output sharding (operators/packing.
    size_balanced_shards): docs in doc_id order are cut into 8
    contiguous shards wherever the running byte total crosses a
    multiple of ceil(total/8) — the export-file-sizing step that keeps
    every corpus shard within one document of the byte target.  The
    prefix sum is the DISTRIBUTED two-pass scan (range partition +
    per-partition cumsum + broadcast offsets), never a global
    single-partition window; the oracle replays it with DuckDB's
    window cumsum.  Output pins per-shard doc counts, byte totals and
    id ranges, so any cut-point drift breaks the hash."""
    from parquet_common_spark.operators.packing import size_balanced_shards

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id", "n_chars")
    sharded = size_balanced_shards(docs, ["doc_id"], "n_chars", n_shards=8)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


# ----------------------------------------- a4: Bloom-filter semi-join

from parquet_common_spark.operators import sketch as SK  # noqa: E402

_BLOOM_HASHES = ", ".join(
    f"({a}, {b})" for a, b in zip(SK.BLOOM_A, SK.BLOOM_B)
)
_A4_M = 256  # sized so the false-positive path is exercised at sf0.01+

_A4_SQL = f"""
    WITH members AS (SELECT c_custkey AS k FROM customer
                     WHERE c_acctbal < -800),
    h(a, b) AS (VALUES {_BLOOM_HASHES}),
    bits AS (SELECT DISTINCT (k * h.a + h.b) % {T.HASH_P} % {_A4_M} AS pos
             FROM members, h),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
    hits AS (SELECT p.k, COUNT(*) AS n
             FROM probe p, h
             JOIN bits ON (p.k * h.a + h.b) % {T.HASH_P} % {_A4_M} = bits.pos
             GROUP BY p.k),
    flags AS (SELECT p.k, COALESCE(hits.n, 0) = {SK.BLOOM_K} AS maybe
              FROM probe p LEFT JOIN hits ON hits.k = p.k),
    truth AS (SELECT f.k, f.maybe, m.k IS NOT NULL AS member
              FROM flags f LEFT JOIN members m ON m.k = f.k)
    SELECT maybe, member, COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS key_sum
    FROM truth GROUP BY maybe, member ORDER BY maybe, member
"""


@query("a4_bloom_semi_join", _A4_SQL)
def a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefilter (operators/sketch.bloom_bits/
    bloom_probe) — the third classic mergeable sketch beside a1 HLL
    and a3 count-min, in the realistic prefilter shape: the FACT side
    (distinct order custkeys) is probed against the Bloom bits of a
    SMALL dimension slice (deep-debt customers), then cross-tabbed
    against ground-truth membership.  The output pins the
    no-false-negative guarantee (a maybe=false & member=true row can
    never appear) AND the exact false-positive population under the
    deterministic affine hash family (m sized small on purpose so FPs
    exist) — both engines replay identical bit arithmetic.  Scale
    shape: bits <= m rows by construction (broadcast-by-contract);
    probing is map-only vs the broadcast + one fan-in-k groupBy — the
    shuffle-skipping prefilter a 100 TB fact-dim join runs first."""
    from parquet_common_spark.operators import sketch as SK2

    t = load(spark, sf_dir, "orders", "customer")
    members = t["customer"].where(F.col("c_acctbal") < -800).select(
        F.col("c_custkey").alias("k")
    )
    bits = SK2.bloom_bits(members, "k", m=_A4_M)
    probes = t["orders"].select(F.col("o_custkey").alias("k")).distinct()
    flagged = SK2.bloom_probe(probes, bits, "k", m=_A4_M)
    truth = flagged.join(
        members.withColumn("member", F.lit(True)), "k", "left"
    ).select("k", "maybe", F.coalesce(F.col("member"), F.lit(False)).alias("member"))
    return (
        truth.groupBy("maybe", "member")
        .agg(F.count(F.lit(1)).alias("n_keys"), F.sum("k").alias("key_sum"))
        .orderBy("maybe", "member")
    )


# ------------------------------------------- mm9: TIFF strip checksum

_MM9_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 9 + 5 AS INT) AS width,
                      CAST(doc_id % 12 + 6 AS INT) AS height,
                      CAST(1 + 2 * (doc_id % 2) AS INT) AS spp
               FROM documents WHERE doc_id < 60),
    g AS (SELECT d.doc_id, d.width, d.height, d.spp,
                 (d.doc_id * 13 + 2*x.range + 3*y.range + 29*c.range) % 251
                   AS v
          FROM d, range(14) x, range(18) y, range(3) c
          WHERE x.range < d.width AND y.range < d.height
            AND c.range < d.spp)
    SELECT doc_id, width, height, spp,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM g GROUP BY doc_id, width, height, spp ORDER BY doc_id
"""


@query("mm9_tiff_strip_checksum", _MM9_SQL)
def mm9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL TIFF codec through the driver gate (mm5/mm6/mm7/mm8
    lossless-pin discipline): deterministic gray/RGB images per doc are
    encoded as baseline TIFF cycling ALL supported axes — compression
    none/LZW/PackBits, horizontal predictor on the LZW docs, single- vs
    multi-strip layout, little- vs big-endian containers — decoded back
    with functions/tiffcodec.decode_tiff (IFD walk, strip reassembly,
    early-change LZW, PackBits, predictor integration), and pixel-
    checksummed in an Arrow map stage.  All supported modes are
    lossless, so the checksum equals the closed-form sum the DuckDB
    oracle computes from the pixel definition.  Scale shape: map-only
    mapInPandas over ids, no shuffle."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 60).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("spp", IntegerType()),
            StructField("pixel_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import tiffcodec as TC

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "spp": [], "pixel_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 9 + 5, d % 12 + 6
                spp = 1 + 2 * (d % 2)
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(spp)[None, None, :]
                px = ((d * 13 + 2 * x + 3 * y + 29 * c) % 251).astype(np.uint8)
                comp = (1, 5, 32773)[d % 3]
                data = TC.encode_tiff(
                    px,
                    compression=comp,
                    predictor=2 if comp == 5 else 1,
                    rows_per_strip=None if d % 4 < 2 else max(1, h // 3),
                    byte_order="little" if d % 2 else "big",
                )
                gw, gh, got = TC.decode_tiff(data)
                assert (gw, gh) == (w, h) and got.shape == (h, w, spp)
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["spp"].append(spp)
                out["pixel_sum"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# --------------------------------------------- dq5: k-anonymity audit

_DQ5_K = 5

_DQ5_SQL = f"""
    WITH q AS (SELECT c_nationkey, c_mktsegment,
                      COUNT(*) AS class_size,
                      CAST(SUM(c_custkey) AS BIGINT) AS key_sum
               FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey, c_mktsegment, class_size,
           class_size < {_DQ5_K} AS violates_k,
           key_sum
    FROM q ORDER BY c_nationkey, c_mktsegment
"""


@query("dq5_k_anonymity", _DQ5_SQL)
def dq5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (nation x
    market segment): equivalence-class sizes with a violates-k flag —
    the privacy gate a training-data release runs before shipping
    user-derived records (classes smaller than k re-identify).
    Scale shape: ONE map-side-combined groupBy on the quasi-identifier
    (bounded key space |nations| x |segments|); the flag is a literal
    comparison on the aggregate — no second pass, no window.  key_sum
    pins class MEMBERSHIP, not just size."""
    cust = load(spark, sf_dir, "customer")["customer"]
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"), F.sum("c_custkey").alias("key_sum"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") < _DQ5_K).alias("violates_k"),
            "key_sum",
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------- dq6: freshness audit

_DQ6_SQL = """
    WITH b AS (SELECT event_type AS k, epoch_us(ts) AS t FROM events),
    wm AS (SELECT MAX(t) AS m FROM b),
    base AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(MAX(t) AS BIGINT) AS last_us
             FROM b GROUP BY k),
    gaps AS (SELECT k, t - LAG(t) OVER (PARTITION BY k ORDER BY t) AS gap
             FROM b),
    med AS (SELECT k, quantile_cont(gap, 0.5) AS med_gap
            FROM gaps WHERE gap IS NOT NULL GROUP BY k)
    SELECT base.k AS event_type, base.n, base.last_us,
           CAST((SELECT m FROM wm) - base.last_us AS BIGINT) AS staleness_us,
           ROUND(med.med_gap, 6) AS med_gap_us
    FROM base JOIN med USING (k) ORDER BY event_type
"""


@query("dq6_freshness", _DQ6_SQL)
def dq6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-freshness audit (quality.freshness_profile):
    per event type, row count, last event time, staleness against the
    corpus watermark, and the median inter-arrival gap — the
    ingestion-health report that catches a silently-stopped source
    (staleness spike) or one that started batching (gap-median jump).
    The gap multiset is the consecutive-diff multiset of each key's
    sorted timestamps (tie-order-invariant) and the median is dq4's
    exact-order-statistics contract, so both engines agree bit-for-bit.
    Scale shape in the operator docstring: two bounded groupBys + one
    lag window partitioned by key + a broadcast 1-row watermark."""
    from parquet_common_spark.operators.quality import freshness_profile
    from parquet_common_spark.plans.common import event_ts_ntz

    ev = event_ts_ntz(load(spark, sf_dir, "events")["events"])
    ev = ev.withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
    return freshness_profile(ev, key_col="event_type", ts_us_col="t")


# ------------------------------- gr5: weighted single-source shortest path

_GR5_ROUNDS = 4


def _gr5_sql() -> str:
    # chained-CTE replay of the exact Bellman-Ford recurrence: round i's
    # dist = MIN over (round i-1 dists UNION relaxed candidates), the
    # same union-then-min formulation the Spark operator runs.
    parts = [
        """
    WITH e0 AS (SELECT l_partkey AS p, l_suppkey AS s,
                       CAST(MIN(l_quantity) AS BIGINT) AS w
                FROM lineitem GROUP BY p, s),
    edges AS (SELECT CAST(p AS BIGINT) AS src,
                     CAST(1000000 + s AS BIGINT) AS dst, w FROM e0
              UNION ALL
              SELECT CAST(1000000 + s AS BIGINT), CAST(p AS BIGINT), w
              FROM e0),
    d0 AS (SELECT DISTINCT CAST(1000000 + s_suppkey AS BIGINT) AS node,
                  CAST(0 AS BIGINT) AS dist
           FROM supplier WHERE s_suppkey % 10 = 0)"""
    ]
    for i in range(1, _GR5_ROUNDS + 1):
        parts.append(
            f""",
    d{i} AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d{i - 1}
           UNION ALL
           SELECT e.dst AS node, d.dist + e.w AS dist
           FROM edges e JOIN d{i - 1} d ON d.node = e.src) u
         GROUP BY node)"""
        )
    parts.append(
        f"""
    SELECT node < 1000000 AS is_part, CAST(dist // 5 AS BIGINT) AS dist_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(dist) AS min_dist, MAX(dist) AS max_dist,
           CAST(SUM(dist) AS BIGINT) AS dist_sum, CAST(SUM(node) AS BIGINT) AS node_sum
    FROM d{_GR5_ROUNDS}
    GROUP BY is_part, dist_bucket ORDER BY is_part, dist_bucket"""
    )
    return "".join(parts)


_GR5_SQL = _gr5_sql()


@query("gr5_shortest_paths", _GR5_SQL)
def gr5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford (operators/graph.shortest_paths) over the
    symmetrized part<->supplier graph weighted by MIN(l_quantity) per
    pair, sources = every-10th supplier (non-empty at all SFs) — the min-plus / weighted
    member of the iterative-graph family (gr1 value iteration, gr2
    label flow, gr4 hop-count BFS = the w≡1 special case).  Integer
    weights keep every distance engine-exact; the oracle replays the
    identical union-then-min relaxation as chained CTEs.  Output
    profiles the distance distribution per node class (part vs
    supplier side) with membership pinned by node/dist sums.
    Scale shape: one equi-join + one map-side-combinable groupBy MIN
    per round; dist <= |reachable| rows; per-round localCheckpoint
    truncates the double-reference lineage (PERF_NOTES r9 2^k class).
    Reference: the reference has no graph surface; this extends the
    pipeline-operator layer (SURVEY §2 addendum)."""
    from parquet_common_spark.operators.graph import shortest_paths

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    sup = load(spark, sf_dir, "supplier")["supplier"]
    pairs = (
        li.groupBy(
            F.col("l_partkey").cast("long").alias("p"),
            F.col("l_suppkey").cast("long").alias("s"),
        )
        .agg(F.min("l_quantity").cast("long").alias("w"))
    )
    edges = pairs.select(
        F.col("p").alias("src"),
        (F.lit(1_000_000) + F.col("s")).alias("dst"),
        "w",
    ).unionAll(
        pairs.select(
            (F.lit(1_000_000) + F.col("s")).alias("src"),
            F.col("p").alias("dst"),
            "w",
        )
    )
    sources = sup.where(F.col("s_suppkey") % 10 == 0).select(
        (F.lit(1_000_000) + F.col("s_suppkey").cast("long")).alias("node")
    )
    dist = shortest_paths(edges, sources, iterations=_GR5_ROUNDS)
    return (
        dist.groupBy(
            (F.col("node") < 1_000_000).alias("is_part"),
            (F.col("dist") / 5).cast("long").alias("dist_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
            F.sum("dist").alias("dist_sum"),
            F.sum("node").alias("node_sum"),
        )
        .orderBy("is_part", "dist_bucket")
    )


def _scratch_dir(prefix: str, sf_dir: str) -> str:
    """Per-run scratch directory for queries that exercise the WRITE
    path: uuid suffix so concurrent runs over the same sf_dir (gate +
    pytest) never overwrite each other mid-read, and siblings older
    than an hour (long past any plausible collect of the returned lazy
    frame) are garbage-collected so /tmp doesn't accumulate."""
    import os
    import shutil
    import time as _time
    import uuid

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = f"/tmp/{prefix}"
    try:
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if os.path.isdir(p) and _time.time() - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    return f"{root}/{tag}-{uuid.uuid4().hex[:12]}"


# --------------------- io2: hive-partitioned layout + partition pruning

_IO2_SQL = """
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS user_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type, day ORDER BY event_type, day
"""


@query("io2_partitioned_pruning", _IO2_SQL)
def io2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lakehouse layout: events are WRITTEN
    ``partitionBy(event_type)`` (the categorical-key directory layout
    a 100 TB event lake uses), then READ BACK with a partition
    predicate — Spark's scan lists only the matching directories
    (PartitionFilters, pinned by pytest), so the 'click'/'purchase'
    aggregate never touches the other types' files AT ALL: pruning
    happens at file-listing time, before any I/O, which is the
    difference between scanning 2/5ths and 5/5ths of the lake.
    The oracle computes the same aggregate from the unpartitioned
    source — any row lost or duplicated by the partitioned write
    (NULL-key handling, value escaping in directory names) breaks the
    hash.  Decimal value sums keep the money column engine-exact
    (plans.common.dsum).  Scale shape: the write shuffles once on the
    partition key to avoid small-file explosion (one task per type
    otherwise each task writes |types| files); the read is a pruned
    scan + one map-side-combined groupBy."""
    from parquet_common_spark.plans.common import dsum, event_ts_ntz

    ev = event_ts_ntz(load(spark, sf_dir, "events")["events"])
    base = _scratch_dir("pcs_io2", sf_dir)
    # repartition on the partition column: each write task then owns
    # whole partition-directories instead of every task appending a
    # file into every directory (the small-files explosion at scale)
    ev.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(base)
    back = spark.read.parquet(base).where(
        F.col("event_type").isin("click", "purchase")
    )
    day = (
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
    ).cast("long")
    return (
        back.groupBy("event_type", day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_id").cast("long").alias("user_sum"),
            dsum(F.col("value"), 2).alias("value_sum"),
        )
        .orderBy("event_type", "day")
    )


# -------------------------------------------- mm10: BMP pixel checksum

_MM10_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 11 + 5 AS INT) AS width,
                      CAST(doc_id % 9 + 4 AS INT) AS height,
                      CAST(doc_id % 5 AS INT) AS mode,
                      CAST(CASE doc_id % 5 WHEN 1 THEN 256 WHEN 2 THEN 8
                           WHEN 3 THEN 16 WHEN 4 THEN 2
                           ELSE 0 END AS BIGINT) AS pal
               FROM documents WHERE doc_id < 80),
    g AS (SELECT d.doc_id, d.width, d.height, d.mode, d.pal,
                 x.range AS x, y.range AS y
          FROM d, range(16) x, range(13) y
          WHERE x.range < d.width AND y.range < d.height),
    px AS (SELECT doc_id, width, height, mode,
                  CASE WHEN mode = 0
                       THEN (doc_id + 3*x + 5*y) % 256
                            + (doc_id*2 + 7*x + 11*y) % 256
                            + (doc_id*3 + 13*x + 17*y) % 256
                       ELSE (((doc_id + 3*x + 5*y) % pal) * 17) % 256
                            + (((doc_id + 3*x + 5*y) % pal) * 29) % 256
                            + (((doc_id + 3*x + 5*y) % pal) * 43) % 256
                  END AS s
           FROM g)
    SELECT doc_id, width, height, mode, CAST(SUM(s) AS BIGINT) AS rgb_sum
    FROM px GROUP BY doc_id, width, height, mode ORDER BY doc_id
"""


@query("mm10_bmp_checksum", _MM10_SQL)
def mm10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BMP codec (functions/bmpcodec.py) through the driver gate,
    the mm5-mm9 lossless-pin discipline: per doc a deterministic image
    is encoded cycling the parameter matrix — 24-bit BI_RGB, 8-bit
    palette raw, 8-bit BI_RLE8, 4-bit and 1-bit palette, alternating
    bottom-up/top-down row order — decoded back, and RGB-checksummed
    in an Arrow map stage.  Every mode is lossless, so the checksum
    equals the closed-form sum the oracle computes from the pixel
    formula; any stride/padding/RLE/row-order defect breaks the hash.
    Scale shape: map-only mapInPandas over ids, no shuffle."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 80).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", IntegerType()),
            StructField("rgb_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import bmpcodec as BC

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "mode": [], "rgb_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, mode = d % 11 + 5, d % 9 + 4, d % 5
                y, x = np.mgrid[0:h, 0:w]
                top_down = bool(d % 2)
                if mode == 0:
                    img = np.stack(
                        [
                            (d + 3 * x + 5 * y) % 256,
                            (d * 2 + 7 * x + 11 * y) % 256,
                            (d * 3 + 13 * x + 17 * y) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    data = BC.encode_bmp(img, bits=24, top_down=top_down)
                else:
                    k = {1: 256, 2: 8, 3: 16, 4: 2}[mode]
                    bits = {1: 8, 2: 8, 3: 4, 4: 1}[mode]
                    idx = ((d + 3 * x + 5 * y) % k).astype(np.uint8)
                    pal = np.stack(
                        [
                            (np.arange(k) * 17) % 256,
                            (np.arange(k) * 29) % 256,
                            (np.arange(k) * 43) % 256,
                        ],
                        axis=1,
                    ).astype(np.uint8)
                    data = BC.encode_bmp(
                        idx, bits=bits, palette=pal,
                        rle=(mode == 2), top_down=top_down,
                    )
                got = BC.decode_bmp(data)
                assert got.shape == (h, w, 3)
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(mode)
                out["rgb_sum"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ------------------------------ sim10: k-NN label classification


@query(
    "sim10_knn_classify",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS true_label
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                 label FROM embeddings),
    scored AS (SELECT query_id, true_label, neighbor_id, c.label,
                      {_COSSQL.format(a='qv', b='cv')} AS cos
               FROM q, c WHERE query_id <> neighbor_id),
    ranked AS (SELECT query_id, true_label, label, cos,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rn
               FROM scored),
    votes AS (SELECT query_id, true_label, label, COUNT(*) AS n
              FROM ranked WHERE rn <= 5 GROUP BY query_id, true_label, label),
    win AS (SELECT query_id, true_label, label AS predicted, n,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY n DESC, label) AS w
            FROM votes)
    SELECT query_id, true_label, predicted, CAST(n AS BIGINT) AS votes,
           predicted = true_label AS correct
    FROM win WHERE w = 1 ORDER BY query_id
    """,
)
def sim10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification: exact cosine top-5 neighbors per
    query (operators/similarity.brute_force_topk — broadcast queries,
    map-only corpus pass), neighbor labels majority-voted with the
    deterministic (votes DESC, label ASC) tie-break — the evaluation
    loop an embedding-quality gate runs (classification accuracy as a
    proxy metric for representation quality).  Output carries the true
    label and a correctness flag so the accuracy is one SUM away.

    Scale shape: the corpus is scanned once per query BATCH (not per
    query); the vote is a |queries| x k frame — two tiny groupBys
    after the topk; predicted via one max_by, no second window."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.where(F.col("vec_id") < 20)
    topk = SIM.brute_force_topk(emb, queries, k=5)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label")
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    win = votes.groupBy("query_id").agg(
        F.max_by(
            F.struct(F.col("label").alias("predicted"), F.col("n")),
            F.struct(F.col("n"), (-F.col("label")).alias("_neg")),
        ).alias("_w")
    )
    return (
        win.select("query_id", "_w.predicted", F.col("_w.n").alias("votes"))
        .join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            "true_label",
            "predicted",
            "votes",
            (F.col("predicted") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


# -------------------------------------------- mm11: ICO container checksum

_MM11_SQL = """
    WITH d AS (SELECT doc_id,
                      CAST(doc_id % 9 + 4 AS INT) AS width,
                      CAST(doc_id % 7 + 3 AS INT) AS height,
                      CAST(doc_id % 2 AS INT) AS png_entry
               FROM documents WHERE doc_id < 72),
    g AS (SELECT d.doc_id, d.width, d.height, d.png_entry,
                 x.range AS x, y.range AS y
          FROM d, range(13) x, range(10) y
          WHERE x.range < d.width AND y.range < d.height),
    px AS (SELECT doc_id, width, height, png_entry,
                  (doc_id + 5*x + 7*y) % 256
                  + (doc_id*3 + 11*x + 13*y) % 256
                  + (doc_id*7 + 17*x + 19*y) % 256
                  + (CASE WHEN (x + y + doc_id) % 4 = 0 THEN 0 ELSE 255 END)
                    AS s
           FROM g)
    SELECT doc_id, width, height, png_entry,
           CAST(SUM(s) AS BIGINT) AS rgba_sum
    FROM px GROUP BY doc_id, width, height, png_entry ORDER BY doc_id
"""


@query("mm11_ico_checksum", _MM11_SQL)
def mm11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ICO container (functions/icocodec.py) through the driver
    gate: per doc a deterministic RGBA icon (alpha pattern exercises
    the AND mask: every (x+y+d)%4==0 pixel transparent) is encoded
    alternating DIB-32 and PNG entries, decoded back, and
    RGBA-checksummed — any doubled-height / mask-packing / BGRA-order
    / directory-offset defect breaks the hash against the closed-form
    oracle.  Scale shape: map-only mapInPandas over ids, no shuffle
    (the mm5-mm10 posture)."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    docs = load(spark, sf_dir, "documents")["documents"]
    ids = docs.where(F.col("doc_id") < 72).select("doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("png_entry", IntegerType()),
            StructField("rgba_sum", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import icocodec as IC

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "png_entry": [], "rgba_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, png = d % 9 + 4, d % 7 + 3, d % 2
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (d + 5 * x + 7 * y) % 256,
                        (d * 3 + 11 * x + 13 * y) % 256,
                        (d * 7 + 17 * x + 19 * y) % 256,
                        np.where((x + y + d) % 4 == 0, 0, 255),
                    ],
                    axis=-1,
                ).astype(np.uint8)
                data = IC.encode_ico([img], as_png=[bool(png)])
                got = IC.decode_ico(data)
                assert got.shape == (h, w, 4)
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["png_entry"].append(png)
                out["rgba_sum"].append(int(got.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    # r12 (finding 2): hash-repartition the 64 narrow checksum rows so
    # the final orderBy's range sampling reads shuffle output instead
    # of re-executing the Python codec stage (interleaved A/B, see
    # OPTIMIZATION_r12.md, sessions 4-5 table).
    return (
        ids.mapInPandas(batches, schema=schema)
        .repartition("doc_id")
        .orderBy("doc_id")
    )


# ---------------- a5: mergeable quantile sketch with error-bound audit

_A5_SQL = """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
           ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
           TRUE AS sketch_within_bound
    FROM events GROUP BY event_type ORDER BY event_type
"""


@query("a5_quantile_sketch", _A5_SQL)
def a5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (Spark's Greenwald-Khanna
    approx_percentile) audited against the exact order statistics —
    the fourth sketch-family member (a1 HLL distinct, a3 count-min,
    a4 Bloom): the one a 100 TB pipeline actually uses for latency /
    length / quality percentiles, because the exact percentile needs
    the group's values while the GK sketch is bounded-state and
    merge-associative across partitions.  The sketch VALUE is
    engine-specific, so (a1's pattern) the hashed columns are the
    exact p50/p95 plus a deterministic pass/fail: the sketch estimate
    must land inside the exact [q-0.05, q+0.05] quantile neighborhood
    — at accuracy 10000 the GK rank error is n/10000 << 5% of n, so
    the bound holds with wide margin and is reproducible across
    partitionings.  The oracle asserts the same rows with TRUE."""
    ev = load(spark, sf_dir, "events")["events"]
    pct = (
        "percentile(value, array(0.45, 0.5, 0.55, 0.9, 0.95, 1.0))"
    )
    apx = "approx_percentile(value, array(0.5, 0.95), 10000)"
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr(pct).alias("_ex"),
            F.expr(apx).alias("_ap"),
        )
        .select(
            "event_type",
            F.round(F.col("_ex")[1], 6).alias("p50_exact"),
            F.round(F.col("_ex")[4], 6).alias("p95_exact"),
            (
                (F.col("_ap")[0] >= F.col("_ex")[0])
                & (F.col("_ap")[0] <= F.col("_ex")[2])
                & (F.col("_ap")[1] >= F.col("_ex")[3])
                & (F.col("_ap")[1] <= F.col("_ex")[5])
            ).alias("sketch_within_bound"),
        )
        .orderBy("event_type")
    )


# ----------------- io3: schema evolution across parquet batches

_IO3_SQL = """
    SELECT CASE WHEN event_id % 3 = 0 THEN '__absent__'
                ELSE COALESCE(event_type, '__absent__') END
             AS event_type_eff,
           COUNT(*) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS user_sum
    FROM events
    GROUP BY event_type_eff ORDER BY event_type_eff
"""


@query("io3_schema_evolution", _IO3_SQL)
def io3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (mergeSchema): an OLD parquet batch written
    WITHOUT the event_type column and a NEW batch written with it are
    read back as ONE dataset — the added column surfaces as NULL on the
    old files, exactly the column-add drift a long-lived 100 TB lake
    accumulates.  The aggregate groups on COALESCE(event_type,
    '__absent__'), so any row lost, duplicated, or mis-nulled by the
    merged-footer read breaks the count AND the user_sum membership
    pin.  The oracle replays the split arithmetically from the
    unsplit source.  Scale shape: mergeSchema unions footers at
    planning time (per-file schema reconciliation, no data pass);
    the read is one pruned scan + one map-side-combined groupBy —
    same plan class as io2."""
    import os

    ev = load(spark, sf_dir, "events")["events"]
    base = _scratch_dir("pcs_io3", sf_dir)
    old = ev.where(F.col("event_id") % 3 == 0).drop("event_type")
    new = ev.where(F.col("event_id") % 3 != 0)
    old.write.mode("overwrite").parquet(os.path.join(base, "b0"))
    new.write.mode("overwrite").parquet(os.path.join(base, "b1"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "b0"), os.path.join(base, "b1")
    )
    return (
        back.groupBy(
            F.coalesce(F.col("event_type"), F.lit("__absent__")).alias(
                "event_type_eff"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_id").cast("long").alias("user_sum"),
        )
        .orderBy("event_type_eff")
    )
