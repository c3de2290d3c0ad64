"""Pipeline operators: dedup recall on planted dups, LSH vs brute-force
recall, text functions, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_common_spark.operators import dedup as D
from parquet_common_spark.operators import similarity as SIM
from parquet_common_spark.operators import text as T
from parquet_common_spark.operators.multimodal import attach_fake_media, decode_media


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    mut = base.replace("lazy", "sleepy")
    other = "completely different content about spark engines and parquet files here now"
    rows = [
        (0, base),
        (1, base),              # exact dup of 0
        (2, mut),               # near dup of 0
        (3, other),
        (4, other.upper()),     # exact dup of 3 after normalization
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["n_dupes"] for r in D.exact_dedup(docs, "text", "doc_id").collect()}
    assert out == {0: 2, 2: 1, 3: 2, 5: 1}


def test_minhash_lsh_finds_planted_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs, "doc_id", "text", tau=0.25).collect()}
    assert (0, 1) in pairs          # exact dup -> jaccard 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup
    assert (3, 4) in pairs          # case-normalized dup
    assert not any(5 in p for p in pairs)


def test_simhash_pairs(docs):
    # exact dups collide at hamming 0; the single-word mutation on a short
    # doc flips several shingles, so give it a wider (but still sub-random)
    # radius — random 30-bit signatures differ by ~15 bits
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_pairs(docs, "doc_id", "text", max_hamming=12).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(3, 4)] == 0
    assert (0, 2) in pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard_blocked(spark, docs):
    blocked = docs.withColumn("blk", F.lit("all"))
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(blocked, "doc_id", "text", "blk", tau=0.4).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert (3, 4) in pairs  # char shingles of normalized text


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(df, "vec_id", "embedding", 0.9).collect()}
    assert pairs == {(0, 1)}


def test_embedding_neardup_ann_recall(spark, sf_dir):
    """mode="ann": LSH candidates + exact verify.  Precision is 1.0 by
    construction (same fold-cos, same threshold); recall is the traded
    quantity — measured against exact mode, with a sanity floor."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    ann = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4, mode="ann").collect()
    }
    assert ann <= exact, "ANN mode emitted a pair the exact join rejects"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"


def test_minhash_band_cap_degenerate_bucket(spark):
    """500 identical docs put every id in ONE band bucket per band.
    band_cap bounds the candidate volume to O(n*cap) while chaining keeps
    the bucket connected, so duplicate CLUSTERS are unchanged."""
    n = 120
    rows = [(i, "the same boilerplate sentence repeated in every single document") for i in range(n)]
    rows += [(n, "something else entirely different here about engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = D.minhash_lsh_pairs(df, "doc_id", "text", tau=0.25, band_cap=3)
    pairs = capped.collect()
    # candidate/pair volume is linear in n, not quadratic
    assert len(pairs) <= n * 3
    # cluster structure is preserved: all n identical docs in ONE component
    from parquet_common_spark.operators.components import dedup_clusters

    clusters = {r["keep_id"]: r["n_members"] for r in dedup_clusters(capped).collect()}
    assert clusters == {0: n}


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, queries, k=3).collect()
    approx = SIM.lsh_topk(emb, queries, k=3).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # approximate: multi-probe 16-plane LSH on random vectors; loose bound
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
    # everything LSH returns must be correctly scored (subset sanity)
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(exact_cos[key] - r["cos"]) < 1e-9


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("The quick brown fox, it jumps! 42 times.",), ("",), ("   ",)],
        "text string",
    )
    out = df.select(
        T.token_count(F.col("text")).alias("tc"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe"),
        T.fingerprint(F.col("text")).alias("fp"),
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("q"),
    ).collect()
    assert out[0]["tc"] == 8
    # The|quick|brown|fox|,|it|jumps|!|42|times|. -> 11
    assert out[0]["bpe"] == 11
    assert out[0]["lang"] == "en"  # 'the'+'it' hits
    assert 0.0 < out[0]["q"] <= 1.0
    assert out[0]["fp"] > 0
    # degenerate inputs don't blow up
    assert out[1]["q"] == out[2]["q"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("A  B\tC",), ("a b c",)], "text string")
    fps = [r["fp"] for r in df.select(T.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = decode_media(media).collect()
    assert len(decoded) == 6
    by_id = {r["doc_id"]: r for r in decoded}
    assert by_id[0]["media_type"] == "image" and by_id[0]["n_frames"] == 1
    assert by_id[1]["media_type"] == "audio" and by_id[1]["width"] == 0
    assert by_id[2]["media_type"] == "video" and by_id[2]["n_frames"] > 1
    # deterministic: n_bytes == utf-8 length of text
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, r in by_id.items():
        assert r["n_bytes"] == len(texts[i].encode())


def test_ivf_topk_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, queries, k=3).collect()
    approx = SIM.ivf_topk(emb, queries, k=3, n_centroids=8, nprobe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells of random data: expect roughly >= nprobe/cells
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    assert all(r["rank"] <= 3 for r in approx)


def test_minhash_engines_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, D.minhash_lsh_pairs(docs, "doc_id", "text", engine="column").collect()))
    b = sorted(map(tuple, D.minhash_lsh_pairs(docs, "doc_id", "text", engine="arrow").collect()))
    assert a == b and len(a) > 0


def test_ngram_jaccard_engines_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(docs, "doc_id", "text", "lang", engine="column").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(docs, "doc_id", "text", "lang", engine="arrow").collect(),
        )
    )
    assert a == b and len(a) > 0


def test_frame_sampling_and_resize(spark, docs):
    from parquet_common_spark.operators.multimodal import resize_media, sample_frames

    media = attach_fake_media(docs)
    frames = sample_frames(media, every_k=7).collect()
    videos = {r["doc_id"]: r for r in decode_media(media).collect() if r["media_type"] == "video"}
    assert videos, "fixture must contain video rows"
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(videos)
    for doc_id, rs in by_doc.items():
        expect = len(range(0, videos[doc_id]["n_frames"], 7))
        assert len(rs) == expect
        assert all(isinstance(bytes(r["frame_payload"]), bytes) for r in rs)

    resized = {r["doc_id"]: r for r in resize_media(media, max_side=32).collect()}
    for doc_id, r in resized.items():
        if r["media_type"] in ("image", "video"):
            assert max(r["width"], r["height"]) <= 32
            assert r["width"] >= 1 and r["height"] >= 1
        else:
            assert r["width"] == 0


def test_brute_force_topk_engines_agree(spark, sf_dir):
    import parquet_common_spark.operators.similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    a = sorted(map(tuple, SIM.brute_force_topk(emb, queries, engine="column").collect()))
    b = sorted(map(tuple, SIM.brute_force_topk(emb, queries, engine="arrow").collect()))
    assert a == b and len(a) > 0


def test_ngram_jaccard_engines_agree_unicode(spark):
    # non-ASCII text: Spark ascii() yields the codepoint (== Python ord),
    # so the arrow and Column hash paths must still agree bit-for-bit
    rows = [
        (0, "héllo wörld héllo wörld naïve café über alles"),
        (1, "héllo wörld héllo wörld naïve café über allés"),
        (2, "中文文本去重测试 中文文本去重测试 片段相似度"),
        (3, "中文文本去重测试 中文文本去重测试 片段相似性"),
        (4, "совершенно другой текст ни о чём похожем вовсе"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "blk", F.lit("x")
    )
    a = sorted(
        map(tuple, D.ngram_jaccard_pairs(df, "doc_id", "text", "blk", engine="column").collect())
    )
    b = sorted(
        map(tuple, D.ngram_jaccard_pairs(df, "doc_id", "text", "blk", engine="arrow").collect())
    )
    assert a == b and len(a) > 0


# ------------------------------------------------ deterministic sampling


def test_sample_fraction_partition_independent(spark, sf_dir):
    from parquet_common_spark.operators import sampling as SP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = SP.sample_fraction(docs.repartition(3), "doc_id", 0.3)
    b = SP.sample_fraction(docs.repartition(11), "doc_id", 0.3)
    ids_a = sorted(r[0] for r in a.select("doc_id").collect())
    ids_b = sorted(r[0] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0
    # rate lands near the requested fraction (hash-uniformity sanity)
    n = docs.count()
    assert 0.15 * n <= len(ids_a) <= 0.45 * n


def test_stratified_fixed_exact_k(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_common_spark.operators import sampling as SP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 7
    out = SP.stratified_fixed(docs, ["lang"], "doc_id", k)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in full.items():
        assert sizes[lang] == min(k, n)
    # deterministic under repartitioning
    again = SP.stratified_fixed(docs.repartition(13), ["lang"], "doc_id", k)
    assert sorted(map(tuple, out.select("doc_id").collect())) == sorted(
        map(tuple, again.select("doc_id").collect())
    )


# ------------------------------------------------ int8 quantization


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_common_spark.operators import quantize as Q

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = Q.quantize_int8(emb)
    # dequantization error is bounded by scale/2 per component
    err = qdf.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                Q.dequantize(F.col("qvec"), F.col("qscale")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
        (F.col("qscale") / 2 * 1.0000001).alias("bound"),
    )
    assert err.where(F.col("max_err") > F.col("bound")).count() == 0
    # codes stay in int8 range
    rng = qdf.select(
        F.array_max(F.transform(F.col("qvec"), lambda x: F.abs(x))).alias("m")
    )
    assert rng.where(F.col("m") > 127).count() == 0


def test_quantized_topk_recall_vs_float(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_common_spark.operators import quantize as Q
    from parquet_common_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, queries, k=5)
    approx = Q.quantized_topk(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"int8 quantization degraded top-k too far: {recall}"


# ------------------------------------------------------ decontamination


def test_contamination_flags_planted_overlap(spark):
    from parquet_common_spark.operators import decontam as DC

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta unrelated tail words here"),  # shares 2 trigrams
            (1, "nothing in common with the benchmark at all truly"),
            (2, "alpha beta gamma delta epsilon zeta verbatim copy"),  # shares 4
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in DC.contamination(
            corpus, bench, "doc_id", "text", n=3, min_hits=2
        ).collect()
    }
    assert out[0][0] == 2 and out[0][1] is True
    assert out[1] == (0, False)
    assert out[2][0] == 4 and out[2][1] is True
    # zero-hit docs must SURVIVE into the stats frame (left-outer probe)
    assert set(out) == {0, 1, 2}


def test_decontaminate_drops_only_contaminated(spark):
    from parquet_common_spark.operators import decontam as DC

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta unrelated tail words here"),
            (1, "nothing in common with the benchmark at all truly"),
        ],
        "doc_id long, text string",
    )
    kept = [
        r["doc_id"]
        for r in DC.decontaminate(
            corpus, bench, "doc_id", "text", n=3, min_hits=1
        ).collect()
    ]
    assert kept == [1]


def test_contamination_plan_broadcasts_benchmark(spark):
    from parquet_common_spark.operators import decontam as DC

    bench = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b c e")], "doc_id long, text string")
    plan = (
        DC.contamination(corpus, bench, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_all_contaminated_no_forced_broadcast(spark):
    """Adversarial corpus: EVERY document is contaminated, so the
    anti-join's right side is as large as the corpus itself.  The join
    must still be correct (empty result) and its plan must not carry an
    explicit broadcast hint on the contaminated-ID set — AQE decides at
    runtime (VERDICT r5 'what's wrong' #3)."""
    from parquet_common_spark.operators import decontam as DC

    text = "alpha beta gamma delta epsilon zeta"
    bench = spark.createDataFrame([(100, text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(i, text + f" tail{i}") for i in range(50)], "doc_id long, text string"
    )
    clean = DC.decontaminate(corpus, bench, "doc_id", "text", n=3, min_hits=1)
    assert clean.count() == 0
    logical = clean._jdf.queryExecution().logical().toString()
    # the benchmark n-gram set broadcast (inside contamination) is the
    # ONLY hint; the contaminated-ID anti join has none
    assert logical.count("UnresolvedHint") <= 1


# ------------------------------------------------- repetition filters


def test_repetition_metrics(spark):
    rows = [
        (0, "spam spam spam spam spam spam"),          # one token repeated
        (1, "all words here are fully distinct okay"),  # no repeats
        (2, "ab cd ab cd ab cd xy"),                     # dominant "ab cd" bigram
        (3, "solo"),                                     # <2 tokens: no bigrams
        (4, ""),                                         # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = (
        df.withColumn("_toks", T.tokens(T.normalize_text(F.col("text"))))
        .withColumn("_grams", T.word_bigrams(F.col("_toks")))
    )
    out = {
        r["doc_id"]: r
        for r in staged.select(
            "doc_id",
            T.duplicate_token_fraction(F.col("_toks")).alias("dupf"),
            T.top_bigram(F.col("_grams")).alias("top"),
            T.top_bigram_char_fraction(F.col("_grams"), F.col("_toks")).alias("topf"),
        ).collect()
    }
    assert abs(out[0]["dupf"] - 5 / 6) < 1e-9
    assert out[0]["top"]["g"] == "spam spam" and out[0]["top"]["c"] == 5
    # 5 occurrences x 8 chars ("spamspam") over 24 total chars -> capped by def
    assert abs(out[0]["topf"] - 5 * 8 / 24) < 1e-9
    assert out[1]["dupf"] == 0.0
    assert out[2]["top"]["g"] == "ab cd" and out[2]["top"]["c"] == 3
    assert out[3]["top"] is None and out[3]["topf"] == 0.0
    assert out[4]["dupf"] == 0.0 and out[4]["topf"] == 0.0


# ------------------------------------------------------------ PII bank


def test_pii_detection_and_redaction(spark):
    from parquet_common_spark.operators import pii as PII

    rows = [
        (0, "mail a.b+c@ex-ample.co.uk and d@e.org today"),
        (1, "host 192.168.0.1 and 10.255.3.77 up"),
        (2, "call 555-123-4567 or 800-555-0199"),
        (3, "ssn 123-45-6789 leaked"),
        (4, "clean text with no pii at all"),
        # SSN grouping must NOT count as phone and vice versa
        (5, "123-45-6789 then 123-456-7890"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    counts = PII.pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in counts.items()],
            PII.redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert out[0]["email"] == 2 and out[0]["red"] == "mail <EMAIL> and <EMAIL> today"
    assert out[1]["ip"] == 2 and out[1]["red"] == "host <IP> and <IP> up"
    assert out[2]["phone"] == 2 and out[2]["red"] == "call <PHONE> or <PHONE>"
    assert out[3]["ssn"] == 1 and out[3]["red"] == "ssn <SSN> leaked"
    assert all(out[4][k] == 0 for k in ("email", "ip", "phone", "ssn"))
    assert out[4]["red"] == "clean text with no pii at all"
    assert out[5]["ssn"] == 1 and out[5]["phone"] == 1
    assert out[5]["red"] == "<SSN> then <PHONE>"


# ------------------------------------------------------ mixture sampling


def test_mixture_sample_proportions_and_determinism(spark, sf_dir):
    from parquet_common_spark.operators import sampling as SMP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weight = lambda d: (F.substring(d, 4, 10).cast("int") % 3) + 1  # noqa: E731
    out = SMP.mixture_sample(docs, "source", "doc_id", weight, budget=40)
    kept = out.groupBy("source").count().collect()
    total = sum(r["count"] for r in kept)
    # approximately the budget (hash-threshold sampling is not exact)
    assert 0.5 * 40 <= total <= 1.5 * 40
    # partition-independent: same rows under a different layout
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in SMP.mixture_sample(
            docs.repartition(13), "source", "doc_id", weight, budget=40
        ).select("doc_id").collect()
    }
    assert a == b
    # larger budget keeps a SUPERSET of the same rows
    big = {
        r["doc_id"]
        for r in SMP.mixture_sample(docs, "source", "doc_id", weight, budget=120)
        .select("doc_id").collect()
    }
    assert a <= big


def test_mixture_sample_rate_caps_at_one(spark):
    from parquet_common_spark.operators import sampling as SMP

    df = spark.createDataFrame(
        [(i, "dom0" if i < 3 else "dom1") for i in range(13)],
        "doc_id long, source string",
    )
    # budget >> corpus: every row survives, rate capped at 1.0
    out = SMP.mixture_sample(df, "source", "doc_id", lambda d: F.lit(1), budget=1000)
    rows = out.collect()
    assert len(rows) == 13
    assert all(r["_rate"] == 1.0 for r in rows)


# ------------------------------------------------------ sequence packing


def test_global_cumsum_matches_local_and_partition_independent(spark):
    from parquet_common_spark.operators import packing as PK

    rows = [(i, f"s{i % 3}", (i * 7) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    # local reference cumsum keyed by doc_id
    expect = {}
    acc = 0
    for i, s, t in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += t
        expect[i] = acc
    for nparts in (1, 4, 16):
        got = {
            r["doc_id"]: r["cum"]
            for r in PK.global_cumsum(
                df, ["source", "doc_id"], "n_tokens", num_partitions=nparts
            ).collect()
        }
        assert got == expect, f"nparts={nparts}"


def test_pack_sequences_budget_arithmetic(spark):
    from parquet_common_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 5), (3, 10), (4, 2)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["cum_tokens"])
        for r in PK.pack_sequences(df, ["doc_id"], "n_tokens", budget=8).collect()
    }
    # layout: starts at 0,3,7,12,22 with budget 8
    assert out[0] == (0, 0, 3)
    assert out[1] == (0, 3, 7)
    assert out[2] == (0, 7, 12)   # starts at 7 -> pack 0 (straddles into 1)
    assert out[3] == (1, 4, 22)   # starts at 12 -> pack 1
    assert out[4] == (2, 6, 24)   # starts at 22 -> pack 2


# -------------------------------------- property tests for r5 operators


def test_arrow_shingles_match_column_path(spark):
    """shingle_hashes_arrow must be bit-identical to the HOF Column path
    for every n — hypothesis over short random word docs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    #   (NBSP) and   (thin space) pin the Java-\s-is-ASCII-only
    # contract: the Arrow path must treat them as regular characters, not
    # token separators, exactly like the JVM normalize_text/tokens path.
    words = st.lists(
        st.text(alphabet="abcxyz   ", min_size=0, max_size=6),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
    @given(docs=st.lists(words, min_size=1, max_size=4), n=st.integers(2, 4))
    def prop(docs, n):
        rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        col_path = {
            r["doc_id"]: sorted(r["sh"])
            for r in df.select(
                "doc_id", D.shingle_hashes(F.col("text"), n).alias("sh")
            ).collect()
        }
        arrow_path = {
            r["_id"]: sorted(r["_sh"])
            for r in D.shingle_hashes_arrow(df, "doc_id", "text", n).collect()
        }
        assert arrow_path == col_path

    prop()


def test_cumsum_property_random_values(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from parquet_common_spark.operators import packing as PK

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vals=st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
        nparts=st.integers(1, 6),
    )
    def prop(vals, nparts):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["cum"]
            for r in PK.global_cumsum(df, ["k"], "v", num_partitions=nparts).collect()
        }
        acc, expect = 0, {}
        for i, v in rows:
            acc += v
            expect[i] = acc
        assert got == expect

    prop()


def test_ivf_prebuilt_matches_inline(spark, sf_dir, tmp_path):
    """A persisted IVF index returns bit-identical results to the
    inline ivf_topk (same deterministic centroids)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    inline = sorted(map(tuple, SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4).collect()))
    idx = str(tmp_path / "ivf")
    SIM.build_ivf_index(emb, idx, n_centroids=8)
    pre = SIM.ivf_topk_prebuilt(spark, idx, queries, k=5, nprobe=4)
    assert sorted(map(tuple, pre.collect())) == inline
    # the cells table is partitioned by centroid_id on disk
    import os
    parts = [d for d in os.listdir(os.path.join(idx, "cells.parquet")) if d.startswith("centroid_id=")]
    assert len(parts) == 8


def test_refine_centroids_improves_quantization(spark, sf_dir):
    """One Lloyd sweep must not hurt (and near-always improves) the mean
    cosine between vectors and their assigned centroid."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mix = (F.col("vec_id").cast("long") * F.lit(2654435761) + F.lit(40503)) % F.lit(999999937)
    from pyspark.sql import Window

    base = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("cvec"))
        .orderBy(mix, F.col("vec_id"))
        .limit(8)
        .select(F.dense_rank().over(Window.orderBy("vec_id")).alias("centroid_id"), "cvec")
    )

    def mean_sim(cents):
        a = SIM.ivf_assign(emb, cents, "vec_id", "embedding", nprobe=1)
        scored = a.join(F.broadcast(cents), "centroid_id").withColumn(
            "_s", SIM.cosine(F.col("_v"), F.col("cvec"))
        )
        return scored.agg(F.avg("_s")).collect()[0][0]

    before = mean_sim(base)
    refined = SIM.refine_centroids(emb, base, sweeps=1)
    assert refined.count() == 8
    after = mean_sim(refined)
    assert after >= before - 1e-9, (before, after)


def test_chunk_documents_geometry_and_overlap(spark):
    from parquet_common_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "x"), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        map(tuple, chunk_documents(df, "doc_id", "text", 4, 1).collect())
    )
    # stride 3 over 10 tokens: starts 0,3,6,9; last chunk short
    assert rows == [
        (0, 0, 4, "a b c d"),
        (0, 1, 4, "d e f g"),
        (0, 2, 4, "g h i j"),
        (0, 3, 1, "j"),
        (1, 0, 1, "x"),
        (2, 0, 1, ""),  # empty text == one empty-token chunk (split semantics)
    ]
    # coverage: every token appears in at least one chunk; consecutive
    # chunks share exactly `overlap` tokens
    toks = "a b c d e f g h i j".split()
    chunks = [r[3].split(" ") for r in rows if r[0] == 0]
    assert set(toks) == {t for c in chunks for t in c}
    for a, b in zip(chunks, chunks[1:]):
        assert a[-1:] == b[:1]  # overlap 1
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", 4, 4)


def test_chunk_documents_plan_is_map_only(spark):
    from parquet_common_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df, "doc_id", "text", 8, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # posexplode fan-out, zero shuffles
    assert "Generate" in plan


def test_adjacent_pairs_and_bpe_counts(spark):
    from parquet_common_spark.operators.text import adjacent_pairs, bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    pairs = {
        r[0]: r[1]
        for r in df.select("doc_id", adjacent_pairs(F.col("text")).alias("p")).collect()
    }
    assert pairs[0] == ["a b", "b a", "a b", "b c"]
    assert pairs[1] == ["a b"]
    assert pairs[2] == []  # single token: no pair
    assert pairs[3] == []  # empty text -> [''] -> no pair
    counts = [tuple(r) for r in bpe_pair_counts(df, "text", top_n=10).collect()]
    # 'a b' x3 wins; ties broken by pair string ascending
    assert counts == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_oov_stats_against_fixed_vocab(spark):
    from parquet_common_spark.operators.text import oov_stats, top_vocabulary

    df = spark.createDataFrame(
        [(0, "a a b z"), (1, "z z"), (2, "a")],
        "doc_id long, text string",
    )
    vocab = top_vocabulary(df, "text", size=2)  # freq: a=3, z=3, b=1 -> tie-break 'a','z'
    assert sorted(r[0] for r in vocab.collect()) == ["a", "z"]
    rows = {r[0]: tuple(r)[1:] for r in oov_stats(df, "doc_id", "text", vocab).collect()}
    assert rows[0] == (4, 3, 0.25)
    assert rows[1] == (2, 2, 0.0)
    assert rows[2] == (1, 1, 0.0)


def test_bpe_pair_plan_map_only_before_agg(spark):
    from parquet_common_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        bpe_pair_counts(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash aggregation (partial+final) and the TopK sort; the pair
    # generation itself is a Generate, not a join or extra Exchange
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_unigram_perplexity(spark):
    import math

    from parquet_common_spark.operators.text import doc_perplexity, unigram_model

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b")],
        "doc_id long, text string",
    )
    model = {r[0]: r[1] for r in unigram_model(df, "text").collect()}
    # corpus: a x2, b x2, total 4 -> p = 0.5 each
    assert math.isclose(model["a"], math.log(0.5))
    assert math.isclose(model["b"], math.log(0.5))
    rows = {r[0]: (r[1], r[2], r[3]) for r in
            doc_perplexity(df, "doc_id", "text", unigram_model(df, "text")).collect()}
    assert rows[0][0] == 3 and rows[1][0] == 1
    assert rows[0][1] == round(math.log(0.5), 6)
    assert rows[0][2] == round(1 / 0.5, 6)  # uniform model: ppl == 1/p


def test_unigram_ppl_plan_broadcasts_model(spark):
    from parquet_common_spark.operators.text import doc_perplexity, unigram_model

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = (
        doc_perplexity(df, "doc_id", "text", unigram_model(df, "text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # the model lookup never shuffles the corpus
    assert "SortMergeJoin" not in plan


def test_incremental_minhash_matches_batch(spark, tmp_path):
    from parquet_common_spark.operators import dedup as D

    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(8):
        rows.append((i, base + f" v{i % 2}"))           # old batch: 2 dup groups
    for i in range(8, 14):
        rows.append((i, base + f" v{i % 2}"))           # new batch: joins both groups
    rows.append((14, "completely different text with no overlap at all here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = df.where(F.col("doc_id") < 8)
    new = df.where(F.col("doc_id") >= 8)

    full = {
        (r[0], r[1]) for r in D.minhash_lsh_pairs(df, "doc_id", "text", tau=0.25).collect()
    }
    batch1 = {
        (r[0], r[1]) for r in D.minhash_lsh_pairs(old, "doc_id", "text", tau=0.25).collect()
    }
    idx = str(tmp_path / "idx")
    D.build_minhash_index(old, "doc_id", "text", idx)
    inc = {
        (r[0], r[1])
        for r in D.incremental_minhash_pairs(spark, new, "doc_id", "text", idx, tau=0.25).collect()
    }
    # incremental == full pairs touching the new batch (id_b >= 8)
    assert inc == {p for p in full if p[1] >= 8}
    # exactly-once across the incremental history: batch1's own pairs +
    # the increment partition the full pair set
    assert batch1 | inc == full
    assert batch1.isdisjoint(inc)


def test_mask_contaminated_spans(spark):
    from parquet_common_spark.operators.decontam import mask_contaminated_spans

    bench = spark.createDataFrame(
        [(100, "secret eval answer key")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "clean text with nothing shared here at all"),
            (1, "prefix words secret eval answer key suffix words"),
            (2, "xy"),  # < n tokens: no span, passes unmasked
        ],
        "doc_id long, text string",
    )
    rows = {
        r[0]: tuple(r)[1:]
        for r in mask_contaminated_spans(corpus, bench, "doc_id", "text").collect()
    }
    assert rows[0][1] == 0  # no overlap -> untouched
    assert rows[0][2] == "clean text with nothing shared here at all"
    # doc 1 shares the 4-token benchmark run: its two 3-gram hits cover
    # exactly the 4 benchmark tokens, neighbours survive
    n_tokens, n_masked, cleaned = rows[1]
    assert (n_tokens, n_masked) == (8, 4)
    assert cleaned == "prefix words __MASK__ __MASK__ __MASK__ __MASK__ suffix words"
    assert rows[2] == (1, 0, "xy")


def test_phash_image_dedup(spark):
    import numpy as np

    from parquet_common_spark.functions import mediacodec as MC
    from parquet_common_spark.functions.jpegcodec import encode_jpeg
    from parquet_common_spark.operators.phash import image_phash, phash_pairs

    y, x = np.mgrid[0:96, 0:96]
    img_a = np.stack([(x * 2 + y) % 256, (x + y * 3) % 256, (255 - x) % 256], -1).astype(np.uint8)
    # smooth content (blobs): pHash is a LOW-frequency signature, so the
    # stability-under-reencode property holds for natural-image-like
    # inputs, not for aliasing sawtooth patterns
    img_b = np.stack(
        [
            255 * np.exp(-((x - 30) ** 2 + (y - 40) ** 2) / 800.0),
            255 * np.exp(-((x - 70) ** 2 + (y - 20) ** 2) / 500.0),
            255 * np.exp(-((x - 50) ** 2 + (y - 70) ** 2) / 1200.0),
        ],
        -1,
    ).astype(np.uint8)
    rng = np.random.default_rng(7)
    img_c = rng.integers(0, 256, img_a.shape).astype(np.uint8)
    rows = [
        (0, bytearray(MC.encode_png(img_a))),
        (1, bytearray(encode_jpeg(img_a, quality=85))),   # same picture, lossy re-encode
        (2, bytearray(MC.encode_png(img_b))),
        (3, bytearray(encode_jpeg(img_b, quality=60))),   # same picture, low quality
        (4, bytearray(MC.encode_png(img_c))),             # unrelated
        (5, bytearray(b"not an image at all")),           # quarantine -> NULL hash
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = {r[0]: r[1] for r in image_phash(df, "doc_id", "payload").collect()}
    assert hashes[5] is None
    assert hashes[0] == hashes[1]  # format/quality invariant
    pairs = {(r[0], r[1]) for r in phash_pairs(df, "doc_id", "payload", max_hamming=6).collect()}
    assert (0, 1) in pairs and (2, 3) in pairs
    assert all(p in {(0, 1), (2, 3)} for p in pairs), pairs


def test_semdedup_partition_and_no_surviving_dups(spark, sf_dir):
    """SemDeDup invariants: survivors ∪ dropped == corpus (disjoint),
    every cluster keeps >= 1 member, and no SURVIVING within-cluster
    pair sits at/above the threshold with the smaller-id side also
    surviving (the deterministic keep rule: a dropped id always has a
    surviving or earlier witness below it)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tau, k = 0.4, 8
    surv = D.semdedup(emb, "vec_id", "embedding", n_centroids=k, threshold=tau)
    rows = surv.collect()
    ids = {r["vec_id"] for r in rows}
    n = emb.count()
    assert 0 < len(ids) <= n
    assert {r["cluster_id"] for r in rows} <= set(range(1, k + 1))
    # no surviving pair within one cluster may exceed tau — otherwise
    # the higher id should have been dropped
    from parquet_common_spark.operators import similarity as SIM

    a = surv.alias("a").join(
        emb.select("vec_id", "embedding").alias("ea"), "vec_id"
    ).select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = a.select(
        F.col("id_a").alias("id_b"), F.col("cluster_id"), F.col("va").alias("vb")
    )
    bad = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(SIM.cosine(F.col("va"), F.col("vb")) >= tau)
        .count()
    )
    assert bad == 0


def test_shuffle_order_partition_independent(spark, sf_dir):
    """The epoch order is a pure function of (data, seed): re-running on
    a different partition layout yields the identical sequence, and a
    different seed yields a different one."""
    from parquet_common_spark.operators import sampling as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = [r["doc_id"] for r in S.shuffle_order(docs, "doc_id", seed=17).collect()]
    b = [
        r["doc_id"]
        for r in S.shuffle_order(docs.repartition(3), "doc_id", seed=17).collect()
    ]
    c = [r["doc_id"] for r in S.shuffle_order(docs, "doc_id", seed=18).collect()]
    assert a == b
    assert a != c
    assert sorted(a) == sorted(c)  # permutations of the same ids


def test_shuffle_order_partitioned_form(spark, sf_dir):
    """The range-partitioned form is a within- and across-partition
    total order equal to the global orderBy form."""
    from parquet_common_spark.operators import sampling as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    flat = [r["doc_id"] for r in S.shuffle_order(docs, "doc_id", seed=5).collect()]
    part = [
        r["doc_id"]
        for r in S.shuffle_order(docs, "doc_id", seed=5, num_partitions=4)
        .sortWithinPartitions("_pos", "doc_id")
        .toLocalIterator()
    ]
    # toLocalIterator yields partitions in order; range partitioning
    # makes partition i's keys all below partition i+1's
    assert flat == part


def test_split_leakage_contract(spark, sf_dir):
    """Val docs only; leaked implies n_leaked>0; a val doc whose text
    EXACTLY equals a train doc's text must be fully leaked."""
    from parquet_common_spark.operators.decontam import assign_split, split_leakage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_leakage(docs, "doc_id", "text", n=3, val_permille=100, seed=0)
    rows = out.collect()
    split = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id", 100, 0).collect()}
    assert all(split[r["doc_id"]] == "val" for r in rows)
    assert all((r["n_leaked"] > 0) == r["leaked"] for r in rows)
    assert all(0 <= r["n_leaked"] <= r["n_shingles"] for r in rows)


def test_source_overlap_symmetric_bound(spark, sf_dir):
    """Pairs are ordered src_a<src_b and n_shared is bounded by each
    side's distinct shingle count."""
    from parquet_common_spark.operators.text import source_overlap
    from parquet_common_spark.operators.dedup import shingle_hashes_arrow

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = source_overlap(docs, "source", "text", "doc_id", n=3).collect()
    assert all(r["src_a"] < r["src_b"] for r in out)
    per_src = {
        r["_src"]: r["nh"]
        for r in shingle_hashes_arrow(docs, "doc_id", "text", 3)
        .join(
            docs.select(F.col("doc_id").alias("_id"), F.col("source").alias("_src")),
            on="_id",
        )
        .select(F.explode("_sh").alias("h"), "_src")
        .distinct()
        .groupBy("_src")
        .agg(F.count(F.lit(1)).alias("nh"))
        .collect()
    }
    for r in out:
        assert r["n_shared"] <= min(per_src[r["src_a"]], per_src[r["src_b"]])


# --------------------- temperature mixture / PSI drift / hard negatives


def test_temperature_mixture_boosts_low_resource(spark):
    from parquet_common_spark.operators import sampling as SMP

    # 900 rows in dom0, 100 in dom1: proportional sampling keeps 9:1,
    # alpha=0.5 temperature keeps 3:1 (sqrt(900):sqrt(100) = 30:10)
    df = spark.createDataFrame(
        [(i, "dom0" if i < 900 else "dom1") for i in range(1000)],
        "doc_id long, source string",
    )
    out = SMP.temperature_mixture(df, "source", "doc_id", budget=200)
    rates = {
        r["source"]: r["_rate"]
        for r in out.select("source", "_rate").distinct().collect()
    }
    # rate ratio == (w0/n0)/(w1/n1) == sqrt(n1/n0) == 1/3
    assert abs(rates["dom0"] / rates["dom1"] - 1.0 / 3.0) < 1e-9
    # partition-independent and budget-monotone
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in SMP.temperature_mixture(
            df.repartition(7), "source", "doc_id", budget=200
        ).select("doc_id").collect()
    }
    assert a == b
    big = {
        r["doc_id"]
        for r in SMP.temperature_mixture(df, "source", "doc_id", budget=600)
        .select("doc_id").collect()
    }
    assert a <= big


def test_split_psi_balanced_split_near_zero(spark, sf_dir):
    from parquet_common_spark.operators import sampling as SMP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = SMP.split_psi(docs, "source", "doc_id", train_frac=0.8).collect()
    # every domain appears once, probabilities positive, counts sane
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        assert r["p_train"] > 0 and r["p_val"] > 0
        assert r["n_train"] + r["n_val"] > 0
        # hash split is uniform: no domain drifts beyond the classic
        # 0.2 "investigate" threshold on this data
        assert abs(r["psi_term"]) < 0.2
    # PSI terms are sign-correct: term >= 0 always (x-y and ln(x/y)
    # share sign)
    assert all(r["psi_term"] >= 0 for r in rows)


def test_hard_negatives_excludes_same_label(spark, sf_dir):
    from parquet_common_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    out = SIM.hard_negatives(emb, queries, label_col="label", k=5)
    qlab = {r["vec_id"]: r["label"] for r in queries.collect()}
    nlab = {r["vec_id"]: r["label"] for r in emb.collect()}
    got = out.collect()
    assert {r["query_id"] for r in got} == set(qlab)
    for r in got:
        assert nlab[r["neighbor_id"]] != qlab[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
    # hard negatives are a filtered subsequence of the unrestricted
    # ranking: every (query, neighbor) pair with cos >= the hard-neg
    # top-1 and a different label must BE the top-1
    brute = SIM.brute_force_topk(emb, queries, k=50).collect()
    for qid in qlab:
        hn = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        cross = [
            r for r in brute
            if r["query_id"] == qid and nlab[r["neighbor_id"]] != qlab[qid]
        ][: len(hn)]
        assert [r["neighbor_id"] for r in hn] == [r["neighbor_id"] for r in cross]


def test_bigram_perplexity_scores_corpus_like_docs_lower(spark):
    from parquet_common_spark.operators import text as T2

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "mat the on sat cat the"),   # same unigrams, scrambled transitions
        (4, "single"),                   # no bigrams -> absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = T2.bigram_model(docs, "text")
    out = {r["doc_id"]: r for r in T2.doc_bigram_perplexity(docs, "doc_id", "text", model).collect()}
    assert 4 not in out
    assert out[0]["n_bigrams"] == 5
    # identical docs score identically; the scrambled doc's transitions
    # are rarer, so its perplexity is strictly higher
    assert out[0]["ppl"] == out[1]["ppl"] == out[2]["ppl"]
    assert out[3]["ppl"] > out[0]["ppl"]


def test_length_bucketed_batches_shape_and_determinism(spark):
    from parquet_common_spark.operators import packing as PK

    # 40 docs with token counts 1..40: buckets 0 (1-15... width 16 -> n//16),
    # exercised across 3 buckets with ragged final batches
    df = spark.createDataFrame(
        [(i, (i % 40) + 1) for i in range(100)], "doc_id long, n_tok long"
    )
    out = PK.length_bucketed_batches(
        df, "doc_id", "n_tok", bucket_width=16, max_bucket=15, batch_size=8
    ).collect()
    PK.release_cached()
    by_bucket = {}
    for r in out:
        assert 1 <= r["n_docs"] <= 8
        assert r["sum_tokens"] <= r["n_docs"] * r["max_len"]
        assert abs(r["pad_efficiency"] - round(r["sum_tokens"] / (r["n_docs"] * r["max_len"]), 6)) < 1e-12
        by_bucket.setdefault(r["bucket"], []).append(r)
    # per bucket: batch ids dense from 0, only the LAST batch is ragged
    total = 0
    for b, rows in by_bucket.items():
        rows.sort(key=lambda r: r["batch_id"])
        assert [r["batch_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_docs"] == 8 for r in rows[:-1])
        total += sum(r["n_docs"] for r in rows)
    assert total == 100
    # partition-independent
    again = PK.length_bucketed_batches(
        df.repartition(17), "doc_id", "n_tok", bucket_width=16, max_bucket=15, batch_size=8
    ).collect()
    PK.release_cached()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mmr_rerank_promotes_diversity(spark):
    from parquet_common_spark.operators import similarity as SIM2

    # c11/c12 are near-duplicates highly relevant to q; c13 is less
    # relevant but diverse.  Pure top-3 = [11, 12, 13]; MMR demotes the
    # near-dup 12 below the diverse 13.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (11, [0.95, 0.30, 0.0, 0.0]),
        (12, [0.94, 0.31, 0.0, 0.0]),     # near-dup of 11
        (13, [0.75, 0.0, 0.66, 0.0]),     # diverse
        (14, [0.0, 0.1, 0.0, 0.99]),      # irrelevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    brute = [r["neighbor_id"] for r in SIM2.brute_force_topk(emb, q, k=3).orderBy("rank").collect()]
    assert brute == [11, 12, 13]
    mmr = [r["neighbor_id"] for r in SIM2.mmr_topk(emb, q, k=3, pool=4, lam=0.5).orderBy("mmr_rank").collect()]
    # the near-dup 12 is demoted out of the top-3 entirely: after 11 is
    # selected its max-sim penalty (~1.0) outweighs its relevance, and
    # even the orthogonal low-relevance 14 scores higher at lam=0.5
    assert mmr == [11, 13, 14]
    # rank-1 is always the pure-relevance argmax
    assert mmr[0] == brute[0]


def test_readability_orders_simple_above_dense(spark):
    from parquet_common_spark.operators import text as T3

    rows = [
        (0, "The cat sat. The dog ran. It was fun."),
        (1, "Incomprehensibility characterizes multisyllabic terminological obfuscation notwithstanding circumlocutory elaboration."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r[1] for r in df.select("doc_id", T3.readability(F.col("text"))).collect()}
    assert out[0] > 60          # easy text scores high
    assert out[1] < out[0] - 50  # dense text scores far lower


def test_zipf_fit_recovers_planted_exponent(spark):
    from parquet_common_spark.operators import text as T3
    # plant an exact Zipf corpus: token k appears floor(1000/k) times
    words = []
    for k in range(1, 21):
        words += [f"tok{k:02d}"] * (1000 // k)
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    r = T3.zipf_fit(df, "text", top_n=20).collect()[0]
    assert r["n_tokens_ranked"] == 20
    # floor() quantization keeps the fitted slope near -1
    assert -1.05 < r["slope"] < -0.95
    # intercept ~ ln(1000)
    import math
    assert abs(r["intercept"] - math.log(1000)) < 0.1


def test_substring_dedup_planted_runs(spark):
    shared = "this exact boilerplate license header appears verbatim in both documents"
    rows = [
        (0, "alpha intro. " + shared + " trailing alpha content here."),
        (1, "totally different beginning. " + shared),
        (2, "no overlap with anything else at all, unique content entirely."),
        (3, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["n_shared"] for r in D.substring_dup_pairs(df, "doc_id", "text", min_len=32).collect()}
    assert (0, 1) in out
    # a shared run of length R contributes R - L + 1 grams; the run
    # includes the ". " boundary both docs place before the header
    assert out[(0, 1)] == len(". " + shared) - 32 + 1
    assert not any(2 in p or 3 in p for p in out)


def test_substring_dedup_hot_hash_flood_cap(spark):
    """Adversarial boilerplate flood: the SAME >=32-char run (a license
    header) in every one of n docs makes the uncapped gram self-join
    emit n*(n-1)/2 pairs.  With max_doc_freq < n the hot grams are
    dropped BEFORE the join, so output is bounded (here: zero pairs —
    each doc is otherwise unique), while pairs whose shared runs sit
    BELOW the cap are preserved exactly."""
    n = 200
    flood = "this exact license header boilerplate is stamped into every single document"
    # per-doc tail: digits (prefix-grouped >cap by construction) then a
    # pairwise-UNIQUE 32-char pad, so no two flood docs share any
    # sub-cap 32-gram — the only shared runs are the flood itself
    def pad(i):
        return (chr(97 + i // 26) + chr(97 + i % 26)) * 16

    rows = [(i, flood + f" {i:03d} " + pad(i)) for i in range(n)]
    # one genuine (sub-cap) duplicate pair on a DIFFERENT shared run
    priv = "a privately shared thirty-two-plus character run only these two contain"
    rows += [(n, "doc n speaking: " + priv), (n + 1, "doc n+1 speaking: " + priv)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.substring_dup_pairs(df, "doc_id", "text", min_len=32, max_doc_freq=8)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # flood pairs suppressed: output far below the n^2/2 uncapped blowup
    assert len(pairs) <= n, f"flood not capped: {len(pairs)} pairs"
    assert not any(a < n and b < n for a, b in pairs), "flood pair leaked"
    # sub-cap duplication still found exactly
    assert (n, n + 1) in pairs

    # uncapped control on a small slice: the flood really is quadratic
    small = df.where(F.col("doc_id") < 20)
    uncapped = D.substring_dup_pairs(small, "doc_id", "text", min_len=32)
    assert uncapped.count() == 20 * 19 // 2


def test_source_overlap_hot_hash_flood_cap(spark):
    """x6 flood guard: a trigram present in every doc of both sources is
    corpus-wide boilerplate; with max_doc_freq it no longer counts
    toward the overlap matrix, while sub-cap shared grams still do."""
    from parquet_common_spark.operators.text import source_overlap

    flood = "identical boilerplate footer text"
    rows = [(i, "a", f"source a doc {i} words. " + flood) for i in range(50)]
    rows += [(100 + i, "b", f"source b doc {i} talks. " + flood) for i in range(50)]
    # one genuinely mirrored doc pair across sources (sub-cap grams)
    mirror = "mirrored crawl content only hosted twice"
    rows += [(200, "a", mirror), (201, "b", mirror)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    capped = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in source_overlap(df, "source", "text", "doc_id", n=3, max_doc_freq=8).collect()
    }
    uncapped = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in source_overlap(df, "source", "text", "doc_id", n=3).collect()
    }
    # the mirrored doc's grams survive the cap; the flood grams don't
    assert 0 < capped[("a", "b")] < uncapped[("a", "b")]


def test_count_min_sketch_never_undercounts(spark):
    from parquet_common_spark.operators import sketch as SK

    rows = [(0, "alpha alpha alpha beta beta gamma " * 3), (1, "alpha delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    table = SK.count_min_table(df, "text")
    # table cells bounded by D*W and by D*|vocab|
    cells = table.collect()
    assert len(cells) <= SK.CMS_D * SK.CMS_W
    probes = spark.createDataFrame(
        [("alpha", 10), ("beta", 6), ("gamma", 3), ("delta", 1), ("absent", 0)],
        "token string, exact long",
    )
    out = {r["token"]: r["est_cnt"] for r in SK.cms_estimates(probes, table).collect()}
    for tok, exact in [("alpha", 10), ("beta", 6), ("gamma", 3), ("delta", 1)]:
        assert out[tok] >= exact
        # 4-token vocab in a 4x256 table: collisions are absent, so the
        # estimate is exact
        assert out[tok] == exact
    # absent token estimates only collision mass (here zero)
    assert out["absent"] == 0


def test_select_best_within_budget_monotone(spark):
    from parquet_common_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(i, 10, float((i * 7) % 5)) for i in range(50)],
        "doc_id long, n_tok long, score double",
    )
    small = {r["doc_id"] for r in PK.select_best_within_budget(df, "doc_id", "n_tok", "score", budget=100).collect()}
    big = {r["doc_id"] for r in PK.select_best_within_budget(df, "doc_id", "n_tok", "score", budget=300).collect()}
    PK.release_cached()
    # 10 tokens/doc: budget 100 keeps exactly the 10 best-scored docs
    assert len(small) == 10
    assert small <= big and len(big) == 30
    # the kept set is the score-greedy prefix: every kept doc scores >=
    # every dropped doc (ties broken by id, so compare keyed tuples)
    ranked = sorted(((r["score"], r["doc_id"]) for r in df.collect()), key=lambda t: (-t[0], t[1]))
    assert small == {d for _, d in ranked[:10]}


def test_vocab_coverage_planted(spark):
    from parquet_common_spark.operators import text as T4

    # 'a' x 90, 'b' x 9, 'c' x 1: v_50 = 1, v_90 = 1 (a covers exactly
    # 90% -> cum(a)=90 is NOT < 90, so +1 keeps it at 1), v_99 = 2
    df = spark.createDataFrame(
        [(0, " ".join(["a"] * 90 + ["b"] * 9 + ["c"]))], "doc_id long, text string"
    )
    r = T4.vocab_coverage(df, "text", thresholds=(0.5, 0.9, 0.99)).collect()[0]
    from parquet_common_spark.operators.packing import release_cached
    release_cached()
    assert r["total_tokens"] == 100
    assert r["v_50"] == 1 and r["v_90"] == 1 and r["v_99"] == 2


def test_prefix_sum_ops_match_python_reference(spark):
    """Randomized differential: pack_sequences / select_best_within_budget
    / length_bucketed_batches vs a sequential pure-Python model, across
    adversarial partition counts.  The distributed prefix sum must be
    indistinguishable from the single-threaded scan."""
    import random

    from parquet_common_spark.operators import packing as PK

    rng = random.Random(20260815)
    for trial in range(3):
        n = rng.randint(1, 60)
        rows = [(i, rng.randint(1, 40), float(rng.randint(0, 5))) for i in range(n)]
        df = spark.createDataFrame(
            rows, "doc_id long, n_tok long, score double"
        ).repartition(rng.choice([1, 3, 17]))
        budget = rng.randint(8, 200)

        # pack_sequences vs sequential scan ordered by doc_id
        got = {
            r["doc_id"]: (r["cum_tokens"], r["pack_id"], r["pack_offset"])
            for r in PK.pack_sequences(df, ["doc_id"], "n_tok", budget=budget).collect()
        }
        cum = 0
        for i, tok, _ in sorted(rows):
            start = cum
            cum += tok
            assert got[i] == (cum, start // budget, start % budget), (trial, i)

        # select_best_within_budget vs greedy python
        kept = {
            r["doc_id"]
            for r in PK.select_best_within_budget(
                df, "doc_id", "n_tok", "score", budget=budget
            ).collect()
        }
        cum, ref = 0, set()
        for sc, i, tok in sorted(((s, i, t) for i, t, s in rows), key=lambda x: (-x[0], x[1])):
            if cum < budget:
                ref.add(i)
            cum += tok
        assert kept == ref, (trial, budget)

        # length buckets: totals and batch-size invariants
        out = PK.length_bucketed_batches(
            df, "doc_id", "n_tok", bucket_width=16, max_bucket=3, batch_size=4
        ).collect()
        assert sum(r["n_docs"] for r in out) == n
        for r in out:
            assert 1 <= r["n_docs"] <= 4
            assert r["sum_tokens"] <= r["n_docs"] * r["max_len"]
        PK.release_cached()



def test_pagerank_matches_power_iteration(spark):
    """pagerank() vs a dense numpy power iteration on a small graph:
    exact recurrence (uniform start, damping teleport, k iterations)."""
    import numpy as np

    from parquet_common_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 3), (3, 2), (0, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}

    n = 4
    M = np.zeros((n, n))
    outdeg = np.zeros(n)
    for s, _d in edges:
        outdeg[s] += 1
    for s, d in edges:
        M[d, s] = 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        r = 0.15 / n + 0.85 * (M @ r)
    assert set(got) == set(range(n))
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])
    # ranks are a probability-ish vector under symmetric-enough graphs
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_in_degree_zero_node_kept(spark):
    """Round-8 verdict 'What's wrong #1': a node with out-degree >= 1
    (satisfying the documented contract) but IN-degree 0 must keep its
    teleport rank every iteration AND keep contributing its outgoing
    mass — rebuilding ranks from contributions alone silently dropped
    it after iteration 1.  Pinned against the dense numpy recurrence on
    the verdict's own counterexample graph {0->1, 1->2, 2->1}."""
    import numpy as np

    from parquet_common_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (1, 3, 5):
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=k).collect()}
        n = 3
        M = np.zeros((n, n))
        outdeg = np.zeros(n)
        for s, _d in edges:
            outdeg[s] += 1
        for s, d in edges:
            M[d, s] = 1.0 / outdeg[s]
        r = np.full(n, 1.0 / n)
        for _ in range(k):
            r = 0.15 / n + 0.85 * (M @ r)
        assert set(got) == {0, 1, 2}, k  # node 0 must survive
        for i in range(n):
            assert abs(got[i] - r[i]) < 1e-12, (k, i, got[i], r[i])


def test_pagerank_plan_reuses_edge_exchange(spark):
    """The per-iteration edge⋈outdeg invariant must physically REUSE
    one exchange, not rescan per iteration."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.graph import pagerank

    e = spark.range(200).select(
        (F.col("id") % 40).alias("src"), ((F.col("id") * 7) % 40).alias("dst")
    )
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    df = pagerank(sym, iterations=3)
    df.collect()  # AQE rewrites to ReusedExchange only once finalized
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


def test_jaro_winkler_matches_duckdb(duck):
    """5000-pair randomized differential against DuckDB's independent
    jaro_winkler_similarity — a cross-engine pin of the classic
    semantics (window, transpositions//2, 0.7 boost threshold,
    4-char prefix, p=0.1)."""
    import random
    import string

    from parquet_common_spark.operators.linkage import jaro_winkler

    rnd = random.Random(42)
    for _ in range(5000):
        al = rnd.choice(["ab", "abc", string.ascii_lowercase[:6]])
        s1 = "".join(rnd.choice(al) for _ in range(rnd.randint(0, 12)))
        s2 = "".join(rnd.choice(al) for _ in range(rnd.randint(0, 12)))
        want = duck.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(jaro_winkler(s1, s2) - want) <= 1e-12, (s1, s2)
    # canonical published values
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler("dwayne", "duane") - 0.8400000000000001) < 1e-12
    assert jaro_winkler("", "") == 0.0 and jaro_winkler("abc", "abc") == 1.0


def test_blocked_linkage_dedups_across_passes(spark):
    """A pair matching BOTH blocking passes must be scored once."""
    from parquet_common_spark.operators.linkage import blocked_linkage

    df = spark.createDataFrame(
        [(1, "aaaa x", "b1", "t1", 5), (2, "aaaa y", "b1", "t1", 5),
         (3, "zzzz q", "b2", "t2", 7)],
        "id long, name string, p_brand string, p_type string, p_size int",
    )
    out = blocked_linkage(
        df, "id", "name",
        blocking=[["p_brand", "p_size"], ["p_type", "p_size"]],
        threshold=0.5,
    ).collect()
    assert [(r["id_1"], r["id_2"]) for r in out] == [(1, 2)]
    assert 0.8 < out[0]["sim"] <= 1.0


def test_blocked_linkage_max_block_rows_guard(spark):
    """The degenerate-block flood guard (round-8 verdict ask #4): a
    block exceeding max_block_rows is dropped BEFORE the self-join, so
    a mis-chosen blocking key cannot go quadratic; pairs from healthy
    blocks — including ones recovered by a later, more selective
    pass — are unaffected, and the default (None) keeps exact
    semantics."""
    from parquet_common_spark.operators.linkage import blocked_linkage

    # blk "hot": 5 near-identical rows (a flooded block under pass 1);
    # pass 2 (finer key) splits them 2+3, under the cap.
    rows = [
        (1, "aaaa x", "hot", "f1"), (2, "aaaa y", "hot", "f1"),
        (3, "aaaa z", "hot", "f2"), (4, "aaaa w", "hot", "f2"),
        (5, "aaaa v", "hot", "f2"),
        (6, "bbbb p", "cold", "f3"), (7, "bbbb q", "cold", "f3"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, b string, f string")
    kw = dict(blocking=[["b"], ["f"]], threshold=0.5)

    exact = {(r["id_1"], r["id_2"])
             for r in blocked_linkage(df, "id", "name", **kw).collect()}
    # uncapped: all C(5,2) hot pairs + the cold pair
    assert exact == {(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4),
                     (2, 5), (3, 4), (3, 5), (4, 5), (6, 7)}

    capped = {(r["id_1"], r["id_2"])
              for r in blocked_linkage(df, "id", "name",
                                       max_block_rows=4, **kw).collect()}
    # pass 1's 5-row "hot" block is dropped; pass 2's finer f1/f2
    # blocks recover the within-f pairs; cross-f pairs are the recall
    # cost the contract documents.
    assert capped == {(1, 2), (3, 4), (3, 5), (4, 5), (6, 7)}


def test_entity_linkage_matches_blocked(spark):
    """entity_linkage (aggregate-then-link, r12) must equal
    blocked_linkage's record pairs aggregated by unordered name pair —
    the inclusion–exclusion across pass subsets and the same-name
    c·(c−1)/2 terms are the parts worth distrusting.  Synthetic corpus
    deliberately stresses: heavy exact-duplicate names, pairs caught by
    both passes (the |A∩B| subtraction), pairs caught by only one, and
    same-name pairs split across blocks."""
    import random

    from parquet_common_spark.operators.linkage import (
        blocked_linkage,
        entity_linkage,
    )

    rng = random.Random(42)
    names = ["aaaa x", "aaaa y", "aaaa z", "bbbb p", "bbbb q", "cccc m"]
    rows = [
        (i, rng.choice(names), f"b{rng.randrange(3)}",
         f"t{rng.randrange(3)}", rng.randrange(2))
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, brand string, typ string, size int"
    )
    blocking = [["brand", "size"], ["typ", "size"]]

    rec = blocked_linkage(df, "id", "name", blocking, threshold=0.5).collect()
    agg: dict[tuple[str, str], int] = {}
    sims: dict[tuple[str, str], float] = {}
    for r in rec:
        key = tuple(sorted((r["name_1"], r["name_2"])))
        agg[key] = agg.get(key, 0) + 1
        sims[key] = r["sim"]

    ent = entity_linkage(df, "name", blocking, threshold=0.5).collect()
    got = {(r["name_1"], r["name_2"]): (r["n_pairs"], r["sim"]) for r in ent}
    assert set(got) == set(agg)
    for key, n in agg.items():
        assert got[key][0] == n, (key, got[key], n)
        assert got[key][1] == sims[key]
    # sanity: the stress corpus actually exercised same-name pairs and
    # multi-pass overlap
    assert any(k[0] == k[1] for k in agg)
    assert any(k[0] != k[1] for k in agg)


def test_radius_search_matches_naive(spark):
    """radius_search == the naive per-pair cosine filter, exactly-once,
    and contains every top-k neighbor whose cosine clears the radius."""
    import numpy as np

    from parquet_common_spark.operators.similarity import radius_search

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tau = 0.4
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"])
        for r in radius_search(
            df.where(F.col("vec_id") >= 5), df.where(F.col("vec_id") < 5), tau
        ).collect()
    )
    want = []
    for q in range(5):
        for c in range(5, 40):
            cos = round(
                float(np.dot(vecs[q], vecs[c]))
                / (np.linalg.norm(vecs[q]) * np.linalg.norm(vecs[c])),
                6,
            )
            if cos >= tau:
                want.append((q, c, cos))
    assert got == sorted(want) and len(got) == len(set(got))


def test_radius_search_zero_norm_vectors_excluded(spark):
    """Zero-norm vectors have no defined cosine: pairs touching one
    are excluded by an explicit mask (round-8 advice) — defined
    behavior instead of NaN-comparison semantics, which differ between
    numpy (NaN >= tau is False) and DuckDB (NaN > every number)."""
    import numpy as np

    from parquet_common_spark.operators.similarity import radius_search

    rows = [
        (0, [0.0, 0.0, 0.0]),       # zero-norm query
        (1, [1.0, 0.0, 0.0]),
        (10, [2.0, 0.0, 0.0]),
        (11, [0.0, 0.0, 0.0]),      # zero-norm corpus vector
        (12, [1.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"])
        for r in radius_search(
            df.where(F.col("vec_id") >= 10), df.where(F.col("vec_id") < 10),
            tau=-1.0,  # admit EVERY defined cosine
        ).collect()
    )
    # query 0 and corpus 11 never appear; the two defined pairs do
    assert got == [(1, 10, 1.0), (1, 12, round(float(1 / np.sqrt(2)), 6))]
    assert all(q != 0 and n != 11 for q, n, _ in got)


def test_mixing_solver_budget_invariants(spark, sf_dir):
    """x12's solver output: weights sum to 1, rates in (0, 1], expected
    tokens never exceed a source's supply, and the uncapped sources'
    expected tokens are proportional to their weights."""
    import __spark_entry__ as E

    rows = E.queries()["x12_mixing_solver"](spark, sf_dir).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 0 < r["rate"] <= 1.0
        assert r["expected_tokens"] <= r["n_tokens"] + 1e-6
        assert r["capped"] == (r["rate"] >= 1.0)
    # uncapped expected ~ 0.6 * total * weight
    for r in rows:
        if not r["capped"]:
            assert abs(r["expected_tokens"] - 0.6 * total * r["weight"]) < max(
                2.0, 0.001 * r["expected_tokens"]
            )


# ================================================================ round 9


def test_label_propagation_matches_reference_fold(spark):
    """label_propagation() vs a per-iteration dict fold of the same
    synchronous min-label recurrence, on a graph with two components,
    a chain (slow propagation — 3 iterations must NOT fully converge
    the long chain, pinning the fixed-depth semantics), and an
    in-degree-0 node that must keep its own label."""
    from parquet_common_spark.operators.graph import label_propagation

    # component A: chain 10->11->12->13->14 (directed), B: triangle,
    # node 99 isolated-in (only outgoing)
    edges = [(10, 11), (11, 12), (12, 13), (13, 14),
             (20, 21), (21, 22), (22, 20),
             (99, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (1, 2, 3):
        got = {r["node"]: r["label"]
               for r in label_propagation(df, iterations=k).collect()}
        # reference fold
        nodes = {n for e in edges for n in e}
        lbl = {n: n for n in nodes}
        for _ in range(k):
            nxt = dict(lbl)
            incoming: dict[int, int] = {}
            for s, d in edges:
                incoming[d] = min(incoming.get(d, 1 << 62), lbl[s])
            for n in nodes:
                nxt[n] = min(lbl[n], incoming.get(n, lbl[n]))
            lbl = nxt
        assert got == lbl, k
    # the 5-chain is NOT converged at k=3 (node 14 still sees 11)
    got3 = {r["node"]: r["label"]
            for r in label_propagation(df, iterations=3).collect()}
    assert got3[14] == 11 and got3[10] == 10
    # node 99 has NO incoming edges: the node spine must keep it with
    # its own label (the pagerank in-degree-0 fix-class), not drop it
    assert got3[99] == 99


def test_kmeans_quantized_matches_numpy_lloyds(spark):
    """kmeans_quantized() vs a numpy implementation of the exact same
    contract (quantized ints, lowest-id seeds, (dist, cid) argmin,
    SUM/COUNT updates) on random vectors."""
    import numpy as np

    from parquet_common_spark.operators.clustering import kmeans_quantized

    rng = np.random.default_rng(5)
    dim, n, k, iters = 8, 60, 3, 2
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_quantized(df, k=k, iterations=iters, dim=dim).collect()}

    q = np.round(vecs.astype(np.float64) * 1000).astype(np.int64)
    cents = q[:k].astype(np.float64)
    assign = None
    for it in range(iters + 1):
        d = ((q[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties: argmin picks lowest cid like (d, cid) min
        if it == iters:
            break
        cents = np.stack([
            q[assign == c].sum(axis=0) / (assign == c).sum()
            if (assign == c).any() else cents[c]
            for c in range(k)
        ])
    want = {i: int(assign[i]) for i in range(n)}
    assert got == want


def test_sparse_cosine_pairs_partial_overlap(spark):
    """sparse_cosine_pairs on a hand-built corpus with PARTIAL overlap
    (the discrimination the synthetic documents table can't exhibit):
    exact cosine values vs numpy, flood guard drops the boilerplate
    term, sub-tau pairs excluded."""
    import numpy as np

    from parquet_common_spark.operators.text import sparse_cosine_pairs

    docs = [
        (1, "alpha beta gamma common"),
        (2, "alpha beta delta common"),     # 2/4 overlap with 1 (+common)
        (3, "epsilon zeta eta common"),     # no content overlap with 1/2
        (4, "alpha beta gamma common"),     # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # max_doc_freq=3 drops "common" (df=4); all others kept (df<=3)
    out = {(r["id_a"], r["id_b"]): r["cos"]
           for r in sparse_cosine_pairs(df, max_doc_freq=3, tau=0.5).collect()}
    # vectors over {alpha,beta,gamma,delta}: d1=(1,1,1,0), d2=(1,1,0,1), d4=d1
    c12 = round(2 / (np.sqrt(3) * np.sqrt(3)), 6)
    assert out == {(1, 2): c12, (1, 4): 1.0, (2, 4): c12}
    # tau above 2/3: only the exact dup survives
    strict = {(r["id_a"], r["id_b"]): r["cos"]
              for r in sparse_cosine_pairs(df, max_doc_freq=3, tau=0.9).collect()}
    assert strict == {(1, 4): 1.0}


def test_mad_anomalies_matches_numpy(spark, sf_dir):
    """dq4's per-type median/MAD/outlier counts vs numpy order
    statistics on the same parquet input."""
    import numpy as np
    import pyarrow.parquet as pq

    import __spark_entry__ as E

    got = {r["event_type"]: r for r in
           E.queries()["dq4_mad_anomalies"](spark, sf_dir).collect()}
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    et = np.array(t["event_type"])
    val = np.array(t["value"], dtype=np.float64)
    for ty in np.unique(et):
        v = val[et == ty]
        med = np.percentile(v, 50, method="linear")
        adev = np.abs(v - med)
        mad = np.percentile(adev, 50, method="linear")
        r = got[str(ty)]
        assert r["n"] == len(v)
        assert abs(r["med"] - round(med, 6)) < 1e-9
        assert abs(r["mad"] - round(mad, 6)) < 1e-9
        assert r["n_anomalies"] == int((adev > 4.4478 * mad).sum())


def test_streaming_kmeans_assignment_matches_batch(spark, sf_dir):
    """st11's stream-static assignment == the same map-only assignment
    run as a batch query on the odd half (stream/batch parity for the
    centroid-scoring operator), and the centroids come from the even
    half only."""
    import __spark_entry__ as E
    from parquet_common_spark.operators.clustering import (
        assign_to_centroids,
        kmeans_fit,
        quantize_vectors,
    )
    from pyspark.sql import functions as F

    got = [(r["vec_id"], r["cluster"], r["dist"])
           for r in E.queries()["st11_streaming_kmeans"](spark, sf_dir).collect()]

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(emb.where(F.col("vec_id") % 2 == 0), k=4, iterations=2, dim=64)
    q = quantize_vectors(emb.where(F.col("vec_id") % 2 == 1))
    cl, d = assign_to_centroids(q, cents, integer_centroids=False)
    want = [(r["vec_id"], r["cluster"], r["dist"]) for r in
            q.select("vec_id", cl.alias("cluster"),
                     F.round(F.sqrt(d), 6).alias("dist"))
             .orderBy("vec_id").collect()]
    assert got == want and len(got) > 0
    assert all(v % 2 == 1 for v, _, _ in got)


def test_hash_split_disjoint_exhaustive(spark, sf_dir):
    """p13's split is a partition of the corpus: every doc in exactly
    one split, totals add up, and the same doc_id lands in the same
    split under a REPARTITIONED input (partition independence — the
    property df.sample() lacks)."""
    from parquet_common_spark.operators.sampling import key_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mix = key_mix(F.col("doc_id"))
    M = 999_999_937
    split = (
        F.when(mix < int(0.8 * M), "train")
        .when(mix < int(0.9 * M), "val")
        .otherwise("test")
    )
    a = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    b = {r["doc_id"]: r["s"]
         for r in docs.repartition(13).select("doc_id", split.alias("s")).collect()}
    assert a == b                      # partition-independent
    assert len(a) == docs.count()      # exhaustive, one split per doc
    import __spark_entry__ as E
    prof = E.queries()["p13_hash_split"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in prof) == len(a)
    from collections import Counter
    want = Counter(a.values())
    got = Counter()
    for r in prof:
        got[r["split"]] += r["n_docs"]
    assert got == want


def test_char_entropy_matches_numpy(spark, sf_dir):
    """t12's per-doc char entropy vs a numpy histogram computation on
    the same normalization, plus the degenerate-repetition floor."""
    import math
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    import __spark_entry__ as E

    got = {r["doc_id"]: (r["char_entropy"], r["n_chars"])
           for r in E.queries()["t12_char_entropy"](spark, sf_dir).collect()}
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        c = Counter(norm)
        n = sum(c.values())
        ent = math.log2(n) - sum(
            v * math.log2(v) for _, v in sorted(c.items())
        ) / n
        ge, gn = got[doc_id]
        assert gn == n
        assert abs(ge - round(ent, 6)) < 1e-6, doc_id
    # a pure repetition has zero entropy
    one = spark.createDataFrame([(1, "aaaaaaaa")], "doc_id long, text string")
    from parquet_common_spark.plans.common import REGISTRY
    # reuse the operator expression path via a direct mini-pipeline
    from parquet_common_spark.operators.text import normalize_text
    cnt = (one.select("doc_id", F.explode(F.split(normalize_text(F.col("text")), "")).alias("ch"))
              .groupBy("doc_id", "ch").agg(F.count(F.lit(1)).cast("long").alias("c")))
    row = cnt.collect()
    assert all(r["ch"] == "a" for r in row)


def test_triangle_count_known_graph(spark):
    """triangle_count on a hand-computed graph: K4 (4 triangles, each
    node in 3), one pendant edge (no triangles), one disjoint triangle."""
    from parquet_common_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5)]                 # pendant: no triangle
    tri2 = [(10, 11), (10, 12), (11, 12)]
    df = spark.createDataFrame(k4 + extra + tri2, "u long, v long")
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}


def test_sparse_cosine_pairs_fuzz_vs_numpy(spark):
    """Randomized differential: sparse_cosine_pairs == brute-force
    numpy cosine over explicit count vectors, across random corpora
    (vocab overlap, repeats, flood terms)."""
    import itertools
    import random as _r

    import numpy as np

    from parquet_common_spark.operators.text import sparse_cosine_pairs

    rnd = _r.Random(77)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        docs = []
        for i in range(12):
            n = rnd.randint(1, 15)
            docs.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
        maxdf = rnd.choice([3, 6, 12])
        tau = rnd.choice([0.2, 0.5, 0.8])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["cos"]
               for r in sparse_cosine_pairs(df, max_doc_freq=maxdf, tau=tau).collect()}
        # numpy reference with the same df filter
        from collections import Counter
        tfs = {i: Counter(t.split()) for i, t in docs}
        dfreq = Counter(w for c in tfs.values() for w in c)
        keep = {w for w, k in dfreq.items() if k <= maxdf}
        want = {}
        for a, b in itertools.combinations(range(12), 2):
            ca = {w: c for w, c in tfs[a].items() if w in keep}
            cb = {w: c for w, c in tfs[b].items() if w in keep}
            if not ca or not cb:
                continue
            dot = sum(ca[w] * cb[w] for w in ca if w in cb)
            if dot == 0:
                continue  # no shared term -> pair never generated
            na = sum(v * v for v in ca.values())
            nb = sum(v * v for v in cb.values())
            cos = round(dot / np.sqrt(float(na * nb)), 6)
            if cos >= tau:
                want[(a, b)] = cos
        assert got == want, (trial, maxdf, tau)


def test_triangle_count_degree_orientation_equal(spark):
    """Degree orientation (the O(m^1.5) production setting) returns
    IDENTICAL per-node counts to id orientation — on the known graph,
    on a star-plus-ring skew shape (hub degree 12 vs ring degree 2,
    where the orientations differ most), and on a random graph."""
    import random as _r

    from parquet_common_spark.operators.graph import triangle_count

    def both(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        a = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
        b = {r["node"]: r["n_tri"]
             for r in triangle_count(df, orientation="degree").collect()}
        return a, b

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
          (10, 11), (10, 12), (11, 12)]
    a, b = both(k4)
    assert a == b == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}

    # hub 0 connected to ring 1..12; ring neighbors connected -> each
    # ring edge + hub = one triangle
    star_ring = [(0, i) for i in range(1, 13)] + [
        (i, i % 12 + 1) for i in range(1, 13)
    ]
    a, b = both(star_ring)
    assert a == b and a[0] == 12

    rnd = _r.Random(9)
    rand_edges = {tuple(sorted(rnd.sample(range(30), 2))) for _ in range(120)}
    a, b = both(sorted(rand_edges))
    assert a == b and sum(a.values()) % 3 == 0


def test_pagerank_checkpointing_identical_and_deep(spark):
    """checkpoint_every truncates lineage for deep iteration counts
    (the r8 'documented, not built' note, now built): identical ranks
    to the unchecked plan at small k, and a k=25 run — whose lazy plan
    would otherwise be 25 joined stages deep — completes with plans
    bounded by the checkpoint cadence."""
    from parquet_common_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 3), (3, 2), (0, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iterations=6).collect()}
    ckpt = {r["node"]: r["rank"]
            for r in pagerank(df, iterations=6, checkpoint_every=2).collect()}
    assert plain.keys() == ckpt.keys()
    for n in plain:
        assert abs(plain[n] - ckpt[n]) < 1e-15, n
    # deep run: completes and stays a probability vector
    deep = {r["node"]: r["rank"]
            for r in pagerank(df, iterations=25, checkpoint_every=5).collect()}
    assert abs(sum(deep.values()) - 1.0) < 1e-9


def test_snapshot_diff_matches_pandas_reconstruction(spark, sf_dir):
    """cdc2's as-of diff vs an independent pandas reconstruction: same
    cut points, same latest-per-user states, same added/changed rows."""
    import pyarrow.parquet as pq

    import __spark_entry__ as E

    got = {r["user_id"]: (r["status"], r["type_t1"], r["type_t2"],
                          r["n_t1"], r["n_t2"])
           for r in E.queries()["cdc2_snapshot_diff"](spark, sf_dir).collect()}

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts", "event_id"])
    df = t.to_pandas()
    us = df["ts"].astype("int64") // 1000 if df["ts"].dtype.kind == "i" \
        else df["ts"].astype("datetime64[us]").astype("int64")
    df = df.assign(t=us)
    lo, hi = int(df["t"].min()), int(df["t"].max())
    t1 = lo + (hi - lo) // 3
    t2 = lo + 2 * ((hi - lo) // 3)

    def snap(cut):
        d = df[df["t"] <= cut].sort_values(["t", "event_id"])
        last = d.groupby("user_id").tail(1).set_index("user_id")["event_type"]
        n = d.groupby("user_id").size()
        return last.to_dict(), n.to_dict()

    l1, n1 = snap(t1)
    l2, n2 = snap(t2)
    want = {}
    for u, ty2 in l2.items():
        if u not in l1:
            want[u] = ("added", None, ty2, 0, n2[u])
        elif l1[u] != ty2:
            want[u] = ("changed", l1[u], ty2, n1[u], n2[u])
    assert got == want and len(got) > 0


# ----------------------------------------------------- k-hop BFS (gr4)


def test_k_hop_min_distances(spark):
    """BFS distances on a hand graph with a shorter path that must win,
    an unreachable node, and a cycle."""
    from parquet_common_spark.operators.graph import k_hop

    #  0->1->2->3->4 ; 0->3 (shortcut) ; 5->0 (upstream, unreachable
    #  FROM 0) ; 4->2 (cycle back)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (5, 0), (4, 2)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in k_hop(edges, sources, k=3).collect()}
    # dist(3) = 1 via the shortcut, NOT 3 via the chain; 5 unreachable
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}


def test_k_hop_saturates_and_multi_source(spark):
    from parquet_common_spark.operators.graph import k_hop

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 1)], "src long, dst long"
    )
    sources = spark.createDataFrame([(0,), (2,)], "node long")
    got = {r.node: r.dist for r in k_hop(edges, sources, k=5).collect()}
    # frontier empties after hop 1; extra hops are no-ops
    assert got == {0: 0, 2: 0, 1: 1}


def test_shortest_paths_light_long_path_beats_heavy_edge(spark):
    """Bellman-Ford on a hand graph: a 3-edge path of total weight 3
    must beat the direct weight-10 edge; an upstream node stays
    unreachable; distances keep improving across rounds."""
    from parquet_common_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10), (5, 0, 1)],
        "src long, dst long, w long",
    )
    sources = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in shortest_paths(edges, sources, iterations=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    # with only 1 round, the heavy direct edge is the best 1-edge path
    got1 = {
        r.node: r.dist
        for r in shortest_paths(edges, sources, iterations=1).collect()
    }
    assert got1 == {0: 0, 1: 1, 3: 10}


def test_shortest_paths_matches_reference_bellman_ford(spark):
    """Random weighted digraph vs an in-process Bellman-Ford replay."""
    import random

    from parquet_common_spark.operators.graph import shortest_paths

    rng = random.Random(7)
    n, rounds = 40, 5
    es = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(120)
        }
    )
    es = [(u, v, rng.randint(1, 9)) for u, v in es if u != v]
    srcs = [0, 7]

    ref = {s: 0 for s in srcs}
    for _ in range(rounds):
        nxt = dict(ref)
        for u, v, w in es:
            if u in ref and ref[u] + w < nxt.get(v, 1 << 60):
                nxt[v] = ref[u] + w
        ref = nxt

    edges = spark.createDataFrame(es, "src long, dst long, w long")
    sources = spark.createDataFrame([(s,) for s in srcs], "node long")
    got = {
        r.node: r.dist
        for r in shortest_paths(edges, sources, iterations=rounds).collect()
    }
    assert got == ref


def test_shortest_paths_unit_weights_equal_k_hop(spark):
    """w ≡ 1 reduces Bellman-Ford to BFS hop distance."""
    from parquet_common_spark.operators.graph import k_hop, shortest_paths

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 2)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(0,)], "node long")
    bfs = {r.node: r.dist for r in k_hop(edges, sources, k=3).collect()}
    wed = edges.selectExpr("src", "dst", "CAST(1 AS LONG) AS w")
    sp = {
        r.node: r.dist
        for r in shortest_paths(wed, sources, iterations=3).collect()
    }
    assert sp == bfs


# ------------------------------------- size-balanced shards (p14)


def test_size_balanced_shards_cut_points(spark):
    from parquet_common_spark.operators.packing import size_balanced_shards

    rows = [(i, 10) for i in range(10)]  # total 100, 4 shards -> target 25
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r.doc_id: r.shard
        for r in size_balanced_shards(df, ["doc_id"], "n_chars", 4).collect()
    }
    # cum 10..100; shard = floor((cum-1)/25): cum 10,20 -> 0; 30,40,50
    # -> 1; 60,70 -> 2; 80,90,100 -> 3
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3, 9: 3}


def test_size_balanced_shards_balance_bound(spark):
    import random

    from parquet_common_spark.operators.packing import size_balanced_shards

    rng = random.Random(3)
    rows = [(i, rng.randint(1, 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = size_balanced_shards(df, ["doc_id"], "n_chars", 8)
    per = (
        out.groupBy("shard")
        .agg(F.sum("n_chars").alias("s"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    total = sum(s for _i, s in rows)
    target = -(-total // 8)
    max_row = max(s for _i, s in rows)
    by_shard = sorted((r.shard, r.lo, r.hi, r.s) for r in per)
    # contiguity: shard id ranges tile [0,200) in order
    assert [b[0] for b in by_shard] == list(range(len(by_shard)))
    for (s1, lo1, hi1, _), (s2, lo2, hi2, _) in zip(by_shard, by_shard[1:]):
        assert lo2 == hi1 + 1
    # balance: every shard within one max row of the byte target
    for _s, _lo, _hi, tot in by_shard:
        assert tot <= target + max_row


# --------------------------------------------------- Bloom filter (a4)


def test_bloom_no_false_negatives_and_exact_fp_set(spark):
    """Cross-check bloom_bits/bloom_probe against a straight Python
    replay of the affine bit arithmetic: members always maybe=True;
    the false-positive SET (not just count) matches the reference."""
    from parquet_common_spark.operators.sketch import (
        BLOOM_A,
        BLOOM_B,
        BLOOM_K,
        bloom_bits,
        bloom_probe,
    )
    from parquet_common_spark.operators.text import HASH_P

    m = 64  # tiny on purpose: force plenty of collisions
    members = [3, 17, 99, 1024, 77777]
    probes = list(range(0, 4000, 7))
    mdf = spark.createDataFrame([(k,) for k in members], "k long")
    pdf = spark.createDataFrame([(k,) for k in probes], "k long")
    bits = bloom_bits(mdf, "k", m=m)
    got = {r.k: r.maybe for r in bloom_probe(pdf, bits, "k", m=m).collect()}

    ref_bits = {(k * a + b) % HASH_P % m for k in members for a, b in zip(BLOOM_A, BLOOM_B)}
    for k in probes:
        expect = all((k * a + b) % HASH_P % m in ref_bits for a, b in zip(BLOOM_A, BLOOM_B))
        assert got[k] == expect, k
    for k in members:
        if k in got:
            assert got[k] is True
    assert bits.count() <= min(m, len(members) * BLOOM_K)


def test_minhash_verify_semi_join_paths_identical(spark, sf_dir):
    """The verify_semi_join auto-gate (r11) is a pure plan choice: both
    paths must produce the exact same pair set, or the gate would make
    results corpus-size-dependent."""
    from parquet_common_spark.operators.dedup import minhash_lsh_pairs
    from parquet_common_spark.plans.common import load

    docs = load(spark, sf_dir, "documents")["documents"]
    on = set(
        map(
            tuple,
            minhash_lsh_pairs(
                docs, "doc_id", "text", tau=0.25, verify_semi_join=True
            ).collect(),
        )
    )
    off = set(
        map(
            tuple,
            minhash_lsh_pairs(
                docs, "doc_id", "text", tau=0.25, verify_semi_join=False
            ).collect(),
        )
    )
    assert on == off and len(on) > 0


def test_signatures_arrow_vectorized_edge_paths(spark):
    """r12: the vectorized signature stage's fallback paths — tokens
    wider than the padded-matrix cap (per-char fold), docs with <3
    tokens (whole-doc fold), empty/null text, non-ASCII code points —
    must agree exactly with the interpreted Column engine."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators import dedup as D

    wide = "x" * 200  # > _WIDE: exercises the per-char fallback
    rows = [
        (1, "three little tokens here today"),
        (2, "two tokens"),
        (3, "one"),
        (4, ""),
        (6, f"prefix {wide} suffix tokens more words"),
        (7, "naïve café über schön — ünïcodé tokens everywhere now"),
        (8, "  leading   and  trailing   whitespace   runs  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = (
        df.select(
            F.col("doc_id").alias("_id"),
            D.shingle_hashes(F.col("text")).alias("_sh"),
        )
        .withColumn("_sig", D.minhash_signature_from_hashes(F.col("_sh")))
        .orderBy("_id")
        .collect()
    )
    arr = D._signatures_arrow(df, "doc_id", "text").orderBy("_id").collect()
    assert [(r["_id"], sorted(r["_sh"]), list(r["_sig"])) for r in col] == [
        (r["_id"], sorted(r["_sh"]), list(r["_sig"])) for r in arr
    ]
    # NULL text: the arrow path has always treated it as "" (the column
    # path propagates null) — pin that the r12 rewrite kept the arrow
    # semantics: null == empty string, bit-for-bit
    nd = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    nr = {
        r["_id"]: (list(r["_sh"]), list(r["_sig"]))
        for r in D._signatures_arrow(nd, "doc_id", "text").collect()
    }
    assert nr[1] == nr[2]


def test_t2_sort_first_order_contract(spark, sf_dir):
    """r12: t2 replaced orderBy-above-projection with range-partition +
    per-partition sort BELOW the projection; collected rows must still
    come out exactly in doc_id order with identical values."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators import text as T
    from parquet_common_spark.plans.common import REGISTRY, load
    from parquet_common_spark.operators import pipeline_queries  # noqa: F401

    got = [tuple(r) for r in REGISTRY["t2_quality_scores"].fn(spark, sf_dir).collect()]
    docs = load(spark, sf_dir, "documents")["documents"]
    want = [
        tuple(r)
        for r in docs.select(
            "doc_id", T.quality_score(F.col("text")).alias("quality")
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_mm3_presort_order_contract(spark, sf_dir):
    """r12: mm3 dropped its final orderBy (rides the presort through the
    row-wise resize, mm1/mm4 shape) and pre-filters image rows below the
    Python stage; collected rows must still come out exactly in doc_id
    order with identical values to the orderBy-above form."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.multimodal import attach_fake_media, resize_media
    from parquet_common_spark.plans.common import REGISTRY
    from parquet_common_spark.plans.common import load
    from parquet_common_spark.operators import pipeline_queries  # noqa: F401

    got = [tuple(r) for r in REGISTRY["mm3_resize_geometry"].fn(spark, sf_dir).collect()]
    docs = load(spark, sf_dir, "documents")["documents"]
    want = [
        tuple(r)
        for r in resize_media(attach_fake_media(docs), max_side=256)
        .where(F.col("media_type") == "image")
        .select(
            "doc_id",
            F.length("payload").cast("long").alias("n_bytes"),
            "width",
            "height",
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_mm2_prefilter_pair_contract(spark, sf_dir):
    """r12: mm2 pre-filters video rows below BOTH Python stages and
    materializes the decode branch under a hash exchange; the joined,
    ordered output must equal the unfiltered-branch form exactly."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.multimodal import (
        attach_fake_media,
        decode_media,
        sample_frames,
    )
    from parquet_common_spark.plans.common import REGISTRY, load
    from parquet_common_spark.operators import pipeline_queries  # noqa: F401

    got = [tuple(r) for r in REGISTRY["mm2_frame_sampling"].fn(spark, sf_dir).collect()]
    docs = load(spark, sf_dir, "documents")["documents"]
    media = attach_fake_media(docs)
    frames = sample_frames(media, every_k=10)
    agg = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("frame_idx").cast("long").alias("sum_frame_idx"),
        F.sum(F.length("frame_payload")).cast("long").alias("frame_bytes"),
    )
    dec = decode_media(media).where(F.col("media_type") == "video").select(
        "doc_id", "n_frames"
    )
    want = [
        tuple(r)
        for r in dec.join(agg, "doc_id")
        .select("doc_id", "n_frames", "n_sampled", "sum_frame_idx", "frame_bytes")
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_spread_is_adaptive(spark):
    """r12: spread() repartitions ONLY when the source is narrower than
    the session parallelism — already-parallel frames pass through
    unchanged (no exchange added at cluster scale)."""
    from parquet_common_spark.plans.common import spread

    narrow = spark.range(1000).coalesce(1)
    assert spread(narrow).rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 7)
    assert spread(wide) is wide


def test_spread_keyed_hash_partitioning(spark):
    """r12: spread(df, None, key) must hash-partition (no round-robin
    pre-sort of the serial scan), stay adaptive (no-op on wide
    sources), and preserve the row multiset exactly."""
    from parquet_common_spark.plans.common import spread

    narrow = spark.range(1000).coalesce(1)
    out = spread(narrow, None, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(id" in plan and "roundrobin" not in plan.lower()
    assert sorted(r.id for r in out.collect()) == list(range(1000))
    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 7)
    assert spread(wide, None, "id") is wide


def test_presorted_order_survives_rowwise_map(spark):
    """r12: presorted(df, k) + a row-wise order-preserving map must
    collect in exact ORDER BY k order with NO sort above the map — the
    contract every sort-below-heavy-map query (t2/t4/.../mm1/mm3/mm4)
    rides.  Uses a skewed, shuffled input so AQE's partition coalescing
    (adjacent-only for range partitions) is exercised rather than a
    single pre-ordered partition."""
    from pyspark.sql import functions as F

    from parquet_common_spark.plans.common import presorted

    df = (
        spark.range(10_000)
        .select((F.col("id") * 2654435761 % 10_000).alias("k"))
        .repartition(17)  # destroy source order/partitioning first
    )
    mapped = presorted(df, "k").select("k", (F.col("k") * 3).alias("v"))
    got = [r.k for r in mapped.collect()]
    assert got == sorted(got) and len(got) == 10_000
