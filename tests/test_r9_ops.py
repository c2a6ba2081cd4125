"""Round-9 operator semantics: Naive Bayes classification and scalar
embedding quantization — planted-truth cases the oracle hash-match
cannot express (does the classifier actually classify; do codes
reconstruct)."""

from pyspark.sql import functions as F

from amaxa_spark.operators.similarity import (
    cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from amaxa_spark.operators.text import nb_classify


def test_nb_classify_learns_planted_vocabulary(spark):
    rows = []
    for i in range(20):
        rows.append((f"en{i}", "the cat sat on the mat", "en"))
        rows.append((f"fr{i}", "le chat est sur le tapis", "fr"))
    train = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    score = spark.createDataFrame(
        [
            ("q1", "the dog sat on the cat", None),
            ("q2", "le chien est dans le chat", None),
        ],
        "doc_id string, text string, lang string",
    )
    got = {
        r.doc_id: r.label_pred
        for r in nb_classify(
            train, score, "text", "doc_id", "lang"
        ).collect()
    }
    assert got == {"q1": "en", "q2": "fr"}


def test_nb_classify_scores_are_integer_micronats(spark):
    train = spark.createDataFrame(
        [("a", "x x y", "A"), ("b", "y z z", "B")],
        "doc_id string, text string, lang string",
    )
    out = nb_classify(train, train, "text", "doc_id", "lang").collect()
    assert {r.doc_id for r in out} == {"a", "b"}
    for r in out:
        assert isinstance(r.score_unats, int)
        assert r.score_unats < 0  # log-probabilities
        assert r.n_tokens == 3


def test_nb_classify_drops_docs_with_no_invocab_tokens(spark):
    train = spark.createDataFrame(
        [("a", "alpha beta", "A"), ("b", "gamma delta", "B")],
        "doc_id string, text string, lang string",
    )
    score = spark.createDataFrame(
        [("q", "zeta eta", None), ("r", "alpha zeta", None)],
        "doc_id string, text string, lang string",
    )
    out = nb_classify(train, score, "text", "doc_id", "lang").collect()
    assert [r.doc_id for r in out] == ["r"]  # q has zero known tokens
    assert out[0].n_tokens == 1  # zeta dropped, alpha kept


def test_quantize_embeddings_exact_small_case(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 5.0]),
            (2, [1.0, 20.0, 5.0]),
            (3, [2.0, 30.0, 5.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in quantize_embeddings(df, "embedding", "vec_id").collect()
    }
    # dim0 spans [0,2]: codes 0, 128 (round(0.5*255)=128), 255
    # dim1 spans [10,30]: codes 0, 128, 255
    # dim2 constant: span 0 -> code 0, exact reconstruction
    assert out[1].code_sum == 0 and out[3].code_sum == 510
    assert out[2].code_sum == 256
    assert out[1].n_dims == 3
    assert out[1].err2_pico == 0 and out[3].err2_pico == 0  # endpoints exact
    assert out[2].err2_pico > 0  # midpoint 128/255 != 0.5 exactly
    assert out[2].code_min == 0 and out[2].code_max == 128


def test_quantized_topk_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10)
    quant = quantized_cosine_topk(emb, qids, k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & q) / len(e)
    # int8 codes at dim=64: ranking error is the quantization error
    # only — recall@10 must stay high
    assert recall >= 0.8, recall
    # and similarities must agree to quantization precision
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    for r in quant.collect():
        key = (r.query_id, r.neighbor_id)
        if key in ex:
            assert abs(r.sim - ex[key]) < 0.01


def test_quantize_reconstruction_error_is_bounded(spark):
    # random-ish vectors: per-dim error must be <= (span/255/2)^2 per
    # term (the quantizer's half-step bound)
    df = spark.range(50).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(
            *[
                (F.sin(F.col("id") * (i + 1)) * 3.0).alias(f"d{i}")
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    out = quantize_embeddings(df, "embedding", "vec_id").collect()
    # span <= 6.0 per dim -> half-step 6/255/2 ~ 0.01176; 8 dims
    bound_pico = int(8 * (0.012**2) * 1e12) + 1
    for r in out:
        assert 0 <= r.err2_pico <= bound_pico
        assert 0 <= r.code_min <= r.code_max <= 255


def test_dhash_pairs_and_hamming_near_dups(spark):
    from amaxa_spark.operators.dedup import hamming_near_dups
    from amaxa_spark.operators.multimodal import (
        dhash_images,
        synthesize_bmp_pairs,
    )

    ids = spark.range(40).select(F.col("id").cast("long").alias("doc_id"))
    imgs = synthesize_bmp_pairs(ids, "doc_id", "image")
    hashes = dhash_images(imgs, "image", "doc_id")
    hvals = {r.doc_id: r.dhash for r in hashes.collect()}
    assert all(v is not None and 0 <= v < (1 << 56) for v in hvals.values())
    # planted pairs within 1 bit; unrelated pairs far apart
    assert bin(hvals[0] ^ hvals[1]).count("1") <= 1
    assert bin(hvals[0] ^ hvals[2]).count("1") > 6
    pairs = hamming_near_dups(hashes, "doc_id", "dhash", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(2 * e, 2 * e + 1) for e in range(20)}


def test_dhash_null_and_undecodable_payloads(spark):
    from amaxa_spark.operators.multimodal import dhash_images

    df = spark.createDataFrame(
        [(1, None), (2, b"not an image"), (3, b"BM" + b"\x00" * 10)],
        "doc_id long, image binary",
    )
    out = {r.doc_id: r.dhash for r in dhash_images(df, "image", "doc_id").collect()}
    assert out == {1: None, 2: None, 3: None}


def test_hamming_near_dups_lossy_guard(spark):
    from amaxa_spark.operators.dedup import hamming_near_dups
    import pytest

    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, h long")
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dups(df, "id", "h", max_hamming=6, bands=4)
    # explicit opt-in allows the LSH-style trade
    hamming_near_dups(
        df, "id", "h", max_hamming=6, bands=4, allow_lossy=True
    ).collect()
    # and more bands restore completeness for the larger radius
    hamming_near_dups(df, "id", "h", max_hamming=6, bands=7, band_bits=8).collect()


def test_audio_fingerprint_pairs(spark):
    from amaxa_spark.operators.dedup import hamming_near_dups
    from amaxa_spark.operators.multimodal import (
        audio_fingerprint,
        synthesize_chirp_wav_pairs,
    )

    ids = spark.range(20).select(F.col("id").cast("long").alias("doc_id"))
    wavs = synthesize_chirp_wav_pairs(ids, "doc_id", "audio")
    fps = audio_fingerprint(wavs, "audio", "doc_id")
    fvals = {r.doc_id: r.afp for r in fps.collect()}
    assert all(v is not None and 0 <= v < (1 << 56) for v in fvals.values())
    assert bin(fvals[0] ^ fvals[1]).count("1") <= 1  # planted pair
    assert bin(fvals[0] ^ fvals[2]).count("1") > 6  # unrelated
    pairs = hamming_near_dups(fps, "doc_id", "afp", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(2 * e, 2 * e + 1) for e in range(10)} <= got


def test_audio_fingerprint_short_payload_is_null(spark):
    from amaxa_spark.operators.multimodal import (
        audio_fingerprint,
        synthesize_tone_wav,
    )

    ids = spark.range(3).select(F.col("id").cast("long").alias("doc_id"))
    # synthesize_tone_wav payloads have only 2-4 windows of 1024:
    # far fewer than the 57 fingerprint windows -> null
    wavs = synthesize_tone_wav(ids, "doc_id", "audio")
    out = audio_fingerprint(wavs, "audio", "doc_id").collect()
    assert all(r.afp is None for r in out)


def test_pq_encode_shapes_and_determinism(spark):
    from amaxa_spark.operators.similarity import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    codes, cb = pq_encode(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    assert codes.count() == 500 * 8
    assert cb.count() == 8 * 16
    rows = {(r.vec_id, r.seg): r.code for r in codes.collect()}
    assert all(0 <= c < 500 for c in rows.values())  # cids are seed ids
    # deterministic: a second train reproduces the codes exactly
    codes2, _ = pq_encode(emb, "embedding", "vec_id", dim=64, m=8, k=16)
    assert rows == {(r.vec_id, r.seg): r.code for r in codes2.collect()}
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(emb, "embedding", "vec_id", dim=64, m=7)


def test_pq_adc_recall_and_rerank(spark):
    from amaxa_spark.operators.similarity import pq_topk_adc

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    e = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, qids, k=10).collect()
    }
    raw = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk_adc(emb, qids, dim=64, k_top=10).collect()
    }
    # 8 segments x 16 codes, no rerank: the honest code-only floor
    assert len(e & raw) / len(e) >= 0.3
    rr = pq_topk_adc(emb, qids, dim=64, k_top=10, oversample=8)
    rset = {(r.query_id, r.neighbor_id) for r in rr.collect()}
    # exact rerank of an 8x candidate sliver recovers most of top-10
    assert len(e & rset) / len(e) >= 0.75
    # reranked sims are EXACT cosines for true hits
    ex = {
        (r.query_id, r.neighbor_id): r.sim
        for r in cosine_topk(emb, qids, k=10).collect()
    }
    for r in rr.collect():
        if (r.query_id, r.neighbor_id) in ex:
            assert abs(r.sim - ex[(r.query_id, r.neighbor_id)]) < 2e-6
