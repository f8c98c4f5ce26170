"""Training-data pipeline operators over the driver's documents/embeddings
tables: dedup, similarity, text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

from dataflow_ordered_processing_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_dedup_exact(docs):
    pdf = docs.toPandas()
    norm = pdf["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    got = dedup.dedup_exact(docs).toPandas()
    assert len(got) == norm.nunique()
    assert got["n_copies"].sum() == len(pdf)


def test_minhash_lsh_finds_exact_dups(docs):
    # exact duplicates must share every band → always candidates
    pdf = docs.toPandas()
    norm = pdf["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    dup_groups = pdf.assign(n=norm).groupby("n")["doc_id"].apply(list)
    expected_pairs = {
        (a, b)
        for ids in dup_groups
        for a in ids
        for b in ids
        if a < b
    }
    got = dedup.minhash_lsh_pairs(docs, k=8, bands=4)
    got_pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    assert expected_pairs <= got_pairs


def test_ngram_jaccard_on_candidates(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, k=8, bands=4)
    sims = dedup.ngram_jaccard(pairs, docs).toPandas()
    if len(sims):
        assert sims["jaccard"].between(0, 1).all()
    # exact dups have jaccard 1.0
    pdf = docs.toPandas()
    norm = pdf["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    dups = pdf.assign(n=norm).groupby("n")["doc_id"].apply(list)
    exact = [(min(a, b), max(a, b)) for ids in dups if len(ids) > 1 for a, b in [(ids[0], ids[1])]]
    if exact:
        merged = sims.set_index(["doc_a", "doc_b"])
        for p in exact:
            assert merged.loc[p, "jaccard"] == 1.0


def test_simhash_identical_for_exact_dups(docs):
    pdf = docs.toPandas()
    norm = pdf["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    got = dedup.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    for _, ids in pdf.assign(n=norm).groupby("n")["doc_id"]:
        ids = list(ids)
        if len(ids) > 1:
            assert got[ids].nunique() == 1
    assert got.notna().all()


def test_dedup_keep_first(docs):
    pairs = dedup.minhash_lsh_pairs(docs, k=8, bands=4)
    kept = dedup.dedup_keep_first(docs, pairs)
    assert 0 < kept.count() <= docs.count()


def test_brute_force_topk_matches_numpy(embs):
    pdf = embs.toPandas()
    queries = embs.limit(3).select(
        embs.vec_id.alias("query_id"), embs.embedding.alias("q_embedding")
    )
    got = similarity.brute_force_topk(embs, queries, k=5).toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for qid in got["query_id"].unique():
        qv = Mn[ids == qid][0]
        sims = Mn @ qv
        order = np.argsort(-sims, kind="stable")
        want = [int(ids[j]) for j in order if ids[j] != qid][:5]
        have = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert have == want


def test_lsh_topk_subset_of_bucket(embs):
    queries = embs.limit(2).select(
        embs.vec_id.alias("query_id"), embs.embedding.alias("q_embedding")
    )
    got = similarity.lsh_topk(embs, queries, k=5, n_planes=4).toPandas()
    assert (got["rank"] <= 5).all()
    assert got["cos_sim"].between(-1.001, 1.001).all()
    # recall vs brute force is imperfect but nonzero on 4 planes
    bf = similarity.brute_force_topk(embs, queries, k=5).toPandas()
    inter = set(map(tuple, got[["query_id", "vec_id"]].values)) & set(
        map(tuple, bf[["query_id", "vec_id"]].values)
    )
    assert len(inter) > 0


def test_cosine_near_dup_bounds(embs):
    nd = similarity.cosine_near_dup(embs.limit(200), threshold=0.8, n_planes=4).toPandas()
    assert (nd["vec_a"] < nd["vec_b"]).all() if len(nd) else True


def test_token_count_and_quality(docs):
    tc = text.token_count(docs).toPandas()
    pdf = docs.toPandas()
    want = pdf["text"].str.strip().str.split().str.len()
    got = tc.set_index("doc_id")["n_ws_tokens"][pdf["doc_id"]].to_numpy()
    assert (got == want.to_numpy()).all()
    q = text.quality_score(docs).toPandas()
    assert q["quality"].between(0, 1).all()


def test_lang_id_deterministic(docs):
    li = text.lang_id(docs).toPandas()
    assert li["lang_pred"].isin(["de", "en", "es", "fr"]).all()
    li2 = text.lang_id(docs).toPandas()
    pd.testing.assert_frame_equal(li, li2)


def test_fingerprint_exact_dups_share_fp(docs):
    fp = text.fingerprint(docs).toPandas()
    pdf = docs.toPandas()
    norm = pdf["text"].str.lower().str.replace(r"\s+", " ", regex=True)
    merged = fp.merge(pdf.assign(n=norm)[["doc_id", "n"]], on="doc_id")
    assert (merged.groupby("n")["exact_fp"].nunique() == 1).all()
    assert (merged.groupby("n")["shingle_fp"].nunique() == 1).all()


def test_multimodal_features(spark):
    media = multimodal.synth_media(spark, n=32)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 32
    vis = feats["kind"] != "audio"
    assert feats.loc[vis, "feat_mean"].between(0, 255).all()
    # audio is REALLY decoded: a pure sine has mean ~0 and rms ~amp/sqrt(2)
    aud = feats[feats["kind"] == "audio"]
    assert aud["feat_mean"].abs().max() < 1e-3
    assert ((aud["feat_rms"] - 0.5 / np.sqrt(2)).abs() < 1e-3).all()
    assert (feats.loc[feats["kind"] == "video", "n_sampled_frames"] >= 1).all()
    # deterministic across runs
    feats2 = multimodal.extract_features(media).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", 4, 4, fake=False)


def test_wav_roundtrip_exact():
    # encode -> decode is bit-exact for int16 PCM
    samples = (np.sin(np.linspace(0, 20, 777)) * 20000).astype("<i2")
    payload = multimodal.encode_wav(samples, rate=8000)
    x, rate = multimodal.decode_audio(payload)
    assert rate == 8000
    np.testing.assert_array_equal((x * 32768.0).astype("<i2"), samples)


def test_decode_audio_rejects_non_pcm16():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        multimodal.decode_audio(buf.getvalue())


def test_redact_pii_on_crafted_text(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk or bob@test.io thanks"),
        (2, "server at 10.0.255.3 port 80; call +1 (415) 555-0199 now"),
        (3, "clean text with no secrets at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.redact_pii(df).toPandas().set_index("doc_id")
    assert got.loc[1, "n_email"] == 2
    assert "<EMAIL>" in got.loc[1, "redacted"] and "@" not in got.loc[1, "redacted"]
    assert got.loc[2, "n_ipv4"] == 1 and got.loc[2, "n_phone"] == 1
    assert "<IPV4>" in got.loc[2, "redacted"] and "<PHONE>" in got.loc[2, "redacted"]
    assert got.loc[3, "redacted"] == rows[2][1]
    assert (got[["n_email", "n_ipv4", "n_phone"]].loc[3] == 0).all()


def test_bpe_regex_token_count(spark):
    df = spark.createDataFrame([(1, "Hello, world! x2 (42)")], "doc_id long, text string")
    got = text.token_count(df).toPandas().iloc[0]
    # Hello , world ! x 2 ( 4 2 )  -> 10 pieces
    assert got["n_bpe_regex"] == 10
    assert got["n_ws_tokens"] == 4


def test_ivf_topk_recall_and_self_cells(embs):
    queries = embs.limit(3).select(
        embs.vec_id.alias("query_id"), embs.embedding.alias("q_embedding")
    )
    got = similarity.ivf_topk(embs, queries, k=5, n_cells=8, n_probe=2).toPandas()
    assert (got["rank"] <= 5).all()
    # recall vs brute force is imperfect but nonzero with 8 cells / 2 probes
    bf = similarity.brute_force_topk(embs, queries, k=5).toPandas()
    inter = set(map(tuple, got[["query_id", "vec_id"]].values)) & set(
        map(tuple, bf[["query_id", "vec_id"]].values)
    )
    assert len(inter) > 0
    # a centroid vector must be assigned to its own cell (cos = 1 with itself)
    from pyspark.sql import functions as F

    cent_rows = embs.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = [(int(r["vec_id"]), list(r["embedding"])) for r in cent_rows]
    assigned = similarity.ivf_assign(embs.filter(F.col("vec_id") < 8), "embedding", cents)
    rows = assigned.toPandas()
    assert (rows["cell"] == rows["vec_id"]).all()
