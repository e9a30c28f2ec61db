"""Tests for text-analysis and multimodal plumbing operators."""

import pytest

from elastic_indexer4s_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog"),
        (1, "der schnelle Fuchs und die Katze ist da"),
        (2, "xyz qqq zzz"),                       # no markers
        (3, ""),                                   # empty
        (4, "a b c !!! ??? ..."),                  # punct heavy
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(docs):
    out = {r["doc_id"]: (r["pred_lang"], r["hits"])
           for r in textstats.language_id(docs).collect()}
    assert out[0][0] == "en" and out[0][1] >= 3
    assert out[1][0] == "de"
    assert out[2] == ("und", 0)
    assert out[3] == ("und", 0)


def test_quality_metrics(docs):
    out = {r["doc_id"]: r.asDict() for r in
           textstats.quality_metrics(docs).collect()}
    assert out[0]["n_tokens"] == 8
    assert out[0]["quality"] == 1.0
    assert out[3]["n_tokens"] == 0 and out[3]["avg_tok_len"] is None
    assert out[4]["punct_ratio"] > 0.3
    assert out[4]["quality"] < 1.0


def test_token_counts(docs):
    out = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
           for r in textstats.token_counts(docs).collect()}
    assert out[0] == (8, 8)
    assert out[3] == (0, 0)
    assert out[4] == (6, 12)  # 'a b c' = 3 + nine symbol tokens


def test_fingerprint_order_sensitive(spark):
    rows = [(0, "alpha beta gamma"), (1, "gamma beta alpha"),
            (2, "alpha beta gamma"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(df).collect()}
    assert out[0] == out[2]              # deterministic
    assert out[0] != out[1]              # permutation changes fp
    assert out[3] == 0                   # empty doc -> 0


def test_multimodal_roundtrip(docs):
    media = multimodal.attach_payload(docs)
    assert [f.name for f in media.schema.fields] == [
        "id", "kind", "payload", "meta"]
    meta = {r["id"]: (r["n_bytes"], r["sha256"])
            for r in multimodal.payload_meta(media).collect()}
    assert meta[0][0] == len("the quick brown fox and the lazy dog")
    import hashlib
    assert meta[0][1] == hashlib.sha256(
        b"the quick brown fox and the lazy dog").hexdigest()


def test_multimodal_features_deterministic(docs):
    media = multimodal.attach_payload(docs)
    a = sorted(multimodal.extract_features(media).collect(),
               key=lambda r: r["id"])
    b = sorted(multimodal.extract_features(media).collect(),
               key=lambda r: r["id"])
    assert [r["feature"] for r in a] == [r["feature"] for r in b]
    assert all(len(r["feature"]) == 8 for r in a)
    assert all(r["channels"] == 3 and r["n_frames"] == 1 for r in a)
    assert all(16 <= r["width"] <= 16 + 512 for r in a)


def test_multimodal_strict_requires_codec(docs):
    media = multimodal.attach_payload(docs)
    if multimodal.decode_available():
        pytest.skip("codec libs present")
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, strict=True)


def test_resize_stub_passthrough(docs):
    media = multimodal.attach_payload(docs)
    out = multimodal.resize_stub(media, 224, 128).collect()
    assert all(r["width"] == 224 and r["height"] == 128 for r in out)
    assert {bytes(r["payload"]) for r in out} == \
        {bytes(r["payload"]) for r in media.collect()}


def test_frame_sample_stub(spark):
    from elastic_indexer4s_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "abcdefgh" * 4), (2, "xy")], "doc_id long, text string")
    media = multimodal.attach_payload(df, kind="video")
    out = multimodal.frame_sample(media, n_frames=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # 32-byte payload -> 4 frames of 8 bytes, reassembling the prefix
    f1 = sorted(by_id[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f1] == [0, 1, 2, 3]
    assert all(r["n_bytes"] == 8 for r in f1)
    assert b"".join(bytes(r["frame"]) for r in f1) == b"abcdefgh" * 4
    # 2-byte payload -> only as many frames as there are bytes
    f2 = sorted(by_id[2], key=lambda r: r["frame_idx"])
    assert b"".join(bytes(r["frame"]) for r in f2) == b"xy"
    assert len(f2) == 2
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media, strict=True)
