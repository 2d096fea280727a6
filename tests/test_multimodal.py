"""Multimodal plumbing: binary payload column, Arrow-batched extraction,
stubbed decode contract."""

from __future__ import annotations

import hashlib

import pytest

from kafkastreamingetl_spark.operators.multimodal import (
    _fake_decode,
    decode_image,
    extract_features,
    with_binary_payload,
)


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_extract_features_binary_path(spark):
    rows = [(1, "hello world"), (2, "café bytes")]  # non-ASCII exercised
    df = with_binary_payload(spark.createDataFrame(rows, ["doc_id", "text"]))
    assert dict(df.dtypes)["payload"] == "binary"
    got = {r.doc_id: r for r in extract_features(df).collect()}
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        digest = hashlib.md5(raw).hexdigest()
        r = got[doc_id]
        assert r.n_bytes == len(raw)  # bytes, not chars (café: 10 vs 9)
        assert r.content_md5 == digest
        assert (r.fake_width, r.fake_height) == _fake_decode(digest)
