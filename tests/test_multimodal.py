"""Multimodal plumbing checks: schema, mapInPandas features, stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hgn_spark.multimodal.ops import (
    binary_documents,
    byte_histogram_features,
    decode_image,
    fake_decode,
    sample_frames,
)
from tests.conftest import SF_SMOKE


def test_binary_schema(spark):
    b = binary_documents(spark, SF_SMOKE)
    assert dict(b.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "modality": "string",
    }


def test_corpus_is_ascii_as_oracles_assume(spark):
    """The byte-histogram and decode oracles rebuild payload bytes with
    DuckDB ascii(substr(text, i, 1)), which equals the utf-8 byte only
    for pure-ASCII text (ADVICE r2). Pin that corpus property at every
    shipped scale so a non-ASCII regen fails here, not as a silent
    hash mismatch."""
    from hgn_spark.catalog import load_table

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        n_non_ascii = (
            load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") != F.length("text"))
            .count()
        )
        assert n_non_ascii == 0, f"non-ASCII documents in {sf_dir}"


def test_byte_histogram_matches_numpy(spark):
    b = binary_documents(spark, SF_SMOKE).filter(F.col("doc_id") < 5)
    got = {r["doc_id"]: r for r in byte_histogram_features(b).collect()}
    src = {r["doc_id"]: r["payload"] for r in b.collect()}
    assert len(got) == len(src)
    for doc_id, payload in src.items():
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr // 16, minlength=16)[:16]
        r = got[doc_id]
        assert r["n_bytes"] == arr.size
        assert r["n_distinct_bytes"] == np.unique(arr).size
        assert list(r["hist"]) == [int(x) for x in hist]


def test_decode_stub_raises_and_fake_is_deterministic():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    a = fake_decode(b"abc", 4, 4)
    assert a == fake_decode(b"abc", 4, 4)
    assert len(a) == 16
    assert a[:4] == [ord("a"), ord("b"), ord("c"), ord("a")]
    assert fake_decode(b"", 2, 2) == [0, 0, 0, 0]


def test_sample_frames(spark):
    b = binary_documents(spark, SF_SMOKE).filter(F.col("doc_id") == 0)
    payload = b.collect()[0]["payload"]
    frames = sample_frames(b, every_nth=4, frame_bytes=16).collect()
    n_frames_total = (len(payload) + 15) // 16
    expect_kept = len(range(0, n_frames_total, 4))
    assert len(frames) == expect_kept
    assert bytes(frames[0]["frame"]) == payload[:16]


def test_decode_resize_matches_numpy(spark):
    from hgn_spark.multimodal.ops import decode_resize_features

    b = binary_documents(spark, SF_SMOKE).filter(F.col("doc_id") < 5)
    got = {r["doc_id"]: list(r["pixels"]) for r in decode_resize_features(b).collect()}
    src = {r["doc_id"]: r["payload"] for r in b.collect()}
    assert len(got) == len(src)
    for doc_id, payload in src.items():
        grid = np.asarray(fake_decode(payload, 8, 8), dtype=np.int64).reshape(8, 8)
        small = grid[np.ix_([0, 2, 4, 6], [0, 2, 4, 6])]
        assert got[doc_id] == small.ravel().tolist()


def test_window_energy_matches_numpy(spark):
    """Per-window energy/peak equals a direct numpy computation on the
    same payloads, windows tile the payload exactly."""
    import numpy as np

    from hgn_spark.multimodal.ops import binary_documents, window_energy
    from tests.conftest import SF_SMOKE

    df = binary_documents(spark, SF_SMOKE).limit(20)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in df.collect()}
    got = {}
    for r in window_energy(df, window_bytes=32).collect():
        got[(r["doc_id"], r["window_idx"])] = (
            r["n_bytes"], r["energy"], r["peak"]
        )
    n_windows = 0
    for doc_id, payload in payloads.items():
        buf = np.frombuffer(payload, dtype=np.uint8)
        for w in range(0, len(buf), 32):
            win = buf[w : w + 32]
            n_windows += 1
            nb, en, pk = got[(doc_id, w // 32)]
            assert nb == len(win)
            assert en == round(float(win.mean()), 4)
            assert pk == int(win.max())
    assert len(got) == n_windows


def test_sniff_modality_signatures(spark):
    """Magic-byte classification on hand-built payloads covers every
    signature (incl. GIF, which the planted driver row doesn't use),
    the RIFF-without-WAVE near-miss, and short/empty payloads."""
    from pyspark.sql import functions as F

    from hgn_spark.multimodal.ops import sniff_modality

    cases = [
        (1, b"\x89PNG\r\n\x1a\n" + b"xx", "image/png"),
        (2, b"\xff\xd8\xff\xe0rest", "image/jpeg"),
        (3, b"GIF89a....", "image/gif"),
        (4, b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav"),
        (5, b"%PDF-1.7", "application/pdf"),
        (6, b"RIFF\x10\x00\x00\x00AVI LIST", "application/octet-stream"),
        (7, b"plain text here", "application/octet-stream"),
        (8, b"", "application/octet-stream"),
        (9, b"\x89PN", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "id long, payload binary"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", sniff_modality(F.col("payload")).alias("m")).collect()
    }
    assert got == {i: want for i, _, want in cases}


def test_window_energy_empty_payload_row(spark):
    """An empty payload yields exactly one zero row instead of vanishing
    from the feature table (ADVICE r5), consistent with
    byte_histogram_features' n_bytes=0 row."""
    from pyspark.sql import functions as F

    from hgn_spark.multimodal.ops import window_energy

    df = spark.createDataFrame(
        [(1, b""), (2, b"abc")], "doc_id long, payload binary"
    )
    rows = {
        (r["doc_id"], r["window_idx"]): r
        for r in window_energy(df, window_bytes=32).collect()
    }
    assert set(rows) == {(1, 0), (2, 0)}
    empty = rows[(1, 0)]
    assert (empty["n_bytes"], empty["energy"], empty["peak"]) == (0, 0.0, 0)
    assert rows[(2, 0)]["n_bytes"] == 3
