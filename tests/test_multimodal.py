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


def test_wav_codec_roundtrip():
    """PCM-WAV encode→decode is exact for random int16 signals."""
    import numpy as np

    from hgn_spark.multimodal.codecs import decode_wav_pcm16, encode_wav_pcm16

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    payload = encode_wav_pcm16(samples, sample_rate=8000)
    rate, back = decode_wav_pcm16(payload)
    assert rate == 8000
    assert np.array_equal(back, samples)
    # single-frame mono stays 1-D (a bare squeeze would collapse to 0-d)
    _, one = decode_wav_pcm16(encode_wav_pcm16([123]))
    assert one.ndim == 1 and one.tolist() == [123]
    # stereo round-trips as (n_frames, 2) through a hand-built payload
    import io
    import wave

    stereo = np.array([[1, -2], [3, -4], [5, -6]], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(stereo.tobytes())
    _, st = decode_wav_pcm16(buf.getvalue())
    assert st.shape == (3, 2) and np.array_equal(st, stereo)


def test_png_codec_roundtrip_and_crc():
    """Grayscale-PNG encode→decode is exact; a corrupted byte fails the
    CRC check instead of decoding garbage."""
    import numpy as np
    import pytest

    from hgn_spark.multimodal.codecs import decode_png_gray8, encode_png_gray8

    rng = np.random.default_rng(11)
    grid = rng.integers(0, 256, size=(13, 7), dtype=np.uint8)
    payload = encode_png_gray8(grid)
    assert np.array_equal(decode_png_gray8(payload), grid)
    corrupted = bytearray(payload)
    corrupted[40] ^= 0xFF  # inside IHDR/IDAT body
    with pytest.raises(ValueError):
        decode_png_gray8(bytes(corrupted))


def test_png_unfilter_types_hand_computed():
    """Each PNG scanline filter (Sub/Up/Average/Paeth) unfilters to the
    hand-computed pixel values — built from raw scanline bytes, not our
    own encoder, so encoder and decoder cannot share a bug."""
    import struct
    import zlib

    import numpy as np

    from hgn_spark.multimodal.codecs import _PNG_SIG, _chunk, decode_png_gray8

    def build(raw_scanlines: bytes, w: int, h: int) -> bytes:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw_scanlines))
            + _chunk(b"IEND", b"")
        )

    # Row 0 filter None: [10, 20, 30]
    # Row 1 filter Sub:  raw [5, 7, 9]  -> 5, 12, 21 (adds left)
    # Row 2 filter Up:   raw [1, 1, 1]  -> 6, 13, 22 (adds above)
    raw = bytes([0, 10, 20, 30]) + bytes([1, 5, 7, 9]) + bytes([2, 1, 1, 1])
    got = decode_png_gray8(build(raw, 3, 3))
    assert got.tolist() == [[10, 20, 30], [5, 12, 21], [6, 13, 22]]

    # Average: row0 None [100, 50]; row1 Average raw [10, 20]:
    #   px0 = 10 + 100//2 = 60; px1 = 20 + (60 + 50)//2 = 75
    raw = bytes([0, 100, 50]) + bytes([3, 10, 20])
    got = decode_png_gray8(build(raw, 2, 2))
    assert got.tolist() == [[100, 50], [60, 75]]

    # Paeth: row0 None [100, 200]; row1 Paeth raw [10, 20]:
    #   px0: paeth(0, 100, 0) = 100 -> 110
    #   px1: a=110 b=200 c=100; p=210; pa=100 pb=10 pc=110 -> b=200
    #        -> (20+200)%256 = 220
    raw = bytes([0, 100, 200]) + bytes([4, 10, 20])
    got = decode_png_gray8(build(raw, 2, 2))
    assert got.tolist() == [[100, 200], [110, 220]]


def test_audio_rms_features_real_wav(spark):
    """Real WAV payloads through the Spark extractor: per-frame RMS and
    peak equal a direct numpy computation on the source samples."""
    import numpy as np

    from hgn_spark.multimodal.codecs import encode_wav_pcm16
    from hgn_spark.multimodal.ops import audio_rms_features

    rng = np.random.default_rng(3)
    sigs = {
        1: (1000.0 * np.sin(np.arange(600) * 0.1)).astype(np.int16),
        2: rng.integers(-2000, 2000, size=100, dtype=np.int16),
        3: np.zeros(0, dtype=np.int16),  # empty stream
    }
    df = spark.createDataFrame(
        [(i, encode_wav_pcm16(s)) for i, s in sigs.items()],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in audio_rms_features(df, frame_samples=256).collect()
    }
    n_frames = 0
    for i, s in sigs.items():
        if s.size == 0:
            assert got[(i, 0)]["n_samples"] == 0 and got[(i, 0)]["rms"] == 0.0
            n_frames += 1
            continue
        for f in range(0, s.size, 256):
            win = s[f : f + 256].astype(np.float64)
            r = got[(i, f // 256)]
            assert r["n_samples"] == win.size
            assert r["rms"] == round(float(np.sqrt(np.mean(win**2))), 4)
            assert r["peak"] == int(np.abs(win).max())
            n_frames += 1
    assert len(got) == n_frames


def test_audio_rms_features_stereo_wav(spark):
    """Stereo payloads window along the FRAME axis (ADVICE r6: the old
    flat-sample loop overran the row axis for stereo signals longer
    than frame_samples/2 frames and crashed on the empty window):
    per-window rms/peak cover both channels, n_samples counts frames,
    all equal to a direct numpy computation."""
    import numpy as np

    from hgn_spark.multimodal.codecs import encode_wav_pcm16
    from hgn_spark.multimodal.ops import audio_rms_features

    rng = np.random.default_rng(11)
    # 600 frames > frame_samples: exactly the regime the old loop
    # crashed in (s.size = 1200 iterated past row 600).
    stereo = rng.integers(-3000, 3000, size=(600, 2), dtype=np.int16)
    short = rng.integers(-100, 100, size=(5, 2), dtype=np.int16)
    df = spark.createDataFrame(
        [(1, encode_wav_pcm16(stereo)), (2, encode_wav_pcm16(short))],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in audio_rms_features(df, frame_samples=256).collect()
    }
    n = 0
    for i, s in ((1, stereo), (2, short)):
        for f in range(0, s.shape[0], 256):
            win = s[f : f + 256].astype(np.float64)
            r = got[(i, f // 256)]
            assert r["n_samples"] == win.shape[0]
            assert r["rms"] == round(float(np.sqrt(np.mean(win**2))), 4)
            assert r["peak"] == int(np.abs(win).max())
            n += 1
    assert len(got) == n


def test_png_decode_resize_features_real_png(spark):
    """Real PNG payloads through the Spark extractor: decoded +
    resized grids match a direct numpy computation."""
    import numpy as np

    from hgn_spark.multimodal.codecs import encode_png_gray8
    from hgn_spark.multimodal.ops import png_decode_resize_features

    rng = np.random.default_rng(5)
    grids = {
        1: rng.integers(0, 256, size=(8, 8), dtype=np.uint8),
        2: rng.integers(0, 256, size=(16, 12), dtype=np.uint8),
    }
    df = spark.createDataFrame(
        [(i, encode_png_gray8(g)) for i, g in grids.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in png_decode_resize_features(df).collect()}
    for i, g in grids.items():
        h, w = g.shape
        r_idx = np.floor(np.arange(4) * h / 4).astype(int)
        c_idx = np.floor(np.arange(4) * w / 4).astype(int)
        small = g[np.ix_(r_idx, c_idx)].astype(np.int64)
        assert (got[i]["height"], got[i]["width"]) == (h, w)
        assert got[i]["pixels"] == small.ravel().tolist()
        assert got[i]["mean_px"] == round(float(small.mean()), 4)


def test_route_by_modality_mixed_corpus(spark):
    """A mixed binary corpus (real WAV + real PNG + raw text bytes)
    routes each payload to the right extractor off one sniffed scan:
    every doc lands in exactly one slice, the strict decoders never see
    a foreign format, and the features are the real decoded ones."""
    import numpy as np

    from hgn_spark.multimodal.codecs import encode_png_gray8, encode_wav_pcm16
    from hgn_spark.multimodal.ops import route_by_modality

    import struct
    import zlib

    from hgn_spark.multimodal.codecs import _PNG_SIG, _chunk

    rng = np.random.default_rng(9)
    wav = encode_wav_pcm16(
        rng.integers(-500, 500, size=300, dtype=np.int16)
    )
    png = encode_png_gray8(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))
    # A REAL-looking RGB PNG (color type 2): sniffs as image/png but the
    # stdlib decoder can't handle it — capability routing must send it
    # to the format-agnostic slice instead of crashing the decoder.
    rgb_png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    # A REAL 8-bit PCM WAV: sniffs as audio/wav but decode_wav_pcm16
    # only accepts 16-bit — the _wav_decodable capability check must
    # route it to the format-agnostic slice (ADVICE r6: the WAV branch
    # previously had no capability guard and this payload crashed the
    # strict decoder mid-job).
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w8:
        w8.setnchannels(1)
        w8.setsampwidth(1)
        w8.setframerate(8000)
        w8.writeframes(bytes(range(64)))
    wav8 = buf.getvalue()

    rows = [
        (1, wav),
        (2, png),
        (3, b"plain old text payload"),
        (4, rgb_png),
        (5, wav8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    routed = route_by_modality(df)
    audio = routed["audio/wav"].collect()
    image = routed["image/png"].collect()
    other = routed["other"].collect()
    assert {r["doc_id"] for r in audio} == {1}
    assert {r["doc_id"] for r in image} == {2}
    assert {r["doc_id"] for r in other} == {3, 4, 5}
    assert len(audio) == 2  # 300 samples / 256-sample frames
    assert image[0]["height"] == 8 and len(image[0]["pixels"]) == 16
    by_id = {r["doc_id"]: r for r in other}
    assert by_id[3]["n_bytes"] == len(b"plain old text payload")
    assert by_id[4]["n_bytes"] == len(rgb_png)
    assert by_id[5]["n_bytes"] == len(wav8)


def test_route_by_modality_materialized_partition_pruning(spark, tmp_path):
    """materialize=<path> writes ONE route-partitioned table and each
    extractor's read is partition-pruned to its own slice (VERDICT r6
    #6): the scans carry a PartitionFilters entry on `route` and read
    only their partition's rows — a single source pass instead of three
    full re-scans."""
    import numpy as np

    from hgn_spark.multimodal.codecs import encode_png_gray8, encode_wav_pcm16
    from hgn_spark.multimodal.ops import route_by_modality

    rng = np.random.default_rng(13)
    rows = [
        (1, encode_wav_pcm16(rng.integers(-500, 500, size=300, dtype=np.int16))),
        (2, encode_png_gray8(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))),
        (3, b"raw text payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    routed = route_by_modality(df, materialize=str(tmp_path / "routed"))
    assert {r["doc_id"] for r in routed["audio/wav"].collect()} == {1}
    assert {r["doc_id"] for r in routed["image/png"].collect()} == {2}
    assert {r["doc_id"] for r in routed["other"].collect()} == {3}
    for key, part in (
        ("audio/wav", "audio_wav"),
        ("image/png", "image_png"),
        ("other", "other"),
    ):
        plan = spark._jvm.PythonSQLUtils.explainString(
            routed[key]._jdf.queryExecution(), "formatted"
        )
        # The route predicate must be a partition filter on the scan —
        # not a post-scan Filter over all partitions.
        assert "PartitionFilters" in plan, f"{key}: no partition filter\n{plan}"
        filt = next(
            line for line in plan.splitlines() if "PartitionFilters" in line
        )
        assert part in filt, f"{key}: scan not pruned to {part}: {filt}"


def test_decode_image_routes_png_and_rejects_others():
    import numpy as np
    import pytest

    from hgn_spark.multimodal.codecs import encode_png_gray8
    from hgn_spark.multimodal.ops import decode_image

    grid = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(decode_image(encode_png_gray8(grid)), grid)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jpeg-ish")


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
