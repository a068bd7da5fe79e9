"""Pure-Python WAV codec + real-format audio decode stage.

Covers: round-trip mono/stereo, chunk-walk robustness (unknown chunks
skipped with odd-length padding), known-vector conformance against a
stdlib-`wave`-written file, corrupt-input behavior (codec raises; the
stage degrades to sample_rate=-1 instead of killing the job), and the
documents->WAV->decode Dataset path whose amp_sum/peak oracle the
driver checks (query `media_decode_wav`)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.functions.wav import decode_wav, encode_wav
from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
    decode_wav_media,
    wav_from_documents,
)


@pytest.mark.parametrize("shape", [(0,), (1,), (777,), (10, 2)])
def test_roundtrip(shape):
    rng = np.random.default_rng(7)
    s = rng.integers(-(2**15), 2**15, size=shape, dtype=np.int64).astype(np.int16)
    raw = encode_wav(s, sample_rate=44100)
    rate, nch, got = decode_wav(raw)
    assert rate == 44100
    assert nch == (2 if len(shape) == 2 else 1)
    assert np.array_equal(got, s if len(shape) != 2 else s)


def test_stdlib_wave_cross_check():
    """Our decoder reads what the stdlib `wave` module writes, and
    `wave` reads what we write -- both directions."""
    s = (np.sin(np.linspace(0, 20, 500)) * 12000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(s.tobytes())
    rate, nch, got = decode_wav(buf.getvalue())
    assert (rate, nch) == (22050, 1)
    assert np.array_equal(got, s)

    with wave.open(io.BytesIO(encode_wav(s, 22050)), "rb") as r:
        assert r.getframerate() == 22050
        assert r.getnchannels() == 1
        assert r.readframes(len(s)) == s.tobytes()


def test_unknown_chunks_skipped_with_padding():
    """LIST/fact chunks (incl. an odd-length one, padded per spec)
    before and after fmt must be walked over."""
    s = np.array([1, -2, 3], dtype=np.int16)
    raw = encode_wav(s, 8000)
    fmt_start = raw.index(b"fmt ")
    body = raw[fmt_start:]
    odd = b"odd " + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    even = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rebuilt_body = b"WAVE" + even + odd + body
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_body)) + rebuilt_body
    rate, nch, got = decode_wav(rebuilt)
    assert rate == 8000 and nch == 1
    assert np.array_equal(got, s)


def test_corrupt_inputs_raise():
    good = encode_wav(np.array([5, 6], dtype=np.int16), 8000)
    for bad in [
        b"",
        b"RIFX" + good[4:],  # wrong magic
        good[:4] + struct.pack("<I", 10**6) + good[8:],  # riff size overrun
        good.replace(b"fmt ", b"xmt "),  # no fmt chunk
        good.replace(b"data", b"deta"),  # no data chunk
        good[: good.index(b"fmt ") + 8]
        + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
        + good[good.index(b"fmt ") + 8 + 16 :],  # float format tag
    ]:
        with pytest.raises(ValueError):
            decode_wav(bad)
    # truncated data chunk: frame misalignment
    with pytest.raises(ValueError):
        decode_wav(good[:-3])


def test_decode_wav_media_dataset_path(ray_session):
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "hello world"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "x" * 1000},
        ]
    )
    out = (
        decode_wav_media(wav_from_documents(docs), batch_size=8)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    for doc_id, text in [(1, "hello world"), (2, ""), (3, "x" * 1000)]:
        L = len(text)
        n = (L % 977) + 32
        i = np.arange(n, dtype=np.int64)
        samples = ((31 * i + L) % 4096) - 2048
        row = out.loc[doc_id]
        assert row["sample_rate"] == 8000 + (L % 2) * 8000
        assert row["n_channels"] == 1
        assert row["n_samples"] == n
        assert row["amp_sum"] == samples.sum()
        assert row["peak"] == np.abs(samples).max()


def test_decode_stage_corrupt_blob_degrades(ray_session):
    media = rd.from_items(
        [
            {"media_id": 1, "media": b"not a wav at all"},
            {"media_id": 2, "media": encode_wav(np.array([7], dtype=np.int16), 8000)},
        ]
    )
    out = decode_wav_media(media, batch_size=4).to_pandas().set_index("media_id")
    assert out.loc[1, "sample_rate"] == -1
    assert out.loc[2, "amp_sum"] == 7
