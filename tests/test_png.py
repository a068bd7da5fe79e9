"""Pure-Python PNG codec + real-format decode stage.

Covers: round-trip over all color types and both filter modes (cycle
exercises all five unfilter paths), known-vector conformance against a
hand-assembled spec PNG, corrupt-input behavior (codec raises; the
stage degrades to width=-1 instead of killing the job), and the
documents->PNG->decode Dataset path whose pixel_sum oracle the driver
checks (query `media_decode_png`). When PIL is importable the pure
decoder is cross-checked against it."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

import ray.data as rd

from pds_hw2_mpi_connected_components_ray.functions.png import (
    SIGNATURE,
    decode_png,
    encode_png,
)
from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
    decode_png_media,
    png_from_documents,
)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (40, 33), (9, 9, 3), (6, 11, 4)])
@pytest.mark.parametrize("filter_mode", ["none", "cycle"])
def test_roundtrip(shape, filter_mode):
    rng = np.random.RandomState(hash((shape, filter_mode)) % 2**31)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, out = decode_png(encode_png(img, filter_mode=filter_mode))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out.reshape(img.shape), img)


def test_all_filters_used_in_cycle_mode():
    # a >=5-row image in cycle mode stores filter byte y % 5 per scanline
    img = np.arange(7 * 6, dtype=np.uint8).reshape(7, 6)
    raw = encode_png(img, filter_mode="cycle")
    # IDAT payload: find the chunk, inflate, check filter bytes
    pos = len(SIGNATURE)
    idat = b""
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += raw[pos + 8 : pos + 8 + length]
        pos += 12 + length
    plain = zlib.decompress(idat)
    stride = 6 + 1
    filters = [plain[y * stride] for y in range(7)]
    assert filters == [0, 1, 2, 3, 4, 0, 1]


def test_known_vector_hand_assembled():
    # 2x2 grayscale, pixels [[1,2],[3,4]], filter 0 rows -- assembled
    # from the spec by hand, no codec involved
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x01\x02" + b"\x00\x03\x04")

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    w, h, img = decode_png(raw)
    assert (w, h) == (2, 2)
    assert img.tolist() == [[1, 2], [3, 4]]


def test_corrupt_inputs_raise():
    img = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # flip a byte inside IHDR payload -> CRC mismatch
    bad = bytearray(good)
    bad[len(SIGNATURE) + 8] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # unsupported bit depth (16) with a recomputed-valid CRC
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    raw = (
        SIGNATURE
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(raw)


def test_pil_cross_check_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(23, 17, 3)).astype(np.uint8)
    w, h, out = decode_png(encode_png(img, filter_mode="cycle"))
    pil = np.asarray(PIL.open(io.BytesIO(encode_png(img, filter_mode="cycle"))))
    assert np.array_equal(out, pil)
    assert np.array_equal(out, img)


def test_decode_png_media_dataset_path():
    import pandas as pd

    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["hello world", "", "x" * 300]}
        )
    )
    out = (
        decode_png_media(png_from_documents(docs), batch_size=2)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i, text in enumerate(["hello world", "", "x" * 300]):
        L = len(text)
        w, h = (L % 48) + 8, ((L // 7) % 48) + 8
        assert out.loc[i, "width"] == w
        assert out.loc[i, "height"] == h
        x = np.arange(w)
        y = np.arange(h)
        expect = ((7 * x[None, :] + 13 * y[:, None] + L) % 256).astype(np.int64)
        assert out.loc[i, "pixel_sum"] == expect.sum()
        assert out.loc[i, "checksum"] == (
            zlib.crc32(expect.astype(np.uint8).tobytes()) & 0x7FFFFFFF
        )
        assert out.loc[i, "n_bytes"] > 0


def test_decode_stage_corrupt_blob_degrades():
    import pyarrow as pa

    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        PngDecodeStage,
    )

    good = encode_png(np.full((3, 3), 9, dtype=np.uint8))
    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "media": pa.array([good, b"\x89PNG garbage"], pa.binary()),
        }
    )
    out = PngDecodeStage()(batch).to_pandas()
    assert out.loc[0, "width"] == 3 and out.loc[0, "pixel_sum"] == 81
    assert out.loc[1, "width"] == -1 and out.loc[1, "pixel_sum"] == -1
