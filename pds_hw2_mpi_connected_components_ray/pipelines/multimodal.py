"""Multimodal column plumbing: opaque binary media + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container; `decode_image_real` raises NotImplementedError unless PIL is
importable) but the Ray-side plumbing is real and tested: schema, actor
pool signature, batch sizing for large binary payloads, output layout.

Fake media format (deterministic, for tests):
    b"FAKEIMG" | uint16 width | uint16 height | payload bytes
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MAGIC = b"FAKEIMG"


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack("<HH", width, height) + payload


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table (media_id, media, kind)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.randint(8, 128)), int(rng.randint(8, 128))
        payload = rng.bytes(w * h % 512 + 16)
        rows.append(encode_fake_image(w, h, payload))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media": pa.array(rows, pa.binary()),
            "kind": pa.array(["image"] * n, pa.string()),
        }
    )


class MediaDecodeStage:
    """Actor-pool decode stage. Real decoders would load models/codecs in
    __init__ (once per actor); __call__ handles one Arrow batch.

    Batch sizing note: media payloads are wide -- callers should pass a
    small batch_size (e.g. 64) so batch x concurrency stays in heap.
    """

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder
        if decoder == "real":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decode requires PIL; container ships none -- "
                    "use decoder='fake' (deterministic header parse)"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        widths, heights, nbytes, checksums = [], [], [], []
        for blob in batch["media"]:
            raw = blob.as_py()
            if raw[: len(MAGIC)] != MAGIC:
                widths.append(-1)
                heights.append(-1)
                nbytes.append(len(raw))
                checksums.append(0)
                continue
            w, h = struct.unpack_from("<HH", raw, len(MAGIC))
            widths.append(w)
            heights.append(h)
            nbytes.append(len(raw))
            checksums.append(zlib.crc32(raw) & 0x7FFFFFFF)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "checksum": pa.array(checksums, pa.int64()),
            }
        )


def decode_media(
    media: Dataset, *, decoder: str = "fake", concurrency=None, batch_size: int = 64
) -> Dataset:
    """media table -> per-item feature table via an actor-pool stage."""
    if concurrency is None:
        from ..context import default_parallelism

        concurrency = (1, max(2, default_parallelism()))
    return media.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_from_documents(docs: Dataset) -> Dataset:
    """Adapter: synthesize a media binary column from document text bytes
    (deterministic), exercising the decode plumbing on driver tables."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        blobs = [
            encode_fake_image(
                (len(t) % 96) + 8, ((len(t) // 7) % 96) + 8, t.encode("utf-8")[:256]
            )
            for t in batch["text"].fillna("")
        ]
        return pd.DataFrame({"media_id": ids, "media": blobs, "kind": "image"})

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")
