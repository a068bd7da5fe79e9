"""Multimodal column plumbing: opaque binary media + typed metadata.

Two decode paths:
- decoder="fake": deterministic header-parse stub format (below) --
  kept as the SQL-mirrorable oracle surface.
- decoder="png": REAL format decode via the pure-Python PNG codec
  (`functions/png.py`, stdlib zlib; full filter support). PIL is used
  instead when importable (not in this container) and cross-checked
  against the pure decoder in tests.

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
    """media table -> per-item feature table. concurrency=None runs
    plain tasks with a per-worker stage memo (setup here is an import
    probe, microseconds); an explicit int/tuple keeps a dedicated
    actor pool -- the right call for real heavy codecs (policy +
    measurement: stages/stagepool.py)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        media,
        MediaDecodeStage,
        {"decoder": decoder},
        concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


class PngDecodeStage:
    """Actor-pool REAL-format decode: full PNG parse (chunk CRCs, zlib
    inflate, all five scanline filters) via `functions/png.py`. Uses
    PIL when importable (loaded ONCE per actor in __init__), falling
    back to the pure-Python codec; both yield identical pixels
    (cross-checked in tests/test_png.py when PIL exists).

    Output per item: (media_id, width, height, n_bytes, pixel_sum,
    checksum) where pixel_sum is the int64 sum of decoded samples and
    checksum is crc32 of the decoded pixel bytes. Undecodable blobs
    yield width=-1 (never an exception: one corrupt blob must not kill
    a 100-TB job)."""

    def __init__(self):
        from ..functions.png import decode_png as pure_decode

        self._pure = pure_decode
        self._pil = None
        try:  # pragma: no cover - PIL absent in this container
            import io

            import PIL.Image

            def pil_decode(raw: bytes):
                img = PIL.Image.open(io.BytesIO(raw))
                arr = np.asarray(img)
                return img.width, img.height, arr

            self._pil = pil_decode
            self._io = io
        except ImportError:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        decode = self._pil or self._pure
        widths, heights, nbytes, sums, checks = [], [], [], [], []
        for blob in batch["media"]:
            raw = blob.as_py()
            try:
                w, h, arr = decode(raw)
                widths.append(w)
                heights.append(h)
                nbytes.append(len(raw))
                sums.append(int(arr.astype(np.int64).sum()))
                checks.append(zlib.crc32(np.ascontiguousarray(arr).tobytes()) & 0x7FFFFFFF)
            except (ValueError, zlib.error, struct.error):
                widths.append(-1)
                heights.append(-1)
                nbytes.append(len(raw))
                sums.append(-1)
                checks.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "checksum": pa.array(checks, pa.int64()),
            }
        )


def decode_png_media(
    media: Dataset, *, concurrency=None, batch_size: int = 64
) -> Dataset:
    """Real-format (PNG) decode over a media table (tasks by default,
    dedicated actor pool when concurrency is explicit -- stagepool.py)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        media,
        PngDecodeStage,
        {},
        concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def png_from_documents(docs: Dataset) -> Dataset:
    """Adapter: deterministic REAL grayscale PNG per document. With
    L = len(text): width = (L % 48) + 8, height = ((L // 7) % 48) + 8,
    pixel(y, x) = (7x + 13y + L) % 256, scanline filter = y % 5 (so a
    corpus decode exercises every PNG filter path). All three output
    stats are closed-form in L -> SQL-mirrorable oracle."""
    from ..functions.png import encode_png

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        blobs = []
        for t in batch["text"].fillna(""):
            L = len(t)
            w, h = (L % 48) + 8, ((L // 7) % 48) + 8
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)
            img = ((7 * x[None, :] + 13 * y[:, None] + L) % 256).astype(np.uint8)
            blobs.append(encode_png(img, filter_mode="cycle"))
        return pd.DataFrame({"media_id": ids, "media": blobs, "kind": "png"})

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


class MediaResizeStage:
    """Actor-pool resize: parse the fake header, divide the dimensions
    by `factor` (floor, min 1), truncate the payload to the new pixel
    budget. A real implementation swaps the body for a PIL/liblycodec
    call loaded once per actor in __init__; the Ray-side plumbing
    (schema, actor signature, batch sizing) is identical and tested."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_blob, out_w, out_h = [], [], []
        f = self.factor
        for blob in batch["media"]:
            raw = blob.as_py()
            if raw[: len(MAGIC)] != MAGIC:
                out_blob.append(raw)
                out_w.append(-1)
                out_h.append(-1)
                continue
            w, h = struct.unpack_from("<HH", raw, len(MAGIC))
            w2, h2 = max(1, w // f), max(1, h // f)
            payload = raw[len(MAGIC) + 4 :][: w2 * h2]
            out_blob.append(encode_fake_image(w2, h2, payload))
            out_w.append(w2)
            out_h.append(h2)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media": pa.array(out_blob, pa.binary()),
                "width": pa.array(out_w, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
            }
        )


def resize_media(
    media: Dataset, *, factor: int = 2, concurrency=None, batch_size: int = 64
) -> Dataset:
    """Resize stage over a media table (small batches; tasks by
    default, actor pool when concurrency is explicit)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        media,
        MediaResizeStage,
        {"factor": factor},
        concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


VIDEO_MAGIC = b"FAKEVID"


def encode_fake_video(width: int, height: int, n_frames: int, payload: bytes) -> bytes:
    return VIDEO_MAGIC + struct.pack("<HHI", width, height, n_frames) + payload


class FrameSampleStage:
    """Actor-pool frame sampler: parse the fake video header, emit the
    metadata of every `every_k`-th frame (real codecs would decode the
    sampled frames; the stub keeps the arithmetic and layout exact)."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_frame, out_w, out_h = [], [], [], []
        for mid, blob in zip(ids, batch["media"]):
            raw = blob.as_py()
            if raw[: len(VIDEO_MAGIC)] != VIDEO_MAGIC:
                continue
            w, h, nf = struct.unpack_from("<HHI", raw, len(VIDEO_MAGIC))
            for fr in range(0, nf, self.k):
                out_id.append(int(mid))
                out_frame.append(fr)
                out_w.append(w)
                out_h.append(h)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int64()),
                "width": pa.array(out_w, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
            }
        )


def sample_frames(
    videos: Dataset, *, every_k: int = 4, concurrency=None, batch_size: int = 64
) -> Dataset:
    """(media_id, frame, width, height) for every k-th frame (tasks by
    default, actor pool when concurrency is explicit)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        videos,
        FrameSampleStage,
        {"every_k": every_k},
        concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def videos_from_documents(docs: Dataset) -> Dataset:
    """Adapter: deterministic fake video per document (frame count and
    dims derived from the text length -- SQL-mirrorable)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        blobs = []
        for t in batch["text"].fillna(""):
            n = len(t)
            blobs.append(
                encode_fake_video(
                    (n % 64) + 16, ((n // 3) % 64) + 16, (n % 31) + 2, t.encode("utf-8")[:64]
                )
            )
        return pd.DataFrame({"media_id": ids, "media": blobs, "kind": "video"})

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


class WavDecodeStage:
    """Actor-pool REAL-format audio decode: RIFF/PCM WAV parse via
    `functions/wav.py` (chunk walk, fmt validation, 16-bit PCM).

    Output per item: (media_id, sample_rate, n_channels, n_samples,
    amp_sum, peak) where amp_sum is the int64 sum of all samples and
    peak is max(|sample|). Undecodable blobs yield sample_rate=-1
    (never an exception: one corrupt blob must not kill a 100-TB
    job)."""

    def __init__(self):
        from ..functions.wav import decode_wav

        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        rates, chans, counts, sums, peaks = [], [], [], [], []
        for blob in batch["media"]:
            raw = blob.as_py()
            try:
                rate, nch, samples = self._decode(raw)
                flat = samples.reshape(-1).astype(np.int64)
                rates.append(rate)
                chans.append(nch)
                counts.append(len(samples))
                sums.append(int(flat.sum()))
                peaks.append(int(np.abs(flat).max()) if len(flat) else 0)
            except (ValueError, struct.error):
                rates.append(-1)
                chans.append(-1)
                counts.append(-1)
                sums.append(-1)
                peaks.append(-1)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_channels": pa.array(chans, pa.int64()),
                "n_samples": pa.array(counts, pa.int64()),
                "amp_sum": pa.array(sums, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
            }
        )


def decode_wav_media(
    media: Dataset, *, concurrency=None, batch_size: int = 64
) -> Dataset:
    """Real-format (WAV) audio decode over a media table (tasks by
    default, actor pool when concurrency is explicit)."""
    from ..stages.stagepool import stage_map_batches

    return stage_map_batches(
        media,
        WavDecodeStage,
        {},
        concurrency,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def wav_from_documents(docs: Dataset) -> Dataset:
    """Adapter: deterministic REAL mono PCM WAV per document. With
    L = len(text): n = (L % 977) + 32 samples at rate 8000 + (L % 2) *
    8000, sample[i] = ((31*i + L) % 4096) - 2048. All decode outputs
    are closed-form in L -> SQL-mirrorable oracle."""
    from ..functions.wav import encode_wav

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        blobs = []
        for t in batch["text"].fillna(""):
            L = len(t)
            n = (L % 977) + 32
            i = np.arange(n, dtype=np.int64)
            samples = (((31 * i + L) % 4096) - 2048).astype(np.int16)
            blobs.append(encode_wav(samples, sample_rate=8000 + (L % 2) * 8000))
        return pd.DataFrame({"media_id": ids, "media": blobs, "kind": "wav"})

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


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
