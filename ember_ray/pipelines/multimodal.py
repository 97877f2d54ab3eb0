"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool ``map_batches`` stages.

Reference analog: the image path → PIL load → ViT feature-extractor
pipeline (S6/M14/T3, ``src/models/vision_matcher.py:64-89``). The real
decoders (PIL / torchaudio / ffmpeg) are NOT in this container, so the
decode kernel is stubbed: ``RealImageDecoder`` raises NotImplementedError
behind an import-try; ``FakeImageDecoder`` is a deterministic stand-in
that exercises the REAL Ray-side plumbing — binary column schema, small
batch sizes for large payloads, actor __init__ state, fixed-width feature
output layout.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def payloads(sf_dir: str):
    """documents → (doc_id, payload: binary, n_bytes) — the opaque-binary
    multimodal column shape (payload = utf-8 bytes of text here; in
    production: image/audio bytes read by ``read_binary_files``)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        blob = pc.cast(t["text"], pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": blob,
                "n_bytes": pc.cast(pc.binary_length(blob), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def payload_sizes(sf_dir: str):
    """Oracle-checked projection of the payload metadata."""
    return payloads(sf_dir).select_columns(["doc_id", "n_bytes"])


class RealImageDecoder:
    """Actor-pool decode stage for real image bytes
    (``src/models/vision_matcher.py:69-78`` semantics: PIL open →
    RGB convert, BLANK white image fallback for missing/corrupt payloads
    → resize → normalized float features).

    Lights up wherever PIL is installed (not in this container — tests
    ``importorskip`` it); otherwise raises NotImplementedError at
    construction so the failure is at pool spin-up, not mid-stream.
    Output schema matches ``FakeImageDecoder`` (doc_id, width, height,
    feature: fixed-size list<float32>), so the two decoders are
    drop-in interchangeable in ``mm_features``."""

    def __init__(self, size: tuple[int, int] = (32, 32), n_bins: int = 8):
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - PIL absent here
            raise NotImplementedError(
                "image decode requires PIL; not available in this environment "
                "(use FakeImageDecoder for plumbing tests)"
            ) from e
        self._Image = Image
        self.size = size
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)
        # blank-image fallback, built once per actor (vision_matcher.py:69)
        self._blank = Image.new("RGB", size, (255, 255, 255))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        Image = self._Image
        blobs = batch["payload"].to_pylist()
        widths = np.empty(len(blobs), np.int32)
        heights = np.empty(len(blobs), np.int32)
        feats = np.zeros((len(blobs), self.n_bins), np.float32)
        for i, b in enumerate(blobs):
            try:
                img = Image.open(io.BytesIO(b)).convert("RGB") if b else self._blank
            except Exception:  # corrupt payload → blank fallback
                img = self._blank
            widths[i] = img.width
            heights[i] = img.height
            arr = np.asarray(img.resize(self.size), np.uint8).ravel()
            hist, _ = np.histogram(arr, bins=self.edges)
            feats[i] = hist / max(1, arr.size)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array(list(feats), pa.list_(pa.float32(), self.n_bins)),
            }
        )


class FakeImageDecoder:
    """Deterministic decode stand-in: payload bytes → pseudo image dims +
    an 8-bin byte-histogram feature vector (fixed-size list<float>).
    Mirrors the actor-pool signature of the real decoder (T3 pattern)."""

    def __init__(self, n_bins: int = 8):
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        widths = np.empty(len(blobs), np.int32)
        heights = np.empty(len(blobs), np.int32)
        feats = np.zeros((len(blobs), self.n_bins), np.float32)
        for i, b in enumerate(blobs):
            arr = np.frombuffer(b or b"\x00", np.uint8)
            widths[i] = 16 + int(arr[: 8].sum()) % 240
            heights[i] = 16 + int(arr[8:16].sum() if len(arr) > 8 else 0) % 240
            hist, _ = np.histogram(arr, bins=self.edges)
            feats[i] = hist / max(1, arr.size)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array(list(feats), pa.list_(pa.float32(), self.n_bins)),
            }
        )


def mm_features(sf_dir: str, concurrency: int = 2, batch_size: int = 512,
                decoder=None):
    """Binary payloads → actor-pool feature extraction. Small batch size on
    purpose: with real image/audio payloads a batch × concurrency must fit
    the worker heap (ray_guide memory notes). ``decoder`` defaults to the
    deterministic stand-in; pass ``RealImageDecoder`` where PIL exists."""
    return payloads(sf_dir).map_batches(
        decoder or FakeImageDecoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
