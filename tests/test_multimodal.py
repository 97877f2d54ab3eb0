"""Multimodal plumbing: binary payload column, actor-pool decode stages,
and the PIL-gated real decoder (S6/M14/T3 parity)."""

import numpy as np
import pyarrow as pa
import pytest


def _payload_batch():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([b"abcdefgh12345678", b"", None], pa.binary()),
        }
    )


def test_fake_decoder_shape_and_determinism():
    from ember_ray.pipelines.multimodal import FakeImageDecoder

    dec = FakeImageDecoder()
    out1 = dec(_payload_batch())
    out2 = FakeImageDecoder()(_payload_batch())
    assert out1.schema.names == ["doc_id", "width", "height", "feature"]
    assert out1["feature"].type == pa.list_(pa.float32(), 8)
    assert out1.equals(out2)  # deterministic across actor instances


def test_real_decoder_raises_cleanly_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — covered by test_real_decoder_with_pil")
    except ImportError:
        pass
    from ember_ray.pipelines.multimodal import RealImageDecoder

    # failure must be at construction (pool spin-up), not mid-stream
    with pytest.raises(NotImplementedError):
        RealImageDecoder()


def test_real_decoder_with_pil():
    """Lights up wherever PIL exists (vision_matcher.py:69-78 semantics:
    RGB convert + blank-image fallback for missing/corrupt payloads)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from ember_ray.pipelines.multimodal import RealImageDecoder

    buf = io.BytesIO()
    Image.new("RGB", (40, 20), (10, 20, 30)).save(buf, format="PNG")
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([buf.getvalue(), None, b"not-an-image"],
                                pa.binary()),
        }
    )
    out = RealImageDecoder()(batch)
    assert out["width"].to_pylist() == [40, 32, 32]   # blank fallback 32x32
    assert out["height"].to_pylist() == [20, 32, 32]
    feats = np.array(out["feature"].to_pylist())
    assert feats.shape == (3, 8)
    assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-5)
