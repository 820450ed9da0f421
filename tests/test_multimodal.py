"""Multimodal stages: schema, actor signature, determinism, explode
layout — the Ray plumbing is real even though decode is stubbed
(engine='real' raises NotImplementedError by design)."""

import pyarrow as pa
import pytest

from pdf_to_text_ray.stages import multimodal as mm


def _batch(ids, maker):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media": pa.array([maker(i) for i in ids], pa.binary()),
        }
    )


def test_image_decode_schema_and_values():
    out = mm.ImageDecoder()(_batch([0, 7, 123], mm.make_image))
    assert out.column_names == ["doc_id", "width", "height", "channels", "decode_ok"]
    r = out.to_pylist()
    assert r[0] == {"doc_id": 0, "width": 64, "height": 64, "channels": 1,
                    "decode_ok": True}
    assert r[1]["channels"] == 1  # 7 % 7 == 0
    assert r[2]["width"] == 64 + (123 * 31) % 960


def test_image_decode_garbage_not_poison():
    t = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "media": pa.array([b"not an image"], pa.binary())}
    )
    r = mm.ImageDecoder()(t).to_pylist()[0]
    assert not r["decode_ok"] and r["width"] == 0


def test_image_resize_fits_box_preserving_aspect():
    out = mm.ImageResizer(max_w=256, max_h=256)(_batch([123], mm.make_image))
    r = out.to_pylist()[0]
    assert 1 <= r["resized_w"] <= 256 and 1 <= r["resized_h"] <= 256
    # resized payload re-decodes to the new dims (pipeline chaining)
    meta = mm.StubMediaEngine().decode_image(r["media"])
    assert (meta["width"], meta["height"]) == (r["resized_w"], r["resized_h"])


def test_resize_never_upscales():
    # doc 0 -> 64x64, already inside the box
    r = mm.ImageResizer(max_w=256, max_h=256)(_batch([0], mm.make_image)).to_pylist()[0]
    assert (r["resized_w"], r["resized_h"]) == (64, 64)


def test_feature_extractor_deterministic_fixed_dim():
    b = _batch([5, 6], mm.make_image)
    a = mm.MediaFeatureExtractor()(b).to_pylist()
    c = mm.MediaFeatureExtractor()(b).to_pylist()
    assert a == c
    assert len(a[0]["embedding"]) == mm.EMBED_DIM
    assert all(-1.0 <= v < 1.0 for v in a[0]["embedding"])
    # works across modalities through the same stage
    audio = mm.MediaFeatureExtractor()(_batch([5], mm.make_audio)).to_pylist()
    assert len(audio[0]["embedding"]) == mm.EMBED_DIM
    assert audio[0]["embedding"] != a[0]["embedding"]


def test_frame_sampler_explodes_rows():
    out = mm.FrameSampler(stride=10)(_batch([4], mm.make_video)).to_pylist()
    meta = mm.StubMediaEngine().decode_video(mm.make_video(4))
    assert len(out) == (meta["n_frames"] + 9) // 10
    assert [r["frame_no"] for r in out] == list(range(0, meta["n_frames"], 10))
    assert out[1]["ts_sec"] == pytest.approx(10 / meta["fps"])


def test_real_engine_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm.ImageDecoder(engine="real")(_batch([1], mm.make_image))


def test_audio_decode_metadata():
    meta = mm.StubMediaEngine().decode_audio(mm.make_audio(10))
    assert meta["sample_rate"] in (8000, 16000, 44100)
    assert meta["n_samples"] == 1000 + (10 * 997) % 160_000
