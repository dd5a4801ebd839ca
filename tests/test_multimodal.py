import numpy as np
import pyarrow as pa
import pytest

from gliner_cpp_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FakeDecoder,
    FrameSampleStage,
    MediaFeatureStage,
    RealDecoder,
    make_fake_payload,
)


def _media_table(n=20, seed=11):
    rng = np.random.default_rng(seed)
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        video = i % 4 == 0
        w, h = int(rng.integers(4, 16)), int(rng.integers(4, 16))
        frames = int(rng.integers(3, 8)) if video else 1
        rows["media_id"].append(i)
        rows["kind"].append("video" if video else "image")
        rows["payload"].append(make_fake_payload(rng, w, h, frames))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(frames)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def test_fake_decoder_roundtrip():
    rng = np.random.default_rng(0)
    p = make_fake_payload(rng, 8, 6, 3)
    frames = FakeDecoder().decode(p)
    assert frames.shape == (3, 6, 8)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        RealDecoder().decode(b"anything")


def test_feature_stage_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_media_table())
    out = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    ).to_pandas()
    assert len(out) == 20
    for f in out["feature"]:
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-5  # normalized histogram


def test_frame_sampling_ray(ray_session):
    import ray.data as rd

    tbl = _media_table()
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
    ).to_pandas()
    want = sum(len(range(0, n, 2)) for n in tbl.column("n_frames").to_pylist())
    assert len(out) == want
    assert set(out["frame_idx"]) >= {0, 2}
