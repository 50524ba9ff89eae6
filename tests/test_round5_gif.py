"""Round-5: real video decode — animated GIF with full LZW
decompression in pure Python (StructCodec kind='video'), closing the
round-4 'video is environment-limited' gap."""
import numpy as np
import pyarrow as pa
import pytest

from onestools_eventlog_ray.stages.multimodal import (StructCodec,
                                                      decode_gif, make_gif)


def _pal(n):
    return np.array([[(j * 37) % 256, (j * 59) % 256, (j * 83) % 256]
                     for j in range(n)], dtype=np.uint8)


def _frames(n_frames, h, w, n_colors):
    return [((np.arange(w)[None, :] + np.arange(h)[:, None] + f)
             % n_colors).astype(np.uint8) for f in range(n_frames)]


def test_gif_roundtrip_exact():
    pal = _pal(8)
    frames = _frames(3, 13, 17, 8)
    d = decode_gif(make_gif(frames, pal))
    assert (d["width"], d["height"]) == (17, 13)
    assert len(d["frames"]) == 3
    for got, idx in zip(d["frames"], frames):
        assert np.array_equal(got, pal[idx])


def test_gif_large_palette_and_chunking():
    # 64 colors -> 7-bit codes, frames big enough to force multiple
    # 255-byte sub-blocks and periodic CLEAR codes
    pal = _pal(64)
    frames = _frames(2, 40, 50, 64)
    d = decode_gif(make_gif(frames, pal))
    for got, idx in zip(d["frames"], frames):
        assert np.array_equal(got, pal[idx])


def test_struct_codec_video_features():
    pal = _pal(4)
    frames = _frames(5, 8, 8, 4)
    gif = make_gif(frames, pal)
    d = StructCodec().decode(gif, "video")
    assert (d["width"], d["height"], d["n_frames"]) == (8, 8, 5)
    px = np.concatenate([pal[f].reshape(-1, 3) for f in frames]) \
        .astype(np.float64) / 255.0
    f = d["feature"]
    assert abs(float(f[0]) - px[:, 0].mean()) < 1e-6
    assert abs(float(f[3]) - px.std()) < 1e-6
    assert float(f[6]) == pytest.approx(8 / 4096.0)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" * 4)
    with pytest.raises(ValueError):
        StructCodec().decode(b"GIF89a" + b"\x00" * 3, "video")


def test_media_pipeline_all_three_kinds_real(ray_session):
    """extract_media_features with the REAL codec across image (BMP),
    audio (WAV) and video (GIF) payloads in one actor-pool pass."""
    import ray.data

    from onestools_eventlog_ray.stages.multimodal import (
        StructCodec, extract_media_features, make_bmp, make_wav)
    img = make_bmp(np.full((4, 6, 3), 128, dtype=np.uint8))
    wav = make_wav(np.array([0, 1000, -1000, 500] * 4, dtype=np.int16),
                   rate=8000)
    gif = make_gif(_frames(7, 5, 9, 8), _pal(8))
    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["image", "audio", "video"]),
        "payload": pa.array([img, wav, gif], pa.large_binary()),
        "source_path": pa.array(["a.bmp", "b.wav", "c.gif"]),
    }))
    rows = {r["media_id"]: r for r in extract_media_features(
        ds, batch_size=2, concurrency=(1, 2),
        codec_factory=StructCodec).take_all()}
    assert (rows[1]["width"], rows[1]["height"],
            rows[1]["n_frames"]) == (6, 4, 1)
    assert rows[2]["width"] == -1 and rows[2]["n_frames"] == 16
    assert (rows[3]["width"], rows[3]["height"],
            rows[3]["n_frames"]) == (9, 5, 7)
