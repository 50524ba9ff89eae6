"""Multimodal stage plumbing: schema, actor pool, deterministic stub
decode, payload dropped at output."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from onestools_eventlog_ray.stages.multimodal import (FEATURE_SCHEMA,
                                                      MEDIA_SCHEMA,
                                                      FakeCodec,
                                                      MediaFeatureExtractor,
                                                      extract_media_features,
                                                      synthesize_media_table)


def test_media_table_schema_and_determinism():
    t1 = synthesize_media_table(30, seed=42)
    t2 = synthesize_media_table(30, seed=42)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    assert synthesize_media_table(5, seed=1)["payload"][0].as_py() != \
        t1["payload"][0].as_py()


def test_extractor_direct_smoke():
    # actor __init__ failures surface late in Ray — smoke the class directly
    ex = MediaFeatureExtractor()
    out = ex(synthesize_media_table(9))
    assert out.schema.equals(FEATURE_SCHEMA)
    assert "payload" not in out.column_names
    kinds = out["kind"].to_pylist()
    widths = out["width"].to_pylist()
    frames = out["n_frames"].to_pylist()
    for k, w, f in zip(kinds, widths, frames):
        if k == "audio":
            assert w == -1 and f >= 1
        elif k == "image":
            assert w >= 16 and f == 1
        else:
            assert w >= 16 and f >= 1


def test_pipeline_end_to_end():
    tbl = synthesize_media_table(50)
    ds = ray.data.from_arrow(tbl)
    out = extract_media_features(ds, batch_size=8, concurrency=(1, 2))
    rows = out.take_all()
    assert len(rows) == 50
    # deterministic: same payload -> same feature
    direct = MediaFeatureExtractor()(tbl)
    by_id = {r["media_id"]: r for r in rows}
    for i in range(50):
        want = direct.slice(i, 1).to_pylist()[0]
        got = by_id[i]
        assert got["width"] == want["width"]
        assert np.allclose(got["feature"], want["feature"])


def test_feature_vector_fixed_size():
    out = MediaFeatureExtractor()(synthesize_media_table(3))
    for f in out["feature"].to_pylist():
        assert len(f) == 8
        assert all(0.0 <= v <= 1.0 for v in f)
