"""Round-5: index aliases — atomic flip, rollback, validation gate."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_corpus(path, texts, start_id=1):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)),
                           pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), path)


@pytest.fixture()
def two_indexes(ray_session, tmp_path):
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    c1 = str(tmp_path / "c1.parquet")
    c2 = str(tmp_path / "c2.parquet")
    _write_corpus(c1, ["spark one", "spark two", "other"])
    _write_corpus(c2, ["spark one", "spark two", "spark three", "other"],
                  start_id=10)
    i1, i2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(c1, i1, spec=DOCUMENTS_SPEC, cfg=EngineConfig())
    build_index(c2, i2, spec=DOCUMENTS_SPEC, cfg=EngineConfig())
    return i1, i2, str(tmp_path / "reg")


def test_alias_flip_and_rollback(two_indexes):
    from onestools_eventlog_ray.state.aliases import (engine_for_alias,
                                                      flip_alias,
                                                      list_aliases,
                                                      put_alias,
                                                      resolve_alias,
                                                      rollback_alias)
    i1, i2, reg = two_indexes
    put_alias(reg, "prod", i1)
    assert resolve_alias(reg, "prod") == os.path.abspath(i1)
    h1 = engine_for_alias(reg, "prod").search(["spark"], k=10, tie="e6")
    assert len(h1) == 2

    rec = flip_alias(reg, "prod", i2)           # zero-downtime swap
    assert rec["previous"] == os.path.abspath(i1)
    h2 = engine_for_alias(reg, "prod").search(["spark"], k=10, tie="e6")
    assert len(h2) == 3

    assert rollback_alias(reg, "prod") == os.path.abspath(i1)
    h3 = engine_for_alias(reg, "prod").search(["spark"], k=10, tie="e6")
    assert h3 == h1

    t = list_aliases(reg).to_pandas()
    assert list(t.alias) == ["prod"]
    assert t.index_dir[0] == os.path.abspath(i1)


def test_alias_refuses_incomplete_target(two_indexes, tmp_path):
    from onestools_eventlog_ray.state.aliases import put_alias
    _i1, _i2, reg = two_indexes
    bogus = str(tmp_path / "not_an_index")
    os.makedirs(bogus)
    with pytest.raises(Exception):
        put_alias(reg, "prod", bogus)
    # the failed put must not have created the alias
    from onestools_eventlog_ray.state.aliases import resolve_alias
    with pytest.raises(KeyError):
        resolve_alias(reg, "prod")


def test_alias_missing_and_delete(two_indexes):
    from onestools_eventlog_ray.state.aliases import (delete_alias,
                                                      put_alias,
                                                      resolve_alias,
                                                      rollback_alias)
    i1, _i2, reg = two_indexes
    with pytest.raises(KeyError):
        resolve_alias(reg, "nope")
    put_alias(reg, "prod", i1)
    with pytest.raises(ValueError):
        rollback_alias(reg, "prod")             # no previous yet
    assert delete_alias(reg, "prod") is True
    assert delete_alias(reg, "prod") is False
