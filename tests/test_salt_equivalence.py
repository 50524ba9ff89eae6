"""Salted build == unsalted build (SURVEY.md §7.4 'Skew').

Forces the hot-term salting path on a small corpus (by injecting a hot
map, as the sampler would for df > threshold at scale) and asserts the
resulting shards decode to EXACTLY the postings of the unsalted build —
the provable-equivalence requirement of the north_rule's skew handling.
"""

import glob

import pyarrow.parquet as pq
import pytest

from onestools_eventlog_ray import synth
from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.pipelines.build import build_index
from onestools_eventlog_ray.pipelines.query import SearchEngine

CFG = EngineConfig(num_partitions=8, tokenize_batch_size=64)


def _load_all_postings(index_dir):
    out = {}
    for f in sorted(glob.glob(index_dir + "/shards/*.parquet")):
        t = pq.read_table(f)
        for term, df, cf, blob in zip(t["term"].to_pylist(), t["df"].to_pylist(),
                                      t["cf"].to_pylist(), t["posting"].to_pylist()):
            p = codec.decode_posting(blob)
            out[term] = (df, cf, p.doc_ids.tolist(), p.tfs.tolist(), p.dls.tolist())
    return out


@pytest.fixture(scope="module")
def two_builds(tmp_path_factory, small_corpus_dir):
    plain_dir = str(tmp_path_factory.mktemp("idx_plain"))
    salted_dir = str(tmp_path_factory.mktemp("idx_salted"))
    build_index(small_corpus_dir, plain_dir, cfg=CFG, hot_terms={})
    # every lang keyword + license boilerplate term becomes hot with 4 salts
    hot = {t: 4 for t in ["def", "import", "return", "the", "license",
                          "copyright", "is", "as", "software"]}
    build_index(small_corpus_dir, salted_dir, cfg=CFG, hot_terms=hot)
    return plain_dir, salted_dir


def test_salted_postings_identical(two_builds):
    plain, salted = two_builds
    pp, sp = _load_all_postings(plain), _load_all_postings(salted)
    assert pp.keys() == sp.keys()
    for term in pp:
        assert pp[term] == sp[term], term


def test_pick_salt_ranges_floor_scale_cap():
    from onestools_eventlog_ray.stages.exchange import pick_salt_ranges
    cfg = EngineConfig()   # salt_ranges=4 floor, salt_target_run=100k, max 64
    assert pick_salt_ranges(cfg, None) == cfg.salt_ranges
    assert pick_salt_ranges(cfg, 10_000) == cfg.salt_ranges       # floor
    assert pick_salt_ranges(cfg, 500_000) == 8                    # ceil(5)->8
    assert pick_salt_ranges(cfg, 3_000_000) == 32
    assert pick_salt_ranges(cfg, 100_000_000) == 64               # cap
    assert pick_salt_ranges(EngineConfig(salt_ranges=1), 10**9) == 1  # disabled


def test_auto_salt_ranges_single_pass_equivalent(tmp_path, small_corpus_dir):
    """Single-pass build with a widened auto fan-out (tiny salt_target_run
    forces S up to max_salts on the 400-doc corpus) must produce
    byte-identical postings to the default-S build."""
    base_dir, auto_dir = str(tmp_path / "base"), str(tmp_path / "auto")
    build_index(small_corpus_dir, base_dir, cfg=CFG)
    cfg2 = EngineConfig(num_partitions=8, salt_target_run=20, max_salts=16)
    r = build_index(small_corpus_dir, auto_dir, cfg=cfg2)
    assert r["single_pass"] and r["salt_ranges"] == 16
    assert _load_all_postings(base_dir) == _load_all_postings(auto_dir)


def test_salted_query_results_identical(two_builds, small_corpus):
    plain, salted = two_builds
    ep, es = SearchEngine(plain), SearchEngine(salted)
    for q in synth.reference_queries(small_corpus, n_queries=30):
        assert ep.search(q["terms"], q["k"]) == es.search(q["terms"], q["k"])
