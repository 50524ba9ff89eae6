"""Round-5 session-4: multi_terms / runtime-field / scripted_metric aggs
checked against brute-force Python references on planted corpora."""
import numpy as np
import pyarrow as pa
import ray.data


def _docs_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }))


def test_multi_terms_agg_counts_and_order(ray_session):
    from onestools_eventlog_ray.pipelines.text import multi_terms_agg
    rows = [(1, "aaaa", "en", "web"), (2, "bb", "en", "web"),
            (3, "cc", "de", "web"), (4, "dd", "en", "book"),
            (5, "ee", "de", "web"), (6, "ffffff", "en", "web")]
    out = multi_terms_agg(_docs_ds(rows), size=2)
    # (en, web): 3 docs; (de, web): 2 docs — size=2 drops (en, book)
    assert out["lang"].to_pylist() == ["en", "de"]
    assert out["source"].to_pylist() == ["web", "web"]
    assert out["doc_count"].to_pylist() == [3, 2]
    assert out["sum_nchars"].to_pylist() == [4 + 2 + 6, 2 + 2]
    assert out["rank"].to_pylist() == [1, 2]


def test_multi_terms_tie_breaks_on_key(ray_session):
    from onestools_eventlog_ray.pipelines.text import multi_terms_agg
    rows = [(1, "x", "de", "b"), (2, "y", "en", "a"), (3, "z", "en", "a")]
    # (de,b) and ... counts: (en,a)=2, (de,b)=1 — add another singleton
    rows.append((4, "w", "aa", "zz"))
    out = multi_terms_agg(_docs_ds(rows), size=10)
    # ties at count=1 order lexicographically by (lang, source)
    assert out["lang"].to_pylist() == ["en", "aa", "de"]


def test_runtime_field_terms_buckets(ray_session):
    from onestools_eventlog_ray.pipelines.text import runtime_field_terms
    rows = [(i, "x" * n, "en", "w")
            for i, n in enumerate([5, 199, 200, 201, 405])]
    out = runtime_field_terms(_docs_ds(rows), bucket_width=200)
    assert out["size_bucket"].to_pylist() == [0, 200, 400]
    assert out["doc_count"].to_pylist() == [2, 2, 1]
    assert out["avg_nchars_e6"].to_pylist() == [
        (5 + 199) * 1_000_000 // 2, (200 + 201) * 1_000_000 // 2,
        405 * 1_000_000]


def test_scripted_metric_variance_exact(ray_session):
    from onestools_eventlog_ray.pipelines.relational import (
        scripted_metric_variance)
    rng = np.random.RandomState(7)
    vals = np.round(rng.uniform(0.01, 490.0, size=500), 2)
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, size=500)]
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types.tolist()),
        "value": pa.array(vals.tolist(), pa.float64()),
    }))
    out = scripted_metric_variance(ds)
    for i, t in enumerate(out["event_type"].to_pylist()):
        v6 = [int(np.floor(v * 1_000_000 + 0.5))
              for v in vals[types == t]]
        n, s, sq = len(v6), sum(v6), sum(x * x for x in v6)
        assert out["n_events"][i].as_py() == n
        assert out["mean_e6"][i].as_py() == s // n
        assert out["var_e6"][i].as_py() == (n * sq - s * s) // (
            n * n * 1_000_000)
    assert out["event_type"].to_pylist() == ["a", "b", "c"]


def test_scripted_metric_sumsq_split_survives_big_values(ray_session):
    # v6 ~ 5e8 squares to 2.5e17: a handful of rows would overflow an
    # int64 sum-of-squares without the split representation
    from onestools_eventlog_ray.pipelines.relational import (
        scripted_metric_variance)
    vals = [490.02] * 200 + [0.01] * 200
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["hot"] * 400),
        "value": pa.array(vals, pa.float64()),
    }))
    out = scripted_metric_variance(ds)
    v6 = [int(np.floor(v * 1_000_000 + 0.5)) for v in vals]
    n, s, sq = len(v6), sum(v6), sum(x * x for x in v6)
    assert out["var_e6"][0].as_py() == (n * sq - s * s) // (
        n * n * 1_000_000)
