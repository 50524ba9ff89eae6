"""Deterministic synthetic source-code corpus + reference query set.

Implements FIXTURES.md §1-2: a Parquet table
``(repo, path, commit, lang, content)`` (the ``input_hint`` shape) whose
content is lines of tokens drawn from a 20k-term vocabulary under a
Zipf(1.2) distribution plus per-language keyword boilerplate, so hot
terms with df ≈ N exist and force the skew/salting path.  Everything is
seeded — same (n_docs, seed) in, byte-identical parquet out.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 20_000
ZIPF_A = 1.2
LANGS = ["py", "js", "go", "java", "rs", "c", "md"]
LANG_WEIGHTS = np.array([0.3, 0.2, 0.12, 0.12, 0.08, 0.08, 0.10])
LANG_EXT = {"py": "py", "js": "js", "go": "go", "java": "java",
            "rs": "rs", "c": "c", "md": "md"}
# per-lang boilerplate keywords -> hot terms with df ~ share of that lang
LANG_KEYWORDS = {
    "py": ["def", "import", "return", "self", "class"],
    "js": ["function", "const", "return", "export", "require"],
    "go": ["func", "package", "return", "import", "err"],
    "java": ["public", "class", "void", "return", "import"],
    "rs": ["fn", "let", "pub", "use", "impl"],
    "c": ["int", "void", "return", "include", "struct"],
    "md": ["license", "copyright", "the", "usage", "install"],
}
LICENSE_LINE = "copyright license permission the software is provided as is"


def make_vocab() -> list[str]:
    """20k deterministic identifier-like terms (tokenizer-stable)."""
    vocab = []
    for i in range(VOCAB_SIZE):
        h = hashlib.blake2b(f"term{i}".encode(), digest_size=6).hexdigest()
        vocab.append(f"v{h}")
    return vocab


def generate_corpus(n_docs: int, seed: int = 42,
                    min_len: int = 20, max_len: int = 2000,
                    start: int = 0) -> pa.Table:
    """``start`` offsets repo/path naming so chunked generation with
    per-chunk rngs stays disjoint and deterministic."""
    rng = np.random.default_rng(seed)
    vocab = np.asarray(make_vocab(), dtype=object)

    repos = np.asarray([f"org{(start + i) % 7}/repo{(start + i) % 23}"
                        for i in range(n_docs)], dtype=object)
    langs_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())
    langs = np.asarray([LANGS[i] for i in langs_idx], dtype=object)
    paths = np.asarray(
        [f"src/d{rng.integers(0, 40)}/f{start + i}.{LANG_EXT[langs[i]]}"
         for i in range(n_docs)], dtype=object)
    commits = np.asarray(
        [hashlib.sha1(f"{repos[i]}/{paths[i]}".encode()).hexdigest() for i in range(n_docs)],
        dtype=object)

    # doc lengths ~ lognormal clipped to [min_len, max_len]
    lens = np.clip(rng.lognormal(mean=4.6, sigma=0.8, size=n_docs).astype(np.int64),
                   min_len, max_len)
    # Zipf(1.2) over the vocabulary (rank-frequency)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_A)
    probs /= probs.sum()

    contents = []
    for i in range(n_docs):
        toks = vocab[rng.choice(VOCAB_SIZE, size=lens[i], p=probs)]
        kw = LANG_KEYWORDS[langs[i]]
        head = " ".join(kw) + "\n" + LICENSE_LINE + "\n"
        lines = [head]
        for j in range(0, lens[i], 12):
            lines.append(" ".join(toks[j:j + 12]))
        contents.append("\n".join(lines))

    return pa.table({
        "repo": pa.array(repos, type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "commit": pa.array(commits, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "content": pa.array(contents, type=pa.large_string()),
    })


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 rows_per_file: int = 5_000) -> str:
    """Write the corpus as a directory of parquet files (cached: skip if a
    matching _SYNTH_META marker already exists).  Chunks are generated
    with independent per-chunk rng seeds — deterministic, and generated
    in parallel as Ray tasks when a Ray session is up.  Small files +
    small row groups give the read stage real task parallelism (the
    100 TB corpus would likewise arrive as many files)."""
    meta = f"n_docs={n_docs} seed={seed} rpf={rows_per_file} v=2"
    marker = os.path.join(path, "_SYNTH_META")
    if os.path.exists(marker) and open(marker).read() == meta:
        return path
    os.makedirs(path, exist_ok=True)
    chunks = [(start, min(rows_per_file, n_docs - start))
              for start in range(0, n_docs, rows_per_file)]

    def _write_chunk(start: int, n: int) -> None:
        tbl = generate_corpus(n, seed=seed + start, start=start)
        pq.write_table(tbl, os.path.join(path, f"part-{start // rows_per_file:05d}.parquet"),
                       row_group_size=1024)

    import ray
    if ray.is_initialized():
        gen = ray.remote(lambda s, n: _write_chunk(s, n))
        ray.get([gen.remote(s, n) for s, n in chunks])
    else:
        for s_, n_ in chunks:
            _write_chunk(s_, n_)
    with open(marker, "w") as f:
        f.write(meta)
    return path


def reference_queries(corpus: pa.Table, n_queries: int = 50, seed: int = 42,
                      k: int = 10) -> list[dict]:
    """FIXTURES.md §2: 1-4 terms per query from hot / mid / rare strata,
    plus >= 5 queries containing a zero-hit term."""
    from onestools_eventlog_ray.functions.analyzer import tokenize_py
    rng = np.random.default_rng(seed + 1)
    df: dict[str, int] = {}
    for text in corpus["content"].to_pylist():
        for t in set(tokenize_py(text)):
            df[t] = df.get(t, 0) + 1
    terms_by_df = sorted(df, key=lambda t: (-df[t], t))
    hot = terms_by_df[:100]
    rare = [t for t in terms_by_df if df[t] <= 5] or terms_by_df[-100:]
    mid = terms_by_df[100:len(terms_by_df) - len(rare)] or terms_by_df
    queries = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        terms = []
        for _ in range(n_terms):
            stratum = [hot, mid, rare][int(rng.integers(0, 3))]
            terms.append(stratum[int(rng.integers(0, len(stratum)))])
        if qid < 5:
            terms.append(f"zzz_nohit_{qid}")
        queries.append({"query_id": qid, "terms": terms, "k": k})
    return queries
