"""Corpus sources — Parquet in, canonical Dataset out.

The analog of the reference's pull-based LGP folder source
(``/root/reference/OneSTools.EventLog/EventLogReader.cs:55-113``): file
enumeration / ordering / block splitting are delegated to Ray Data's
parquet datasource; column pruning happens AT THE READ so a stage that
only needs ``content`` never decodes metadata columns.

A ``CorpusSpec`` adapts any table shape to the engine's canonical view:
either the ``input_hint`` shape ``(repo, path, commit, lang, content)``
(doc_id derived from the key columns) or a table that already carries an
id (e.g. the driver's ``documents(doc_id, text, ...)``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data


@dataclass(frozen=True)
class CorpusSpec:
    content_col: str = "content"
    id_col: str | None = None                       # pre-existing doc_id column
    key_cols: tuple[str, ...] = ("repo", "path", "commit")  # doc_id source if id_col None
    meta_cols: tuple[str, ...] = ("repo", "path", "commit", "lang")

    @property
    def id_source_cols(self) -> tuple[str, ...]:
        return (self.id_col,) if self.id_col else self.key_cols

    def read_cols(self, with_content: bool = True, with_meta: bool = True) -> list[str]:
        cols: list[str] = []
        for c in self.id_source_cols:
            cols.append(c)
        if with_meta:
            for c in self.meta_cols:
                if c not in cols:
                    cols.append(c)
        if with_content and self.content_col not in cols:
            cols.append(self.content_col)
        return cols


def read_parquet_clean(paths, columns: list[str] | None = None,
                       **read_kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with the file schema's key-value metadata
    stripped.

    Parquet written from pandas carries a ``b'pandas'`` metadata blob that
    makes ``pa.Schema`` UNHASHABLE (``hash(schema)`` raises on the dict
    inside) — every sort/aggregate reduce task downstream then logs
    "Failed to hash the schemas (for deduplication)" and falls back to the
    expensive unify path.  Passing an explicit metadata-free ``schema=`` to
    the reader is free (no extra stage) and makes every downstream shuffle's
    schema comparison a cheap hash hit."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    first = paths if isinstance(paths, str) else paths[0]
    if _os.path.isdir(first):
        cands = sorted(_glob.glob(_os.path.join(first, "*.parquet")))
        first = cands[0] if cands else None
    try:
        full = pq.read_schema(first).remove_metadata()
        schema = pa.schema([full.field(c) for c in columns]) if columns else full
    except Exception:
        return ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    return ray.data.read_parquet(paths, columns=columns, schema=schema,
                                 **read_kwargs)


CODE_CORPUS_SPEC = CorpusSpec()   # the input_hint shape

DOCUMENTS_SPEC = CorpusSpec(      # /root/testdata/sf*/documents.parquet adapter
    content_col="text",
    id_col="doc_id",
    key_cols=("doc_id",),
    meta_cols=("lang", "source", "n_chars"),
)


def read_corpus(paths: str | list[str], spec: CorpusSpec = CODE_CORPUS_SPEC,
                with_content: bool = True, with_meta: bool = True,
                fmt: str = "parquet", **read_kwargs) -> ray.data.Dataset:
    """Column-pruned read of a corpus table (parquet or jsonl).

    Parquet gets true column pruning at the reader; JSONL is read whole
    and projected immediately after (the format has no column layout to
    prune — prefer parquet for anything large)."""
    cols = spec.read_cols(with_content, with_meta)
    if fmt == "parquet":
        return read_parquet_clean(paths, columns=cols, **read_kwargs)
    if fmt in ("json", "jsonl"):
        ds = ray.data.read_json(paths, **read_kwargs)
        return ds.select_columns(cols)
    if fmt == "csv":
        ds = ray.data.read_csv(paths, **read_kwargs)
        return ds.select_columns(cols)
    if fmt == "orc":
        ds = ray.data.read_datasource(
            OrcDatasource(paths, columns=cols, **read_kwargs))
        return ds.select_columns(cols)   # enforce column order
    raise ValueError(f"unsupported corpus format: {fmt!r}")


try:
    from ray.data.datasource import FileBasedDatasource as _FBD
except ImportError:                       # pragma: no cover
    _FBD = object


class OrcDatasource(_FBD):
    """Custom Ray Data datasource for ORC files — the user-extension
    seam (SURVEY §2.11 X1) exercised with a real third format: Ray 2.49
    ships no ORC reader, so this subclasses ``FileBasedDatasource`` and
    streams one Arrow table PER STRIPE (the ORC row-group analog), so a
    multi-stripe file never materializes whole and stripes parallelize
    across blocks like parquet row groups.  Column pruning is pushed to
    ``read_stripe(columns=...)`` — pruned columns never decompress."""

    _FILE_EXTENSIONS = ["orc"]

    def __init__(self, paths, columns=None, **kwargs):
        super().__init__(paths, **kwargs)
        self._columns = list(columns) if columns else None

    def _open_input_source(self, filesystem, path, **open_args):
        # ORC needs a SEEKABLE file (footer + stripe index reads);
        # the default opens a forward-only stream
        return filesystem.open_input_file(path)

    def _read_stream(self, f, path: str):
        import pyarrow as pa_
        import pyarrow.orc as po
        reader = po.ORCFile(f)
        for i in range(reader.nstripes):
            batch = reader.read_stripe(i, columns=self._columns)
            yield pa_.Table.from_batches([batch])

