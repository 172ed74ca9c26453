"""stats_ray — a Ray-Data-native battle-log statistics engine.

A from-scratch re-expression of the query/data-processing capabilities of
pkmn/stats (reference: /root/reference) on top of ray.data.Dataset:
parse -> enrich -> route -> aggregate over Parquet tables of pre-tokenized
battle-log sequences (doc_id, tokens:list<int32>, n_tok, source).

Nothing in here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (bench.py, CLIs, test fixtures, or the evaluation driver).
"""

__version__ = "0.1.0"


def _install_pandas_block_metadata_shim() -> None:
    """Strip schema metadata from Ray's pandas->Arrow block conversion.

    pyarrow Schema objects that carry metadata (the b'pandas' blob that
    ``pa.Table.from_pandas`` attaches) are unhashable in this pyarrow
    build (``hash(schema)`` raises ``unhashable type: 'dict'``), and Ray's
    ``unify_schemas`` hashes schemas for deduplication in every shuffle
    reduce — producing a "Failed to hash the schemas" warning per reduce
    task for any pandas-format stage feeding a groupby/sort. Our own
    Arrow exits already strip metadata; this covers the implicit
    conversions Ray performs on pandas blocks we return. Stripping is
    zero-copy (schema-only) and the pandas metadata is never consumed
    downstream of a shuffle.
    """
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except Exception:  # pragma: no cover - Ray internals moved
        return
    orig = PandasBlockAccessor.to_arrow
    if getattr(orig, "_stats_ray_shim", False):
        return

    def to_arrow(self):
        t = orig(self)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    to_arrow._stats_ray_shim = True
    PandasBlockAccessor.to_arrow = to_arrow


_install_pandas_block_metadata_shim()
