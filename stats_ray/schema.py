"""Shared Arrow types for parsed battles (engine output & synth ground truth)."""

from __future__ import annotations

import pyarrow as pa

SLOT_T = pa.struct([
    ("side", pa.int8()), ("slot", pa.int8()), ("player", pa.string()),
    ("species", pa.string()), ("item", pa.string()), ("ability", pa.string()),
    ("nature", pa.string()), ("happiness", pa.int32()), ("level", pa.int32()),
    ("tera", pa.string()),
    ("move1", pa.string()), ("move2", pa.string()),
    ("move3", pa.string()), ("move4", pa.string()),
    ("spread", pa.string()), ("stats", pa.string()),
    ("turns_out", pa.int32()), ("kos", pa.int32()),
])

MATCHUP_T = pa.struct([
    ("idx", pa.int32()), ("s1", pa.string()), ("s2", pa.string()),
    ("outcome", pa.int8()),
])

TAG_T = pa.struct([("side", pa.int8()), ("tag", pa.string())])

# Battle-level scalar columns shared by the parsed dataset and gt_battles
PARSED_SCALARS = [
    ("doc_id", pa.string()), ("source", pa.string()), ("format", pa.string()),
    ("singles", pa.bool_()), ("non6v6", pa.bool_()), ("short", pa.bool_()),
    ("p1", pa.string()), ("p2", pa.string()), ("winner", pa.int8()),
    ("turns", pa.int32()), ("end_type", pa.string()),
    ("ts_ms", pa.int64()),
    ("p1_has_rating", pa.bool_()), ("p1_rpr", pa.float64()),
    ("p1_rprd", pa.float64()), ("p1_valid", pa.bool_()), ("p1_gxe", pa.float64()),
    ("p2_has_rating", pa.bool_()), ("p2_rpr", pa.float64()),
    ("p2_rprd", pa.float64()), ("p2_valid", pa.bool_()), ("p2_gxe", pa.float64()),
    ("lead1", pa.string()), ("lead2", pa.string()),
    ("p1_bias", pa.int32()), ("p1_stalliness", pa.float64()),
    ("p2_bias", pa.int32()), ("p2_stalliness", pa.float64()),
    ("cutoff0", pa.int32()), ("cutoff1", pa.int32()),
    ("cutoff2", pa.int32()), ("cutoff3", pa.int32()),
    ("p1_w0", pa.float64()), ("p1_w1", pa.float64()),
    ("p1_w2", pa.float64()), ("p1_w3", pa.float64()),
    ("p2_w0", pa.float64()), ("p2_w1", pa.float64()),
    ("p2_w2", pa.float64()), ("p2_w3", pa.float64()),
    # legacy dual-weight pair: the m-weight feeds the per-set count-maps and
    # raw/saved weights (stats.ts:259-267); m == w (s) outside legacy mode.
    ("p1_m0", pa.float64()), ("p1_m1", pa.float64()),
    ("p1_m2", pa.float64()), ("p1_m3", pa.float64()),
    ("p2_m0", pa.float64()), ("p2_m1", pa.float64()),
    ("p2_m2", pa.float64()), ("p2_m3", pa.float64()),
]

PARSED_SCHEMA = pa.schema(
    PARSED_SCALARS
    + [("p1_tags", pa.list_(pa.string())), ("p2_tags", pa.list_(pa.string())),
       ("slots", pa.list_(SLOT_T)), ("matchups", pa.list_(MATCHUP_T))]
)


def empty_frame(schema):
    """Typed zero-row pandas frame from a Ray Data or Arrow schema (the
    shared kernel of the typed-empty fallbacks below)."""
    import pandas as pd

    base = getattr(schema, "base_schema", schema)
    if base is None or not hasattr(base, "empty_table"):
        return pd.DataFrame()
    return base.empty_table().to_pandas()


def to_pandas_typed(ds):
    """Dataset.to_pandas with a typed-empty fallback: a fully-empty Dataset
    drops its schema in to_pandas(), which breaks downstream column access
    in the zero-row case (empty partitions/selections, gates that filter
    everything). Single shared implementation — used by the driver entry,
    the ops queries, and the report spill path."""
    df = ds.to_pandas()
    if not len(df.columns):
        df = empty_frame(ds.schema())
    return df
