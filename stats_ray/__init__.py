"""stats_ray — a Ray-Data-native battle-log statistics engine.

A from-scratch re-expression of the query/data-processing capabilities of
pkmn/stats (reference: /root/reference) on top of ray.data.Dataset:
parse -> enrich -> route -> aggregate over Parquet tables of pre-tokenized
battle-log sequences (doc_id, tokens:list<int32>, n_tok, source).

Nothing in here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (bench.py, CLIs, test fixtures, or the evaluation driver).
"""

__version__ = "0.1.0"
