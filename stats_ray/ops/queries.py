"""Generic relational + training-data operator queries over the driver's
sf tables (lineitem/orders/customer/events/documents/embeddings).

QUERIES maps name -> callable(sf_dir) -> DataFrame/Table.
ORACLES maps name -> DuckDB SQL (omit for non-SQL-expressible ops).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
