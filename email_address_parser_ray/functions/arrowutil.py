"""Small Arrow interop helpers shared across stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_pandas_clean(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow without the ``b'pandas'`` schema metadata.

    Blocks carrying pandas metadata defeat Ray Data's schema
    deduplication (every shuffle logs ``Failed to hash the schemas``
    and re-ships the schema per block); stripping the metadata at the
    pandas→Arrow boundary keeps downstream schemas hashable.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def concat_nonempty(tables, fallback: pa.Schema) -> pa.Table:
    """Concat Arrow blocks, skipping the ZERO-COLUMN empty blocks Ray's
    shuffle operators emit for empty partitions (they would fail
    ``pa.concat_tables`` schema unification); returns an empty table of
    ``fallback`` schema when nothing real remains."""
    real = [t for t in tables if t.num_columns > 0]
    if not real:
        return fallback.empty_table()
    return pa.concat_tables(real)
