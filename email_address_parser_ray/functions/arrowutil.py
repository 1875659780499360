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
