"""Small block-format helpers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pd_to_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas -> Arrow block with NO pandas schema metadata.

    Returning raw DataFrames from ``map_groups`` makes Ray carry
    PandasBlockSchema blocks; mixed with Arrow blocks downstream they defeat
    schema deduplication ("Failed to hash the schemas" warnings) and force
    conversions. Every group kernel returns through this instead.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
