"""Registry-wide output-dtype contract.

CORRECTNESS_r03's one red row (events_time_delta) was caused by the
registry's single pandas masked-``Int64`` output: pandas extension
dtypes (Int64/boolean/...) canonicalize differently from Arrow
int64-with-nulls under the driver's hash compare even when values
match the oracle. This test pins the fix for EVERY query: run each
registry entry at sf0.001 and assert the raw result (pandas blocks
included — ``Dataset.to_pandas`` preserves a pandas block's extension
dtypes, while Arrow blocks land as numpy/float64) carries no pandas
extension dtype. Nullable ints must be Arrow int64-with-nulls
(``pa.array(..., pa.int64(), mask=...)``), never ``pd.array(...,
"Int64")``.
"""

import os
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_to_text_ray.pipelines.queries import QUERIES  # noqa: E402


def _extension_cols(res) -> list[str]:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        # Arrow tables can't carry pandas extension dtypes; flag Arrow
        # extension types too (none should exist in the registry).
        return [
            f.name for f in res.schema
            if isinstance(f.type, pa.ExtensionType)
        ]
    if not isinstance(res, pd.DataFrame):
        return []
    return [
        c for c in res.columns
        if isinstance(res.dtypes[c], pd.api.extensions.ExtensionDtype)
    ]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_output_has_no_pandas_extension_dtypes(name, sf_dir):
    bad = _extension_cols(QUERIES[name](sf_dir))
    assert not bad, (
        f"{name}: columns {bad} use pandas extension dtypes; emit Arrow "
        "int64-with-nulls (pa.array(..., mask=...)) instead"
    )
