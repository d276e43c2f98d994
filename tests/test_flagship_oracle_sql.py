"""The q46-q49 flagship slices vs their DuckDB oracles, in-pytest (the
driver gate runs the same comparison; this keeps it reproducible from
`pytest` alone). Exact value equality after canonical column/row sort —
the float columns are fixed-point rounded identically on both sides."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from batch_geocode_ray.pipelines.queries import ORACLE_SQL, QUERIES

FLAGSHIP = ["q46_geocode_best", "q47_geocode_knn",
            "q48_tile_raster", "q49_geocode_admin"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable"
                            ).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", FLAGSHIP)
def test_flagship_slice_matches_oracle(name):
    res = QUERIES[name]("/root/testdata/sf0.001")  # sf ignored; fixed fixture
    tables = list(res.iter_batches(batch_format="pyarrow"))
    got = _canon(pa.concat_tables(tables).to_pandas())
    want = _canon(duckdb.sql(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        gv, wv = got[c], want[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            a = gv.astype(float).to_numpy()
            b = wv.astype(float).to_numpy()
            ok = (a == b) | (np.isnan(a) & np.isnan(b))
            assert ok.all(), f"{name}.{c}: {int((~ok).sum())} float diffs"
        else:
            eq = (gv == wv) | (gv.isna() & wv.isna())
            assert eq.all(), f"{name}.{c}: {int((~eq).sum())} diffs"
