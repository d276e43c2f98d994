"""Round-3 additions: ranking windows, LAG-gap stats, deterministic
SQL-recomputable sampling, pivot, rollup, and the bounded
edit-distance (FastSS) fuzzy join — unit semantics plus the same
oracle comparison the driver gate runs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from batch_geocode_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"
NEW = ["q50_event_rank_windows", "q51_user_interarrival",
       "q52_order_sample_stats", "q53_event_type_pivot",
       "q54_fuzzy_supplier_pairs", "q55_customer_rollup"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable"
                            ).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", NEW)
def test_new_query_matches_oracle(name, ray_session):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    res = QUERIES[name](SF)
    tables = list(res.iter_batches(batch_format="pyarrow"))
    got = _canon(pa.concat_tables(tables).to_pandas())
    want = _canon(con.sql(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
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


# ---------------------------------------------------------------------------
# bounded Levenshtein + deletion-neighborhood join
# ---------------------------------------------------------------------------

def _lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def test_lev_leq_matches_full_dp():
    from batch_geocode_ray.stages.dedup import _lev_leq

    rng = np.random.default_rng(7)
    alpha = "abc"
    words = ["".join(rng.choice(list(alpha), size=rng.integers(0, 6)))
             for _ in range(60)]
    for k in (1, 2):
        for a in words:
            for b in words:
                assert _lev_leq(a, b, k) == (_lev_full(a, b) <= k), (a, b, k)


def test_edit_distance_pairs_includes_indels(ray_session):
    # substitutions, insertions, deletions at dist 1; "ab"/"ba" (dist 2,
    # but shares deletion variants) must be filtered by the verify step
    names = ["kettle", "kettl", "kettles", "cattle", "ab", "ba", "xyz"]
    ids = list(range(len(names)))
    ds = rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64()),
                                 "name": pa.array(names, pa.string())}))
    from batch_geocode_ray.stages.dedup import edit_distance_pairs

    got = {(r["d1"], r["d2"])
           for r in edit_distance_pairs(ds, "name", "id", 1).take_all()}
    want = {(i, j) for i in ids for j in ids
            if i < j and _lev_full(names[i], names[j]) <= 1}
    assert got == want
    assert (0, 1) in got and (0, 2) in got     # deletion + insertion
    assert (4, 5) not in got                   # transposition is dist 2


def test_edit_distance_pairs_batch_boundary_invariance(ray_session):
    names = [f"name{i:03d}" for i in range(40)]
    tbl = pa.table({"id": pa.array(range(40), pa.int64()),
                    "name": pa.array(names, pa.string())})
    from batch_geocode_ray.stages.dedup import edit_distance_pairs

    one = {(r["d1"], r["d2"]) for r in edit_distance_pairs(
        rd.from_arrow(tbl), "name", "id", 1).take_all()}
    many = {(r["d1"], r["d2"]) for r in edit_distance_pairs(
        rd.from_arrow(tbl).repartition(7), "name", "id", 1).take_all()}
    assert one == many and len(one) > 0


# ---------------------------------------------------------------------------
# ranking / lag windows vs pandas
# ---------------------------------------------------------------------------

def test_grouped_rank_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 50, n).astype("datetime64[s]").astype(
            "datetime64[us]"),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "vb": rng.integers(0, 5, n).astype(np.int64),
    })
    from batch_geocode_ray.stages.windows import grouped_rank

    got = pd.concat([b for b in grouped_rank(
        rd.from_pandas(df), "user_id", "vb", ["ts", "event_id"], "event_id"
    ).iter_batches(batch_format="pandas")]).sort_values(
        "event_id").reset_index(drop=True)

    sdf = df.sort_values(["user_id", "vb", "ts", "event_id"],
                         ascending=[True, False, True, True])
    sdf["rn"] = sdf.groupby("user_id").cumcount() + 1
    sdf["rnk"] = sdf.groupby("user_id")["vb"].rank(
        method="min", ascending=False).astype(np.int64)
    sdf["drnk"] = sdf.groupby("user_id")["vb"].rank(
        method="dense", ascending=False).astype(np.int64)
    want = sdf.sort_values("event_id").reset_index(drop=True)
    for c in ("rn", "rnk", "drnk"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_interarrival_stats_vs_pandas(ray_session):
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[s]").astype(
            "datetime64[us]"),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
    })
    # one single-event user -> must be absent from the output
    df.loc[n - 1, "user_id"] = 99
    from batch_geocode_ray.stages.windows import interarrival_stats

    got = pd.concat([b for b in interarrival_stats(
        rd.from_pandas(df), "user_id", "ts", "event_id"
    ).iter_batches(batch_format="pandas")]).sort_values(
        "user_id").reset_index(drop=True)

    sdf = df.sort_values(["user_id", "ts", "event_id"])
    gaps = sdf.groupby("user_id")["ts"].diff().dropna()
    gdf = pd.DataFrame({"user_id": sdf.loc[gaps.index, "user_id"],
                        "gap": gaps.astype("timedelta64[us]").astype(
                            np.int64)})
    want = gdf.groupby("user_id")["gap"].agg(
        n_gaps="count", sum_gap_us="sum", max_gap_us="max").reset_index()
    assert 99 not in set(got["user_id"])
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    for c in ("n_gaps", "sum_gap_us", "max_gap_us"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


# ---------------------------------------------------------------------------
# pivot / rollup vs pandas
# ---------------------------------------------------------------------------

def test_pivot_counts_vs_pandas(ray_session):
    rng = np.random.default_rng(11)
    n = 400
    cats = ["a", "b", "c"]
    df = pd.DataFrame({
        "g": rng.integers(0, 7, n).astype(np.int64),
        "t": rng.choice(cats + ["other"], n),
    })
    from batch_geocode_ray.stages.aggregates import pivot_counts

    got = pd.concat([b for b in pivot_counts(
        rd.from_pandas(df), "g", "t", cats
    ).iter_batches(batch_format="pandas")]).reset_index(drop=True)
    for c in cats:
        want = df.groupby("g")["t"].apply(
            lambda s, c=c: int((s == c).sum()))
        assert (got[f"n_{c}"].to_numpy() ==
                want[got["g"]].to_numpy()).all(), c


def test_rollup_aggregate_vs_pandas(ray_session):
    rng = np.random.default_rng(13)
    n = 500
    df = pd.DataFrame({
        "r": rng.choice(["R1", "R2", "R3"], n),
        "m": rng.choice(["M1", "M2"], n),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    from batch_geocode_ray.stages.aggregates import rollup_aggregate

    got = pd.concat([b for b in rollup_aggregate(
        rd.from_pandas(df), ["r", "m"],
        [("v", "sum", "sv"), ("v", "count", "nv"), ("v", "max", "mv")]
    ).iter_batches(batch_format="pandas")]).sort_values(
        ["r", "m"]).reset_index(drop=True)

    fine = df.groupby(["r", "m"])["v"].agg(
        sv="sum", nv="count", mv="max").reset_index()
    lvl1 = df.groupby("r")["v"].agg(
        sv="sum", nv="count", mv="max").reset_index()
    lvl1["m"] = "ALL"
    total = pd.DataFrame({"r": ["ALL"], "m": ["ALL"],
                          "sv": [df["v"].sum()], "nv": [len(df)],
                          "mv": [df["v"].max()]})
    want = pd.concat([fine, lvl1, total])[["r", "m", "sv", "nv", "mv"]] \
        .sort_values(["r", "m"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("r", "m", "sv", "nv", "mv"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_rollup_rejects_mean():
    from batch_geocode_ray.stages.aggregates import rollup_aggregate

    with pytest.raises(ValueError):
        rollup_aggregate(None, ["k"], [("v", "mean", "m")])


def test_knuth_sample_mask_rate_and_determinism():
    from batch_geocode_ray.functions.hashing import knuth_sample_mask

    keys = np.arange(100_000, dtype=np.int64)
    m1 = knuth_sample_mask(keys, 5)
    m2 = knuth_sample_mask(keys, 5)
    assert (m1 == m2).all()
    assert abs(m1.mean() - 0.05) < 0.01
    # SQL-side recomputation agrees row-for-row
    import duckdb as dk
    want = dk.sql(
        "SELECT ((k * 2654435761) % 4294967296) % 100 < 5 AS m "
        "FROM (SELECT unnest(range(1000)) AS k)").df()["m"].to_numpy()
    assert (m1[:1000] == want).all()
