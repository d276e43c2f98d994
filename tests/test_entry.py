"""Driver-contract smoke: entry() runs under an existing Ray session
and every queries() key with an oracle is present, and vice versa."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_entry_smoke():
    res = entrymod.entry()
    # Dataset | DataFrame | Table accepted; count rows without pandas
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = sum(b.num_rows for b in res.iter_batches(batch_format="pyarrow"))
        names = res.schema().names
    else:
        n, names = len(res), list(res.columns)
    assert n >= 0
    assert "url" in names and "best_lat" in names


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must name an implemented query
    assert set(oracles) <= set(qs)
    # every callable takes one positional arg
    import inspect

    for name, fn in qs.items():
        params = inspect.signature(fn).parameters
        assert len(params) >= 1, name


def test_rows_only_queries_have_written_justification():
    """Every query WITHOUT a DuckDB oracle must be justified in the
    ORACLE_SQL comment block (driver contract: the judge sees which
    queries are rows-only and why)."""
    import inspect

    import batch_geocode_ray.pipelines.queries as q

    rows_only = set(q.QUERIES) - set(q.ORACLE_SQL)
    src = inspect.getsource(q)
    block = src[src.index("# Deliberately rows-only"):]
    for name in rows_only:
        stem = name.split("_")[0]  # e.g. "q19"
        assert stem in block, f"{name} lacks a rows-only justification"
