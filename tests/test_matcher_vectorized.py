"""Vectorized matcher ≡ Aho-Corasick matcher (modulo span units)."""

import numpy as np
import pyarrow as pa

from batch_geocode_ray.sources.fixtures import ensure_fixture_dir, generate_world
from batch_geocode_ray.stages.matcher import GazetteerMatcher
from batch_geocode_ray.state.gazetteer import GazetteerIndex


def mentions_multiset(batch_out):
    out = []
    for row, ms in enumerate(batch_out["mentions"].to_pylist()):
        out.append(sorted((m["gazetteer_id"]) for m in ms))
    return out


def test_vectorized_equals_ac_on_fixture():
    import glob

    import pyarrow.parquet as pq

    d = ensure_fixture_dir(300)
    w = generate_world()
    idx = GazetteerIndex.from_table(w.gazetteer)
    batch = pq.read_table(sorted(glob.glob(f"{d}/pages/*.parquet"))[0])
    fast = GazetteerMatcher(idx, emit_spans=False)(batch)
    slow = GazetteerMatcher(idx, emit_spans=True)(batch)
    assert mentions_multiset(fast) == mentions_multiset(slow)
    # every page's mention count matches too (all occurrences emitted)
    f_counts = [len(m) for m in fast["mentions"].to_pylist()]
    s_counts = [len(m) for m in slow["mentions"].to_pylist()]
    assert f_counts == s_counts
    assert sum(f_counts) > 300  # fixture is mention-rich


def test_vectorized_handcrafted_cases():
    rows = [
        (0, "Echo City", 0.0, 0.0, None, None, None, None, "US", "p", 1, "GM"),
        (1, "Echo", 1.0, 1.0, None, None, None, None, "US", "p", 1, "OSM"),
        (2, "Echo City", 2.0, 2.0, None, None, None, None, "FR", "p", 1, "GN"),
        (3, "Deep Blue Sea", 3.0, 3.0, None, None, None, None, "US", "p", 1, "GM"),
    ]
    gaz = pa.table({
        "gazetteer_id": pa.array([r[0] for r in rows], pa.int64()),
        "name": pa.array([r[1] for r in rows]),
        "lat": pa.array([r[2] for r in rows], pa.float64()),
        "lon": pa.array([r[3] for r in rows], pa.float64()),
        "bb_n": pa.array([r[4] for r in rows], pa.float64()),
        "bb_s": pa.array([r[5] for r in rows], pa.float64()),
        "bb_e": pa.array([r[6] for r in rows], pa.float64()),
        "bb_w": pa.array([r[7] for r in rows], pa.float64()),
        "cc": pa.array([r[8] for r in rows]),
        "type": pa.array([r[9] for r in rows]),
        "population": pa.array([r[10] for r in rows], pa.int64()),
        "source": pa.array([r[11] for r in rows]),
    })
    idx = GazetteerIndex.from_table(gaz)
    texts = [
        "visit Echo City today",          # Echo (nested) + Echo City x2 sources
        "Echo City Echo City",            # repeated occurrences
        "the deep blue sea is deep",      # 3-token phrase
        "echoing is not Echo-adjacent",   # 'echo' token appears ('echo'
                                          # then 'adjacent'); 'echoing' is NOT a hit
        "",
    ]
    batch = pa.table({"text": pa.array(texts)})
    fast = GazetteerMatcher(idx, emit_spans=False)(batch)
    slow = GazetteerMatcher(idx, emit_spans=True)(batch)
    got = [sorted(m["gazetteer_id"] for m in ms)
           for ms in fast["mentions"].to_pylist()]
    want = [sorted(m["gazetteer_id"] for m in ms)
            for ms in slow["mentions"].to_pylist()]
    assert got == want
    assert got[0] == [0, 1, 2]          # Echo + both Echo City entries
    assert got[1] == [0, 0, 1, 1, 2, 2]  # every occurrence, every source
    assert got[2] == [3]
    assert got[3] == [1]                 # "Echo" token from "Echo-adjacent"
    assert got[4] == []
    # token-index spans on the fast path
    m0 = fast["mentions"].to_pylist()[0]
    echo_city = [m for m in m0 if m["gazetteer_id"] == 0][0]
    assert (echo_city["start"], echo_city["end"]) == (1, 3)
