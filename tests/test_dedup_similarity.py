"""Dedup + similarity operators: exactness, LSH recall against the
exact join, and plumbing of the multimodal stubs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from batch_geocode_ray.stages.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from batch_geocode_ray.stages.joins import broadcast_join
from batch_geocode_ray.stages.similarity import (
    cosine_neardup_pairs,
    knn_cosine,
)

BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")


def docs_table():
    texts = [
        BASE,                             # 0
        BASE + " phi",                    # 1: near-dup of 0
        "totally different content here about other things entirely "
        "with many words that do not overlap at all",  # 2
        BASE,                             # 3: exact dup of 0
        "short text",                     # 4
        BASE.replace("gamma", "GAMMA"),   # 5: case-only change = same tokens
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.fixture(scope="module")
def docs_ds():
    return rd.from_arrow(docs_table()).repartition(3)


def test_exact_dedup(docs_ds):
    got = {r["doc_id"]: r["n_copies"]
           for r in exact_dedup(docs_ds, "text", "doc_id").take_all()}
    # docs 0 and 3 are byte-identical -> survivor 0 with 2 copies;
    # doc 5 differs byte-wise (case), so it is NOT an exact dup
    assert got[0] == 2
    assert 3 not in got
    assert got[5] == 1
    assert sum(got.values()) == 6


def test_ngram_jaccard_exact_pairs(docs_ds):
    pairs = ngram_jaccard_pairs(docs_ds, "text", "doc_id",
                                k=3, threshold=0.8).take_all()
    found = {(r["d1"], r["d2"]): r["jaccard"] for r in pairs}
    # tokenization lowercases, so 0/3/5 are identical token streams and
    # 1 shares all of 0's grams
    assert found[(0, 3)] == 1.0
    assert found[(0, 5)] == 1.0
    assert found[(3, 5)] == 1.0
    assert (0, 1) in found and found[(0, 1)] > 0.9
    assert all(d not in (2, 4) for p in found for d in p)


def test_minhash_lsh_finds_exact_pairs(docs_ds):
    exact = {(r["d1"], r["d2"])
             for r in ngram_jaccard_pairs(docs_ds, "text", "doc_id",
                                          k=3, threshold=0.8).take_all()}
    lsh = {(r["d1"], r["d2"])
           for r in minhash_lsh_pairs(docs_ds, "text", "doc_id",
                                      threshold=0.8).take_all()}
    # high-similarity pairs must be recalled; no sub-threshold pair may appear
    assert exact <= lsh or exact == lsh
    for r in minhash_lsh_pairs(docs_ds, "text", "doc_id",
                               threshold=0.8).take_all():
        assert r["est_jaccard"] >= 0.8


def test_simhash_pairs(docs_ds):
    got = {(r["d1"], r["d2"]): r["hamming"]
           for r in simhash_pairs(docs_ds, "text", "doc_id",
                                  max_hamming=3).take_all()}
    # identical token multisets -> identical simhash -> hamming 0
    assert got[(0, 3)] == 0
    assert got[(0, 5)] == 0
    assert (0, 2) not in got


def test_fingerprint_dedup(docs_ds):
    rows = fingerprint_dedup(docs_ds, "text", "doc_id").take_all()
    by_id = {r["doc_id"]: r["n_members"] for r in rows}
    # 0, 1, 3, 5 share the winnowing fingerprint (1 shares 0's min window)
    assert by_id[0] == 4
    assert by_id[2] == 1


def test_shuffle_plan_equals_collapsed_plan(docs_ds, monkeypatch):
    """The adaptive small-side collapse is a physical-plan choice only:
    forcing the shuffle plan must give identical answers."""
    import batch_geocode_ray.stages.dedup as dd

    def run_all():
        return (
            sorted((r["doc_id"], r["n_copies"])
                   for r in exact_dedup(docs_ds, "text", "doc_id").take_all()),
            sorted((r["d1"], r["d2"], round(r["jaccard"], 12))
                   for r in ngram_jaccard_pairs(docs_ds, "text", "doc_id",
                                                k=3, threshold=0.8).take_all()),
            sorted((r["d1"], r["d2"], round(r["est_jaccard"], 12))
                   for r in minhash_lsh_pairs(docs_ds, "text", "doc_id",
                                              threshold=0.8).take_all()),
            sorted((r["d1"], r["d2"], r["hamming"])
                   for r in simhash_pairs(docs_ds, "text", "doc_id",
                                          max_hamming=3).take_all()),
        )

    collapsed = run_all()
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    shuffled = run_all()
    assert collapsed == shuffled


def test_broadcast_join_inner_and_left():
    big = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0]),
    }))
    small = pa.table({
        "k": pa.array([1, 3], pa.int64()),
        "name": pa.array(["one", "three"], pa.string()),
    })
    inner = broadcast_join(big, small, "k", ["name"]).take_all()
    assert sorted((r["k"], r["name"]) for r in inner) == [(1, "one"), (3, "three")]
    left = broadcast_join(big, small, "k", ["name"], how="left").take_all()
    got = {r["k"]: r["name"] for r in left}
    assert got == {1: "one", 2: None, 3: "three", 4: None}


def embeddings_ds(n=40, d=8, seed=2):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d)
    m[1] = m[0] + 0.001 * rng.randn(d)  # planted near-dup
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), d),
    })
    return rd.from_arrow(t).repartition(4), m


def test_knn_cosine_matches_numpy():
    ds, m = embeddings_ds()
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    got = knn_cosine(ds, "embedding", "vec_id",
                     m[:3], np.arange(3), k=4).take_all()
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf  # exclude self
        order = np.lexsort((np.arange(len(s)), -s))[:4]
        want = order.tolist()
        mine = [r["neighbor_id"] for r in got if r["query_id"] == q]
        assert mine == want


def test_knn_shuffle_merge_matches_single_task(monkeypatch):
    """Large-Q plan (bucketed shuffle merge + distributed sort) must
    return exactly the single-task merge's rows in the same order —
    and must not route all partials through one task."""
    import batch_geocode_ray.stages.similarity as sim

    ds, m = embeddings_ds()
    q, qids = m[:7], np.arange(7)
    want = knn_cosine(ds, "embedding", "vec_id", q, qids, k=4).take_all()
    monkeypatch.setattr(sim, "SHUFFLE_MERGE_QUERIES", 3)  # force shuffle path
    got = knn_cosine(ds, "embedding", "vec_id", q, qids, k=4).take_all()
    assert [tuple(sorted(r.items())) for r in got] == \
        [tuple(sorted(r.items())) for r in want]


def test_cosine_neardup_pairs():
    ds, m = embeddings_ds()
    pairs = cosine_neardup_pairs(ds, "embedding", "vec_id",
                                 threshold=0.99).take_all()
    assert {(r["d1"], r["d2"]) for r in pairs} == {(0, 1)}


def test_cosine_neardup_block_pair_plan_matches_one_task(monkeypatch):
    """Forcing the at-scale exact plan (block-pair tiling over object
    store refs, no driver materialization) must give identical pairs."""
    import batch_geocode_ray.stages.dedup as dd

    ds, _ = embeddings_ds()
    want = sorted((r["d1"], r["d2"], round(r["cosine"], 12))
                  for r in cosine_neardup_pairs(
                      ds, "embedding", "vec_id", threshold=0.3).take_all())
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    got = sorted((r["d1"], r["d2"], round(r["cosine"], 12))
                 for r in cosine_neardup_pairs(
                     ds, "embedding", "vec_id", threshold=0.3).take_all())
    assert got == want and len(want) > 0


def test_cosine_neardup_lsh_recalls_neardups():
    """Hyperplane-LSH plan at a true near-dup threshold: every exact
    pair recalled (banding S-curve ~1 at cos>=0.9), no false positives,
    same cosines."""
    ds, _ = embeddings_ds()
    exact = sorted((r["d1"], r["d2"], round(r["cosine"], 12))
                   for r in cosine_neardup_pairs(
                       ds, "embedding", "vec_id", threshold=0.9).take_all())
    lsh = sorted((r["d1"], r["d2"], round(r["cosine"], 12))
                 for r in cosine_neardup_pairs(
                     ds, "embedding", "vec_id", threshold=0.9,
                     method="lsh").take_all())
    assert lsh == exact and len(exact) >= 1


def test_semi_anti_join_both_plans(monkeypatch):
    from batch_geocode_ray.stages.joins import semi_anti_join

    big = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
    })).repartition(3)
    keys = rd.from_arrow(pa.table({"kk": pa.array([2, 4, 4, 6], pa.int64())}))

    def run():
        semi = sorted(r["k"] for r in semi_anti_join(
            big, keys, "k", right_key="kk").take_all())
        anti = sorted(r["k"] for r in semi_anti_join(
            big, keys, "k", right_key="kk", anti=True).take_all())
        return semi, anti

    assert run() == ([2, 4, 6], [1, 3, 5])
    import batch_geocode_ray.stages.dedup as dd
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)  # force shuffle join
    assert run() == ([2, 4, 6], [1, 3, 5])


def test_ivf_recall_pin():
    """The approximate IVF path may not silently degrade: recall@5
    vs the exact knn_cosine must stay >= 0.9 on the fixture."""
    from batch_geocode_ray.stages.similarity import ivf_knn

    ds, m = embeddings_ds(n=200, d=8, seed=3)
    q = m[:10]
    qids = np.arange(10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_cosine(ds, "embedding", "vec_id", q, qids,
                                 k=5).take_all()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_knn(ds, "embedding", "vec_id", q, qids,
                               k=5).take_all()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall@5 degraded to {recall:.3f}"


def test_minhash_trigram_verify_equals_exact_join(docs_ds, monkeypatch):
    """verify='trigram' must reproduce the exact n-gram join's pairs
    AND jaccard values (recall 1.0 at these similarities), in both the
    collapsed and the shuffle plan."""
    import batch_geocode_ray.stages.dedup as dd

    exact = sorted((r["d1"], r["d2"], r["jaccard"])
                   for r in ngram_jaccard_pairs(
                       docs_ds, "text", "doc_id", k=3,
                       threshold=0.8).take_all())

    def lsh():
        return sorted((r["d1"], r["d2"], r["jaccard"])
                      for r in minhash_lsh_pairs(
                          docs_ds, "text", "doc_id", threshold=0.8,
                          verify="trigram").take_all())

    assert lsh() == exact
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    assert lsh() == exact


def test_grouped_moving_avg_matches_pandas():
    import pandas as pd

    from batch_geocode_ray.stages.windows import grouped_moving_avg

    rng = np.random.RandomState(9)
    n = 500
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 12, n), pa.int64()),
        "ts": pa.array(
            np.datetime64("2024-01-01") +
            rng.randint(0, 10**6, n).astype("timedelta64[s]")),
        "value": pa.array(rng.uniform(0, 100, n)),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = {r["event_id"]: r["mov_avg"]
           for r in grouped_moving_avg(ds, "user_id", "ts", "event_id",
                                       "value", window_rows=7).take_all()}
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = df.groupby("user_id")["value"].transform(
        lambda s: s.rolling(7, min_periods=1).mean())
    for eid, w in zip(df["event_id"], want):
        assert abs(got[eid] - w) < 1e-9


def test_broadcast_range_count_matches_naive():
    from batch_geocode_ray.stages.joins import broadcast_range_count

    rng = np.random.RandomState(4)
    n_big, n_small = 400, 30
    big = pa.table({
        "k": pa.array(rng.randint(0, 5, n_big), pa.int64()),
        "t": pa.array(rng.randint(0, 1000, n_big), pa.int64()),
    })
    small = pa.table({
        "sid": pa.array(range(n_small), pa.int64()),
        "k": pa.array(rng.randint(0, 6, n_small), pa.int64()),
        "t": pa.array(rng.randint(0, 1000, n_small), pa.int64()),
    })
    w = 100
    got = {r["sid"]: r["n"] for r in broadcast_range_count(
        rd.from_arrow(big).repartition(3), small, "k", "t", "k", "t",
        "sid", window_us=w, count_name="n").take_all()}
    bk = big["k"].to_numpy()
    bt = big["t"].to_numpy()
    for sid, k_, t_ in zip(small["sid"].to_numpy(), small["k"].to_numpy(),
                           small["t"].to_numpy()):
        want = int(((bk == k_) & (bt >= t_) & (bt < t_ + w)).sum())
        assert got.get(sid, 0) == want


def test_multimodal_stub_plumbing():
    from batch_geocode_ray.pipelines.queries import q24_image_features, q25_audio_frames

    img = q24_image_features("unused").take_all()
    assert len(img) == 64
    assert len(img[0]["features"]) == 16
    assert "image" not in img[0]  # heavy payload dropped
    # deterministic across runs
    img2 = q24_image_features("unused").take_all()
    assert img[0]["pixel_mean"] == img2[0]["pixel_mean"]

    aud = q25_audio_frames("unused").take_all()
    assert len(aud) == 64 and len(aud[0]["frame_energy"]) == 8


def test_multimodal_strict_raises():
    from batch_geocode_ray.stages.multimodal import ImageFeatures

    stage = ImageFeatures(decode="strict")
    with pytest.raises(NotImplementedError):
        stage(pa.table({
            "media_id": pa.array([0], pa.int64()),
            "image": pa.array([b"x"], pa.binary()),
            "width": pa.array([8], pa.int32()),
            "height": pa.array([8], pa.int32()),
        }))


def test_bmp_wav_codecs_round_trip():
    """The 'real' decode path uses actual codecs: BMP encode->decode is
    pixel-exact; WAV encode->decode recovers samples to 16-bit
    quantization."""
    from batch_geocode_ray.stages.multimodal import (
        decode_bmp,
        decode_wav,
        make_bmp,
        make_wav,
    )

    gray = (np.add.outer(np.arange(48), np.arange(64) * 3) % 256
            ).astype(np.uint8)
    assert (decode_bmp(make_bmp(gray)) == gray).all()
    # odd width exercises row padding
    gray2 = gray[:, :61]
    assert (decode_bmp(make_bmp(gray2)) == gray2).all()

    t = np.arange(2048) / 16000.0
    s = 0.25 * np.sin(2 * np.pi * 440 * t)
    back, rate = decode_wav(make_wav(s, 16000))
    assert rate == 16000 and len(back) == 2048
    # 16-bit quantization: truncation + 32767/32768 scale => <=2 LSB
    np.testing.assert_allclose(back, s, atol=2.0 / 32768)

    with pytest.raises(NotImplementedError):
        from batch_geocode_ray.stages.multimodal import ImageFeatures
        ImageFeatures(decode="real")._decode_image(b"\x89PNG....", 8, 8)


def test_media_queries_real_decode():
    from batch_geocode_ray.pipelines.queries import (
        q24_image_features,
        q25_audio_frames,
    )

    img = q24_image_features("unused").take_all()
    assert len(img) == 64 and len(img[0]["features"]) == 16
    # histogram of the known gradient pattern: uniform-ish, sums to 1
    assert abs(sum(img[0]["features"]) - 1.0) < 1e-9
    aud = q25_audio_frames("unused").take_all()
    # frame energy of a 0.5-amplitude sine ~ 0.125
    assert all(abs(e - 0.125) < 0.01 for e in aud[0]["frame_energy"])


def test_fingerprint_dup_pairs_both_plans(monkeypatch):
    """Fingerprint-prefilter exact-dup pairs: equals the naive
    text-equality join, in both the collapsed and shuffle plans."""
    import batch_geocode_ray.stages.dedup as dd
    from batch_geocode_ray.stages.dedup import fingerprint_dup_pairs

    texts = ["same text here alpha beta gamma"] * 3 + [
        "other content entirely different words",
        "same text here alpha beta gamma delta",
        "other content entirely different words",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)
    want = sorted((i, j) for i in range(len(texts))
                  for j in range(i + 1, len(texts))
                  if texts[i] == texts[j])

    def run():
        return sorted((r["d1"], r["d2"]) for r in
                      fingerprint_dup_pairs(ds, "text", "doc_id").take_all())

    assert run() == want
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    assert run() == want


def test_video_frame_sample_plumbing():
    from batch_geocode_ray.stages.multimodal import VideoFrameSample

    rng = np.random.RandomState(8)
    n = 12
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "video": pa.array([rng.bytes(1024) for _ in range(n)], pa.binary()),
        "mime": pa.array(["video/mp4"] * n, pa.string()),
        "n_frames": pa.array([240] * n, pa.int64()),
        "fps": pa.array([24.0] * n, pa.float64()),
    })
    out = rd.from_arrow(t).map_batches(
        VideoFrameSample, batch_size=4, batch_format="pyarrow",
        concurrency=(1, 2), num_cpus=0.5).sort("media_id").take_all()
    assert len(out) == 12
    assert out[0]["frame_idx"] == [30, 90, 150, 210]  # uniform sampling
    assert "video" not in out[0]  # payload dropped
    # deterministic across runs
    out2 = rd.from_arrow(t).map_batches(
        VideoFrameSample, batch_size=4, batch_format="pyarrow",
        concurrency=(1, 2), num_cpus=0.5).sort("media_id").take_all()
    assert out[3]["frame_mean"] == out2[3]["frame_mean"]
    with pytest.raises(NotImplementedError):
        VideoFrameSample(decode="real")._decode_frame(b"x", 0)


# ---------------------------------------------------------------------------
# batch-boundary invariance (hypothesis): the bucketed pair emitters
# rely on groupby co-location, so the pair SET must not depend on how
# rows are split into input blocks.
# ---------------------------------------------------------------------------

def _boundary_corpus() -> pa.Table:
    """24 docs: 3 exact-dup groups, near-dups, and distinct fillers."""
    words = ("apple banana cherry date elder fig grape honey iris juniper "
             "kiwi lemon mango nectar olive peach").split()
    texts = []
    for i in range(24):
        if i % 8 == 0:
            texts.append(BASE)                       # exact dup group A
        elif i % 8 == 1:
            texts.append(BASE + " phi")              # near-dup of A
        elif i % 8 == 2:
            texts.append(" ".join(words))            # exact dup group B
        else:
            texts.append(" ".join(words[j % len(words)]
                                  for j in range(i, i + 12)))
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _pairs_with_splits(fn, splits: list[int]) -> set:
    t = _boundary_corpus()
    bounds = sorted({0, *splits, t.num_rows})
    blocks = [t.slice(a, b - a) for a, b in zip(bounds, bounds[1:])
              if b > a]
    ds = rd.from_arrow(blocks)
    return {(r["d1"], r["d2"]) for r in fn(ds).take_all()}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=23),
                    min_size=0, max_size=6))
    def test_minhash_pairs_invariant_to_block_boundaries(splits):
        fn = lambda ds: minhash_lsh_pairs(ds, "text", "doc_id",
                                          threshold=0.8, verify="trigram")
        assert _pairs_with_splits(fn, splits) == _pairs_with_splits(fn, [])

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=23),
                    min_size=0, max_size=6))
    def test_fingerprint_pairs_invariant_to_block_boundaries(splits):
        from batch_geocode_ray.stages.dedup import fingerprint_dup_pairs

        fn = lambda ds: fingerprint_dup_pairs(ds, "text", "doc_id")
        assert _pairs_with_splits(fn, splits) == _pairs_with_splits(fn, [])
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass


def test_window_ops_shuffle_plan_equals_collapsed(monkeypatch):
    """sessionize / grouped_moving_avg: the adaptive collapse is a
    physical-plan choice only — forcing the bucketed shuffle plan must
    give identical rows."""
    import batch_geocode_ray.stages.dedup as dd
    from batch_geocode_ray.stages.windows import (
        grouped_moving_avg,
        sessionize,
    )

    rng = np.random.RandomState(5)
    n = 400
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 20, n), pa.int64()),
        "ts": pa.array((1_600_000_000_000_000
                        + np.sort(rng.randint(0, 3_600_000_000 * 24, n))
                        ).astype("datetime64[us]")),
        "value": pa.array(rng.rand(n)),
    })
    ds = rd.from_arrow(t).repartition(5)

    def run():
        s = sorted(tuple(sorted(r.items())) for r in sessionize(
            ds, "user_id", "ts", "value", "event_id").take_all())
        m = sorted(tuple(sorted(r.items())) for r in grouped_moving_avg(
            ds, "user_id", "ts", "event_id", "value").take_all())
        return s, m

    collapsed = run()
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    shuffled = run()
    assert collapsed == shuffled
