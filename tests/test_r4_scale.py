"""Round-4 scale fixes: hot-gram governor in the n-gram Jaccard join
and size-probed coarse-bucket counts (VERDICT r3 "What's wrong" #1/#2).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

import batch_geocode_ray.stages.dedup as dd
from batch_geocode_ray.stages.dedup import (
    adaptive_bucket_count,
    ngram_jaccard_pairs,
)


# ---------------------------------------------------------------------------
# adaptive_bucket_count
# ---------------------------------------------------------------------------

def test_adaptive_bucket_count_grows_with_input():
    assert adaptive_bucket_count(0) == 1024            # floor
    assert adaptive_bucket_count(100 << 20) == 1024    # under floor*target
    # 100 TB at the default 32 MB/bucket target: ~3.3M buckets, so one
    # bucket stays ~one task's memory at any scale
    big = adaptive_bucket_count(100 << 40)
    assert big == (100 << 40) // dd.TARGET_BUCKET_BYTES + 1
    # monotone in input size
    sizes = [0, 1 << 30, 1 << 35, 1 << 40, 100 << 40]
    counts = [adaptive_bucket_count(s) for s in sizes]
    assert counts == sorted(counts)


def test_adaptive_bucket_count_wired_to_probed_size(monkeypatch):
    """The distributed n-gram plan derives its bucket count from the
    probed gram-table size (not a constant)."""
    seen = {}
    real = dd.adaptive_bucket_count

    def spy(size_bytes, *a, **kw):
        seen["size"] = size_bytes
        return real(size_bytes, *a, **kw)

    monkeypatch.setattr(dd, "adaptive_bucket_count", spy)
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    docs = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"a{i} b{i} c{i} d{i}" for i in range(20)]),
    })
    ngram_jaccard_pairs(rd.from_arrow(docs), "text", "doc_id",
                        k=3, threshold=0.8).materialize()
    assert seen["size"] > 0


# ---------------------------------------------------------------------------
# hot-gram governor
# ---------------------------------------------------------------------------

HOT = "hotA hotB hotC"  # one planted trigram shared by ~154 docs


def _hot_gram_docs() -> rd.Dataset:
    ids, texts = [], []
    for i in range(150):  # the hot clique: share ONLY the planted gram
        ids.append(i)
        texts.append(HOT + " " + " ".join(f"u{i}t{j}" for j in range(30)))
    # two hot near-dup pairs (identical texts, J=1.0): all their shared
    # grams except the planted one have posting length 2
    for base, tag in ((200, "X"), (202, "Y")):
        t = HOT + " " + " ".join(f"dup{tag}{j}" for j in range(20))
        ids += [base, base + 1]
        texts += [t, t]
    # one COLD near-dup pair: no planted gram -> pure counting path
    t = " ".join(f"coldZ{j}" for j in range(20))
    ids += [300, 301]
    texts += [t, t]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(6)


def _pairs_of(ds) -> dict:
    return {(r["d1"], r["d2"]): round(r["jaccard"], 9)
            for r in ds.take_all()}


def test_hot_gram_governor_output_exact(monkeypatch):
    """With the governor on (capped postings escalate to LSH+trigram
    verify), the distributed plan's output equals the ungoverned exact
    join — the planted 154-doc gram changes the PLAN, not the result."""
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    docs = _hot_gram_docs()
    governed = _pairs_of(ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.8, max_posting=32))
    exact = _pairs_of(ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.8, max_posting=None))
    assert exact == {(200, 201): 1.0, (202, 203): 1.0, (300, 301): 1.0}
    assert governed == exact


def test_hot_gram_capped_posting_emits_no_pairs(monkeypatch):
    """Sub-quadratic proof: stub the escalation path empty and the
    hot×hot pairs VANISH — i.e. the capped 154-doc posting emitted hot
    markers, not its ~11.7k quadratic pair rows, and hot×hot pairs were
    excluded from the counting path. Hot-doc detection is checked via
    the stub's input cardinality."""
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    seen = {}

    def stub(hot_docs, text_col, id_col, **kw):
        seen["n_hot_docs"] = hot_docs.count()
        return rd.from_arrow(pa.table({
            "d1": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))

    monkeypatch.setattr(dd, "minhash_lsh_pairs", stub)
    got = _pairs_of(ngram_jaccard_pairs(
        _hot_gram_docs(), "text", "doc_id", k=3, threshold=0.8,
        max_posting=32))
    # 150 clique docs + 4 hot near-dup docs are hot; 300/301 are not
    assert seen["n_hot_docs"] == 154
    assert got == {(300, 301): 1.0}  # cold pair survives via counting


# ---------------------------------------------------------------------------
# giant-component mitigation (hot-key salting in connected_components)
# ---------------------------------------------------------------------------

def test_cc_giant_component_bounded_bucket_segments(monkeypatch):
    """A star component whose hub owns ~6k request rows per round (far
    over the patched 64-row cap) still labels correctly, AND no bucket
    ever sees a per-key request segment above 4x the cap (hash-salted
    cells balance in expectation; 4x absorbs binomial spread). Without
    salting the hub's segment would hold the full ~6k rows — the
    wrapped propagate fn would raise inside the worker."""
    import batch_geocode_ray.stages.graph as gr

    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)  # force distributed
    monkeypatch.setattr(gr, "HOT_DETECT_MIN_BYTES", 0)
    cap = 64
    monkeypatch.setattr(gr, "HOT_REQ_CAP", cap)
    detected = {}
    real_hot = gr._hot_request_keys

    def spy_hot(reqs, c):
        out = real_hot(reqs, c)
        if out is not None:
            detected["rounds"] = detected.get("rounds", 0) + 1
        return out

    monkeypatch.setattr(gr, "_hot_request_keys", spy_hot)
    real_prop = gr._propagate_bucket

    def checked(g):
        key = np.asarray(g["key"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        q = np.asarray(g["q"].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        reqs = key[q >= 0]
        if len(reqs):
            _, c = np.unique(reqs, return_counts=True)
            assert c.max() <= 4 * cap, \
                f"hot segment leaked: {c.max()} requests for one key"
        return real_prop(g)

    monkeypatch.setattr(gr, "_propagate_bucket", checked)
    n = 3000  # hub 0 <- nodes 1..n, spanning many input blocks
    a = np.concatenate([np.zeros(n, np.int64), [7000]])
    b = np.concatenate([np.arange(1, n + 1, dtype=np.int64), [7001]])
    edges = rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
    })).repartition(8)
    labels = {r["node"]: r["label"]
              for r in gr.connected_components(edges, "a", "b").take_all()}
    assert detected.get("rounds", 0) >= 1  # the mitigation actually ran
    assert len(labels) == n + 3
    assert all(labels[i] == 0 for i in range(n + 1))
    assert labels[7000] == 7000 and labels[7001] == 7000


# ---------------------------------------------------------------------------
# substring-level exact dedup (stages/substring.py)
# ---------------------------------------------------------------------------

def _span_docs():
    """Planted shared spans: docs 0/1 share a 60-char span, docs
    2/3/4 share a 45-char boilerplate sentence (a 3-clique), doc 5 is
    unique, doc 6 is shorter than L, doc 7 is empty."""
    span = "the quick brown fox jumps over the lazy dog again and againX"
    boiler = "all rights reserved worldwide by the owner013"
    assert len(span) == 60 and len(boiler) == 45
    texts = [
        "prefix one " + span + " suffix alpha",
        "other lead-in " + span + " trailing text",
        boiler + " doc two unique tail section here",
        "doc three intro " + boiler + " and more",
        "doc four begins " + boiler,
        "totally unique content with no repeated spans at all in here ok",
        "short doc",
        "",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)


def test_duplicate_substring_pairs_planted(monkeypatch):
    from batch_geocode_ray.stages.substring import duplicate_substring_pairs

    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)  # distributed plan
    got = {(r["d1"], r["d2"]) for r in duplicate_substring_pairs(
        _span_docs(), "text", "doc_id", L=40).take_all()}
    assert got == {(0, 1), (2, 3), (2, 4), (3, 4)}


def test_duplicate_position_counts_planted(monkeypatch):
    from batch_geocode_ray.stages.substring import duplicate_position_counts

    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    got = {r["doc_id"]: r["n_dup_positions"]
           for r in duplicate_position_counts(
               _span_docs(), "text", "doc_id", L=40).take_all()}
    # span of length S contributes S - L + 1 = 21 in-span positions
    # (60-char span, L=40) PLUS the boundary grams: both docs have a
    # space before AND after the span, so " "+span[:39] and
    # span[21:]+" " are shared too -> 23 each. Boilerplate (45 chars):
    # 6 in-span; doc2 and doc3 share the trailing-space gram, doc3 and
    # doc4 share the leading-space gram.
    assert got == {0: 23, 1: 23, 2: 7, 3: 8, 4: 7}


def test_lgram_hashes_match_python_slices():
    """Rolling-hash stream agrees with literal string slicing: same
    distinct-gram count per doc and identical hash for identical grams
    across docs (the 2/3 shared span) on a multi-chunk column."""
    from batch_geocode_ray.stages.substring import _lgram_table

    t = pa.table({
        "doc_id": pa.array([2, 3], pa.int64()),
        "text": pa.array(["xy" * 30 + "SHARED-SPAN-" * 5,
                          "ab" * 17 + "SHARED-SPAN-" * 5], pa.string()),
    })
    out = _lgram_table(t, "text", "doc_id", 24)
    h2 = {r["h"] for r in out.filter(
        pc.equal(out["doc"], 2)).to_pylist()}
    h3 = {r["h"] for r in out.filter(
        pc.equal(out["doc"], 3)).to_pylist()}
    def grams(s, L=24):
        return {s[i:i + L] for i in range(len(s) - L + 1)}
    s2 = "xy" * 30 + "SHARED-SPAN-" * 5
    s3 = "ab" * 17 + "SHARED-SPAN-" * 5
    assert len(h2) == len(grams(s2)) and len(h3) == len(grams(s3))
    assert len(h2 & h3) == len(grams(s2) & grams(s3))


def test_duplicate_span_coverage_planted(monkeypatch):
    """Interval union: the 60-char span sits between spaces in both
    docs, so dup windows start at span_start-1 .. span_start+20 (23
    starts) and cover 23 - 1 + 40 = 62 chars; the boilerplate docs
    cover (starts + 39) chars of their 45..47-char dup regions."""
    from batch_geocode_ray.stages.substring import duplicate_span_coverage

    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    got = {r["doc_id"]: r["n_dup_chars"]
           for r in duplicate_span_coverage(
               _span_docs(), "text", "doc_id", L=40).take_all()}
    assert got == {0: 62, 1: 62, 2: 46, 3: 47, 4: 46}


def _naive_cut(L=40):
    """Single-process span-cut oracle over the planted fixture."""
    texts = [r["text"] for r in _span_docs().sort("doc_id").take_all()]
    gram_docs = {}
    for d, t in enumerate(texts):
        for i in range(len(t) - L + 1):
            gram_docs.setdefault(t[i:i + L], set()).add(d)
    out = {}
    for d, t in enumerate(texts):
        covered = set()
        for i in range(len(t) - L + 1):
            if len(gram_docs[t[i:i + L]]) >= 2:
                covered.update(range(i, i + L))
        out[d] = "".join(c for p, c in enumerate(t) if p not in covered)
    return out


def test_cut_duplicate_spans_planted(monkeypatch):
    """The span-cut TRANSFORM: every doc present, flagged docs lose
    exactly the q74-covered characters, clean docs pass through
    byte-identical — on both physical plans."""
    from batch_geocode_ray.stages.substring import (
        cut_duplicate_spans,
        duplicate_span_coverage,
    )

    want = _naive_cut()

    def run():
        return {r["doc_id"]: r["text_cut"]
                for r in cut_duplicate_spans(
                    _span_docs(), "text", "doc_id", L=40).take_all()}

    got = run()
    assert got == want
    # cut size == q74's coverage, doc by doc
    cov = {r["doc_id"]: r["n_dup_chars"]
           for r in duplicate_span_coverage(
               _span_docs(), "text", "doc_id", L=40).take_all()}
    texts = {r["doc_id"]: r["text"] for r in _span_docs().take_all()}
    for d, t in texts.items():
        assert len(t) - len(got[d]) == cov.get(d, 0)
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)  # distributed plan
    assert run() == want


def test_pca_project_matches_numpy():
    """Distributed partial-merge PCA equals single-process numpy PCA
    (covariance eigh) up to 1e-9, including the sign convention, over
    adversarial block boundaries."""
    from batch_geocode_ray.stages.similarity import pca_project

    rng = np.random.default_rng(5)
    base = rng.normal(size=(300, 6))
    base[:, 0] = base[:, 1] * 3 + rng.normal(size=300) * 0.1  # structure
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([r.tolist() for r in base],
                              pa.list_(pa.float32())),
    })).repartition(7)
    got = {r["vec_id"]: (r["pc1"], r["pc2"])
           for r in pca_project(ds, "embedding", "vec_id", k=2).take_all()}
    x = base.astype(np.float32).astype(np.float64)  # storage precision
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2]
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(2)] < 0
    comps = comps * np.where(flip, -1.0, 1.0)
    want = (x - mean) @ comps
    for i in range(300):
        assert abs(got[i][0] - want[i, 0]) < 1e-6
        assert abs(got[i][1] - want[i, 1]) < 1e-6


def test_size_hint_streaming_plan_same_result():
    """With a big size hint the exchange skips the probe/materialize
    entirely (fully streaming) and produces identical results."""
    from batch_geocode_ray.stages.substring import duplicate_position_counts

    docs = _span_docs()
    probed = {r["doc_id"]: r["n_dup_positions"]
              for r in duplicate_position_counts(
                  docs, "text", "doc_id", L=40).take_all()}
    streamed = {r["doc_id"]: r["n_dup_positions"]
                for r in duplicate_position_counts(
                    docs, "text", "doc_id", L=40,
                    size_hint_bytes=1 << 40).take_all()}
    assert streamed == probed


def test_ngram_hint_streaming_same_result():
    from batch_geocode_ray.stages.dedup import ngram_jaccard_pairs as njp

    docs = _hot_gram_docs()
    probed = _pairs_of(njp(docs, "text", "doc_id", k=3, threshold=0.8,
                           max_posting=32))
    streamed = _pairs_of(njp(docs, "text", "doc_id", k=3, threshold=0.8,
                             max_posting=32, size_hint_bytes=1 << 40))
    assert streamed == probed == {(200, 201): 1.0, (202, 203): 1.0,
                                  (300, 301): 1.0}


# ---------------------------------------------------------------------------
# bucket-exchange lookup join (the Dataset.join replacement)
# ---------------------------------------------------------------------------

def test_bucket_lookup_join_semantics(monkeypatch):
    """missing='null' attaches typed nulls; duplicate requests each get
    the payload; duplicate carriers are tolerated; missing='error'
    raises naming the absent key. Both the collapsed and the
    bucket-shuffle physical plans."""
    import pytest
    import ray

    from batch_geocode_ray.stages.dedup import _bucket_lookup_join

    src = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2], pa.int64()),     # duplicate carrier
        "v": pa.array(["a", "b", "b"], pa.string()),
    }))
    req = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 9], pa.int64()),     # dup requests + miss
        "x": pa.array([10, 20, 30], pa.int64()),
    })).repartition(3)

    def run():
        out = _bucket_lookup_join(req, "k", src, "k", {"v": "v"},
                                  missing="null").take_all()
        return sorted((r["k"], r["x"], r["v"]) for r in out)

    want = [(2, 10, "b"), (2, 20, "b"), (9, 30, None)]
    assert run() == want
    monkeypatch.setattr(dd, "SMALL_COLLAPSE_BYTES", 0)
    assert run() == want
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="no source row"):
        _bucket_lookup_join(req, "k", src, "k", {"v": "v"},
                            missing="error").take_all()


def test_cut_duplicate_spans_utf8_mid_codepoint():
    """A duplicated BYTE window may start at a UTF-8 continuation byte
    (review finding, round 5): 'é'+S vs '©'+S share the 40-byte run
    '\\xa9'+S starting at each char's SECOND byte. The cut must snap
    outward to codepoint boundaries and re-decode cleanly instead of
    raising UnicodeDecodeError."""
    from batch_geocode_ray.stages.substring import cut_duplicate_spans

    s_run = "S" * 39
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["left pad one é" + s_run + " tail one",
                          "other padding ©" + s_run + " tail two"],
                         pa.string()),
    }))
    got = {r["doc_id"]: r["text_cut"]
           for r in cut_duplicate_spans(docs, "text", "doc_id",
                                        L=40).take_all()}
    # both docs present, outputs are valid strings, the shared run is
    # gone, and the partially covered char was removed whole
    assert set(got) == {1, 2}
    for d, t in got.items():
        assert s_run not in t
        assert "é" not in t and "©" not in t
    assert got[1].startswith("left pad one") and got[1].endswith("one")
    assert got[2].startswith("other padding") and got[2].endswith("two")
