"""Aho-Corasick vs a naive scan (SURVEY §5.1)."""

import numpy as np

from batch_geocode_ray.functions.ahocorasick import TokenAhoCorasick


def naive_find_all(tokens, phrases):
    out = []
    for i in range(len(tokens)):
        for pid, ph in enumerate(phrases):
            if tokens[i:i + len(ph)] == list(ph):
                out.append((i, i + len(ph), pid))
    return sorted(out, key=lambda t: (t[1], t[0], t[2]))


def test_simple_overlap_and_nesting():
    phrases = [("a", "b"), ("b", "c"), ("a", "b", "c"), ("b",)]
    ac = TokenAhoCorasick(phrases, list(range(len(phrases))))
    toks = ["a", "b", "c", "b"]
    got = sorted(ac.find_all(toks), key=lambda t: (t[1], t[0], t[2]))
    assert got == naive_find_all(toks, phrases)
    # all four phrases matched somewhere
    assert {p for _, _, p in got} == {0, 1, 2, 3}


def test_duplicate_phrases_emit_both_payloads():
    ac = TokenAhoCorasick([("x", "y"), ("x", "y")], [10, 20])
    got = {p for _, _, p in ac.find_all(["x", "y"])}
    assert got == {10, 20}


def test_randomized_vs_naive():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(25):
        n_ph = rng.randint(1, 8)
        phrases = [
            tuple(vocab[j] for j in rng.randint(0, len(vocab), size=rng.randint(1, 4)))
            for _ in range(n_ph)
        ]
        toks = [vocab[j] for j in rng.randint(0, len(vocab), size=60)]
        ac = TokenAhoCorasick(phrases, list(range(len(phrases))))
        got = sorted(ac.find_all(toks), key=lambda t: (t[1], t[0], t[2]))
        # naive emits duplicates when the same phrase tuple repeats; AC
        # builds one trie path but appends both payloads -> same multiset
        assert got == naive_find_all(toks, phrases)


def test_empty_inputs():
    ac = TokenAhoCorasick([("a",)], [0])
    assert ac.find_all([]) == []
    ac2 = TokenAhoCorasick([], [])
    assert ac2.find_all(["a", "b"]) == []
