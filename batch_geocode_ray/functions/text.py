"""Text kernels: HTML→text extraction and text-analysis functions.

``extract_text`` is the engine's per-row invariant (driver BASELINE.json
``input_hint``): the distributed pipeline's extracted ``text`` must be
byte-identical per ``url`` to a single-process oracle. To guarantee
that, extraction is defined by ONE set of regex rules implemented twice
with identical semantics:

  * :func:`extract_text_column` — Arrow-vectorized (pyarrow.compute RE2
    kernels) for the hot path inside ``map_batches``;
  * :func:`extract_text_py` — plain-Python `re` for the oracle /
    fixture generator.

The rules deliberately stay inside the (documented) intersection of RE2
and Python `re` semantics: no lookahead, explicit ASCII whitespace
classes (RE2's ``\\s`` is ASCII-only while Python's is Unicode — we use
``[ \\t\\n\\r\\f\\v]`` everywhere), fixed entity table, utf-8 only.

The reference has no HTML handling (it reads CSVs of addresses —
utilities.py:170-197); extraction is new surface implied by the
``html: binary`` input column, SURVEY §2.2 M13.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"[ \t\n\r\f\v]"

# (pattern, replacement) applied in order; all patterns are RE2-safe.
# ONE alternation pass (script | style | comment | any tag, leftmost
# match, first alternative wins at equal start) instead of four
# sequential passes: each full-column regex pass re-materializes every
# string, so fewer passes = less memory traffic (6.3 -> 3.9 us/page
# single-threaded). On well-formed markup the result is identical to
# the sequential rules; on pathologically interleaved blocks
# ("<style>x<script>y</style>z</script>") the leftmost-block rule
# applies — the spec is this single pass, implemented identically in
# the oracle and the Arrow kernel (byte-parity is THE invariant).
_EXTRACT_RULES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
     r"|<!--.*?-->|<[^>]*>", " "),
]
# Fixed entity table (generator emits only these; numeric entities are out
# of scope — documented limitation, not silently wrong output).
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so "&amp;lt;" decodes to "&lt;" not "<"
]
_WS_RUN = re.compile(_WS + "+")
_EXTRACT_RULES_C = [(re.compile(p), r) for p, r in _EXTRACT_RULES]


def extract_text_py(html: bytes | str) -> str:
    """Single-process oracle extraction. utf-8 decode (errors=replace is
    deterministic), strip script/style/comments/tags, decode the fixed
    entity set, collapse ASCII whitespace runs to single spaces, strip.
    """
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    for pat, rep in _EXTRACT_RULES_C:
        s = pat.sub(rep, s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    # strip ONLY the explicit ASCII set: bare .strip() is Unicode-aware
    # (it would eat \x1c-\x1f etc.) and silently diverges from the
    # RE2/utf8_trim path — found by hypothesis, pinned here.
    return _WS_RUN.sub(" ", s).strip(" \t\n\r\f\v")


def extract_text_column(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Arrow-vectorized extraction over a binary column — same rules as
    :func:`extract_text_py`, executed by RE2 kernels over the whole
    column (no per-row Python).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    try:
        col = html_col.cast(pa.string())  # fast path: valid utf-8
    except pa.lib.ArrowInvalid:
        # rare path: invalid utf-8 somewhere in the batch — match the
        # oracle's errors="replace" semantics row-wise
        col = pa.array(
            [None if b is None else b.decode("utf-8", errors="replace")
             for b in html_col.to_pylist()],
            type=pa.string(),
        )
    for pat, rep in _EXTRACT_RULES:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
    for ent, ch in _ENTITIES:
        col = pc.replace_substring(col, pattern=ent, replacement=ch)
    # whitespace-run collapse + trim as trim -> ascii-ws split -> join:
    # provably equal to the regex sub + strip (runs act as one
    # separator, boundary runs vanish) at ~2.5 vs 5.6 us/page — the
    # single hottest pass in the extraction chain
    return pc.binary_join(
        pc.ascii_split_whitespace(
            pc.utf8_trim(col, characters=" \t\n\r\f\v")), " ")


# ---------------------------------------------------------------------------
# Text analysis (SURVEY mandate: langid, quality, token counts, fingerprint)
# ---------------------------------------------------------------------------

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic tie-break: alphabetical; no hits -> 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "y", "los"),
    "fr": ("le", "la", "les", "et", "des"),
}
STOPWORDS = ("the", "a", "of", "and", "to")

_TOKEN_RE = r"[a-z0-9]+"
# BPE-ish subword splitter: letter runs, digit runs, single punctuation.
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f\v]"


def tokens_column(text_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased word tokens ([a-z0-9]+ runs) per document as a
    list<string> column. NOTE: a document with no tokens yields a
    1-element list containing "" (an artifact of split); every consumer
    below masks empty tokens out via :func:`_flat_tokens`.
    """
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    normalized = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text_col), pattern="[^a-z0-9]+", replacement=" "),
        characters=" ",
    )
    return pc.split_pattern(normalized, pattern=" ")


def _flat_tokens(tokens: pa.Array):
    """(flat_token_array, parent_row_indices) with empty tokens removed."""
    flat = tokens.flatten()
    parents = np.asarray(tokens.value_parent_indices())
    nonempty = np.asarray(pc.utf8_length(flat)) > 0
    return flat.filter(pa.array(nonempty)), parents[nonempty]


def token_count_column(text_col) -> np.ndarray:
    """Number of word tokens per document (vectorized)."""
    toks = tokens_column(text_col)
    _, parents = _flat_tokens(toks)
    out = np.zeros(len(toks), dtype=np.int64)
    np.add.at(out, parents, 1)
    return out


def bpe_token_count_column(text_col) -> pa.Array:
    """Count of BPE-ish subword tokens per document."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    return pc.count_substring_regex(pc.utf8_lower(text_col), pattern=_BPE_RE).cast(pa.int64())


def _marker_hits(tokens: pa.Array, markers: tuple[str, ...]) -> np.ndarray:
    """Per-document count of tokens that are in ``markers`` — segmented
    numpy over the flattened list column (no Python loop over rows).
    """
    flat, parents = _flat_tokens(tokens)
    hit = np.asarray(pc.is_in(flat, value_set=pa.array(list(markers))).fill_null(False))
    out = np.zeros(len(tokens), dtype=np.int64)
    np.add.at(out, parents[hit], 1)
    return out


def langid_table(text_col, langs: dict[str, tuple[str, ...]] | None = None) -> dict[str, np.ndarray]:
    """Language-ID by marker-stopword counts. Returns dict with
    ``pred_lang`` (string array) and per-language hit counts
    ``hits_{lang}``. Argmax with alphabetical tie-break; all-zero ->
    'und'.
    """
    langs = langs or LANG_MARKERS
    toks = tokens_column(text_col)
    names = sorted(langs)  # alphabetical => tie-break = first max
    counts = np.stack([_marker_hits(toks, langs[n]) for n in names])  # (L, n)
    best = np.argmax(counts, axis=0)  # first max wins
    total = counts.max(axis=0)
    pred = np.where(total > 0, np.array(names, dtype=object)[best], "und")
    out = {"pred_lang": pred}
    for i, n in enumerate(names):
        out[f"hits_{n}"] = counts[i]
    return out


def quality_table(text_col) -> dict[str, np.ndarray]:
    """Quality-scoring features: token count, average token length,
    stopword ratio, alpha-character ratio. All vectorized.
    """
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = tokens_column(text_col)
    flat, parents = _flat_tokens(toks)
    n_tok = np.zeros(len(toks), dtype=np.int64)
    np.add.at(n_tok, parents, 1)
    tok_lens = np.asarray(pc.utf8_length(flat).cast(pa.int64()))
    sum_len = np.zeros(len(toks), dtype=np.int64)
    np.add.at(sum_len, parents, tok_lens)
    stop_hits = _marker_hits(toks, STOPWORDS)
    n_chars = np.asarray(pc.utf8_length(text_col).cast(pa.int64()))
    alpha = np.asarray(pc.count_substring_regex(pc.utf8_lower(text_col), pattern="[a-z]"))
    with np.errstate(invalid="ignore", divide="ignore"):
        return {
            "n_tokens": n_tok,
            "avg_token_len": np.where(n_tok > 0, sum_len / np.maximum(n_tok, 1), 0.0),
            "stopword_ratio": np.where(n_tok > 0, stop_hits / np.maximum(n_tok, 1), 0.0),
            "alpha_ratio": np.where(n_chars > 0, alpha / np.maximum(n_chars, 1), 0.0),
        }


def fingerprint_column(text_col, k: int = 3) -> np.ndarray:
    """Document fingerprint: minimum of the Rabin-Karp rolling hashes of
    all k-token windows (a 1-value winnowing sketch). Documents sharing
    any k-gram region often collide -> cheap near-dup prefilter. Returns
    uint64; empty/short docs fingerprint to the hash of their full token
    tuple.
    """
    from batch_geocode_ray.functions.hashing import stable_hash64_array

    toks = tokens_column(text_col)
    flat, parents = _flat_tokens(toks)
    flat_hashes = stable_hash64_array(flat)
    counts = np.zeros(len(toks), dtype=np.int64)
    np.add.at(counts, parents, 1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    B = np.uint64(1099511628211)
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(len(toks)):  # windows vectorized inside each doc
            h = flat_hashes[offsets[i]:offsets[i + 1]]
            if len(h) == 0:
                out[i] = np.uint64(0)
                continue
            n = max(len(h) - k + 1, 1)
            kk = min(k, len(h))
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(kk):
                acc = acc * B + h[j:j + n]
            out[i] = acc.min()
    return out
