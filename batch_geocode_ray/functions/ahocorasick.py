"""Token-level Aho-Corasick automaton, from scratch.

The gazetteer matcher's engine (SURVEY §2.4): phrases are sequences of
normalized word tokens, the automaton alphabet is token strings, so
"word boundary" semantics come for free from tokenization (matching a
phrase means matching its exact token sequence — equivalent to the SQL
oracle's ``\\bname\\b`` over single-space text).

Pure Python build (once per actor, amortized over every batch the actor
processes) with dict transitions and BFS failure links; streaming a
document costs O(tokens + matches).
"""

from __future__ import annotations

from collections import deque


class TokenAhoCorasick:
    """Multi-phrase matcher over token sequences.

    phrases: list of token tuples, payloads: one int payload per phrase
    (e.g. gazetteer_id). Duplicate phrases are allowed (different
    payloads, e.g. the same place name in two provider gazetteers) —
    every payload is emitted at each occurrence.
    """

    def __init__(self, phrases: list[tuple[str, ...]], payloads: list[int]):
        if len(phrases) != len(payloads):
            raise ValueError("phrases and payloads must align")
        # goto[state] : dict token -> next state; out[state]: [(payload, length)]
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[tuple[int, int]]] = [[]]
        for phrase, payload in zip(phrases, payloads):
            if not phrase:
                continue
            s = 0
            for tok in phrase:
                nxt = self.goto[s].get(tok)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][tok] = nxt
                    self.goto.append({})
                    self.out.append([])
                s = nxt
            self.out[s].append((payload, len(phrase)))

        # BFS failure links; merge fail-state outputs so emissions at a
        # state include every suffix phrase ending there.
        self.fail = [0] * len(self.goto)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for tok, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and tok not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(tok, 0)
                self.out[t] = self.out[t] + self.out[self.fail[t]]

    def find_all(self, tokens: list[str]) -> list[tuple[int, int, int]]:
        """All matches in one token sequence.

        Returns (start_token_idx, end_token_idx_exclusive, payload)
        tuples, in scan order; overlapping and nested matches all emit.
        """
        goto, fail, out = self.goto, self.fail, self.out
        res: list[tuple[int, int, int]] = []
        s = 0
        for i, tok in enumerate(tokens):
            while s and tok not in goto[s]:
                s = fail[s]
            s = goto[s].get(tok, 0)
            if out[s]:
                for payload, length in out[s]:
                    res.append((i + 1 - length, i + 1, payload))
        return res
