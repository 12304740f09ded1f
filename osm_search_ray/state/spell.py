"""Spell corrector + autocomplete — reference semantics without the FST
(/root/reference/pkg/searcher/spell_corrector.go; T4 in SURVEY.md).

The reference builds a vellum FST over the sorted vocabulary and queries it
with Levenshtein DFAs (edit distance 1 and 2) and prefix regexes.  Engine
equivalent (per-actor state, loaded once in ``__init__`` of search actors):
a SORTED vocabulary array; prefix matches via bisect; edit-distance
candidates via a banded Levenshtein DP over length-filtered vocabulary —
same result set as the DFA (all terms within distance <= d), in the same
lexicographic order the FST iterates.

Reference quirks kept:
  * distance-1 candidates then distance-2 candidates are CONCATENATED
    (searcher.go:167-186) — since DFA(d=2) ⊇ DFA(d=1), candidates repeat;
    kept because duplicate order feeds the cross-product tie-break.
  * cross-product of per-term candidate sets is exhaustive and unbounded
    (spell_corrector.go:122-137); we cap it at ``MAX_CANDIDATES`` products
    (deterministic prefix of the same enumeration order) to bound adversarial
    queries — a documented deviation (SURVEY.md §7.4).
  * best candidate = FIRST maximum of the LM log-probability (strict >,
    spell_corrector.go:139-155).
  * autocomplete: last term treated as prefix, candidates ranked by LM,
    top 3 (spell_corrector.go:202-227).
"""

from __future__ import annotations

from bisect import bisect_left
from dataclasses import dataclass
from itertools import islice, product

import numpy as np

from .lm import NGramLM

EDIT_DISTANCE = 2
MAX_CANDIDATES = 10_000


def delete_variants(word: str, max_d: int) -> set[str]:
    """All strings obtainable from ``word`` by deleting up to ``max_d``
    characters (the word itself included)."""
    out = {word}
    frontier = {word}
    for _ in range(max_d):
        nxt: set[str] = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_candidates(word: str, vocab_sorted: list[str], max_d: int) -> list[str]:
    """All vocabulary terms with Levenshtein distance <= max_d, in
    lexicographic (FST-iteration) order. Banded DP, length-filtered."""
    out = []
    wl = len(word)
    for term in vocab_sorted:
        if abs(len(term) - wl) > max_d:
            continue
        if _lev_leq(word, term, max_d):
            out.append(term)
    return out


def _lev_leq(a: str, b: str, k: int) -> bool:
    """Levenshtein(a, b) <= k via banded DP (O(len·k))."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        row_min = cur[0] if lo == 1 else k + 1
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1 if j - 1 >= lo - 1 else k + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            row_min = min(row_min, cur[j])
        if hi < lb:
            cur[hi + 1 :] = [k + 1] * (lb - hi)
        if row_min > k:
            return False
        prev = cur
    return prev[lb] <= k


@dataclass
class SpellCorrector:
    vocab_sorted: list[str]
    lm: NGramLM
    by_len: dict[int, list[str]] | None = None  # length buckets (built lazily)
    vocab_set: set[str] | None = None
    deletes: dict[str, list[int]] | None = None  # SymSpell deletes index

    @staticmethod
    def build(vocab: set[str] | None, lm: NGramLM, use_deletes_index: bool = True) -> "SpellCorrector":
        """``vocab`` is the FULL term dictionary (index vocabulary — the
        reference builds its FST over all corpus terms). Defaults to the
        LM's full_vocab. The LM's thresholded vocab only drives <UNK>.

        ``use_deletes_index`` builds the SymSpell deletes index (below) at
        construction — sub-linear candidate lookups thereafter. Pass False
        to keep the O(length-bucket) scan (tiny vocabularies, or when the
        ~len²·|V| index memory isn't worth it)."""
        v = vocab if vocab else (lm.full_vocab or lm.vocab)
        sc = SpellCorrector(vocab_sorted=sorted(v), lm=lm)
        sc._build_len_buckets()
        if use_deletes_index:
            sc._build_deletes_index()
        return sc

    def _build_len_buckets(self) -> None:
        buckets: dict[int, list[str]] = {}
        for t in self.vocab_sorted:  # already lexicographic within buckets
            buckets.setdefault(len(t), []).append(t)
        self.by_len = buckets
        self.vocab_set = set(self.vocab_sorted)

    def _build_deletes_index(self) -> None:
        """SymSpell deletes index (VERDICT r02 missing item 1 — the
        sub-linear replacement for the reference's Levenshtein-DFA-over-FST,
        spell_corrector.go:93-120): delete-variant → vocab indices. The
        guarantee: lev(a, b) <= d implies del<=d(a) ∩ del<=d(b) ≠ ∅, so a
        lookup of the query's own deletes reaches every true candidate;
        exactness is restored by the banded-DP verify in word_candidates.
        Per-term cost ~1+L+L²/2 variants; the index is one in-RAM dict —
        at 10⁷⁺ web-corpus vocab build it distributed instead (the index
        IS a groupby of (variant, term_id) rows) and shard it across
        serving actors."""
        idx: dict[str, list[int]] = {}
        for i, term in enumerate(self.vocab_sorted):
            for v in delete_variants(term, EDIT_DISTANCE):
                idx.setdefault(v, []).append(i)  # i ascending → lexicographic
        self.deletes = idx

    def word_candidates(self, word: str, d: int) -> list[str]:
        """Candidates within edit distance d, lexicographic order —
        identical result set to a full-vocab scan (equality-tested).
        With the deletes index: O(len(word)^d) hash lookups + verify of the
        (small) union — sub-linear in vocab. Without: length-bucketed scan
        (VERDICT r01 item 4), O(|length bucket|) per token."""
        if self.deletes is not None:
            cand_idx: set[int] = set()
            for v in delete_variants(word, d):
                hits = self.deletes.get(v)
                if hits:
                    cand_idx.update(hits)
            wl = len(word)
            out = []
            for i in sorted(cand_idx):  # vocab_sorted order == lexicographic
                term = self.vocab_sorted[i]
                if abs(len(term) - wl) <= d and _lev_leq(word, term, d):
                    out.append(term)
            return out
        if self.by_len is None:
            self._build_len_buckets()
        wl = len(word)
        out: list[str] = []
        for length in range(max(1, wl - d), wl + d + 1):
            for term in self.by_len.get(length, ()):
                if _lev_leq(word, term, d):
                    out.append(term)
        out.sort()  # merge per-length runs back to FST iteration order
        return out

    def prefix_matches(self, prefix: str) -> list[str]:
        i = bisect_left(self.vocab_sorted, prefix)
        out = []
        while i < len(self.vocab_sorted) and self.vocab_sorted[i].startswith(prefix):
            out.append(self.vocab_sorted[i])
            i += 1
        return out

    def correct_query(self, tokens: list[str]) -> list[str]:
        """FreeFormQuery's correction flow (searcher.go:150-199)."""
        if self.vocab_set is None:
            self._build_len_buckets()
        vocab = self.vocab_set
        per_term: list[list[str]] = []
        any_oov = False
        for t in tokens:
            if t in vocab:
                per_term.append([t])
            else:
                any_oov = True
                c1 = self.word_candidates(t, 1)
                c2 = self.word_candidates(t, 2)
                cands = c1 + c2  # concatenated, duplicates kept (reference)
                per_term.append(cands if cands else [t])
        if not any_oov or not tokens:
            return tokens
        best, best_p = None, -np.inf
        for cand in islice(product(*per_term), MAX_CANDIDATES):
            p = self.lm.query_log_prob(list(cand))
            # strict >: FIRST max wins (spell_corrector.go:147-151). When
            # EVERY candidate is -inf (all below the LM count threshold),
            # the reference indexes candidates[-1] and panics
            # (spell_corrector.go:153) — we keep the first candidate
            # instead, the natural "first max" extension (documented
            # deviation, SURVEY.md §7.4).
            if p > best_p or best is None:
                best_p, best = p, cand
        return list(best) if best is not None else tokens

    def autocomplete(self, tokens: list[str], top_n: int = 3) -> list[list[str]]:
        """Last token is a prefix; earlier tokens pass through; candidates
        ranked by LM log-prob desc (stable), top 3."""
        if not tokens:
            return []
        matches = self.prefix_matches(tokens[-1])
        if not matches:
            return []
        cands = [tokens[:-1] + [m] for m in matches]
        probs = [self.lm.query_log_prob(c) for c in cands]
        order = sorted(range(len(cands)), key=lambda i: -probs[i])  # stable for ties
        return [cands[i] for i in order[:top_n]]
