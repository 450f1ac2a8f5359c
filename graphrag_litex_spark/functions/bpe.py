"""Byte-level BPE: deterministic merge-table training + encoding.

Closes the documented divergence in operators/chunking.py (the reference
chunks by tiktoken cl100k_base token windows, extraction/text_chunker.py:64;
tiktoken and its merge table are not shipped in this environment): instead
of stopping at PRETOKEN granularity, this module trains a real merge table
on the corpus itself and encodes text to merged subword tokens, so window
math runs in true BPE-token units.

Same construction as GPT-2/tiktoken BPE (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"):

* text is pretokenized with the GPT-2 pretokenizer regex (tokens carry
  their leading whitespace — operators/text_analysis.BPE_PRETOKEN_RE);
* each pretoken is a byte sequence; merges operate on adjacent byte-level
  symbol pairs WITHIN a pretoken, never across pretokens;
* training greedily merges the most frequent adjacent pair, count-weighted
  by word frequency, ``n_merges`` times. Ties break deterministically
  (lexicographically smallest pair), so two trainings on the same word
  counts produce byte-identical tables;
* encoding applies merges in rank order (the classic ``bpe(token)`` loop).

Byte tokens are carried in ``str`` columns via latin-1, which maps bytes
0-255 <-> codepoints U+0000-U+00FF bijectively: ``"".join(tokens)
.encode("latin-1")`` reconstructs the pretoken's exact UTF-8 bytes, so
encoding is lossless by construction (asserted in tests).

Everything here is pure Python on BOUNDED data: training consumes a word-
count table (distinct pretokens, not the corpus — see operators/bpe_ops.py
for the distributed counting + top-V valve) exactly as production tokenizer
trainers do.
"""

from __future__ import annotations

from functools import lru_cache

# (pair -> rank) tables are tiny (n_merges entries); encode caches per
# pretoken, so repeated words cost one dict lookup after the first.


def train_bpe(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Train a merge table from (pretoken, count) rows.

    Returns up to ``n_merges`` merges as latin-1 string pairs, in rank
    order. Incremental pair-count maintenance: each merge only re-examines
    the words that contain the merged pair, so training a few hundred
    merges over a 100k-row vocabulary is sub-second.
    """
    # word id -> (symbol tuple, count); symbols are latin-1 strings.
    words: list[tuple[list[str], int]] = []
    for tok, cnt in word_counts:
        b = tok.encode("utf-8")
        if len(b) < 2 or cnt <= 0:
            continue
        words.append(([bytes([c]).decode("latin-1") for c in b], int(cnt)))

    # pair -> total count; pair -> set of word ids containing it.
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, cnt) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            pair_words.setdefault((a, b), set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, ties -> lexicographically smallest pair (determinism).
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for wid in list(pair_words.get(best, ())):
            syms, cnt = words[wid]
            # retract this word's pair contributions, rewrite, re-add.
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        del pair_words[p]
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[wid] = (new, cnt)
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + cnt
                pair_words.setdefault(p, set()).add(wid)
    return merges


def make_encoder(merges: list[tuple[str, str]]):
    """merges -> cached ``pretoken str -> tuple[str, ...]`` byte-token
    encoder (the classic rank-ordered merge loop)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @lru_cache(maxsize=65536)
    def encode_word(tok: str) -> tuple[str, ...]:
        syms = [bytes([c]).decode("latin-1") for c in tok.encode("utf-8")]
        if len(syms) < 2:
            return tuple(syms)
        while True:
            best_rank = None
            best_i = -1
            for i, p in enumerate(zip(syms, syms[1:])):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                return tuple(syms)
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]

    return encode_word


def encode_text(
    text: str, encode_word, pretokenize
) -> list[str]:
    """text -> flat merged byte-token list (latin-1 strings). Lossless:
    ``"".join(result).encode("latin-1") == text.encode("utf-8")``."""
    out: list[str] = []
    for tok in pretokenize(text or ""):
        out.extend(encode_word(tok))
    return out
