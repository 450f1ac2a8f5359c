"""String normalization + similarity primitives (pure Python, Spark-free).

Reimplements the reference's entity-name normalization so entity identity is
reproducible (reference: /root/reference/extraction/entity_resolver.py:14-20):

    NFKD -> ASCII-fold -> lower -> non-alphanumeric runs -> single space -> strip

These pure functions are shared by:
  * the single-process oracle pipeline (graphrag_litex_spark.oracle), and
  * the Arrow-batched pandas UDFs in operators/ (same bytes in, same bytes out),
so the distributed run can be differentially tested against the oracle.

Char-3-gram Jaccard similarity replaces the reference's MiniLM cosine
(entity_resolver.py:42) as the deterministic, dependency-free scoring
function for entity linking; the 0.85-cosine threshold
(entity_resolver.py:10-12) maps to SIM_THRESHOLD here. Unlike the
reference's greedy order-dependent scan (entity_resolver.py:25-56), linking
is blocking + scoring + connected components (order-independent) — see
SURVEY.md §2 rows D6/E3.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

# Similarity threshold for entity linking (analog of the reference's
# cosine > 0.85 at entity_resolver.py:10-12, re-calibrated for char-3-gram
# Jaccard so that suffix expansions like "acme corp" ~ "acme corporation"
# (0.50) and "hooli inc" ~ "hooli incorporated" (0.44) link while distinct
# same-block names like "acme corp" ~ "acme labs" (0.27) do not).
SIM_THRESHOLD = 0.40

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def normalize_name(name: str) -> str:
    """NFKD -> ASCII -> lower -> non-alnum runs -> single space -> strip.

    Mirrors /root/reference/extraction/entity_resolver.py:14-20 exactly.
    """
    if name is None:
        return ""
    s = unicodedata.normalize("NFKD", name)
    s = s.encode("ascii", "ignore").decode("ascii")
    s = s.lower()
    s = _NON_ALNUM.sub(" ", s)
    return s.strip()


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Set of character n-grams of ``s`` (the whole string if len < n)."""
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def name_similarity(a: str, b: str) -> float:
    """Char-3-gram Jaccard over normalized names (deterministic)."""
    return jaccard(char_ngrams(a), char_ngrams(b))


def blocking_key(norm_name: str) -> str:
    """Blocking key for entity-linking candidate generation: first token.

    Candidate pairs are generated only within a block (SURVEY.md D6); the
    datagen vocabulary guarantees distinct canonical entities in different
    blocks, and variants (case/diacritic/suffix-expansion) share the block.
    """
    return norm_name.split(" ", 1)[0] if norm_name else ""


def entity_id(canonical_name: str) -> str:
    """Deterministic entity id = sha256 of the canonical normalized name.

    Replaces the reference's uuid4 ids (/root/reference/models/entity.py:24)
    for reproducibility/resumability (SURVEY.md §4 determinism note).
    """
    return hashlib.sha256(canonical_name.encode("utf-8")).hexdigest()[:32]


def hash_embed(text: str, dim: int = 64) -> list[float]:
    """Deterministic hashing featurizer: token -> (bucket, sign) -> l2-norm.

    Sandbox stand-in for the reference's MiniLM sentence embeddings
    (/root/reference/utils/llm_client.py:38-46); same signature
    text -> fixed-dim float vector, pluggable behind the same interface.
    """
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        idx = h % dim
        sign = 1.0 if (h >> 16) & 1 else -1.0
        vec[idx] += sign
    norm = sum(v * v for v in vec) ** 0.5
    if norm > 0:
        vec = [v / norm for v in vec]
    return vec


def prefix_ngram_embed(
    text: str, dim: int = 64, n: int = 3, decay: float = 0.7
) -> list[float]:
    """Deterministic SEMANTIC-ish name embedder for the C7 linking slot:
    per-token boundary-padded char n-grams, position-decayed (early grams
    weigh more), hashed into ``dim`` buckets; token vectors l2-normalized
    then averaged. The decay makes a token and its suffix EXPANSION share
    most of their mass ("corp" ~ "corporation" cosine ≈ 0.9), so at the
    reference resolver's 0.85 threshold this embedder reproduces the fuzzy
    suffix-expansion linking MiniLM gives the reference
    (/root/reference/extraction/entity_resolver.py:32-42) — unlike the
    token-hash featurizer, whose cosine is pure token overlap. Different
    tokens still embed near-orthogonally ("acme corp" vs "acme labs"
    ≈ 0.5), keeping precision.
    """
    import hashlib as _hl

    toks = (text or "").lower().split()
    if not toks:
        return [0.0] * dim
    acc = [0.0] * dim
    for tok in toks:
        padded = f"^{tok}$"
        grams = [padded[i : i + n] for i in range(max(len(padded) - n + 1, 1))]
        tv = [0.0] * dim
        w = 1.0
        for g in grams:
            h = int.from_bytes(_hl.md5(g.encode("utf-8")).digest()[:8], "big")
            sign = 1.0 if (h >> 16) & 1 else -1.0
            tv[h % dim] += sign * w
            w *= decay
        norm = sum(v * v for v in tv) ** 0.5
        if norm > 0:
            for i in range(dim):
                acc[i] += tv[i] / norm
    norm = sum(v * v for v in acc) ** 0.5
    return [v / norm for v in acc] if norm > 0 else acc
