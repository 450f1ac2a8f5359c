"""Deterministic synthetic transcript corpus (BASELINE.json ``input_hint``).

Generates the pipeline's input table
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` per FIXTURES.md §1, with no external data:

* per-conversation seeded RNG => generation is order-free and reproducible
  (same corpus regardless of generation parallelism),
* Zipf-skewed conversation sizes and Zipf-skewed entity picks so a few "hot"
  entities appear in >10% of turns (exercises salted aggregation / AQE
  skew handling, SURVEY.md §4),
* entity surface forms include case / hyphen / diacritic / suffix-expansion
  variants of the same canonical entity (exercises normalization H2 +
  linking D6 + connected components E3),
* rows are written globally SHUFFLED so tests must prove stable
  (conv_id, turn_idx) reassembly (FIXTURES.md §1 invariant),
* text is composed only of lowercase filler plus Title-Case entity mentions,
  so the deterministic extractor (functions/extract.py) has well-defined
  golden output.

The reference analog of this corpus is the news-article document set at
/root/reference/data/documents/ (one conversation == one document,
graphrag_lite_x.py:130-148).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 5
GLOBAL_SEED = 42

ORGS = [
    "Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Corp",
    "Stark Industries", "Wayne Enterprises", "Hooli Inc", "Vandelay Industries",
    "Cyberdyne Systems", "Tyrell Corp", "Wonka Industries", "Gringotts Bank",
    "Oscorp Inc", "Massive Dynamic", "Aperture Labs", "Sirius Cybernetics Corp",
    "Bluth Holdings", "Dunder Mifflin Inc",
]
PEOPLE = [
    "Alice Johnson", "Bob Smithers", "Carol Danvers", "David Chen",
    "Erin Brockovich", "Frank Castle", "Grace Hopper", "Hank Pym",
    "Iris West", "Jack Ryan", "Karen Page", "Leo Fitz",
    "Mona Sax", "Ned Stark", "Olive Oyl", "Peter Quill",
]
PRODUCTS = [
    "QuantumDB", "HyperDrive", "NeuroLink", "DataForge", "FluxCapacitor",
    "WarpCore", "MindMeld", "TurboCache", "GraphMind", "SkyBeam",
]
PLACES = [
    "Gotham City", "Star City", "Central City", "Emerald City",
    "Silicon Valley", "Pelican Harbor", "Crown Heights", "Coral City",
]

# Interleave types so the Zipf-hot head spans entity types.
_POOL: list[str] = []
for i in range(max(len(ORGS), len(PEOPLE), len(PRODUCTS), len(PLACES))):
    for lst in (ORGS, PEOPLE, PRODUCTS, PLACES):
        if i < len(lst):
            _POOL.append(lst[i])

_PRED_LIST = [
    "works at", "acquired", "partners with", "invested in", "founded",
    "leads", "develops", "uses", "reports to", "competes with",
    "located in", "supplies", "sued", "visited", "mentioned",
]
_CLAIM_TAILS = [
    "reported strong quarterly results",
    "missed its earnings expectations",
    "announced a new strategic initiative",
    "faces regulatory scrutiny",
    "plans to expand internationally",
    "recalled a defective product line",
    "won an industry award",
    "is hiring aggressively",
]
_FILLERS = [
    "the quarterly report was reviewed and approved",
    "we should circle back on the open action items",
    "the deployment finished without any issues",
    "metrics look stable after the rollout",
    "let us schedule a follow up for next week",
    "the budget review is still pending sign off",
    "overall sentiment in the channel was positive",
    "no further anomalies were observed overnight",
]
_MENTION_TAILS = [
    "was discussed at length during the meeting",
    "came up again in the retrospective",
    "remains the main topic of the thread",
    "was flagged for additional review",
]
_TRIPLE_TRAILERS = ["", "", "", " for an undisclosed sum", " earlier this year",
                    " according to the latest filing"]
_TOOLS = ["search", "calculator", "browser", "code_interpreter", "retrieval"]
_ROLES_CYCLE = ["user", "assistant"]

_VOWEL_DIACRITIC = {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú",
                    "A": "Á", "E": "É", "I": "Í", "O": "Ó", "U": "Ú"}
_SUFFIX_EXPANSION = {"Corp": "Corporation", "Inc": "Incorporated", "Ltd": "Limited"}

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp()


def _variant(name: str, k: int) -> str:
    """Deterministic surface-form variant k of a canonical entity name."""
    if k == 1:
        return name.upper()
    if k == 2 and " " in name:
        return name.replace(" ", "-")
    if k == 3:
        for i, c in enumerate(name):
            if c in _VOWEL_DIACRITIC:
                return name[:i] + _VOWEL_DIACRITIC[c] + name[i + 1 :]
        return name
    if k == 4:
        toks = name.split(" ")
        if toks[-1] in _SUFFIX_EXPANSION:
            return " ".join(toks[:-1] + [_SUFFIX_EXPANSION[toks[-1]]])
        return name
    return name


def _pick_entity(rng: np.random.RandomState) -> str:
    idx = (int(rng.zipf(1.3)) - 1) % len(_POOL)
    canonical = _POOL[idx]
    k = int(rng.choice(5, p=[0.55, 0.12, 0.10, 0.10, 0.13]))
    return _variant(canonical, k)


def _sentence(rng: np.random.RandomState) -> str:
    r = rng.rand()
    if r < 0.50:  # triple sentence
        e1 = _pick_entity(rng)
        e2 = _pick_entity(rng)
        tries = 0
        while e2 == e1 and tries < 4:
            e2 = _pick_entity(rng)
            tries += 1
        pred = _PRED_LIST[int(rng.randint(len(_PRED_LIST)))]
        trailer = _TRIPLE_TRAILERS[int(rng.randint(len(_TRIPLE_TRAILERS)))]
        return f"{e1} {pred} {e2}{trailer}."
    if r < 0.65:  # mention-only sentence
        e1 = _pick_entity(rng)
        tail = _MENTION_TAILS[int(rng.randint(len(_MENTION_TAILS)))]
        return f"{e1} {tail}."
    if r < 0.80:  # claim sentence
        e1 = _pick_entity(rng)
        tail = _CLAIM_TAILS[int(rng.randint(len(_CLAIM_TAILS)))]
        return f"{e1} {tail}."
    return f"{_FILLERS[int(rng.randint(len(_FILLERS)))]}."


def generate_conversation(conv_idx: int, seed: int = GLOBAL_SEED) -> list[dict]:
    """Generate one conversation's turns (pure function of (conv_idx, seed))."""
    rng = np.random.RandomState((seed * 1_000_003 + conv_idx) % (2**31 - 1))
    n_turns = 8 + min(56, int(rng.zipf(1.6)))
    conv_id = f"conv_{conv_idx:06d}"
    rows = []
    ts = _EPOCH + conv_idx * 3600.0
    for t in range(n_turns):
        if t == 0 and rng.rand() < 0.3:
            role, tool = "system", None
        elif rng.rand() < 0.12:
            role, tool = "tool", _TOOLS[int(rng.randint(len(_TOOLS)))]
        else:
            role, tool = _ROLES_CYCLE[t % 2], None
        n_sent = 1 + int(rng.randint(3))
        text = " ".join(_sentence(rng) for _ in range(n_sent))
        ts += 1.0 + float(rng.randint(120))
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts,
            }
        )
    return rows


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(50_000 * sf)))


def _gen_range(args: tuple[int, int, int]) -> list[dict]:
    lo, hi, seed = args
    out: list[dict] = []
    for c in range(lo, hi):
        out.extend(generate_conversation(c, seed))
    return out


def generate_transcripts(sf: float, seed: int = GLOBAL_SEED) -> pa.Table:
    """Full corpus at scale factor ``sf`` as an Arrow table, rows shuffled.

    Per-conversation generation is a pure function of (conv_idx, seed), so
    fanning ranges over a process pool is deterministic — results are
    concatenated in conv order before the fixed-seed shuffle.
    """
    n = n_convs_for_sf(sf)
    if n >= 2000:
        import multiprocessing as mp

        workers = min(24, mp.cpu_count())
        step = (n + workers * 4 - 1) // (workers * 4)
        ranges = [(lo, min(lo + step, n), seed) for lo in range(0, n, step)]
        with mp.Pool(workers) as pool:
            chunks = pool.map(_gen_range, ranges)
        rows = [r for ch in chunks for r in ch]
    else:
        rows = _gen_range((0, n, seed))
    perm = np.random.RandomState(777).permutation(len(rows))
    rows = [rows[int(i)] for i in perm]
    return pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array(
                [datetime.fromtimestamp(r["ts"], tz=timezone.utc) for r in rows],
                pa.timestamp("us", tz="UTC"),
            ),
        }
    )


def gen_dir(sf: float, base_dir: str | None = None) -> str:
    base = base_dir or os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "gen")
    return os.path.join(base, f"sf{sf:g}")


def ensure_corpus(
    sf: float, base_dir: str | None = None, goldens: bool = True
) -> dict[str, str]:
    """Generate (once) and return paths for the sf-scaled corpus + goldens.

    Writes ``transcripts.parquet`` plus golden oracle outputs (see oracle.py)
    guarded by a manifest so repeated calls are no-ops (checkpoint-style
    idempotence, same contract as the pipeline stages).

    ``goldens=False`` writes the transcripts only — the single-process
    golden oracle is O(corpus) pure Python, prohibitive at the large scale
    factors the scaling bench uses (which only needs the input table plus
    parallelism-invariant output counts). A later ``goldens=True`` call on
    the same sf upgrades the directory in place.
    """
    out = gen_dir(sf, base_dir)
    manifest_path = os.path.join(out, "_manifest.json")
    golden_paths = {
        "golden_raw_triples": os.path.join(out, "golden_raw_triples.parquet"),
        "golden_mentions": os.path.join(out, "golden_mentions.parquet"),
        "golden_triples": os.path.join(out, "golden_triples.parquet"),
        "golden_canon_map": os.path.join(out, "golden_canon_map.parquet"),
        "golden_claims": os.path.join(out, "golden_claims.parquet"),
    }
    paths = {
        "dir": out,
        "transcripts": os.path.join(out, "transcripts"),  # parquet directory
        **golden_paths,
    }
    want = {"gen_version": GEN_VERSION, "seed": GLOBAL_SEED, "sf": sf}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            have = json.load(f)
        core_ok = {k: have.get(k) for k in want} == want
        need = [paths["transcripts"]]
        if goldens:
            need += list(golden_paths.values())
        have_goldens = have.get("goldens", True)  # older manifests: full gen
        if core_ok and (have_goldens or not goldens) and all(
            os.path.exists(p) for p in need
        ):
            return paths

    os.makedirs(out, exist_ok=True)
    table = generate_transcripts(sf)
    # Write the transcripts as a MULTI-FILE directory (like any real
    # Iceberg/warehouse table): a single parquet file is a single Spark
    # input split, which would force a corpus-wide repartition shuffle in
    # front of extraction. ~100k rows per file.
    tdir = paths["transcripts"]
    if os.path.exists(tdir) and not os.path.isdir(tdir):
        os.remove(tdir)
    os.makedirs(tdir, exist_ok=True)
    n_files = max(1, min(256, table.num_rows // 100_000))
    step = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(
            table.slice(i * step, step), os.path.join(tdir, f"part-{i:05d}.parquet")
        )

    if goldens:
        # Golden oracle outputs (single-process, pure Python — oracle.py).
        from graphrag_litex_spark import oracle

        oracle.write_goldens(table, paths)

    with open(manifest_path, "w") as f:
        json.dump({**want, "goldens": goldens}, f)
    return paths
