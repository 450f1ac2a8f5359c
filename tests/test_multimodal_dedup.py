"""Perceptual (dHash) image near-dup: hashing determinism, envelope
behavior, and the pigeonhole zero-false-negative banding guarantee."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphrag_litex_spark.functions import media_codecs as mc
from graphrag_litex_spark.operators.multimodal import dhash_near_dup_pairs, image_dhash


def _ham(a: int, b: int) -> int:
    # Signed-int64 hashes: mask the XOR to 64 bits before popcount
    # (Python's bin() on a negative int undercounts set bits).
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in rows],
        "media_id string, kind string, payload binary",
    )


def _gradient(seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    base = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
    img = np.stack([base, base // 2, 255 - base], axis=2).astype(np.int32)
    img = np.clip(img + rng.randint(-4, 5, img.shape), 0, 255).astype(np.uint8)
    return img


@pytest.fixture(scope="module")
def hashed(spark):
    a = _gradient(1)
    b = a.copy()
    b[5, 7] = (0, 0, 0)  # single-pixel edit: near-dup
    c = np.ascontiguousarray(a[:, ::-1])  # column-flip inverts every gradient sign: far
    rows = [
        ("a_ppm", mc.encode_ppm(a)),
        ("a_bmp", mc.encode_bmp(a)),  # same pixels, different container
        ("b_edit", mc.encode_ppm(b)),
        ("c_flip", mc.encode_ppm(c)),
        ("corrupt", b"P6\n not an image"),
    ]
    df = image_dhash(_media(spark, rows))
    return {r["media_id"]: r.asDict() for r in df.collect()}


def test_dhash_decode_and_determinism(hashed):
    # Same pixels through two codecs -> identical hash.
    assert hashed["a_ppm"]["decoded"] and hashed["a_bmp"]["decoded"]
    assert hashed["a_ppm"]["dhash"] == hashed["a_bmp"]["dhash"]
    # Single-pixel edit stays within a small Hamming ball.
    assert _ham(hashed["a_ppm"]["dhash"], hashed["b_edit"]["dhash"]) <= 4
    # Flipped image is far.
    assert _ham(hashed["a_ppm"]["dhash"], hashed["c_flip"]["dhash"]) > 10
    # Corrupt payload -> envelope, not task failure.
    assert hashed["corrupt"]["decoded"] is False and hashed["corrupt"]["dhash"] is None


def test_near_dup_pairs_end_to_end(spark):
    a = _gradient(2)
    b = a.copy()
    b[0, 0] = (255, 255, 255)
    rows = [
        ("x", mc.encode_ppm(a)),
        ("y", mc.encode_ppm(b)),
        # Column reversal flips every horizontal gradient sign: far by
        # construction (row reversal would NOT be — the gradient is
        # horizontal, so dHash is row-flip invariant).
        ("z", mc.encode_ppm(np.ascontiguousarray(_gradient(99)[:, ::-1]))),
    ]
    pairs = dhash_near_dup_pairs(image_dhash(_media(spark, rows)), max_hamming=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("x", "y") in found
    assert all("z" not in p for p in found)


def test_pigeonhole_banding_has_zero_false_negatives(spark):
    # Random 64-bit hashes; each pair differs by 0..max_hamming random bit
    # flips (including sign-bit flips — shiftrightunsigned must treat the
    # hash as unsigned). EVERY such pair must be found: the banding is
    # exact by pigeonhole, not probabilistic.
    rng = random.Random(42)
    rows, expected = [], set()
    for i in range(40):
        h = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 4))
        h2 = h
        for bit in flips:
            h2 ^= 1 << bit
        def signed(x):
            return x - (1 << 64) if x >= 1 << 63 else x
        ida, idb = f"p{i:03d}_a", f"p{i:03d}_b"
        rows += [(ida, "ppm", True, signed(h)), (idb, "ppm", True, signed(h2))]
        expected.add((ida, idb, len(flips)))
    df = spark.createDataFrame(rows, "media_id string, format string, decoded boolean, dhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_dup_pairs(df, max_hamming=4).collect()
        if r["id_a"][:4] == r["id_b"][:4]  # same planted pair
    }
    assert expected <= got


def test_hamming_above_threshold_excluded(spark):
    h = 0
    h2 = (1 << 5) - 1  # 5 flips > max_hamming=4
    df = spark.createDataFrame(
        [("u", "ppm", True, h), ("v", "ppm", True, h2)],
        "media_id string, format string, decoded boolean, dhash long",
    )
    assert dhash_near_dup_pairs(df, max_hamming=4).count() == 0


def test_audio_fingerprint_near_and_far(spark):
    import numpy as np

    from graphrag_litex_spark.operators.multimodal import audio_fingerprint

    rng = np.random.RandomState(5)
    a = rng.randint(-20000, 20000, 2048).astype(np.float64) / 32768.0
    b = a.copy()
    b[100:108] = 0.4  # tiny localized edit: near
    c = rng.randint(-20000, 20000, 2048).astype(np.float64) / 32768.0  # independent: far
    rows = [
        ("a", mc.encode_wav(8000, a)),
        ("b", mc.encode_wav(8000, b)),
        ("c", mc.encode_wav(8000, c)),
        ("bad", b"RIFFgarbage"),
    ]
    df = spark.createDataFrame(
        [(i, "audio", bytearray(p)) for i, p in rows],
        "media_id string, kind string, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in audio_fingerprint(df).collect()}
    assert got["a"]["decoded"] and got["b"]["decoded"] and got["c"]["decoded"]
    assert _ham(got["a"]["fingerprint"], got["b"]["fingerprint"]) <= 6
    assert _ham(got["a"]["fingerprint"], got["c"]["fingerprint"]) > 10
    assert got["bad"]["decoded"] is False and got["bad"]["fingerprint"] is None


def test_audio_pairs_via_shared_banding(spark):
    from graphrag_litex_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fixture_from_docs,
    )

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pairs = dhash_near_dup_pairs(
        audio_fingerprint(audio_fixture_from_docs(docs)), max_hamming=6, hash_col="fingerprint"
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("16", "17") in found and ("6", "7") in found  # planted


def test_bit_width_validation_raises_driver_side(spark):
    from graphrag_litex_spark.operators.multimodal import audio_fingerprint, image_dhash

    df = spark.createDataFrame(
        [("m", "image", bytearray(b"x"))], "media_id string, kind string, payload binary"
    )
    with pytest.raises(ValueError, match="hash_size"):
        image_dhash(df, hash_size=9)  # 81 bits would overflow the int64 column
    with pytest.raises(ValueError, match="n_windows"):
        audio_fingerprint(df, n_windows=70)  # 69 bits likewise
