"""MurmurHash3 bit-compatibility tests.

Expected values are the reference's published vectors
(test: hash/MurmurHash3Test.java:38-250) — shared with Appleby's C++
MurmurHash3_x64_128 final rev 150.
"""

import numpy as np

from datasketches_java_spark.sketches.murmur3 import (
    hash128_bytes,
    hash128_u64,
    hash128_u64_pair,
    theta_hash_u64,
)

VECTORS = [
    # (utf-8 input, h1, h2)  — hash/MurmurHash3Test.java
    ("The quick brown fox jumps over the lazy dog", 0xE34BBC7BBC071B6C, 0x7A433CA9C49A9347),
    ("The quick brown fox jumps over the lazy eog", 0x362108102C62D1C9, 0x3285CD100292B305),
    ("The quick brown fox jumps over the lazy dogdogdog", 0x9C8205300E612FC4, 0xCBC0AF6136AA3DF9),
    ("The quick brown fox jumps over the lazy1", 0xE3301A827E5CDFE3, 0xBDBF05F8DA0F0392),
    ("The quick brown fox jumps over t", 0xDF6AF91BB29BDACF, 0x91A341C58DF1F3A6),
]


def test_bytes_vectors():
    for s, h1, h2 in VECTORS:
        got = hash128_bytes(s.encode("utf-8"), 0)
        assert got == (h1, h2), s


def test_bytes_ones_zeros_vector():
    key = bytes(
        [0x54, 0x68, 0x65, 0x20, 0x71, 0x75, 0x69, 0x63, 0x6B, 0x20, 0x62, 0x72,
         0x6F, 0x77, 0x6E, 0x20, 0x66, 0x6F, 0x78, 0x20, 0x6A, 0x75, 0x6D, 0x70,
         0x73, 0x20, 0x6F, 0x76, 0x65, 0x72, 0x20, 0x74, 0x68, 0x65, 0x20, 0x6C,
         0x61, 0x7A, 0x79, 0x20, 0x64, 0x6F, 0x67, 0xFF, 0x64, 0x6F, 0x67, 0x00])
    assert hash128_bytes(key, 0) == (0xE88ABDA785929C9E, 0x96B98587CACC83D6)


def test_u64_matches_scalar_bytes():
    # hash(long, seed) == hash of the 8 little-endian bytes of that long
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**63), 2**63 - 1, size=256, dtype=np.int64)
    h1v, h2v = hash128_u64(keys, 9001)
    for i, k in enumerate(keys):
        b = int(k).to_bytes(8, "little", signed=True)
        h1, h2 = hash128_bytes(b, 9001)
        assert (int(h1v[i]), int(h2v[i])) == (h1, h2)


def test_u64_pair_matches_scalar_bytes():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    h1v, h2v = hash128_u64_pair(a, b, 9001)
    for i in range(64):
        buf = int(a[i]).to_bytes(8, "little") + int(b[i]).to_bytes(8, "little")
        h1, h2 = hash128_bytes(buf, 9001)
        assert (int(h1v[i]), int(h2v[i])) == (h1, h2)


def test_theta_hash_is_63_bit():
    keys = np.arange(10_000, dtype=np.int64)
    th = theta_hash_u64(keys, 9001)
    assert th.dtype == np.uint64
    assert int(th.max()) < 2**63
    # seedable: different seed -> different hashes
    th2 = theta_hash_u64(keys, 9002)
    assert not np.array_equal(th, th2)


def test_batch_bytes_parity_with_scalar():
    """hash128_bytes_batch must equal the scalar parity path for every
    length class (empty, sub-tail, exact blocks, multi-block, long),
    unicode payloads and both seeds."""
    import numpy as np
    from datasketches_java_spark.sketches.murmur3 import (
        hash128_bytes, hash128_bytes_batch)
    rng = np.random.default_rng(3)
    payloads = [b"", b"a", b"abcdefg", b"0123456789abcdef",
                b"0123456789abcdef0", "héllo wörld — ünïcode".encode(),
                bytes(rng.integers(0, 256, 15, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 16, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 31, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 32, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 33, dtype=np.uint8)),
                bytes(rng.integers(0, 256, 1000, dtype=np.uint8))]
    payloads += [bytes(rng.integers(0, 256, int(L), dtype=np.uint8))
                 for L in rng.integers(0, 200, 50)]
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lengths = np.array([len(p) for p in payloads], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    for seed in (0, 9001):
        h1, h2 = hash128_bytes_batch(flat, starts, lengths, seed)
        for i, p in enumerate(payloads):
            s1, s2 = hash128_bytes(p, seed)
            assert (int(h1[i]), int(h2[i])) == (s1, s2), f"payload {i}"


def test_batch_bytes_single_long_equivalence():
    """An 8-byte little-endian payload must hash identically to the
    vectorized single-long path (same contract as the reference's
    hash(long) vs hash(byte[8]))."""
    import numpy as np
    from datasketches_java_spark.sketches.murmur3 import (
        hash128_bytes_batch, hash128_u64)
    vals = np.array([0, 1, -1, 2**62, -2**60], dtype=np.int64)
    flat = np.frombuffer(vals.astype("<i8").tobytes(), dtype=np.uint8)
    starts = np.arange(5, dtype=np.int64) * 8
    lengths = np.full(5, 8, dtype=np.int64)
    b1, b2 = hash128_bytes_batch(flat, starts, lengths, 9001)
    l1, l2 = hash128_u64(vals, 9001)
    assert np.array_equal(b1, l1) and np.array_equal(b2, l2)
