"""128-permutation MinHash + 64-bit SimHash — vectorized Arrow UDFs.

Design (SURVEY.md §2.1 "MinHash relationship"): the reference's theta
sketch is a single-hash bottom-k KMV; the LSH pipeline needs classic
fixed-width MinHash (one minimum per permutation, Broder 1997).  Both
are built here from the same shingle-hash arrays.

Permutation family: sig_j(S) = min_{h in S} (a_j * h + b_j) mod 2^64
with odd a_j — an affine bijection of Z_2^64, i.e. a genuine
permutation of the hash space.  a_j, b_j derive deterministically from
murmur3 of (MINHASH_SEED, j) so every executor and every run agrees
(merge-safety discipline, SURVEY.md §4).

The whole batch is one numpy broadcast: (total_shingles x perm_chunk)
with np.minimum.reduceat per document — the batched analogue of the
reference's per-item update loop (theta/HeapQuickSelectSketch.java:239).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

from ..config import MINHASH_PERMS, MINHASH_SEED, SIMHASH_BITS
from ..sketches.murmur3 import hash128_u64_pair

_EMPTY_SIG = np.uint64(0xFFFFFFFFFFFFFFFF)
_PERM_CHUNK = 32


def _permutation_params(n_perms: int = MINHASH_PERMS,
                        seed: int = MINHASH_SEED) -> tuple[np.ndarray, np.ndarray]:
    js = np.arange(n_perms, dtype=np.uint64)
    a, _ = hash128_u64_pair(js, np.full(n_perms, seed, np.uint64), seed)
    _, b = hash128_u64_pair(js, np.full(n_perms, seed + 1, np.uint64), seed + 7)
    a = a | np.uint64(1)  # odd multiplier -> bijection
    return a, b


_A, _B = _permutation_params()


def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged array<long> column -> (values u64, row starts, row lengths)."""
    lengths = np.fromiter((0 if v is None else len(v) for v in series),
                          dtype=np.int64, count=len(series))
    if lengths.sum() == 0:
        return np.empty(0, np.uint64), np.zeros(len(series), np.int64), lengths
    values = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in series if v is not None and len(v)]
    ).view(np.uint64)
    starts = np.zeros(len(series), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return values, starts, lengths


def minhash_flat(values: np.ndarray, starts: np.ndarray,
                 lengths: np.ndarray,
                 n_perms: int = MINHASH_PERMS) -> np.ndarray:
    """(n_docs x n_perms) int64 signatures from a flattened u64 value
    array + per-row starts/lengths.

    One permutation per pass: a 1-D multiply-add over the flattened
    values followed by a contiguous 1-D ``minimum.reduceat`` — ~50x
    faster than the 2-D broadcast (reduceat along axis 0 of a wide
    array strides badly)."""
    n = len(lengths)
    out = np.full((n, n_perms), _EMPTY_SIG, dtype=np.uint64)
    nonempty = lengths > 0
    if values.size:
        ne_starts = starts[nonempty]
        col = np.empty(int(nonempty.sum()), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n_perms):
                t = values * _A[j]
                t += _B[j]
                np.minimum.reduceat(t, ne_starts, out=col)
                out[nonempty, j] = col
    return out.view(np.int64)


def minhash_batch(series: pd.Series, n_perms: int = MINHASH_PERMS) -> np.ndarray:
    values, starts, lengths = _flatten(series)
    return minhash_flat(values, starts, lengths, n_perms)


def simhash_flat(values: np.ndarray, starts: np.ndarray,
                 lengths: np.ndarray, bits: int = SIMHASH_BITS) -> np.ndarray:
    """int64 SimHash per doc: majority vote per bit over shingle hashes."""
    n = len(lengths)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lengths > 0
    if values.size:
        ne_starts = starts[nonempty]
        ne_len = lengths[nonempty]
        acc = np.zeros(int(nonempty.sum()), dtype=np.uint64)
        for k in range(bits):
            bit = ((values >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
            sums = np.add.reduceat(bit, ne_starts)
            acc |= (2 * sums > ne_len).astype(np.uint64) << np.uint64(k)
        out[nonempty] = acc
    return out.view(np.int64)


def simhash_batch(series: pd.Series, bits: int = SIMHASH_BITS) -> np.ndarray:
    values, starts, lengths = _flatten(series)
    return simhash_flat(values, starts, lengths, bits)


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash128(shingle_hashes: pd.Series) -> pd.Series:
    sig = minhash_batch(shingle_hashes)
    return pd.Series(list(sig))


@F.pandas_udf(T.LongType())
def simhash64(shingle_hashes: pd.Series) -> pd.Series:
    return pd.Series(simhash_batch(shingle_hashes))


@F.pandas_udf(T.DoubleType())
def minhash_jaccard(sig_a: pd.Series, sig_b: pd.Series) -> pd.Series:
    """Signature-space Jaccard estimate: fraction of agreeing
    permutations (theta/JaccardSimilarity.java:55 counterpart over
    fixed-width signatures)."""
    a = np.stack([np.asarray(v, np.int64) for v in sig_a])
    b = np.stack([np.asarray(v, np.int64) for v in sig_b])
    return pd.Series((a == b).mean(axis=1))


def winnow_batch(series: pd.Series, window: int = 8) -> list:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03) over
    per-doc k-gram hash sequences: minimum hash of each sliding
    window, deduplicated — the rolling-hash document fingerprint
    guaranteeing any shared run of ≥ window k-grams yields a shared
    fingerprint.  Vectorized via a sliding-window-view min."""
    out = []
    for v in series:
        if v is None or len(v) == 0:
            out.append([])
            continue
        h = np.asarray(v, dtype=np.int64).view(np.uint64)
        if h.shape[0] <= window:
            out.append([np.int64(h.min().astype(np.int64))])
            continue
        sw = np.lib.stride_tricks.sliding_window_view(h, window)
        mins = sw.min(axis=1).view(np.int64)
        out.append(np.unique(mins).tolist())  # sorted + deduped, C-level
    return out


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(kgram_hashes: pd.Series) -> pd.Series:
    """Winnowing over an (ordered!) k-gram hash array column — feed it
    shingles in document order, NOT the sorted distinct set."""
    return pd.Series(winnow_batch(kgram_hashes))


def hamming64(a, b):
    """JVM-side Hamming distance between two int64 SimHash columns —
    bit_count of xor, stays inside codegen."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))
