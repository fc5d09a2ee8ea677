"""Reference-binary theta sketch serde — serVer-3 compact images.

Reads and writes the Apache DataSketches compact theta wire format so
sketches interoperate with datasketches-java/-cpp/-hive/-pig producers
and consumers.  Byte layout per theta/PreambleUtil.java:28-133 and the
writer theta/CompactOperations.java:218-270 (all little-endian):

  empty        : 8B  preamble {preLongs=1, serVer=3, famID=3, 0, 0,
                 flags=0x1E, seedHash=0} (EmptyCompactSketch.java:39 —
                 the seed hash is zero by spec for the empty form)
  single item  : 8B  preamble {1, 3, 3, 0, 0, flags=0x3A, seedHash}
                 + one hash long (SingleItemSketch.java:53-66)
  exact        : 16B preamble (preLongs=2): pre0 {2,3,3,0,0,0x1A,seedHash},
                 long1 = {curCount:int32, p=1.0f} + count hash longs
  estimating   : 24B preamble (preLongs=3): + thetaLong at offset 16

Flags byte: 1=bigEndian, 2=readOnly, 4=empty, 8=compact, 16=ordered,
32=singleItem (PreambleUtil.java:174-179).  We always WRITE
compact-ordered (the merge-optimal form the reference's union
early-stops on); we READ ordered or unordered compacts.
"""

from __future__ import annotations

import struct

import numpy as np

from ..config import DEFAULT_LG_K, DEFAULT_UPDATE_SEED, MAX_LG_K
from .theta import MAX_THETA, ThetaSketch, compute_seed_hash

_SER_VER = 3
_FAMILY_COMPACT = 3
_FLAG_BIG_ENDIAN = 1
_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16
_FLAG_SINGLE_ITEM = 32

_EMPTY_IMAGE = bytes([1, 3, 3, 0, 0, 0x1E, 0, 0])


def _lg_k_for_count(count: int) -> int:
    lg = DEFAULT_LG_K
    while (1 << lg) < count and lg < MAX_LG_K:
        lg += 1
    return lg


def to_java_bytes(sk: ThetaSketch) -> bytes:
    """Serialize to the reference's serVer-3 compact-ordered image
    (what CompactSketch.toByteArray() emits for an ordered compact)."""
    if sk.is_empty:
        return _EMPTY_IMAGE
    if sk.count == 1 and sk.theta == MAX_THETA:
        pre0 = struct.pack("<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
                           _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
                           | _FLAG_SINGLE_ITEM, sk.seed_hash)
        return pre0 + sk.hashes.astype("<u8").tobytes()
    estimating = sk.theta != MAX_THETA
    pre_longs = 3 if estimating else 2
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    out = [struct.pack("<BBBBBBH", pre_longs, _SER_VER, _FAMILY_COMPACT,
                       0, 0, flags, sk.seed_hash),
           struct.pack("<if", sk.count, 1.0)]
    if estimating:
        out.append(struct.pack("<q", int(sk.theta)))
    out.append(sk.hashes.astype("<u8").tobytes())
    return b"".join(out)


def from_java_bytes(buf: bytes, seed: int | None = DEFAULT_UPDATE_SEED,
                    lg_k: int | None = None) -> ThetaSketch:
    """Heapify a serVer-3 compact image (theta/Sketch.java:70 heapify
    counterpart).  ``seed`` enables the 16-bit seed-hash check the
    reference performs on every wrap/merge (UnionImpl.java:308); pass
    None to skip.  The nominal k is NOT stored in compact images (the
    reference's set operations take k from their builder, not the
    input image) — pass ``lg_k`` when downstream unions must honor a
    specific nominal size; otherwise the result carries
    lg_k = max(default, ceil-pow2(count))."""
    if len(buf) < 8:
        raise ValueError("theta image too short")
    pre_longs = buf[0] & 0x3F
    ser_ver = buf[1]
    fam = buf[2]
    flags = buf[5]
    seed_hash = struct.unpack_from("<H", buf, 6)[0]
    if ser_ver in (1, 2):
        return _heapify_legacy(buf, ser_ver, pre_longs, fam, flags,
                               seed_hash, seed, lg_k)
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported theta serVer {ser_ver} (only 1-3)")
    if fam != _FAMILY_COMPACT:
        raise ValueError(
            f"family {fam} is not a compact theta image (need 3); "
            "updatable/union forms are not supported by this reader")
    if flags & _FLAG_BIG_ENDIAN:
        raise ValueError("big-endian theta images not supported")
    if flags & _FLAG_EMPTY:
        lg = lg_k if lg_k is not None else DEFAULT_LG_K
        sh = compute_seed_hash(seed) if seed is not None else 0
        return ThetaSketch(lg, sh, MAX_THETA, np.empty(0, np.uint64))
    if seed is not None and seed_hash != compute_seed_hash(seed):
        raise ValueError(
            f"seed-hash mismatch: image {seed_hash} != "
            f"computed {compute_seed_hash(seed)} (UnionImpl.java:308)")
    if pre_longs == 1 or flags & _FLAG_SINGLE_ITEM:
        h = np.frombuffer(buf, dtype="<u8", count=1, offset=8).astype(np.uint64)
        return ThetaSketch(lg_k if lg_k is not None else DEFAULT_LG_K,
                           seed_hash, MAX_THETA, h)
    count = struct.unpack_from("<i", buf, 8)[0]
    if pre_longs == 2:
        theta = MAX_THETA
        off = 16
    elif pre_longs == 3:
        theta = np.uint64(struct.unpack_from("<Q", buf, 16)[0])
        off = 24
    else:
        raise ValueError(f"unexpected preLongs {pre_longs} for compact image")
    hashes = np.frombuffer(buf, dtype="<u8", count=count,
                           offset=off).astype(np.uint64)
    if not flags & _FLAG_ORDERED:
        hashes = np.sort(hashes)
    return ThetaSketch(lg_k if lg_k is not None else _lg_k_for_count(count),
                       seed_hash, theta, hashes)


def _heapify_legacy(buf: bytes, ser_ver: int, pre_longs: int, fam: int,
                    flags: int, seed_hash: int, seed: int | None,
                    lg_k: int | None) -> ThetaSketch:
    """Cross-version readers for serVer 1 (~2014) and 2 images —
    theta/ForwardCompatibility.java:53-118 semantics:
      v1: always preLongs=3, compact ordered, famID 1-3, NO seed hash
          stored (caller's seed supplies it), no empty flag — empty iff
          count==0 and theta==MAX (or a bare 24-byte preamble);
      v2: preLongs 1 (empty) / 2 (exact) / 3 (estimating), compact
          ordered, famID 1-4, seed hash at bytes 6-7 like v3."""
    sh = compute_seed_hash(seed) if seed is not None else seed_hash
    out_lg = lg_k if lg_k is not None else DEFAULT_LG_K

    def _empty() -> ThetaSketch:
        return ThetaSketch(out_lg, sh, MAX_THETA, np.empty(0, np.uint64))

    if ser_ver == 1:
        if pre_longs != 3:
            raise ValueError(f"serVer-1 preLongs must be 3, got {pre_longs}")
        if not 1 <= fam <= 3:
            raise ValueError(f"serVer-1 family must be 1-3, got {fam}")
        count = struct.unpack_from("<i", buf, 8)[0]
        theta = np.uint64(struct.unpack_from("<Q", buf, 16)[0])
        if (count == 0 and theta == MAX_THETA) or len(buf) <= 24:
            return _empty()
        hashes = np.frombuffer(buf, dtype="<u8", count=count,
                               offset=24).astype(np.uint64)
        lg = lg_k if lg_k is not None else _lg_k_for_count(count)
        return ThetaSketch(lg, sh, theta, hashes)

    # ser_ver == 2
    if not 1 <= fam <= 4:
        raise ValueError(f"serVer-2 family must be 1-4, got {fam}")
    if seed is not None and seed_hash != compute_seed_hash(seed):
        raise ValueError(
            f"seed-hash mismatch in serVer-2 image: {seed_hash} != "
            f"{compute_seed_hash(seed)}")
    if pre_longs == 1:
        return _empty()
    count = struct.unpack_from("<i", buf, 8)[0]
    if count == 0:
        return _empty()
    theta = MAX_THETA if pre_longs == 2 else \
        np.uint64(struct.unpack_from("<Q", buf, 16)[0])
    hashes = np.frombuffer(buf, dtype="<u8", count=count,
                           offset=pre_longs << 3).astype(np.uint64)
    lg = lg_k if lg_k is not None else _lg_k_for_count(count)
    return ThetaSketch(lg, sh, theta, hashes)
