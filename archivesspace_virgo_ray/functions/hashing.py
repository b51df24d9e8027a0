"""Content hashing + stable doc-id derivation.

The reference's transform-hash cache uses md5 of the XSLT files
(IndexRecordsForV4.java:154-168); our per-row invariant (input_hint) is
``sha256(content)`` equality vs the source table, and doc ids must be stable
across any partitioning / parallelism level (SURVEY.md §7.4), so they derive
from row identity — never from block order.

At 10^12-doc scale a 63-bit id has a nonzero birthday-collision expectation;
the production layout would widen to 128-bit (or (shard, local_id)) — the
codec below isolates that choice in one place.
"""

from __future__ import annotations

import hashlib

import numpy as np


def sha256_hex(texts) -> np.ndarray:
    """Vector of sha256 hex digests (utf-8) for a string array."""
    h = hashlib.sha256
    return np.fromiter(
        (h(t.encode("utf-8")).hexdigest() for t in texts), dtype=object, count=len(texts)
    )


def doc_id_from_key(repos, paths, commits) -> np.ndarray:
    """Stable positive int64 doc id from the (repo, path, commit) natural key.

    First 8 bytes of sha256("repo\\0path\\0commit"), masked to 63 bits.
    """
    h = hashlib.sha256
    out = np.empty(len(repos), dtype=np.int64)
    for i, (r, p, c) in enumerate(zip(repos, paths, commits)):
        d = h(f"{r}\0{p}\0{c}".encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF
    return out


def md5_u64(s: str) -> "np.uint64":
    """First 16 hex chars of md5 as uint64 — the SQL-REPRODUCIBLE 64-bit
    hash contract shared by SimHash, the HLL sketch, and their DuckDB
    oracles (`CAST(('0x' || substr(md5(v), 1, 16)) AS UBIGINT)`)."""
    import hashlib

    import numpy as np

    return np.uint64(int(hashlib.md5(s.encode()).hexdigest()[:16], 16))
