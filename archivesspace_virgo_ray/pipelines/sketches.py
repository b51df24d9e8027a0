"""Mergeable cardinality sketches (HyperLogLog).

The registers are a tree-mergeable max — the canonical sketch shape for a
streaming engine: vectorized per-batch register maxima, log-depth merges,
one tiny register table on the driver regardless of input size.

The value hash is the first 16 hex chars of md5 (like the SimHash and
exact-dedup operators) so the DuckDB oracle reproduces the ENTIRE sketch —
register assignment, rho, and the estimator arithmetic — bit-for-bit:
approximate does not have to mean unverifiable.

Estimator: Flajolet et al. 2007 (HyperLogLog), with the standard
small-range linear-counting correction. The 32-bit large-range correction
is unnecessary for a 64-bit hash and is omitted (documented divergence
from the 2007 paper, standard practice for 64-bit implementations)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash64(values) -> np.ndarray:
    from ..functions.hashing import md5_u64

    return np.fromiter(
        (md5_u64(str(v)) for v in values), dtype=np.uint64, count=len(values)
    )


def hll_register_batch(values, p: int) -> pd.DataFrame:
    """One batch's register maxima: (register, rho) with rho = 1 + leading
    zeros of the hash's remaining 64-p bits (0 remaining bits → 64-p+1).

    Duplicates are dropped BEFORE hashing: register maxima depend only on
    the value SET, and the md5 contract hash is a per-value Python call —
    on low-cardinality columns (the table-profiling case) uniquing first
    cuts the dominant cost by orders of magnitude, with identical output.

    Nulls are dropped here (COUNT DISTINCT semantics): an object array mixing
    None/NaN with strings would otherwise raise from np.unique's sort."""
    values = np.asarray(values)
    if values.dtype == object:
        keep = np.fromiter(
            (v is not None and v == v for v in values), dtype=bool, count=len(values)
        )
        values = values[keep]
    elif values.dtype.kind == "f":
        values = values[~np.isnan(values)]
    values = np.unique(values)
    h = _hash64(values)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)).astype(np.uint64)  # wraps: keeps low 64-p bits high
    # leading zeros of w within 64 bits; w == 0 → rho = 64 - p + 1
    nz = w != 0
    rho = np.full(len(h), 64 - p + 1, dtype=np.int64)
    if nz.any():
        # bit_length via log2 is unsafe at 64-bit edges; use frexp-free
        # integer method: highest set bit position
        wv = w[nz]
        hi = np.zeros(len(wv), dtype=np.int64)
        x = wv.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = x >= (np.uint64(1) << np.uint64(shift))
            hi[m] += shift
            x[m] >>= np.uint64(shift)
        rho[nz] = 64 - hi - 1 + 1  # leading zeros (64 - 1 - hi) + 1
    out = pd.DataFrame({"register": reg, "rho": rho})
    return out.groupby("register", as_index=False)["rho"].max()


def hll_estimate(registers: np.ndarray, p: int) -> float:
    """Registers (length 2^p, zeros for never-hit) → cardinality estimate."""
    m = 1 << p
    raw = _alpha(m) * m * m / float(np.sum(np.power(2.0, -registers.astype(np.float64))))
    zeros = int(np.sum(registers == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return raw


def hll_distinct_grouped(
    ds, col: str, group_col: str, p: int = 12
) -> pd.DataFrame:
    """-> (group_col, estimate): approximate COUNT(DISTINCT col) PER GROUP
    — one sketch per group, all riding ONE tree-merged pass keyed by
    (group, register). Driver state: groups × (hit registers) rows,
    facet-cardinality-bounded, never input-sized."""
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g, sub in df.groupby(group_col, dropna=False):
            r = hll_register_batch(sub[col].to_numpy(), p)
            r.insert(0, group_col, g)
            frames.append(r)
        if not frames:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "register": pd.Series([], dtype=np.int64),
                                 "rho": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    regs = tree_aggregate(
        ds, [group_col, "register"], partial, {"rho": "max"}
    ).to_pandas()
    m = 1 << p
    rows = []
    for g, sub in regs.groupby(group_col, dropna=False):
        registers = np.zeros(m, dtype=np.int64)
        registers[sub["register"].to_numpy(np.int64)] = \
            sub["rho"].to_numpy(np.int64)
        rows.append((g, round(hll_estimate(registers, p), 6)))
    out = pd.DataFrame(rows, columns=[group_col, "estimate"])
    return out.sort_values(group_col, ignore_index=True)


def hll_distinct(ds, col: str, p: int = 12) -> pd.DataFrame:
    """-> one-row (n_registers, estimate): approximate COUNT(DISTINCT col).

    Register maxima tree-merge; only the 2^p-row register table ever reaches
    the driver. Standard error ≈ 1.04/√m (~1.6% at p=12)."""
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return hll_register_batch(df[col].to_numpy(), p)

    regs = tree_aggregate(ds, ["register"], partial, {"rho": "max"}).to_pandas()
    m = 1 << p
    registers = np.zeros(m, dtype=np.int64)
    registers[regs["register"].to_numpy(np.int64)] = regs["rho"].to_numpy(np.int64)
    return pd.DataFrame(
        {"n_registers": [np.int64(m)],
         "estimate": [round(hll_estimate(registers, p), 6)]}
    )


# --------------------------- Count-Min Sketch -------------------------------

def _cms_bucket(row: int, term: str, w: int) -> int:
    from ..functions.hashing import md5_u64

    return int(md5_u64(f"{row}:{term}") % np.uint64(w))


def cms_build(ds, text_col: str = "text", d: int = 4, w: int = 1024):
    """Count-Min Sketch over the corpus token stream (Cormode & Muthu 2005):
    d md5-derived hash rows × w counters, counting every token occurrence.
    Counters are a tree-mergeable SUM — one keyed pass, the d×w counter
    table is the only thing that reaches the driver. The md5 contract hash
    makes the whole sketch (bucket assignment and counts) reproducible in
    SQL — approximate, but exactly verifiable.

    Returns a dense (row, bucket, n) pandas table (zero rows omitted)."""
    from ..functions.tokenize import batch_term_doc_tf
    from ..state.aggregates import tree_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        terms, _docs, tfs, _dls = batch_term_doc_tf(
            np.zeros(len(df), np.int64), df[text_col].to_numpy()
        )
        tcount = pd.DataFrame({"term": terms, "tf": tfs}) \
            .groupby("term", as_index=False)["tf"].sum()
        ts = tcount["term"].tolist()
        tf = tcount["tf"].to_numpy(np.int64)
        rows, buckets, ns = [], [], []
        for i in range(d):
            rows.extend([i] * len(ts))
            buckets.extend(_cms_bucket(i, t, w) for t in ts)
            ns.extend(tf)
        out = pd.DataFrame({
            "row": pd.Series(rows, dtype=np.int64),
            "bucket": pd.Series(buckets, dtype=np.int64),
            "n": pd.Series(ns, dtype=np.int64),
        })
        return out.groupby(["row", "bucket"], as_index=False)["n"].sum()

    return tree_aggregate(
        ds, ["row", "bucket"], partial, {"n": "sum"}
    ).to_pandas()


def cms_query(counts: pd.DataFrame, terms: list[str], d: int = 4,
              w: int = 1024) -> pd.DataFrame:
    """Point queries against a built sketch: estimate(term) =
    min_i counts[i, h_i(term)] — an upper bound on the true count that is
    exact for terms with no colliding mass."""
    lut = {(int(r), int(b)): int(n) for r, b, n in
           zip(counts["row"], counts["bucket"], counts["n"])}
    ests = [
        min(lut.get((i, _cms_bucket(i, t, w)), 0) for i in range(d))
        for t in terms
    ]
    return pd.DataFrame({
        "term": pd.Series(terms, dtype=object),
        "estimate": pd.Series(ests, dtype=np.int64),
    })
