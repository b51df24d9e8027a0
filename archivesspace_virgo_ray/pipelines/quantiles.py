"""Exact distributed quantiles without a global sort.

Three streaming passes: bounds (finite min/max + class counts), a histogram
pass that brackets each target order statistic into a narrow bin, and a
pruned collect of only those bins' rows (≈ n/n_bins each); the exact
interpolated quantile (numpy ``linear`` semantics) comes from that small
set. At 10^12 rows and 65k bins the driver-side set is ~10^7 values per
needed bin; add one more refinement level if a bin must shrink further.

Non-finite values are handled exactly WITHOUT entering the histogram (a
single ±inf would otherwise collapse the linspace edges and degrade the
pruned collect to a full-column pull): ±inf are counted in the bounds pass
and occupy the ends of the virtual sorted order; any NaN poisons every
quantile to NaN — matching both ``numpy.quantile`` and DuckDB's
``quantile_cont``.

Both histogram passes share ONE bin-assignment rule (``searchsorted`` on
the same edge array; last bin right-closed) — np.histogram's internal
scaling can disagree with edge comparisons by 1 ulp, which would misalign
ranks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bin_of(v: np.ndarray, edges: np.ndarray, n_bins: int) -> np.ndarray:
    return np.clip(np.searchsorted(edges, v, side="right") - 1, 0, n_bins - 1)


def exact_quantiles(
    ds, col: str, qs: list[float], n_bins: int = 4096
) -> pd.DataFrame:
    """-> (q, value) exact continuous quantiles of ``ds[col]``.

    Matches ``numpy.quantile(method="linear")`` (and ``quantile_cont`` on
    NaN-free data): q·(n−1) = k + f → value = v[k]·(1−f) + v[k+1]·f over
    the sorted column; NaN anywhere → NaN everywhere.
    """
    from ..state.aggregates import tree_aggregate

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        fin = v[np.isfinite(v)]
        return pd.DataFrame(
            {
                "g": [0],
                "lo": [fin.min() if len(fin) else np.inf],
                "hi": [fin.max() if len(fin) else -np.inf],
                "n_fin": [np.int64(len(fin))],
                "n_neg": [np.int64(np.sum(np.isneginf(v)))],
                "n_pos": [np.int64(np.sum(np.isposinf(v)))],
                "n_nan": [np.int64(np.sum(np.isnan(v)))],
            }
        )

    stats = tree_aggregate(
        ds, ["g"], bounds,
        {"lo": "min", "hi": "max", "n_fin": "sum", "n_neg": "sum",
         "n_pos": "sum", "n_nan": "sum"},
    ).to_pandas()
    if not len(stats):
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    row = stats.iloc[0]
    n_fin, n_neg, n_pos, n_nan = (
        int(row["n_fin"]), int(row["n_neg"]), int(row["n_pos"]), int(row["n_nan"])
    )
    n = n_fin + n_neg + n_pos  # the virtual sorted order: [-inf]*, finite, [+inf]*
    if n_nan > 0 or n == 0:  # NaN poisons every quantile (numpy + DuckDB)
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    lo, hi = float(row["lo"]), float(row["hi"])

    if n_fin == 0 or lo == hi:
        # no histogram needed: ranks resolve to -inf / the single finite
        # value / +inf directly
        def value_at_simple(rank: int) -> float:
            if rank < n_neg:
                return -np.inf
            if rank >= n_neg + n_fin:
                return np.inf
            return lo

        return _interpolate(qs, n, value_at_simple)

    edges = np.linspace(lo, hi, n_bins + 1)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[np.isfinite(v)]
        counts = np.bincount(_bin_of(v, edges, n_bins), minlength=n_bins)
        nz = np.flatnonzero(counts)  # sparse partials: zero bins add nothing
        return pd.DataFrame(
            {"bin": nz.astype(np.int64), "n": counts[nz].astype(np.int64)}
        )

    h = tree_aggregate(ds, ["bin"], hist, {"n": "sum"}).to_pandas()
    counts = np.zeros(n_bins, dtype=np.int64)
    counts[h["bin"].to_numpy(np.int64)] = h["n"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])  # finite rows before bin b

    # the order statistics every quantile needs (k and k+1 for interpolation),
    # restricted to the FINITE region of the virtual order
    targets = sorted(
        {int(np.floor(q * (n - 1))) for q in qs}
        | {min(n - 1, int(np.floor(q * (n - 1))) + 1) for q in qs}
    )
    fin_targets = [t - n_neg for t in targets if n_neg <= t < n_neg + n_fin]
    need_bins = np.array(sorted(
        {int(np.searchsorted(cum, t, side="right") - 1) for t in fin_targets}
    ), dtype=np.int64)

    inside = np.empty(0, dtype=np.float64)
    if len(need_bins):
        def collect(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(np.float64)
            v = v[np.isfinite(v)]
            keep = np.isin(_bin_of(v, edges, n_bins), need_bins)
            return pd.DataFrame({"v": v[keep]})

        inside = (
            ds.map_batches(collect, batch_format="pandas").to_pandas()["v"].to_numpy()
        )
        inside.sort(kind="stable")
    # inside is globally sorted and the needed bins are disjoint ascending
    # value ranges, so it is the concatenation of each needed bin's sorted
    # values — offsets come straight from the (verified) histogram counts
    offsets = {}
    off = 0
    for b in need_bins:
        offsets[int(b)] = off
        off += int(counts[b])
    assert off == len(inside), "histogram / collect bin assignment diverged"

    def value_at(rank: int) -> float:
        if rank < n_neg:
            return -np.inf
        if rank >= n_neg + n_fin:
            return np.inf
        r = rank - n_neg
        b = int(np.searchsorted(cum, r, side="right") - 1)
        return float(inside[offsets[b] + (r - int(cum[b]))])

    return _interpolate(qs, n, value_at)


def _interpolate(qs: list[float], n: int, value_at) -> pd.DataFrame:
    out = []
    for q in qs:
        pos = q * (n - 1)
        k = int(np.floor(pos))
        f = pos - k
        vk = value_at(k)
        if f == 0 or k + 1 > n - 1:
            v = vk
        else:
            vk1 = value_at(k + 1)
            # numpy semantics for infinite endpoints: inf*(0) terms vanish
            v = vk if vk == vk1 else vk * (1 - f) + vk1 * f
        out.append((float(q), float(v)))
    return pd.DataFrame(out, columns=["q", "value"])
