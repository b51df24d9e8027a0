"""Exact distributed quantiles without a global sort.

The classic two-pass refinement: a histogram pass brackets each target
order statistic into a narrow value range, a second pruned pass collects
only the rows inside those bins (≈ n/n_bins rows each), and the exact
interpolated quantile (``quantile_cont`` / numpy ``linear`` semantics) is
computed from that small set. Cost: two streaming scans plus a driver-side
set bounded by ``n_needed_bins × n/n_bins`` — at 10^12 rows and 65k bins
that's ~10^7 values per bin; a degenerate mass point concentrates a bin but
the collected values are exact either way (add one more refinement level if
a bin must shrink further).

Both passes share ONE bin-assignment rule (``searchsorted`` on the same
edge array; last bin right-closed) — np.histogram's internal scaling can
disagree with edge comparisons by 1 ulp, which would misalign ranks.
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

    Matches ``quantile_cont`` / ``numpy.quantile(method="linear")``:
    q·(n−1) = k + f → value = v[k]·(1−f) + v[k+1]·f over the sorted column.
    """
    from ..state.aggregates import tree_aggregate

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"g": pd.Series(dtype=np.int64),
                                 "lo": pd.Series(dtype=np.float64),
                                 "hi": pd.Series(dtype=np.float64),
                                 "n": pd.Series(dtype=np.int64)})
        return pd.DataFrame(
            {"g": [0], "lo": [v.min()], "hi": [v.max()], "n": [np.int64(len(v))]}
        )

    stats = tree_aggregate(
        ds, ["g"], mm, {"lo": "min", "hi": "max", "n": "sum"}
    ).to_pandas()
    if not len(stats) or int(stats["n"].iloc[0]) == 0:
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    lo = float(stats["lo"].iloc[0])
    hi = float(stats["hi"].iloc[0])
    n = int(stats["n"].iloc[0])
    if lo == hi:
        return pd.DataFrame({"q": qs, "value": [lo] * len(qs)})
    edges = np.linspace(lo, hi, n_bins + 1)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        counts = np.bincount(_bin_of(v, edges, n_bins), minlength=n_bins)
        return pd.DataFrame(
            {"bin": np.arange(n_bins, dtype=np.int64), "n": counts.astype(np.int64)}
        )

    h = tree_aggregate(ds, ["bin"], hist, {"n": "sum"}).to_pandas()
    counts = np.zeros(n_bins, dtype=np.int64)
    counts[h["bin"].to_numpy(np.int64)] = h["n"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])  # rows strictly before bin b

    # the order statistics every quantile needs (k and k+1 for interpolation)
    targets = sorted(
        {int(np.floor(q * (n - 1))) for q in qs}
        | {min(n - 1, int(np.floor(q * (n - 1))) + 1) for q in qs}
    )
    need_bins = np.array(sorted(
        {int(np.searchsorted(cum, t, side="right") - 1) for t in targets}
    ), dtype=np.int64)
    # pass 2: collect ONLY rows whose bin is needed (pruned scan)
    def collect(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        b = _bin_of(v, edges, n_bins)
        keep = np.isin(b, need_bins)
        return pd.DataFrame({"v": v[keep]})

    inside = ds.map_batches(collect, batch_format="pandas").to_pandas()["v"].to_numpy()
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
        b = int(np.searchsorted(cum, rank, side="right") - 1)
        return float(inside[offsets[b] + (rank - int(cum[b]))])

    out = []
    for q in qs:
        pos = q * (n - 1)
        k = int(np.floor(pos))
        f = pos - k
        vk = value_at(k)
        v = vk if f == 0 or k + 1 > n - 1 else vk * (1 - f) + value_at(k + 1) * f
        out.append((float(q), float(v)))
    return pd.DataFrame(out, columns=["q", "value"])
