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


def grouped_quantiles(
    ds, group_col: str, col: str, qs: list[float], n_bins: int = 1024
) -> pd.DataFrame:
    """-> (group_col, q, value): exact per-group continuous quantiles —
    the Solr stats.facet / JSON-facet ``percentile`` sub-aggregation.

    Same three streaming passes as ``exact_quantiles``, keyed by group:
    per-group bounds, ONE per-(group, bin) sparse histogram pass (each
    group gets its own edge array, broadcast in the closure — facet
    cardinality × n_bins driver rows, never corpus-sized), and one pruned
    collect of only the bracketing bins' rows per group. Semantics per
    group identical to ``exact_quantiles`` (numpy linear / quantile_cont;
    NaN poisons that group's quantiles only)."""
    from ..state.aggregates import tree_aggregate

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, dropna=False):
            v = sub[col].to_numpy(np.float64)
            fin = v[np.isfinite(v)]
            rows.append((
                g,
                fin.min() if len(fin) else np.inf,
                fin.max() if len(fin) else -np.inf,
                np.int64(len(fin)),
                np.int64(np.sum(np.isneginf(v))),
                np.int64(np.sum(np.isposinf(v))),
                np.int64(np.sum(np.isnan(v))),
            ))
        return pd.DataFrame(
            rows, columns=[group_col, "lo", "hi", "n_fin", "n_neg",
                           "n_pos", "n_nan"]
        )

    stats = tree_aggregate(
        ds, [group_col], bounds,
        {"lo": "min", "hi": "max", "n_fin": "sum", "n_neg": "sum",
         "n_pos": "sum", "n_nan": "sum"},
    ).to_pandas()
    if not len(stats):
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "q": pd.Series([], dtype=np.float64),
                             "value": pd.Series([], dtype=np.float64)})

    # groups needing a histogram (spread finite values); the rest resolve
    # directly from bounds
    edges_by_g: dict = {}
    meta: dict = {}
    for _, r in stats.iterrows():
        g = r[group_col]
        n_fin, n_neg, n_pos, n_nan = (
            int(r["n_fin"]), int(r["n_neg"]), int(r["n_pos"]), int(r["n_nan"])
        )
        lo, hi = float(r["lo"]), float(r["hi"])
        meta[g] = (n_fin, n_neg, n_pos, n_nan, lo, hi)
        if n_nan == 0 and n_fin > 0 and lo != hi:
            edges_by_g[g] = np.linspace(lo, hi, n_bins + 1)

    h = pd.DataFrame({group_col: [], "bin": [], "n": []})
    if edges_by_g:
        def hist(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for g, sub in df.groupby(group_col, dropna=False):
                edges = edges_by_g.get(g)
                if edges is None:
                    continue
                v = sub[col].to_numpy(np.float64)
                v = v[np.isfinite(v)]
                counts = np.bincount(_bin_of(v, edges, n_bins),
                                     minlength=n_bins)
                nz = np.flatnonzero(counts)
                for b in nz:
                    rows.append((g, np.int64(b), np.int64(counts[b])))
            return pd.DataFrame(rows, columns=[group_col, "bin", "n"])

        h = tree_aggregate(
            ds, [group_col, "bin"], hist, {"n": "sum"}
        ).to_pandas()

    cum_by_g: dict = {}
    need_by_g: dict = {}
    for g, edges in edges_by_g.items():
        n_fin, n_neg, n_pos, n_nan, lo, hi = meta[g]
        n = n_fin + n_neg + n_pos
        sub = h[h[group_col] == g]
        counts = np.zeros(n_bins, dtype=np.int64)
        counts[sub["bin"].to_numpy(np.int64)] = sub["n"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(counts)])
        targets = sorted(
            {int(np.floor(q * (n - 1))) for q in qs}
            | {min(n - 1, int(np.floor(q * (n - 1))) + 1) for q in qs}
        )
        fin_targets = [t - n_neg for t in targets if n_neg <= t < n_neg + n_fin]
        need = np.array(sorted(
            {int(np.searchsorted(cum, t, side="right") - 1)
             for t in fin_targets}
        ), dtype=np.int64)
        cum_by_g[g] = (counts, cum)
        if len(need):
            need_by_g[g] = need

    inside_by_g: dict = {}
    if need_by_g:
        def collect(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for g, sub in df.groupby(group_col, dropna=False):
                need = need_by_g.get(g)
                if need is None:
                    continue
                edges = edges_by_g[g]
                v = sub[col].to_numpy(np.float64)
                v = v[np.isfinite(v)]
                keep = v[np.isin(_bin_of(v, edges, n_bins), need)]
                rows.append(pd.DataFrame({group_col: g, "v": keep}))
            if not rows:
                return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                     "v": pd.Series([], dtype=np.float64)})
            return pd.concat(rows, ignore_index=True)

        gathered = ds.map_batches(collect, batch_format="pandas").to_pandas()
        for g, sub in gathered.groupby(group_col, dropna=False):
            vv = sub["v"].to_numpy(np.float64)
            vv.sort(kind="stable")
            inside_by_g[g] = vv

    frames = []
    for g, (n_fin, n_neg, n_pos, n_nan, lo, hi) in meta.items():
        n = n_fin + n_neg + n_pos
        if n_nan > 0 or n == 0:
            out = pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
        elif g not in edges_by_g:
            def value_at_simple(rank: int, n_neg=n_neg, n_fin=n_fin, lo=lo):
                if rank < n_neg:
                    return -np.inf
                if rank >= n_neg + n_fin:
                    return np.inf
                return lo

            out = _interpolate(qs, n, value_at_simple)
        else:
            counts, cum = cum_by_g[g]
            inside = inside_by_g.get(g, np.empty(0, np.float64))
            need = need_by_g.get(g, np.empty(0, np.int64))
            offsets = {}
            off = 0
            for b in need:
                offsets[int(b)] = off
                off += int(counts[b])
            assert off == len(inside), \
                "histogram / collect bin assignment diverged"

            def value_at(rank: int, n_neg=n_neg, n_fin=n_fin, cum=cum,
                         inside=inside, offsets=offsets):
                if rank < n_neg:
                    return -np.inf
                if rank >= n_neg + n_fin:
                    return np.inf
                r = rank - n_neg
                b = int(np.searchsorted(cum, r, side="right") - 1)
                return float(inside[offsets[b] + (r - int(cum[b]))])

            out = _interpolate(qs, n, value_at)
        out.insert(0, group_col, g)
        frames.append(out)
    return pd.concat(frames, ignore_index=True).sort_values(
        [group_col, "q"], ignore_index=True
    )


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
