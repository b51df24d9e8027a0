"""Table profiling: per-column (row count, null count, min, max, distinct
estimate) in ONE streaming pass — the data-quality report an ingest
pipeline runs before committing a 100 TB drop.

Everything merges as a tree of exact partials:

- count/nulls are sums, min/max are min/max (order-independent, exact);
  integer mins ride as NUMBERS through the merge (a string-min over
  stringified ints would order "10" < "9") and render canonically at the
  end — ``str(int)``, identical to SQL's BIGINT->VARCHAR cast;
- the distinct estimate is the repo's md5-HLL sketch (``pipelines.sketches``)
  — register maxima keyed by (column, register) ride the SAME tree as the
  count partials, so the whole profile is one ``tree_aggregate`` and only a
  ~n_cols x 2^p register table ever reaches the driver.

Numeric min/max merge through float64 (nullable lanes): exact for |v| <
2^53 — every int64 surrogate/key this repo generates profiles through a
dedicated path at that point (doc ids are 61-63 bits; profile those as
strings or extend to a decomposed hi/lo merge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sketches import hll_estimate, hll_register_batch


def profile_columns(ds, int_cols: list[str], str_cols: list[str],
                    p: int = 12) -> pd.DataFrame:
    """-> tidy pandas (column, n_rows, n_nulls, min_v, max_v,
    distinct_hll): one pass, tree-merged. ``distinct_hll`` is the HLL
    estimate rounded to 6 dp (same contract as ``sketches.hll_distinct``)."""
    from ..state.aggregates import tree_aggregate

    int_cols, str_cols = list(int_cols), list(str_cols)
    cols = int_cols + str_cols
    int_set = frozenset(int_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            v = df[c]
            nn = v.notna()
            vv = v[nn]
            mn_s = mx_s = None
            mn_n = mx_n = np.nan
            if c in int_set:
                sv = vv.astype(np.int64)
                if len(sv):
                    mn_n, mx_n = float(sv.min()), float(sv.max())
                hvals = sv.to_numpy()
            else:
                if len(vv):
                    mn_s, mx_s = str(vv.min()), str(vv.max())
                hvals = vv.to_numpy()
            regs = hll_register_batch(hvals, p)
            regs.insert(0, "column", c)
            regs["cnt"] = np.int64(0)
            regs["nulls"] = np.int64(0)
            summary = pd.DataFrame({
                "column": [c], "register": pd.Series([-1], dtype=np.int64),
                "rho": pd.Series([0], dtype=np.int64),
                "cnt": pd.Series([len(v)], dtype=np.int64),
                "nulls": pd.Series([int((~nn).sum())], dtype=np.int64),
            })
            f = pd.concat([summary, regs], ignore_index=True)
            f["mn_s"], f["mx_s"] = mn_s, mx_s
            f["mn_n"] = np.float64(mn_n)
            f["mx_n"] = np.float64(mx_n)
            frames.append(f)
        return pd.concat(frames, ignore_index=True)

    merged = tree_aggregate(
        ds, ["column", "register"], partial,
        {"rho": "max", "cnt": "sum", "nulls": "sum",
         "mn_s": "min", "mx_s": "max", "mn_n": "min", "mx_n": "max"},
    ).to_pandas()

    m = 1 << p
    rows = []
    for c in cols:
        g = merged[merged["column"] == c]
        s = g[g["register"] == -1]
        regs = g[g["register"] >= 0]
        registers = np.zeros(m, dtype=np.int64)
        registers[regs["register"].to_numpy(np.int64)] = (
            regs["rho"].to_numpy(np.int64)
        )
        if c in int_set:
            mn = g["mn_n"].dropna().min()
            mx = g["mx_n"].dropna().max()
            min_v = str(int(mn)) if pd.notna(mn) else None
            max_v = str(int(mx)) if pd.notna(mx) else None
        else:
            min_v = g["mn_s"].dropna().min()
            max_v = g["mx_s"].dropna().max()
            min_v = None if pd.isna(min_v) else str(min_v)
            max_v = None if pd.isna(max_v) else str(max_v)
        rows.append({
            "column": c,
            "n_rows": np.int64(s["cnt"].sum()),
            "n_nulls": np.int64(s["nulls"].sum()),
            "min_v": min_v,
            "max_v": max_v,
            "distinct_hll": round(hll_estimate(registers, p), 6),
        })
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_nulls"] = out["n_nulls"].astype(np.int64)
    return out.sort_values("column", ignore_index=True)
