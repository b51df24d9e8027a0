"""Distributed ordered prefix scan.

The classic two-pass parallel scan, expressed over Ray Data blocks:

1. globally sort by a UNIQUE order key (range partitioning — blocks are
   non-overlapping key ranges in block order) and materialize ONCE;
2. pass A reduces each block to (block_min_key, block_sum) — one tiny row
   per block on the driver;
3. pass B re-maps the SAME materialized blocks (``batch_size=None`` keeps
   block granularity, so pass A/B batches coincide) and adds
   ``exclusive local cumsum + offset``, where the block's offset is the sum
   of all pass-A block sums with a smaller block_min_key.

Cost: one sort shuffle + two streaming passes; driver state is one row per
block (not per row), so the scan holds at 100 TB — the offset table for a
million blocks is megabytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ordered_prefix_sum(ds, order_col: str, value_col: str, out_col: str = "prefix"):
    """Adds ``out_col`` = EXCLUSIVE prefix sum of ``value_col`` in global
    ``order_col`` order (int64). ``order_col`` values must be unique — they
    define the scan order and the block-offset lookup. Returns a Dataset
    sorted by ``order_col``."""
    s = ds.sort(order_col).materialize()

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "blk_min": pd.Series([], dtype=np.int64),
                "blk_sum": pd.Series([], dtype=np.int64),
            })
        return pd.DataFrame({
            "blk_min": [np.int64(df[order_col].min())],
            "blk_sum": [np.int64(df[value_col].sum())],
        })

    summary = (
        s.map_batches(block_summary, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("blk_min", ignore_index=True)
    )
    blk_min = summary["blk_min"].to_numpy(np.int64)
    blk_sum = summary["blk_sum"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(blk_sum)[:-1]]).astype(np.int64)
    offset_by_min = dict(zip(blk_min.tolist(), offsets.tolist()))

    def add_prefix(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(order_col).reset_index(drop=True)
        v = df[value_col].to_numpy(np.int64)
        local_excl = np.concatenate([[0], np.cumsum(v)[:-1]]).astype(np.int64)
        off = offset_by_min[int(df[order_col].min())]
        out = df.copy()
        out[out_col] = local_excl + np.int64(off)
        return out

    return s.map_batches(add_prefix, batch_format="pandas", batch_size=None)


def grouped_prefix_sum(
    ds, part_col: str, order_cols: list[str], value_col: str,
    out_col: str = "running",
):
    """INCLUSIVE per-partition running sum in ``order_cols`` order — the
    SQL window ``sum(value) OVER (PARTITION BY part ORDER BY order...)``
    as a distributed segmented scan. ``order_cols`` must be unique within
    a partition; ``value_col`` is summed as int64 (exact).

    Same two-pass shape as ``ordered_prefix_sum``, generalized to
    segments: one sort shuffle on (part, *order), a per-(block, part)
    partial-sum summary on the driver — ≈ n_parts + n_blocks rows, since a
    partition contributes one row per block it touches and only
    block-SPANNING partitions touch more than one — then one streaming
    re-map adding ``per-block exclusive local cumsum + the part's offset
    from earlier blocks``."""
    keys = [part_col, *order_cols]
    s = ds.sort(keys).materialize()

    blk_cols = [f"blk_{k}" for k in keys]

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=[*blk_cols, "part", "psum"])
        df = df.sort_values(keys).reset_index(drop=True)
        g = df.groupby(part_col, sort=False)[value_col].sum().reset_index()
        out = pd.DataFrame({
            "part": g[part_col].to_numpy(),
            "psum": g[value_col].to_numpy(np.int64),
        })
        # the block's first composite key, as typed columns (Arrow-safe)
        for bc, k in zip(blk_cols, keys):
            out[bc] = df.iloc[0][k]
        return out[[*blk_cols, "part", "psum"]]

    summary = (
        s.map_batches(block_summary, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    # blocks are non-overlapping composite-key ranges: ordering them by
    # their first-row key reconstructs the global order
    summary = summary.sort_values(blk_cols, ignore_index=True)
    offset_by_blk_part: dict = {}
    totals: dict = {}
    for row in summary.itertuples(index=False):
        blk_id = tuple(getattr(row, bc) for bc in blk_cols)
        part = row.part
        offset_by_blk_part[(blk_id, part)] = totals.get(part, 0)
        totals[part] = totals.get(part, 0) + int(row.psum)

    def add_running(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(keys).reset_index(drop=True)
        blk_id = tuple(df.iloc[0][k] for k in keys)
        local = df.groupby(part_col, sort=False)[value_col].cumsum() \
                  .to_numpy(np.int64)
        offs = np.fromiter(
            (offset_by_blk_part[(blk_id, p)] for p in df[part_col]),
            dtype=np.int64, count=len(df),
        )
        out = df.copy()
        out[out_col] = local + offs
        return out

    return s.map_batches(add_running, batch_format="pandas", batch_size=None)


def ordered_row_number(ds, order_col: str, out_col: str = "pos"):
    """Adds ``out_col`` = 1-based global row number in ``order_col`` order
    (SQL ``row_number() OVER (ORDER BY order_col)``). ``order_col`` values
    must be UNIQUE strings (or otherwise totally ordered scalars) — they
    define both the scan order and the block-offset lookup. Same two-pass
    shape as ``ordered_prefix_sum``: one sort shuffle, one tiny
    row-per-block driver table, one streaming re-map."""
    s = ds.sort(order_col).materialize()

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"blk_min": pd.Series([], dtype=object),
                                 "blk_n": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"blk_min": [df[order_col].min()],
                             "blk_n": [np.int64(len(df))]})

    summary = (
        s.map_batches(block_summary, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("blk_min", ignore_index=True)
    )
    blk_n = summary["blk_n"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(blk_n)[:-1]]).astype(np.int64)
    offset_by_min = dict(zip(summary["blk_min"].tolist(), offsets.tolist()))

    def add_pos(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(order_col).reset_index(drop=True)
        off = offset_by_min[df[order_col].iloc[0]]
        out = df.copy()
        out[out_col] = np.arange(1, len(df) + 1, dtype=np.int64) + np.int64(off)
        return out

    return s.map_batches(add_pos, batch_format="pandas", batch_size=None)
