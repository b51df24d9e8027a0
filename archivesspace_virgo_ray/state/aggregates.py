"""Aggregation helpers tuned for Ray Data's execution profile.

``Dataset.groupby().aggregate()`` in this Ray version pays a large per-group
cost (measured: ~23s for 95k groups that pandas reduces in ~1s). For
commutative + associative aggregates the scalable alternative is a
**tree aggregate**: vectorized pandas partials per batch, then log-depth
block merges — no keyed shuffle at all while the merged partial table is
small.

Scale: the merged level-1 table is materialized (it is vocab-sized — one row
per distinct key per fanin-block, never corpus-sized) and its row count picks
the final topology:

- ``<= keyed_fallback_rows``: single-worker final merge (one block, the
  common case — cheapest by far at bench scale);
- above it: a **keyed bucket shuffle** — rows are bucketed by a deterministic
  hash of the key columns, one groupby co-locates each key's partials, and
  the same pandas merge runs per bucket. Identical results, no single-worker
  bottleneck, output is multi-block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# agg spec: {out_col: (src_col, fn)} with fn in {sum, min, max} — the partial
# must already produce out_col (e.g. a count becomes a sum of partial counts).


def _merge_fn(keys: list[str], spec: dict[str, str]):
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        # dropna=False: a null key is a real group (SQL GROUP BY parity) —
        # pandas' default would silently drop it at the merge levels even
        # when the partials kept it
        return df.groupby(keys, as_index=False, dropna=False).agg(
            **{c: (c, fn) for c, fn in spec.items()}
        )

    return merge


# final-merge topology switch: below this many merged partial rows one
# worker reduces them faster than any shuffle's fixed cost; above it the
# keyed bucket shuffle spreads the reduction (and the result's memory)
KEYED_FALLBACK_ROWS = 2_000_000
_ROWS_PER_BUCKET = 1_000_000


def tree_aggregate(
    ds,
    keys: list[str],
    partial_fn,
    spec: dict[str, str],
    fanin: int = 8,
    keyed_fallback_rows: int = KEYED_FALLBACK_ROWS,
    expected_rows: int | None = None,
):
    """partial_fn: batch -> partial rows (keys + spec cols). spec: col->fn
    for merging partials. Exact for sum/min/max compositions.

    Returns a 1-block Dataset below ``keyed_fallback_rows`` merged partial
    rows, a multi-block Dataset (keyed bucket shuffle) above it — same
    values either way.

    ``expected_rows``: caller's upper-bound hint for the DISTINCT-KEY
    cardinality (e.g. input row count when keys are ~unique, as in exact
    content-hash dedup). When it exceeds ``keyed_fallback_rows`` the tree is
    skipped entirely — even the ``repartition(fanin)`` level-1 merge would
    concentrate a corpus-sized partial table onto ``fanin`` workers — and
    the partials go straight to the keyed bucket shuffle."""
    # batch_size=None: one partial per BLOCK, not per 1024-row default batch
    # — partial fns here are vectorized, so per-call overhead (frame
    # construction, groupby setup, hash tables) dominates at small batches;
    # block-sized batches cut the call count ~100x with identical results
    p = ds.map_batches(partial_fn, batch_format="pandas", batch_size=None)
    merge = _merge_fn(keys, spec)
    if expected_rows is not None and expected_rows > keyed_fallback_rows:
        return _keyed_bucket_merge(p, keys, merge, expected_rows, fanin)
    # level 1 is materialized on purpose: it is the aggregated partial table
    # (vocab-sized), and its count decides the final topology for free
    level1 = (
        p.repartition(fanin)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .materialize()
    )
    n = level1.count()
    if n <= keyed_fallback_rows:
        return level1.repartition(1).map_batches(
            merge, batch_format="pandas", batch_size=None
        )
    return _keyed_bucket_merge(level1, keys, merge, n, fanin)


def _keyed_bucket_merge(partials, keys: list[str], merge, n_rows: int, fanin: int):
    """Bucket partial rows by a deterministic key hash, co-locate each key's
    partials with ONE groupby shuffle, and run the pandas merge per bucket.
    Multi-block output; no single-worker (or fanin-worker) funnel."""
    n_buckets = max(fanin, -(-n_rows // _ROWS_PER_BUCKET))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # deterministic multi-column hash (strings + numerics + nulls) — the
        # same key lands in the same bucket from every partial block
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy(np.uint64)
        df["__kb__"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return merge(g.drop(columns="__kb__"))

    return (
        partials.map_batches(bucketize, batch_format="pandas")
        .groupby("__kb__")
        .map_groups(merge_bucket, batch_format="pandas")
    )
