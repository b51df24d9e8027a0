"""Join operators beyond broadcast: bucketed hash join and as-of join.

The guide's portable pattern for big×big joins (no broadcastable side): add
``bucket = hash(key) % B`` to both sides, co-locate buckets with ONE
groupby, and merge the two sides pairwise inside each group. As-of joins
sort within the key group and use ``pd.merge_asof``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _canonical_key_hash(arr) -> np.ndarray:
    """Dtype-stable key hash: an int64 key that was promoted to float64 by
    NaN-padding upstream (e.g. the pandas view of a previous hash_join's
    union) must land in the SAME bucket as the int64 side — hash integral
    values as int64 regardless of physical dtype."""
    if isinstance(arr, pd.Series) and str(arr.dtype) == "Int64":
        # nullable-int key (e.g. the output of a previous hash_join): hash
        # LOSSLESSLY as int64 — routing through float64 would corrupt keys
        # with |key| >= 2^53 (content-derived doc ids are 61-63 bits). NA
        # keys never match an inner merge, so any stable bucket (-1) works.
        arr = arr.to_numpy(dtype=np.int64, na_value=-1)
    a = np.asarray(arr)
    if a.dtype.kind in "iu":
        a = a.astype(np.int64)
    elif a.dtype.kind == "f":
        # genuinely-float input only (a frame assembled outside hash_join
        # whose int key was NaN-padded): integral floats canonicalize to
        # int64 so they co-bucket with the int side. The float64 mantissa
        # bounds this branch to |key| < 2^53 — keys wider than that must
        # arrive as int64/Int64 (hash_join's own outputs always do).
        nan = np.isnan(a)
        if bool(np.all(nan | (a == np.floor(np.where(nan, 0.0, a))))):
            # NaN keys never match an inner merge; any stable bucket works
            a = np.where(nan, -1.0, a).astype(np.int64)
    return pd.util.hash_array(a, categorize=False)


def hash_join(
    left,
    right,
    on: str,
    n_buckets: int = 32,
    how: str = "inner",
    suffixes: tuple = ("_l", "_r"),
):
    """Bucketed hash join of two Datasets on one key column.

    Both sides are tagged, bucketed by a deterministic key hash, unioned,
    and each bucket group performs a pandas merge of its two halves — one
    all-to-all exchange total. Skewed keys: bump ``n_buckets`` or pre-salt
    the hot key's rows (the key must then be re-aggregated downstream).
    Chains safely: integer columns NaN-padded to float by the union are
    hashed canonically; output int columns come back as NULL-SAFE pandas
    ``Int64`` (Arrow int64-with-nulls) — identical across bucket groups
    whether or not a particular group saw join misses or null inputs.
    """
    import pyarrow.types as pat

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side__"] = side
            df["__bucket__"] = (
                _canonical_key_hash(df[on]) % np.uint64(n_buckets)
            ).astype(np.int64)
            return df

        return fn

    def _is_int_type(t) -> bool:
        try:
            return pat.is_integer(t)
        except (AttributeError, TypeError):
            try:  # pandas-backed blocks report numpy dtypes / python types
                return np.dtype(t).kind in "iu"
            except TypeError:
                return False

    def _int_cols(ds_) -> set:
        sch = ds_.schema()
        return {n for n, t in zip(sch.names, sch.types) if _is_int_type(t)}

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    int_cols = _int_cols(left) | _int_cols(right)
    tagged = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    all_cols = list(dict.fromkeys(["__side__"] + left_cols + right_cols))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # a group may hold blocks from one side only (or the union's
        # superset schema) — normalize to the full column set, then slice
        # each side back to its own columns before merging
        g = g.reindex(columns=all_cols)
        lhs = g.loc[g["__side__"] == "l", left_cols]
        rhs = g.loc[g["__side__"] == "r", right_cols]
        out = lhs.merge(rhs, on=on, how=how, suffixes=suffixes)
        # dtype policy must be GLOBAL (identical across bucket groups, or
        # the result's blocks carry conflicting schemas) and NULL-SAFE
        # (the union's NaN padding, outer-join misses, and nullable-int
        # source data all put NaN in int columns): go through pandas'
        # masked Int64 and emit an ARROW block — every group then carries
        # int64-with-nulls, and a null-free result reads back as plain int64
        out = out.reset_index(drop=True)
        for c in out.columns:
            if c in int_cols and out[c].dtype != "Int64":
                out[c] = out[c].astype("Int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return tagged.groupby("__bucket__").map_groups(merge, batch_format="pandas")


def asof_join_per_key(
    left,
    right,
    key: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tie_cols: list[str] | None = None,
):
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same key (direction="backward").

    ``tie_cols``: deterministic tie-break for equal right-side timestamps —
    rows are sorted by (ts, *tie_cols) so merge_asof picks the greatest
    tie_cols among equal ts (group order after a shuffle is arbitrary, so an
    explicit tie order is mandatory for reproducibility).

    Implemented as ONE hash-bucketed groupby over the tagged union (bounded
    bucket count — grouping by the raw key would pay Ray's per-group Python
    call per distinct key), then a sorted ``pd.merge_asof(by=key)`` per
    bucket, which matches per key inside the bucket. The partitioning
    assumption is that a BUCKET's rows fit one worker (document per call
    site); a skewed single key still lands whole in one bucket, as any
    per-key as-of must."""

    def tag(side: str, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keep].copy()
            out["__side__"] = side
            return out

        return fn

    lcols = list(dict.fromkeys([key, ts]))
    lcols_all = lcols + [c for c in left.schema().names if c not in lcols]
    rcols = list(dict.fromkeys([key, ts] + value_cols))
    tagged = left.map_batches(tag("l", lcols_all), batch_format="pandas").union(
        right.map_batches(tag("r", rcols), batch_format="pandas")
    )

    asof_cols = list(dict.fromkeys(["__side__"] + lcols_all + rcols))
    _ASOF_BUCKETS = 256

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key], index=False)
        df = df.copy()
        df["__kb__"] = (
            h.to_numpy(np.uint64) % np.uint64(_ASOF_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reindex(columns=asof_cols)
        # both sides sorted by ts GLOBALLY within the bucket (merge_asof's
        # `on` precondition); stable sort keeps the (ts, *tie_cols) order,
        # and by=key matches per key inside the bucket
        lhs = g.loc[g["__side__"] == "l", lcols_all].sort_values(
            ts, kind="mergesort"
        )
        rhs = (
            g.loc[g["__side__"] == "r", rcols]
            .sort_values([ts] + list(tie_cols or []), kind="mergesort")
        )
        if len(lhs) == 0:
            return lhs
        out = pd.merge_asof(
            lhs, rhs, on=ts, by=key, direction=direction, suffixes=("", "_asof")
        )
        return out.reset_index(drop=True)

    return (
        tagged.map_batches(key_bucket, batch_format="pandas")
        .groupby("__kb__")
        .map_groups(merge, batch_format="pandas")
    )
