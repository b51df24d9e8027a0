"""Training-sequence packing (GPT-style).

Documents' token streams are concatenated in global doc-id order and cut
into fixed-length training sequences of ``seq_len`` tokens; a document spans
sequences ``tok_start // L`` .. ``(tok_start + n_tokens - 1) // L`` (docs
split across block boundaries, the standard LM pretraining layout — no
padding waste, unlike first-fit bin packing).

Everything is integer arithmetic over a distributed prefix scan
(``state.scan.ordered_prefix_sum``), so the layout is deterministic across
cluster sizes and partitionings, and a SQL window-function oracle reproduces
it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.tokenize import TOKEN_RE
from ..state.scan import ordered_prefix_sum


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset (id_col, n_tokens) — the tokenize_text count contract."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_tokens": np.fromiter(
                (len(TOKEN_RE.findall(t.lower())) for t in df[text_col]),
                dtype=np.int64, count=len(df),
            ),
        })

    return ds.map_batches(counts, batch_format="pandas")


def pack_sequences(ds, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text"):
    """-> Dataset (id_col, n_tokens, tok_start, seq_first, seq_last), only
    docs with tokens. ``tok_start`` is the doc's global token offset."""
    tc = token_counts(ds, id_col=id_col, text_col=text_col)
    p = ordered_prefix_sum(tc, id_col, "n_tokens", out_col="tok_start")

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_tokens"] > 0].reset_index(drop=True)
        start = df["tok_start"].to_numpy(np.int64)
        n = df["n_tokens"].to_numpy(np.int64)
        out = df.copy()
        out["seq_first"] = start // seq_len
        out["seq_last"] = (start + n - 1) // seq_len
        return out

    return p.map_batches(spans, batch_format="pandas")
