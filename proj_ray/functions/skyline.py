"""Distributed 2-D skyline (Pareto frontier) over Ray Data datasets.

Engine-added operator: the rows not dominated by any other row, where
row b dominates row a iff b is <= on the minimized column and >= on
the maximized column with at least one strict inequality. Duplicated
(min, max) points dominate nothing and are all retained — the SQL
NOT-EXISTS dominance oracle reproduces the row set exactly.

Scale shape: dominance inside a block implies dominance globally, so
each block first reduces to its LOCAL skyline with one vectorized
sort + running-max sweep (output is a superset of the global skyline
restricted to the block, typically a few dozen rows however large the
block); the final exact sweep runs over the concatenated partials —
a single tiny group, never the corpus. One narrow projection crosses
the shuffle; no all-pairs comparison anywhere.
"""

from __future__ import annotations

import numpy as np


def _sweep(df, min_col: str, max_col: str):
    """Exact 2-D skyline of one in-memory frame: sort by the minimized
    column, keep rows that (a) hold their price-group's max of the
    maximized column and (b) strictly exceed the running max of all
    strictly-smaller groups."""
    s = df.sort_values([min_col, max_col],
                       ascending=[True, False], kind="mergesort")
    mn = s[min_col].to_numpy()
    mx = s[max_col].to_numpy()
    # group boundaries over the sorted minimized column
    new_grp = np.empty(len(s), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = mn[1:] != mn[:-1]
    grp = np.cumsum(new_grp) - 1
    # per-group max (first element of each group after the sort)
    starts = np.nonzero(new_grp)[0]
    gmax = mx[starts]
    # running max of all STRICTLY cheaper groups
    prev = np.empty(len(gmax), dtype=mx.dtype)
    if len(gmax):
        prev[0] = np.iinfo(np.int64).min if mx.dtype.kind == "i" \
            else -np.inf
        run = np.maximum.accumulate(gmax)
        prev[1:] = run[:-1]
    keep = (mx == gmax[grp]) & (mx > prev[grp])
    return s[keep]


def skyline2d(ds, min_col: str, max_col: str, extra_cols: tuple = ()):
    """-> the exact 2-D skyline rows (minimize `min_col`, maximize
    `max_col`), with `extra_cols` carried through."""
    import pandas as pd

    need = list(dict.fromkeys([min_col, max_col, *extra_cols]))

    def local(batch):
        df = pd.DataFrame({c: np.asarray(batch[c]) for c in need})
        out = _sweep(df, min_col, max_col)
        out = out.copy()
        out["_one"] = np.zeros(len(out), dtype=np.int8)
        return out

    def final(group: "pd.DataFrame") -> "pd.DataFrame":
        return _sweep(group, min_col, max_col).drop(columns=["_one"])

    return (ds.map_batches(local, batch_format="pandas",
                           batch_size=65536)
            .groupby("_one").map_groups(final, batch_format="pandas"))
