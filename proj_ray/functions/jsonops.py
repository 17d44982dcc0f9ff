"""Semi-structured (JSON-string) column operators.

The reference has no JSON surface — its closest analogue is the
`+key=value` argument grammar of `src/pj_param.cpp` — so this is an
engine-added operator for the `events.props`-style column every
web-scale event table carries.

Scale shape: extraction is a stateless `map_batches` over the string
column only (prune at the read); nothing shuffles. The fast path is a
compiled regex run through pandas' C string engine (one pass over the
batch, no per-row Python). Rows the regex cannot service safely —
escaped strings or nested objects, where a flat scan could match a key
inside a sub-object — fall back to `json.loads` FOR THOSE ROWS ONLY,
so a 99%-flat corpus pays the Python loop on 1% of rows.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

__all__ = ["extract_json_int64", "json_key_stats"]


def _flat_int_pattern(key: str) -> re.Pattern:
    # "key" : -123   (flat scalar integer; no nesting/escape handling)
    return re.compile(r'"' + re.escape(key) + r'"\s*:\s*(-?\d+)')


# A row is "flat" when it contains no escape and no nested object /
# array opener after the leading '{' — then a regex key scan cannot
# match a same-named key inside a sub-document.
_NESTED = re.compile(r"[\\[]|.\{")


def extract_json_int64(series: pd.Series, key: str,
                       default: int = 0) -> np.ndarray:
    """Vectorized `json_extract(col, '$.key')::BIGINT` over a pandas
    string Series. Missing key / null / non-integer value -> default."""
    s = series.astype(str)
    out = s.str.extract(_flat_int_pattern(key), expand=False)
    nested = s.str.contains(_NESTED, regex=True)
    if bool(nested.any()):
        def slow(txt: str):
            try:
                v = json.loads(txt).get(key)
            except (ValueError, AttributeError):
                return None
            return v if isinstance(v, int) and not isinstance(v, bool) \
                else None
        out = out.where(~nested, s[nested].map(slow))
    vals = pd.to_numeric(out, errors="coerce").fillna(default)
    return vals.to_numpy(dtype=np.int64)


def json_key_stats(ds, json_col: str, key: str, group_col: str,
                   batch_size: int = 8192):
    """Per-`group_col` stats of an integer JSON field: n, sum, max.

    One extraction pass (per-block partial sums over the tiny group
    domain), one small combine groupby — the exchange carries
    (group, n, sum, max) partials, never the JSON strings.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = extract_json_int64(df[json_col], key)
        g = pd.DataFrame({group_col: df[group_col].to_numpy(), "_k": k})
        agg = g.groupby(group_col, sort=False)["_k"].agg(
            ["count", "sum", "max"]).reset_index()
        return pd.DataFrame({
            group_col: agg[group_col],
            "n": agg["count"].to_numpy(np.int64),
            "sum_k": agg["sum"].to_numpy(np.int64),
            "max_k": agg["max"].to_numpy(np.int64),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "n": [np.int64(df["n"].sum())],
            "sum_k": [np.int64(df["sum_k"].sum())],
            "max_k": [np.int64(df["max_k"].max())],
        })

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=batch_size)
    return parts.groupby(group_col).map_groups(
        combine, batch_format="pandas")
