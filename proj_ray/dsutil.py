"""Small driver-side Dataset utilities shared across modules."""

from __future__ import annotations


def pull_pandas(ds):
    """Driver-side pull of a SMALL table as pandas without spinning up
    a fresh streaming execution.

    `iter_batches`/`to_pandas` on an already-materialized dataset
    builds and tears down a whole new executor (~0.5-1 s fixed,
    measured: 0.92 s vs 0.007 s for the same 200k-row 8-block pull) —
    `ray.get` on the materialized block refs is milliseconds. Only for
    tables known to fit the driver; every caller gates on a row cap.
    """
    import pandas as pd
    import pyarrow as pa
    import ray
    from ray.data.dataset import MaterializedDataset

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    refs = [r for bun in mat.iter_internal_ref_bundles()
            for r in bun.block_refs]
    blocks = ray.get(refs)
    dfs = [b.to_pandas() if isinstance(b, pa.Table) else pd.DataFrame(b)
           for b in blocks if len(b)]
    if not dfs:
        cols = mat.schema().names if mat.schema() is not None else []
        return pd.DataFrame({c: [] for c in cols})
    return pd.concat(dfs, ignore_index=True) if len(dfs) > 1 else \
        dfs[0].reset_index(drop=True)
