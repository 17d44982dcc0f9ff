"""Lance table source/sink (the BASELINE input_hint names a Lance
image+caption table; SURVEY §1.5 maps it to `ray.data.read_lance`).

The `pylance` wheel is not in this container, so the Lance path is
gated behind an import probe with a clearly-reported fallback to
parquet — the Ray-side plumbing (column pruning at the read, schema,
partitioned resumable writes) is identical for both formats, and the
format dispatch is what a production deployment would flip.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_path(path: str) -> bool:
    """A Lance dataset is a directory with a `_versions` manifest dir
    (or the conventional .lance suffix)."""
    return path.endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path,
                                                           "_versions")))


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Read a table as a Ray Dataset with column pruning pushed to the
    reader where the format supports it. Dispatch by path shape:
    Lance dataset dir -> read_lance; .csv -> read_csv (pruning pushed
    via Arrow ConvertOptions.include_columns); .json/.jsonl ->
    read_json (row-oriented text: pruning applied right after parse —
    the format itself cannot skip columns at I/O); otherwise parquet
    (file, dir, or list)."""
    import ray.data as rd

    if is_lance_path(path):
        if not lance_available():
            raise NotImplementedError(
                "operator not implemented: Lance reader (pylance wheel "
                f"not installed; cannot read {path})")
        return rd.read_lance(path, columns=columns, **kwargs)
    low = path.lower() if isinstance(path, str) else ""
    if low.endswith(".csv"):
        if columns:
            from pyarrow import csv as pacsv

            kwargs.setdefault(
                "convert_options",
                pacsv.ConvertOptions(include_columns=list(columns)))
        return rd.read_csv(path, **kwargs)
    if low.endswith((".json", ".jsonl")):
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if low.endswith((".orc", ".feather", ".arrow", ".ipc")):
        return _read_arrow_files(path, columns)
    if isinstance(path, str) and os.path.isdir(path):
        import glob as _glob

        if any(_glob.glob(os.path.join(path, pat))
               for pat in ("*.orc", "*.feather", "*.arrow", "*.ipc")):
            return _read_arrow_files(path, columns)
    return rd.read_parquet(path, columns=columns, **kwargs)


def _read_arrow_files(path: str, columns: list[str] | None = None):
    """ORC / Feather (Arrow IPC) reader: Ray Data ships no built-in
    for these, so files distribute one-per-task via from_items and
    each task reads its file with pyarrow, column pruning pushed to
    the format reader (ORC reads only the selected column streams;
    Feather/IPC memory-maps and slices). Scale shape: parallelism =
    file count — the same contract as read_parquet over a sharded
    directory; single giant files should be sharded at write time
    (write_table does)."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    if _os.path.isdir(path):
        files = sorted(f for pat in ("*.orc", "*.feather", "*.arrow",
                                     "*.ipc")
                       for f in _glob.glob(_os.path.join(path, pat)))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no ORC/Feather files under {path}")

    def read_one(b: dict):
        import pyarrow as pa

        tabs = []
        for p in b["item"]:
            p = str(p)
            if p.lower().endswith(".orc"):
                import pyarrow.orc as orc

                tabs.append(orc.read_table(p, columns=columns))
            else:
                import pyarrow.feather as fe

                t = fe.read_table(p, columns=columns, memory_map=True)
                tabs.append(t)
        return pa.concat_tables(tabs)

    return rd.from_items(files, override_num_blocks=len(files)) \
        .map_batches(read_one, batch_format="numpy", batch_size=1)


def write_table(ds, path: str, fmt: str = "auto",
                partition_cols: list[str] | None = None, **kwargs):
    """Write a Dataset. fmt: 'lance' | 'parquet' | 'auto' (lance when
    the wheel is importable and the path looks like a Lance dataset,
    else parquet). Partitioned parquet writes (`partition_cols`) are
    the resumable layout — one directory per key."""
    if fmt == "lance" or (fmt == "auto" and path.endswith(".lance")):
        if not lance_available():
            raise NotImplementedError(
                "operator not implemented: Lance writer (pylance wheel "
                "not installed)")
        return ds.write_lance(path, **kwargs)
    if fmt == "csv" or (fmt == "auto" and path.endswith(".csv")):
        return ds.write_csv(path, **kwargs)
    if fmt in ("json", "jsonl") or (fmt == "auto" and
                                    path.endswith((".json", ".jsonl"))):
        return ds.write_json(path, **kwargs)
    if fmt in ("orc", "feather") or (
            fmt == "auto" and path.endswith((".orc", ".feather"))):
        return _write_arrow_files(ds, path, fmt if fmt != "auto"
                                  else ("orc" if path.endswith(".orc")
                                        else "feather"))
    if partition_cols:
        return ds.write_parquet(path, partition_cols=partition_cols,
                                **kwargs)
    return ds.write_parquet(path, **kwargs)


def _write_arrow_files(ds, path: str, fmt: str):
    """Sharded ORC / Feather writer: one file per block, written where
    the block lives (map_batches side-effect per task, the same
    pattern as Ray's file datasinks), so a later _read_arrow_files
    gets file-count parallelism back."""
    import os as _os

    _os.makedirs(path, exist_ok=True)

    def write_one(b):
        import uuid

        import pyarrow as pa

        t = pa.table({k: b[k] for k in b})
        name = _os.path.join(path, f"part-{uuid.uuid4().hex}.{fmt}")
        if fmt == "orc":
            import pyarrow.orc as orc

            orc.write_table(t, name)
        else:
            import pyarrow.feather as fe

            fe.write_feather(t, name)
        return {"_written": [name]}

    return ds.map_batches(write_one, batch_format="numpy",
                          batch_size=None).to_pandas()
