"""Ray Data Dataset stages: the engine's distributed operator surface.

Every stage is a thin wrapper that applies a vectorized kernel with
``Dataset.map_batches`` over zero-copy Arrow/NumPy batches:

  - stateless math (reproject, cells, tiles)  -> plain batch functions
    with per-process cached operator setup (lru_cache = the per-worker
    analog of the reference's per-thread PJ object)
  - stateful lookups (spatial join)           -> broadcast object
    (`ray.put` once) + actor-pool `map_batches`
  - wide steps (census, knn merge, tile agg)  -> groupby/aggregate with
    pre-aggregation inside map_batches where possible

Nothing here materializes the full dataset; everything streams.
"""

from __future__ import annotations

import functools

import numpy as np

from proj_ray import cells as C
from proj_ray import tiles as T


@functools.lru_cache(maxsize=256)
def _cached_op(defn: str):
    from proj_ray.factory import create_operation

    return create_operation(defn)


def reproject(ds, defn: str, direction: str = "fwd",
              x_col: str = "lon", y_col: str = "lat",
              out_x: str = "x", out_y: str = "y",
              degrees_in: bool = True, degrees_out: bool = False,
              batch_size: int = 64 * 1024):
    """Apply a +proj operator to two coordinate columns.

    The operator is constructed once per worker process (lru_cache), the
    kernel runs on whole NumPy views of the Arrow columns.
    """

    def fn(batch: dict) -> dict:
        op = _cached_op(defn)
        x = np.asarray(batch[x_col], dtype=np.float64)
        y = np.asarray(batch[y_col], dtype=np.float64)
        if degrees_in and op.angular_input:
            x = np.radians(x)
            y = np.radians(y)
        z = np.zeros_like(x)
        t = np.full_like(x, np.inf)
        rx, ry, _, _ = (op.fwd if direction == "fwd" else op.inv)(
            (x, y, z, t))
        if degrees_out and op.angular_output:
            rx = np.degrees(rx)
            ry = np.degrees(ry)
        batch[out_x] = rx
        batch[out_y] = ry
        return batch

    return ds.map_batches(fn, batch_format="numpy", batch_size=batch_size)


def with_cells(ds, level: int, lon_col: str = "lon", lat_col: str = "lat",
               out: str = "cell", batch_size: int = 128 * 1024):
    """Add the Morton/webmerc cell id column — the shuffle key."""

    def fn(batch: dict) -> dict:
        batch[out] = C.cell_id(batch[lon_col], batch[lat_col], level)
        return batch

    return ds.map_batches(fn, batch_format="numpy", batch_size=batch_size)


def with_tiles(ds, zoom: int, lon_col: str = "lon", lat_col: str = "lat",
               batch_size: int = 128 * 1024):
    """Add z/x/y tile assignment columns."""

    def fn(batch: dict) -> dict:
        tx, ty, valid = T.tile_assign(batch[lon_col], batch[lat_col], zoom)
        batch["tile_z"] = np.full(len(tx), zoom, dtype=np.int64)
        batch["tile_x"] = tx
        batch["tile_y"] = ty
        batch["tile_valid"] = valid
        return batch

    return ds.map_batches(fn, batch_format="numpy", batch_size=batch_size)


def cell_census(ds, cell_col: str = "cell"):
    """groupby(cell).count() with per-batch pre-aggregation: the partial
    combine collapses each batch to its unique cells before the shuffle,
    so the all-to-all moves O(#distinct cells), not O(#rows)."""

    def partial(batch: dict) -> dict:
        cells, counts = np.unique(batch[cell_col], return_counts=True)
        return {"cell": cells, "partial_count": counts}

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="numpy")
            .groupby("cell")
            .aggregate(Sum("partial_count", alias_name="n")))


def hot_cells(ds, cell_col: str = "cell", threshold: int = 10000) -> set:
    """Census pass returning the set of cells above `threshold` rows —
    the input to salting (measured, not guessed)."""
    census = cell_census(ds, cell_col)
    out = set()
    for b in census.iter_batches(batch_format="numpy"):
        sel = b["n"] >= threshold
        out.update(int(c) for c in np.asarray(b["cell"])[sel])
    return out


def with_salted_cells(ds, hot: set, salt: int = 16,
                      cell_col: str = "cell", key_col: str = "image_id",
                      out: str = "cell_salted"):
    """Split hot cells into `salt` deterministic sub-keys before groupby."""
    hot_frozen = frozenset(hot)

    def fn(batch: dict) -> dict:
        keys = batch[key_col]
        rk = np.array([hash(k) & 0x7FFFFFFF for k in keys], dtype=np.int64)
        batch[out] = C.salt_cells(batch[cell_col], rk, hot_frozen, salt)
        return batch

    return ds.map_batches(fn, batch_format="numpy")


class PIPJoiner:
    """Actor-pool stage: polygon index fetched from the object store once
    per actor (__init__), probed per batch (__call__)."""

    def __init__(self, index_ref, lon_col: str, lat_col: str, how: str):
        import ray

        self.index = ray.get(index_ref) if not hasattr(index_ref, "query") \
            else index_ref
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.how = how

    def __call__(self, batch):
        import pandas as pd

        lon = np.asarray(batch[self.lon_col], dtype=np.float64)
        lat = np.asarray(batch[self.lat_col], dtype=np.float64)
        pts, polys = self.index.query(lon, lat)
        df = pd.DataFrame({k: np.asarray(v) for k, v in batch.items()})
        if self.how == "inner":
            out = df.iloc[pts].reset_index(drop=True)
            out["poly_id"] = np.asarray(self.index.poly_ids)[polys]
            for name, vals in self.index.attrs.items():
                out[name] = np.asarray(vals)[polys]
            return out
        if self.how == "semi":
            mask = np.zeros(len(df), dtype=bool)
            mask[pts] = True
            return df[mask].reset_index(drop=True)
        if self.how == "anti":
            mask = np.ones(len(df), dtype=bool)
            mask[pts] = False
            return df[mask].reset_index(drop=True)
        if self.how == "left":
            out = df.copy()
            pid = np.full(len(df), None, dtype=object)
            # first match wins for 'left' (deterministic: lowest poly idx)
            order = np.argsort(polys, kind="stable")[::-1]
            pid[pts[order]] = np.asarray(self.index.poly_ids)[polys[order]]
            out["poly_id"] = pid
            return out
        raise ValueError(f"unknown join how={self.how}")


def spatial_join(ds, index, how: str = "inner",
                 lon_col: str = "lon", lat_col: str = "lat",
                 concurrency: int | tuple = (2, 8),
                 batch_size: int = 32 * 1024):
    """Point-in-polygon join against a broadcast PolygonIndex.

    `index` may be a PolygonIndex or an ObjectRef from `ray.put(index)`
    (preferred at scale: ship once, not per task).
    """
    import ray

    ref = index if isinstance(index, ray.ObjectRef) else ray.put(index)
    return ds.map_batches(
        PIPJoiner,
        fn_constructor_args=(ref, lon_col, lat_col, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def knn_brute(ds, query_lon, query_lat, k: int = 5,
              lon_col: str = "lon", lat_col: str = "lat",
              id_col: str = "image_id", geodesic: bool = True,
              batch_size: int = 64 * 1024):
    """k nearest rows for each query point: per-batch top-k candidates
    (distributed) then a driver-side merge over #queries*k*#blocks
    candidates (small).

    Distances: Karney geodesic (exact) or webmerc-plane euclid.
    """
    qlon = np.asarray(query_lon, dtype=np.float64)
    qlat = np.asarray(query_lat, dtype=np.float64)
    nq = len(qlon)

    def local_topk(batch: dict) -> dict:
        lon = np.asarray(batch[lon_col], dtype=np.float64)
        lat = np.asarray(batch[lat_col], dtype=np.float64)
        ids = np.asarray(batch[id_col])
        finite = np.isfinite(lon) & np.isfinite(lat) & (np.abs(lat) <= 90)
        lon = lon[finite]
        lat = lat[finite]
        ids = ids[finite]
        if len(lon) == 0:
            return {"q": np.empty(0, np.int64), "nid": np.empty(0, object),
                    "dist": np.empty(0, np.float64)}
        if geodesic:
            from proj_ray.geodesic import WGS84_GEOD

            # (nq, n) distance matrix in chunks
            qs = []
            nids = []
            dists = []
            for qi in range(nq):
                d, _, _ = WGS84_GEOD.inverse(
                    np.full(len(lat), qlat[qi]), np.full(len(lon), qlon[qi]),
                    lat, lon)
                kk = min(k, len(d))
                part = np.argpartition(d, kk - 1)[:kk]
                qs.append(np.full(kk, qi, dtype=np.int64))
                nids.append(ids[part])
                dists.append(d[part])
            return {"q": np.concatenate(qs),
                    "nid": np.concatenate(nids),
                    "dist": np.concatenate(dists)}
        from proj_ray.cells import lonlat_to_webmerc

        x, y = lonlat_to_webmerc(lon, lat)
        qx, qy = lonlat_to_webmerc(qlon, qlat)
        d2 = (x[None, :] - qx[:, None]) ** 2 + (y[None, :] - qy[:, None]) ** 2
        kk = min(k, d2.shape[1])
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        qs = np.repeat(np.arange(nq, dtype=np.int64), kk)
        return {"q": qs, "nid": ids[part].ravel(),
                "dist": np.sqrt(d2[np.arange(nq)[:, None], part]).ravel()}

    cand = ds.map_batches(local_topk, batch_format="numpy",
                          batch_size=batch_size)
    # global merge: candidates are small (nq * k * nblocks)
    import pandas as pd

    frames = [pd.DataFrame(b) for b in cand.iter_batches(
        batch_format="pandas")]
    if not frames:
        return pd.DataFrame(columns=["q", "nid", "dist", "rank"])
    allc = pd.concat(frames, ignore_index=True)
    allc = allc.sort_values(["q", "dist", "nid"]).groupby("q").head(k)
    allc["rank"] = allc.groupby("q").cumcount() + 1
    return allc.reset_index(drop=True)
