"""Hilbert curve key: bijection, unit adjacency, and locality vs
Z-order."""

import numpy as np

from proj_ray.cells import hilbert_cell, hilbert_d


def test_bijection_and_unit_adjacency():
    for order in (2, 4, 6):
        n = 1 << order
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = hilbert_d(order, xs.ravel(), ys.ravel())
        assert sorted(d.tolist()) == list(range(n * n))
        # walking the curve: consecutive cells are GRID NEIGHBORS —
        # the property Z-order lacks
        o = np.argsort(d)
        px, py = xs.ravel()[o], ys.ravel()[o]
        step = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert (step == 1).all()


def test_locality_beats_rowmajor():
    """The metric that matters for a shuffle key: RANGE-partition the
    key space into blocks of B cells and count grid-adjacent pairs
    split across partitions. Hilbert cuts far fewer neighbor pairs
    than row-major at every block size (the reason to range-partition
    by it)."""
    order = 6
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    h = hilbert_d(order, xs.ravel(), ys.ravel()).reshape(n, n)
    rm = xs * n + ys

    def crossings(m, B):
        p = m // B
        return (np.not_equal(p[1:, :], p[:-1, :]).sum()
                + np.not_equal(p[:, 1:], p[:, :-1]).sum())

    for B in (32, 64, 128):
        assert crossings(h, B) < crossings(rm, B) / 2


def test_hilbert_cell_clips_and_maps():
    d = hilbert_cell(np.array([-180.0, 179.999, 0.0, 200.0]),
                     np.array([-85.0, 84.999, 0.0, 99.0]), order=8)
    assert d.min() >= 0 and d.max() < 256 * 256
    # out-of-range input clips to the edge cell rather than wrapping
    d_edge = hilbert_cell(np.array([200.0]), np.array([99.0]), 8)
    d_corner = hilbert_cell(np.array([179.999]), np.array([84.999]), 8)
    assert d_edge[0] == d_corner[0]
