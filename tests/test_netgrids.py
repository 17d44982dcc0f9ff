"""Network grid fetcher + projsync (proj_ray/sources/netgrids.py).

Models the reference's networkfilemanager.cpp / projsync.cpp semantics
against a local-directory "CDN" (the sandbox has no network; the
transport is pluggable and everything above it is shared with the
HTTP transport)."""

import io
import json
import os

import numpy as np
import pytest

from proj_ray.sources import netgrids as NG


@pytest.fixture()
def cdn(tmp_path):
    """A local CDN dir with one 100 KiB random file."""
    root = tmp_path / "cdn"
    root.mkdir()
    rng = np.random.default_rng(42)
    payload = rng.integers(0, 256, size=100_000, dtype=np.uint8).tobytes()
    (root / "blob.bin").write_bytes(payload)
    return root, payload


def _mgr(root, tmp_path, **kw):
    t = NG.LocalDirTransport(str(root))
    return NG.NetworkFileManager(t, cache_dir=str(tmp_path / "cache"),
                                 **kw), t


def test_chunked_reads_match_bytes(cdn, tmp_path):
    root, payload = cdn
    mgr, t = _mgr(root, tmp_path)
    f = mgr.open("blob.bin")
    assert f.size == len(payload)
    # random offset/length reads, including chunk-straddling ones
    rng = np.random.default_rng(0)
    for _ in range(40):
        off = int(rng.integers(0, len(payload)))
        n = int(rng.integers(1, 40_000))
        f.seek(off)
        assert f.read(n) == payload[off:off + n]
    # whole-file read
    f.seek(0)
    assert f.read() == payload
    # every range call was chunk-aligned and chunk-sized
    assert t.range_calls <= -(-len(payload) // NG.CHUNK_SIZE)


def test_mem_lru_and_disk_cache_dedup(cdn, tmp_path):
    root, payload = cdn
    mgr, t = _mgr(root, tmp_path)
    f = mgr.open("blob.bin")
    f.read()                      # 7 chunks
    calls_after_first = t.range_calls
    f.seek(0)
    f.read()                      # all from mem LRU
    assert t.range_calls == calls_after_first

    # a NEW manager over the same disk cache: zero transport reads
    mgr2, t2 = _mgr(root, tmp_path)
    f2 = mgr2.open("blob.bin")
    assert f2.read() == payload
    assert t2.range_calls == 0


def test_disk_cache_lru_eviction_bounds_size(cdn, tmp_path):
    root, payload = cdn
    # max 3 chunks on disk
    mgr, _ = _mgr(root, tmp_path, max_size=3 * NG.CHUNK_SIZE)
    f = mgr.open("blob.bin")
    f.read()
    assert mgr.disk.cached_bytes() <= 3 * NG.CHUNK_SIZE
    # the SURVIVORS are the most recently used (tail of the file)
    assert mgr.disk.get_chunk("blob.bin", 0) is None
    last_off = (len(payload) // NG.CHUNK_SIZE) * NG.CHUNK_SIZE
    assert mgr.disk.get_chunk("blob.bin", last_off) is not None


def test_ttl_revalidation_invalidates_changed_file(cdn, tmp_path):
    root, payload = cdn
    mgr, t = _mgr(root, tmp_path, ttl_s=0)   # every open revalidates
    f = mgr.open("blob.bin")
    head = f.read(16)
    assert head == payload[:16]
    # upstream file changes (size differs -> etag differs)
    new_payload = b"X" * 50_000
    (root / "blob.bin").write_bytes(new_payload)
    f2 = mgr.open("blob.bin")
    assert f2.size == 50_000
    assert f2.read(16) == b"X" * 16          # stale chunks were dropped


def test_props_cached_within_ttl(cdn, tmp_path):
    root, _ = cdn
    mgr, t = _mgr(root, tmp_path, ttl_s=3600)
    mgr.open("blob.bin")
    n = t.props_calls
    mgr.open("blob.bin")                      # served from properties row
    assert t.props_calls == n


def test_download_and_ensure_local_skip(cdn, tmp_path):
    root, payload = cdn
    mgr, t = _mgr(root, tmp_path)
    target = tmp_path / "grids"
    p = mgr.ensure_local("blob.bin", str(target))
    assert open(p, "rb").read() == payload
    calls = t.range_calls
    # second call: size matches -> no re-download (projsync.cpp:575)
    p2 = mgr.ensure_local("blob.bin", str(target))
    assert p2 == p and t.range_calls == calls


def _manifest(root):
    feats = []
    for name, src, area, geom in [
        ("us_a.tif", "us_noaa", "USA", [[-125, 24], [-66, 24],
                                        [-66, 49], [-125, 49]]),
        ("fr_b.tif", "fr_ign", "France", [[-5, 41], [9, 41],
                                          [9, 51], [-5, 51]]),
        ("world_c.tif", "un_x", "World",
         [[-180, -90], [180, -90], [180, 90], [-180, 90]]),
    ]:
        data = name.encode() * 100
        (root / name).write_bytes(data)
        feats.append({
            "type": "Feature",
            "properties": {"name": name, "source_id": src,
                           "area_of_use": area, "file_size": len(data)},
            "geometry": {"type": "Polygon", "coordinates": [geom]},
        })
    (root / "files.geojson").write_text(
        json.dumps({"type": "FeatureCollection", "features": feats}))


def test_projsync_filters_and_downloads(cdn, tmp_path):
    root, _ = cdn
    _manifest(root)
    target = tmp_path / "sync"
    out = io.StringIO()
    # bbox intersecting France (world-coverage file intersects any bbox,
    # hence the reference's --exclude-world-coverage option)
    got = NG.projsync(endpoint=str(root), target_dir=str(target),
                      bbox=(0, 44, 4, 48), exclude_world_coverage=True,
                      out=out)
    assert got == ["fr_b.tif"]
    assert (target / "fr_b.tif").read_bytes() == b"fr_b.tif" * 100
    # re-run: size matches -> "already downloaded"
    out2 = io.StringIO()
    NG.projsync(endpoint=str(root), target_dir=str(target),
                bbox=(0, 44, 4, 48), exclude_world_coverage=True,
                out=out2)
    assert "already downloaded" in out2.getvalue()
    # world coverage excluded under --exclude-world-coverage --all
    got3 = NG.projsync(endpoint=str(root), target_dir=str(target),
                       all_files=True, exclude_world_coverage=True,
                       dry_run=True, out=io.StringIO())
    assert set(got3) == {"us_a.tif", "fr_b.tif"}
    # contains test is stricter than intersects
    got4 = NG.projsync(endpoint=str(root), target_dir=str(target),
                       bbox=(-10, 40, 10, 55), spatial_test="contains",
                       dry_run=True, out=io.StringIO())
    assert got4 == ["fr_b.tif"]
    # source-id / file filters
    got5 = NG.projsync(endpoint=str(root), target_dir=str(target),
                       source_id="us_noaa", dry_run=True,
                       out=io.StringIO())
    assert got5 == ["us_a.tif"]
    # list-files prints the csv header the reference prints
    out6 = io.StringIO()
    NG.projsync(endpoint=str(root), target_dir=str(target),
                list_files=True, out=out6)
    assert out6.getvalue().splitlines()[0] == \
        "filename,area_of_use,source_id,file_size"
    # no filter at all -> the reference's usage error
    with pytest.raises(ValueError):
        NG.projsync(endpoint=str(root), target_dir=str(target))


def test_projsync_cli(cdn, tmp_path, capsys):
    root, _ = cdn
    _manifest(root)
    from proj_ray.cli import main
    target = tmp_path / "clisync"
    rc = main(["projsync", "--endpoint", str(root), "--target-dir",
               str(target), "--file", "us_a"])
    assert rc == 0
    assert (target / "us_a.tif").exists()
    assert main(["projsync", "--endpoint", str(root), "--bbox", "1,2,3"]) == 2


def test_network_grid_fallback_in_load_grids(tmp_path, monkeypatch):
    """+grids=<name not on the search path> resolves over the network
    path when PROJ_NETWORK=ON, and the shifted output matches the same
    grid read locally (end-to-end parity of the fetch path)."""
    from proj_ray.factory import transform
    from proj_ray.ops import gridshift as GS

    src = None
    for d in GS.GRID_SEARCH_PATH:
        cand = os.path.join(d, "ntv2_0.gsb")
        if os.path.exists(cand):
            src = cand
            break
    assert src is not None
    cdn_dir = tmp_path / "cdn"
    cdn_dir.mkdir()
    netname = "net_only_ntv2.gsb"
    (cdn_dir / netname).write_bytes(open(src, "rb").read())

    monkeypatch.setenv("PROJ_NETWORK", "ON")
    monkeypatch.setenv("PROJ_NETWORK_ENDPOINT", str(cdn_dir))
    monkeypatch.setenv("PROJ_USER_WRITABLE_DIRECTORY",
                       str(tmp_path / "udir"))
    NG.NetworkFileManager._default = None    # re-read the endpoint
    try:
        lam = np.radians([-66.0])
        phi = np.radians([45.5])
        x1, y1, _, _ = transform(f"+proj=hgridshift +grids={netname}",
                                 "fwd", lam, phi)
        x0, y0, _, _ = transform("+proj=hgridshift +grids=ntv2_0.gsb",
                                 "fwd", lam, phi)
        assert x1[0] == pytest.approx(x0[0], abs=1e-15)
        assert y1[0] == pytest.approx(y0[0], abs=1e-15)
    finally:
        NG.NetworkFileManager._default = None
        GS._GRID_CACHE.pop(netname, None)


def test_http_transport_shape():
    t = NG.make_transport("https://cdn.proj.org")
    assert isinstance(t, NG.HTTPTransport)
    assert t._url("x.tif") == "https://cdn.proj.org/x.tif"
    assert isinstance(NG.make_transport("file:///tmp"),
                      NG.LocalDirTransport)
