"""Network grid fetcher: chunked remote reads with a two-level cache,
plus the `projsync` data-sync logic.

Re-derivation of the reference's network subsystem
(`src/networkfilemanager.cpp:99-400`, `src/apps/projsync.cpp`) with the
transport made pluggable so the sandbox (no network) can exercise the
whole stack against a local directory "CDN":

  * files are read in fixed 16 KiB chunks
    (`networkfilemanager.cpp` DOWNLOAD_CHUNK_SIZE);
  * an in-process LRU holds the 64 hottest chunks
    (`NetworkChunkCache`, `networkfilemanager.cpp:108-156`);
  * a persistent SQLite ``cache.db`` stores chunks + file properties
    with LRU eviction to a max size and a TTL on property revalidation
    (`DiskChunkCache`, `networkfilemanager.cpp:178-400`; the reference
    maintains the LRU as an explicit linked list in SQL — here a
    ``last_used`` counter with an index gives the same eviction order);
  * file identity is (size, lastModified, etag): when revalidation
    sees a changed file the cached chunks for that URL are dropped
    (`networkfilemanager.cpp` FileProperties);
  * ``projsync`` filters a ``files.geojson`` manifest by file name /
    source_id / area_of_use / bbox (contains|intersects) and downloads
    what's missing, skipping files already present at the recorded
    size (`projsync.cpp:292-575`).

At 100 TB scale the point of the chunk cache is that grid-consuming
actors touch only the byte ranges their batch needs: a NetworkFile is
a lazy file-like object, so a reader that seeks to one subgrid pulls
only that subgrid's chunks, once, per node.

Transports:
  * ``LocalDirTransport`` — endpoint is a local directory (the test
    and air-gapped-mirror path; also what a cluster-local NFS mirror
    of cdn.proj.org looks like);
  * ``HTTPTransport`` — urllib with Range requests; constructed only
    when the endpoint is http(s), untestable in this sandbox.
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass

__all__ = [
    "CHUNK_SIZE", "FileProperties", "LocalDirTransport", "HTTPTransport",
    "NetworkFileManager", "NetworkFile", "projsync", "network_enabled",
    "default_endpoint", "user_cache_dir", "make_transport",
]

CHUNK_SIZE = 16 * 1024          # networkfilemanager.cpp DOWNLOAD_CHUNK_SIZE
MEM_CACHE_CHUNKS = 64           # networkfilemanager.cpp MAX_CHUNKS
DEFAULT_TTL_S = 86400           # proj.ini cache.ttl default (1 day)
DEFAULT_MAX_SIZE = 300 * 1024 * 1024  # proj.ini cache.max_size (300 MiB)


@dataclass(frozen=True)
class FileProperties:
    size: int
    last_modified: str = ""
    etag: str = ""


class LocalDirTransport:
    """Endpoint = a local directory mirroring the CDN layout."""

    def __init__(self, root: str):
        self.root = root
        self.range_calls = 0      # test observability
        self.props_calls = 0

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def props(self, name: str) -> FileProperties:
        self.props_calls += 1
        st = os.stat(self._path(name))
        return FileProperties(size=st.st_size,
                              last_modified=str(int(st.st_mtime)),
                              etag=f"{st.st_size}-{int(st.st_mtime)}")

    def read_range(self, name: str, offset: int, nbytes: int) -> bytes:
        self.range_calls += 1
        with open(self._path(name), "rb") as f:
            f.seek(offset)
            return f.read(nbytes)


class HTTPTransport:
    """Range-request transport over urllib (no third-party deps).

    The sandbox has no network, so this is exercised only for its
    construction; the byte-level contract is identical to
    LocalDirTransport and everything above the transport is shared.
    """

    def __init__(self, endpoint: str):
        self.endpoint = endpoint.rstrip("/")

    def _url(self, name: str) -> str:
        return f"{self.endpoint}/{name}"

    def props(self, name: str) -> FileProperties:
        import urllib.request
        req = urllib.request.Request(self._url(name), method="HEAD")
        with urllib.request.urlopen(req) as r:  # noqa: S310
            h = r.headers
            return FileProperties(size=int(h.get("Content-Length", "0")),
                                  last_modified=h.get("Last-Modified", ""),
                                  etag=h.get("ETag", ""))

    def read_range(self, name: str, offset: int, nbytes: int) -> bytes:
        import urllib.request
        req = urllib.request.Request(
            self._url(name),
            headers={"Range": f"bytes={offset}-{offset + nbytes - 1}"})
        with urllib.request.urlopen(req) as r:  # noqa: S310
            return r.read()


def make_transport(endpoint: str):
    if endpoint.startswith(("http://", "https://")):
        return HTTPTransport(endpoint)
    if endpoint.startswith("file://"):
        return LocalDirTransport(endpoint[len("file://"):])
    return LocalDirTransport(endpoint)


def network_enabled() -> bool:
    """PROJ_NETWORK=ON analogue (reference honors the same variable)."""
    return os.environ.get("PROJ_NETWORK", "").upper() == "ON"


def default_endpoint() -> str:
    return os.environ.get("PROJ_NETWORK_ENDPOINT", "https://cdn.proj.org")


def user_cache_dir() -> str:
    base = os.environ.get("PROJ_USER_WRITABLE_DIRECTORY")
    if not base:
        base = os.path.join(os.environ.get("XDG_DATA_HOME")
                            or os.path.expanduser("~/.local/share"),
                            "proj_ray")
    os.makedirs(base, exist_ok=True)
    return base


class _DiskChunkCache:
    """Persistent chunk + properties store (cache.db).

    Same semantics as the reference's DiskChunkCache
    (`networkfilemanager.cpp:178-400`): chunks keyed by (url, offset),
    global LRU eviction down to ``max_size``, properties row per url
    carrying (size, lastModified, etag, lastChecked) with TTL-driven
    revalidation. Schema is simplified (monotonic ``last_used`` counter
    instead of the linked-list tables) — eviction order is identical.
    """

    def __init__(self, path: str, max_size: int = DEFAULT_MAX_SIZE,
                 ttl_s: int = DEFAULT_TTL_S):
        self.path = path
        self.max_size = max_size
        self.ttl_s = ttl_s
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.db = sqlite3.connect(path, check_same_thread=False)
        self.lock = threading.Lock()
        with self.lock:
            self.db.executescript(
                "CREATE TABLE IF NOT EXISTS properties("
                " url TEXT PRIMARY KEY, last_checked INTEGER,"
                " file_size INTEGER, last_modified TEXT, etag TEXT);"
                "CREATE TABLE IF NOT EXISTS chunks("
                " url TEXT, offset INTEGER, data BLOB, last_used INTEGER,"
                " PRIMARY KEY(url, offset));"
                "CREATE INDEX IF NOT EXISTS idx_chunks_lru"
                " ON chunks(last_used);")
            self.db.commit()

    def _tick(self) -> int:
        row = self.db.execute(
            "SELECT COALESCE(MAX(last_used), 0) FROM chunks").fetchone()
        return int(row[0]) + 1

    def get_props(self, url: str, now: float | None = None):
        now = time.time() if now is None else now
        with self.lock:
            row = self.db.execute(
                "SELECT last_checked, file_size, last_modified, etag"
                " FROM properties WHERE url=?", (url,)).fetchone()
        if row is None:
            return None, True
        stale = (now - row[0]) > self.ttl_s
        return FileProperties(size=row[1], last_modified=row[2],
                              etag=row[3]), stale

    def put_props(self, url: str, p: FileProperties,
                  now: float | None = None) -> None:
        now = time.time() if now is None else now
        with self.lock:
            self.db.execute(
                "INSERT OR REPLACE INTO properties VALUES(?,?,?,?,?)",
                (url, int(now), p.size, p.last_modified, p.etag))
            self.db.commit()

    def invalidate(self, url: str) -> None:
        """File changed upstream: drop its chunks (reference drops the
        linked chunks when properties mismatch)."""
        with self.lock:
            self.db.execute("DELETE FROM chunks WHERE url=?", (url,))
            self.db.execute("DELETE FROM properties WHERE url=?", (url,))
            self.db.commit()

    def get_chunk(self, url: str, offset: int) -> bytes | None:
        with self.lock:
            row = self.db.execute(
                "SELECT data FROM chunks WHERE url=? AND offset=?",
                (url, offset)).fetchone()
            if row is None:
                return None
            self.db.execute(
                "UPDATE chunks SET last_used=? WHERE url=? AND offset=?",
                (self._tick(), url, offset))
            self.db.commit()
            return bytes(row[0])

    def put_chunk(self, url: str, offset: int, data: bytes) -> None:
        with self.lock:
            self.db.execute(
                "INSERT OR REPLACE INTO chunks VALUES(?,?,?,?)",
                (url, offset, sqlite3.Binary(data), self._tick()))
            # LRU eviction down to max_size (reference: move_to_tail +
            # delete-from-head loop)
            while True:
                total = self.db.execute(
                    "SELECT COALESCE(SUM(LENGTH(data)),0) FROM chunks"
                ).fetchone()[0]
                if total <= self.max_size:
                    break
                self.db.execute(
                    "DELETE FROM chunks WHERE rowid IN (SELECT rowid"
                    " FROM chunks ORDER BY last_used ASC LIMIT 1)")
            self.db.commit()

    def cached_bytes(self) -> int:
        with self.lock:
            return self.db.execute(
                "SELECT COALESCE(SUM(LENGTH(data)),0) FROM chunks"
            ).fetchone()[0]

    def clear(self) -> None:
        with self.lock:
            self.db.execute("DELETE FROM chunks")
            self.db.execute("DELETE FROM properties")
            self.db.commit()


class NetworkFile:
    """Lazy file-like view over a remote file: read()/seek()/tell(),
    every byte served through the chunk caches."""

    def __init__(self, mgr: "NetworkFileManager", url: str, size: int):
        self.mgr = mgr
        self.url = url
        self.size = size
        self.pos = 0

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self.pos = offset
        elif whence == 1:
            self.pos += offset
        else:
            self.pos = self.size + offset
        return self.pos

    def tell(self) -> int:
        return self.pos

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            n = self.size - self.pos
        n = max(0, min(n, self.size - self.pos))
        if n == 0:
            return b""
        out = bytearray()
        first = (self.pos // CHUNK_SIZE) * CHUNK_SIZE
        last = ((self.pos + n - 1) // CHUNK_SIZE) * CHUNK_SIZE
        for off in range(first, last + 1, CHUNK_SIZE):
            chunk = self.mgr._chunk(self.url, off, self.size)
            lo = max(0, self.pos - off)
            hi = min(len(chunk), self.pos + n - off)
            out += chunk[lo:hi]
        self.pos += n
        return bytes(out)


class NetworkFileManager:
    """Two-level chunk cache over a pluggable transport."""

    def __init__(self, transport, cache_dir: str | None = None,
                 ttl_s: int = DEFAULT_TTL_S,
                 max_size: int = DEFAULT_MAX_SIZE,
                 disk_cache: bool = True):
        self.transport = transport
        self.mem: OrderedDict[tuple[str, int], bytes] = OrderedDict()
        self.mem_lock = threading.Lock()
        self.disk = None
        if disk_cache:
            cache_dir = cache_dir or os.path.join(user_cache_dir(), "cache")
            self.disk = _DiskChunkCache(os.path.join(cache_dir, "cache.db"),
                                        max_size=max_size, ttl_s=ttl_s)

    _default = None

    @classmethod
    def default(cls) -> "NetworkFileManager":
        if cls._default is None or \
                getattr(cls._default, "_endpoint", None) != default_endpoint():
            cls._default = cls(make_transport(default_endpoint()))
            cls._default._endpoint = default_endpoint()
        return cls._default

    # -- properties with TTL revalidation ------------------------------
    def props(self, url: str) -> FileProperties:
        if self.disk is not None:
            p, stale = self.disk.get_props(url)
            if p is not None and not stale:
                return p
            fresh = self.transport.props(url)
            if p is not None and (fresh.size, fresh.last_modified,
                                  fresh.etag) != (p.size, p.last_modified,
                                                  p.etag):
                self.disk.invalidate(url)   # upstream file changed
                with self.mem_lock:
                    for k in [k for k in self.mem if k[0] == url]:
                        del self.mem[k]
            self.disk.put_props(url, fresh)
            return fresh
        return self.transport.props(url)

    # -- chunk path -----------------------------------------------------
    def _chunk(self, url: str, offset: int, size: int) -> bytes:
        key = (url, offset)
        with self.mem_lock:
            if key in self.mem:
                self.mem.move_to_end(key)
                return self.mem[key]
        data = self.disk.get_chunk(url, offset) if self.disk else None
        if data is None:
            n = min(CHUNK_SIZE, size - offset)
            data = self.transport.read_range(url, offset, n)
            if self.disk is not None:
                self.disk.put_chunk(url, offset, data)
        with self.mem_lock:
            self.mem[key] = data
            self.mem.move_to_end(key)
            while len(self.mem) > MEM_CACHE_CHUNKS:
                self.mem.popitem(last=False)
        return data

    def open(self, url: str) -> NetworkFile:
        return NetworkFile(self, url, self.props(url).size)

    def download(self, url: str, dest: str) -> int:
        """Stream url into dest through the chunk cache; returns bytes."""
        f = self.open(url)
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        tmp = dest + ".part"
        with open(tmp, "wb") as out:
            while True:
                buf = f.read(4 * CHUNK_SIZE)
                if not buf:
                    break
                out.write(buf)
        os.replace(tmp, dest)
        return f.size

    def ensure_local(self, name: str, target_dir: str | None = None) -> str:
        """Fetch ``name`` into the user cache dir unless already there
        at the remote size (the projsync 'already downloaded' test,
        projsync.cpp:575)."""
        target_dir = target_dir or user_cache_dir()
        dest = os.path.join(target_dir, name)
        want = self.props(name).size
        if os.path.exists(dest) and os.path.getsize(dest) == want:
            return dest
        self.download(name, dest)
        return dest


# ---------------------------------------------------------------------
# projsync (reference src/apps/projsync.cpp)
# ---------------------------------------------------------------------

def _geom_bbox(geom: dict) -> tuple[float, float, float, float] | None:
    """(west, south, east, north) of a GeoJSON geometry
    (projsync.cpp:83-117 get_bbox)."""
    coords = geom.get("coordinates")
    if coords is None:
        return None
    xs: list[float] = []
    ys: list[float] = []

    def walk(c):
        if isinstance(c, (list, tuple)):
            if len(c) >= 2 and all(isinstance(v, (int, float)) for v in c[:2]):
                xs.append(float(c[0]))
                ys.append(float(c[1]))
            else:
                for s in c:
                    walk(s)

    walk(coords)
    if not xs:
        return None
    return min(xs), min(ys), max(xs), max(ys)


def projsync(endpoint: str | None = None,
             target_dir: str | None = None,
             local_geojson_file: str | None = None,
             bbox: tuple[float, float, float, float] | None = None,
             spatial_test: str = "intersects",
             source_id: str | None = None,
             area_of_use: str | None = None,
             file: str | None = None,
             all_files: bool = False,
             exclude_world_coverage: bool = False,
             list_files: bool = False,
             dry_run: bool = False,
             quiet: bool = False,
             out=None) -> list[str]:
    """Sync grid files from the endpoint per the reference CLI's
    filters; returns the list of files selected. Exactly one of the
    filters (file/source_id/area_of_use/bbox/all) must be given unless
    list_files."""
    import sys
    out = out or sys.stdout
    endpoint = endpoint or default_endpoint()
    target_dir = target_dir or user_cache_dir()
    mgr = NetworkFileManager(make_transport(endpoint), disk_cache=False)

    if local_geojson_file:
        with open(local_geojson_file, "rb") as fh:
            manifest = json.load(fh)
    else:
        dest = os.path.join(target_dir, "files.geojson")
        mgr.download("files.geojson", dest)
        with open(dest, "rb") as fh:
            manifest = json.load(fh)

    if not (list_files or file or source_id or area_of_use or bbox
            or all_files):
        raise ValueError(
            "At least one of --list-files, --file, --source-id, "
            "--area-of-use, --bbox or --all must be specified.")

    if list_files:
        print("filename,area_of_use,source_id,file_size", file=out)

    selected: list[str] = []
    for feat in manifest.get("features", []):
        props = feat.get("properties", {})
        name = props.get("name")
        if not name:
            continue
        f_source = props.get("source_id", "")
        f_area = props.get("area_of_use", "")
        f_size = int(props.get("file_size", 0))
        gb = _geom_bbox(feat.get("geometry") or {})
        if exclude_world_coverage and gb is not None and \
                gb[2] - gb[0] >= 359.9 and gb[3] - gb[1] >= 179.9:
            continue
        if file and file not in name:
            continue
        if source_id and source_id not in f_source:
            continue
        if area_of_use and area_of_use not in f_area.lower() and \
                area_of_use not in f_area:
            continue
        if bbox is not None:
            if gb is None:
                continue
            w, s, e, n = bbox
            gw, gs, ge, gn = gb
            if spatial_test == "contains":
                ok = gw >= w and ge <= e and gs >= s and gn <= n
            else:
                ok = not (ge < w or gw > e or gn < s or gs > n)
            if not ok:
                continue
        if list_files:
            print(f"{name},{f_area},{f_source},{f_size}", file=out)
            continue
        selected.append(name)
        dest = os.path.join(target_dir, name)
        if os.path.exists(dest) and os.path.getsize(dest) == f_size > 0:
            if not quiet:
                print(f"{endpoint}/{name} already downloaded.", file=out)
            continue
        if dry_run:
            print(f"Would download {endpoint}/{name}", file=out)
            continue
        if not quiet:
            print(f"Downloading {endpoint}/{name}...", file=out)
        mgr.download(name, dest)
    return selected
