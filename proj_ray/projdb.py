"""Live proj.db access — the arbitrary-SQL registry surface.

The reference keeps its whole authority registry in a SQLite database
(proj.db) and `src/iso19111/factory.cpp` services every lookup with SQL
(e.g. operation search: factory.cpp:6850-6950, CRS checks: :7203,
schema dump / getDatabaseStructure: :1216-1260).  This engine's RUNTIME
planner deliberately uses generated static Python registries instead
(`epsg_ops.py`, `epsg_meta.py`, …): plain tuples import once per Ray
worker with zero I/O and no per-lookup query cost, which is the right
trade at cluster scale.  What the static tables do not give a user is
the *database* surface — ad-hoc SQL over the registry.  This module
restores it:

- ``data/proj.db`` is built by ``tools/build_proj_db.py`` from the
  reference's public SQL distribution exactly the way the reference
  builds it (concatenate data/sql/* in sql_filelist.cmake order, run
  through sqlite3 — data/generate_proj_db.cmake).
- :func:`query` runs arbitrary read-only SQL against it.
- Typed helpers mirror the most common factory.cpp lookups.
- ``python -m proj_ray.cli projdb "SELECT ..."`` is the CLI surface
  (sqlite3-CLI-style pipe-separated output).

The tests cross-check the static generated registries against this
live database row-for-row on sampled codes, so the two views of the
registry cannot drift apart silently.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path
from typing import Any

DB_PATH = Path(__file__).resolve().parents[1] / "data" / "proj.db"


def db_path() -> Path:
    """Path of the bundled live registry database."""
    return DB_PATH


def available() -> bool:
    return DB_PATH.exists()


def connect() -> sqlite3.Connection:
    """Read-only connection to the bundled proj.db."""
    if not DB_PATH.exists():
        raise FileNotFoundError(
            f"{DB_PATH} missing — run `python tools/build_proj_db.py` "
            "(requires the reference SQL distribution)"
        )
    con = sqlite3.connect(f"file:{DB_PATH}?mode=ro", uri=True)
    con.row_factory = sqlite3.Row
    return con


def query(sql: str, params: tuple | list = ()) -> tuple[list[str], list[tuple]]:
    """Run read-only SQL; returns (column_names, rows).

    This is the moral equivalent of pointing the sqlite3 CLI at
    proj.db — the surface factory.cpp builds everything else from.
    """
    with connect() as con:
        cur = con.execute(sql, tuple(params))
        cols = [d[0] for d in cur.description] if cur.description else []
        return cols, [tuple(r) for r in cur.fetchall()]


# ---------------------------------------------------------------------------
# Typed helpers mirroring the common factory.cpp lookups.


def metadata() -> dict[str, str]:
    """metadata table (factory.cpp reads DATABASE.LAYOUT.VERSION.*)."""
    _, rows = query("SELECT key, value FROM metadata")
    return dict(rows)


def crs_info(auth: str, code: str | int) -> dict[str, Any] | None:
    """One crs_view row (auth_name, code, name, type, deprecated)."""
    cols, rows = query(
        "SELECT auth_name, code, name, type, deprecated FROM crs_view "
        "WHERE auth_name = ? AND code = ?",
        (auth, str(code)),
    )
    return dict(zip(cols, rows[0])) if rows else None


def crs_extent(auth: str, code: str | int) -> tuple[float, float, float, float] | None:
    """(west, south, east, north) of a CRS's area of use via the usage
    table, as factory.cpp's getCRSInfoList does."""
    _, rows = query(
        "SELECT e.west_lon, e.south_lat, e.east_lon, e.north_lat "
        "FROM crs_view c "
        "JOIN usage u ON u.object_table_name = c.table_name "
        "  AND u.object_auth_name = c.auth_name AND u.object_code = c.code "
        "JOIN extent e ON e.auth_name = u.extent_auth_name "
        "  AND e.code = u.extent_code "
        "WHERE c.auth_name = ? AND c.code = ? LIMIT 1",
        (auth, str(code)),
    )
    return tuple(rows[0]) if rows else None


def operations_between(
    src_auth: str,
    src_code: str | int,
    dst_auth: str,
    dst_code: str | int,
    include_deprecated: bool = False,
) -> list[dict[str, Any]]:
    """Direct coordinate operations src->dst from
    coordinate_operation_view, ordered by accuracy — the core of
    factory.cpp's findOpsInRegistryDirect (factory.cpp:6850-6950)."""
    cols, rows = query(
        "SELECT auth_name, code, name, table_name, accuracy, deprecated "
        "FROM coordinate_operation_view "
        "WHERE source_crs_auth_name = ? AND source_crs_code = ? "
        "  AND target_crs_auth_name = ? AND target_crs_code = ? "
        + ("" if include_deprecated else "  AND deprecated = 0 ")
        + "ORDER BY (accuracy IS NULL), accuracy, auth_name, code",
        (src_auth, str(src_code), dst_auth, str(dst_code)),
    )
    return [dict(zip(cols, r)) for r in rows]


def authorities() -> list[str]:
    _, rows = query("SELECT auth_name FROM builtin_authorities ORDER BY auth_name")
    return [r[0] for r in rows]


def database_structure() -> list[str]:
    """Schema statements as factory.cpp's getDatabaseStructure emits
    them (sqlite_master text per type, factory.cpp:1216-1260), plus the
    layout-version metadata INSERTs."""
    out: list[str] = []
    with connect() as con:
        for typ in ("table", "view", "trigger"):
            cur = con.execute(
                "SELECT sql||';' FROM sqlite_master WHERE type = ? "
                "AND name NOT LIKE 'sqlite_stat%'",
                (typ,),
            )
            out.extend(r[0] for r in cur.fetchall() if r[0])
        for key in ("MAJOR", "MINOR"):
            cur = con.execute(
                "SELECT value FROM metadata WHERE key = ?",
                (f"DATABASE.LAYOUT.VERSION.{key}",),
            )
            row = cur.fetchone()
            if row:
                out.append(
                    "INSERT INTO metadata VALUES("
                    f"'DATABASE.LAYOUT.VERSION.{key}',{row[0]});"
                )
    return out
