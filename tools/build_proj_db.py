"""Build a live proj.db SQLite database from the reference's public SQL
distribution, exactly as the reference does it: concatenate the SQL
files in the order of data/sql_filelist.cmake, substitute
``${PROJ_VERSION}``, and feed the whole script to sqlite3 (here the
Python stdlib module instead of the sqlite3 CLI —
reference: data/generate_proj_db.cmake, data/CMakeLists.txt:43-57).

The result is the registry as a *database*: every table, view and
trigger of the reference's proj.db schema, queryable with arbitrary SQL
(`proj_ray.projdb`), alongside the static generated registries the
runtime planner uses (those stay the hot path — plain Python tuples
import faster on every Ray worker than per-worker sqlite queries).

Usage: python tools/build_proj_db.py  ->  writes data/proj.db
"""

from __future__ import annotations

import re
import sqlite3
import sys
import time
from pathlib import Path

REF = Path("/root/reference")
SQL = REF / "data" / "sql"
OUT = Path(__file__).resolve().parents[1] / "data" / "proj.db"

# Concatenation order from /root/reference/data/sql_filelist.cmake
# (transformations_czechia_extra.sql is commented out there too).
SQL_FILES = [
    "begin",
    "proj_db_table_defs",
    "consistency_checks_triggers",
    "conversion_triggers",
    "customizations_early",
    "metadata",
    "unit_of_measure",
    "extent",
    "scope",
    "coordinate_system",
    "axis",
    "ellipsoid",
    "prime_meridian",
    "geodetic_datum",
    "geodetic_datum_ensemble_member",
    "vertical_datum",
    "vertical_datum_ensemble_member",
    "conversion",
    "geodetic_crs",
    "projected_crs",
    "vertical_crs",
    "compound_crs",
    "helmert_transformation",
    "grid_transformation",
    "grid_transformation_custom",
    "other_transformation",
    "other_transformation_custom",
    "concatenated_operation",
    "concatenated_operation_step",
    "alias_name",
    "supersession",
    "deprecation",
    "esri",
    "ignf",
    "nkg",
    "iau",
    "nrcan",
    "grid_alternatives",
    "grid_alternatives_generated_noaa",
    "nadcon5_concatenated_operations",
    "customizations",
    "nkg_post_customizations",
    "commit",
]


def proj_version() -> str:
    """Parse proj_version(MAJOR x MINOR y PATCH z) from the reference."""
    text = (REF / "CMakeLists.txt").read_text(encoding="utf-8")
    m = re.search(r"proj_version\(MAJOR (\d+) MINOR (\d+) PATCH (\d+)\)", text)
    if not m:
        raise RuntimeError("proj_version() not found in reference CMakeLists")
    return ".".join(m.groups())


def main() -> int:
    ver = proj_version()
    sql = "\n".join(
        (SQL / f"{name}.sql").read_text(encoding="utf-8") for name in SQL_FILES
    ).replace("${PROJ_VERSION}", ver)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    if OUT.exists():
        OUT.unlink()
    t0 = time.time()
    db = sqlite3.connect(OUT)
    try:
        db.executescript(sql)
        db.execute("ANALYZE")
        db.commit()
        n_crs = db.execute("SELECT COUNT(*) FROM crs_view").fetchone()[0]
        n_ops = db.execute(
            "SELECT COUNT(*) FROM coordinate_operation_view"
        ).fetchone()[0]
        layout = db.execute(
            "SELECT value FROM metadata WHERE key='DATABASE.LAYOUT.VERSION.MAJOR'"
        ).fetchone()
    finally:
        db.close()
    print(
        f"wrote {OUT} ({OUT.stat().st_size/1e6:.1f} MB) in "
        f"{time.time()-t0:.0f}s: PROJ.VERSION={ver}, layout-major="
        f"{layout[0] if layout else '?'}, {n_crs} crs_view rows, "
        f"{n_ops} coordinate_operation_view rows"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
