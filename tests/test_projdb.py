"""Live proj.db (data/proj.db, built by tools/build_proj_db.py) vs the
static generated registries the runtime planner uses.

The reference keeps ONE registry (proj.db) and queries it with SQL
(src/iso19111/factory.cpp); this engine keeps two views of the same
registry — static Python tables for the hot path, the live database
for the ad-hoc SQL surface. These tests pin them together row-for-row
so they cannot drift apart silently, and pin the database itself to
the reference corpus expectations (test/cli/test_projinfo.yaml
--dump-db-structure head/tail slices).
"""

from __future__ import annotations

import re

import pytest

from proj_ray import projdb

pytestmark = pytest.mark.skipif(
    not projdb.available(), reason="data/proj.db not built"
)

# The reference's own proj.db build excludes
# transformations_czechia_extra.sql (licensing — data/sql_filelist.cmake
# comments it out); the static CRS list includes its 4 PROJ compound
# CRSs because the planner supports them. Known, documented delta.
CZECHIA_ONLY = {
    ("PROJ", "S_JTSK_BALTIC_HEIGHT"),
    ("PROJ", "S_JTSK_E_N_BALTIC_HEIGHT"),
    ("PROJ", "S_JTSK05_BALTIC_HEIGHT"),
    ("PROJ", "S_JTSK05_E_N_BALTIC_HEIGHT"),
}


def _ws(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def test_metadata_layout_version():
    md = projdb.metadata()
    # pinned by the reference corpus tail expectation
    # (test/cli/test_projinfo.yaml: DATABASE.LAYOUT.VERSION 1.4)
    assert md["DATABASE.LAYOUT.VERSION.MAJOR"] == "1"
    assert md["DATABASE.LAYOUT.VERSION.MINOR"] == "4"
    assert re.fullmatch(r"\d+\.\d+\.\d+", md["PROJ.VERSION"])
    assert md["EPSG.VERSION"].startswith("v")


def test_crs_view_matches_static_registry():
    from proj_ray.crs_list_generated import CRS_LIST

    _, rows = projdb.query(
        "SELECT auth_name, code, name, type, deprecated FROM crs_view"
    )
    live = {(r[0], str(r[1])): (r[2], r[3], int(r[4])) for r in rows}
    static = {(r[0], str(r[1])): (r[2], r[3], int(r[4])) for r in CRS_LIST}

    only_static = set(static) - set(live)
    assert only_static == CZECHIA_ONLY

    # live-only rows are the IAU ocentric CRSs of type 'other' that the
    # static listing (mirroring projinfo --list-crs output) omits
    only_live = set(live) - set(static)
    assert all(live[k][1] == "other" for k in only_live), sorted(only_live)
    assert len(only_live) < 20

    for key in set(static) & set(live):
        s_name, s_type, s_dep = static[key]
        l_name, l_type, l_dep = live[key]
        # static names are whitespace-normalized for display parity
        assert _ws(s_name) == _ws(l_name), key
        assert s_type == l_type, key
        assert s_dep == l_dep, key


def test_ellipsoid_table_matches_static():
    from proj_ray.epsg_meta import ELLIPSOID

    _, rows = projdb.query(
        "SELECT code, name, semi_major_axis, inv_flattening, semi_minor_axis "
        "FROM ellipsoid WHERE auth_name = 'EPSG'"
    )
    live = {int(r[0]): r[1:] for r in rows}
    checked = 0
    for code, (name, a, rf, b) in ELLIPSOID.items():
        if code not in live:
            continue
        l_name, l_a, l_rf, l_b = live[code]
        assert l_a == pytest.approx(a, abs=1e-6), code
        if rf is not None and l_rf is not None:
            assert l_rf == pytest.approx(rf, abs=1e-9), code
        checked += 1
    assert checked >= 40


def test_helmert_planner_rows_exist_in_live_db():
    """Every static-planner Helmert op code must be a live
    helmert_transformation row with the same accuracy and CRS pair
    (the factory.cpp findOpsInRegistryDirect source table)."""
    from proj_ray.epsg_ops import HELMERT

    with projdb.connect() as con:
        checked = 0
        for (src, dst), ops in list(HELMERT.items()):
            for op in ops:
                row = con.execute(
                    "SELECT source_crs_code, target_crs_code, accuracy, "
                    "deprecated FROM helmert_transformation "
                    "WHERE auth_name='EPSG' AND code=?",
                    (str(op["code"]),),
                ).fetchone()
                if row is None:
                    continue  # some planner rows come from concat ops
                _s_code, _t_code, acc, dep = row
                if op.get("acc") is not None and acc is not None:
                    assert float(acc) == pytest.approx(op["acc"]), op["code"]
                assert dep == 0, op["code"]
                checked += 1
        assert checked >= 500


def test_helmert_parameters_spot_check():
    """Parameter-level equality for a metre/arcsec/ppm op the planner
    carries: EPSG:3817 (MGI 1901 family), tx/ty/tz in metres."""
    from proj_ray.epsg_ops import HELMERT

    entry = next(
        op for ops in HELMERT.values() for op in ops if op["code"] == 3817
    )
    _, rows = projdb.query(
        "SELECT tx, ty, tz, rx, ry, rz, scale_difference "
        "FROM helmert_transformation WHERE auth_name='EPSG' AND code='3817'"
    )
    tx, ty, tz, rx, ry, rz, ds = rows[0]
    assert (tx, ty, tz) == pytest.approx(entry["t"])
    assert (rx, ry, rz) == pytest.approx(entry["r"])
    assert ds == pytest.approx(entry["s"])


def test_operations_between_ordering():
    ops = projdb.operations_between("EPSG", 4267, "EPSG", 4326)
    assert len(ops) >= 5
    accs = [o["accuracy"] for o in ops if o["accuracy"] is not None]
    assert accs == sorted(accs)
    assert all(o["deprecated"] == 0 for o in ops)
    names = {o["name"] for o in ops}
    assert any("NAD27 to WGS 84" in n for n in names)


def test_database_structure_matches_reference_corpus_slices():
    """Pin the exact head/tail the reference's test_projinfo.yaml checks
    for --dump-db-structure."""
    stmts = projdb.database_structure()
    head = "\n".join(stmts).split("\n")[:5]
    assert head == [
        "CREATE TABLE metadata(",
        "    key TEXT NOT NULL PRIMARY KEY CHECK (length(key) >= 1),",
        "    value TEXT NOT NULL",
        ") WITHOUT ROWID;",
        "CREATE TABLE unit_of_measure(",
    ]
    assert stmts[-2:] == [
        "INSERT INTO metadata VALUES('DATABASE.LAYOUT.VERSION.MAJOR',1);",
        "INSERT INTO metadata VALUES('DATABASE.LAYOUT.VERSION.MINOR',4);",
    ]
    # full surface: includes the customizations_early views/triggers
    # (authority_list, INSTEAD OF insert triggers) the 74-statement
    # static proj_db_table_defs dump lacks
    assert len(stmts) >= 80
    assert any("CREATE VIEW authority_list" in s for s in stmts)


def test_crs_extent_lookup():
    ext = projdb.crs_extent("EPSG", 32631)  # UTM 31N
    assert ext is not None
    w, s, e, n = ext
    assert (w, e) == (0.0, 6.0) and s == 0.0 and n == 84.0


def test_arbitrary_sql_join_surface():
    """The factory.cpp-style join: grid transformations with their
    grid_alternatives (grid availability resolution)."""
    cols, rows = projdb.query(
        "SELECT gt.code, gt.name, ga.proj_grid_name "
        "FROM grid_transformation gt "
        "JOIN grid_alternatives ga ON ga.original_grid_name = gt.grid_name "
        "WHERE gt.auth_name='EPSG' AND gt.deprecated=0 LIMIT 20"
    )
    assert cols == ["code", "name", "proj_grid_name"]
    assert len(rows) == 20
    assert all(r[2] for r in rows)


def test_query_rejects_writes():
    with pytest.raises(Exception):
        projdb.query("CREATE TABLE scratch(x)")


def test_cli_projdb(capsys):
    from proj_ray.cli import main

    rc = main([
        "projdb",
        "SELECT auth_name, code, name FROM crs_view "
        "WHERE auth_name='EPSG' AND code='4326'",
    ])
    assert rc == 0
    assert capsys.readouterr().out == "EPSG|4326|WGS 84\n"
