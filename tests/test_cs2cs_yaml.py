"""Replay the reference's own cs2cs CLI golden corpus
(test/cli/test_cs2cs_various.yaml, 142 cases) through create_crs_to_crs,
comparing numerically at the precision of the printed goldens.

Known divergences (all proj.db operation-planner behavior, out of
scope for the static registry by design):
- NAD27 paths (tests 1, 122, 123): the datum grids are not shipped;
  modern cs2cs falls back to a db-selected ballpark/alternate op.
- EPSG:4807 (test 7): NTF(Paris) authority unit is grad; the registry
  expresses angular CRSs in degrees.
Round 3: the static operation-planner subset (proj_ray/epsg_ops.py +
factory._plan_datum_candidates / _similarity_candidates) clears the
round-2 divergences 1, 7, 92, 122, 123, 128-136 — db-selected grid /
Helmert / similarity candidates with per-point area-of-use ranking,
ballpark fallback, geog2D-domain height semantics and grad-unit CRSs.

Round 3 (cont.): test 57 resolved — create_crs_to_crs now uses the
linearized Position Vector helmert for towgs84 legs (createOperation
semantics, transformation.cpp:585) while raw pipelines keep the 4D-API
"helmert exact" sandwich (4D_api.cpp:941), so both the cs2cs goldens
and the gigs 1000-rep roundtrips agree with the reference.
"""

KNOWN_DIVERGENT = set()


def test_cs2cs_various_goldens():
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.replay_cs2cs_yaml import run

    npass, nfail, nskip = run()
    assert npass >= 91, (npass, nfail, nskip)
    assert nfail == 0, (npass, nfail)


def test_cs2cs_ntv2_goldens():
    """NTv2 subgrid selection/switching + NTv1/CTable fallback over the
    reference's shipped test grids — all 5 runnable cases exact."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.replay_cs2cs_yaml import run

    npass, nfail, _ = run(
        yaml_path="/root/reference/test/cli/test_cs2cs_ntv2.yaml")
    assert nfail == 0, (npass, nfail)
    assert npass >= 5


def test_cs2cs_datumfile_goldens():
    """NTv1/CTable datum files, incl. the quoted 'dir with space'
    +nadgrids value (double-quoted tokens supported in tokenize())."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.replay_cs2cs_yaml import run

    npass, nfail, _ = run(
        yaml_path="/root/reference/test/cli/test_cs2cs_datumfile.yaml")
    assert npass >= 9, (npass, nfail)
    assert nfail == 0


def test_proj_nad27_nad83_spcs_goldens():
    """The reference's 1990s SPCS conformance corpus (test27/test83 via
    +init=nad27:/nad83: state-plane init files): 484 golden points over
    tmerc/lcc/omerc zones in US-survey feet, all exact at 0.001 ft."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.replay_proj_yaml import run

    for f, want in (("test_proj_nad27.yaml", 262),
                    ("test_proj_nad83.yaml", 222)):
        npass, nfail, _ = run(f"/root/reference/test/cli/{f}")
        assert nfail == 0, (f, npass, nfail)
        assert npass >= want, (f, npass)
