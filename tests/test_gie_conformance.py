"""Replay the reference's own gie conformance corpus.

Every assertion whose operator is implemented must pass; unimplemented
operators are reported as skipped coverage, never as silent success.
"""

import glob

import pytest

from proj_ray.gie import run_gie_file

GIE_FILES = sorted(glob.glob("/root/reference/test/gie/*.gie"))
GIGS_FILES = sorted(glob.glob("/root/reference/test/gigs/*.gie"))


@pytest.mark.parametrize("path", GIE_FILES,
                         ids=[p.split("/")[-1] for p in GIE_FILES])
def test_gie_file(path):
    r = run_gie_file(path)
    assert r.fail == 0, "\n".join(r.failures[:10])


@pytest.mark.parametrize("path", GIGS_FILES,
                         ids=[p.split("/")[-1] for p in GIGS_FILES])
def test_gigs_file(path):
    r = run_gie_file(path)
    assert r.fail == 0, "\n".join(r.failures[:10])


def test_total_coverage_floor():
    """Guard against regressions in how many assertions we actually run."""
    total_ok = sum(run_gie_file(p).ok for p in GIE_FILES)
    assert total_ok >= 560, f"gie coverage dropped: {total_ok}"
