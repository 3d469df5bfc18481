"""Multi-device sharding dry run on the virtual 8-device CPU mesh
(SURVEY.md section 4 level v)."""

import pytest


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
