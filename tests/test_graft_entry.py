"""Driver entry-point regression tests.

`dryrun_multichip` is the driver's only externally-checked multi-chip
artifact (MULTICHIP_r{N}.json); round 1 failed because the run touched the
tunneled axon TPU backend. The function now re-execs itself in a scrubbed
CPU subprocess — this test drives it the way the driver does and asserts
the success line.
"""
import os
import sys
import pytest

@pytest.mark.slow
def test_dryrun_multichip_is_green(capfd):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    # Simulate the hostile driver environment: a pool-IP var present and an
    # axon-looking entry on PYTHONPATH. The child must scrub both.
    os.environ["PALLAS_AXON_POOL_IPS"] = "10.0.0.1,10.0.0.2"
    os.environ["PYTHONPATH"] = "/nonexistent/.axon_site"
    try:
        g.dryrun_multichip(8)
    finally:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ.pop("PYTHONPATH", None)
    out, _ = capfd.readouterr()
    assert "dryrun_multichip OK on 8 devices" in out
