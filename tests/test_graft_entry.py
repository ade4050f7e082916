"""Driver contract tests: dryrun_multichip runs a real sharded train step
on the fake 8-device CPU mesh (SURVEY.md §5.7)."""

import jax
import pytest


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 fake devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts finite loss internally
