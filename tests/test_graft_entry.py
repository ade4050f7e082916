"""Driver contract tests: dryrun_multichip runs a real sharded train step
on the fake 8-device CPU mesh (SURVEY.md §5.7).

Round-2 hardening (VERDICT W1): the driver calls dryrun_multichip STANDALONE,
in a process whose backends may already be initialized at the wrong size, so
we test both bootstrap branches — the inline fresh-process path and the
subprocess re-exec path — not just the happy in-pytest path.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 fake devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # asserts finite loss internally

    def test_dryrun_standalone_after_backend_init(self):
        """The driver-facing contract: dryrun works even when the calling
        process already initialized a too-small backend (forces the
        subprocess re-exec branch)."""
        env = dict(os.environ)
        # Strip the conftest's 8-fake-device flag so the child really has to
        # bootstrap: its first device_count() must see < 8 devices.
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        env["XLA_FLAGS"] = " ".join(flags)
        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert jax.device_count() == 1, jax.device_count()  # poison the backend\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "[dryrun_multichip]" in proc.stdout
