"""benchutil sanity (CPU): honest timing utilities + the floor-limited
guard (VERDICT r1 W2: a floor-clamped reading once recorded 1e10 fps)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.utils.benchutil import (
    FloorLimitedTiming,
    per_iter_seconds,
    roundtrip_floor,
    time_fn,
    time_fn_two_point,
)


class TestBenchutil:
    def test_roundtrip_floor_positive(self):
        f = roundtrip_floor()
        assert 0 < f < 5.0

    def test_time_fn_returns_positive_seconds(self):
        x = jnp.ones((64, 64), jnp.float32)
        t = time_fn(lambda a: jnp.tanh(a @ a), (x,), iters=5)
        assert 0 < t < 1.0

    def test_two_point_returns_positive_seconds(self):
        x = jnp.ones((256, 256), jnp.float32)
        t = time_fn_two_point(
            lambda a: jnp.tanh(a @ a), (x,), iters=(4, 12)
        )
        assert 0 < t < 1.0

    def test_two_point_cancels_per_call_constant(self):
        """The per-call floor must not leak into the per-iteration figure:
        the same op timed at two very different unroll pairs should agree
        to within noise, which the subtractive method can't guarantee when
        the floor estimate is wrong (it isn't used here at all)."""
        x = jnp.ones((512, 512), jnp.float32)

        def op(a):
            return jnp.tanh(a @ a)

        t1 = time_fn_two_point(op, (x,), iters=(2, 10), repeats=4)
        t2 = time_fn_two_point(op, (x,), iters=(6, 18), repeats=4)
        assert 0 < t1 and 0 < t2
        assert abs(t1 - t2) < 5 * max(t1, t2)  # loose CPU-noise bound

    def test_two_point_rounds_returns_per_round_slopes(self):
        """time_fn_two_point_rounds (VERDICT r4 item 9): committed fps rows
        carry a spread — the tool must return one positive slope per round."""
        from cerberusnet_tpu.utils.benchutil import time_fn_two_point_rounds

        x = jnp.ones((256, 256), jnp.float32)
        slopes = time_fn_two_point_rounds(
            lambda a: jnp.tanh(a @ a), (x,), iters=(4, 12), rounds=3
        )
        assert 2 <= len(slopes) <= 3
        assert all(0 < s < 1.0 for s in slopes)

    def test_two_point_custom_build(self):
        calls = []

        def build(n):
            def run(x):
                calls.append(n)
                y = x
                for _ in range(n):
                    y = jnp.tanh(y @ y)
                return y.mean()

            return run

        x = jnp.ones((128, 128), jnp.float32)
        t = time_fn_two_point(None, (x,), iters=(3, 9), build=build)
        assert 0 < t < 1.0
        assert set(calls) == {3, 9}


class TestFloorGuard:
    def test_per_iter_raises_when_floor_limited(self):
        # work (1 ms) indistinguishable from floor (100 ms): refuse
        with pytest.raises(FloorLimitedTiming):
            per_iter_seconds(best=0.101, floor=0.100, iters=10)

    def test_per_iter_raises_on_negative_elapsed(self):
        # best < floor (the exact round-1 degenerate case): refuse, never
        # clamp to 1e-9 s
        with pytest.raises(FloorLimitedTiming):
            per_iter_seconds(best=0.05, floor=0.100, iters=10)

    def test_per_iter_ok_when_work_dominates(self):
        sec = per_iter_seconds(best=1.1, floor=0.1, iters=10)
        assert sec == pytest.approx(0.1)

    def test_exception_carries_details(self):
        with pytest.raises(FloorLimitedTiming) as ei:
            per_iter_seconds(best=0.10, floor=0.09, iters=7)
        e = ei.value
        assert e.iters == 7 and e.floor == 0.09 and e.best == 0.10
        assert "floor-limited" in str(e)

    def test_time_fn_autoscales_iters(self, monkeypatch):
        """A too-fast op with an artificially high floor must scale its
        unroll count up instead of returning garbage."""
        import cerberusnet_tpu.utils.benchutil as bu

        calls = {"n": 0}
        real_floor = roundtrip_floor()

        def fake_floor(repeats=3):
            calls["n"] += 1
            # first measurement round sees a floor far above the tiny
            # workload, later rounds the true floor -> forces one rescale
            return real_floor + (0.05 if calls["n"] == 1 else 0.0)

        monkeypatch.setattr(bu, "roundtrip_floor", fake_floor)
        x = jnp.ones((128, 128), jnp.float32)
        t = bu.time_fn(lambda a: jnp.tanh(a @ a), (x,), iters=2, max_iters=512)
        assert 0 < t < 1.0
        assert calls["n"] >= 2  # rescaled at least once

    def test_time_fn_raises_at_max_iters(self, monkeypatch):
        """If even max_iters can't beat the floor, time_fn must raise, not
        clamp (this is the 1e10-fps regression test)."""
        import cerberusnet_tpu.utils.benchutil as bu

        monkeypatch.setattr(bu, "roundtrip_floor", lambda repeats=3: 1e6)
        x = jnp.ones((8, 8), jnp.float32)
        with pytest.raises(FloorLimitedTiming):
            bu.time_fn(lambda a: a + 1, (x,), iters=1, max_iters=4)


class TestHloCensus:
    """tools/hlo_opcount.census: entry-computation-only instruction census."""

    def test_counts_entry_only(self):
        from tools.hlo_opcount import census

        hlo = """\
HloModule jit_f

%fused_computation (p: f32[4]) -> f32[] {
  %p = f32[4]{0} parameter(0)
  %mul = f32[4]{0} multiply(%p, %p)
  ROOT %r = f32[] reduce(%mul), dimensions={0}
}

ENTRY %main (x: f32[4], k: f32[3]) {
  %x = f32[4]{0} parameter(0)
  %k = f32[3]{0} parameter(1)
  %conv.1 = f32[4]{0} convolution(%x, %k), window={size=3}
  %copy = f32[4]{0} copy(%conv.1)
  %fus = f32[] fusion(%copy), kind=kLoop, calls=%fused_computation
  ROOT %tuple = (f32[], f32[4]{0}) tuple(%fus, %copy)
}
"""
        c = census(hlo)
        # fusion-body mul/reduce and parameters/tuple excluded
        assert c["total"] == 3
        assert c["convolution"] == 1
        assert c["copy"] == 1
        assert c["fusion"] == 1
        assert "reduce" not in c
