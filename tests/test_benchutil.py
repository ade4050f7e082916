"""benchutil sanity (CPU): honest timing utilities."""

import jax.numpy as jnp
import numpy as np

from cerberusnet_tpu.utils.benchutil import roundtrip_floor, time_fn


class TestBenchutil:
    def test_roundtrip_floor_positive(self):
        f = roundtrip_floor()
        assert 0 < f < 5.0

    def test_time_fn_returns_positive_seconds(self):
        x = jnp.ones((64, 64), jnp.float32)
        t = time_fn(lambda a: jnp.tanh(a @ a), (x,), iters=5)
        assert 0 < t < 1.0
