"""Distributed tests without a cluster (SURVEY.md §5.7): 8 fake CPU devices
via conftest's --xla_force_host_platform_device_count=8.

Checks: DP gradients over the mesh equal single-device gradients; spatial
(H-axis) sharding of the conv stack compiles and matches (XLA SPMD inserts
the halo exchanges)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cerberusnet_tpu.models import SegNet
from cerberusnet_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from cerberusnet_tpu.train import losses


def _require_8_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")


TINY_ENC = (8, 12, 16, 16, 16, 16)


@pytest.fixture(scope="module")
def seg_setup():
    model = SegNet(encoder_channels=TINY_ENC, num_classes=5, fpn_channels=16)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (8, 64, 64)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])

    def loss_fn(params, images, labels):
        logits = model.apply({"params": params}, images)
        return losses.segmentation_loss(logits, labels)

    return variables["params"], loss_fn, images, labels


class TestDataParallel:
    def test_mesh_shapes(self):
        _require_8_devices()
        mesh = make_mesh(4, 2)
        assert mesh.shape == {"data": 4, "spatial": 2}

    def test_dp_grads_match_single_device(self, seg_setup):
        _require_8_devices()
        params, loss_fn, images, labels = seg_setup
        grad_fn = jax.jit(jax.grad(loss_fn))

        g_single = grad_fn(params, images, labels)

        mesh = make_mesh(8, 1)
        params_r = jax.device_put(params, replicated_sharding(mesh))
        images_s = jax.device_put(images, batch_sharding(mesh))
        labels_s = jax.device_put(labels, NamedSharding(mesh, P("data")))
        g_dp = grad_fn(params_r, images_s, labels_s)

        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    def test_spatial_sharding_matches(self, seg_setup):
        _require_8_devices()
        params, loss_fn, images, labels = seg_setup
        model_fwd = jax.jit(loss_fn)
        ref = model_fwd(params, images, labels)

        mesh = make_mesh(2, 4)  # batch over 2, image H over 4
        params_r = jax.device_put(params, replicated_sharding(mesh))
        images_s = jax.device_put(images, batch_sharding(mesh))
        labels_s = jax.device_put(
            labels, NamedSharding(mesh, P("data", "spatial"))
        )
        out = model_fwd(params_r, images_s, labels_s)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)

    def test_shard_batch_helper(self):
        _require_8_devices()
        mesh = make_mesh(8, 1)
        batch = {
            "left": np.zeros((8, 16, 16, 3), np.uint8),
            "seg_labels": np.zeros((8, 16, 16), np.uint8),
        }
        out = shard_batch(batch, mesh)
        assert out["left"].sharding.spec[0] == "data"
        assert all(s is None for s in out["left"].sharding.spec[1:])
