"""Model shape/jit/finiteness tests (SURVEY.md §5.3).

Uses a narrow-width model variant so CPU compiles stay fast; full-width
shapes are exercised on real hardware by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberusnet_tpu.models import (
    CerberusNet,
    FlowNet,
    SegNet,
    StereoNet,
)

H, W = 64, 64  # divisible by 2^6

TINY = dict(
    encoder_channels=(8, 12, 16, 16, 16, 16),
    est_channels=(16, 16, 12),
    ctx_channels=(16, 16),
)


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    return tuple(jnp.asarray(rng.rand(1, H, W, 3), jnp.float32) for _ in range(3))


class TestCerberusNet:
    @pytest.fixture(scope="class")
    def model_and_vars(self, images):
        model = CerberusNet(corr_impl="pure", fpn_channels=16, **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *images)
        return model, variables

    def test_output_shapes(self, model_and_vars, images):
        model, variables = model_and_vars
        out = jax.jit(model.apply)(variables, *images)
        assert out["seg_logits"].shape == (1, H, W, 19)
        assert out["flow"].shape == (1, H, W, 2)
        assert out["disp"].shape == (1, H, W, 1)
        assert set(out["flow_pyramid"]) == {2, 3, 4, 5, 6}
        assert out["flow_pyramid"][2].shape == (1, H // 4, W // 4, 2)
        assert out["disp_pyramid"][6].shape == (1, H // 64, W // 64, 1)
        for k in ("seg_logits", "flow", "disp"):
            assert bool(jnp.all(jnp.isfinite(out[k]))), k

    def test_jit_deterministic(self, model_and_vars, images):
        # Eager-vs-jit equivalence is covered per-op (test_ops_*); eager
        # dispatch of the full model is impractically slow in this
        # environment, so at model level we assert jit determinism.
        model, variables = model_and_vars
        a = jax.jit(model.apply)(variables, *images)
        b = jax.jit(model.apply)(variables, *images)
        np.testing.assert_array_equal(np.asarray(a["flow"]), np.asarray(b["flow"]))
        np.testing.assert_array_equal(
            np.asarray(a["seg_logits"]), np.asarray(b["seg_logits"])
        )

    def test_bf16_forward(self, images):
        model = CerberusNet(
            corr_impl="pure", fpn_channels=16, dtype=jnp.bfloat16, **TINY
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *images)
        out = jax.jit(model.apply)(variables, *images)
        # logits/flow/disp are promoted back to f32 at the head outputs
        assert out["seg_logits"].dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(out["seg_logits"])))


class TestSingleTaskBaselines:
    def test_segnet(self, images):
        model = SegNet(
            encoder_channels=TINY["encoder_channels"], num_classes=19, fpn_channels=16
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0])
        out = jax.jit(model.apply)(variables, images[0])
        assert out.shape == (1, H, W, 19)

    def test_flownet(self, images):
        model = FlowNet(corr_impl="pure", **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["flow"].shape == (1, H, W, 2)

    def test_stereonet(self, images):
        model = StereoNet(corr_impl="pure", **TINY)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["disp"].shape == (1, H, W, 1)


class TestDCVFlowNet:
    def test_shapes_and_dilated_corr(self, images):
        from cerberusnet_tpu.models import DCVFlowNet
        from cerberusnet_tpu.ops.correlation import _correlation2d_pure, correlation2d
        import numpy as np

        # dilated corr golden: dilation r samples at r*o
        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
        got = correlation2d(f1, f2, max_disp=1, impl="pure", dilation=2)
        assert got.shape == (1, 8, 8, 9)
        # channel (0,0) offset = (-2,-2): compare against shifting by hand
        manual = np.zeros((8, 8), np.float32)
        a, b = np.asarray(f1)[0], np.asarray(f2)[0]
        for y in range(8):
            for x in range(8):
                yy, xx = y - 2, x - 2
                if 0 <= yy < 8 and 0 <= xx < 8:
                    manual[y, x] = a[y, x] @ b[yy, xx] / 3
        np.testing.assert_allclose(np.asarray(got[0, :, :, 0]), manual, rtol=1e-5)

        model = DCVFlowNet(
            encoder_channels=TINY["encoder_channels"],
            est_channels=(16, 12),
            ctx_channels=(16,),
            dilations=(1, 2),
            corr_impl="pure",
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["flow"].shape == (1, H, W, 2)
        assert out["flow_pyramid"][3].shape == (1, H // 8, W // 8, 2)
        assert bool(jnp.all(jnp.isfinite(out["flow"])))


class TestDCVStereoNet:
    def test_shapes_and_dilated_corr1d(self, images):
        from cerberusnet_tpu.models import DCVStereoNet
        from cerberusnet_tpu.ops.correlation import correlation1d
        import numpy as np

        rng = np.random.RandomState(0)
        f1 = jnp.asarray(rng.randn(1, 4, 10, 3), jnp.float32)
        f2 = jnp.asarray(rng.randn(1, 4, 10, 3), jnp.float32)
        got = correlation1d(f1, f2, max_disp=2, impl="pure", dilation=3)
        assert got.shape == (1, 4, 10, 3)  # k in {0, 3, 6} -> 3 channels
        a, b = np.asarray(f1)[0], np.asarray(f2)[0]
        # channel 2 = displacement 6
        manual = np.zeros((4, 10), np.float32)
        for y in range(4):
            for x in range(10):
                if x - 6 >= 0:
                    manual[y, x] = a[y, x] @ b[y, x - 6] / 3
        np.testing.assert_allclose(np.asarray(got[0, :, :, 2]), manual, rtol=1e-5)

        model = DCVStereoNet(
            encoder_channels=TINY["encoder_channels"],
            est_channels=(16, 12),
            ctx_channels=(16,),
            dilations=(1, 2),
            corr_impl="pure",
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], images[1])
        out = jax.jit(model.apply)(variables, images[0], images[1])
        assert out["disp"].shape == (1, H, W, 1)
        assert bool(jnp.all(jnp.isfinite(out["disp"])))


class TestCerberusDCV:
    def test_joint_shapes(self, images):
        from cerberusnet_tpu.models import CerberusDCV

        model = CerberusDCV(
            encoder_channels=TINY["encoder_channels"],
            est_channels=(16, 12),
            ctx_channels=(16,),
            flow_dilations=(1, 2),
            disp_dilations=(1, 2),
            fpn_channels=16,
            corr_impl="pure",
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *images)
        out = jax.jit(model.apply)(variables, *images)
        assert out["seg_logits"].shape == (1, H, W, 19)
        assert out["flow"].shape == (1, H, W, 2)
        assert out["disp"].shape == (1, H, W, 1)
        for k in ("seg_logits", "flow", "disp"):
            assert bool(jnp.all(jnp.isfinite(out[k]))), k


class TestASPPSegHead:
    """ASPP (DeepLab-style) segmentation decoder variant
    (models/segmentation.py make_seg_head factory)."""

    def test_segnet_aspp_shapes(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from cerberusnet_tpu.models.segmentation import SegNet

        m = SegNet(
            encoder_channels=(8, 12, 16, 16, 16, 16), seg_head="aspp",
            num_classes=7,
        )
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(v, x)
        assert out.shape == (1, 64, 64, 7)
        assert np.isfinite(np.asarray(out)).all()

    def test_cerberus_with_aspp_head(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from cerberusnet_tpu.models import CerberusNet

        m = CerberusNet(
            encoder_channels=(8, 12, 16, 16, 16, 16),
            est_channels=(16, 16, 12), ctx_channels=(16, 16),
            fpn_channels=16, corr_impl="pure", seg_head="aspp",
        )
        imgs = tuple(
            jnp.asarray(np.random.RandomState(i).rand(1, 64, 64, 3), jnp.float32)
            for i in range(3)
        )
        v = jax.jit(m.init)(jax.random.PRNGKey(0), *imgs)
        out = jax.jit(m.apply)(v, *imgs)
        assert out["seg_logits"].shape == (1, 64, 64, 19)
        assert "ASPPSegmentationHead_0" in v["params"]

    def test_seg_aspp_trains(self):
        import numpy as np
        from tests.test_train_step import tiny_config
        from cerberusnet_tpu.train.trainer import Trainer
        from cerberusnet_tpu.data.synthetic import SyntheticPerceptionDataset
        from cerberusnet_tpu.data.loader import DataLoader

        cfg = tiny_config(variant="seg")
        cfg.model.seg_head = "aspp"
        t = Trainer(cfg)
        ds = SyntheticPerceptionDataset(length=2, hw=(64, 64))
        batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
        first = last = None
        for _ in range(8):
            comps = t.train_step(batch)
            last = float(comps["total"])
            first = first if first is not None else last
        assert np.isfinite(last) and last < first


def test_s2d_stem_identical_outputs():
    """Space-to-depth level-1 conv (encoder.s2d_stem): identical param tree
    and equal outputs to the plain stride-2 conv (models/encoder.py)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(**kw)
    m1 = CerberusNet(s2d_stem=True, **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), *imgs)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, *imgs)
    for key in ("seg_logits", "flow", "disp"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-4, rtol=2e-4
        )


class TestS2DConv:
    """s2d-space conv helpers (encoder.py): exact same math as the full-res
    conv for both the stride-1 SAME conv and the stride-2 level entry."""

    def test_stride1_matches_full_res(self):
        import numpy as np

        from cerberusnet_tpu.models.encoder import (
            _depth_to_space, _s2d_conv, _space_to_depth,
        )

        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (2, 8, 12, 5), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 5, 7), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(5), (7,), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = _depth_to_space(
            _s2d_conv(_space_to_depth(x), k, b, jnp.float32, stride=1), 7
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_stride2_matches_full_res(self):
        import numpy as np

        from cerberusnet_tpu.models.encoder import (
            _depth_to_space, _s2d_conv, _space_to_depth,
        )

        x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 8, 3), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 3, 6), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(8), (6,), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = _depth_to_space(
            _s2d_conv(_space_to_depth(x), k, b, jnp.float32, stride=2), 6
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_s2d_levels_identical_outputs():
    """Whole-level s2d encoder (encoder.s2d_levels): identical param tree
    and equal outputs to the plain encoder (models/encoder.py _s2d_conv)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(**kw)
    m1 = CerberusNet(s2d_levels=2, **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), *imgs)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, *imgs)
    for key in ("seg_logits", "flow", "disp"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-4, rtol=2e-4
        )


def test_stem_pad_identical_outputs():
    """Channel-padded stem conv (encoder.stem_pad_channels): identical param
    tree and bitwise-equal outputs to the plain stride-2 conv — the padded
    channels multiply zero kernel taps, so no reassociation tolerance is
    even needed (models/encoder.py _padded_stem_conv)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(**kw)
    m1 = CerberusNet(stem_pad_channels=8, **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), *imgs)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, *imgs)
    for key in ("seg_logits", "flow", "disp"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-4, rtol=2e-4
        )


class TestUpsamplePhase:
    """upsample2x_phase == jax.image.resize bilinear 2x (models/common.py):
    the phase-split formulation must be numerically identical so the
    upsample_impl perf knob never changes model semantics."""

    @pytest.mark.parametrize("shape", [(1, 5, 7, 3), (2, 8, 16, 2), (1, 1, 4, 1)])
    def test_matches_resize(self, shape):
        from cerberusnet_tpu.models.common import upsample2x, upsample2x_phase

        x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
        ref = upsample2x(x)  # jax.image.resize bilinear
        got = upsample2x_phase(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_model_outputs_identical(self, images):
        m0 = CerberusNet(fpn_channels=16, **TINY)
        m1 = CerberusNet(fpn_channels=16, upsample_impl="phase", **TINY)
        v = jax.jit(m0.init)(jax.random.PRNGKey(0), *images)
        assert jax.tree.structure(v) == jax.tree.structure(
            jax.jit(m1.init)(jax.random.PRNGKey(0), *images)
        )
        o0 = jax.jit(m0.apply)(v, *images)
        o1 = jax.jit(m1.apply)(v, *images)
        for key in ("seg_logits", "flow", "disp"):
            np.testing.assert_allclose(
                np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-4, rtol=2e-4
            )


def test_stacked_input_identical_outputs():
    """stacked_input=True (producer-stacked (3B,H,W,3) tensor) vs the
    default 3-argument call: identical param tree and bit-equal outputs —
    the only difference is WHERE the [left;right;temporal] stack is
    assembled (models/cerberus.py)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(**kw)
    m1 = CerberusNet(stacked_input=True, **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (2, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    stacked = jnp.concatenate(imgs, axis=0)
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), stacked)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, stacked)
    for key in ("seg_logits", "flow", "disp"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-5, rtol=2e-5
        )


def test_conv_s2_phase_matches_autodiff():
    """conv_s2_phase: forward bit-identical to the plain stride-2 SAME
    conv; custom dx (phase-decomposed) and dk match jax.vjp of the plain
    conv (models/common.py)."""
    import numpy as np

    from cerberusnet_tpu.models.common import _conv_s2, conv_s2_phase

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, 5))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7)) * 0.1
    assert np.array_equal(np.asarray(_conv_s2(x, k)),
                          np.asarray(conv_s2_phase(x, k)))
    g = jax.random.normal(jax.random.PRNGKey(2), _conv_s2(x, k).shape)
    dx0, dk0 = jax.vjp(_conv_s2, x, k)[1](g)
    dx1, dk1 = jax.vjp(conv_s2_phase, x, k)[1](g)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dk0), np.asarray(dk1),
                               atol=1e-5, rtol=1e-5)
    # odd extents are rejected (the SAME decomposition assumes pad (0,1))
    with pytest.raises(ValueError):
        conv_s2_phase(x[:, :15], k)


def test_entry_grad_phase_identical_model_and_grads():
    """entry_grad="phase" vs default: identical param tree, bit-equal
    forward (the conv op is the same — only the vjp rule differs), and
    parameter gradients equal to fp tolerance (models/encoder.py)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(**kw)
    m1 = CerberusNet(entry_grad="phase", **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), *imgs)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, *imgs)
    for key in ("seg_logits", "flow", "disp"):
        assert np.array_equal(np.asarray(o0[key]), np.asarray(o1[key]))

    def loss(m):
        def f(v):
            out = m.apply(v, *imgs)
            return (
                jnp.sum(out["flow"] ** 2)
                + jnp.sum(out["disp"] ** 2)
                + jnp.sum(out["seg_logits"] ** 2)
            )
        return f

    g0 = jax.jit(jax.grad(loss(m0)))(v0)
    g1 = jax.jit(jax.grad(loss(m1)))(v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3
        )


def test_est_input_concat_identical_outputs():
    """est_input="concat" (one concatenated estimator feed) vs "split"
    (cost volume consumed in place): identical param tree, equal outputs
    to fp-reassociation tolerance — conv over a concat equals the sum of
    per-component convs (models/flow.py, models/disparity.py)."""
    import numpy as np

    from cerberusnet_tpu.models import CerberusNet

    kw = dict(
        encoder_channels=(8, 12, 16, 16, 16, 16),
        est_channels=(16, 16, 12),
        ctx_channels=(16, 16),
        fpn_channels=16,
        dtype=jnp.float32,
    )
    m0 = CerberusNet(est_input="split", **kw)
    m1 = CerberusNet(est_input="concat", **kw)
    imgs = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (1, 64, 128, 3), jnp.float32)
        for i in range(3)
    )
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), *imgs)
    v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), *imgs)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o0 = jax.jit(m0.apply)(v0, *imgs)
    o1 = jax.jit(m1.apply)(v0, *imgs)
    for key in ("seg_logits", "flow", "disp"):
        np.testing.assert_allclose(
            np.asarray(o0[key]), np.asarray(o1[key]), atol=2e-4, rtol=2e-4
        )
