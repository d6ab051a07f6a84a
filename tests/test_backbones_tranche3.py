"""ResNeSt / SSD-VGG backbones + NAS-FPN / CARAFE-FPN necks: shape tests."""

import jax
import jax.numpy as jnp

from dsl_tpu.models.backbones.resnest import ResNeSt
from dsl_tpu.models.backbones.ssd_vgg import SSDVGG
from dsl_tpu.models.necks.fpn_carafe import FPN_CARAFE
from dsl_tpu.models.necks.nas_fpn import NASFPN


def test_resnest_shapes():
    net = ResNeSt(depth=50, stem_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_ssd_vgg_shapes():
    net = SSDVGG()
    x = jnp.zeros((1, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    assert len(outs) == 6
    assert outs[0].shape == (1, 16, 16, 512)     # conv4_3 (stride 8)
    assert outs[1].shape[-1] == 1024             # conv7
    assert outs[2].shape[-1] == 512


def test_nas_fpn_shapes():
    neck = NASFPN(in_channels=[32, 64, 128], out_channels=16, num_outs=5,
                  stack_times=2)
    feats = [jnp.zeros((1, 16 // (2 ** i), 16 // (2 ** i), c))
             for i, c in enumerate([32, 64, 128])]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16)
    assert outs[4].shape == (1, 1, 1, 16)


def test_fpn_carafe_shapes():
    neck = FPN_CARAFE(in_channels=[32, 64, 128], out_channels=16,
                      num_outs=5)
    feats = [jnp.zeros((1, 16 // (2 ** i), 16 // (2 ** i), c))
             for i, c in enumerate([32, 64, 128])]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 16)


def test_nas_fpn_tiny_input_floors_at_1x1():
    """When the top pyramid level would pool below 1x1 (tiny inputs), the
    extra-level downsample floors at 1x1 instead of emitting a zero-sized
    map (only reachable in tiny-shape tests; real inputs always pool)."""
    neck = NASFPN(in_channels=[32, 64, 128], out_channels=16, num_outs=5,
                  stack_times=1)
    feats = [jnp.zeros((1, 8 // (2 ** i), 8 // (2 ** i), c))
             for i, c in enumerate([32, 64, 128])]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(variables, feats)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1, 1]
