"""int8 PTQ jaxpr transform (`dsl_tpu/utils/quantize.py`).

Pins: (a) the rewritten program really computes convs in int8, (b) the
dynamic-range composite tracks the f32 conv within int8 resolution across
stride/pad/dilation/grouped forms, (c) a full detector forward stays
numerically faithful, (d) non-conv programs and control-flow bodies pass
through untouched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.utils.quantize import calibrate_convs, quantize_convs


def _conv(x, w, **kw):
    return jax.lax.conv_general_dilated(
        x, w, kw.pop("strides", (1, 1)), kw.pop("padding", "SAME"),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)


@pytest.mark.parametrize("case", ["plain", "stride", "dilated", "grouped"])
def test_conv_int8_close_to_f32(case):
    rng = np.random.RandomState(
        {"plain": 0, "stride": 1, "dilated": 2, "grouped": 3}[case])
    cin, cout = 16, 24
    kw = {}
    if case == "stride":
        kw["strides"] = (2, 2)
    if case == "dilated":
        kw["rhs_dilation"] = (2, 2)
    if case == "grouped":
        kw["feature_group_count"] = 4
        cin_k = cin // 4
    else:
        cin_k = cin
    x = jnp.asarray(rng.randn(2, 14, 14, cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin_k, cout) * 0.2, jnp.float32)

    f = lambda x, w: _conv(x, w, **kw)
    y32 = f(x, w)
    y8 = jax.jit(quantize_convs(f))(x, w)
    assert y8.shape == y32.shape and y8.dtype == y32.dtype
    # int8 dynamic-range error: ~1% of the activation range
    scale = float(jnp.abs(y32).max())
    err = float(jnp.abs(y8 - y32).max())
    assert err < 0.03 * scale, (err, scale)


def test_calibrated_scales_match_dynamic_on_calib_batch():
    """TensorRT-style static calibration: scales recorded on a batch give
    the same quantization as the dynamic reduction on that batch, and the
    static program carries no activation-range reduction (the scale is a
    baked constant, so quant/dequant stay fusable elementwise ops)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 14, 14, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 24) * 0.2, jnp.float32)
    f = lambda x, w: _conv(x, w)

    scales = calibrate_convs(f, (x, w))
    assert len(scales) == 1
    np.testing.assert_allclose(scales[0],
                               float(jnp.abs(x).max()) / 127.0, rtol=1e-6)

    y_dyn = quantize_convs(f)(x, w)
    y_cal = jax.jit(quantize_convs(f, act_scales=scales))(x, w)
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_dyn),
                               rtol=1e-5, atol=1e-5)

    # multi-batch merge takes the elementwise max of the observed ranges
    x2 = x * 3.0
    merged = calibrate_convs(f, (x, w), (x2, w))
    np.testing.assert_allclose(merged[0], scales[0] * 3.0, rtol=1e-6)

    # an out-of-range activation saturates (clips) instead of rescaling
    y_sat = quantize_convs(f, act_scales=scales)(x2, w)
    assert np.isfinite(np.asarray(y_sat)).all()


def test_rewritten_program_contains_int8_conv():
    x = jnp.ones((1, 8, 8, 4))
    w = jnp.ones((3, 3, 4, 8)) * 0.1
    jaxpr = jax.make_jaxpr(quantize_convs(_conv))(x, w)
    convs = [e for e in jaxpr.jaxpr.eqns
             if e.primitive is jax.lax.conv_general_dilated_p]
    assert len(convs) == 1
    assert all(str(v.aval.dtype) == "int8" for v in convs[0].invars), jaxpr
    assert str(convs[0].outvars[0].aval.dtype) == "int32"


def test_non_conv_program_passthrough_and_scan_untouched():
    def fn(x, w):
        # conv inside a scan body must be LEFT at f32 (documented scope)
        def body(c, _):
            return c + 1.0, _conv(x, w).mean()
        _, ys = jax.lax.scan(body, 0.0, jnp.arange(3))
        return jnp.sin(x).sum() + ys.sum()

    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(1, 1, 4, 4), jnp.float32)
    np.testing.assert_allclose(np.asarray(quantize_convs(fn)(x, w)),
                               np.asarray(fn(x, w)), rtol=1e-6)


def test_int8_predict_composes_with_mesh_sharding():
    """Serving at scale: the quantized program jits over a device mesh
    with the batch sharded on the data axis, and matches the unsharded
    result — the int8 transform must not break SPMD partitioning (the
    per-tensor activation max becomes a cross-device reduction)."""
    from dsl_tpu.parallel.mesh import batch_sharding, make_mesh

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.3, jnp.float32)
    qf = quantize_convs(lambda x: _conv(x, w))
    want = np.asarray(qf(x))

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(qf)(xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_detector_forward_int8_faithful():
    """Full FCOS forward through the transform: every tower/backbone conv
    runs int8; logits stay within int8 resolution of the f32 forward."""
    from dsl_tpu.models import build_detector

    det = build_detector(dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[128, 256, 512], out_channels=32,
                  start_level=0, num_outs=3),
        bbox_head=dict(type="FCOSHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=(8, 16, 32))))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), images)

    fwd = lambda img: det.apply(variables, img)
    cls32, reg32, cen32 = fwd(images)
    cls8, reg8, cen8 = jax.jit(quantize_convs(fwd))(images)

    # every conv in the program must have been rewritten
    jaxpr = jax.make_jaxpr(quantize_convs(fwd))(images)
    fconvs = [e for e in jaxpr.jaxpr.eqns
              if e.primitive is jax.lax.conv_general_dilated_p
              and str(e.invars[0].aval.dtype) != "int8"]
    assert not fconvs, f"{len(fconvs)} convs left unquantized"

    for a, b in zip((cls32, reg32, cen32), (cls8, reg8, cen8)):
        for la, lb in zip(a, b):
            la, lb = np.asarray(la), np.asarray(lb)
            span = max(np.abs(la).max(), 1e-3)
            assert np.abs(la - lb).max() < 0.08 * span + 0.02, \
                (np.abs(la - lb).max(), span)
