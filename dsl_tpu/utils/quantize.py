"""Post-training int8 quantization as a jaxpr transform.

The TPU-native answer to the reference's deployment quantization story
(TensorRT int8 calibration behind ``tools/deployment/onnx2tensorrt.py``):
v5e MXU int8 peak is 2x bf16 (394 vs 197 TOP/s; measured 181.9 vs 101.2
TF/s on the flagship's 3x3x256 conv shape = 1.8x), and XLA lowers
``lax.conv_general_dilated`` with int8 operands + ``preferred_element_type
=int32`` straight onto it.

Rather than threading a quantization flag through every one of the zoo's
modules, :func:`quantize_convs` wraps ANY jittable function (e.g. a bound
``detector_predict``) and re-interprets its jaxpr, replacing each
convolution with the symmetric int8 composite

    x_q = round(x / s_x)_i8          s_x: per-tensor activation scale
    w_q = round(w / s_w)_i8          s_w: per-output-channel weight scale
    y   = conv(x_q, w_q, i32) * s_x * s_w

Weights are program constants, so ``w_q`` folds at compile time. The
activation scale has two modes:

- **dynamic** (default, no data needed): ``s_x = max|x|/127`` computed on
  device per call. Correct but the full-tensor reduction serializes an
  extra HBM pass per conv — measured SLOWER than bf16 end-to-end on the
  flagship (117 vs 166 img/s), kept for calibration-free uses.
- **calibrated** (the TensorRT recipe): :func:`calibrate_convs` records
  per-conv ``max|x|`` over sample batches; passing the resulting scales to
  ``quantize_convs(fn, act_scales=...)`` bakes them in as constants, so
  quantize/dequantize are pure elementwise ops.

Measured end-to-end on the flagship (v5e, 800x1344 bs8,
``evidence/live_int8.json``): calibrated int8 runs at 0.86x bf16 (142 vs
165 img/s; dynamic 0.71x) — XLA materializes the int32 conv outputs and
the quant/dequant passes add HBM traffic that outweighs the 1.8x MXU gain
at these bandwidth-sensitive shapes. int8 is the right tool for strongly
MXU-bound serving shapes and half-size artifacts; bf16 stays the
throughput path for this flagship.

All other operations (bias adds, norms, decode, NMS, ...) run unchanged at
their original precision; convolutions inside nested control-flow bodies
(``lax.scan``/``while``/``cond`` sub-jaxprs) are left untouched — every
backbone/neck/head conv in the zoo sits in straight-line code.

The wrapped function is itself jittable: interpretation happens at trace
time, emitting ONE fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import core as jax_core

try:  # jax>=0.4.24 moved the public core namespace
    from jax.extend import core as jex_core

    _Literal = jex_core.Literal
except Exception:  # pragma: no cover - older jax
    _Literal = jax_core.Literal


class _QuantCtx:
    """Per-wrapped-call interpreter state: conv counter + scale source.

    ``collect`` (a list) switches the interpreter to calibration mode:
    convs run at source precision and their input abs-max is appended.
    ``act_scales`` (floats, one per conv in program order) switches to
    static scales; None means dynamic per-call reduction.
    """

    def __init__(self, act_scales=None, collect=None):
        self.act_scales = act_scales
        self.collect = collect
        self.idx = 0


def _quantized_conv(x, w, eqn_params, out_dtype, ctx: _QuantCtx):
    idx = ctx.idx
    ctx.idx += 1

    if ctx.collect is not None:
        ctx.collect.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        return jax.lax.conv_general_dilated_p.bind(x, w, **eqn_params)

    dn = eqn_params["dimension_numbers"]
    # rhs_spec = (out_ch, in_ch, *spatial); out_spec = (batch, out_ch, ...)
    rhs_out_dim = dn.rhs_spec[0]
    out_feat_dim = dn.out_spec[1]

    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    if ctx.act_scales is not None:
        s_x = jnp.float32(max(float(ctx.act_scales[idx]), 1e-8))
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    w_red_axes = tuple(i for i in range(wf.ndim) if i != rhs_out_dim)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=w_red_axes, keepdims=True) / 127.0, 1e-8)

    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    w_q = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)

    params = dict(eqn_params)
    params["preferred_element_type"] = jnp.int32
    y = jax.lax.conv_general_dilated_p.bind(x_q, w_q, **params)

    # broadcast the per-out-channel scale onto the conv output layout
    s_w_vec = jnp.reshape(s_w, (-1,))
    shape = [1] * y.ndim
    shape[out_feat_dim] = y.shape[out_feat_dim]
    y = y.astype(jnp.float32) * s_x * jnp.reshape(s_w_vec, shape)
    return y.astype(out_dtype)


# call-like primitives whose sub-jaxpr is inlined through the interpreter.
# Control-flow primitives (scan/while/cond) are NOT here: their jaxpr
# params have loop/branch semantics and bind handles them correctly —
# convs inside their bodies stay at source precision (documented scope).
_INLINE_CALLS = frozenset({
    "custom_jvp_call", "custom_vjp_call", "custom_jvp_call_jaxpr",
    "custom_vjp_call_jaxpr", "pjit", "jit", "closed_call", "core_call",
    "remat", "checkpoint", "remat2", "xla_call",
})


def _eval_jaxpr_quantized(jaxpr, consts, args, ctx: _QuantCtx):
    env = {}

    def read(v):
        if isinstance(v, _Literal):
            return v.val
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        if (eqn.primitive is jax.lax.conv_general_dilated_p
                and jnp.issubdtype(invals[0].dtype, jnp.floating)
                and jnp.issubdtype(invals[1].dtype, jnp.floating)):
            outvals = [_quantized_conv(invals[0], invals[1], eqn.params,
                                       eqn.outvars[0].aval.dtype, ctx)]
        elif eqn.primitive.name in _INLINE_CALLS:
            # call-like primitives (custom_jvp from jax.nn.relu, nested
            # pjit, remat) cannot be re-bound with value args — inline
            # their jaxpr through this interpreter (recursion also
            # quantizes any convs inside them)
            inner = (eqn.params.get("call_jaxpr")
                     or eqn.params.get("jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            consts_i = getattr(inner, "consts", [])
            jaxpr_i = getattr(inner, "jaxpr", inner)
            outvals = _eval_jaxpr_quantized(jaxpr_i, consts_i, invals, ctx)
        else:
            out = eqn.primitive.bind(*invals, **eqn.params)
            outvals = list(out) if eqn.primitive.multiple_results else [out]
        for v, val in zip(eqn.outvars, outvals):
            write(v, val)
    return [read(v) for v in jaxpr.outvars]


def _run(fn, args, ctx):
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
    flat_in = jax.tree_util.tree_leaves(args)
    out_flat = _eval_jaxpr_quantized(closed.jaxpr, closed.consts, flat_in,
                                     ctx)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(out_shape), out_flat)


def quantize_convs(fn, act_scales=None):
    """Wrap ``fn`` so every (straight-line) convolution runs int8.

    ``fn`` must be jittable; the wrapper is too, and positional-arg pytrees
    are supported. ``act_scales`` — per-conv activation scales from
    :func:`calibrate_convs` (program order); None = dynamic scales.
    Example::

        scales = calibrate_convs(predict, (sample_imgs, shapes, sfs))
        qpredict = jax.jit(quantize_convs(predict, act_scales=scales))
    """

    def wrapped(*args):
        return _run(fn, args, _QuantCtx(act_scales=act_scales))

    return wrapped


def calibrate_convs(fn, *arg_tuples):
    """Record per-conv activation scales over one or more sample inputs.

    Each element of ``arg_tuples`` is a tuple of positional args for
    ``fn``. Returns ``[s_0, s_1, ...]`` floats, one per conv in program
    order: ``max over batches of max|x| / 127`` — feed to
    ``quantize_convs(fn, act_scales=...)``. Runs ``fn`` unquantized while
    observing ranges (the TensorRT-style calibration pass).
    """
    # run the collect pass UNDER JIT, returning the observed ranges as the
    # outputs: interpreting eagerly would pin every intermediate activation
    # in the interpreter's environment (no liveness analysis) and OOM on
    # real input sizes, while under jit XLA frees dead intermediates and
    # DCEs everything the ranges don't depend on.
    def collect_fn(*args):
        collected = []
        _run(fn, args, _QuantCtx(collect=collected))
        return tuple(collected)

    jcollect = jax.jit(collect_fn)
    merged = None
    for args in arg_tuples:
        vals = [float(v) / 127.0 for v in jcollect(*args)]
        if merged is None:
            merged = vals
        else:
            if len(vals) != len(merged):
                raise ValueError("conv count changed between batches")
            merged = [max(a, b) for a, b in zip(merged, vals)]
    return merged or []
