"""Int8 post-training-quantized conv for inference (TPU MXU int8 path).

TPU v5e runs int8 MXU ops at ~2x the bf16 rate; measured on this chip the
dominant dilated backbone convs (layer3/layer4 of the ResNet18-8s trunk,
~112 of ~130 GF/img) hit 250 TOP/s int8 vs 128 TF/s bf16, and still win
1.36-1.4x with the quantize/dequantize passes fused in-graph
(tools/bench_int8_conv.py). Since the bf16 backbone already runs at ~94%
of roofline, this is the main remaining single-chip throughput lever.

Scheme (standard symmetric PTQ):
  - weights: per-output-channel absmax/127 scale, quantized in-graph from
    the checkpoint's float kernel (11M params -> the requantize pass is
    ~50 us/step and keeps checkpoints/param-trees byte-identical to the
    unquantized model);
  - activations: dynamic per-tensor absmax/127 (one cheap reduction per
    conv; no calibration state to manage);
  - accumulation: int32 (exact), dequant to the model dtype.

The class is deliberately named ``Conv`` so Flax's class-name-based
submodule auto-naming produces the same param paths (``Conv_0``, ...) as
``nn.Conv`` — trained checkpoints load into quantized models unchanged.

The reference has no quantization path; this is TPU-native machinery on
top of the reference's inference surface (ref lib/networks/resnet.py
backbone semantics are preserved up to quantization error — see
tests/test_quant_conv.py for the error bound and eval-metric checks).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class Conv(nn.Conv):
    """Drop-in ``nn.Conv`` that runs the conv in int8 when ``quant=True``.

    With ``quant=False`` (default) it is exactly ``nn.Conv``. Parameters
    (names, shapes, dtypes, init) are identical either way, so the same
    variables tree serves both modes.

    ``mode`` selects the activation-scale scheme:
      - 'dynamic' (default): per-image absmax computed in-graph. Zero
        calibration state, but each conv pays an extra full read of its
        input for the reduction, and the quantize pass cannot start until
        it finishes.
      - 'calibrate': like dynamic, but also tracks the running absmax in a
        ``quant`` variable collection (run a few batches with
        ``mutable=['quant']`` — see :func:`calibrate`).
      - 'static': uses the calibrated scalar scale. The quantize becomes a
        pure elementwise chain with a compile-time-constant-shaped scalar,
        so XLA fuses it into the producing op — no absmax pass, no extra
        HBM round trip. Per-image determinism: results depend only on the
        image (the ADVICE-r2 batch-composition concern does not apply).
    """
    quant: bool = False
    mode: str = "dynamic"   # dynamic | calibrate | static

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.quant:
            return super().__call__(x)

        if isinstance(self.kernel_size, int):
            kernel_size = (self.kernel_size,)
        else:
            kernel_size = tuple(self.kernel_size)
        cin = x.shape[-1]
        assert self.feature_group_count == 1, "quant conv: groups == 1 only"
        assert self.input_dilation in (None, 1), \
            "quant conv: input_dilation unsupported"
        assert self.mask is None, "quant conv: kernel masks unsupported"
        assert isinstance(self.padding, str) or (
            not isinstance(self.padding, int)
            and all(len(p) == 2 for p in self.padding)), \
            "quant conv: padding must be a string or (lo, hi) pairs"
        kshape = kernel_size + (cin, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape,
                            self.param_dtype)

        def _pair(v, default):
            if v is None:
                return (default,) * len(kernel_size)
            if isinstance(v, int):
                return (v,) * len(kernel_size)
            return tuple(v)

        strides = _pair(self.strides, 1)
        kernel_dilation = _pair(self.kernel_dilation, 1)

        # per-output-channel symmetric weight scale
        k = kernel.astype(jnp.float32)
        s_w = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
        s_w = jnp.maximum(s_w, 1e-12) / 127.0          # [cout]
        k_i8 = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)

        assert x.ndim == 4, "quant conv: NHWC 2D conv only"
        xf = x.astype(jnp.float32)
        if self.mode == "dynamic":
            # per-IMAGE symmetric scale: a per-tensor absmax would make
            # each image's quantization (and pose) depend on which other
            # images share the batch; conv is linear per image, so a
            # [b,1,1,1] scale factored out is exact and costs the same
            # single reduction (ADVICE r2)
            s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                      keepdims=True), 1e-12) / 127.0
        elif (self.mode == "static"
              and not self.has_variable("quant", "act_absmax")):
            # static mode without a calibrated 'quant' collection (e.g.
            # the train loop's loss-eval forward, which applies with only
            # params/batch_stats): fall back to the per-image dynamic
            # scale rather than failing — numerically it is the same
            # scheme with a per-dispatch scale
            s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                      keepdims=True), 1e-12) / 127.0
        else:
            amax = self.variable("quant", "act_absmax",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.mode == "calibrate":
                amax.value = jnp.maximum(amax.value,
                                         jnp.max(jnp.abs(xf)))
            s_x = jnp.maximum(amax.value, 1e-12) / 127.0
        q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

        dn = lax.conv_dimension_numbers(q.shape, k_i8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            q, k_i8, strides, self.padding,
            rhs_dilation=kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            out = out + bias.astype(jnp.float32)
        return out.astype(self.dtype)


def conv2d_int8(x, w, strides=(1, 1), padding=((0, 0), (0, 0)),
                rhs_dilation=None, s_x=None):
    """Functional int8 symmetric-PTQ NHWC conv (same scheme as ``Conv``).

    For compute paths that are plain ``lax`` ops rather than Flax modules
    (the packed inference tail, ops/packed_tail.py). Weights get a
    per-output-channel absmax/127 scale quantized in-graph; activations a
    per-image [b, 1, 1, 1] absmax/127 scale (``s_x=None``, the default —
    per-image keeps results independent of batch composition, ADVICE r2)
    or a caller-supplied static scale (scalar or [b,1,1,1]), in which case
    the quantize is a pure elementwise chain XLA fuses into the producer.

    Args:
      x: [b, h, w, cin] float input.
      w: [kh, kw, cin, cout] float kernel.
    Returns the conv result in float32 (exact int32 accumulation,
    dequantized) — no bias, no activation."""
    xf = x.astype(jnp.float32)
    wf = jnp.asarray(w, jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    if s_x is None:
        s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3),
                                  keepdims=True), 1e-12) / 127.0
    else:
        s_x = jnp.asarray(s_x, jnp.float32)
    q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        q, w_i8, strides, padding, rhs_dilation=rhs_dilation,
        dimension_numbers=lax.conv_dimension_numbers(
            q.shape, w_i8.shape, ("NHWC", "HWIO", "NHWC")),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_w)


def calibrate(model, variables, batches, **apply_kw):
    """Run calibration batches through a ``quant_mode='calibrate'`` model
    and return the ``quant`` collection (running per-conv activation
    absmax). Feed the returned collection to a ``quant_mode='static'``
    model: ``model.apply({**variables, 'quant': quant}, x, train=False)``.

    ``batches``: iterable of image arrays. A handful of representative
    batches suffices (the scale only sets the clipping point). Both passes
    are jitted — never run eager compute loops on this backend
    (CLAUDE.md)."""
    import jax

    init = jax.jit(lambda v, x: model.apply(
        v, x, mutable=["quant"], **apply_kw)[1]["quant"])
    upd = jax.jit(lambda v, q, x: model.apply(
        {**v, "quant": q}, x, mutable=["quant"], **apply_kw)[1]["quant"])
    it = iter(batches)
    quant = init(dict(variables), next(it))
    for x in it:
        quant = upd(dict(variables), quant, x)
    return quant
