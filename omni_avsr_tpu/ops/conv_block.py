"""Pallas fused conv+BN+PReLU(+residual) for the ResNet3D trunk
(EXPERIMENTAL, opt-in via OMNI_CONV_KERNEL=1 — see the measured negative
result below; the shipped trunk path is XLA convs with the same fused-
epilogue semantics via `_reference_conv`).

The reference trunk (`av_hubert/avhubert/resnet.py:35-169`) is a 2D
ResNet-18 over mouth-ROI frames: 3x3 convs at 22x22x64 .. 3x3x512, running
at ~18% MFU under XLA (benchmarks/train_breakdown.py). The kernel's FLAT
formulation pre-flattens (H, W) into one row axis (W padded to a lane-
friendly multiple) and phase-splits stride-2 inputs (space-to-depth), so
each kernel position is a contiguous-row slice and each of the kh*kw
accumulating matmuls is one big (FB*X, Cin) @ (Cin, Cout) MXU contraction
with the BN affine + residual + PReLU epilogue fused before the bf16
store.

BatchNorm handling (reference runs the frozen encoder in train() mode, so
training uses BATCH stats — `resnet.py` BN2d/BN3d defaults):
  - eval: running stats fold into a per-channel (scale, bias) affine fed to
    the kernel — the whole BasicBlock is 2 kernel launches.
  - train: batch stats are a global reduction over the conv OUTPUT, so the
    kernel emits the raw conv and the (XLA-fused) affine+PReLU runs outside.

Backward: gradients never flow through the trunk on the Omni path (the
video frontend is frozen and sits at the input edge), but the s2s
fine-tune drivers can train it — custom_vjp recomputes through the XLA
reference implementation, which is exactly what ran before this kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import on_tpu

# MEASURED NEGATIVE RESULT (round 3, docs/ROUND3_NOTES.md): in the full
# train program the kernel's 19 opaque launches cost ~1 ms each and its
# padded-W layout inflates deep-layer FLOPs up to 2.7x — resnet stage 18.2
# vs 7.8 ms, full step 97.0 vs 86.5 ms against XLA convs. Standalone the
# kernel beats the micro harness floor (~2 ms/conv), but XLA pipelines and
# fuses the full trunk better. Kept as an experiments-only path:
_ENABLE = os.environ.get("OMNI_CONV_KERNEL", "") not in ("", "0")
_DISABLE = (not _ENABLE) or os.environ.get(
    "OMNI_NO_CONV_KERNEL", "") not in ("", "0")
_VMEM_BUDGET = 15 * 1024 * 1024  # scoped-VMEM model bound (hard limit 16M)
_FORCE_FB = os.environ.get("OMNI_CONV_FB")  # experiment hook (benchmarks)


_TARGET_M = 3072  # FB*X rows per program — v5e sweep optimum (round-3 notes)


def _pick_fb(F: int, per_frame_bytes: int, X: int) -> int:
    """Power-of-two frames-per-block dividing F (F pre-padded to a multiple
    of 8): aim for ~_TARGET_M matmul rows per program, clamped by the
    scoped-VMEM budget. The v5e sweep (docs/ROUND3_NOTES.md) put every trunk
    shape at its fastest within ~10% of M=3k; too-small M starves the MXU,
    too-large blocks spill scoped VMEM (hard 16 MB, compile failure)."""
    fb = 8
    while (fb * 2 <= F and F % (fb * 2) == 0
           and per_frame_bytes * fb * 2 <= _VMEM_BUDGET
           and fb * X < _TARGET_M):
        fb *= 2
    return fb


def _conv_kernel(x_ref, w_ref, scale_ref, bias_ref, a_ref, res_ref, out_ref,
                 *, offsets, X, Cin, Cout, FB, act, residual, affine):
    """One frame-block of the FLAT formulation: the caller pre-flattens
    (H, W) into one row axis (and phase-splits stride-2 inputs into a
    leading plane dim), so every kernel position is a contiguous row slice
    and each matmul is one big (FB*X, Cin) @ (Cin, Cout) MXU contraction.
    Earlier variants that sliced 2D windows in-kernel batched the MXU over
    tiny M=W rows and measured 10-15x SLOWER than XLA's conv."""
    M = FB * X
    y = jnp.zeros((M, Cout), jnp.float32)
    for i, (ph, roff) in enumerate(offsets):
        s = x_ref[ph, :, roff:roff + X, :]  # (FB, X, Cin)
        y = y + jnp.dot(s.reshape(M, Cin),
                        w_ref[i * Cin:(i + 1) * Cin, :],
                        preferred_element_type=jnp.float32)
    if affine:
        y = y * scale_ref[:] + bias_ref[:]  # (1, Cout) broadcast
    if residual:
        y = y + res_ref[:].reshape(M, Cout).astype(jnp.float32)
    if act:
        a = a_ref[:]  # (1, Cout); PReLU (a=0 == ReLU)
        y = jnp.maximum(y, 0.0) + a * jnp.minimum(y, 0.0)
    out_ref[:] = y.reshape(FB, X, Cout).astype(out_ref.dtype)


def _conv_out_dim(H: int, k: int, stride: int, pad: int) -> int:
    return (H + 2 * pad - k) // stride + 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flat_planes(x, kh, kw, stride, pad, Ho, Wo):
    """XLA-side layout prep: pad + (phase-split for stride 2) + flatten
    (H, W) -> one row axis. Returns (planes (P, F, R, Cin), offsets, X, Wq)
    where position i of the kernel reads rows [offsets[i][1],
    offsets[i][1]+X) of plane offsets[i][0], and the valid output is
    out.reshape(F, Ho, Wq, Cout)[:, :, :Wo]."""
    F, H, W, Cin = x.shape
    if stride == 1:
        Wq = _round_up(W + 2 * pad, 8)
        Hq = Ho + kh  # worst-case flat offset (kh-1)*(Wq+1) fits
        xp = jnp.pad(x, ((0, 0), (pad, Hq - H - pad), (pad, Wq - W - pad), (0, 0)))
        planes = xp.reshape(F, 1, Hq * Wq, Cin).transpose(1, 0, 2, 3)
        offsets = tuple((0, dh * Wq + dw) for dh in range(kh) for dw in range(kw))
        return planes, offsets, Ho * Wq, Wq
    assert stride == 2
    # space-to-depth: 4 phase planes of (Hp/2, Wp/2); kernel position
    # (dh, dw) lives in phase (dh%2, dw%2) at plane offset (dh//2, dw//2)
    Hp = _round_up(H + 2 * pad, 2)
    Wp = _round_up(W + 2 * pad, 2)
    Wq = _round_up(Wp // 2, 8)
    Hq = Ho + (2 if kh > 1 else 0)
    xp = jnp.pad(x, ((0, 0), (pad, Hp - H - pad), (pad, Wp - W - pad), (0, 0)))
    z = xp.reshape(F, Hp // 2, 2, Wp // 2, 2, Cin)
    z = z.transpose(2, 4, 0, 1, 3, 5).reshape(4, F, Hp // 2, Wp // 2, Cin)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, Hq - Hp // 2), (0, Wq - Wp // 2), (0, 0)))
    planes = z.reshape(4, F, Hq * Wq, Cin)
    offsets = tuple(((dh % 2) * 2 + (dw % 2), (dh // 2) * Wq + (dw // 2))
                    for dh in range(kh) for dw in range(kw))
    return planes, offsets, Ho * Wq, Wq


def conv2d_fused_pallas(
    x: jax.Array,  # (F, H, W, Cin)
    w: jax.Array,  # (kh, kw, Cin, Cout)
    stride: int,
    pad: int,
    scale: Optional[jax.Array],  # (Cout,) f32 BN-fold scale, or None
    bias: Optional[jax.Array],
    prelu_a: Optional[jax.Array],  # (Cout,) or None for no activation
    residual: Optional[jax.Array],  # (F, Ho, Wo, Cout) or None
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Raw fused kernel entry (no vjp) — use fused_conv below."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not on_tpu()  # CPU tests run the kernel interpreted

    F, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho = _conv_out_dim(H, kh, stride, pad)
    Wo = _conv_out_dim(W, kw, stride, pad)
    affine = scale is not None
    act = prelu_a is not None
    has_res = residual is not None

    planes, offsets, X, Wq = _flat_planes(x.astype(jnp.bfloat16),
                                          kh, kw, stride, pad, Ho, Wo)
    P, _, R, _ = planes.shape
    if has_res:  # pad residual columns into the Wq layout, flatten
        res_flat = jnp.pad(residual, ((0, 0), (0, 0), (0, Wq - Wo), (0, 0)))
        res_flat = res_flat.reshape(F, Ho * Wq, Cout)
    else:
        res_flat = jnp.zeros((F, 1, 1), x.dtype)

    per_frame = (
        P * R * Cin * 2 * 2              # input block (double-buffered)
        # pessimistic: Mosaic can keep every unrolled position's slice live
        # on the scoped-vmem stack (observed 16 MB stack OOM otherwise)
        + kh * kw * X * Cin * 2
        + X * Cout * 4                   # f32 accumulator
        + X * Cout * 2 * 2               # output block (double-buffered)
        + (X * Cout * 2 * 2 if has_res else 0)
    )
    Fp = ((F + 7) // 8) * 8
    FB = int(_FORCE_FB) if _FORCE_FB else _pick_fb(Fp, per_frame, X)
    Fp = ((F + FB - 1) // FB) * FB
    if Fp != F:
        planes = jnp.pad(planes, ((0, 0), (0, Fp - F), (0, 0), (0, 0)))
        res_flat = jnp.pad(res_flat, ((0, Fp - F), (0, 0), (0, 0)))

    w2d = w.reshape(kh * kw * Cin, Cout).astype(jnp.bfloat16)
    ones = jnp.ones((1, Cout), jnp.float32)
    zeros = jnp.zeros((1, Cout), jnp.float32)
    scale2 = scale.reshape(1, Cout).astype(jnp.float32) if affine else ones
    bias2 = bias.reshape(1, Cout).astype(jnp.float32) if affine else zeros
    a2 = prelu_a.reshape(1, Cout).astype(jnp.float32) if act else zeros

    kernel = functools.partial(
        _conv_kernel, offsets=offsets, X=X, Cin=Cin, Cout=Cout, FB=FB,
        act=act, residual=has_res, affine=affine)

    grid = (Fp // FB,)
    res_block = (FB, X, Cout) if has_res else (FB, 1, 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, FB, R, Cin), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw * Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(res_block, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FB, X, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, X, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Fp * X * kh * kw * Cin * Cout,
            bytes_accessed=(Fp * P * R * Cin + Fp * X * Cout) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, w2d, scale2, bias2, a2, res_flat)
    return out[:F].reshape(F, Ho, Wq, Cout)[:, :, :Wo, :]


def _reference_conv(x, w, stride, pad, scale, bias, prelu_a, residual):
    """XLA reference with identical semantics (and the pre-kernel hot path:
    conv + BN-affine + residual + PReLU, f32 epilogue)."""
    # same-dtype conv (a preferred_element_type=f32 accumulator breaks the
    # conv transpose under AD with bf16 inputs); epilogue in f32
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if prelu_a is not None:
        a = prelu_a.astype(jnp.float32)
        y = jnp.maximum(y, 0.0) + a * jnp.minimum(y, 0.0)
    return y.astype(x.dtype)


def _make_fused(has_affine: bool, has_act: bool, has_res: bool):
    """custom_vjp wrapper: pallas forward, XLA-reference backward."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
    def fused(stride, pad, x, w, scale, bias, a, res):
        return conv2d_fused_pallas(
            x, w, stride, pad,
            scale if has_affine else None, bias if has_affine else None,
            a if has_act else None, res if has_res else None)

    def ref(stride, pad, x, w, scale, bias, a, res):
        return _reference_conv(
            x, w, stride, pad,
            scale if has_affine else None, bias if has_affine else None,
            a if has_act else None, res if has_res else None)

    def fwd(stride, pad, x, w, scale, bias, a, res):
        return fused(stride, pad, x, w, scale, bias, a, res), (x, w, scale, bias, a, res)

    def bwd(stride, pad, residuals, g):
        _, vjp = jax.vjp(lambda *args: ref(stride, pad, *args), *residuals)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


_FUSED = {
    (aff, act, res): _make_fused(aff, act, res)
    for aff in (False, True) for act in (False, True) for res in (False, True)
}


def fused_conv(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    pad: int = 1,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    prelu_a: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """conv2d + optional BN-affine + optional residual + optional PReLU,
    expressed for XLA to fuse (one Pallas kernel when OMNI_CONV_KERNEL=1 on
    TPU — experiments only, measured slower in-program). Order is the
    BasicBlock's: affine -> +residual -> activation (`resnet.py:35-60`)."""
    Cout = w.shape[-1]
    if _DISABLE or not on_tpu():
        return _reference_conv(x, w, stride, pad, scale, bias, prelu_a, residual)
    key = (scale is not None, prelu_a is not None, residual is not None)
    zc = jnp.zeros((Cout,), jnp.float32)
    return _FUSED[key](
        stride, pad, x, w,
        scale if scale is not None else zc,
        bias if bias is not None else zc,
        prelu_a if prelu_a is not None else zc,
        residual if residual is not None else jnp.zeros((1,), x.dtype),
    )


def bn_fold(p, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Frozen BN running stats -> per-channel (scale, bias) affine."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = p["scale"].astype(jnp.float32) * inv
    bias = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return scale, bias
