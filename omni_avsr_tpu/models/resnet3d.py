"""ResNet3D video frontend (AV-HuBERT's `ResEncoder`).

Re-design of `av_hubert/avhubert/resnet.py:35-169` for TPU:
  - channel-last layouts (NDHWC / NHWC) so XLA tiles convs onto the MXU
  - time axis folded into batch for the 2D trunk (one big conv batch
    instead of the reference's per-frame reshape of NCHW tensors)
  - BatchNorms run frozen (inference stats) — the encoder is frozen in
    Omni-AVSR; `train_mode=True` switches to batch statistics to mirror
    torch train() semantics when needed.

Structure: Conv3d(1->64, k=(5,7,7), s=(1,2,2)) + BN + PReLU +
MaxPool3d(k=(1,3,3), s=(1,2,2)) -> ResNet-18 trunk (BasicBlock x [2,2,2,2],
PReLU) -> global avg-pool -> (B, T, 512).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.norms import batch_norm_inference
from .common import Params


def prelu(x: jax.Array, a: jax.Array) -> jax.Array:
    """Per-channel PReLU; channel is the last axis."""
    a = a.astype(x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _bn(x: jax.Array, p: Params, train_mode: bool, eps: float = 1e-5) -> jax.Array:
    if train_mode:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        if os.environ.get("OMNI_BN_STATS", "onepass") == "onepass":
            # E[x^2]-E[x]^2: both reductions read the conv output ONCE and
            # fuse into its epilogue; jnp.var's E[(x-mean)^2] forces a second
            # full pass over the tensor (the stats result feeds a re-read).
            # f32 accumulation over BN-scale activations — cancellation-safe;
            # clamped for the var≈0 corner. OMNI_BN_STATS=twopass restores
            # the textbook form.
            mean = jnp.mean(xf, axis=axes)
            var = jnp.maximum(jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
        else:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
        inv = jax.lax.rsqrt(var + eps)
        y = (xf - mean) * inv * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    return batch_norm_inference(x, p["scale"], p["bias"], p["mean"], p["var"], eps)


def _act(x: jax.Array, p: Params, name: str) -> jax.Array:
    if name in p:
        return prelu(x, p[name])
    return jax.nn.relu(x)


def _conv2d(x: jax.Array, w: jax.Array, stride: int, padding: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _prelu_vec(p: Params, name: str, cout: int) -> jax.Array:
    """PReLU slope vector; the relu_type='relu' variant is PReLU with a=0."""
    return p[name] if name in p else jnp.zeros((cout,), jnp.float32)


def _basic_block(p: Params, x: jax.Array, stride: int, train_mode: bool) -> jax.Array:
    """BasicBlock (`resnet.py:35-60`) through ops/conv_block.fused_conv:
    XLA convs with the BN affine folded per-channel and the
    affine+residual+PReLU epilogue expressed for XLA to fuse (the Pallas
    kernel behind the same interface is an opt-in experiment — measured
    slower in-program, docs/ROUND3_NOTES.md). Eval: frozen BN running stats
    fold into (scale, bias). Train: the reference runs batch statistics
    (frozen encoder in train() mode), a global reduction over the conv
    output, so the conv emits raw and the affine+PReLU runs as one
    XLA-fused elementwise pass."""
    from ..ops.conv_block import bn_fold, fused_conv

    cout = p["conv1"]["w"].shape[-1]
    a1 = _prelu_vec(p, "prelu1", cout)
    a2 = _prelu_vec(p, "prelu2", cout)

    if not train_mode:
        residual = x
        if "downsample" in p:
            sd, bd = bn_fold(p["downsample"]["bn"])
            residual = fused_conv(x, p["downsample"]["conv"]["w"], stride, 0,
                                  scale=sd, bias=bd)
        s1, b1 = bn_fold(p["bn1"])
        h = fused_conv(x, p["conv1"]["w"], stride, 1, scale=s1, bias=b1,
                       prelu_a=a1)
        s2, b2 = bn_fold(p["bn2"])
        return fused_conv(h, p["conv2"]["w"], 1, 1, scale=s2, bias=b2,
                          prelu_a=a2, residual=residual)

    residual = x
    if "downsample" in p:
        r = fused_conv(x, p["downsample"]["conv"]["w"], stride, 0)
        residual = _bn(r, p["downsample"]["bn"], True)
    h = fused_conv(x, p["conv1"]["w"], stride, 1)
    h = prelu(_bn(h, p["bn1"], True), a1)
    h = fused_conv(h, p["conv2"]["w"], 1, 1)
    h = _bn(h, p["bn2"], True)
    return prelu(h + residual, a2)


def _init_bn(c: int, dtype) -> Params:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_resnet3d(rng: jax.Array, relu_type: str = "prelu", dtype=jnp.float32) -> Params:
    """Random init (torch-style normal(0, sqrt(2/n)) on convs) — real runs
    load converted AV-HuBERT weights."""
    import numpy as np

    keys = iter(jax.random.split(rng, 64))

    def conv(kh, kw, cin, cout):
        n = kh * kw * cout
        return {"w": jax.random.normal(next(keys), (kh, kw, cin, cout), dtype) * np.sqrt(2.0 / n)}

    def block(cin, cout, downsample):
        p = {
            "conv1": conv(3, 3, cin, cout),
            "bn1": _init_bn(cout, dtype),
            "conv2": conv(3, 3, cout, cout),
            "bn2": _init_bn(cout, dtype),
        }
        if relu_type == "prelu":
            p["prelu1"] = jnp.full((cout,), 0.25, dtype)
            p["prelu2"] = jnp.full((cout,), 0.25, dtype)
        if downsample:
            p["downsample"] = {"conv": conv(1, 1, cin, cout), "bn": _init_bn(cout, dtype)}
        return p

    n3 = 5 * 7 * 7 * 64
    params: Params = {
        "stem": {
            "conv": {"w": jax.random.normal(next(keys), (5, 7, 7, 1, 64), dtype) * np.sqrt(2.0 / n3)},
            "bn": _init_bn(64, dtype),
        },
        "layer1": {"b0": block(64, 64, False), "b1": block(64, 64, False)},
        "layer2": {"b0": block(64, 128, True), "b1": block(128, 128, False)},
        "layer3": {"b0": block(128, 256, True), "b1": block(256, 256, False)},
        "layer4": {"b0": block(256, 512, True), "b1": block(512, 512, False)},
    }
    if relu_type == "prelu":
        params["stem"]["prelu"] = jnp.full((64,), 0.25, dtype)
    return params


def stem_pool(
    params: Params,
    video: jax.Array,  # (B, T, H, W, C=1)
    train_mode: bool = False,
) -> jax.Array:
    """3D stem conv + BN + PReLU + MaxPool; returns (B*T, H/4, W/4, 64)."""
    B, T, H, W, C = video.shape
    x = video

    # 3D stem — space-to-depth formulation: the reference conv has C_in=1
    # and spatial stride 2, which XLA's conv lowering runs at ~6 TFLOP/s on
    # v5e. Folding each 2x2 spatial block into channels turns it into a
    # stride-1 conv with C_in=4 and a (5,4,4) kernel — exactly the same
    # arithmetic (kernel zero-padded 7->8 then regrouped; parity-tested
    # against the direct conv AND torch in tests/test_video_tower.py).
    stem = params["stem"]
    w3 = stem["conv"]["w"].astype(x.dtype)  # (5, 7, 7, 1, 64)
    kD, kH, kW, _, CO = w3.shape
    if kH % 2 == 1:
        w3 = jnp.pad(w3, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    # (5, 8, 8, 1, CO) -> (5, 4, 4, [2x2 phase], CO); phase (a, b) of the
    # kernel pairs with input offset (a, b) inside each 2x2 block
    w4 = w3.reshape(kD, (kH + 1) // 2, 2, (kW + 1) // 2, 2, 1, CO)
    w4 = w4.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        kD, (kH + 1) // 2, (kW + 1) // 2, 4, CO)

    xp = jnp.pad(x, ((0, 0), (2, 2), (3, 3), (3, 3), (0, 0)))
    Bp, Tp, Hp, Wp, _ = xp.shape
    z = xp.reshape(Bp, Tp, Hp // 2, 2, Wp // 2, 2, 1)
    z = z.transpose(0, 1, 2, 4, 3, 5, 6).reshape(Bp, Tp, Hp // 2, Wp // 2, 4)
    # Time-window-to-channels: XLA's NDHWC 3D conv lowering runs this stem
    # at ~5% MFU / 6.5x its HBM floor (benchmarks/resnet_breakdown.py,
    # docs/ROUND4_NOTES.md) — the D=5 window defeats its tiling. Stacking
    # the 5 time slices as channels turns it into ONE dense 2D conv with
    # K = 5*4*4*4 = 320 contraction taps over B*T frames — identical
    # arithmetic (out[t] = sum_d conv2d(z[t+d-2], w4[d])), MXU-friendly.
    zz = jnp.concatenate([z[:, d:d + T] for d in range(kD)], axis=-1)
    w2 = w4.transpose(1, 2, 0, 3, 4).reshape(
        (kH + 1) // 2, (kW + 1) // 2, kD * 4, CO)
    x = jax.lax.conv_general_dilated(
        zz.reshape(Bp * T, Hp // 2, Wp // 2, kD * 4), w2,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(Bp, T, x.shape[1], x.shape[2], CO)
    x = _bn(x, stem["bn"], train_mode)
    x = _act(x, stem, "prelu")
    # MaxPool3d k=(1,3,3) s=(1,2,2) p=(0,1,1): time untouched -> fold T into
    # batch now and use a 2D window (cheaper layout for XLA)
    _, Tn, Hn, Wn, Cn = x.shape
    x = x.reshape(B * Tn, Hn, Wn, Cn)
    # NB: the init value must be a weak-typed python scalar — a concrete
    # bf16 array here breaks reduce_window's reverse-mode rule (found by
    # differentiating the full encoder at bf16)
    x = jax.lax.reduce_window(
        x, -float("inf"),
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return x


def trunk_layer(
    params: Params, name: str, x: jax.Array, train_mode: bool = False
) -> jax.Array:
    """One ResNet-18 layer (two BasicBlocks) over (B*T, H, W, C) frames."""
    stride = 1 if name == "layer1" else 2
    blocks = params[name]
    x = _basic_block(blocks["b0"], x, stride, train_mode)
    return _basic_block(blocks["b1"], x, 1, train_mode)


def resnet3d_forward(
    params: Params,
    video: jax.Array,  # (B, T, H, W, C=1)
    train_mode: bool = False,
) -> jax.Array:
    """Returns per-frame features (B, T, 512)."""
    B, T = video.shape[:2]
    x = stem_pool(params, video, train_mode)
    for name in ("layer1", "layer2", "layer3", "layer4"):
        x = trunk_layer(params, name, x, train_mode)
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
    return x.reshape(B, T, -1)
