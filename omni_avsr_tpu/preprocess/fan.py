"""FAN 2D 68-landmark network — self-contained JAX implementation.

The reference localizes landmarks with `ibug.face_alignment.FANPredictor`
(`preprocessing_inference_example/detector.py:22, 28`), a packaging of
Bulat & Tzimiropoulos' Face Alignment Network (stacked hourglasses with
pre-activation ConvBlocks; github.com/1adrianb/face-alignment). The pip
package is unavailable here, so this re-implements the network in JAX
(NHWC) with a torch-state-dict converter keyed to the public FAN layout
(conv1/bn1, conv2-4 ConvBlocks, m{i}/top_m_{i}/conv_last{i}/bn_end{i}/
l{i}/bl{i}/al{i} per hourglass module).

Pipeline (FANPredictor semantics): crop the detected face box to a
256x256 patch around its center (scale from the box size), run the
network, take each of the 68 heatmaps' argmax at 64x64 with the classic
quarter-pixel offset toward the stronger neighbour, and map back to image
coordinates through the inverse crop transform. The crop constants
(reference-point shift 0.12, scale divisor 195 — the 1adrianb values the
ibug models were trained with) live in `CropSpec` so they can be pinned
against real weights the day they are reachable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .retinaface import conv2d

Params = Dict[str, any]


def _bn_relu(x: jax.Array, p: Params) -> jax.Array:
    return jax.nn.relu(x * p["scale"] + p["bias"])


def conv_block(x: jax.Array, p: Params) -> jax.Array:
    """FAN pre-activation ConvBlock: three bn-relu-conv stages producing
    out/2, out/4, out/4 channels, concatenated, plus a (projected) skip."""
    h1 = conv2d(_bn_relu(x, p["bn1"]), p["conv1"])
    h2 = conv2d(_bn_relu(h1, p["bn2"]), p["conv2"])
    h3 = conv2d(_bn_relu(h2, p["bn3"]), p["conv3"])
    out = jnp.concatenate([h1, h2, h3], axis=-1)
    skip = x
    if "down" in p:
        skip = conv2d(jax.nn.relu(x * p["down_bn"]["scale"]
                                  + p["down_bn"]["bias"]),
                      p["down"], padding=[(0, 0), (0, 0)])
    return out + skip


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _upsample2(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
    ).reshape(B, H * 2, W * 2, C)


def hourglass(x: jax.Array, p: Params, level: int = 4) -> jax.Array:
    """Recursive hourglass: up branch + pooled branch (recurse), nearest
    2x upsample and add."""
    lv = str(level)
    up1 = conv_block(x, p["b1_" + lv])
    low1 = conv_block(_avg_pool2(x), p["b2_" + lv])
    if level > 1:
        low2 = hourglass(low1, p, level - 1)
    else:
        low2 = conv_block(low1, p["b2_plus_" + lv])
    low3 = conv_block(low2, p["b3_" + lv])
    return up1 + _upsample2(low3)


def fan_forward(params: Params, x: jax.Array) -> jax.Array:
    """(B, 256, 256, 3) f32 in [0, 1] -> (B, 64, 64, 68) final-module
    heatmaps (intermediate supervision outputs are inference-irrelevant)."""
    h = conv2d(x, params["conv1"]["w"], stride=2) + params["conv1"]["b"]
    h = _bn_relu(h, params["bn1"])
    h = conv_block(h, params["conv2"])
    h = _avg_pool2(h)
    h = conv_block(h, params["conv3"])
    h = conv_block(h, params["conv4"])
    previous = h
    out = None
    n = len(params["modules"])
    for i, m in enumerate(params["modules"]):
        hg = hourglass(previous, m["hg"])
        ll = conv_block(hg, m["top_m"])
        ll = _bn_relu(conv2d(ll, m["conv_last"]["w"],
                             padding=[(0, 0), (0, 0)]) + m["conv_last"]["b"],
                      m["bn_end"])
        out = conv2d(ll, m["l"]["w"], padding=[(0, 0), (0, 0)]) + m["l"]["b"]
        if i < n - 1:
            previous = (previous
                        + conv2d(ll, m["bl"]["w"], padding=[(0, 0), (0, 0)])
                        + m["bl"]["b"]
                        + conv2d(out, m["al"]["w"], padding=[(0, 0), (0, 0)])
                        + m["al"]["b"])
    return out


# --------------------------------------------------------------- crop/decode


@dataclass(frozen=True)
class CropSpec:
    """Face-box -> 256x256 crop geometry (1adrianb constants; see module
    docstring)."""

    resolution: int = 256
    heatmap: int = 64
    center_shift: float = 0.12  # center moved up by this * box height
    scale_div: float = 195.0  # scale = (w + h) / scale_div
    scale_mul: float = 200.0  # crop side = scale * scale_mul


def crop_face(frame_rgb: np.ndarray, box: np.ndarray,
              spec: CropSpec = CropSpec()) -> Tuple[np.ndarray, np.ndarray, float]:
    """Crop + bilinear-resize the face box region to (res, res).
    Returns (patch f32 [0,1], center (2,), side_in_pixels).

    Out-of-frame samples are ZERO (the 1adrianb crop zero-pads regions
    outside the image, so faces near frame borders see black, not
    clamp-to-edge smears). Raises ValueError on a non-finite or
    degenerate box — callers must map that frame to None (reference
    semantics: landmark interpolation covers detection gaps,
    `preprocessing_inference_example/video_process.py:120-145`)."""
    x1, y1, x2, y2 = box[:4]
    if (not np.all(np.isfinite(box[:4]))) or x2 <= x1 or y2 <= y1:
        raise ValueError(f"degenerate face box {box[:4]}")
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
    center[1] -= (y2 - y1) * spec.center_shift
    scale = (x2 - x1 + y2 - y1) / spec.scale_div
    side = scale * spec.scale_mul
    res = spec.resolution
    # sample grid over the crop square (bilinear, zero padding outside)
    ys = center[1] - side / 2 + (np.arange(res) + 0.5) * side / res
    xs = center[0] - side / 2 + (np.arange(res) + 0.5) * side / res
    H, W = frame_rgb.shape[:2]
    y0 = np.floor(ys - 0.5).astype(int)
    x0 = np.floor(xs - 0.5).astype(int)
    wy = (ys - 0.5 - y0)[:, None, None]
    wx = (xs - 0.5 - x0)[None, :, None]
    img = frame_rgb.astype(np.float32) / 255.0

    def tap(yi: np.ndarray, xi: np.ndarray) -> np.ndarray:
        valid = (((yi >= 0) & (yi < H))[:, None, None]
                 & ((xi >= 0) & (xi < W))[None, :, None])
        g = img[np.clip(yi, 0, H - 1)][:, np.clip(xi, 0, W - 1)]
        return g * valid

    patch = (tap(y0, x0) * (1 - wy) * (1 - wx) + tap(y0, x0 + 1) * (1 - wy) * wx
             + tap(y0 + 1, x0) * wy * (1 - wx) + tap(y0 + 1, x0 + 1) * wy * wx)
    return patch, center, side


def heatmaps_to_landmarks(
    heatmaps: np.ndarray,  # (64, 64, 68)
    center: np.ndarray,
    side: float,
    spec: CropSpec = CropSpec(),
) -> np.ndarray:
    """Per-heatmap argmax + quarter-pixel shift toward the stronger
    neighbour, mapped back through the inverse crop transform -> (68, 2)."""
    hm = heatmaps.transpose(2, 0, 1)  # (68, 64, 64)
    N, Hh, Wh = hm.shape
    flat = hm.reshape(N, -1)
    idx = flat.argmax(axis=1)
    py, px = np.unravel_index(idx, (Hh, Wh))
    pts = np.stack([px, py], axis=-1).astype(np.float64)
    for k in range(N):
        x, y = int(px[k]), int(py[k])
        if 0 < x < Wh - 1:
            pts[k, 0] += 0.25 * np.sign(hm[k, y, x + 1] - hm[k, y, x - 1])
        if 0 < y < Hh - 1:
            pts[k, 1] += 0.25 * np.sign(hm[k, y + 1, x] - hm[k, y - 1, x])
    # heatmap pixel -> crop pixel -> image coordinates
    ratio = side / spec.heatmap
    origin = center - side / 2.0
    return (pts + 0.5) * ratio + origin[None, :]


# Module-level jit: compile cache keyed here, not on a per-frame wrapper
# (avoids per-call wrapper construction overhead in the frame loop).
_fan_forward_jit = jax.jit(fan_forward)


def fan_landmarks(params: Params, frame_rgb: np.ndarray, box: np.ndarray,
                  spec: CropSpec = CropSpec()) -> np.ndarray:
    """Full FANPredictor step for one face box -> (68, 2) image-space
    landmarks (float64, the dtype the warp tail consumes). Raises
    ValueError on a degenerate box (see crop_face)."""
    patch, center, side = crop_face(frame_rgb, box, spec)
    hm = _fan_forward_jit(params, jnp.asarray(patch[None]))
    return heatmaps_to_landmarks(np.asarray(hm[0]), center, side, spec)
