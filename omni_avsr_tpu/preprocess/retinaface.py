"""RetinaFace (ResNet-50) face detector — self-contained JAX implementation.

The reference detects faces with `ibug.face_detection.RetinaFacePredictor`
(`preprocessing_inference_example/detector.py:15-22`, threshold 0.8,
model "resnet50"), whose network/weights derive from the public
biubug6/Pytorch_Retinaface `cfg_re50` checkpoint. Those pip packages are
not installable in this environment, so this module re-implements the
network in JAX (NHWC, channel-last convs) with a torch-state-dict
converter (convert/detector_torch.py) keyed to that public layout:

  body.*            torchvision ResNet-50 (C3/C4/C5 = layer2/3/4)
  fpn.output{1,2,3} 1x1 lateral conv+BN (256) ; fpn.merge{1,2} 3x3 conv+BN
  ssh{1,2,3}        context module: 3x3 | 5x5(2x3x3) | 7x7(3x3x3) concat
  ClassHead/BboxHead/LandmarkHead  1x1 convs -> (A*2 / A*4 / A*10)

Anchors: min_sizes [[16,32],[64,128],[256,512]], steps [8,16,32],
variances [0.1, 0.2] (cfg_re50); SSD-style decode; host-side NMS.

All convs run in f32; BN is folded at inference (frozen stats). The
forward is jittable per input shape; NMS + thresholding stay on host
(offline preprocessing is not on the training hot path).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Params = Dict[str, any]

MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)


# ------------------------------------------------------------------ building


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding=None) -> jax.Array:
    """NHWC conv; w is (kh, kw, cin, cout)."""
    kh = w.shape[0]
    if padding is None:
        padding = [(kh // 2, kh // 2)] * 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_bn(x: jax.Array, p: Params, stride: int = 1, relu: bool = True,
            leaky: float = 0.0) -> jax.Array:
    """Conv + folded frozen BN (+ LeakyReLU). p = {"w", "scale", "bias"}
    where scale/bias are the BN fold (gamma/sqrt(var+eps), beta-mean*scale)."""
    y = conv2d(x, p["w"], stride) * p["scale"] + p["bias"]
    if relu:
        y = jnp.where(y >= 0, y, leaky * y)
    return y


def _bottleneck(x: jax.Array, p: Params, stride: int) -> jax.Array:
    h = conv_bn(x, p["conv1"])
    h = conv_bn(h, p["conv2"], stride=stride)
    h = conv_bn(h, p["conv3"], relu=False)
    if "downsample" in p:
        x = conv_bn(x, p["downsample"], stride=stride, relu=False)
    return jax.nn.relu(x + h)


def resnet50_c345(x: jax.Array, p: Params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """torchvision ResNet-50 trunk -> (C3 /8 512ch, C4 /16 1024ch, C5 /32 2048ch)."""
    h = conv_bn(x, p["stem"], stride=2)  # 7x7/2
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    outs = []
    for li, blocks in enumerate(p["layers"]):
        for bi, blk in enumerate(blocks):
            h = _bottleneck(h, blk, stride=(2 if bi == 0 and li > 0 else 1))
        outs.append(h)
    return outs[1], outs[2], outs[3]


def _upsample_to(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize to (H, W) — matches F.interpolate(nearest)."""
    H, W = hw
    h_idx = (jnp.arange(H) * x.shape[1] // H).astype(jnp.int32)
    w_idx = (jnp.arange(W) * x.shape[2] // W).astype(jnp.int32)
    return x[:, h_idx][:, :, w_idx]


def _ssh(x: jax.Array, p: Params) -> jax.Array:
    c3 = conv_bn(x, p["conv3x3"], relu=False)
    h5 = conv_bn(x, p["conv5x5_1"])
    c5 = conv_bn(h5, p["conv5x5_2"], relu=False)
    h7 = conv_bn(h5, p["conv7x7_2"])
    c7 = conv_bn(h7, p["conv7x7_3"], relu=False)
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def _head(x: jax.Array, p: Params, out_per_anchor: int) -> jax.Array:
    y = conv2d(x, p["w"], padding=[(0, 0), (0, 0)]) + p["b"]
    B = x.shape[0]
    return y.reshape(B, -1, out_per_anchor)


def retinaface_forward(params: Params, images: jax.Array):
    """(B, H, W, 3) f32 BGR, mean-subtracted (104, 117, 123) — the
    biubug6/ibug preprocessing — -> (loc (B, A, 4), conf (B, A, 2) softmaxed,
    ldm (B, A, 10))."""
    c3, c4, c5 = resnet50_c345(images, params["body"])
    f = params["fpn"]
    o1 = conv_bn(c3, f["output1"])
    o2 = conv_bn(c4, f["output2"])
    o3 = conv_bn(c5, f["output3"])
    o2 = conv_bn(o2 + _upsample_to(o3, o2.shape[1:3]), f["merge2"])
    o1 = conv_bn(o1 + _upsample_to(o2, o1.shape[1:3]), f["merge1"])
    feats = [_ssh(o, params[f"ssh{i+1}"]) for i, o in enumerate((o1, o2, o3))]
    loc = jnp.concatenate(
        [_head(ft, params["bbox_head"][i], 4) for i, ft in enumerate(feats)], axis=1)
    conf = jnp.concatenate(
        [_head(ft, params["class_head"][i], 2) for i, ft in enumerate(feats)], axis=1)
    ldm = jnp.concatenate(
        [_head(ft, params["landmark_head"][i], 10) for i, ft in enumerate(feats)], axis=1)
    return loc, jax.nn.softmax(conf, axis=-1), ldm


# ----------------------------------------------------------- anchors / boxes


def priors_for(height: int, width: int) -> np.ndarray:
    """PriorBox(cfg_re50) anchors in (cx, cy, sx, sy) normalized form."""
    out = []
    for sizes, step in zip(MIN_SIZES, STEPS):
        fh = -(-height // step)
        fw = -(-width // step)
        # PriorBox order: product(range(fh), range(fw)) x min_sizes —
        # i (rows) major, then j, then size — matching the heads'
        # (B, H, W, A*out).reshape(B, -1, out) flattening
        i, j, s = np.meshgrid(np.arange(fh), np.arange(fw),
                              np.arange(len(sizes)), indexing="ij")
        i, j, s = [a.reshape(-1) for a in (i, j, s)]
        sk = np.asarray(sizes)[s]
        out.append(np.stack([
            (j + 0.5) * step / width,
            (i + 0.5) * step / height,
            sk / width,
            sk / height,
        ], axis=-1))
    return np.concatenate(out, axis=0).astype(np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """SSD decode (variances 0.1/0.2) -> corner-form normalized boxes.

    The exp argument is clamped (trained biubug6 regressions stay well
    inside ±10; anything larger is garbage) so unconverged/random weights
    cannot overflow to inf and poison the downstream crop."""
    cxy = priors[:, :2] + loc[:, :2] * VARIANCES[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(np.clip(loc[:, 2:] * VARIANCES[1], -10.0, 10.0))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.4) -> List[int]:
    """Greedy IoU NMS (host-side; the py_cpu_nms semantics)."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-12)
        order = order[1:][iou <= iou_thresh]
    return keep


# Module-level jit: compile cache keyed here, not on a per-frame wrapper
# (avoids per-call wrapper construction overhead in the frame loop).
_retinaface_forward_jit = jax.jit(retinaface_forward)


def detect_faces(
    params: Params,
    frame_bgr: np.ndarray,  # (H, W, 3) uint8 BGR
    threshold: float = 0.8,
    iou_thresh: float = 0.4,
) -> np.ndarray:
    """Returns (N, 5) [x1, y1, x2, y2, score] in pixels, score-sorted —
    the RetinaFacePredictor output consumed by the reference's
    largest-face pick (`detector.py:24-38`). Non-finite or degenerate
    (zero/negative extent) boxes are dropped before NMS so garbage
    regressions surface as "no detection" (frame -> None upstream),
    never as a garbage crop."""
    H, W = frame_bgr.shape[:2]
    x = frame_bgr.astype(np.float32) - np.array([104.0, 117.0, 123.0], np.float32)
    loc, conf, _ = _retinaface_forward_jit(params, jnp.asarray(x[None]))
    loc = np.asarray(loc[0])
    scores = np.asarray(conf[0][:, 1])
    boxes = decode_boxes(loc, priors_for(H, W)) * np.array([W, H, W, H], np.float32)
    keep = (
        (scores > threshold)
        & np.isfinite(boxes).all(axis=1)
        & (boxes[:, 2] > boxes[:, 0])
        & (boxes[:, 3] > boxes[:, 1])
    )
    boxes, scores = boxes[keep], scores[keep]
    if len(boxes) == 0:
        return np.zeros((0, 5), np.float32)
    order = nms(boxes, scores, iou_thresh)
    return np.concatenate([boxes[order], scores[order, None]], axis=-1)
