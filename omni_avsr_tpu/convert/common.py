"""Shared helpers for PyTorch-checkpoint -> JAX pytree conversion.

Torch is used host-side only (CPU tensors -> numpy); nothing torch ever
touches the device. Conversion is the backbone of numerics parity
(SURVEY.md §7 step 2): every model has an activation-parity test against
the torch implementation at identical weights.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def t2j(x: Any, dtype=np.float32) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (host)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=dtype)


def linear_from_torch(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    """torch nn.Linear (out,in) -> {"w": (in,out)[, "b": (out,)]}"""
    out = {"w": t2j(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["b"] = t2j(sd[f"{prefix}.bias"])
    return out


def layer_norm_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": t2j(sd[f"{prefix}.weight"]), "bias": t2j(sd[f"{prefix}.bias"])}


def rms_norm_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": t2j(sd[f"{prefix}.weight"])}


def conv1d_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv1d weight (O,I,K) -> (K,I,O) for NWC/WIO conv."""
    out = {"w": t2j(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["b"] = t2j(sd[f"{prefix}.bias"])
    return out


def conv2d_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d weight (O,I,Kh,Kw) -> (Kh,Kw,I,O) for NHWC/HWIO."""
    out = {"w": t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["b"] = t2j(sd[f"{prefix}.bias"])
    return out


def conv3d_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv3d weight (O,I,Kt,Kh,Kw) -> (Kt,Kh,Kw,I,O) for NDHWC/DHWIO."""
    out = {"w": t2j(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["b"] = t2j(sd[f"{prefix}.bias"])
    return out


def batch_norm_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": t2j(sd[f"{prefix}.weight"]),
        "bias": t2j(sd[f"{prefix}.bias"]),
        "mean": t2j(sd[f"{prefix}.running_mean"]),
        "var": t2j(sd[f"{prefix}.running_var"]),
    }


def stack_dicts(dicts) -> Dict[str, Any]:
    """List of per-layer nested dicts -> stacked arrays (leading layer axis)."""
    first = dicts[0]
    if isinstance(first, dict):
        return {k: stack_dicts([d[k] for d in dicts]) for k in first}
    return np.stack(dicts, axis=0)
