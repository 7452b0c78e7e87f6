"""Port reference (torch) network weights into downgan_tpu flax params.

The parity harness (BASELINE.md "RMSE/RALSD parity") needs bit-comparable
forward passes between the reference PyTorch networks
(``DoWnGAN/networks/generator.py``, ``critic.py``) and the NHWC flax
re-designs. This module maps a torch ``state_dict`` (as name -> numpy
arrays; no torch dependency here) onto the flax parameter pytree:

  * conv kernels: OIHW -> HWIO transpose;
  * dense kernels: (out, in) -> (in, out) transpose;
  * the critic's first classifier layer additionally permutes its input
    axis from the reference's NCHW flatten order to our NHWC flatten
    order (same math, different memory layout).

Reference key layout (verified by executing the reference nets):
``conv1.*``, ``res_blocks.{i}.dense_blocks.{j}.b{k}.0.*``, ``conv2.*``,
``upsampling.{0,3,6}.*``, ``conv3.{0,2}.*`` for the generator;
``features.{0,2,..,14}.*`` (bias only at 0) and ``classifier.{0,2}.*``
for the critic.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _dense(sd: StateDict, prefix: str, input_perm: Array | None = None) -> Dict[str, Array]:
    kernel = np.transpose(np.asarray(sd[f"{prefix}.weight"]))  # (in, out)
    if input_perm is not None:
        kernel = kernel[input_perm]
    return {"kernel": kernel, "bias": np.asarray(sd[f"{prefix}.bias"])}


def port_generator(
    sd: StateDict, num_res_blocks: int = 16, num_upsample: int = 3
) -> Dict[str, Any]:
    """torch Generator state_dict -> flax variables for
    :class:`downgan_tpu.models.generator.Generator`."""
    params: Dict[str, Any] = {"conv1": {"Conv_0": _conv(sd, "conv1")}}
    for i in range(num_res_blocks):
        rrdb: Dict[str, Any] = {}
        for j in range(3):
            drb = {
                f"b{k}": {"Conv_0": _conv(sd, f"res_blocks.{i}.dense_blocks.{j}.b{k}.0")}
                for k in range(1, 6)
            }
            rrdb[f"drb{j}"] = drb
        params[f"rrdb{i}"] = rrdb
    params["conv2"] = {"Conv_0": _conv(sd, "conv2")}
    for u in range(num_upsample):
        # torch Sequential indices: conv at 0, 3, 6 (LeakyReLU/PixelShuffle between)
        params[f"up{u}"] = {"Conv_0": _conv(sd, f"upsampling.{3 * u}")}
    params["head1"] = {"Conv_0": _conv(sd, "conv3.0")}
    params["head2"] = {"Conv_0": _conv(sd, "conv3.2")}
    return {"params": params}


def _nchw_to_nhwc_flat_perm(c: int, h: int, w: int) -> Array:
    """Permutation p with flax_flat[i] = torch_flat[p[i]]: index by
    (h, w, c) NHWC order into the torch (c, h, w) flat layout."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # torch flat order
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # NHWC traversal


def port_critic(sd: StateDict, base: int = 16, fine_size: int = 128) -> Dict[str, Any]:
    """torch Critic state_dict -> flax variables for
    :class:`downgan_tpu.models.critic.Critic`."""
    params: Dict[str, Any] = {}
    for i in range(8):
        params[f"conv{i}"] = {"Conv_0": _conv(sd, f"features.{2 * i}")}
    spatial = fine_size // 16
    perm = _nchw_to_nhwc_flat_perm(8 * base, spatial, spatial)
    params["fc1"] = _dense(sd, "classifier.0", input_perm=perm)
    params["fc2"] = _dense(sd, "classifier.2")
    return {"params": params}


def _conv_back(leaf: Dict[str, Array], prefix: str, out: Dict[str, Array]) -> None:
    out[f"{prefix}.weight"] = np.transpose(np.asarray(leaf["kernel"]), (3, 2, 0, 1))
    if "bias" in leaf:
        out[f"{prefix}.bias"] = np.asarray(leaf["bias"])


def export_generator(params: Mapping, num_res_blocks: int = 16,
                     num_upsample: int = 3) -> Dict[str, Array]:
    """Inverse of :func:`port_generator`: flax Generator variables -> a
    torch-layout state_dict (numpy values), for loading into the reference
    nets or external tools."""
    p = params["params"] if "params" in params else params
    out: Dict[str, Array] = {}
    _conv_back(p["conv1"]["Conv_0"], "conv1", out)
    for i in range(num_res_blocks):
        for j in range(3):
            for k in range(1, 6):
                _conv_back(p[f"rrdb{i}"][f"drb{j}"][f"b{k}"]["Conv_0"],
                           f"res_blocks.{i}.dense_blocks.{j}.b{k}.0", out)
    _conv_back(p["conv2"]["Conv_0"], "conv2", out)
    for u in range(num_upsample):
        _conv_back(p[f"up{u}"]["Conv_0"], f"upsampling.{3 * u}", out)
    _conv_back(p["head1"]["Conv_0"], "conv3.0", out)
    _conv_back(p["head2"]["Conv_0"], "conv3.2", out)
    return out


def export_critic(params: Mapping, base: int = 16, fine_size: int = 128) -> Dict[str, Array]:
    """Inverse of :func:`port_critic` (incl. the inverse NHWC->NCHW flatten
    permutation on the first classifier layer)."""
    p = params["params"] if "params" in params else params
    out: Dict[str, Array] = {}
    for i in range(8):
        _conv_back(p[f"conv{i}"]["Conv_0"], f"features.{2 * i}", out)
    spatial = fine_size // 16
    perm = _nchw_to_nhwc_flat_perm(8 * base, spatial, spatial)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    k = np.asarray(p["fc1"]["kernel"])[inv]  # undo the row permutation
    out["classifier.0.weight"] = np.transpose(k)
    out["classifier.0.bias"] = np.asarray(p["fc1"]["bias"])
    out["classifier.2.weight"] = np.transpose(np.asarray(p["fc2"]["kernel"]))
    out["classifier.2.bias"] = np.asarray(p["fc2"]["bias"])
    return out


def infer_generator_arch(sd: StateDict) -> Dict[str, int]:
    """Read the Generator architecture off a reference state_dict, so
    ``downgan import-torch`` reconstructs the model without the user
    re-specifying shapes (the reference stores them nowhere —
    ``networks/generator.py:10-24`` takes them as constructor args).

    Returns ``filters``, ``n_covariates``, ``n_predictands``,
    ``num_res_blocks`` and ``num_upsample``; raises a ``ValueError``
    naming the missing key for non-DoWnGAN state dicts.
    """
    try:
        conv1 = np.asarray(sd["conv1.weight"])  # OIHW
        head = np.asarray(sd["conv3.2.weight"])
    except KeyError as e:
        raise ValueError(
            f"not a DoWnGAN Generator state_dict: missing key {e}") from e
    blocks = {
        int(k.split(".")[1]) for k in sd if k.startswith("res_blocks.")
    }
    ups = {
        int(k.split(".")[1]) for k in sd if k.startswith("upsampling.")
    }
    if not blocks or not ups:
        raise ValueError(
            "not a DoWnGAN Generator state_dict: no res_blocks.*/"
            "upsampling.* keys")
    # One conv per upsample stage at torch Sequential indices 0, 3, 6, ...
    # (the LeakyReLU/PixelShuffle slots between carry no params).
    if ups != {3 * u for u in range(len(ups))}:
        raise ValueError(
            f"unexpected upsampling conv indices {sorted(ups)} — not the "
            "DoWnGAN Sequential layout (convs at 0, 3, 6, ...)")
    return {
        "filters": int(conv1.shape[0]),
        "n_covariates": int(conv1.shape[1]),
        "n_predictands": int(head.shape[0]),
        "num_res_blocks": max(blocks) + 1,
        "num_upsample": len(ups),
    }


def infer_critic_arch(sd: StateDict) -> Dict[str, int]:
    """Read the Critic architecture off a reference state_dict
    (``networks/critic.py:9-40``): base filter count and predictand count
    from the first conv, ``fine_size`` from the first classifier layer's
    input width (``8*base*(fine/16)^2``)."""
    try:
        conv0 = np.asarray(sd["features.0.weight"])  # OIHW
        fc0 = np.asarray(sd["classifier.0.weight"])  # (out, in)
    except KeyError as e:
        raise ValueError(
            f"not a DoWnGAN Critic state_dict: missing key {e}") from e
    base = int(conv0.shape[0])
    spatial_sq = fc0.shape[1] / (8 * base)
    spatial = int(round(spatial_sq ** 0.5))
    if spatial * spatial * 8 * base != fc0.shape[1]:
        raise ValueError(
            f"classifier.0 input width {fc0.shape[1]} is not "
            f"8*{base}*s^2 for integer s — not a DoWnGAN Critic layout")
    return {
        "filters": base,
        "n_predictands": int(conv0.shape[1]),
        "fine_size": spatial * 16,
    }
