"""Import reference PyTorch checkpoints into this framework's parameter tree.

The reference releases ``epoch_00120_whole_scene.pth`` checkpoints
(``README.md:55``) whose state dict follows ``backbone_3D_WSIS.Network``.
This maps every tensor into our flax tree:

* spconv conv weight volumes ``[k0, k1, k2, Cin, Cout]`` →
  ``[K, Cin, Cout]`` with K in our ``rulebook.subm_offsets`` order
  (``(dx, dy, dz)`` row-major).  Axis convention: spconv 1.x (the
  llijiang fork the reference installs, ``README.md:35-37``) stores
  kernel axes in the same order as the input's spatial dims — the
  reference feeds coords as ``(batch, x, y, z)`` — and matches dense
  ``Conv3d`` cross-correlation semantics, so the default is ``"xyz"``
  (k0 = dx, weight index i ↔ offset i-1).  This is pinned by
  ``tests/test_fullgraph_parity.py::test_kernel_axis_order_impulse``,
  which proves our enumeration equals torch's dense cross-correlation;
  ``"zyx"`` is kept for checkpoints from forks with flipped layouts.
* ``BatchNorm1d`` → MaskedBatchNorm {scale, bias} + batch_stats {mean, var};
* torch ``Linear`` ``weight [out, in]`` → flax ``kernel [in, out]``
  (transposed);
* GRUCellEx ``weight_ih/hh [3H, H]`` → ours ``[H, 3H]`` (transposed), the
  input-gate Linear ``ig`` → ``ingate``;
* the ECC fnet Sequential indices → ``fnet/fc{0..2},bn2,fc_out``; the
  GraphNetwork trailing ``f_64,b`` → ``ecc/proj`` + ``ecc/bn``.

Returns ``(params, batch_stats)`` ready for ``model.apply``. Unknown keys
are reported, not silently dropped.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["convert_state_dict", "load_reference_checkpoint"]


def _linear(sd, prefix):
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv(sd, key, kernel_axis_order="xyz"):
    """spconv weight volume → [K, Cin, Cout] in (dx,dy,dz) row-major order."""
    w = np.asarray(sd[key])
    if w.ndim == 2:  # 1x1 conv stored flat
        return w
    assert w.ndim == 5, f"{key}: unexpected conv weight shape {w.shape}"
    # w axes: (k0, k1, k2, Cin, Cout)
    if kernel_axis_order == "zyx":  # k0=dz, k1=dy, k2=dx → transpose to (dx,dy,dz)
        w = np.transpose(w, (2, 1, 0, 3, 4))
    k = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(k, w.shape[3], w.shape[4])


def _mlp_head(sd, prefix):
    """Reference Sequential(Linear, BN, ReLU, Linear) → MLPHead tree."""
    p0 = _linear(sd, f"{prefix}.0")
    bnp, bns = _bn(sd, f"{prefix}.1")
    p3 = _linear(sd, f"{prefix}.3")
    return (
        {"fc1": p0, "bn": bnp, "fc2": p3},
        {"bn": bns},
    )


def _residual_block(sd, prefix, kao):
    params: Dict = {}
    stats: Dict = {}
    if f"{prefix}.i_branch.0.weight" in sd:
        w = _conv(sd, f"{prefix}.i_branch.0.weight", kao)
        params["i_branch"] = {"kernel": w[0] if w.ndim == 3 else w}
    bnp, bns = _bn(sd, f"{prefix}.conv_branch.0")
    params["bn1"], stats["bn1"] = bnp, bns
    params["conv1"] = {"kernel": _conv(sd, f"{prefix}.conv_branch.2.weight", kao)}
    bnp, bns = _bn(sd, f"{prefix}.conv_branch.3")
    params["bn2"], stats["bn2"] = bnp, bns
    params["conv2"] = {"kernel": _conv(sd, f"{prefix}.conv_branch.5.weight", kao)}
    return params, stats


def _ublock(sd, prefix, depth, blocks, block_reps, kao):
    params: Dict = {}
    stats: Dict = {}
    for i in range(block_reps):
        p, s = _residual_block(sd, f"{prefix}.blocks.block{i}", kao)
        params[f"block{i}"], stats[f"block{i}"] = p, s
    if depth + 1 < blocks:
        bnp, bns = _bn(sd, f"{prefix}.conv.0")
        params["down_bn"], stats["down_bn"] = bnp, bns
        params["down_conv"] = {"kernel": _conv(sd, f"{prefix}.conv.2.weight", kao)}
        p, s = _ublock(sd, f"{prefix}.u", depth + 1, blocks, block_reps, kao)
        params["u"], stats["u"] = p, s
        bnp, bns = _bn(sd, f"{prefix}.deconv.0")
        params["up_bn"], stats["up_bn"] = bnp, bns
        params["up_conv"] = {"kernel": _conv(sd, f"{prefix}.deconv.2.weight", kao)}
        for i in range(block_reps):
            p, s = _residual_block(sd, f"{prefix}.blocks_tail.block{i}", kao)
            params[f"tail{i}"], stats[f"tail{i}"] = p, s
    return params, stats


def convert_state_dict(
    sd: Dict[str, "np.ndarray"],
    blocks: int = 5,
    block_reps: int = 2,
    kernel_axis_order: str = "xyz",
) -> Tuple[Dict, Dict]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    kao = kernel_axis_order
    params: Dict = {}
    stats: Dict = {}

    # ---- U-Net ----
    unet_p: Dict = {"input_conv": {"kernel": _conv(sd, "input_conv.0.weight", kao)}}
    unet_s: Dict = {}
    p, s = _ublock(sd, "unet", 0, blocks, block_reps, kao)
    unet_p["unet"], unet_s["unet"] = p, s
    bnp, bns = _bn(sd, "output_layer.0")
    unet_p["output_bn"], unet_s["output_bn"] = bnp, bns
    params["unet"], stats["unet"] = unet_p, unet_s

    # ---- point semantic head (``linear`` Sequential) ----
    params["point_sem"], stats["point_sem"] = _mlp_head(sd, "linear")

    # ---- ECC ----
    ecc_p: Dict = {}
    ecc_s: Dict = {}
    # fnet: Sequential [Linear, ReLU, Linear, ReLU, Linear, BN, ReLU, Linear]
    # (create_fnet with bnidx=2 → indices 0,2,4 Linear, 5 BN, 7 final Linear)
    fnet_p = {
        "fc0": _linear(sd, "ecc.0._fnet.0"),
        "fc1": _linear(sd, "ecc.0._fnet.2"),
        "fc2": _linear(sd, "ecc.0._fnet.4"),
        "fc_out": _linear(sd, "ecc.0._fnet.7"),
    }
    bnp, bns = _bn(sd, "ecc.0._fnet.5")
    fnet_p["bn2"] = bnp
    ecc_p["fnet"] = fnet_p
    ecc_s["fnet"] = {"bn2": bns}
    # GRU cell
    ecc_p["gru"] = {
        "weight_ih": np.asarray(sd["ecc.0._cell.weight_ih"]).T,
        "weight_hh": np.asarray(sd["ecc.0._cell.weight_hh"]).T,
        "bias_ih": np.asarray(sd["ecc.0._cell.bias_ih"]),
        "bias_hh": np.asarray(sd["ecc.0._cell.bias_hh"]),
        "ingate": _linear(sd, "ecc.0._cell.ig"),
    }
    # trailing f_64 + BN ('1' Linear, '2' BN in GraphNetwork module numbering)
    ecc_p["proj"] = _linear(sd, "ecc.1")
    bnp, bns = _bn(sd, "ecc.2")
    ecc_p["bn"] = bnp
    ecc_s["bn"] = bns
    params["ecc"], stats["ecc"] = ecc_p, ecc_s

    # ---- superpoint heads ----
    for ours, theirs in [
        ("sp_sem", "sp_sem_seg"),
        ("sp_offset", "sp_offset_vector_head"),
        ("sp_occupancy", "sp_occupancy_head"),
        ("sp_ins_size", "sp_ins_size_head"),
        ("feature_term", "feature_term"),
    ]:
        params[ours], stats[ours] = _mlp_head(sd, theirs)

    # ---- affinity attention ----
    for name in ["w_qs", "w_ks", "w_vs"]:
        params[name] = _linear(sd, name)
    params["pos_fc1"] = _linear(sd, "fc_position.0")
    params["pos_fc2"] = _linear(sd, "fc_position.2")

    return params, stats


def load_reference_checkpoint(path: str, **kw) -> Tuple[Dict, Dict]:
    """Load a reference ``.pth`` (torch CPU) and convert."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload.get("model", payload))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd, **kw)
