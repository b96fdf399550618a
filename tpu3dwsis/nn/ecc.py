"""Edge-conditioned recurrent graph network (ECC-GRU) over padded graphs.

Re-implements the reference's superpoint graph net — config string
``'gru_7_0,f_64,b,r'`` (``modules/model/backbone_3D_WSIS.py:68``), i.e.:

* a **filter net** MLP mapping 13-d edge features to a 32×32 edge weight
  matrix, widths ``[13, 32, 128, 64, 1024]`` with BatchNorm at layer 2 and
  orthogonal init (``modules/model/graphnet.py:19-36,84``);
* 7 iterations of edge-conditioned message passing (PyG ``NNConv`` with
  ``aggr='mean'``, ``vv=False``: message = ``x[v] @ W_e`` mean-aggregated at
  ``u``, ``modules/model/spg_modules.py:97-114,173-183``) through a GRU cell
  extended with per-row instance norm on the gates and a sigmoid input gate
  conditioned on the hidden state (``GRUCellEx``, ``spg_modules.py:207-253``);
* concat of all 8 hidden states (``cat_all``) → Linear(256→64) → BatchNorm →
  ReLU (``graphnet.py:59-64,92``).

TPU-native formulation: edges are flat padded arrays with null endpoints
routed past the superpoint capacity; message passing is one batched einsum
plus a segment-mean — no per-edge kernels, no CUDA NVRTC
(cf. ``modules/model/ecc/cuda_kernels.py``, which this replaces).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_mean
from .norm import MaskedBatchNorm

__all__ = ["FilterNet", "GRUCellEx", "EccGraphNetwork"]


def _row_instance_norm(x, eps=1e-5):
    """torch ``InstanceNorm1d(1)`` on ``[B, 1, L]``: normalize each row over
    its features (biased variance, no affine) — ``spg_modules.py:220-224``."""
    mean = x.mean(axis=-1, keepdims=True)
    var = jnp.square(x - mean).mean(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class FilterNet(nn.Module):
    """Edge-feature → edge-weight-matrix MLP (``create_fnet``,
    ``graphnet.py:19-36``): Linear+ReLU stack, BatchNorm at ``bn_index``,
    orthogonal weight init, final layer with bias."""

    widths: Sequence[int]  # hidden widths, e.g. (32, 128, 64)
    out_dim: int  # nfeat**2 = 1024
    bn_index: int = 2

    @nn.compact
    def __call__(self, edge_feats, edge_valid, train: bool):
        x = edge_feats
        relu_gain = 2.0**0.5
        for k, w in enumerate(self.widths):
            x = nn.Dense(
                w,
                kernel_init=nn.initializers.orthogonal(scale=relu_gain),
                name=f"fc{k}",
            )(x)
            if k == self.bn_index:
                x = MaskedBatchNorm(w, eps=1e-5, name=f"bn{k}")(x, edge_valid, train)
            x = nn.relu(x)
        x = nn.Dense(
            self.out_dim, kernel_init=nn.initializers.orthogonal(), name="fc_out"
        )(x)
        return x


class GRUCellEx(nn.Module):
    """GRU cell with input gate + instance-norm on gates
    (``spg_modules.py:207-253``).

    ``h' = n + z * (h - n)`` with ``n = tanh(gi_n + b_n + r*(gh_n + b_hn))``,
    where ``gi``/``gh`` are instance-normalized *before* biases are added,
    and the message input is gated by ``sigmoid(Linear(h))``.
    """

    hidden: int

    @nn.compact
    def __call__(self, msg, h):
        hd = self.hidden
        lim = 1.0 / hd**0.5

        def uinit(key, shape, dtype=jnp.float32):  # torch GRUCell init: U(-lim, lim)
            return jax.random.uniform(key, shape, dtype, -lim, lim)

        ig = nn.Dense(hd, name="ingate")(h)
        x = nn.sigmoid(ig) * msg

        w_ih = self.param("weight_ih", uinit, (hd, 3 * hd))
        w_hh = self.param("weight_hh", uinit, (hd, 3 * hd))
        bih = self.param("bias_ih", uinit, (3 * hd,))
        bhh = self.param("bias_hh", uinit, (3 * hd,))
        gi = _row_instance_norm(x @ w_ih)
        gh = _row_instance_norm(h @ w_hh)

        gi_r, gi_i, gi_n = jnp.split(gi, 3, axis=1)
        gh_r, gh_i, gh_n = jnp.split(gh, 3, axis=1)
        bih_r, bih_i, bih_n = jnp.split(bih, 3)
        bhh_r, bhh_i, bhh_n = jnp.split(bhh, 3)

        reset = nn.sigmoid(gi_r + bih_r + gh_r + bhh_r)
        update = nn.sigmoid(gi_i + bih_i + gh_i + bhh_i)
        new = jnp.tanh(gi_n + bih_n + reset * (gh_n + bhh_n))
        return new + update * (h - new)


class EccGraphNetwork(nn.Module):
    """Full ``'gru_7_0,f_64,b,r'`` stack on a padded superpoint graph.

    Input: superpoint embeddings ``[S, nfeat]``; returns ``[S, out_dim]``.
    """

    nfeat: int = 32
    iterations: int = 7
    out_dim: int = 64
    fnet_widths: Sequence[int] = (32, 128, 64)
    # edge-weight matrices are the ECC's bandwidth hog ([E, nfeat²] read every
    # iteration); bfloat16 halves that traffic. GRU math stays fp32.
    edge_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, edge_u, edge_v, edge_feats, edge_valid, sp_valid, train: bool):
        s = x.shape[0]
        c = self.nfeat
        edt = jnp.dtype(self.edge_dtype)
        weights = FilterNet(self.fnet_widths, c * c, name="fnet")(
            edge_feats, edge_valid, train
        )
        weights = weights.reshape(-1, c, c).astype(edt)

        cell = GRUCellEx(c, name="gru")
        h = x
        hs = [h]
        for _ in range(self.iterations):
            hn = jnp.concatenate([h, jnp.zeros((1, c), h.dtype)], axis=0)
            src = hn[edge_v].astype(edt)  # messages flow v -> u (target_to_source)
            msg = jnp.einsum(
                "ec,ecd->ed", src, weights, preferred_element_type=jnp.float32
            )
            agg = segment_mean(msg, edge_u, s + 1)[:s].astype(h.dtype)
            h = cell(agg, h)
            hs.append(h)
        cat = jnp.concatenate(hs, axis=1)  # [S, (iters+1)*nfeat]
        out = nn.Dense(self.out_dim, name="proj")(cat)
        out = MaskedBatchNorm(self.out_dim, eps=1e-5, name="bn")(out, sp_valid, train)
        return nn.relu(out)
