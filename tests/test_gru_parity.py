"""GRUCellEx parity against a torch oracle implementing the reference cell
(``modules/model/spg_modules.py:207-253``): sigmoid input gate conditioned on
the hidden state, InstanceNorm1d(1) on both gate pre-activations (before
biases), then standard GRU equations.

torch (CPU) is a test-only dependency; the library itself never imports it.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tpu3dwsis.nn.ecc import GRUCellEx


def torch_grucellex(msg, h, w_ih, w_hh, b_ih, b_hh, ig_w, ig_b):
    """Reference semantics in torch."""
    msg_t = torch.tensor(msg)
    h_t = torch.tensor(h)
    inp = torch.sigmoid(h_t @ torch.tensor(ig_w) + torch.tensor(ig_b)) * msg_t
    gi = inp @ torch.tensor(w_ih)
    gh = h_t @ torch.tensor(w_hh)
    ini = torch.nn.InstanceNorm1d(1, eps=1e-5, affine=False, track_running_stats=False)
    gi = ini(gi.unsqueeze(1)).squeeze(1)
    gh = ini(gh.unsqueeze(1)).squeeze(1)
    i_r, i_i, i_n = gi.chunk(3, 1)
    h_r, h_i, h_n = gh.chunk(3, 1)
    bih_r, bih_i, bih_n = torch.tensor(b_ih).chunk(3)
    bhh_r, bhh_i, bhh_n = torch.tensor(b_hh).chunk(3)
    reset = torch.sigmoid(i_r + bih_r + h_r + bhh_r)
    update = torch.sigmoid(i_i + bih_i + h_i + bhh_i)
    new = torch.tanh(i_n + bih_n + reset * (h_n + bhh_n))
    return (new + update * (h_t - new)).numpy()


def test_gru_cell_matches_torch_oracle():
    rng = np.random.default_rng(0)
    hd, n = 32, 17
    msg = rng.standard_normal((n, hd)).astype(np.float32)
    h = rng.standard_normal((n, hd)).astype(np.float32)

    cell = GRUCellEx(hd)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(msg), jnp.asarray(h))
    p = variables["params"]

    got = np.asarray(cell.apply(variables, jnp.asarray(msg), jnp.asarray(h)))
    want = torch_grucellex(
        msg,
        h,
        np.asarray(p["weight_ih"]),
        np.asarray(p["weight_hh"]),
        np.asarray(p["bias_ih"]),
        np.asarray(p["bias_hh"]),
        np.asarray(p["ingate"]["kernel"]),
        np.asarray(p["ingate"]["bias"]),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
