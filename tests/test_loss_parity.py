"""Loss parity against torch oracles of the reference formulas
(``modules/model/losses_3D_WSIS.py``): masked padded implementations must
equal the unpadded boolean-indexing semantics."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tpu3dwsis.nn.losses import LossConfig, dice_loss_multi_classes, discriminative_loss


def test_dice_matches_reference_formula():
    rng = np.random.default_rng(0)
    n, c = 50, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, n)
    labels[::7] = -100
    mask = labels != -100

    # our padded version (mask folds out ignored rows)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    one_hot = np.eye(c)[np.where(mask, labels, 0)]
    got = np.asarray(
        dice_loss_multi_classes(jnp.asarray(probs), jnp.asarray(one_hot), jnp.asarray(mask))
    )

    # reference formula on filtered rows (losses_3D_WSIS.py:233-253)
    p = torch.tensor(probs[mask]).t()
    t = torch.tensor(one_hot[mask]).t().float()
    per_class = (2 * (p * t).sum(1) + 1e-5) / ((p * p).sum(1) + (t * t).sum(1) + 1e-4 + 1e-5)
    want = (1.0 - per_class).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _torch_discriminative(feats, labels, delta_v=0.1, delta_d=1.5):
    """Reference discriminative_loss (losses_3D_WSIS.py:157-230) in torch."""
    f = torch.tensor(feats)
    lab = torch.tensor(labels)
    uniq, inv, counts = torch.unique(lab, sorted=False, return_inverse=True, return_counts=True)
    k = len(uniq)
    seg = torch.zeros(k, f.shape[1]).index_add_(0, inv, f)
    mu = seg / counts[:, None].float()
    d = torch.norm(f - mu[inv], p=2, dim=1)
    hinge = torch.clamp(d - delta_v, min=0) ** 2
    l_var = (torch.zeros(k).index_add_(0, inv, hinge) / counts.float()).sum() / k
    if k <= 1:
        l_dist = torch.tensor(0.0)
    else:
        cd = torch.cdist(mu, mu, p=1)
        m = 2 * delta_d - cd
        m = m - torch.diagflat(torch.diag(m))
        l_dist = (torch.clamp(m, min=0) ** 2).sum() / (k * (k - 1))
    l_reg = 0.001 * torch.norm(mu, p=2, dim=1).sum()
    return float(l_var + l_dist + l_reg)


def test_discriminative_matches_reference_two_scenes():
    rng = np.random.default_rng(1)
    cfg = LossConfig(max_instances=8, num_scenes=2, disc_dim=4)
    # scene 0: 3 instances over 20 superpoints; scene 1: 2 instances over 12
    s = 64  # padded
    feats = np.zeros((s, 4), np.float32)
    scene = np.full(s, 2, np.int32)
    local = np.full(s, -1, np.int32)
    valid = np.zeros(s, bool)

    def fill(start, count, scn, n_inst):
        feats[start : start + count] = rng.standard_normal((count, 4))
        scene[start : start + count] = scn
        local[start : start + count] = rng.integers(0, n_inst, count)
        valid[start : start + count] = True

    fill(0, 20, 0, 3)
    fill(20, 12, 1, 2)

    total, l_var, l_dist, l_reg = discriminative_loss(
        jnp.asarray(feats), jnp.asarray(scene), jnp.asarray(local), jnp.asarray(valid), cfg
    )

    want0 = _torch_discriminative(feats[:20], local[:20].astype(np.int64))
    want1 = _torch_discriminative(feats[20:32], local[20:32].astype(np.int64))
    np.testing.assert_allclose(float(total), (want0 + want1) / 2, rtol=1e-4)
