"""Finite-difference gradient checks of the ECC graph network — the
reference's only unit tests are ``torch.autograd.gradcheck`` of its custom
ECC autograd Functions (``modules/model/ecc/test_GraphConvModule.py``);
this is the JAX equivalent over our full ECC stack."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu3dwsis.nn.ecc import EccGraphNetwork


def test_ecc_gradcheck_finite_differences():
    rng = np.random.default_rng(0)
    s, e, c = 10, 24, 4
    x = rng.standard_normal((s, c)).astype(np.float64)
    eu = rng.integers(0, s, e).astype(np.int32)
    ev = rng.integers(0, s, e).astype(np.int32)
    ef = rng.standard_normal((e, 13)).astype(np.float64)
    evalid = np.ones(e, bool)
    svalid = np.ones(s, bool)

    net = EccGraphNetwork(nfeat=c, iterations=2, out_dim=6, fnet_widths=(8, 8, 8))
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x), jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(ef),
        jnp.asarray(evalid), jnp.asarray(svalid), False,
    )
    cot = rng.standard_normal((s, 6))

    def f(x_in):
        out = net.apply(
            variables, x_in, jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(ef),
            jnp.asarray(evalid), jnp.asarray(svalid), False,
        )
        return (out * jnp.asarray(cot)).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(x, jnp.float32)))

    eps = 1e-3
    for (i, j) in [(0, 0), (3, 2), (7, 1), (9, 3)]:
        xp = x.copy(); xp[i, j] += eps
        xm = x.copy(); xm[i, j] -= eps
        fd = (float(f(jnp.asarray(xp, jnp.float32))) - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=5e-3)
