"""Central finite-difference gradient checking (the config-4 gate)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fd_grad(loss_fn, params, *, eps=1e-5, coords=None, rng=None, rel=False):
    """Central-difference gradient of ``loss_fn`` w.r.t. a pytree.

    Returns a pytree of the same structure with FD gradients at the
    sampled ``coords`` (all coordinates when None; for big leaves pass an
    int to sample that many random coordinates per leaf) and NaN
    elsewhere.
    """
    leaves, treedef = jax.tree.flatten(params)
    rng = rng or np.random.RandomState(0)

    out = []
    for li, leaf in enumerate(leaves):
        leaf = np.asarray(leaf, np.float64)
        g = np.full(leaf.shape, np.nan)
        flat = leaf.reshape(-1)
        if coords is None:
            idxs = range(flat.size)
        elif isinstance(coords, int):
            idxs = rng.choice(flat.size, size=min(coords, flat.size), replace=False)
        else:
            idxs = coords
        for i in idxs:
            e = np.zeros_like(flat)
            # relative step when the coordinate scale dwarfs eps (r^2
            # spans 272..1e10 across spheres in the Cornell scene)
            e[i] = eps * max(1.0, abs(flat[i])) if rel else eps
            pp = flat + e
            pm = flat - e
            lp = _eval(loss_fn, leaves, li, pp.reshape(leaf.shape), treedef)
            lm = _eval(loss_fn, leaves, li, pm.reshape(leaf.shape), treedef)
            g.reshape(-1)[i] = (lp - lm) / (2 * e[i])
        out.append(g)
    return jax.tree.unflatten(treedef, out)


def _eval(loss_fn, leaves, li, new_leaf, treedef):
    leaves2 = list(leaves)
    leaves2[li] = jnp.asarray(new_leaf, np.asarray(leaves[li]).dtype)
    return float(loss_fn(jax.tree.unflatten(treedef, leaves2)))


def check_grads_fd(loss_fn, params, *, eps=1e-5, coords=8, rtol=1e-4, atol=1e-6,
                   rng=None, rel=False):
    """Assert AD grads match FD grads on sampled coordinates.
    Returns (ad_grads, fd_grads) for reporting."""
    ad = jax.grad(lambda p: jnp.sum(loss_fn(p)))(params)
    fd = fd_grad(loss_fn, params, eps=eps, coords=coords, rng=rng, rel=rel)

    def cmp(a, f):
        a = np.asarray(a, np.float64)
        f = np.asarray(f)
        mask = ~np.isnan(f)
        np.testing.assert_allclose(a[mask], f[mask], rtol=rtol, atol=atol)

    jax.tree.map(cmp, ad, fd)
    return ad, fd
