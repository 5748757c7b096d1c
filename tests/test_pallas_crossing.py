"""Banded Pallas crossing kernel vs a plain numpy oracle (interpret mode).

The kernel (`ops/pallas_crossing.py`) only compiles on TPU; the interpreter
lets CPU CI check its banded-update logic against the straightforward
first-crossing semantics: for each column, walk the profile's running max
and record the first step where it exceeds the row's threshold.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from topo_renderer_tpu.ops.pallas_crossing import LANES, crossing_search_pallas


def oracle(e_prof, a, thresh1d):
    """Reference first-crossing: O(N*H*W) numpy sweep."""
    n, w = e_prof.shape
    h = thresh1d.shape[0]
    kstar = np.full((h, w), float(n), np.float32)
    theta = np.zeros((h, w), np.float32)
    mlo = np.zeros((h, w), np.float32)
    outs = [np.zeros((h, w), np.float32) for _ in a]
    m_prev = np.full(w, -3.0e38, np.float32)
    for k in range(n):
        m_new = np.maximum(m_prev, e_prof[k])
        cross = (thresh1d[:, None] < m_new[None, :]) & (
            thresh1d[:, None] >= m_prev[None, :]
        )
        kstar[cross] = k
        theta[cross] = np.broadcast_to(e_prof[k][None, :], cross.shape)[cross]
        mlo[cross] = np.broadcast_to(m_prev[None, :], cross.shape)[cross]
        for o, plane in zip(outs, a):
            o[cross] = np.broadcast_to(plane[k][None, :], cross.shape)[cross]
        m_prev = m_new
    return kstar, theta, mlo, *outs


@pytest.mark.parametrize("seed,n,h", [(0, 96, 40), (1, 17, 8), (2, 64, 256)])
def test_banded_kernel_matches_oracle(seed, n, h):
    rng = np.random.default_rng(seed)
    w = 2 * LANES
    # A rough terrain profile: random walk with spikes so the running max
    # advances in bursts (exercises band movement + the chunk clamp).
    e = np.cumsum(rng.normal(0, 0.05, (n, w)), axis=0).astype(np.float32)
    e += (rng.random((n, w)) < 0.05) * rng.uniform(0.5, 2.0, (n, w))
    e = e.astype(np.float32)
    a = [rng.integers(0, 1024, (n, w)).astype(np.float32) for _ in range(3)]
    # Row thresholds: sorted decreasing (top row = highest elevation angle),
    # spanning the profile's range so rows cross at varied steps.
    t1d = np.sort(
        rng.uniform(e.min() - 0.5, e.max() + 0.5, h).astype(np.float32)
    )[::-1].copy()
    thresh = np.broadcast_to(t1d[:, None], (h, w)).copy()

    got = crossing_search_pallas(
        jnp.asarray(e), *[jnp.asarray(x) for x in a], jnp.asarray(thresh),
        height=h, interpret=True,
    )
    want = oracle(e, a, t1d)
    for g, wv, name in zip(got, want, ["kstar", "theta", "mlo", "n0", "n1", "n2"]):
        np.testing.assert_array_equal(np.asarray(g), wv, err_msg=name)


def test_shape_guards():
    e = jnp.zeros((4, LANES), jnp.float32)
    t = jnp.zeros((7, LANES), jnp.float32)
    with pytest.raises(ValueError, match="height"):
        crossing_search_pallas(e, e, e, e, t, height=7, interpret=True)
    e2 = jnp.zeros((4, 100), jnp.float32)
    t2 = jnp.zeros((8, 100), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        crossing_search_pallas(e2, e2, e2, e2, t2, height=8, interpret=True)
