"""Pallas 3-NN kernel: interpreter-mode result must match the XLA path."""

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.ops.pallas.knn import knn3_pallas, knn3_xla


def test_pallas_knn_matches_xla():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-10, 10, (100, 3)).astype(np.float32))
    m = jnp.asarray(rng.uniform(-10, 10, (700, 3)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, 700) > 0.2)
    d_ref, i_ref = knn3_xla(q, m, v)
    d_pal, i_pal = knn3_pallas(q, m, v, interpret=True)
    np.testing.assert_allclose(np.sort(np.asarray(d_pal), 1),
                               np.sort(np.asarray(d_ref), 1),
                               rtol=1e-4, atol=1e-4)
    assert (np.sort(np.asarray(i_pal), 1)
            == np.sort(np.asarray(i_ref), 1)).mean() > 0.999
