"""Host-side numpy SE3 helpers must match the jax geometry exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.geometry import se3 as jse3
from lvio_fusion_tpu.utils import np_se3
from test_geometry import rand_se3


def test_np_matches_jax():
    key = jax.random.PRNGKey(7)
    for i in range(5):
        k1, k2, key = jax.random.split(key, 3)
        a = np.asarray(rand_se3(k1))
        b = np.asarray(rand_se3(k2))
        p = np.asarray(jax.random.normal(key, (3,)))

        np.testing.assert_allclose(
            np_se3.se3_mul(a, b),
            np.asarray(jse3.se3_mul(jnp.asarray(a), jnp.asarray(b))),
            atol=1e-5)
        np.testing.assert_allclose(
            np_se3.se3_inv(a),
            np.asarray(jse3.se3_inv(jnp.asarray(a))), atol=1e-5)
        np.testing.assert_allclose(
            np_se3.se3_apply(a, p),
            np.asarray(jse3.se3_apply(jnp.asarray(a), jnp.asarray(p))),
            atol=1e-5)
