"""Pallas PAR diffusion kernel: parity vs the jnp path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.par import par_refine


def test_pallas_par_matches_jnp():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, 64, 64)).astype(np.float32))
    cam = jnp.asarray(rng.random((2, 5, 64, 64)).astype(np.float32))
    a = par_refine(img, cam, dilations=(1, 2, 4, 8), num_iter=3,
                   use_pallas=False)
    b = par_refine(img, cam, dilations=(1, 2, 4, 8), num_iter=3,
                   use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_par_valid_extent():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32))
    cam = jnp.asarray(rng.random((1, 4, 64, 64)).astype(np.float32))
    valid = jnp.asarray([[40, 30]], jnp.int32)
    a = par_refine(img, cam, dilations=(1, 2), num_iter=2,
                   valid_hw=valid, use_pallas=False)
    b = par_refine(img, cam, dilations=(1, 2), num_iter=2,
                   valid_hw=valid, use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(a)[:, :, :40, :30],
                               np.asarray(b)[:, :, :40, :30], atol=1e-5)
