import jax
import jax.numpy as jnp
import numpy as np

from vipant_tpu.nn import VisionTower


def _tower(p):
    return VisionTower(
        width=64, embed_dim=32, resolution=(100, 128), heads=4, layers=2,
        patch_size=32, stride=(16, 24), in_channels=3, patchout=p,
    )


def test_patchout_train_only(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 100, 128)), jnp.float32)
    tower = _tower(0.5)
    params = tower.init(
        {"params": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1)}, x, train=True
    )
    # eval ignores patchout (and needs no rng)
    out_eval = tower.apply(params, x, train=False)
    assert out_eval.shape == (2, 32)
    # train with rng applies it; different keys → different outputs
    o1 = tower.apply(params, x, train=True, rngs={"patchout": jax.random.PRNGKey(2)})
    o2 = tower.apply(params, x, train=True, rngs={"patchout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # without the rng collection it degrades gracefully to no-patchout
    o3 = tower.apply(params, x, train=True)
    assert np.allclose(np.asarray(o3), np.asarray(out_eval))


def test_patchout_zero_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 100, 128)), jnp.float32)
    t0 = _tower(0.0)
    params = t0.init(jax.random.PRNGKey(0), x)
    a = t0.apply(params, x, train=True, rngs={"patchout": jax.random.PRNGKey(5)})
    b = t0.apply(params, x, train=False)
    assert np.allclose(np.asarray(a), np.asarray(b))
