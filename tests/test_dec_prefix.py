"""Train-time per-image decoder prefix (cfg.tpu.dec_prefix_per_image).

The AIT decoder input is the query tiled once per proposal
(lib/model/system/Models.py:250), so until cross-attention the per-proposal
decoder streams differ only by their dropout draws.  The knob runs that
prefix once per image (its proposals share the prefix masks; expected
gradient unchanged, see ait_transformer.AITTransformer.dec_prefix_per_image).
These tests pin:
  * dropout=0 train mode: knob on == knob off bitwise (pure FLOP removal);
  * dropout>0: with IDENTICAL proposals inside an image the knob-on outputs
    are identical within the image (masks shared) while knob-off outputs
    differ (iid masks) — the exact semantic boundary;
  * gradients stay finite with the knob on.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ait_tpu.models.ait_transformer import AITTransformer

BS, P, C = 2, 4, 1024


def _inputs(key):
    kp, kq = jax.random.split(key)
    props = jax.random.normal(kp, (BS * P, 7, 7, C), jnp.float32)
    query = jax.random.normal(kq, (BS, 8, 8, C), jnp.float32)
    return props, query


def _model(dropout, shared):
    return AITTransformer(n_layers=1, channels=C, dropout=dropout,
                          dec_prefix_per_image=shared)


def test_zero_dropout_train_mode_bitwise_equal():
    props, query = _inputs(jax.random.PRNGKey(0))
    outs = []
    for shared in (False, True):
        model = _model(0.0, shared)
        params = model.init(jax.random.PRNGKey(1), props, query)["params"]
        outs.append(model.apply({"params": params}, props, query,
                                deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(2)}))
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_prefix_runs_per_image_when_shared():
    # the decoder's first self-attention output has BS rows when the prefix
    # is shared (one stream per image -> its dropout masks are drawn once
    # per image) and BS*P rows under reference-exact iid masks
    props, query = _inputs(jax.random.PRNGKey(3))
    for shared, rows in ((True, BS), (False, BS * P)):
        model = _model(0.1, shared)
        params = model.init(jax.random.PRNGKey(4), props, query)["params"]
        _, state = model.apply(
            {"params": params}, props, query, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(5)},
            capture_intermediates=lambda mdl, _: mdl.name == "slf_attn",
            mutable=["intermediates"])
        slf = state["intermediates"]["dec_layer0"]["slf_attn"]["__call__"]
        assert slf[0][0].shape[0] == rows, (shared, slf[0][0].shape)


def test_grads_finite_with_shared_prefix():
    props, query = _inputs(jax.random.PRNGKey(6))
    model = _model(0.1, True)
    params = model.init(jax.random.PRNGKey(7), props, query)["params"]

    def loss(p):
        out = model.apply({"params": p}, props, query, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(8)})
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
