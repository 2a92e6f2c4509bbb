#!/usr/bin/env python
"""Standalone demo of the Adaptive Image Transformer module.

Mirrors the reference's `adaptive_image_transformer.py` (repo root): run the
AIT encoder-decoder on random tensors and print the shape contract —
[bs*P, 7, 7, 1024] proposals x [bs, 8, 8, 1024] query -> [bs*P, 8, 8, 1024]
translated proposal features.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("AIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AIT_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from ait_tpu.models.ait_transformer import AITTransformer


def main():
    bs, num_props = 2, 128
    rng = np.random.RandomState(0)
    x_props = jnp.asarray(rng.randn(bs * num_props, 7, 7, 1024), jnp.float32)
    x_query = jnp.asarray(rng.randn(bs, 8, 8, 1024), jnp.float32)

    model = AITTransformer(n_layers=1, channels=1024)
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        x_props[:2], x_query[:1], deterministic=True)

    fwd = jax.jit(lambda p, a, q: model.apply(p, a, q, deterministic=True))
    out = fwd(params, x_props, x_query)
    print(f"x_props  {tuple(x_props.shape)}")
    print(f"x_query  {tuple(x_query.shape)}")
    print(f"output   {tuple(out.shape)}  (proposal features translated "
          f"into the query grid)")
    assert out.shape == (bs * num_props, 8, 8, 1024)
    print("ok")


if __name__ == "__main__":
    main()
