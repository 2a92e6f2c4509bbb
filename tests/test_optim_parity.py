"""Exact-arithmetic parity of `ait_tpu.train.make_optimizer` vs the
reference's torch.optim.SGD setup (trainval_net_voc.py:289-296) on a
synthetic labeled tree — no model noise, so every semantic knob is pinned
tight: per-group lr (bias x(DOUBLE_BIAS+1)), BIAS_DECAY-gated coupled
weight decay (added to the grad BEFORE the momentum buffer, torch
semantics), momentum buffer init/decay (net_utils has no nesterov), frozen
exclusion, and the epoch-step lr decay (adjust_learning_rate,
net_utils.py:67-70 — gamma multiplies every group, preserving the bias 2x).

Both sides run f32 on identical hand-fed gradients; the update rules are
the same arithmetic in the same order, so tolerance is a few ulps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from ait_tpu.config import Config
from ait_tpu.train import lr_schedule, make_optimizer

BASE_LR = 0.01
N_STEPS = 7
STEPS_PER_EPOCH = 3  # decay fires entering step 3 and step 6 (epochs 1, 2)


def _tree0(rng):
    return {
        "head": {"kernel": rng.randn(4, 3).astype(np.float32),
                 "bias": rng.randn(3).astype(np.float32)},
        # parent bn1 -> frozen label (frozen-BN affine)
        "bn1": {"scale": rng.randn(3).astype(np.float32)},
    }


def _grad(rng):
    return {
        "head": {"kernel": rng.randn(4, 3).astype(np.float32),
                 "bias": rng.randn(3).astype(np.float32)},
        "bn1": {"scale": rng.randn(3).astype(np.float32)},
    }


@pytest.mark.parametrize("decay", [False, True])
def test_sgd_chain_matches_torch_exactly(decay):
    rng = np.random.RandomState(0)
    p0 = _tree0(rng)
    grads = [_grad(rng) for _ in range(N_STEPS)]

    cfg = Config()
    # exercise both BIAS_DECAY settings via the `decay` axis
    cfg = cfg.replace(TRAIN=dataclasses.replace(cfg.TRAIN, BIAS_DECAY=decay))
    t = cfg.TRAIN
    assert t.DOUBLE_BIAS and t.WEIGHT_DECAY == 0.0005 and t.MOMENTUM == 0.9

    # ---- torch side, built by the reference's rules ----
    w = torch.nn.Parameter(torch.from_numpy(p0["head"]["kernel"].copy()))
    b = torch.nn.Parameter(torch.from_numpy(p0["head"]["bias"].copy()))
    groups = [
        {"params": [w], "lr": BASE_LR, "weight_decay": t.WEIGHT_DECAY},
        {"params": [b], "lr": BASE_LR * (int(t.DOUBLE_BIAS) + 1),
         "weight_decay": t.WEIGHT_DECAY if t.BIAS_DECAY else 0.0},
    ]
    opt = torch.optim.SGD(groups, momentum=t.MOMENTUM)

    # ---- our side ----
    sched = lr_schedule(BASE_LR, STEPS_PER_EPOCH, 1, 0.1)
    tx = make_optimizer(cfg, sched)
    params = jax.tree_util.tree_map(jnp.asarray, p0)
    opt_state = tx.init(params)

    for i, g in enumerate(grads):
        if i and i % STEPS_PER_EPOCH == 0:
            # reference: adjust_learning_rate multiplies EVERY group's lr
            # by gamma at the epoch boundary (net_utils.py:67-70)
            for grp in opt.param_groups:
                grp["lr"] *= 0.1
        opt.zero_grad()
        w.grad = torch.from_numpy(g["head"]["kernel"].copy())
        b.grad = torch.from_numpy(g["head"]["bias"].copy())
        opt.step()

        jg = jax.tree_util.tree_map(jnp.asarray, g)
        updates, opt_state = tx.update(jg, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["head"]["kernel"]),
                               w.detach().numpy(), rtol=0, atol=2e-7,
                               err_msg="weight update diverges")
    np.testing.assert_allclose(np.asarray(params["head"]["bias"]),
                               b.detach().numpy(), rtol=0, atol=2e-7,
                               err_msg="bias update diverges "
                                       "(DOUBLE_BIAS / BIAS_DECAY)")
    # frozen label: set_to_zero leaves the leaf untouched, like the
    # reference excluding requires_grad=False params from the groups
    np.testing.assert_array_equal(np.asarray(params["bn1"]["scale"]),
                                  p0["bn1"]["scale"])


def test_adam_chain_matches_torch():
    """The reference's --optimizer adam branch (trainval_net_voc.py:298-303):
    torch.optim.Adam over the same per-param groups.  (Its `lr = lr * 0.1`
    is display-only — every group carries an explicit 'lr' key that
    overrides the optimizer default, so the reference Adam steps at the
    group lrs; both sides here use the same base lr, as the CLI does.)
    torch Adam and optax.scale_by_adam use the same bias-corrected update;
    per-group lr and decoupled-vs-coupled decay mistakes would show
    immediately."""
    rng = np.random.RandomState(1)
    p0 = _tree0(rng)
    grads = [_grad(rng) for _ in range(N_STEPS)]

    cfg = Config()
    t = cfg.TRAIN
    lr = BASE_LR

    w = torch.nn.Parameter(torch.from_numpy(p0["head"]["kernel"].copy()))
    b = torch.nn.Parameter(torch.from_numpy(p0["head"]["bias"].copy()))
    groups = [
        {"params": [w], "lr": lr, "weight_decay": t.WEIGHT_DECAY},
        {"params": [b], "lr": lr * (int(t.DOUBLE_BIAS) + 1),
         "weight_decay": 0.0},
    ]
    opt = torch.optim.Adam(groups)

    tx = make_optimizer(cfg, lr, optimizer="adam")
    params = jax.tree_util.tree_map(jnp.asarray, p0)
    opt_state = tx.init(params)

    for g in grads:
        opt.zero_grad()
        w.grad = torch.from_numpy(g["head"]["kernel"].copy())
        b.grad = torch.from_numpy(g["head"]["bias"].copy())
        opt.step()
        jg = jax.tree_util.tree_map(jnp.asarray, g)
        updates, opt_state = tx.update(jg, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["head"]["kernel"]),
                               w.detach().numpy(), rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(params["head"]["bias"]),
                               b.detach().numpy(), rtol=0, atol=5e-6)
