"""Optimizer zoo: the timm-name dispatch table as optax transformations.

The reference vendors a timm optimizer zoo (reference: optim/optim_factory.py
:293-376 dispatch; optim/{nadam,radam,adamp,sgdp,novograd,nvnovograd,
rmsprop_tf,adafactor,lookahead}.py) whose production configs only ever use
adam/adamw — but the surface exists, so downstream users may select any of
these names.  This module provides the same names with the same update
rules, built from optax primitives where optax's semantics already match
torch's, and as from-scratch ``GradientTransformation``s (implemented from
the published algorithms, validated numerically against the reference
implementations in tests/test_optim_zoo.py) where they don't.

TPU notes: every transform below is a pure pytree function — it jits,
shards (optimizer state inherits each param's NamedSharding = ZeRO-1 under
GSPMD), and vectorizes.  The ``fused*`` names map to the plain updates:
apex fusion is a CUDA-kernel-count optimization; under XLA the chained
elementwise update lowers to one fused loop already.

Conventions: each ``scale_by_*`` emits a DESCENT DIRECTION to be chained
with ``optax.scale_by_learning_rate`` (which multiplies by -lr), matching
optax idiom.  Optimizers whose weight-decay or projection step needs the
live learning rate (adamp, sgdp, radam-coupled-decay) are built as full
optimizers taking ``learning_rate`` (float or schedule) directly.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def _lr_at(learning_rate: ScalarOrSchedule, count):
    if callable(learning_rate):
        return learning_rate(count)
    return learning_rate


# ---------------------------------------------------------------------------
# Nadam (timm variant: momentum schedule, reference optim/nadam.py:62-91)
# ---------------------------------------------------------------------------


class ScaleByNadamState(NamedTuple):
    count: chex.Array
    m_schedule: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_nadam_timm(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8, schedule_decay: float = 4e-3):
    """Nadam with the warming momentum schedule (Dozat 2016, the variant
    the reference ships).  L2 weight decay is COUPLED upstream: chain
    ``optax.add_decayed_weights`` *before* this transform."""

    def init_fn(params):
        return ScaleByNadamState(
            count=jnp.zeros([], jnp.int32),
            m_schedule=jnp.ones([]),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t * 1.0  # weak-typed: stays f64 under x64, f32 otherwise
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * schedule_decay))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * schedule_decay))
        m_sched_new = state.m_schedule * mu_t
        m_sched_next = m_sched_new * mu_t1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        bc2 = 1 - b2 ** tf

        def direction(g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            return ((1.0 - mu_t) / (1.0 - m_sched_new) * g
                    + mu_t1 / (1.0 - m_sched_next) * m) / denom

        out = jax.tree.map(direction, updates, mu, nu)
        return out, ScaleByNadamState(t, m_sched_new, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# RAdam (rectified Adam, Liu et al. 2019; reference optim/radam.py:14-86)
# ---------------------------------------------------------------------------


def scale_by_radam_timm(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8):
    """RAdam direction with the reference's exact rectification: below the
    N_sma>=5 threshold the update is the bias-corrected first moment with
    NO second-moment denominator.  Weight decay in the reference is
    decoupled (p -= lr*wd*p before the step): chain
    ``optax.add_decayed_weights`` *after* this transform."""

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        tf = t * 1.0  # weak-typed: stays f64 under x64, f32 otherwise
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        beta2_t = b2 ** tf
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma
                        * n_sma_max / (n_sma_max - 2))
        bc1 = 1 - b1 ** tf
        use_rect = n_sma >= 5.0

        def direction(m, v):
            rected = rect * m / (jnp.sqrt(v) + eps)
            plain = m
            return jnp.where(use_rect, rected, plain) / bc1

        out = jax.tree.map(direction, mu, nu)
        return out, optax.ScaleByAdamState(t, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# AdamP / SGDP (Heo et al. 2020 projection; reference optim/adamp.py:16-107,
# optim/sgdp.py:16-96)
# ---------------------------------------------------------------------------


def _cosine_sim_rows(x, y, eps):
    """|<x,y>| / (|x||y|) row-wise after flattening to [dim0, -1]."""
    xf = x.reshape(x.shape[0], -1)
    yf = y.reshape(y.shape[0], -1)
    xn = jnp.linalg.norm(xf, axis=1) + eps
    yn = jnp.linalg.norm(yf, axis=1) + eps
    return jnp.abs(jnp.sum(xf * yf, axis=1)) / xn / yn


def _projection(p, grad, perturb, delta, wd_ratio, eps):
    """-> (perturb', wd_scale): project the step off the parameter's scale
    direction when grad ⟂ p (channel view first, then layer view)."""
    if p.ndim <= 1:
        return perturb, jnp.ones([], p.dtype)

    def channel_case():
        expand = (-1,) + (1,) * (p.ndim - 1)
        pn = p / (jnp.linalg.norm(
            p.reshape(p.shape[0], -1), axis=1).reshape(expand) + eps)
        proj = (pn * perturb).reshape(p.shape[0], -1).sum(axis=1)
        return perturb - pn * proj.reshape(expand), jnp.asarray(
            wd_ratio, p.dtype)

    def layer_case():
        pn = p / (jnp.linalg.norm(p.reshape(1, -1)) + eps)
        proj = jnp.sum(pn * perturb)
        return perturb - pn * proj, jnp.asarray(wd_ratio, p.dtype)

    def neither():
        return perturb, jnp.ones([], p.dtype)

    ch_dim = math.prod(p.shape[1:])
    ly_dim = math.prod(p.shape)
    ch_hit = jnp.max(_cosine_sim_rows(grad, p, eps)) < delta / math.sqrt(
        ch_dim)
    ly_hit = _cosine_sim_rows(grad.reshape(1, -1), p.reshape(1, -1),
                              eps)[0] < delta / math.sqrt(ly_dim)
    idx = jnp.where(ch_hit, 0, jnp.where(ly_hit, 1, 2))
    return jax.lax.switch(idx, (channel_case, layer_case, neither))


class AdamPState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate: ScalarOrSchedule, b1: float = 0.9,
          b2: float = 0.999, eps: float = 1e-8, weight_decay: float = 0.0,
          delta: float = 0.1, wd_ratio: float = 0.1,
          nesterov: bool = False) -> optax.GradientTransformation:
    """AdamP: Adam whose step is projected off the weight's radial
    direction for scale-invariant weights.  Full optimizer (emits the
    final additive update) because the multiplicative decay factor
    depends on the data-dependent projection outcome."""

    def init_fn(params):
        return AdamPState(jnp.zeros([], jnp.int32),
                          jax.tree.map(jnp.zeros_like, params),
                          jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params):
        t = state.count + 1
        tf = t * 1.0  # weak-typed: stays f64 under x64, f32 otherwise
        lr = _lr_at(learning_rate, state.count)
        bc1 = 1 - b1 ** tf
        bc2 = 1 - b2 ** tf
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)

        def one(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            if nesterov:
                perturb = (b1 * m + (1 - b1) * g) / denom
            else:
                perturb = m / denom
            perturb, wd_s = _projection(p, g, perturb, delta, wd_ratio, eps)
            step = -(lr / bc1) * perturb
            if weight_decay > 0:
                step = step - lr * weight_decay * wd_s * p
            return step

        out = jax.tree.map(one, params, updates, mu, nu)
        return out, AdamPState(t, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class SGDPState(NamedTuple):
    count: chex.Array
    momentum: optax.Updates


def sgdp(learning_rate: ScalarOrSchedule, momentum: float = 0.9,
         dampening: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, eps: float = 1e-8, delta: float = 0.1,
         wd_ratio: float = 0.1) -> optax.GradientTransformation:
    """SGDP: projected SGD-with-momentum (same projection as AdamP)."""

    def init_fn(params):
        return SGDPState(jnp.zeros([], jnp.int32),
                         jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params):
        lr = _lr_at(learning_rate, state.count)
        buf = jax.tree.map(lambda b, g: momentum * b + (1 - dampening) * g,
                           state.momentum, updates)

        def one(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, wd_s = _projection(p, g, d_p, delta, wd_ratio, eps)
            step = -lr * d_p
            if weight_decay != 0:
                step = step - lr * weight_decay * wd_s * p / (1 - momentum)
            return step

        out = jax.tree.map(one, params, updates, buf)
        return out, SGDPState(state.count + 1, buf)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# NovoGrad (reference optim/novograd.py:25-77 — the timm double-
# normalization variant) and NvNovoGrad (optim/nvnovograd.py:17-118 — the
# NVIDIA layer-wise variant, also the basis of fusednovograd)
# ---------------------------------------------------------------------------


class NovoGradState(NamedTuple):
    count: chex.Array
    v: optax.Updates          # per-tensor scalar second moment
    m: optax.Updates
    grad_ema: optax.Updates   # per-tensor scalar (timm variant only)


def scale_by_novograd_timm(b1: float = 0.95, b2: float = 0.98,
                           eps: float = 1e-8, weight_decay: float = 0.0,
                           grad_averaging: bool = False):
    """timm NovoGrad: pre-normalizes the grad by a second EMA of its norm,
    then the usual layer-wise NovoGrad moment.  Note the reference's
    step_size includes sqrt(bc2)/bc1 bias correction."""

    def init_fn(params):
        zeros_s = jax.tree.map(
            lambda p: jnp.zeros([], jnp.promote_types(p.dtype, jnp.float32)), params)
        return NovoGradState(jnp.zeros([], jnp.int32), zeros_s,
                             jax.tree.map(jnp.zeros_like, params), zeros_s)

    def update_fn(updates, state, params):
        t = state.count + 1
        tf = t * 1.0  # weak-typed: stays f64 under x64, f32 otherwise
        is_first = state.count == 0

        def one(g, p, v, m, ge):
            # the reference's lazy init pass runs INSIDE the first step():
            # v0 = |g|^2, m0 = g/(sqrt(v0)+eps) + wd*p seed the moments,
            # and the same call then performs the normal double-normalized
            # update on top of them (novograd.py:30-77).
            g2 = jnp.sum(g.astype(jnp.promote_types(g.dtype, jnp.float32)) ** 2)
            v_prior = jnp.where(is_first, g2, v)
            m_prior = jnp.where(
                is_first, g / (jnp.sqrt(g2) + eps) + weight_decay * p, m)
            ge_new = jnp.where(is_first, g2, ge * b2 + g2 * (1 - b2))
            gn = g / (jnp.sqrt(ge_new) + eps)
            if grad_averaging:
                gn = gn * (1 - b1)
            g2n = jnp.sum(gn.astype(jnp.float32) ** 2)
            v_new = b2 * v_prior + (1 - b2) * g2n
            m_new = b1 * m_prior + (gn / (jnp.sqrt(v_new) + eps)
                                    + weight_decay * p)
            bc1 = 1 - b1 ** tf
            bc2 = 1 - b2 ** tf
            upd = (jnp.sqrt(bc2) / bc1) * m_new
            return v_new, m_new, ge_new, upd

        res = jax.tree.map(one, updates, params, state.v, state.m,
                           state.grad_ema)
        # unzip the 4-tuples
        treedef = jax.tree.structure(updates)
        flat = treedef.flatten_up_to(res)
        v = treedef.unflatten([r[0] for r in flat])
        m = treedef.unflatten([r[1] for r in flat])
        ge = treedef.unflatten([r[2] for r in flat])
        out = treedef.unflatten([r[3] for r in flat])
        return out, NovoGradState(t, v, m, ge)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_nvnovograd(b1: float = 0.95, b2: float = 0.98,
                        eps: float = 1e-8, weight_decay: float = 0.0,
                        grad_averaging: bool = False,
                        amsgrad: bool = False):
    """NVIDIA NovoGrad: per-tensor scalar second moment initialized to the
    first grad-norm², coupled wd after normalization, NO bias correction."""

    class State(NamedTuple):
        count: chex.Array
        v: optax.Updates
        m: optax.Updates
        vmax: optax.Updates

    def init_fn(params):
        zeros_s = jax.tree.map(lambda p: jnp.zeros([], jnp.promote_types(p.dtype, jnp.float32)), params)
        return State(jnp.zeros([], jnp.int32), zeros_s,
                     jax.tree.map(jnp.zeros_like, params), zeros_s)

    def update_fn(updates, state, params):
        def one(g, p, v, m, vm):
            norm = jnp.sum(g.astype(jnp.promote_types(g.dtype, jnp.float32)) ** 2)
            v_new = jnp.where(v == 0, norm, v * b2 + norm * (1 - b2))
            vm_new = jnp.maximum(vm, v_new) if amsgrad else vm
            denom = jnp.sqrt(vm_new if amsgrad else v_new) + eps
            gn = g / denom + weight_decay * p
            if grad_averaging:
                gn = gn * (1 - b1)
            m_new = b1 * m + gn
            return v_new, m_new, vm_new

        res = jax.tree.map(one, updates, params, state.v, state.m,
                           state.vmax)
        treedef = jax.tree.structure(updates)
        flat = treedef.flatten_up_to(res)
        v = treedef.unflatten([r[0] for r in flat])
        m = treedef.unflatten([r[1] for r in flat])
        vm = treedef.unflatten([r[2] for r in flat])
        return m, State(state.count + 1, v, m, vm)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Lookahead wrapper (Zhang et al. 2019; reference optim/lookahead.py:12-60)
# ---------------------------------------------------------------------------


class LookaheadState(NamedTuple):
    count: chex.Array
    slow: optax.Params
    inner: Any


def lookahead(base: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """k fast steps forward, one slow interpolation back.  The emitted
    update already reflects the slow pull-back on sync steps, so callers
    apply it with ``optax.apply_updates`` as usual."""

    def init_fn(params):
        return LookaheadState(jnp.zeros([], jnp.int32),
                              jax.tree.map(jnp.asarray, params),
                              base.init(params))

    def update_fn(updates, state, params):
        inner_updates, inner_state = base.update(updates, state.inner,
                                                 params)
        count = state.count + 1
        sync = (count % k) == 0
        # the reference creates the slow buffer lazily AT the first sync
        # (lookahead.py:33-39), so the first sync is a no-op (slow := fast)
        first_sync = count == k
        fast = jax.tree.map(lambda p, u: p + u, params, inner_updates)
        slow_new = jax.tree.map(
            lambda s, f: jnp.where(
                sync, jnp.where(first_sync, f, s + alpha * (f - s)), s),
            state.slow, fast)
        out = jax.tree.map(
            lambda p, f, s: jnp.where(sync, s - p, f - p),
            params, fast, slow_new)
        return out, LookaheadState(count, slow_new, inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Name dispatch (reference optim_factory.py:293-376)
# ---------------------------------------------------------------------------


def create_zoo_optimizer(
        opt: str, learning_rate: ScalarOrSchedule,
        weight_decay: float = 0.0, momentum: float = 0.9,
        betas: Optional[tuple] = None, eps: Optional[float] = None,
        **kwargs) -> optax.GradientTransformation:
    """timm-style name -> full optax optimizer (lr folded in).

    Supports the same grammar as the reference: a ``lookahead_`` prefix
    wraps the base optimizer; ``fused*`` names map to the mathematically
    identical plain updates (XLA fuses the update chain by compilation —
    there is nothing to hand-fuse on TPU).
    """
    opt_lower = opt.lower()
    parts = opt_lower.split("_")
    name = parts[-1]
    b1, b2 = betas if betas is not None else (0.9, 0.999)
    eps_ = 1e-8 if eps is None else eps
    lr = learning_rate

    def with_lr(direction_tx, decoupled_wd=None, coupled_wd=None):
        chain = []
        if coupled_wd:
            chain.append(optax.add_decayed_weights(coupled_wd))
        chain.append(direction_tx)
        if decoupled_wd:
            chain.append(optax.add_decayed_weights(decoupled_wd))
        chain.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*chain)

    if name in ("sgd", "nesterov", "fusedsgd"):
        return with_lr(optax.trace(decay=momentum, nesterov=True),
                       coupled_wd=weight_decay)
    if name in ("momentum", "fusedmomentum"):
        return with_lr(optax.trace(decay=momentum, nesterov=False),
                       coupled_wd=weight_decay)
    if name == "adam" or name == "fusedadam":
        return with_lr(optax.scale_by_adam(b1=b1, b2=b2, eps=eps_),
                       coupled_wd=weight_decay)
    if name == "adamw" or name == "fusedadamw":
        return with_lr(optax.scale_by_adam(b1=b1, b2=b2, eps=eps_),
                       decoupled_wd=weight_decay)
    if name == "nadam":
        return with_lr(scale_by_nadam_timm(b1=b1, b2=b2, eps=eps_),
                       coupled_wd=weight_decay)
    if name == "radam":
        return with_lr(scale_by_radam_timm(b1=b1, b2=b2, eps=eps_),
                       decoupled_wd=weight_decay)
    if name == "adamp":
        return adamp(lr, b1=b1, b2=b2, eps=eps_, weight_decay=weight_decay,
                     wd_ratio=kwargs.get("wd_ratio", 0.1),
                     delta=kwargs.get("delta", 0.1),
                     nesterov=kwargs.get("nesterov", True))
    if name == "sgdp":
        return sgdp(lr, momentum=momentum, weight_decay=weight_decay,
                    eps=eps_, wd_ratio=kwargs.get("wd_ratio", 0.1),
                    delta=kwargs.get("delta", 0.1),
                    nesterov=kwargs.get("nesterov", True))
    if name == "adadelta":
        return with_lr(
            optax.scale_by_adadelta(eps=1e-6 if eps is None else eps),
            coupled_wd=weight_decay)
    if name == "adafactor":
        return optax.adafactor(
            learning_rate=None if not lr else lr,
            multiply_by_parameter_scale=True,
            weight_decay_rate=weight_decay or None)
    if name == "rmsprop":
        return with_lr(
            optax.chain(
                optax.scale_by_rms(decay=0.9, eps=eps_, eps_in_sqrt=False),
                optax.trace(decay=momentum) if momentum else
                optax.identity()),
            coupled_wd=weight_decay)
    if name == "rmsproptf":
        # TF semantics: square-avg initialized to ONES, eps inside sqrt
        return with_lr(
            optax.chain(
                optax.scale_by_rms(decay=0.9, eps=eps_, initial_scale=1.0,
                                   eps_in_sqrt=True),
                optax.trace(decay=momentum) if momentum else
                optax.identity()),
            coupled_wd=weight_decay)
    if name in ("novograd",):
        return with_lr(scale_by_novograd_timm(
            b1=b1 if betas else 0.95, b2=b2 if betas else 0.98, eps=eps_,
            weight_decay=weight_decay,
            grad_averaging=kwargs.get("grad_averaging", False)))
    if name in ("nvnovograd", "fusednovograd"):
        if betas is None:
            b1n, b2n = 0.95, 0.98
        else:
            b1n, b2n = b1, b2
        return with_lr(scale_by_nvnovograd(
            b1=b1n, b2=b2n, eps=eps_, weight_decay=weight_decay,
            grad_averaging=kwargs.get("grad_averaging", False),
            amsgrad=kwargs.get("amsgrad", False)))
    if name in ("lamb", "fusedlamb"):
        return optax.lamb(lr, b1=b1, b2=b2, eps=eps_,
                          weight_decay=weight_decay)
    if name == "lars":
        return optax.lars(lr, weight_decay=weight_decay,
                          momentum=momentum)
    if name == "adahessian":
        raise NotImplementedError(
            "adahessian needs Hessian-diagonal estimates; use "
            "youku_mplug_tpu.optim.zoo.adahessian() with a loss_fn "
            "(second-order: not expressible as a grad-only transform)")
    raise ValueError(f"unknown optimizer: {opt}")


def create_lookahead_if_requested(opt: str, tx, alpha=0.5, k=6):
    if opt.lower().split("_")[0] == "lookahead":
        return lookahead(tx, alpha=alpha, k=k)
    return tx


def zoo_optimizer(opt: str, learning_rate: ScalarOrSchedule, **kw):
    """One-call entry: handles the lookahead_ prefix too."""
    tx = create_zoo_optimizer(opt, learning_rate, **kw)
    return create_lookahead_if_requested(opt, tx)


# ---------------------------------------------------------------------------
# AdaHessian (second-order; reference optim/adahessian.py) — needs the loss
# fn for Hutchinson Hessian-diagonal probes, so it is a step-fn factory
# rather than a GradientTransformation.
# ---------------------------------------------------------------------------


def hutchinson_hessian_diag(loss_fn, params, rng, n_samples: int = 1,
                            *args):
    """E[z ⊙ (H z)] with Rademacher z — the Hutchinson estimator the
    reference computes via torch.autograd.grad(grad, params, grad_outputs=z)
    (optim/adahessian.py get_trace)."""
    grad_fn = jax.grad(lambda p: loss_fn(p, *args))

    def one(carry_rng, _):
        rng, sub = jax.random.split(carry_rng)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(sub, len(leaves))
        z = treedef.unflatten([
            jax.random.rademacher(k, l.shape, l.dtype)
            for k, l in zip(keys, leaves)])
        _, hz = jax.jvp(grad_fn, (params,), (z,))
        hd = jax.tree.map(lambda zz, h: zz * h, z, hz)
        return rng, hd

    rng, first = one(rng, None)
    acc = first
    for _ in range(n_samples - 1):
        rng, nxt = one(rng, None)
        acc = jax.tree.map(lambda a, b: a + b, acc, nxt)
    return jax.tree.map(lambda a: a / n_samples, acc)


class AdaHessianState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates   # EMA of hessian-diag²


def adahessian(learning_rate: ScalarOrSchedule, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.0, hessian_power: float = 1.0):
    """AdaHessian update given (grads, hessian_diag) — call
    ``update(grads, state, params, hessian_diag=...)``."""

    def init_fn(params):
        return AdaHessianState(jnp.zeros([], jnp.int32),
                               jax.tree.map(jnp.zeros_like, params),
                               jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None, *, hessian_diag):
        t = state.count + 1
        tf = t * 1.0  # weak-typed: stays f64 under x64, f32 otherwise
        lr = _lr_at(learning_rate, state.count)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, h: b2 * v + (1 - b2) * h * h,
                          state.nu, hessian_diag)
        bc1 = 1 - b1 ** tf
        bc2 = 1 - b2 ** tf

        def one(p, m, v):
            denom = (jnp.sqrt(v / bc2)) ** hessian_power + eps
            step = -lr * (m / bc1) / denom
            if weight_decay and params is not None:
                step = step - lr * weight_decay * p
            return step

        out = jax.tree.map(one, params if params is not None else mu, mu,
                           nu)
        return out, AdaHessianState(t, mu, nu)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
