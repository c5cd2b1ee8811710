"""Trajectory parity: optim/zoo.py vs the reference's vendored timm
optimizers (reference: optim/*.py, dispatched by optim_factory.py:293-376).

Each test runs N steps of the torch reference optimizer and our optax
equivalent on identical params + per-step grads and compares the full
parameter trajectory.  fp64 on both sides so the comparison is tight.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from youku_mplug_tpu.optim import zoo  # noqa: E402

from tests.oracle import load_reference_module  # noqa: E402


@pytest.fixture(autouse=True)
def _x64():
    """f64 on both sides for tight trajectory comparison; restored after
    each test so the rest of the suite keeps default x32."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


def _make_problem(seed=0, steps=8):
    rng = np.random.default_rng(seed)
    params = [rng.normal(size=(4, 3)).astype(np.float64),
              rng.normal(size=(5,)).astype(np.float64)]
    grads = [[rng.normal(size=p.shape).astype(np.float64) for p in params]
             for _ in range(steps)]
    return params, grads


def _run_torch(opt_builder, params, grads):
    torch = pytest.importorskip("torch")
    tparams = [torch.nn.Parameter(torch.tensor(p, dtype=torch.float64))
               for p in params]
    opt = opt_builder(tparams)
    traj = []
    for g in grads:
        for p, gi in zip(tparams, g):
            p.grad = torch.tensor(gi, dtype=torch.float64)
        opt.step()
        traj.append([p.detach().numpy().copy() for p in tparams])
    return traj


def _run_ours(tx, params, grads):
    jparams = [jnp.asarray(p) for p in params]
    state = tx.init(jparams)
    traj = []
    for g in grads:
        updates, state = tx.update([jnp.asarray(x) for x in g], state,
                                   jparams)
        jparams = jax.tree.map(lambda p, u: p + u, jparams, updates)
        traj.append([np.asarray(p) for p in jparams])
    return traj


def _compare(t_ref, t_ours, atol=1e-10, rtol=1e-8):
    for step, (a, b) in enumerate(zip(t_ref, t_ours)):
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                y, x, atol=atol, rtol=rtol,
                err_msg=f"diverged at step {step}")


LR, WD = 0.01, 0.02


def test_nadam_matches_reference():
    mod = load_reference_module("optim/nadam.py", "ref_nadam")
    params, grads = _make_problem()
    ref = _run_torch(
        lambda ps: mod.Nadam(ps, lr=LR, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=WD), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "nadam", LR, weight_decay=WD, betas=(0.9, 0.999), eps=1e-8),
        params, grads)
    _compare(ref, ours)


def test_radam_matches_reference():
    mod = load_reference_module("optim/radam.py", "ref_radam")
    params, grads = _make_problem(steps=12)
    ref = _run_torch(
        lambda ps: mod.RAdam(ps, lr=LR, betas=(0.9, 0.99), eps=1e-8,
                             weight_decay=WD), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "radam", LR, weight_decay=WD, betas=(0.9, 0.99), eps=1e-8),
        params, grads)
    # the reference RAdam itself downcasts grads/params to float32 inside
    # step() (radam.py: p.grad.data.float()), so agreement is f32-level
    _compare(ref, ours, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("nesterov", [False, True])
def test_adamp_matches_reference(nesterov):
    mod = load_reference_module("optim/adamp.py", "ref_adamp")
    params, grads = _make_problem(seed=1)
    ref = _run_torch(
        lambda ps: mod.AdamP(ps, lr=LR, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=WD, wd_ratio=0.01,
                             nesterov=nesterov), params, grads)
    ours = _run_ours(
        zoo.adamp(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD,
                  wd_ratio=0.01, nesterov=nesterov), params, grads)
    _compare(ref, ours)


def test_adamp_projection_engages():
    """Construct a grad orthogonal to a row-normalized weight so the
    channel-view projection actually fires (guards the lax.switch path)."""
    mod = load_reference_module("optim/adamp.py", "ref_adamp")
    rng = np.random.default_rng(3)
    p = rng.normal(size=(2, 8)).astype(np.float64)
    # grad orthogonal to p row-wise -> cosine sim ~ 0 < delta/sqrt(dim)
    g = rng.normal(size=(2, 8)).astype(np.float64)
    g -= (np.sum(g * p, axis=1, keepdims=True)
          / np.sum(p * p, axis=1, keepdims=True)) * p
    params, grads = [p], [[g]] * 6
    ref = _run_torch(
        lambda ps: mod.AdamP(ps, lr=LR, weight_decay=WD, wd_ratio=0.01,
                             nesterov=True), params, grads)
    ours = _run_ours(
        zoo.adamp(LR, weight_decay=WD, wd_ratio=0.01, nesterov=True),
        params, grads)
    _compare(ref, ours)


def test_sgdp_matches_reference():
    mod = load_reference_module("optim/sgdp.py", "ref_sgdp")
    params, grads = _make_problem(seed=2)
    ref = _run_torch(
        lambda ps: mod.SGDP(ps, lr=LR, momentum=0.9, weight_decay=WD,
                            nesterov=True), params, grads)
    ours = _run_ours(
        zoo.sgdp(LR, momentum=0.9, weight_decay=WD, nesterov=True),
        params, grads)
    _compare(ref, ours)


def test_novograd_matches_reference():
    mod = load_reference_module("optim/novograd.py", "ref_novograd")
    params, grads = _make_problem(seed=4)
    ref = _run_torch(
        lambda ps: mod.NovoGrad(ps, lr=LR, betas=(0.95, 0.98),
                                weight_decay=WD), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "novograd", LR, weight_decay=WD, betas=(0.95, 0.98)),
        params, grads)
    _compare(ref, ours)


@pytest.mark.parametrize("amsgrad", [False, True])
def test_nvnovograd_matches_reference(amsgrad):
    mod = load_reference_module("optim/nvnovograd.py", "ref_nvnovograd")
    params, grads = _make_problem(seed=5)
    ref = _run_torch(
        lambda ps: mod.NvNovoGrad(ps, lr=LR, betas=(0.95, 0.98),
                                  weight_decay=WD, grad_averaging=True,
                                  amsgrad=amsgrad), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "nvnovograd", LR, weight_decay=WD, betas=(0.95, 0.98),
        grad_averaging=True, amsgrad=amsgrad), params, grads)
    _compare(ref, ours)


def test_rmsproptf_matches_reference():
    mod = load_reference_module("optim/rmsprop_tf.py", "ref_rmsproptf")
    params, grads = _make_problem(seed=6)
    ref = _run_torch(
        lambda ps: mod.RMSpropTF(ps, lr=LR, alpha=0.9, momentum=0.9,
                                 weight_decay=WD), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "rmsproptf", LR, weight_decay=WD, momentum=0.9), params, grads)
    # TF order-of-ops (avg += (1-a)*(g²-avg)) == optax (a*avg + (1-a)*g²)
    # mathematically; rounding differs at the last bits per step
    _compare(ref, ours, atol=1e-8, rtol=1e-6)


def test_sgd_nesterov_matches_torch():
    torch = pytest.importorskip("torch")
    params, grads = _make_problem(seed=7)
    ref = _run_torch(
        lambda ps: torch.optim.SGD(ps, lr=LR, momentum=0.9, nesterov=True,
                                   weight_decay=WD), params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "sgd", LR, weight_decay=WD, momentum=0.9), params, grads)
    _compare(ref, ours)


def test_lookahead_adam_matches_reference():
    mod = load_reference_module("optim/lookahead.py", "ref_lookahead")
    torch = pytest.importorskip("torch")
    params, grads = _make_problem(seed=8, steps=15)  # crosses 2 syncs (k=6)
    ref = _run_torch(
        lambda ps: mod.Lookahead(
            torch.optim.Adam(ps, lr=LR, betas=(0.9, 0.999), eps=1e-8)),
        params, grads)
    ours = _run_ours(zoo.zoo_optimizer(
        "lookahead_adam", LR, betas=(0.9, 0.999), eps=1e-8),
        params, grads)
    _compare(ref, ours)


def test_adahessian_on_quadratic():
    """Second-order sanity: on a diagonal quadratic the Hutchinson diag is
    exact, so AdaHessian's denominator equals |h_ii| and the step matches
    the analytic update."""
    h = jnp.asarray([4.0, 1.0, 0.25])

    def loss(p):
        return 0.5 * jnp.sum(h * p ** 2)

    params = jnp.asarray([1.0, 2.0, 4.0])
    tx = zoo.adahessian(0.1, b1=0.0, b2=0.0)  # no EMA: pure newton-ish
    state = tx.init(params)
    g = jax.grad(loss)(params)
    hd = zoo.hutchinson_hessian_diag(loss, params, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(hd), np.asarray(h), rtol=1e-6)
    upd, state = tx.update(g, state, params, hessian_diag=hd)
    # direction = -lr * g / |h| = -lr * p  (since g = h*p, denom=h)
    np.testing.assert_allclose(np.asarray(upd), -0.1 * np.asarray(params),
                               rtol=1e-6)


def test_fused_names_alias_plain():
    params, grads = _make_problem(seed=9, steps=3)
    a = _run_ours(zoo.zoo_optimizer("fusedadamw", LR, weight_decay=WD),
                  params, grads)
    b = _run_ours(zoo.zoo_optimizer("adamw", LR, weight_decay=WD),
                  params, grads)
    _compare(a, b)


def test_factory_dispatch_covers_reference_table():
    """Every name the reference factory accepts resolves here too."""
    names = ["sgd", "nesterov", "momentum", "adam", "adamw", "nadam",
             "radam", "adamp", "sgdp", "adadelta", "adafactor", "rmsprop",
             "rmsproptf", "novograd", "nvnovograd", "fusedsgd",
             "fusedmomentum", "fusedadam", "fusedadamw", "fusedlamb",
             "fusednovograd", "lookahead_adam", "lookahead_adamw"]
    params = [jnp.ones((2, 2))]
    for n in names:
        tx = zoo.zoo_optimizer(n, 1e-3, weight_decay=0.01)
        state = tx.init(params)
        upd, _ = tx.update([jnp.ones((2, 2)) * 0.1], state, params)
        assert jnp.all(jnp.isfinite(upd[0])), n


def test_factory_zoo_integration():
    """create_optimizer accepts zoo names: decay mask becomes the two-group
    multi_transform split, lr_scale rules still apply."""
    from youku_mplug_tpu.optim.factory import OptimizerConfig, create_optimizer

    params = {"visual_encoder": {"w": jnp.ones((3, 3)), "bias": jnp.ones(3)},
              "head": {"w": jnp.ones((3, 2))}}
    cfg = OptimizerConfig(opt="lookahead_radam", lr=1e-3, weight_decay=0.1,
                          epochs=1, niter_per_ep=10,
                          visual_backbone_scale=True, clip_grad=1.0)
    tx, sched = create_optimizer(params, cfg)
    state = tx.init(params)
    grads = jax.tree.map(lambda p: p * 0.1, params)
    upd, _ = tx.update(grads, state, params)
    flat = jax.tree.leaves(upd)
    assert all(jnp.all(jnp.isfinite(u)) for u in flat)
    # visual 0.1 lr_scale: visual w update 10x smaller than head w update
    ratio = (jnp.abs(upd["head"]["w"]).mean()
             / jnp.abs(upd["visual_encoder"]["w"]).mean())
    assert 5 < float(ratio) < 20


def test_factory_zoo_sgd_trajectory():
    """End-to-end: factory('momentum') == torch SGD with the same two-group
    decay split on a tiny tree (schedule held constant)."""
    torch = pytest.importorskip("torch")
    from youku_mplug_tpu.optim.factory import OptimizerConfig, create_optimizer

    rng = np.random.default_rng(11)
    w = rng.normal(size=(4, 3))
    b = rng.normal(size=(3,))
    grads_seq = [(rng.normal(size=(4, 3)), rng.normal(size=(3,)))
                 for _ in range(5)]

    lr, wd, mom = 0.05, 0.02, 0.9
    tw = torch.nn.Parameter(torch.tensor(w, dtype=torch.float64))
    tb = torch.nn.Parameter(torch.tensor(b, dtype=torch.float64))
    opt = torch.optim.SGD(
        [{"params": [tw], "weight_decay": wd},
         {"params": [tb], "weight_decay": 0.0}], lr=lr, momentum=mom)
    for gw, gb in grads_seq:
        tw.grad = torch.tensor(gw, dtype=torch.float64)
        tb.grad = torch.tensor(gb, dtype=torch.float64)
        opt.step()

    params = {"w": jnp.asarray(w), "bias": jnp.asarray(b)}
    cfg = OptimizerConfig(opt="momentum", momentum=mom, lr=lr, min_lr=lr,
                          weight_decay=wd, epochs=1, niter_per_ep=10 ** 6,
                          clip_grad=None, sched_type="linear")
    tx, _ = create_optimizer(params, cfg)
    state = tx.init(params)
    for gw, gb in grads_seq:
        upd, state = tx.update(
            {"w": jnp.asarray(gw), "bias": jnp.asarray(gb)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    # the factory's schedule fn computes lr in f32 (production dtype),
    # so agreement is f32-level
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               tb.detach().numpy(), rtol=1e-6)
