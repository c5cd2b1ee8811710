"""Parity: optim/schedulers.py vs the reference's vendored timm schedulers
(reference: scheduler/*.py).  Each test instantiates the torch reference
scheduler on a dummy optimizer, steps it per epoch, and compares the lr it
writes into param_groups against our stateless callable at every t."""

import numpy as np
import pytest

from youku_mplug_tpu.optim import schedulers as S

BASE_LR = 0.1


def _load_ref_sched_pkg():
    """The reference scheduler files use package-relative imports, so load
    the whole scheduler/ directory as a synthetic package."""
    import importlib
    import importlib.util
    import os
    import sys

    path = "/root/reference/scheduler"
    if not os.path.isdir(path):
        pytest.skip("reference scheduler package not available")
    torch = pytest.importorskip("torch")
    # modern torch removed ReduceLROnPlateau(verbose=); shim it for the
    # reference's plateau_lr.py
    rop = torch.optim.lr_scheduler.ReduceLROnPlateau
    if not getattr(rop, "_verbose_shim", False):
        orig = rop.__init__

        def patched(self, *a, verbose=False, **k):
            orig(self, *a, **k)

        rop.__init__ = patched
        rop._verbose_shim = True
    name = "ref_scheduler_pkg"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(path, "__init__.py"),
            submodule_search_locations=[path])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[name] = pkg
        spec.loader.exec_module(pkg)
    return sys.modules[name]


def _ref_lrs(sched_mod_file, klass, epochs, metric_seq=None, **kw):
    torch = pytest.importorskip("torch")
    import importlib

    _load_ref_sched_pkg()
    mod = importlib.import_module(
        "ref_scheduler_pkg." + sched_mod_file[:-3])
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = getattr(mod, klass)(opt, **kw)
    lrs = []
    for t in range(epochs):
        sched.step(t, metric_seq[t] if metric_seq is not None else None)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


@pytest.mark.parametrize("kw", [
    dict(t_initial=10, lr_min=1e-4, warmup_t=3, warmup_lr_init=1e-5,
         cycle_limit=1),
    dict(t_initial=6, t_mul=2.0, decay_rate=0.5, lr_min=1e-4, warmup_t=0,
         cycle_limit=0),
    dict(t_initial=5, decay_rate=0.8, lr_min=1e-5, warmup_t=2,
         warmup_lr_init=1e-6, cycle_limit=3),
])
def test_cosine_matches_reference(kw):
    epochs = 25
    ref = _ref_lrs("cosine_lr.py", "CosineLRScheduler", epochs, **kw)
    ours = S.CosineLRScheduler(BASE_LR, **kw)
    mine = [ours(t) for t in range(epochs)]
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_cosine_cycle_length():
    torch = pytest.importorskip("torch")
    import importlib

    _load_ref_sched_pkg()
    ref_mod = importlib.import_module("ref_scheduler_pkg.cosine_lr")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    ref = ref_mod.CosineLRScheduler(opt, t_initial=7, t_mul=2.0,
                                    cycle_limit=3)
    ours = S.CosineLRScheduler(BASE_LR, t_initial=7, t_mul=2.0,
                               cycle_limit=3)
    assert ours.get_cycle_length() == ref.get_cycle_length()


@pytest.mark.parametrize("kw", [
    dict(t_initial=12, lr_min=1e-4, warmup_t=3, warmup_lr_init=1e-5,
         cycle_limit=1),
    dict(t_initial=8, t_mul=1.5, decay_rate=0.7, lr_min=1e-4,
         cycle_limit=2),
])
def test_tanh_matches_reference(kw):
    epochs = 20
    ref = _ref_lrs("tanh_lr.py", "TanhLRScheduler", epochs, **kw)
    ours = S.TanhLRScheduler(BASE_LR, **kw)
    mine = [ours(t) for t in range(epochs)]
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_step_matches_reference():
    kw = dict(decay_t=5, decay_rate=0.5, warmup_t=2, warmup_lr_init=1e-5)
    epochs = 23
    ref = _ref_lrs("step_lr.py", "StepLRScheduler", epochs, **kw)
    ours = S.StepLRScheduler(BASE_LR, **kw)
    mine = [ours(t) for t in range(epochs)]
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_plateau_matches_reference():
    rng = np.random.default_rng(0)
    # a metric that improves, stalls, improves: exercises patience+cooldown
    metric = np.concatenate([
        np.linspace(0.1, 0.5, 6), np.full(10, 0.5), np.linspace(0.5, 0.7, 4),
        np.full(12, 0.7)]) + rng.normal(0, 1e-6, 32)
    # NB warmup_t >= 1: the reference's epoch-0 warmup branch with
    # warmup_t=0 writes lr = warmup_lr_init (0.0) permanently — a quirk
    # its runners never hit (they always configure warmup); we guard
    # against it (schedulers.py step()) instead of reproducing it.
    kw = dict(decay_rate=0.5, patience_t=3, cooldown_t=2, mode="max",
              lr_min=1e-4, warmup_t=2, warmup_lr_init=1e-5)
    ref = _ref_lrs("plateau_lr.py", "PlateauLRScheduler", len(metric),
                   metric_seq=list(metric), verbose=False, **kw)
    ours = S.PlateauLRScheduler(BASE_LR, **kw)
    mine = [ours.step(t, metric[t]) for t in range(len(metric))]
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_noise_matches_reference():
    """lr noise must reproduce the reference's torch.Generator draws
    bit-exactly (same seed -> same resampling loop)."""
    kw = dict(t_initial=10, lr_min=1e-4, noise_range_t=4, noise_pct=0.67,
              noise_std=1.0, noise_seed=42)
    epochs = 10
    ref = _ref_lrs("cosine_lr.py", "CosineLRScheduler", epochs, **kw)
    ours = S.CosineLRScheduler(BASE_LR, **kw)
    mine = [ours(t) for t in range(epochs)]
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_factory_dispatch():
    class A:
        pass

    a = A()
    a.sched = "cosine"
    a.epochs = 10
    a.lr = BASE_LR
    a.min_lr = 1e-5
    a.decay_rate = 1.0
    a.warmup_lr = 1e-6
    a.warmup_epochs = 2
    a.cooldown_epochs = 1
    sched, n = S.create_scheduler(a)
    assert n == 11 and abs(sched(5)) > 0

    a.sched = "step"
    a.decay_epochs = 3
    a.decay_rate = 0.5
    sched, n = S.create_scheduler(a)
    assert sched(8) < BASE_LR

    a.sched = "plateau"
    a.patience_epochs = 2
    a.eval_metric = "loss"
    sched, _ = S.create_scheduler(a)
    assert sched.mode == "min"
