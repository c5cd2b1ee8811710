"""common.resume_state: the shared resume wiring every training entry
point uses (cli/common.py setup + run_instruct train_main).

Pins the drift bug class the round-5 review caught: --resume pointing at
a directory with no checkpoint must raise, never silently train from
scratch.
"""

import types

import pytest

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.train.checkpoint import CheckpointManager


def _args(tmp_path, **kw):
    d = dict(resume="", evaluate_only=False,
             output_dir=str(tmp_path / "out"))
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_missing_resume_raises(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "out" / "checkpoints"))
    empty = tmp_path / "elsewhere"
    empty.mkdir()
    args = _args(tmp_path, resume=str(empty))
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        common.resume_state(args, ckpt, state=None, mesh=None)


def test_missing_evaluate_only_raises(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "out" / "checkpoints"))
    args = _args(tmp_path, evaluate_only=True)
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        common.resume_state(args, ckpt, state=None, mesh=None)


def test_fresh_run_starts_at_zero(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "out" / "checkpoints"))
    args = _args(tmp_path)
    state, start_epoch = common.resume_state(args, ckpt, state="s",
                                             mesh=None)
    assert state == "s" and start_epoch == 0
