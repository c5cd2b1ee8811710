"""Checkpointing: one logical sharded checkpoint via orbax.

Replaces the reference's per-TP-rank ``mp_rank_XX_model_states.pt`` files
and resharding logic (reference: utils.py:375-480 save/auto-resume;
modeling_distributed_gpt3.py:1491-1518 TP shard load/save): GSPMD owns the
layout, so save/restore is a single logical pytree regardless of mesh
shape, and "resharding" is just restoring under a different sharding.

Keeps the reference's retention policy: rolling iteration checkpoints
(keep last N, default 10 — utils.py:375-390) plus epoch checkpoints.
Auto-resume scans for the latest step; the NaN watchdog restores the
SECOND-latest (utils.py:393-404).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 10,
                 async_save: bool = False):
        """async_save: background the device-to-disk write (orbax async
        checkpointing) so multi-GB saves overlap the next train steps —
        save() returns after snapshotting device arrays; every read path
        (latest_step/restore/...) barriers on in-flight writes first.
        YAML knob: ``async_checkpointing: true``."""
        self.directory = os.path.abspath(directory)
        self._async = bool(async_save)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=self._async),
        )

    def save(self, step: int, state: Any, metadata: Optional[dict] = None,
             wait: Optional[bool] = None):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)}
               if metadata is not None else {}))
        self._mngr.save(int(step), args=args)
        if wait is None:
            wait = not self._async
        if wait:
            self._mngr.wait_until_finished()

    def wait_until_finished(self):
        self._mngr.wait_until_finished()

    def _barrier(self):
        if self._async:
            self._mngr.wait_until_finished()

    def all_steps(self):
        self._barrier()
        return sorted(self._mngr.all_steps())

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def rollback_step(self) -> Optional[int]:
        """Second-latest step (NaN-rollback target, utils.py:393-404)."""
        steps = self.all_steps()
        if len(steps) >= 2:
            return steps[-2]
        return steps[-1] if steps else None

    def restore(self, step: int, template: Any):
        """Restore into the shapes/shardings of ``template`` (an abstract
        or concrete pytree)."""
        self._barrier()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mngr.restore(
            int(step),
            args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract)))
        return restored["state"]

    def restore_raw(self, step: int):
        """Restore the state pytree as saved, with no shape template.

        Used by the resume-time embed-resize path (reference
        run_cls_distributed_gpt3.py:332-340): when the current config's
        pos/temporal embed shapes differ from the checkpoint's, the exact
        template restore would fail, so the caller restores raw and
        interpolates."""
        self._barrier()
        restored = self._mngr.restore(
            int(step),
            args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        return restored["state"]

    def restore_metadata(self, step: int) -> Optional[dict]:
        self._barrier()
        try:
            out = self._mngr.restore(
                int(step),
                args=ocp.args.Composite(metadata=ocp.args.JsonRestore()))
            return out["metadata"]
        except Exception:
            return None

    def close(self):
        self._mngr.close()
