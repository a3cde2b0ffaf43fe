"""Checkpoint save/restore (orbax) + auto-resume.

Replaces the reference's ``torch.save`` dict checkpoints
(``avion/utils/distributed.py:59-73``): orbax handles sharded,
multi-host-safe async writes; the config travels inside the checkpoint
like the reference's ``ckpt["args"]`` (``main_lavila_finetune_cls.py:278``).
Reference ``.pt`` checkpoints are imported via
``avion_tpu.models.pt_import`` (read-side drop-in compatibility).

Layout: ``<output_dir>/ckpt_<step>/`` managed by CheckpointManager with
``best`` tracking mirroring ``checkpoint_best.pt``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=None, enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, extra: Optional[dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if extra is not None:
            args["extra"] = ocp.args.JsonSave(extra)
        self.mngr.save(step, args=ocp.args.Composite(**args))

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
            ),
        )
        extra = None
        try:
            extra_restored = self.mngr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            extra = extra_restored.get("extra")
        except Exception:
            pass
        return restored["state"], extra

    def wait(self):
        self.mngr.wait_until_finished()

    def close(self):
        self.mngr.close()
