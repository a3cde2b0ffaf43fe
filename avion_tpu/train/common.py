"""Shared helpers for finetune entries: pretrained-weight loading."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def load_pretrained_params(path: str, template: Any, *, num_frames: int = 16,
                           context_length: int = 77, vocab_size: int = 49408,
                           strict: bool = False) -> Any:
    """Load params from either a torch ``.pt`` checkpoint (reference
    formats) or an orbax checkpoint dir produced by this framework.

    Mirrors the finetune entries' checkpoint surgery
    (``main_lavila_finetune_mir.py:217-251``): key remap + temporal
    positional-embedding inflation when clip length differs.
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        from avion_tpu.models.pt_import import import_clip_pt, merge_into_params

        imported = import_clip_pt(path, num_frames=num_frames,
                                  context_length=context_length,
                                  vocab_size=vocab_size)
        return merge_into_params(template, imported, strict=strict)

    # orbax checkpoint: restore the params subtree of the train state
    import orbax.checkpoint as ocp

    from avion_tpu.core.train_state import TrainState

    path = os.path.abspath(path)
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    try:
        # restore with a params-only template wrapped in the state layout
        restored = mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore({"params": template}),
            ),
        )
        params = restored["state"]["params"]
    except Exception as template_err:
        # layout mismatch (e.g. pipelined stacked params vs sequential
        # template, or vice versa): restore raw, convert, overlay.  If
        # the RAW restore ALSO fails the checkpoint itself is bad
        # (truncation, permissions, ...) — surface the original error
        # instead of a misleading fallback traceback.  Merge errors
        # (shape mismatch, unknown keys, zero-tensor overlay) are the
        # real diagnosis and propagate as-is.
        from avion_tpu.models.pt_import import merge_into_params

        try:
            restored = mngr.restore(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        except Exception:
            mngr.close()
            raise template_err
        try:
            params = merge_into_params(template,
                                       restored["state"]["params"],
                                       strict=strict)
        except Exception:
            mngr.close()
            raise
    mngr.close()
    return params


def extract_visual_params(clip_params: dict) -> dict:
    """Visual tower subtree minus the CLIP projection, for classifier
    heads (``VideoClassifier`` drops image_projection,
    ``model_clip.py:25-27``)."""
    visual = dict(clip_params["visual"])
    visual.pop("proj", None)
    return visual
