"""Shared training-run harness used by all entry points.

Replaces the per-entry boilerplate of the reference's five scripts
(distributed init, model/optimizer build, resume, loop, checkpoint —
e.g. ``scripts/main_lavila_pretrain.py:249-756``) with one setup path:
mesh + sharded state + orbax auto-resume + duty-cycle metering.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from avion_tpu.core.checkpoint import Checkpointer
from avion_tpu.core.config import TrainConfig
from avion_tpu.core.logging import MetricLogger
from avion_tpu.core.meters import AverageMeter, ProgressMeter, StepTimer
from avion_tpu.core.train_state import TrainState
from avion_tpu.data.loader import DataLoader, device_prefetch
from avion_tpu.parallel import make_mesh, shard_params
from avion_tpu.parallel.mesh import mesh_from_config


@dataclass
class Run:
    cfg: TrainConfig
    mesh: Any
    state: TrainState
    tx: Any
    step: Callable
    ckpt: Checkpointer
    logger: MetricLogger
    start_epoch: int = 0
    # mid-epoch resume: batches of start_epoch already consumed before a
    # preemption checkpoint (wired to the loader's skip_batches)
    start_batch: int = 0
    # 1 = microbatch-major [update_freq, B/update_freq, ...] batches with
    # dim 1 mesh-sharded (cached gradient accumulation; optim.accum)
    batch_dim: int = 0


def setup_run(
    cfg: TrainConfig,
    params,
    tx,
    step_fn: Callable,
    *,
    state_extras: Optional[dict] = None,
    use_ema: bool = False,
) -> Run:
    mesh = mesh_from_config(cfg.mesh)
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        state = TrainState.create(params, tx, use_ema=use_ema)
    ckpt = Checkpointer(os.path.join(cfg.output_dir, "ckpt"))
    logger = MetricLogger(cfg.output_dir, cfg.wandb, cfg.wandb_project,
                          cfg.run_name, cfg.to_dict())

    start_epoch, start_batch = 0, 0
    if cfg.resume or cfg.auto_resume:
        restored, extra = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = (extra or {}).get("epoch", 0)
            start_batch = (extra or {}).get("batch_in_epoch", 0)
            print(f"[resume] restored step {int(state.step)} "
                  f"(epoch {start_epoch}"
                  + (f", batch {start_batch}" if start_batch else "") + ")")

    step = jax.jit(step_fn, donate_argnums=(0,))
    batch_dim = 1 if (cfg.optim.update_freq > 1
                      and getattr(cfg.optim, "accum", "") == "cached") else 0
    return Run(cfg, mesh, state, tx, step, ckpt, logger, start_epoch,
               start_batch, batch_dim)


def train_one_epoch(
    run: Run,
    loader,
    epoch: int,
    rng,
    extra_batch_fn: Optional[Callable] = None,
    niter_override: Optional[int] = None,
) -> Dict[str, float]:
    cfg = run.cfg
    meters = {
        "loss": AverageMeter("loss", ":.4f"),
    }
    timer = StepTimer()
    _echo_disp = max(1, getattr(cfg.data, "echo_factor", 1))
    n_batches = niter_override or (
        len(loader) * _echo_disp if hasattr(loader, "__len__") else 0)
    progress = ProgressMeter(
        n_batches,
        [timer.batch_time, timer.data_time, meters["loss"]],
        prefix=f"Epoch [{epoch}] ",
    )

    from avion_tpu.parallel.launch import preempted

    import time as _time

    import jax.numpy as jnp

    # batches of this epoch consumed before this process started (a
    # prior preemption); the loop counter i is relative to THIS process,
    # so a second preemption must checkpoint skipped + i
    echo = max(1, getattr(cfg.data, "echo_factor", 1))
    skipped = 0
    if run.start_batch and epoch == run.start_epoch \
            and hasattr(loader, "skip_batches"):
        # mid-epoch preemption resume: continue at the next batch of the
        # (deterministically re-seeded) epoch permutation instead of
        # replaying the whole epoch.  With data echoing the loader skip
        # rounds DOWN to the batch boundary (a partial echo group is
        # re-stepped; counters stay step-consistent).
        skipped = (run.start_batch // echo) * echo
        loader.skip_batches = skipped // echo
        run.start_batch = 0
        print(f"[resume] skipping {skipped} consumed steps "
              f"({loader.skip_batches} batches)")

    transform = extra_batch_fn
    if run.batch_dim == 1:
        # cached grad accumulation: reshape host batches microbatch-major
        # [M, B/M, ...] (after any entry transform) so dim 1 shards and
        # the step's scan needs no resharding
        m_acc = cfg.optim.update_freq

        def transform(host, _inner=extra_batch_fn, _m=m_acc):
            if _inner is not None:
                host = _inner(host)

            def rs(x):
                assert x.shape[0] % _m == 0, (
                    f"batch {x.shape[0]} not divisible by update_freq {_m}")
                return x.reshape(_m, x.shape[0] // _m, *x.shape[1:])

            return jax.tree_util.tree_map(rs, host)

    it = iter(device_prefetch(loader, run.mesh, depth=2,
                              transform=transform,
                              batch_dim=run.batch_dim))
    if echo > 1:
        from avion_tpu.data.loader import echo_batches

        it = echo_batches(it, echo)
    last_metrics: Dict[str, float] = {}
    # device-side running sums: the epoch summary averages EVERY step
    # (not the every-print_freq subsample the meters show) at zero sync
    # cost — the tiny adds chain onto the step's async dispatch
    msum, mcount = None, 0
    with jax.set_mesh(run.mesh):
        i = -1
        while True:
            t_fetch = _time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                break
            timer.data_time.update(_time.perf_counter() - t_fetch)
            i += 1
            if preempted() and (skipped + i) % echo == 0:
                # SIGTERM from the scheduler: checkpoint mid-epoch and
                # stop; auto-resume picks up at the next absolute batch
                # of this epoch (submitit-requeue elasticity,
                # run_with_submit_lavila_pretrain.py:53-59).  Under
                # data echoing the save waits for the echo-GROUP
                # boundary (at most echo-1 extra sub-second steps), so
                # the restored optimizer step count matches the resume
                # point exactly — no LR-schedule drift.
                save_epoch(run, epoch - 1, batch_in_epoch=skipped + i)
                run.ckpt.wait()
                break
            run.state, metrics = run.step(run.state, batch, rng)
            msum = metrics if msum is None else jax.tree_util.tree_map(
                jnp.add, msum, metrics)
            mcount += 1
            # fetch metrics to host only at print intervals: a host sync
            # every step would serialize dispatch (and costs a full
            # round-trip on remote-tunnel backends); in between, steps
            # chain device-side.  mark_window attributes the window's
            # wall-time to device steps using the per-step data waits.
            if i % cfg.print_freq == 0:
                loss = float(metrics["loss"])  # forces the chain
                timer.mark_window(min(i + 1, cfg.print_freq))
                meters["loss"].update(loss)
                for k, v in metrics.items():
                    if k == "loss":
                        continue
                    meters.setdefault(k, AverageMeter(k, ":.4f")).update(
                        float(v))
                progress.display(i)
                run.logger.log(
                    {"train/loss": loss, "train/epoch": epoch,
                     **{f"train/{k}": float(v) for k, v in metrics.items()
                        if k != "loss"},
                     **{f"perf/{k}": v for k, v in timer.stats().items()}},
                    step=int(run.state.step),
                )
            if niter_override and i + 1 >= niter_override:
                break
    if msum is not None:
        last_metrics = {k: float(v) / mcount for k, v in msum.items()}
    else:
        last_metrics = {k: m.avg for k, m in meters.items()}
    last_metrics.update(timer.stats())
    return last_metrics


def finish_if_preempted(run: Run, epoch: int, metrics: Optional[dict] = None,
                        ) -> bool:
    """Entry-loop guard, called right after ``train_one_epoch``.

    Returns True when a preemption signal fired, telling the entry to
    break its epoch loop instead of rolling into validation, the
    end-of-epoch save, and the next epoch (which would fetch a batch
    and re-save a conflicting checkpoint at the same step — orbax skips
    duplicate steps, but resume correctness must not hinge on that).

    If the signal fired *during* the epoch, ``train_one_epoch`` already
    wrote the exact mid-epoch checkpoint; if it fired at the epoch
    boundary (after the last batch, so the in-loop save never ran),
    save the boundary here so no completed work is replayed.  Mirrors
    the reference's requeue flow (checkpoint in ``Trainer.checkpoint``,
    ``run_with_submit_lavila_pretrain.py:53-59``).
    """
    from avion_tpu.parallel.launch import preempted

    if not preempted():
        return False
    run.ckpt.wait()
    latest = run.ckpt.latest_step()
    if latest is None or latest < int(run.state.step):
        save_epoch(run, epoch, metrics)
        run.ckpt.wait()
    return True


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.bool_, bool)):
        return bool(obj)
    if isinstance(obj, (np.integer, int)):
        return int(obj)
    if isinstance(obj, (np.floating, float)):
        return float(obj)
    return obj


def save_epoch(run: Run, epoch: int, metrics: Optional[dict] = None,
               is_best: bool = False, batch_in_epoch: int = 0):
    """``batch_in_epoch > 0`` marks a mid-epoch (preemption) checkpoint:
    resume re-enters epoch ``epoch + 1`` skipping that many batches."""
    extra = {"epoch": epoch + 1, "config": run.cfg.to_dict(),
             "metrics": metrics or {}, "is_best": is_best}
    if batch_in_epoch:
        extra["batch_in_epoch"] = int(batch_in_epoch)
    run.ckpt.save(int(run.state.step), run.state, extra=_jsonable(extra))
