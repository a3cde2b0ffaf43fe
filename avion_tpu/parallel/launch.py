"""Multi-host launch + elasticity utilities.

TPU-native replacement for the reference's launch stack (torchrun env
parsing + SLURM detection in ``avion/utils/distributed.py:75-97`` and
submitit preemption/requeue in ``scripts/run_with_submit_*.py``):

- ``init_distributed``: initializes ``jax.distributed`` from the
  environment. On Cloud TPU pods this is fully automatic (each host
  runs the same command); under SLURM the coordinator is derived from
  the nodelist; explicit coordinator/num_processes also supported.
- ``install_preemption_handler``: SIGTERM/SIGUSR1 → flag checked by the
  train loop to checkpoint and exit 0; paired with auto-resume this
  gives submitit-style requeue elasticity on preemptible TPUs.
- ``scripts/launch_tpu_pod.sh`` fans the command out to all pod workers
  (the torchrun/sbatch analogue).
"""

from __future__ import annotations

import os
import signal
import subprocess
from typing import Optional

_PREEMPTED = {"flag": False}


def preempted() -> bool:
    return _PREEMPTED["flag"]


def install_preemption_handler(signals=(signal.SIGTERM, signal.SIGUSR1)):
    def handler(signum, frame):
        print(f"[launch] received signal {signum}; will checkpoint and exit")
        _PREEMPTED["flag"] = True

    for s in signals:
        signal.signal(s, handler)


def _slurm_coordinator() -> Optional[str]:
    nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
    if not nodelist:
        return None
    try:
        first = subprocess.run(
            ["scontrol", "show", "hostnames", nodelist],
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()[0]
        return f"{first}:8476"
    except Exception:
        return None


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed; returns process_index.  No-op for
    single-process runs (the reference's single-GPU fallback,
    ``distributed.py:83-86``)."""
    import jax

    if coordinator_address is None and "AVION_COORDINATOR" in os.environ:
        # generic launcher (the torchrun-env analogue,
        # avion/utils/distributed.py:76-83)
        coordinator_address = os.environ["AVION_COORDINATOR"]
        num_processes = num_processes or int(
            os.environ.get("AVION_NUM_PROCESSES", 1))
        process_id = process_id if process_id is not None else int(
            os.environ.get("AVION_PROCESS_ID", 0))
    if coordinator_address is None and "SLURM_PROCID" in os.environ:
        coordinator_address = _slurm_coordinator()
        num_processes = num_processes or int(os.environ.get("SLURM_NTASKS", 1))
        process_id = process_id if process_id is not None else int(
            os.environ["SLURM_PROCID"])

    tpu_hosts = [h for h in
                 (os.environ.get("TPU_WORKER_HOSTNAMES") or "").split(",") if h]
    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif len(tpu_hosts) > 1 or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            # TPU pod: autodetected.  A single-entry hostname list is a
            # single-host run — skip (some images export
            # TPU_WORKER_HOSTNAMES=localhost unconditionally).
            jax.distributed.initialize()
    except Exception as e:
        print(f"[launch] jax.distributed not initialized ({e}); "
              f"running single-process")
    return jax.process_index()


def seed_for_host(base_seed: int) -> int:
    """Per-host data seed (the reference seeds per rank,
    ``distributed.py:9-12``); model init stays host-independent."""
    import jax

    return base_seed + jax.process_index()


def setup_host(base_seed: int = 0) -> int:
    """Standard multi-host bring-up, called first thing by every train
    entry (before any other jax use): initialize ``jax.distributed``
    when launched on a pod/SLURM (no-op single-process), install the
    SIGTERM/SIGUSR1 preemption handler, and decorrelate host-side data
    augmentation RNG per process (the reference seeds per rank,
    ``avion/utils/distributed.py:9-12``).  Model init and train-step
    PRNG keys stay host-independent — under multi-controller jax every
    process must build the identical program.

    Returns this host's process index."""
    import numpy as np

    pidx = init_distributed()
    install_preemption_handler()
    enable_compile_cache()
    np.random.seed(seed_for_host(base_seed) % (2 ** 31))
    return pidx


def _host_cpu_fingerprint() -> str:
    """Short hash of this host's CPU feature flags.

    XLA:CPU caches AOT executables specialized to the compile machine's
    ISA extensions; when a job migrates to a host with a different
    feature set (pool reschedule, new container host), loading those
    artifacts SIGILL/aborts at execution (cpu_aot_loader only warns).
    Keying the cache directory by the feature flags gives every distinct
    host CPU its own cache instead."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine() or "unknown"


def _cpu_backend_selected() -> bool:
    """True when jax is explicitly pinned to the CPU backend (via the
    ``JAX_PLATFORMS`` env var or ``jax.config``) — the virtual-mesh
    test/dryrun configuration."""
    import os

    import jax

    sel = os.environ.get("JAX_PLATFORMS", "")
    if not sel:
        try:
            sel = jax.config.jax_platforms or ""
        except Exception:
            sel = ""
    return sel.split(",")[0].strip().lower() == "cpu"


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: restarts (auto-resume after
    preemption, serving redeploys, repeated eval sweeps) skip the
    20-40 s first-compile.  Default location
    ``~/.cache/avion_tpu_xla/<cpu-fingerprint>`` (see
    :func:`_host_cpu_fingerprint`); override the base with
    ``AVION_COMPILE_CACHE`` (empty string disables).

    Never enabled for the CPU backend: XLA:CPU AOT deserialization is
    brittle — an executable persisted by one process can SIGABRT the
    next process that reloads it (reproduced with shard_map + donation
    programs on the forced-host-device mesh), and CPU compiles are not
    the 20-40 s the cache exists to save anyway."""
    import os

    import jax

    if _cpu_backend_selected():
        return
    path = path if path is not None else os.environ.get(
        "AVION_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "avion_tpu_xla"))
    if not path:
        return
    path = os.path.join(path, _host_cpu_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[launch] compile cache disabled: {e}")
