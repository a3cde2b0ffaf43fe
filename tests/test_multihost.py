"""Multi-host wiring: per-host data sharding (DistributedSampler
semantics, ``avion/utils/distributed.py:75-97``), two-process
``jax.distributed`` end-to-end, and SIGTERM preemption checkpointing
(submitit requeue elasticity, ``run_with_submit_lavila_pretrain.py:
53-59``)."""

import json
import os
import os.path as osp
import signal
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


class _RangeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.array([i], np.int32)}


def _loader(n, bs, world, rank, **kw):
    from avion_tpu.data.loader import DataLoader

    return DataLoader(_RangeDS(n), bs, num_workers=0, seed=3,
                      process_index=rank, process_count=world,
                      shard_across_hosts=True, **kw)


def _indices(loader):
    return [b["x"][:, 0].tolist() for b in loader]


def test_host_shards_disjoint_and_complete():
    per_host = [_indices(_loader(32, 8, 2, r, shuffle=True)) for r in (0, 1)]
    flat = [sorted(i for b in h for i in b) for h in per_host]
    assert len(per_host[0]) == len(per_host[1]) == 4  # same #batches
    assert all(len(b) == 4 for h in per_host for b in h)  # local rows
    assert not (set(flat[0]) & set(flat[1]))
    assert sorted(flat[0] + flat[1]) == list(range(32))


def test_host_shards_same_permutation():
    # both hosts must shuffle with the same seed so slices are disjoint
    a0 = _indices(_loader(16, 4, 2, 0, shuffle=True))
    a0b = _indices(_loader(16, 4, 2, 0, shuffle=True))
    assert a0 == a0b


def test_uneven_dataset_pads_to_equal_batches():
    # n=10, world=2, drop_last=False: pad by wrap to 10 -> 5 rows each
    hosts = [_loader(10, 2, 2, r, shuffle=False, drop_last=False)
             for r in (0, 1)]
    assert len(hosts[0]) == len(hosts[1])
    i0, i1 = _indices(hosts[0]), _indices(hosts[1])
    assert len(i0) == len(i1) == len(hosts[0])
    seen = [i for b in i0 + i1 for i in b]
    assert set(seen) == set(range(10))


def test_drop_last_trims_to_multiple_of_world():
    # n=9, world=2, drop_last=True: trim to 8 -> 4 rows per host
    i0 = _indices(_loader(9, 4, 2, 0, shuffle=False))
    i1 = _indices(_loader(9, 4, 2, 1, shuffle=False))
    assert len(i0) == len(i1) == 2
    assert sorted(x for b in i0 + i1 for x in b) == list(range(8))


def test_single_process_unchanged():
    i = _indices(_loader(8, 4, 1, 0, shuffle=False))
    assert i == [[0, 1, 2, 3], [4, 5, 6, 7]]


_WORKER = textwrap.dedent("""
    import json, os, sys
    rank, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    import numpy as np
    from avion_tpu.data.loader import DataLoader
    from avion_tpu.parallel import make_mesh
    from avion_tpu.parallel.sharding import make_global_batch

    class DS:
        def __len__(self): return 16
        def __getitem__(self, i): return {"x": np.array([i], np.int32)}

    loader = DataLoader(DS(), 8, num_workers=0, shuffle=True, seed=11)
    assert loader.shard_across_hosts and loader.local_batch == 4
    mesh = make_mesh(data=4)  # 4 global devices, 2 per process
    local, gsums = [], []
    with jax.set_mesh(mesh):
        for batch in loader:
            local.append(batch["x"][:, 0].tolist())
            g = make_global_batch(mesh, batch)
            # global reduction over the assembled batch: identical on
            # both hosts iff assembly is consistent
            s = jax.jit(lambda b: (b["x"].sum(), b["x"].shape[0]))(g)
            gsums.append([int(s[0]), int(s[1])])
    json.dump({"local": local, "gsums": gsums}, open(out, "w"))
""")


def test_two_process_jax_distributed(tmp_path):
    """Real jax.distributed with 2 CPU processes: loader shards are
    disjoint per host and the assembled global batch is consistent."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    # env cleanup must happen pre-spawn: the axon sitecustomize
    # registers the TPU plugin at interpreter startup, before worker
    # code runs
    for var in ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = (osp.dirname(osp.dirname(osp.abspath(__file__)))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    outs = [str(tmp_path / f"out{r}.json") for r in (0, 1)]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(r), str(port), outs[r]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in (0, 1)]
    logs = [p.communicate(timeout=150)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    res = [json.load(open(o)) for o in outs]
    flat = [sorted(i for b in r["local"] for i in b) for r in res]
    assert not (set(flat[0]) & set(flat[1]))
    assert sorted(flat[0] + flat[1]) == list(range(16))
    # both hosts computed identical global sums over 8-row global batches
    assert res[0]["gsums"] == res[1]["gsums"]
    assert all(n == 8 for _, n in res[0]["gsums"])
    # and the global sum matches the union of both hosts' local rows
    for b0, b1, (gs, _) in zip(res[0]["local"], res[1]["local"],
                               res[0]["gsums"]):
        assert gs == sum(b0) + sum(b1)


def test_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-epoch -> loop checkpoints and exits cleanly; a fresh
    run auto-resumes (train/loop.py preempted() path)."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.config import TrainConfig
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel.launch import (_PREEMPTED,
                                           install_preemption_handler,
                                           preempted)
    from avion_tpu.train.loop import setup_run, train_one_epoch

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            rs = np.random.RandomState(i)
            return {"video": rs.rand(2, 16, 16, 3).astype(np.float32),
                    "text": rs.randint(0, 64, (8,)).astype(np.int32)}

    from avion_tpu.data.loader import DataLoader
    from avion_tpu.models.clip import CLIP
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(embed_dim=16, image_size=16, patch_size=8, num_frames=2,
                 vision_width=32, vision_layers=1, vision_heads=2,
                 context_length=8, vocab_size=64, text_width=32,
                 text_heads=2, text_layers=1, use_flash=False,
                 dtype=jnp.float32)

    def init_params():
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 2, 16, 16, 3)),
                          jnp.zeros((2, 8), jnp.int32))["params"]

    params = init_params()
    cfg = TrainConfig()
    cfg.output_dir = str(tmp_path / "run")
    cfg.print_freq = 1
    cfg.mesh.data = 8
    cfg.optim.epochs = 1
    tx, _ = build_optimizer(cfg.optim, params, niter_per_ep=8)
    run = setup_run(cfg, params, tx, make_clip_train_step(model, tx))
    loader = DataLoader(DS(), 8, num_workers=0, shuffle=False)

    install_preemption_handler()
    assert not preempted()
    n_seen = {"n": 0}

    def poke(batch):
        n_seen["n"] += 1
        if n_seen["n"] == 3:
            os.kill(os.getpid(), signal.SIGTERM)
        return batch

    try:
        train_one_epoch(run, loader, 0, jax.random.PRNGKey(1),
                        extra_batch_fn=poke)
        assert preempted()
        # well fewer than the 8 batches of the epoch ran
        assert n_seen["n"] < 8
        run.ckpt.wait()
        assert os.listdir(osp.join(cfg.output_dir, "ckpt"))
        # auto-resume picks the checkpoint back up (fresh params, as
        # a requeued process would build them)
        run2 = setup_run(cfg, init_params(), tx,
                         make_clip_train_step(model, tx))
        assert int(run2.state.step) >= 1
    finally:
        _PREEMPTED["flag"] = False
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_midepoch_resume_continues_at_next_batch(tmp_path):
    """A preemption checkpoint records the in-epoch batch index; resume
    re-enters the same epoch at the NEXT batch with the same
    (deterministically re-seeded) sample order instead of replaying the
    epoch from batch 0 (VERDICT r2 weak #6)."""
    import jax
    import jax.numpy as jnp
    import optax

    from avion_tpu.core.config import TrainConfig
    from avion_tpu.data.loader import DataLoader
    from avion_tpu.train.loop import save_epoch, setup_run, train_one_epoch

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    def fake_step(state, batch, rng):
        return (state.replace(step=state.step + 1),
                {"loss": jnp.mean(batch["x"])})

    params = {"w": np.zeros((4,), np.float32)}
    tx = optax.sgd(1e-2)
    cfg = TrainConfig()
    cfg.output_dir = str(tmp_path / "run")
    cfg.mesh.data = 8
    cfg.print_freq = 100

    run = setup_run(cfg, params, tx, fake_step)
    # pretend the run was preempted in epoch 0 after consuming 3 batches
    save_epoch(run, -1, batch_in_epoch=3)
    run.ckpt.wait()

    run2 = setup_run(cfg, params, tx, fake_step)
    assert run2.start_epoch == 0 and run2.start_batch == 3

    loader = DataLoader(DS(), 8, shuffle=True, drop_last=True,
                        num_workers=0, seed=7)
    seen = []

    def record(batch):
        seen.append(np.asarray(batch["x"])[:, 0].astype(int).tolist())
        return batch

    loader.set_epoch(run2.start_epoch)
    train_one_epoch(run2, loader, run2.start_epoch, jax.random.PRNGKey(0),
                    extra_batch_fn=record)
    # expected continuation: the epoch-0 permutation minus its first 3
    # batches, in order
    order = np.arange(32)
    np.random.RandomState(7 + 0).shuffle(order)
    expect = [order[b : b + 8].tolist() for b in range(3 * 8, 32, 8)]
    assert seen == expect, (seen, expect)
    run2.ckpt.wait()


def test_double_preemption_checkpoints_absolute_batch(tmp_path):
    """A SECOND preemption inside an already-mid-epoch-resumed epoch
    must checkpoint the ABSOLUTE in-epoch batch index (skipped + i),
    not the loop-relative one — otherwise the next resume replays the
    batches between the two preemption points."""
    import jax
    import jax.numpy as jnp
    import optax

    from avion_tpu.core.config import TrainConfig
    from avion_tpu.data.loader import DataLoader
    from avion_tpu.parallel.launch import _PREEMPTED
    from avion_tpu.train.loop import save_epoch, setup_run, train_one_epoch

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    def fake_step(state, batch, rng):
        return (state.replace(step=state.step + 1),
                {"loss": jnp.mean(batch["x"])})

    params = {"w": np.zeros((4,), np.float32)}
    tx = optax.sgd(1e-2)
    cfg = TrainConfig()
    cfg.output_dir = str(tmp_path / "run")
    cfg.mesh.data = 8
    cfg.print_freq = 100

    run = setup_run(cfg, params, tx, fake_step)
    save_epoch(run, -1, batch_in_epoch=3)  # first preemption at batch 3
    run.ckpt.wait()

    run2 = setup_run(cfg, params, tx, fake_step)
    assert run2.start_batch == 3
    loader = DataLoader(DS(), 8, shuffle=True, drop_last=True,
                        num_workers=0, seed=7)
    loader.set_epoch(0)
    n = {"n": 0}

    def poke(batch):
        # counts FETCHES (device_prefetch runs depth=2 ahead of steps):
        # fill fetches 2, the first loop step fetches one more, the
        # second fetch after that (n==4) fires the flag -> the loop
        # sees preempted() at i=1, after one completed step
        n["n"] += 1
        if n["n"] == 4:
            _PREEMPTED["flag"] = True
        return batch

    try:
        train_one_epoch(run2, loader, 0, jax.random.PRNGKey(0),
                        extra_batch_fn=poke)
        run2.ckpt.wait()
    finally:
        _PREEMPTED["flag"] = False

    run3 = setup_run(cfg, params, tx, fake_step)
    # absolute progress = 3 skipped + steps completed this process
    # (exact step count depends on prefetch fill timing; the state's
    # step counter is the ground truth).  The pre-fix code checkpointed
    # the loop-relative index, i.e. start_batch would equal the step
    # count alone.
    steps_done = int(run3.state.step)
    assert steps_done >= 1
    assert run3.start_epoch == 0 and run3.start_batch == 3 + steps_done, (
        run3.start_batch, steps_done)
    run.ckpt.wait()
    run2.ckpt.wait()
    run3.ckpt.wait()


def test_compile_cache_keyed_by_host_cpu(tmp_path, monkeypatch):
    """The persistent XLA cache must be per-CPU-fingerprint: AOT CPU
    executables from a different host's ISA SIGILL/abort when executed
    (pool reschedules land jobs on hosts with different feature sets)."""
    import jax

    from avion_tpu.parallel.launch import (_host_cpu_fingerprint,
                                           enable_compile_cache)

    fp = _host_cpu_fingerprint()
    assert fp and "/" not in fp
    assert fp == _host_cpu_fingerprint()  # stable within a host

    base = str(tmp_path / "xla_cache")
    monkeypatch.setenv("AVION_COMPILE_CACHE", base)
    # pretend we're on the TPU backend (the test env pins cpu)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    old = jax.config.jax_compilation_cache_dir
    try:
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / "xla_cache" / fp)
        import os
        assert os.path.isdir(jax.config.jax_compilation_cache_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_compile_cache_disabled_on_cpu_backend(tmp_path, monkeypatch):
    """Regression: the persistent cache must NOT enable on the CPU
    backend — XLA:CPU AOT deserialization is brittle (an executable
    persisted by one process SIGABRTed the next process that reloaded
    it: shard_map+donation programs on the 8-device virtual mesh), and
    the entry tests were poisoning the cache the later grad-accum tests
    then crashed on."""
    import jax

    from avion_tpu.parallel.launch import (_cpu_backend_selected,
                                           enable_compile_cache)

    # the pytest env pins JAX_PLATFORMS=cpu (conftest)
    assert _cpu_backend_selected()
    monkeypatch.setenv("AVION_COMPILE_CACHE", str(tmp_path / "xla_cache"))
    old = jax.config.jax_compilation_cache_dir
    try:
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == old  # untouched
        import os

        assert not os.path.isdir(str(tmp_path / "xla_cache"))
    finally:
        jax.config.update("jax_compilation_cache_dir", old)

    monkeypatch.setenv("JAX_PLATFORMS", "tpu,cpu")
    assert not _cpu_backend_selected()  # first platform wins


def test_finish_if_preempted_guards_entry_loop(tmp_path):
    """After a preempted epoch the entry loop must stop WITHOUT writing
    a second (conflicting) checkpoint at the same step — and a signal
    landing exactly at the epoch boundary (after the last batch, so the
    in-loop save never ran) must still produce a boundary checkpoint."""
    import jax.numpy as jnp
    import optax

    from avion_tpu.core.config import TrainConfig
    from avion_tpu.data.loader import DataLoader
    from avion_tpu.parallel.launch import _PREEMPTED
    from avion_tpu.train.loop import (
        finish_if_preempted,
        setup_run,
        train_one_epoch,
    )

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    def fake_step(state, batch, rng):
        return (state.replace(step=state.step + 1),
                {"loss": jnp.mean(batch["x"])})

    params = {"w": np.zeros((4,), np.float32)}
    tx = optax.sgd(1e-2)
    cfg = TrainConfig()
    cfg.output_dir = str(tmp_path / "run")
    cfg.auto_resume = False
    run = setup_run(cfg, params, tx, fake_step)
    run.step = fake_step  # skip jit for the fake step
    loader = DataLoader(DS(), 8, num_workers=0, shuffle=False)

    # mid-epoch preemption: flag flips after the 2nd processed step ->
    # in-loop save (flipping in a transform would race the prefetch
    # thread, which runs ahead of the step loop)
    n = {"n": 0}

    def fake_step_poke(state, batch, rng):
        n["n"] += 1
        if n["n"] == 2:
            _PREEMPTED["flag"] = True
        return fake_step(state, batch, rng)

    run.step = fake_step_poke
    try:
        metrics = train_one_epoch(run, loader, 0, None)
        run.ckpt.wait()
        step_after = int(run.state.step)
        saved = run.ckpt.latest_step()
        assert saved == step_after  # in-loop mid-epoch save
        _, extra = run.ckpt.restore(run.state, step=saved)
        assert extra.get("batch_in_epoch")  # mid-epoch marker intact
        assert finish_if_preempted(run, 0, metrics)  # entry must break
        run.ckpt.wait()
        # no second save happened: same step, mid-epoch extra preserved
        assert run.ckpt.latest_step() == saved
        _, extra2 = run.ckpt.restore(run.state, step=saved)
        assert extra2.get("batch_in_epoch") == extra.get("batch_in_epoch")
        assert extra2.get("epoch") == extra.get("epoch")
    finally:
        _PREEMPTED["flag"] = False

    # boundary preemption: epoch completes, THEN the flag flips ->
    # finish_if_preempted writes the missing boundary checkpoint
    run.step = fake_step
    try:
        metrics = train_one_epoch(run, loader, 1, None)
        _PREEMPTED["flag"] = True
        step_after = int(run.state.step)
        assert run.ckpt.latest_step() < step_after
        assert finish_if_preempted(run, 1, metrics)
        run.ckpt.wait()
        assert run.ckpt.latest_step() == step_after
        _, extra = run.ckpt.restore(run.state, step=step_after)
        assert extra.get("epoch") == 2  # clean boundary: resume at next
        assert not extra.get("batch_in_epoch")
    finally:
        _PREEMPTED["flag"] = False
        run.ckpt.close()
