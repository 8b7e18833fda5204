#!/usr/bin/env python
"""Real multi-process training smoke: 2 processes x 4 virtual CPU devices.

The reference operates as a torchrun multi-process job (README.md:84-97,
load_data.py:86).  This script exercises the repo's equivalent runtime FOR
REAL -- ``jax.distributed.initialize`` over gloo collectives, the per-host
loader shard, ``make_array_from_process_local_data`` in ``shard_batch``
(parallel/mesh.py), cross-process grad psums inside the jitted train step,
and the rank-0 checkpoint + ``sync_global_devices`` barrier -- in TWO phases:

  A. fresh 2-step run that saves a collective Orbax checkpoint at step 2 and
     must match an in-process single-device replica of the same steps;
  B. both processes are gone (phase A's interpreters exited); NEW processes
     relaunch with ``resume_from`` pointing at phase A's checkpoint, restore
     params/EMA/optimizer state via Orbax, train 2 MORE steps, and must match
     an UNINTERRUPTED single-device 4-step run.

Phase B is the save->kill->relaunch->restore->continue cycle (the reference's
restart contract, train.py:137-151, upgraded with optimizer-state fidelity).

Run:  python tools/run_multiprocess_smoke.py           (launcher)
      python tools/run_multiprocess_smoke.py --worker I --phase a|b ...

The launcher exits 0 iff all four workers completed and printed parity lines.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import tempfile

STEPS_A = 2
STEPS_B = 4  # total steps after the resumed phase
GLOBAL_BATCH = 8
NUM_PROC = 2


def _cfg(results_dir: str, **over):
    from diffma_tpu.utils.config import Config

    cfg = Config(
        {
            "epochs": 1,
            "log_every": 1,
            "ckpt_every": STEPS_A,  # exercises the collective save + barrier
            "accumulation_steps": 1,
            "lr": 1e-4,
            "results_dir": results_dir,
            "model": "DiffMa-S/2",
            "image_size": 64,  # 8x8 latents, 16 tokens
            "global_batch_size": GLOBAL_BATCH,
            "global_seed": 0,
            "dt_rank": 16,
            "d_state": 4,
            "synthetic_data": True,
            "synthetic_dataset_size": 32,
            "max_steps": STEPS_A,
        }
    )
    cfg.update(over)
    return cfg


def _replica(cfg, steps: int):
    """Single-device replica of ``steps`` uninterrupted train.main steps.

    main's rng stream: PRNGKey(seed) -> split(init) -> per step
    split(rng, 3) -> (enc, step).  Every process draws the SAME synthetic
    host batch, so the global batch is the host batch tiled NUM_PROC x.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.train.state import TrainState, make_train_step
    from diffma_tpu.train.train import make_loss_fn, synthetic_batch

    latent = cfg.image_size // 8
    model = build_model(
        str(cfg.model), input_size=latent, dt_rank=16,
        d_state=int(cfg.d_state), scan_impl="auto",
    )
    tokens = (latent // model.patch_size) ** 2
    host_batch = GLOBAL_BATCH // NUM_PROC

    rng = jax.random.PRNGKey(int(cfg.global_seed))
    rng, init_rng = jax.random.split(rng)
    dummy = synthetic_batch(jax.random.PRNGKey(0), 2, latent, tokens)
    params = model.init(
        init_rng, dummy["z"], jnp.zeros((2,), jnp.int32), dummy["y"],
        dummy["y2"], dummy["w"],
    )["params"]
    optimizer = optax.adamw(float(cfg.lr), b1=0.9, b2=0.999, weight_decay=0.0)
    replica = TrainState.create(params, optimizer)
    step_fn = jax.jit(make_train_step(
        make_loss_fn(model, create_diffusion("")), optimizer,
    ))
    for _ in range(steps):
        rng, enc_rng, step_rng = jax.random.split(rng, 3)
        b = synthetic_batch(enc_rng, host_batch, latent, tokens)
        batch = jax.tree.map(
            lambda a: jnp.concatenate([a] * NUM_PROC, axis=0), b
        )
        replica, _metrics = step_fn(replica, batch, step_rng)
    return replica


def _max_err(a, b):
    import jax
    import jax.numpy as jnp

    errs = jax.tree.map(
        lambda x, y: float(
            jnp.abs(jnp.asarray(jax.device_get(x)) - jax.device_get(y)).max()
        ),
        a, b,
    )
    return max(jax.tree.leaves(errs))


def worker(idx: int, phase: str, results_dir: str, ckpt_dir: str | None) -> None:
    # env (JAX_PLATFORMS/XLA_FLAGS/DIFFMA_*) is set by the launcher BEFORE
    # interpreter start; train.main's _maybe_distributed does the
    # jax.distributed.initialize itself -- the path under test.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from diffma_tpu.train import train as train_mod

    if phase == "a":
        cfg = _cfg(results_dir)
        state = train_mod.main(cfg)
        assert jax.process_count() == NUM_PROC, jax.process_count()
        assert int(state.step) == STEPS_A
        max_err = _max_err(state.params, _replica(cfg, STEPS_A).params)
        assert max_err < 1e-5, f"multi-process != single-device: {max_err}"
        if idx == 0:
            ckpts = [p for _, _, fs in os.walk(results_dir) for p in fs]
            assert ckpts, "rank 0 should have checkpointed at step 2"
        print(f"MULTIPROC PARITY OK rank={idx} "
              f"procs={jax.process_count()} max_param_err={max_err:.2e}",
              flush=True)
        return

    # ---- phase b: fresh processes restore the phase-A checkpoint ---------
    assert ckpt_dir, "phase b needs --ckpt"
    cfg = _cfg(
        results_dir, resume_from=ckpt_dir, max_steps=STEPS_B,
        ckpt_every=10**9,
    )
    state = train_mod.main(cfg)
    assert jax.process_count() == NUM_PROC, jax.process_count()
    assert int(state.step) == STEPS_B, int(state.step)

    full = _replica(cfg, STEPS_B)  # uninterrupted 4-step ground truth
    p_err = _max_err(state.params, full.params)
    e_err = _max_err(state.ema_params, full.ema_params)
    assert p_err < 1e-5, f"resumed params != uninterrupted run: {p_err}"
    assert e_err < 1e-5, f"resumed EMA != uninterrupted run: {e_err}"
    print(f"MULTIPROC RESUME PARITY OK rank={idx} "
          f"max_param_err={p_err:.2e} max_ema_err={e_err:.2e}", flush=True)


def _spawn(phase: str, port: int, tmp: str, ckpt: str | None):
    procs = []
    for i in range(NUM_PROC):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=4"
            ).strip(),
            DIFFMA_NUM_PROCESSES=str(NUM_PROC),
            DIFFMA_PROCESS_ID=str(i),
            DIFFMA_COORDINATOR=f"localhost:{port}",
        )
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(i),
               "--phase", phase, "--dir", tmp]
        if ckpt:
            cmd += ["--ckpt", ckpt]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    return procs


def _await(procs, marker: str) -> bool:
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0 or marker not in out:
            ok = False
            print(f"--- worker {i} FAILED (rc={p.returncode}) ---")
            print(out[-4000:])
        else:
            print(out.strip().splitlines()[-1])
    return ok


def launch() -> int:
    tmp = tempfile.mkdtemp(prefix="diffma_mp_")
    ok = _await(_spawn("a", 12377, tmp, None), "MULTIPROC PARITY OK")
    if ok:
        # phase A's interpreters have exited (the "kill"); find its ckpt
        ckpt_dirs = glob.glob(os.path.join(tmp, "*", "checkpoints"))
        assert len(ckpt_dirs) == 1, ckpt_dirs
        ok = _await(
            _spawn("b", 12378, tmp, ckpt_dirs[0]),
            "MULTIPROC RESUME PARITY OK",
        )
    print("multi-process smoke:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--phase", type=str, default="a", choices=("a", "b"))
    ap.add_argument("--dir", type=str, default=None)
    ap.add_argument("--ckpt", type=str, default=None)
    args = ap.parse_args()
    if args.worker is None:
        return launch()
    worker(args.worker, args.phase, args.dir, args.ckpt)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
