#!/usr/bin/env python
"""Executed multi-host (DCN tier) demo: 2 real `jax.distributed` processes.

The reference has no distributed execution of any kind (SURVEY.md §2.3);
this repo's DCN design (parallel/multihost.py) shards WORK — whole clips —
across host groups, with zero cross-host collectives: each process builds a
mesh over its LOCAL devices and runs its own pipeline instance on a
disjoint, deterministic slice of the clip list (round-robin, mirroring how
the reference CLI loops independent videos, run_video.py:550-585).

Worker mode (spawned by the launcher or by a real pod runtime):
    python scripts/multihost_demo.py --worker PID NPROCS COORD OUTDIR

Launcher mode (the MULTIHOST artifact / slow-test path):
    python scripts/multihost_demo.py [OUTDIR]
spawns 2 CPU workers (2 virtual devices each -> per-host dp=2 mesh),
waits for both, then verifies:
  - the union of processed clip ids is the full list, pairwise disjoint
  - every output is finite and correctly shaped
  - a single-process rerun of one clip matches the multi-host output
    bit-for-bit (clip-level sharding cannot change numerics)
Prints one JSON line {"ok": true, ...} on success.
"""

import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = 5
N_FRAMES = 12
H, W = 64, 48


def _build_pipeline():
    """Pipeline over a dp mesh of THIS process's local devices.

    Both the multi-host workers and the single-process numerics check build
    the same dp=2 local mesh (2 forced virtual devices), so the cross-check
    isolates exactly one variable — whether the clip ran under
    jax.distributed — and can assert bit-identical outputs."""
    import jax
    import jax.numpy as jnp

    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
    from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
    from rollingdepth_tpu.parallel.multihost import local_mesh
    from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline
    from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

    unet = UNet2DCondition(UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
    ))
    vae = AutoencoderKL(VAEConfig.tiny())
    mesh = local_mesh((len(jax.local_devices()), 1))
    return RollingDepthPipeline(
        unet, unet.init(jax.random.PRNGKey(0)),
        vae, vae.init(jax.random.PRNGKey(1)),
        DDIMScheduler(DDIMConfig(beta_schedule="scaled_linear",
                                 timestep_spacing="trailing")),
        jnp.zeros((1, 2, 16), jnp.float32),
        dtype=jnp.float32, snippet_batch=2, vae_batch=4, mesh=mesh,
    )


def _clip(i):
    import numpy as np

    return (np.random.RandomState(100 + i).rand(N_FRAMES, 3, H, W) * 255).astype(
        np.uint8
    )


def _run_clips(pipe, ids, outdir, tag):
    import numpy as np

    from rollingdepth_tpu.pipelines.rollingdepth import _upload

    for i in ids:
        out = pipe.forward(
            _upload(_clip(i)), dilations=[1, 2], cap_dilation=True,
            refine_step=0, seed=0, max_vae_bs=4, fetch_output=False,
        )
        depth = pipe.fetch_depth(out.depth_pred)
        assert np.isfinite(depth).all()
        np.save(os.path.join(outdir, f"clip{i}_{tag}.npy"), depth)


def _force_cpu2():
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def worker(pid, nprocs, coord, outdir):
    _force_cpu2()
    import jax

    from rollingdepth_tpu.parallel.multihost import (
        initialize_distributed,
        is_primary_host,
        shard_work,
    )

    initialize_distributed(coord, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    mine = shard_work(list(range(N_CLIPS)))
    pipe = _build_pipeline()
    _run_clips(pipe, mine, outdir, f"host{pid}")
    with open(os.path.join(outdir, f"host{pid}.json"), "w") as f:
        json.dump({
            "process_id": pid,
            "clips": mine,
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices()),
            "primary": is_primary_host(),
        }, f)


def single_check(clip_ids, outdir):
    """Single-process rerun of the given clips on the SAME dp=2 local mesh
    (no jax.distributed) — the numerics side of the launcher's assertion."""
    _force_cpu2()
    pipe = _build_pipeline()
    _run_clips(pipe, clip_ids, outdir, "single")


def launcher(outdir):
    os.makedirs(outdir, exist_ok=True)
    with socket.socket() as s:  # free port for the coordination service
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), "2", coord, outdir],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    assert rcs == [0, 0], f"worker exit codes {rcs}"

    import numpy as np

    manifests = [json.load(open(os.path.join(outdir, f"host{p}.json"))) for p in (0, 1)]
    sets = [set(m["clips"]) for m in manifests]
    assert sets[0] | sets[1] == set(range(N_CLIPS)), sets
    assert not (sets[0] & sets[1]), sets
    assert all(m["global_devices"] == 4 and m["local_devices"] == 2 for m in manifests)
    assert manifests[0]["primary"] and not manifests[1]["primary"]

    # clip-level sharding must not change numerics: recompute one clip from
    # each host in a single (non-distributed) process on the identical dp=2
    # local mesh, and compare bit-for-bit.  Run as a subprocess so the
    # launcher's own jax state (device count, platform) can't leak in.
    check_ids = [m["clips"][0] for m in manifests]
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single", outdir]
        + [str(i) for i in check_ids],
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    ).returncode
    assert rc == 0, f"single-check exit code {rc}"
    checked = []
    for pid, i in enumerate(check_ids):
        multi = np.load(os.path.join(outdir, f"clip{i}_host{pid}.npy"))
        single = np.load(os.path.join(outdir, f"clip{i}_single.npy"))
        err = float(np.abs(multi - single).max())
        assert multi.shape == (N_FRAMES, 1, H, W), multi.shape
        assert err == 0.0, err
        checked.append({"clip": i, "host": pid, "max_err_vs_single": err})

    result = {
        "ok": True,
        "n_processes": 2,
        "clips_per_host": [sorted(s) for s in sets],
        "numerics_check": checked,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
               sys.argv[i + 3], sys.argv[i + 4])
    elif "--single" in sys.argv:
        i = sys.argv.index("--single")
        single_check([int(x) for x in sys.argv[i + 2 :]], sys.argv[i + 1])
    else:
        launcher(sys.argv[1] if len(sys.argv) > 1 else "/tmp/multihost_demo")
