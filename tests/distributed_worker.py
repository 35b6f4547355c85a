"""Worker process for the 2-process CPU `jax.distributed` rehearsal.

Launched by tests/test_distributed.py as `python distributed_worker.py
<process_id> <num_processes> <coordinator_port> <out_file>`. Each process
exposes 4 virtual CPU devices, joins a gloo-backed distributed runtime, and
participates in an 8-device GLOBAL mesh whose data axis spans both
processes — the exact topology a multi-host TPU pod presents, with gloo
standing in for DCN (SURVEY.md §2.7: "DCN enters only if multi-host").

What it rehearses, against the single-process reference:
  1. Frame-parallel stereo over a cross-process mesh: each process feeds
     its LOCAL 4 frames via `make_array_from_process_local_data`, the
     jitted pipeline runs under the global NamedSharding, and each
     process's local output shards must be BIT-equal to the corresponding
     frames of a single-device run (the naive fill path is bit-exact by
     construction, tests/test_sharding.py).
  2. A genuinely cross-process collective: the global mean of the stereo
     output — jit inserts the all-reduce over the data axis, which here
     rides gloo exactly where a pod would ride DCN.

Env/config notes: plain env vars are NOT enough on hosts whose site
customization registers an accelerator plugin programmatically (it
overrides JAX_PLATFORMS), so the platform is also forced through
jax.config — same trick as tests/conftest.py.
"""
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_file = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
        + " --xla_backend_optimization_level=0")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import comfystereo_tpu as cs
    from comfystereo_tpu.parallel import sharding
    from comfystereo_tpu.utils import fixtures

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_local == 4, f"local devices: {n_local}"
    assert n_global == 4 * nproc, f"global devices: {n_global}"

    # Deterministic 8-frame batch, shifted per frame so shards differ.
    h, w, b = 32, 64, n_global
    img = fixtures.create_test_image(h, w).astype(np.float32) / 255.0
    dep = fixtures.create_depth_map(h, w).astype(np.float32) / 255.0
    imgs = np.stack([np.roll(img, f, axis=1) for f in range(b)])
    deps = np.stack([np.roll(dep, f, axis=1) for f in range(b)])

    cfg = cs.StereoConfig(modes=("left-right",), fill_technique="naive")
    mesh = sharding.make_mesh(axes=("data",))
    sh = sharding.frame_sharding(mesh)
    lo, hi = pid * n_local, (pid + 1) * n_local
    gimg = jax.make_array_from_process_local_data(sh, imgs[lo:hi])
    gdep = jax.make_array_from_process_local_data(sh, deps[lo:hi])

    out = cs.stereo_pipeline(gimg, gdep, cfg)["stereo"][0]

    # 1. Local shards vs the single-device reference for the same frames.
    ref = np.asarray(cs.stereo_pipeline(
        jnp.asarray(imgs[lo:hi]), jnp.asarray(deps[lo:hi]), cfg)["stereo"][0])
    local = np.concatenate(
        [np.asarray(s.data) for s in sorted(
            out.addressable_shards, key=lambda s: s.index[0].start or 0)])
    np.testing.assert_array_equal(local, ref)

    # 2. Cross-process all-reduce: global mean must equal the full-batch
    # mean computed from the host-side arrays (f32 reduction order differs
    # between the sharded tree-reduce and numpy, hence the 1e-5 bound).
    gmean = float(jax.jit(jnp.mean)(out))
    full = np.asarray(cs.stereo_pipeline(
        jnp.asarray(imgs), jnp.asarray(deps), cfg)["stereo"][0])
    np.testing.assert_allclose(gmean, float(full.mean()), rtol=1e-5)

    with open(out_file, "w") as f:
        f.write("OK")


if __name__ == "__main__":
    main()
