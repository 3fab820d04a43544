"""Worker process for the 2-process jax.distributed bring-up test.

Run as: python tests/multihost_worker.py <coordinator_port> <process_id>

Exercises the multi-host path the reference covers with its rendezvous
env-var dance (ref: tools/train.py:77-91): initialize_distributed ->
global mesh over both processes' CPU devices -> host_batch_slice data
split -> ONE real diffusion train step with the batch assembled via
``jax.make_array_from_process_local_data`` (the SPMD replacement for
DistributedSampler + DDP grad hooks).  Prints ``MULTIHOST OK`` with the
(replicated, therefore identical-across-processes) loss on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the full test suite runs this worker under
# heavy CPU contention; warm runs must not re-pay the train-step compile
jax.config.update("jax_compilation_cache_dir", "/tmp/advshadow_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])

    from advshadow_tpu.parallel import initialize_distributed

    # shutdown_timeout_seconds: the default 300 s exit barrier is shorter
    # than the cold-compile skew between two workers time-sharing one CPU
    # core (the faster worker exits, the barrier expires, and the
    # coordination service FATALs the slower worker mid-compile — which
    # also prevents the persistent cache from ever warming)
    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid,
                           shutdown_timeout_seconds=1800,
                           heartbeat_timeout_seconds=600)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    n_global = len(jax.devices())
    assert n_global == 4, n_global  # 2 procs x 2 local CPU devices

    import jax.numpy as jnp
    import numpy as np

    from advshadow_tpu.core import make_diffusion
    from advshadow_tpu.models import make_network
    from advshadow_tpu.parallel import data_sharding, host_batch_slice, \
        make_mesh, replicate
    from advshadow_tpu.train import TrainConfig, create_train_state, \
        make_train_step

    mesh = make_mesh()  # (data=4, model=1) over the global device set
    assert dict(mesh.shape) == {"data": 4, "model": 1}

    global_batch, size = 8, 8
    sl = host_batch_slice(global_batch)
    assert sl.stop - sl.start == 4  # per-host half of the global batch

    # per-host data, globally assembled — replaces DistributedSampler
    rs = np.random.RandomState(0)  # same stream; each host takes its slice
    images = rs.rand(global_batch, size, size, 3).astype(np.float32) * 2 - 1
    labels = (np.arange(global_batch) % 2).astype(np.int32)
    x_local, y_local = images[sl], labels[sl]
    x = jax.make_array_from_process_local_data(
        data_sharding(mesh, 4), x_local, images.shape)
    y = jax.make_array_from_process_local_data(
        data_sharding(mesh, 1), y_local, labels.shape)

    model = make_network("unet", num_classes=2, act="silu",
                         channel=(4, 8, 16, 32, 64, 128))
    config = TrainConfig(lr=1e-3, optim="adamw", lr_func="linear", epochs=1,
                         steps_per_epoch=1, conditional=True)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng,
                               jnp.zeros((global_batch, size, size, 3)),
                               config, labels=jnp.zeros((global_batch,),
                                                        jnp.int32))
    state = replicate(state, mesh)
    coeffs = make_diffusion(100, "linear")
    step_fn = make_train_step(coeffs, config)

    # AOT-compile locally (XLA CPU compile is process-local), then align
    # both processes at a coordination-service barrier — which takes an
    # explicit timeout — before the first collective executes: Gloo's
    # transport context-init has a hard 30 s deadline, and on a host
    # where the two workers time-share one core the cold compile skew
    # alone exceeds it (observed: GetKeyValue() timed out,
    # cpu:gloo/0,1,2048,2049/2).
    key = jax.random.PRNGKey(1)
    compiled = step_fn.lower(state, x, y, key).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        "advshadow_step_align", timeout_in_ms=1_500_000)
    state, metrics = compiled(state, x, y, key)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"MULTIHOST OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
