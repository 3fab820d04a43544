"""Profile the bench generate phase on the TPU and print top HLO ops.

Captures a jax.profiler trace of one warm DDIM-50 sampler call at the
bench flagship config, converts the xplane with xprof, and prints the
hlo_op_stats table — the evidence base for the fused-GroupNorm work
(PARITY.md round-2 roadmap).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    batch = int(os.environ.get("PROF_BATCH", "256"))
    image_size = 64
    steps = int(os.environ.get("PROF_STEPS", "50"))

    from advshadow_tpu.core import make_diffusion
    from advshadow_tpu.models import UNetModel
    from advshadow_tpu.samplers import ddim_sample, make_denoise_fn

    rng = jax.random.PRNGKey(0)
    model = UNetModel(model_channels=64, num_res_blocks=2,
                      channel_mult=(1, 2, 2, 2), attention_resolutions=(8, 16),
                      num_heads=4, num_classes=37, dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch, image_size, image_size, 3))
    t0 = jnp.zeros((batch,), jnp.int32)
    y = jnp.arange(batch, dtype=jnp.int32) % 37
    params = jax.jit(model.init)(rng, x0, t0, y)
    coeffs = make_diffusion(1000, "linear")
    denoise = make_denoise_fn(model.apply, params, labels=y, cfg_scale=3.0)

    @jax.jit
    def generate(key):
        return ddim_sample(coeffs, denoise, key,
                           (batch, image_size, image_size, 3),
                           ddim_timesteps=steps)

    print("compiling...", file=sys.stderr)
    generate(rng).block_until_ready()
    k2 = jax.random.PRNGKey(1)
    t = time.perf_counter()
    generate(k2).block_until_ready()
    dt = time.perf_counter() - t
    print(f"warm run: {dt:.3f}s = {batch / dt:.1f} imgs/s", file=sys.stderr)

    logdir = os.environ.get("PROF_DIR", "/tmp/advshadow_profile")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        generate(jax.random.PRNGKey(2)).block_until_ready()

    # parse the xplane
    from xprof.convert import raw_to_tool_data

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    print(json.dumps(rows[:2], indent=1)[:2000])


if __name__ == "__main__":
    main()
