"""Profile the BASELINE suite's attack configs on the TPU.

Round-2 verdict Weak #2: the suite's single-224 / batch64 configs run
far below the chip's demonstrated ceiling (1.7% / 12.7% MFU vs the
flagship bench's 49%).  This captures an xplane trace of the exact
jitted region the suite times (the EVAL-preset shadow attack,
ref ddim2/test.py:479-681 semantics) and prints the top HLO ops by
self time — the evidence base for deciding whether the ceiling is the
workload (tiny batch, sequential 11-iteration scan) or a fixable sink.

Usage: python benchmarks/profile_attack.py [single|batch64|vit]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(which: str):
    from advshadow_tpu.attack import EVAL_CONFIG, batched_optimize_shadow, \
        optimize_shadow_position
    from advshadow_tpu.victims import make_victim_fn, make_victim_model

    if which == "single":
        size, batch = 224, None
    elif which == "vit":
        size, batch = 224, 16
    else:
        size, batch = 64, 64
    model = make_victim_model("vit_b16" if which == "vit" else "resnet18",
                              num_classes=37)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    rng = jax.random.PRNGKey(0)
    if which == "vit":
        # mirror benchmarks/suite.py:config_vit_victim — params ride as
        # jit arguments (a ViT-B/16 closed over as a constant embeds
        # 344 MB of literals into the HLO)
        imgs = jax.random.uniform(rng, (batch, size, size, 3))
        masks = jnp.ones((batch, size, size))
        y = jnp.arange(batch, dtype=jnp.int32) % 37

        @jax.jit
        def fn(variables, im, k):
            vf = make_victim_fn(model, variables,
                                compute_dtype=jnp.bfloat16)
            return batched_optimize_shadow(vf, im, masks, y, k,
                                           EVAL_CONFIG).image

        return (lambda im, k: fn(variables, im, k)), (imgs, rng)
    victim_fn = make_victim_fn(model, variables,
                               compute_dtype=jnp.bfloat16)
    if which == "single":
        image = jax.random.uniform(rng, (size, size, 3))
        mask = jnp.ones((size, size))
        fn = jax.jit(lambda im, k: optimize_shadow_position(
            victim_fn, im, mask, jnp.int32(3), k, EVAL_CONFIG).image)
        args = (image, rng)
    else:
        imgs = jax.random.uniform(rng, (batch, size, size, 3))
        masks = jnp.ones((batch, size, size))
        y = jnp.arange(batch, dtype=jnp.int32) % 37

        @jax.jit
        def fn(im, k):
            return batched_optimize_shadow(victim_fn, im, masks, y, k,
                                           EVAL_CONFIG).image

        args = (imgs, rng)
    return fn, args


def main():
    from advshadow_tpu.utils.runtime import runtime_init

    runtime_init()
    which = (sys.argv[1] if len(sys.argv) > 1 else "single")
    fn, args = build(which)
    print("compiling...", file=sys.stderr)
    fn(*args).block_until_ready()
    reps = 3
    t = time.perf_counter()
    for i in range(reps):
        out = fn(args[0] * (1 + 1e-6 * i), jax.random.fold_in(args[1], i))
    import numpy as np

    np.asarray(out)
    dt = (time.perf_counter() - t) / reps
    print(f"warm: {dt * 1000:.1f} ms/call", file=sys.stderr)

    logdir = os.environ.get("PROF_DIR", f"/tmp/advshadow_prof_{which}")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        np.asarray(fn(args[0] * 1.001, jax.random.fold_in(args[1], 99)))

    from xprof.convert import raw_to_tool_data

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c["label"] for c in d["cols"]]
    ci = {c: i for i, c in enumerate(cols)}

    def val(r, c):
        return r["c"][ci[c]].get("v")

    rows = sorted(d["rows"],
                  key=lambda r: -float(val(r, "Total self time (us)") or 0))
    total = sum(float(val(r, "Total self time (us)") or 0) for r in d["rows"])
    print(f"device self time total: {total / 1000:.1f} ms")
    for r in rows[:12]:
        print(f"{val(r, 'HLO op name')}: "
              f"{float(val(r, 'Total self time (us)')):.0f}us "
              f"x{val(r, '#Occurrences')} cat={val(r, 'HLO op category')} "
              f"bound={val(r, 'Bound by')} "
              f"GF/s={float(val(r, 'Model GFLOP/s') or 0):.0f}")


if __name__ == "__main__":
    main()
