"""Training subsystem tests: train step learns, EMA warmup semantics, LR
schedule parity, checkpoint roundtrip, SPMD sharding on the 8-device mesh."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advshadow_tpu.core import make_diffusion
from advshadow_tpu.models import UNetModel
from advshadow_tpu.parallel import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_state,
    tp_shardings,
)
from advshadow_tpu.train import (
    TrainConfig,
    cosine_lr,
    create_train_state,
    ema_update,
    filter_pretrain_params,
    load_ckpt,
    load_ckpt_params,
    make_train_step,
    save_ckpt,
)


def tiny_model(num_classes=None):
    return UNetModel(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                     attention_resolutions=(), num_classes=num_classes)


class TestLRSchedule:
    def test_matches_reference_math(self):
        """cosine_lr == set_cosine_lr closed form (ref utils/lr_scheduler.py)."""
        # warmup phase
        assert cosine_lr(2, 100, 0.0, 1.0, warmup=True) == pytest.approx(0.4)
        # cosine phase
        e, E, wu = 50, 100, 5
        expected = 0.0 + 1.0 * (1 + math.cos(math.pi * (e - wu) / (E - wu))) / 2
        assert cosine_lr(e, E, 0.0, 1.0, warmup=True) == pytest.approx(expected)
        # no-warmup starts at lr_max
        assert cosine_lr(0, 100, 0.0, 1.0, warmup=False) == pytest.approx(1.0)


class TestEMA:
    def test_warmup_copies_then_decays(self):
        p = {"w": jnp.asarray(2.0)}
        e = {"w": jnp.asarray(0.0)}
        # before start: hard copy (ref model/modules/ema.py:46-57)
        out = ema_update(e, p, jnp.asarray(10), beta=0.995, start=2000)
        assert float(out["w"]) == pytest.approx(2.0)
        # after start: decay
        out = ema_update(e, p, jnp.asarray(3000), beta=0.995, start=2000)
        assert float(out["w"]) == pytest.approx(0.005 * 2.0)


class TestTrainStep:
    def test_loss_decreases_unconditional(self):
        coeffs = make_diffusion(50, "framework_linear")
        model = tiny_model()
        cfg = TrainConfig(lr=2e-3, conditional=False, epochs=10,
                          steps_per_epoch=10, lr_func="linear")
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (8, 16, 16, 3), minval=-1, maxval=1)
        state = create_train_state(model, rng, x, cfg)
        step_fn = make_train_step(coeffs, cfg, donate=False)
        labels = jnp.zeros((8,), jnp.int32)
        losses = []
        for i in range(30):
            state, metrics = step_fn(state, x, labels, jax.random.fold_in(rng, i))
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert int(state.step) == 30

    def test_conditional_with_cfg_dropout(self):
        coeffs = make_diffusion(50, "framework_linear")
        model = tiny_model(num_classes=4)
        cfg = TrainConfig(lr=1e-3, conditional=True, cfg_dropout=0.5,
                          epochs=5, steps_per_epoch=5)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (4, 16, 16, 3), minval=-1, maxval=1)
        labels = jnp.array([0, 1, 2, 3])
        state = create_train_state(model, rng, x, cfg, labels=labels)
        step_fn = make_train_step(coeffs, cfg, donate=False)
        state, metrics = step_fn(state, x, labels, rng)
        assert np.isfinite(float(metrics["loss"]))


class TestSharding:
    def test_mesh_and_data_sharding(self):
        assert jax.device_count() == 8
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
        x = jnp.zeros((16, 8, 8, 3))
        xs = jax.device_put(x, data_sharding(mesh))
        assert len(xs.sharding.device_set) == 8

    def test_spmd_train_step_on_mesh(self):
        """Full train step over a data-sharded batch with replicated params;
        the multi-chip path the driver dry-runs."""
        coeffs = make_diffusion(20, "framework_linear")
        model = tiny_model(num_classes=4)
        cfg = TrainConfig(lr=1e-3, conditional=True, epochs=2, steps_per_epoch=2)
        rng = jax.random.PRNGKey(0)
        mesh = make_mesh()
        x = jax.random.uniform(rng, (16, 16, 16, 3), minval=-1, maxval=1)
        labels = jnp.zeros((16,), jnp.int32)
        state = create_train_state(model, rng, x, cfg, labels=labels)
        state = replicate(state, mesh)
        batch = shard_batch({"x": x, "y": labels}, mesh)
        step_fn = make_train_step(coeffs, cfg, donate=False)
        state, metrics = step_fn(state, batch["x"], batch["y"], rng)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after the update
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_tensor_parallel_matches_replicated(self):
        """Real TP: widest conv kernels sharded over a 2-way 'model' axis
        produce the same train step as the fully-replicated run."""
        coeffs = make_diffusion(20, "framework_linear")
        model = tiny_model(num_classes=4)
        cfg = TrainConfig(lr=1e-3, conditional=True, epochs=2, steps_per_epoch=2)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (16, 16, 16, 3), minval=-1, maxval=1)
        labels = jnp.zeros((16,), jnp.int32)
        step_fn = make_train_step(coeffs, cfg, donate=False)

        # baseline: replicated over a pure-dp mesh
        mesh_dp = make_mesh(data=8, model=1)
        state0 = create_train_state(model, rng, x, cfg, labels=labels)
        s_rep = replicate(state0, mesh_dp)
        b_rep = shard_batch({"x": x, "y": labels}, mesh_dp)
        s_rep, m_rep = step_fn(s_rep, b_rep["x"], b_rep["y"], rng)

        # tp: (data=4, model=2), 64-wide convs genuinely split
        mesh_tp = make_mesh(data=4, model=2)
        s_tp = create_train_state(model, rng, x, cfg, labels=labels)
        s_tp = shard_train_state(s_tp, mesh_tp, min_channels=64)
        n_tp = sum(
            1 for leaf in jax.tree_util.tree_leaves(s_tp.params)
            if "model" in (leaf.sharding.spec or ())
        )
        assert n_tp > 0, "tp rule sharded nothing"
        b_tp = shard_batch({"x": x, "y": labels}, mesh_tp)
        s_tp, m_tp = step_fn(s_tp, b_tp["x"], b_tp["y"], rng)

        assert np.isclose(float(m_tp["loss"]), float(m_rep["loss"]),
                          rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(s_tp.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(s_rep.params)[0]),
            rtol=1e-5, atol=1e-6,
        )

    def test_tp_shardings_rule(self):
        mesh = make_mesh(data=4, model=2)
        params = {
            "wide": {"kernel": jnp.zeros((3, 3, 32, 64)),
                     "bias": jnp.zeros((64,))},
            "narrow": {"kernel": jnp.zeros((3, 3, 8, 16)),
                       "bias": jnp.zeros((16,))},
            "odd": {"kernel": jnp.zeros((3, 3, 32, 65))},
        }
        sh = tp_shardings(params, mesh, min_channels=64)
        assert sh["wide"]["kernel"].spec == jax.sharding.PartitionSpec(
            None, None, None, "model")
        assert sh["wide"]["bias"].spec == jax.sharding.PartitionSpec("model")
        assert sh["narrow"]["kernel"].spec == jax.sharding.PartitionSpec()
        assert sh["odd"]["kernel"].spec == jax.sharding.PartitionSpec()
        # model=1 mesh: rule is a no-op
        sh1 = tp_shardings(params, make_mesh(data=8, model=1), min_channels=1)
        assert all(s.spec == jax.sharding.PartitionSpec()
                   for s in jax.tree_util.tree_leaves(sh1))


class TestCheckpoint:
    def test_roundtrip_with_metadata(self, tmp_path):
        params = {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)}}
        ema = jax.tree_util.tree_map(lambda x: x * 2, params)
        path = save_ckpt(
            str(tmp_path), epoch=7, params=params, ema_params=ema,
            num_classes=37, conditional=True, image_size=64, sample="ddim",
            network="unet", act="silu", classes_name=["a", "b"],
        )
        tree = load_ckpt(path)
        assert tree["metadata"]["start_epoch"] == 7
        assert tree["metadata"]["num_classes"] == 37
        assert tree["metadata"]["sample"] == "ddim"
        np.testing.assert_allclose(tree["model"]["dense"]["kernel"],
                                   np.ones((3, 4)))
        np.testing.assert_allclose(
            load_ckpt_params(path, is_use_ema=True)["dense"]["kernel"],
            2 * np.ones((3, 4)))

    def test_interval_copy(self, tmp_path):
        params = {"w": jnp.ones(2)}
        save_ckpt(str(tmp_path), epoch=5, params=params, ema_params=params,
                  save_name="ckpt_5", save_model_interval=True,
                  start_model_interval=2)
        assert os.path.isdir(tmp_path / "ckpt_5")
        assert os.path.isdir(tmp_path / "ckpt_last")

    def test_npz_export_restore_roundtrip(self, tmp_path):
        """Committed-evidence path: EMA -> f16 npz -> loadable ckpt_last
        (the flagship weights' portable form; examples/at_size_128_run.py
        phase_export + train.checkpoint.restore_ckpt_from_npz)."""
        import json

        from advshadow_tpu.train import export_params_npz, \
            restore_ckpt_from_npz

        ema = {"down": {"conv": {"kernel": jnp.arange(12, dtype=jnp.float32)
                                 .reshape(3, 4) / 7}},
               "head": {"bias": jnp.ones(4)}}
        npz = export_params_npz(ema, str(tmp_path / "ema_f16.npz"))
        meta_path = tmp_path / "metadata.json"
        meta_path.write_text(json.dumps(
            {"start_epoch": 299, "num_classes": 10, "conditional": True,
             "image_size": 128, "sample": "ddim", "network": "unet",
             "act": "gelu", "channels": [32, 64], "noise_schedule":
             "framework_linear"}))
        ckpt = restore_ckpt_from_npz(npz, str(meta_path),
                                     str(tmp_path / "restored"))
        tree = load_ckpt(ckpt)
        assert tree["metadata"]["num_classes"] == 10
        assert tree["metadata"]["image_size"] == 128
        assert tree["metadata"]["restored_from"] == "ema_f16.npz"
        got = tree["ema_model"]["down"]["conv"]["kernel"]
        assert got.dtype == np.float32
        np.testing.assert_allclose(
            got, np.asarray(ema["down"]["conv"]["kernel"], np.float16),
            atol=0)  # exactly the f16-quantized values
        np.testing.assert_allclose(tree["model"]["head"]["bias"],
                                   np.ones(4))

    def test_pretrain_filter(self):
        init = {"label_emb": jnp.zeros((5, 8)), "conv": jnp.zeros((3, 3)),
                "head": jnp.zeros((4,))}
        loaded = {"label_emb": jnp.ones((9, 8)), "conv": jnp.ones((3, 3)),
                  "head": jnp.ones((2,))}  # wrong shape
        merged = filter_pretrain_params(init, loaded)
        np.testing.assert_allclose(merged["conv"], 1.0)       # kept
        np.testing.assert_allclose(merged["label_emb"], 0.0)  # reset
        np.testing.assert_allclose(merged["head"], 0.0)       # shape-filtered


class TestProfiling:
    def test_step_timer(self):
        import time as _time

        from advshadow_tpu.utils import StepTimer

        t = StepTimer(items_per_step=4)
        for _ in range(3):
            with t:
                _time.sleep(0.01)
        s = t.summary()
        assert s["steps"] == 3 and s["items_per_sec"] > 0

    def test_trace_writes_profile(self, tmp_path):
        import os

        import jax.numpy as jnp

        from advshadow_tpu.utils import trace

        with trace(str(tmp_path)):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        found = any("plugins" in r or f for r, d, f in os.walk(tmp_path))
        assert found

    def test_nan_debug_toggle(self):
        import jax

        from advshadow_tpu.utils import enable_nan_debugging

        enable_nan_debugging(True)
        assert jax.config.jax_debug_nans
        enable_nan_debugging(False)
        assert not jax.config.jax_debug_nans


class TestLossRegistry:
    def test_losses(self):
        import jax.numpy as jnp

        from advshadow_tpu.train.trainer import make_loss_fn

        n = jnp.zeros((2, 2))
        p = jnp.full((2, 2), 2.0)
        assert float(make_loss_fn("mse")(n, p)) == pytest.approx(4.0)
        assert float(make_loss_fn("l1")(n, p)) == pytest.approx(2.0)
        assert float(make_loss_fn("huber")(n, p)) == pytest.approx(1.5)
        with pytest.raises(ValueError):
            make_loss_fn("bogus")


class TestAsyncCheckpoint:
    def test_async_roundtrip(self, tmp_path):
        from advshadow_tpu.train import save_ckpt, load_ckpt, \
            wait_for_async_saves

        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        save_ckpt(str(tmp_path), epoch=3, params=params, ema_params=params,
                  async_save=True, num_classes=5, conditional=True,
                  save_name="ckpt_3", save_model_interval=True,
                  start_model_interval=0)
        wait_for_async_saves()
        tree = load_ckpt(str(tmp_path / "ckpt_last"))
        np.testing.assert_allclose(tree["model"]["w"],
                                   np.arange(6.0).reshape(2, 3))
        assert tree["metadata"]["start_epoch"] == 3
        assert os.path.isdir(tmp_path / "ckpt_3")


class TestMiscUtils:
    def test_separate_ckpt_weights(self):
        from advshadow_tpu.train import separate_ckpt_weights

        tree = {"model": 1, "ema_model": 2, "optimizer": 3, "metadata": {}}
        out = separate_ckpt_weights(tree, separate_model=True,
                                    separate_ema_model=False,
                                    separate_optimizer=True)
        assert out["model"] is None and out["optimizer"] is None
        assert out["ema_model"] == 2

    def test_custom_logger_webui_accumulation(self, tmp_path):
        from advshadow_tpu.utils.logger import CustomLogger

        log = CustomLogger("t1", log_file=str(tmp_path / "x.log"),
                           is_webui=True)
        log.info("hello webui")
        assert any("hello webui" in line for line in log.webui_text)
        assert "hello webui" in (tmp_path / "x.log").read_text()


class TestAtSize128Recipe:
    def test_runner_argv_matches_committed_train_log(self):
        """The reproducibility driver's training argv must parse to the
        exact arg dict recorded in the committed train.log of the
        original 300-epoch flagship run (examples/at_size_128_run.py
        re-derives the recipe from that log)."""
        import json

        from advshadow_tpu.cli.train_shadow import build_parser
        from examples.at_size_128_run import _train_argv

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        log_path = os.path.join(repo, "artifacts", "at_size_128",
                                "diffusion_run", "shadow128", "train.log")
        with open(log_path) as f:
            # the 300-epoch entry of the original run
            entries = [json.loads(line.split("]: ", 1)[1])
                       for line in f if "]: {" in line]
        recorded = next(e for e in entries if e["epochs"] == 300)

        argv = _train_argv(resume=False)
        args = vars(build_parser().parse_args(argv[3:]))  # skip python -m mod

        # fields that are allowed to differ from the original run:
        # paths (DATA env / npz-vs-pkl victim store), resume bookkeeping
        path_keys = {"dataset_path", "mask_dir", "labels_json",
                     "victim_ckpt", "result_path", "resume", "start_epoch",
                     "ckpt_every"}
        for key, want in recorded.items():
            if key in path_keys or key not in args:
                continue
            assert args[key] == want, f"{key}: runner={args[key]} log={want}"
