"""Victim variable store: npz round-trip, legacy pkl, and the real
torch-state_dict drop-in path (round-2 verdict item: the day ImageNet
weights become available, zero code changes are needed)."""

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advshadow_tpu.victims import (
    load_torch_state_dict,
    load_variables,
    make_victim_fn,
    make_victim_model,
    port_state_dict,
    save_variables,
)


def _tiny_victim_variables(rng=0, size=32):
    model = make_victim_model("resnet18", num_classes=5)
    variables = model.init(jax.random.PRNGKey(rng),
                           jnp.zeros((1, size, size, 3)))
    return model, jax.device_get(variables)


class TestNpzRoundTrip:
    def test_save_load_identical(self, tmp_path):
        model, variables = _tiny_victim_variables()
        path = save_variables(str(tmp_path / "victim.npz"), variables)
        assert path.endswith(".npz")
        loaded = load_variables(path)
        flat_a = jax.tree_util.tree_leaves_with_path(variables)
        flat_b = jax.tree_util.tree_leaves_with_path(loaded)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                      sorted(flat_b, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        np.testing.assert_allclose(
            np.asarray(make_victim_fn(model, variables)(x)),
            np.asarray(make_victim_fn(model, loaded)(x)), atol=1e-6)

    def test_extension_enforced(self, tmp_path):
        _, variables = _tiny_victim_variables()
        path = save_variables(str(tmp_path / "victim.pkl"), variables)
        assert path.endswith(".npz") and os.path.exists(path)

    def test_legacy_pickle_loads(self, tmp_path):
        _, variables = _tiny_victim_variables()
        p = tmp_path / "victim.pkl"
        with open(p, "wb") as f:
            pickle.dump(variables, f)
        loaded = load_variables(str(p))
        assert set(loaded) == set(variables)


class TestTorchStateDictDropIn:
    """torch.save a full-architecture replica's state_dict, load it back
    through the CLI flag — the documented path for real pretrained
    weights (ref: ASR_fast.py:16-88)."""

    @pytest.fixture(scope="class")
    def torch_resnet50(self):
        torch = pytest.importorskip("torch")
        from tests.test_porting_fullscale import TvResNet, \
            _randomize_norm_layers

        torch.manual_seed(3)
        model = TvResNet(layers=(3, 4, 6, 3), num_classes=7)
        _randomize_norm_layers(model, seed=3)
        model.eval()
        return model

    def test_pth_ports_to_matching_logits(self, tmp_path, torch_resnet50):
        import torch

        pth = tmp_path / "resnet50_imagenet.pth"
        torch.save(torch_resnet50.state_dict(), pth)

        sd = load_torch_state_dict(str(pth))
        variables = port_state_dict("resnet50", sd)
        flax_model = make_victim_model("resnet50", num_classes=7)

        x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
        ours = flax_model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            theirs = torch_resnet50(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   atol=2e-3, rtol=1e-3)
        assert (np.asarray(ours).argmax(-1) == theirs.argmax(-1)).all()

    def test_classify_cli_flag(self, tmp_path, torch_resnet50, capsys):
        """--torch_state_dict end-to-end through cli/classify.py."""
        import torch
        from PIL import Image

        from advshadow_tpu.cli.classify import main as classify_main

        pth = tmp_path / "resnet50.pth"
        torch.save(torch_resnet50.state_dict(), pth)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rs = np.random.RandomState(1)
        for i in range(2):
            Image.fromarray(
                rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
                img_dir / f"im{i}.png")

        out = classify_main([
            "--path", str(img_dir), "--victim", "resnet50",
            "--torch_state_dict", str(pth), "--num_classes", "7",
            "--image_size", "64",
        ])
        capsys.readouterr()
        assert len(out) == 2
        for row in out.values():
            assert 0.0 < row["confidence"] <= 1.0

    def test_npz_state_dict_variant(self, tmp_path, torch_resnet50):
        """An npz holding torch-named arrays is accepted too."""
        sd_np = {k: v.detach().numpy()
                 for k, v in torch_resnet50.state_dict().items()}
        npz = tmp_path / "sd.npz"
        np.savez(str(npz), **sd_np)
        sd = load_torch_state_dict(str(npz))
        variables = port_state_dict("resnet50", sd)
        assert "params" in variables and "batch_stats" in variables

    def test_unknown_victim_raises(self):
        with pytest.raises(ValueError, match="no state_dict porter"):
            port_state_dict("mystery_net", {})
