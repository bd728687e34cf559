"""Portable .npz checkpoint export (train/npz_ckpt.py): params
round-trip without a template, full train-state round-trips against a
like-shaped template, and the eval CLI loader accepts the format.
This is the reset-proofing layer — committed `checkpoints/*.npz` must
reproduce result tables after gitignored `runs/` is wiped."""

import os

import jax
import numpy as np
import pytest

from lookoncetohear_tpu.train import npz_ckpt


def _params():
    return {
        "encoder": {"kernel": np.arange(12, dtype=np.float32)
                    .reshape(3, 4),
                    "bias": np.zeros(4, np.float32)},
        "blocks_0": {"lstm": {"wi": np.full((2, 2), 1.5, np.float32)},
                     "scale": np.array(2.0, np.float32)},
    }


class TestParamsRoundTrip:
    def test_no_template_needed(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        params = _params()
        npz_ckpt.save_npz(p, params)
        rt = npz_ckpt.load_params(p)
        assert jax.tree_util.tree_structure(rt) == \
            jax.tree_util.tree_structure(params)
        for a, b in zip(jax.tree_util.tree_leaves(rt),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(a, b)

    def test_jax_arrays_accepted(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        params = jax.tree_util.tree_map(jax.numpy.asarray, _params())
        npz_ckpt.save_npz(p, params)
        rt = npz_ckpt.load_params(p)
        np.testing.assert_array_equal(rt["encoder"]["kernel"],
                                      np.asarray(params["encoder"]["kernel"]))

    def test_params_only_has_no_full_state(self, tmp_path):
        p = str(tmp_path / "ck.npz")
        npz_ckpt.save_npz(p, _params())
        assert not npz_ckpt.has_full_state(p)

    def test_empty_file_rejected(self, tmp_path):
        p = str(tmp_path / "empty.npz")
        np.savez(p, unrelated=np.zeros(1))
        with pytest.raises(ValueError):
            npz_ckpt.load_params(p)


class TestFullStateRoundTrip:
    def _state(self):
        return {"params": _params(),
                "opt_state": [np.ones(3, np.float32),
                              {"mu": np.zeros((2, 2), np.float32)}],
                "epoch": np.array(7),
                "step": np.array(123),
                "sched": {"lr": np.array(5e-4, np.float32),
                          "bad_epochs": np.array(2)}}

    def test_round_trip_against_template(self, tmp_path):
        p = str(tmp_path / "full.npz")
        state = self._state()
        npz_ckpt.save_npz(p, state["params"], full_state=state)
        assert npz_ckpt.has_full_state(p)
        like = jax.tree_util.tree_map(np.zeros_like, state)
        rt = npz_ckpt.load_full_state(p, like)
        assert int(rt["epoch"]) == 7 and int(rt["step"]) == 123
        np.testing.assert_array_equal(
            rt["opt_state"][1]["mu"], state["opt_state"][1]["mu"])
        np.testing.assert_array_equal(
            rt["params"]["encoder"]["kernel"],
            state["params"]["encoder"]["kernel"])

    def test_template_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "full.npz")
        state = self._state()
        npz_ckpt.save_npz(p, state["params"], full_state=state)
        like = jax.tree_util.tree_map(np.zeros_like, state)
        like["extra_leaf"] = np.zeros(1)
        with pytest.raises(KeyError):
            npz_ckpt.load_full_state(p, like)

    def test_params_still_loadable_without_template(self, tmp_path):
        p = str(tmp_path / "full.npz")
        state = self._state()
        npz_ckpt.save_npz(p, state["params"], full_state=state)
        rt = npz_ckpt.load_params(p)
        np.testing.assert_array_equal(
            rt["blocks_0"]["lstm"]["wi"],
            state["params"]["blocks_0"]["lstm"]["wi"])


class TestEvalLoaderIntegration:
    def test_load_task_accepts_npz(self, tmp_path, monkeypatch):
        """ts_hear_test.load_task with ckpt=<npz> returns the saved
        params instead of reading run_dir/best.ckpt."""
        from lookoncetohear_tpu import utils
        from lookoncetohear_tpu.ts_hear_test import load_task

        cfg = utils.Params(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "tsh_synthetic.json"))
        task = utils.import_attr(cfg.pl_module)(**cfg.pl_module_args)
        rng = jax.random.PRNGKey(0)
        batch = ({"mixture": np.zeros((1, 2, 1600), np.float32)},
                 {"target": np.zeros((1, 2, 1600), np.float32),
                  "embedding_gt": np.zeros((1, 1, 256), np.float32)})
        params = task.init_params(rng, batch)
        p = str(tmp_path / "best.npz")
        npz_ckpt.save_npz(p, jax.device_get(params))

        _, loaded = load_task(cfg, str(tmp_path), ckpt=p)
        assert loaded is not None
        for a, b in zip(jax.tree_util.tree_leaves(loaded),
                        jax.tree_util.tree_leaves(jax.device_get(params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
