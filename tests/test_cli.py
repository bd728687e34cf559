"""CLI entry points exercised as subprocesses (the reference's smoke
flags: trainer --frac, ts_hear_test --sample)."""

import json
import os
import subprocess
import sys

import pytest

TINY_CFG = {
    "pl_module": "lookoncetohear_tpu.train.tasks.TSETask",
    "pl_module_args": {
        "model": "lookoncetohear_tpu.models.net.Net",
        "model_params": {
            "embed_dim": 32, "stft_chunk_size": 64, "stft_pad_size": 32,
            "num_ch": 2, "D": 8, "L": 2, "I": 1, "J": 1, "B": 1,
            "H": 8, "local_atten_len": 6, "use_attn": True,
            "lookahead": True, "chunk_causal": True},
        "lr": 1e-3},
    "train_dataset":
        "lookoncetohear_tpu.data.synthetic.SyntheticTSEDataset",
    "train_data_args": {"dset": "train", "n_samples": 8,
                        "n_speakers": 4, "duration": 0.25,
                        "embed_dim": 32},
    "val_dataset":
        "lookoncetohear_tpu.data.synthetic.SyntheticTSEDataset",
    # 11 val samples with eval batch 8: the ragged tail exercises the
    # pad+mask eval path end to end
    "val_data_args": {"dset": "val", "n_samples": 11, "n_speakers": 4,
                      "duration": 0.25, "embed_dim": 32},
    "pl_logger": "src.ts_hear_embed_pl_module.Logger",
    "test_dataset":
        "lookoncetohear_tpu.data.synthetic.SyntheticTSEDataset",
    "test_data_args": {"dset": "test", "n_samples": 8, "n_speakers": 4,
                       "duration": 0.25, "embed_dim": 32},
    "epochs": 1,
    "batch_size": 8,
    "eval_batch_size": 8,
    "num_workers": 0,
}


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        ).strip()
    return env


@pytest.mark.e2e
class TestCLI:
    def test_trainer_cli_train_and_test(self, tmp_path):
        cfg = str(tmp_path / "cfg.json")
        with open(cfg, "w") as f:
            json.dump(TINY_CFG, f)
        run_dir = str(tmp_path / "run")
        r = subprocess.run(
            [sys.executable, "-m", "lookoncetohear_tpu.trainer",
             "--config", cfg, "--run_dir", run_dir],
            env=_env(), capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(run_dir, "last.ckpt"))
        # pl_logger wrote the val-epoch embedding table (reference
        # ts_hear_embed_pl_module.py:148-160)
        assert os.path.exists(
            os.path.join(run_dir, "embeddings", "val_epoch0.csv"))

        # run_dir collision guard: rerun without --resume fails fast
        r2 = subprocess.run(
            [sys.executable, "-m", "lookoncetohear_tpu.trainer",
             "--config", cfg, "--run_dir", run_dir],
            env=_env(), capture_output=True, text=True, timeout=300)
        assert r2.returncode != 0
        assert "resume" in r2.stderr

        # --test consumes the best checkpoint
        r3 = subprocess.run(
            [sys.executable, "-m", "lookoncetohear_tpu.trainer",
             "--config", cfg, "--run_dir", run_dir, "--test"],
            env=_env(), capture_output=True, text=True, timeout=900)
        assert r3.returncode == 0, r3.stderr[-3000:]

    def test_trainer_cli_prerender_cache(self, tmp_path):
        """--prerender materializes each split once (resumable npz
        shards) and trains from the cache (VERDICT r2 #2: training
        must be compute-bound, not render-bound)."""
        cfg = str(tmp_path / "cfg.json")
        with open(cfg, "w") as f:
            json.dump(dict(TINY_CFG, num_workers=2), f)
        run_dir = str(tmp_path / "runp")
        cache = str(tmp_path / "cache")
        r = subprocess.run(
            [sys.executable, "-m", "lookoncetohear_tpu.trainer",
             "--config", cfg, "--run_dir", run_dir,
             "--prerender", cache],
            env=_env(), capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-3000:]
        assert os.path.isdir(os.path.join(run_dir, "last.ckpt"))
        # both consumed splits were materialized
        assert len(os.listdir(os.path.join(cache, "train"))) == 8
        assert len(os.listdir(os.path.join(cache, "val"))) == 11

    def test_launch_dry_run(self, tmp_path):
        lcfg = str(tmp_path / "launch.json")
        with open(lcfg, "w") as f:
            json.dump({"work_dir": str(tmp_path / "work"),
                       "dataset_paths": [], "local_files": [],
                       "env": {"JAX_PLATFORMS": "tpu"}}, f)
        ecfg = str(tmp_path / "exp.json")
        with open(ecfg, "w") as f:
            json.dump(TINY_CFG, f)
        run_dir = str(tmp_path / "lrun")
        r = subprocess.run(
            [sys.executable, "launch.py", "--launch_config", lcfg,
             "--exp_config", ecfg, "--run_dir", run_dir, "--dry_run"],
            capture_output=True, text=True, timeout=120,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        script = os.path.join(run_dir, "run.sh")
        assert os.path.exists(script)
        body = open(script).read()
        assert "git checkout" in body and "--resume" in body
        assert os.path.exists(os.path.join(run_dir, "config.json"))


@pytest.mark.slow
class TestBenchSupervisor:
    """bench.py wedge resilience (VERDICT r3 #1): the supervisor must
    ALWAYS end with one parseable JSON line — a result when a child
    attempt succeeds, an explicit {"error": ...} when the backend
    never comes up inside the budget — never a stack trace / rc 1."""

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def test_unreachable_backend_yields_error_json(self):
        env = {**os.environ,
               "JAX_PLATFORMS": "bogus_backend",
               "LOOKONCE_BENCH_BUDGET_S": "20",
               "LOOKONCE_BENCH_ATTEMPT_S": "15"}
        out = subprocess.run(
            [sys.executable, os.path.join(self.REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=180,
            cwd=self.REPO)
        assert out.returncode == 0, out.stderr[-500:]
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["metric"].startswith("streaming_rtf")
        assert rec["value"] is None and rec["vs_baseline"] is None
        assert "error" in rec and "budget" in rec["error"]
