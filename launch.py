"""TPU-pod experiment launcher — the reference's SLURM launcher
(reference slurm.py) rebuilt for TPU VMs.

Generates a reproducible launch script that, on every worker of a TPU
pod slice:
  * clones the repo at the current (clean + pushed) commit,
  * extracts dataset tarballs / copies local files,
  * runs `python -m lookoncetohear_tpu.trainer --resume` in a
    preemption-tolerant retry loop (TPU-VM maintenance events replace
    SLURM requeueing; `--resume` + orbax last.ckpt gives at-epoch
    recovery like reference slurm.py:102-104).

Dispatch is via `gcloud compute tpus tpu-vm ssh --worker=all` when a
`tpu_name` is configured, or direct local execution otherwise
(single-host v5e). `--dry_run` writes the script without launching
(reference slurm.py:111-113).

Launch config JSON fields: tpu_name (optional), zone, project,
work_dir, venv_activate (optional), dataset_paths [], local_files [],
env {} (extra environment variables), max_restarts.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

from lookoncetohear_tpu import utils


def _git(args, cwd):
    return subprocess.run(["git"] + args, cwd=cwd, check=True,
                          capture_output=True, text=True).stdout.strip()


def create_launch_script(cfg) -> str:
    path = os.path.join(cfg.run_dir, "run.sh")
    working_dir = os.path.join(cfg.work_dir, cfg.exp_name)
    lines = [
        "#!/bin/bash",
        "set -x",
        "export PYTHONFAULTHANDLER=1",
        # surface XLA/ICI issues the way NCCL_DEBUG=INFO did for DDP
        "export TPU_STDERR_LOG_LEVEL=0",
        # every pod worker joins the jax.distributed cluster (ranks +
        # coordinator from the TPU metadata service; see
        # parallel/distributed.py) — the srun-per-GPU equivalent of
        # reference slurm.py:36-37
        "export LOOKONCE_DIST=auto",
    ]
    for k, v in getattr(cfg, "env", {}).items():
        lines.append(f"export {k}={v}")
    if getattr(cfg, "venv_activate", None):
        lines.append(f". {cfg.venv_activate}")
    lines += [
        f"if [ -d {working_dir} ]; then chmod -R +w {working_dir};"
        f" rm -rf {working_dir}; fi",
        f"git clone {cfg.git_repo} {working_dir}",
        f"cd {working_dir}",
        f"git checkout {cfg.commit_hash}",
    ]
    for p in getattr(cfg, "dataset_paths", []):
        lines.append(f"tar -xf {p} -C {working_dir}/data")
    for lf in getattr(cfg, "local_files", []):
        if os.path.exists(lf):
            dest = os.path.dirname(os.path.join(working_dir, lf))
            lines += [f"mkdir -p {dest}",
                      f"cp -R {os.path.abspath(lf)} {dest}"]
        else:
            print(f"Warning: local file {lf} does not exist.")
    config = os.path.join(cfg.run_dir, "config.json")
    train = (f"python -m lookoncetohear_tpu.trainer --config {config} "
             f"--run_dir {cfg.run_dir} --resume")
    max_restarts = getattr(cfg, "max_restarts", 100)
    lines += [
        # preemption/maintenance retry loop; --resume picks up
        # last.ckpt so each restart costs at most one epoch
        f"for i in $(seq 1 {max_restarts}); do",
        f"  {train} >> {cfg.run_dir}/out.log 2>&1 && break",
        "  echo \"trainer exited nonzero; retrying ($i)\"",
        "  sleep 30",
        "done",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(path, 0o755)
    return path


def launch(cfg, script: str) -> None:
    if getattr(cfg, "tpu_name", None):
        cmd = ["gcloud", "compute", "tpus", "tpu-vm", "ssh",
               cfg.tpu_name, f"--zone={cfg.zone}",
               f"--project={cfg.project}", "--worker=all",
               f"--command=bash {script}"]
        subprocess.run(cmd, check=True)
    else:
        subprocess.Popen(["bash", script])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--launch_config", required=True,
                        help="launch configuration JSON")
    parser.add_argument("--exp_config", required=True,
                        help="experiment configuration JSON")
    parser.add_argument("--run_dir", required=True)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    repo_dir = os.path.dirname(os.path.realpath(__file__))
    if not args.dry_run:
        assert not _git(["status", "--porcelain"], repo_dir), \
            "There are unstaged changes in the repository."
        ahead = _git(["rev-list", "--count", "@{u}..HEAD"], repo_dir)
        assert ahead == "0", "There are unpushed commits."
    cfg = utils.Params(args.launch_config)
    os.makedirs(args.run_dir)
    cfg.run_dir = os.path.abspath(args.run_dir)
    cfg.exp_name = os.path.basename(args.run_dir)
    shutil.copy(args.exp_config, os.path.join(args.run_dir,
                                              "config.json"))
    cfg.commit_hash = _git(["rev-parse", "HEAD"], repo_dir)
    cfg.git_repo = _git(["remote", "get-url", "origin"], repo_dir) \
        if _git(["remote"], repo_dir) else repo_dir
    script = create_launch_script(cfg)
    print(f"Wrote launch script to {script}")
    if not args.dry_run:
        launch(cfg, script)
        print(f"Launched experiment {cfg.exp_name}")
