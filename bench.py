"""Streaming benchmark: real-time factor of the flagship separator.

Runs N concurrent binaural streams as the leading batch dimension of
the 8 ms stream step (chunk 128 + 64-sample lookahead @ 16 kHz,
configs/tsh.json geometry) in the production serving config: bf16
params/activations (measured 0.05 dB SI-SNRi cost) + int8 K/V ring
buffers with per-slot scales (measured <0.08 rel-err vs f32 state,
tests/test_serve.py::TestInt8KV) — see PERF.md for the quality
studies.

DEVICE time per step is measured by the SLOPE method: two on-device
`lax.scan` lengths with forced host fetches, per-step time =
(T(n2) - T(n1)) / (n2 - n1). This cancels the fixed per-call
launch+transport cost (~27 ms on proxied transports, which would
inflate a 40-step scan by ~0.68 ms/step) and never trusts
`block_until_ready` alone (unreliable here — PERF.md "Measurement
methodology"). Prints ONE JSON line:

  {"metric": "streaming_rtf_64", "value": <RTF per stream>,
   "unit": "xRT", "vs_baseline": <0.1 / RTF>}

vs_baseline > 1 means the north-star target (RTF < 0.1/stream at 64
concurrent streams, /root/repo/BASELINE.md) is beaten by that factor.

WEDGE RESILIENCE: the measurement runs in a child subprocess under a
supervisor with per-attempt hard timeouts and bounded retry/backoff
(budget $LOOKONCE_BENCH_BUDGET_S, default 40 min; per-attempt
$LOOKONCE_BENCH_ATTEMPT_S, default 15 min), because the proxied v5e
wedges — hangs, not errors — after any client dies mid-op and needs
idle time to recover. If no attempt succeeds inside the budget the
supervisor still exits 0 with a JSON line carrying an explicit
"error" field, so the driver's BENCH snapshot is always parseable.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

N_STREAMS = int(os.environ.get("LOOKONCE_BENCH_NSTREAMS", 64))
CHUNK = 128
STEPS_SHORT = int(os.environ.get("LOOKONCE_BENCH_STEPS_SHORT", 100))
STEPS_LONG = int(os.environ.get("LOOKONCE_BENCH_STEPS_LONG", 500))
REPEATS = int(os.environ.get("LOOKONCE_BENCH_REPEATS", 4))

_METRIC = f"streaming_rtf_{N_STREAMS}"
_CHILD_ENV = "_LOOKONCE_BENCH_CHILD"
# The proxied v5e WEDGES (hangs at backend init, or mid-op) if any
# client died mid-op; recovery needs idle time. A wedged attempt hangs
# forever rather than erroring, so the supervisor gives each attempt a
# hard timeout and retries with backoff inside a bounded budget, then
# emits an explicit {"error": ...} JSON line instead of a stack trace
# (VERDICT r3 "What's weak" #1 / "Next round" #1).
# Cold-cache floor: the serving-scan compile alone takes ~13 min
# through the proxied transport (measured round 4, window 3 — two
# jit_run artifacts landed 13 min after child start). An attempt
# timeout below that SIGKILLs the child MID-COMPILE, which is itself
# the wedge trigger; keep the default comfortably above it.
_ATTEMPT_TIMEOUT_S = int(os.environ.get("LOOKONCE_BENCH_ATTEMPT_S", 1500))
_BUDGET_S = int(os.environ.get("LOOKONCE_BENCH_BUDGET_S", 3000))
_BACKOFFS = (60, 180, 300, 600, 600)
# While a training run holds the (single, proxied) chip, concurrent
# measurements queue for minutes per compile and the numbers are
# garbage (PERF.md "Measurement methodology"). The training chain
# advertises chip ownership via this lockfile; the supervisor waits
# for it to clear (within budget) before measuring. A lock older than
# 4.5 h is treated as stale — the longest single training timeout in
# scripts/chain_r4.sh is 4 h and the chain removes it on exit.
_LOCK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "runs", ".chip_busy")
# The reverse direction (ADVICE r4): while an attempt owns the chip,
# the supervisor advertises it here so chain scripts can wait for the
# bench instead of touching .chip_busy mid-measurement. Stale after
# one attempt-timeout + slack (the marker is removed on attempt end).
_BENCH_MARK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "runs", ".bench_busy")


def _lock_active() -> bool:
    try:
        return time.time() - os.path.getmtime(_LOCK) < 4.5 * 3600
    except OSError:
        return False


def _mark_bench(on: bool) -> None:
    try:
        if on:
            os.makedirs(os.path.dirname(_BENCH_MARK), exist_ok=True)
            with open(_BENCH_MARK, "w") as f:
                f.write(str(os.getpid()))
        else:
            os.unlink(_BENCH_MARK)
    except OSError:
        pass


def supervise() -> int:
    """Run the measurement in child subprocesses until one prints a
    valid JSON result or the time budget runs out; always end by
    printing exactly ONE JSON line on stdout."""
    import subprocess
    t0 = time.monotonic()
    env = dict(os.environ, **{_CHILD_ENV: "1"})
    last_err = "no attempt ran"
    attempt = 0
    while True:
        remaining = _BUDGET_S - (time.monotonic() - t0)
        if attempt > 0 and remaining <= 0:
            break
        if _lock_active():
            print("# bench waiting: chip held by a training run "
                  "(runs/.chip_busy)", file=sys.stderr, flush=True)
        while (_lock_active()
               and _BUDGET_S - (time.monotonic() - t0) > 120):
            time.sleep(30)
        if _lock_active():
            last_err = ("chip held by a training run for the whole "
                        "budget (runs/.chip_busy)")
            break
        attempt += 1
        _mark_bench(True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=min(_ATTEMPT_TIMEOUT_S,
                            max(remaining, 120) if attempt > 1
                            else _ATTEMPT_TIMEOUT_S))
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if isinstance(rec, dict) and rec.get("metric"):
                    print(line if line == json.dumps(rec)
                          else json.dumps(rec))
                    return 0
            tail = (proc.stderr or proc.stdout or "").strip()
            last_err = (f"attempt {attempt} rc={proc.returncode}: "
                        f"{tail[-400:] or 'no output'}")
        except subprocess.TimeoutExpired:
            last_err = (f"attempt {attempt} hung > "
                        f"{_ATTEMPT_TIMEOUT_S}s (wedged TPU?)")
        finally:
            _mark_bench(False)
        print(f"# bench {last_err}", file=sys.stderr, flush=True)
        remaining = _BUDGET_S - (time.monotonic() - t0)
        if remaining <= 0:
            break
        pause = _BACKOFFS[min(attempt - 1, len(_BACKOFFS) - 1)]
        time.sleep(min(pause, remaining))
    print(json.dumps({
        "metric": _METRIC, "value": None, "unit": "xRT",
        "vs_baseline": None,
        "error": f"TPU unreachable within {_BUDGET_S}s budget; "
                 f"last: {last_err}",
    }))
    return 0


def main() -> None:
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var alone — force it
        # before backend init so CPU test runs stay off the chip
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import FLAGSHIP, _model

    model = _model()
    nfft = FLAGSHIP["stft_chunk_size"] + FLAGSHIP["stft_pad_size"]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, nfft)),
                        jnp.zeros((1, 1, 256)))["params"]
    dt = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt),
                                    params)
    emb = jnp.zeros((N_STREAMS, 256), dt)
    rng = np.random.default_rng(0)

    def timed(steps: int) -> float:
        state = model.init_state(N_STREAMS, dtype=dt,
                                 kv_dtype=jnp.int8)
        xs = jnp.asarray(rng.standard_normal(
            (steps, N_STREAMS, 2, nfft)), dt)

        @jax.jit
        def run(state, xs):
            def f(s, xc):
                y, s = model.apply({"params": params}, xc, emb, s,
                                   method=model.step)
                return s, y[:, :, -1]
            return jax.lax.scan(f, state, xs)

        st, ys = run(state, xs)
        np.asarray(ys)  # forced fetch = true completion barrier
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            st, ys = run(state, xs)
            np.asarray(ys)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(STEPS_SHORT)
    t2 = timed(STEPS_LONG)
    per_step = (t2 - t1) / (STEPS_LONG - STEPS_SHORT)

    chunk_s = CHUNK / 16000.0
    rtf = per_step / chunk_s
    target = 0.1
    print(json.dumps({
        "metric": f"streaming_rtf_{N_STREAMS}",
        "value": round(rtf, 5),
        "unit": "xRT",
        "vs_baseline": round(target / rtf, 3),
    }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV):
        main()
    else:
        sys.exit(supervise())
