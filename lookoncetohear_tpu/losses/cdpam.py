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
        """Map a torch CDPAM state_dict onto this encoder.

        Conv/Linear weights are matched by shape in ENCOUNTER ORDER
        against candidate lists built ONCE and consumed as they match
        (so e.g. the many same-shape 64->64 convs each get a distinct
        tensor). Biases and BatchNorm gamma/beta/mean/var are keyed by
        the torch MODULE PREFIX of the tensor they belong to (the
        conv's sibling `.bias`; the next unconsumed BN module of the
        conv's output width), never by bare shape, so a BN bias can
        never masquerade as a conv bias. Transposes: torch Conv1d
        [out, in, k] -> flax [k, in, out]; Linear [out, in] ->
        [in, out]. Raises if any kernel or (present-in-checkpoint) BN
        module fails to map, with a loaded-vs-expected accounting.
        """
        import torch
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state" in sd:
            sd = sd["state"]

        def prefix_of(key: str, suffix: str) -> str:
            # "enc.conv0.weight" -> "enc.conv0"; bare "weight" -> ""
            return key[: -len(suffix)].rstrip(".")

        # Candidate module lists, built ONCE, consumed as matched.
        convs = [(prefix_of(k, "weight"), v) for k, v in sd.items()
                 if v.ndim == 3 and k.endswith("weight")]
        lins = [(prefix_of(k, "weight"), v) for k, v in sd.items()
                if v.ndim == 2 and k.endswith("weight")]
        bns = [prefix_of(k, "running_mean") for k, v in sd.items()
               if k.endswith("running_mean") and v.ndim == 1]

        def sib(prefix: str, leaf: str):
            return sd.get(f"{prefix}.{leaf}" if prefix else leaf)

        p = jax.tree_util.tree_map(np.asarray, _flatten(self.params))
        bs = jax.tree_util.tree_map(np.asarray,
                                    _flatten(self.batch_stats))
        loaded: list = []
        missing: list = []

        for i in range(self.encoder.n_layers):
            wk = f"conv_{i}/kernel"
            want = p[wk].shape  # [k, in, out]
            idx = next((j for j, (_, v) in enumerate(convs)
                        if tuple(v.shape) == (want[2], want[1],
                                              want[0])), None)
            if idx is None:
                raise ValueError(
                    f"no unconsumed torch conv matches layer {i} "
                    f"(flax kernel shape {want})")
            cpfx, w = convs.pop(idx)
            p[wk] = np.transpose(w.numpy(), (2, 1, 0))
            loaded.append(wk)
            tb = sib(cpfx, "bias")
            if f"conv_{i}/bias" in p:
                if tb is not None and tb.ndim == 1 \
                        and tb.shape[0] == want[2]:
                    p[f"conv_{i}/bias"] = tb.numpy()
                    loaded.append(f"conv_{i}/bias")
                # absent torch bias == Conv1d(bias=False) before BN:
                # flax zeros are exactly equivalent, not a failure.
            # Sibling BatchNorm: next unconsumed BN of this width.
            bidx = next(
                (j for j, bp in enumerate(bns)
                 if sib(bp, "running_mean").shape[0] == want[2]), None)
            if bidx is not None:
                bp = bns.pop(bidx)
                pairs = [("scale", p, sib(bp, "weight")),
                         ("bias", p, sib(bp, "bias")),
                         ("mean", bs, sib(bp, "running_mean")),
                         ("var", bs, sib(bp, "running_var"))]
                for leaf, tree, tv in pairs:
                    key = f"bn_{i}/{leaf}"
                    if tv is not None and key in tree:
                        tree[key] = tv.numpy()
                        loaded.append(key)
            elif bns or any(k.endswith("running_mean")
                            for k in sd):
                missing.append(f"bn_{i} (no BN of width {want[2]})")

        for hk in sorted(k for k in p if k.endswith("fc0/kernel")
                         or k.endswith("fc1/kernel")):
            want = p[hk].shape  # [in, out]
            idx = next((j for j, (_, v) in enumerate(lins)
                        if tuple(v.shape) == (want[1], want[0])), None)
            if idx is None:
                missing.append(hk)
                continue
            lpfx, w = lins.pop(idx)
            p[hk] = w.numpy().T
            loaded.append(hk)
            tb = sib(lpfx, "bias")
            bk = hk[: -len("kernel")] + "bias"
            if bk in p and tb is not None and tb.ndim == 1 \
                    and tb.shape[0] == want[1]:
                p[bk] = tb.numpy()
                loaded.append(bk)

        if missing:
            raise ValueError(
                f"torch CDPAM checkpoint did not cover: {missing} "
                f"(loaded {len(loaded)} tensors)")
        logging.info("cdpam: loaded %d tensors from %s "
                     "(%d convs / %d linears left unconsumed)",
                     len(loaded), path, len(convs), len(lins))
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
