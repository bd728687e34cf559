"""Loss zoo (JAX, differentiable).

Re-implements the reference's loss surface (reference src/losses/ and
the inline −SNR loss of src/ts_hear_embed_pl_module.py:49-50) with the
same names and numerics, as pure jnp functions that jit/grad cleanly.
"""

from lookoncetohear_tpu.losses.sdr import (neg_sdr, si_sdr, si_snr, snr,
                                           snr_loss)
from lookoncetohear_tpu.losses.loss_fn import LossFn
from lookoncetohear_tpu.losses.embedding import cosine_embedding_loss
from lookoncetohear_tpu.losses.spectral import (MultiResolutionMelSpecLoss,
                                                L1_Mel,
                                                multi_resolution_stft_loss)
from lookoncetohear_tpu.losses.cdpam import CDPAM

__all__ = [
    "neg_sdr", "si_sdr", "si_snr", "snr", "snr_loss", "LossFn",
    "cosine_embedding_loss", "MultiResolutionMelSpecLoss", "L1_Mel",
    "multi_resolution_stft_loss", "CDPAM",
]
