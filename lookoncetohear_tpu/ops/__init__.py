from lookoncetohear_tpu.ops import attention, lstm, norms, stft  # noqa: F401
