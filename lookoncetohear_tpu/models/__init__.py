from lookoncetohear_tpu.models.net import EmbedNet, Net  # noqa: F401
