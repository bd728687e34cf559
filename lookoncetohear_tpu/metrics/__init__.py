from lookoncetohear_tpu.metrics.binaural import (compute_ild, compute_itd,
                                                 ild_diff, itd_diff)
from lookoncetohear_tpu.metrics.improvement import metric_improvement

__all__ = ["compute_ild", "compute_itd", "ild_diff", "itd_diff",
           "metric_improvement"]
