import jax.numpy as jnp
import numpy as np

from lookoncetohear_tpu.profiling import LatencyRecorder, cost_analysis


def test_cost_analysis_matmul():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    costs = cost_analysis(lambda a, b: a @ b, a, b)
    # 2*M*N*K FLOPs
    assert abs(costs["flops"] - 2 * 64 * 128 * 32) / (2*64*128*32) < 0.5


def test_latency_recorder():
    rec = LatencyRecorder()
    for _ in range(5):
        with rec.measure():
            sum(range(1000))
    s = rec.summary()
    assert s["n"] == 5 and s["p50_ms"] >= 0


def test_model_flops_reported():
    from lookoncetohear_tpu.models.net import Net
    import jax
    net = Net(embed_dim=32, stft_chunk_size=64, stft_pad_size=32,
              num_ch=2, D=8, L=2, B=1, H=8, local_atten_len=6,
              use_attn=True)
    x = jnp.zeros((1, 2, 640))
    e = jnp.zeros((1, 1, 32))
    params = net.init(jax.random.PRNGKey(0), x, e)["params"]
    costs = cost_analysis(
        lambda p, x, e: net.apply({"params": p}, x, e), params, x, e)
    assert np.isfinite(costs["flops"]) and costs["flops"] > 1e6
