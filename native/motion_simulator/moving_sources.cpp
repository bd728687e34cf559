// moving_sources: time-varying binaural rendering of moving sources.
//
// Native re-implementation of the reference's pre-built (source-less)
// motion_simulator/moving_sources.so, re-specified from its ctypes
// contract at reference src/datasets/motion_simulator.py:30-95:
//
//   int simulator_init(void** handle, int sr, float frame_duration);
//   int simulator_set_hrtf(void* h, const char* sofa_path);
//   int simulator_add_source(void* h, float* audio, int n_audio,
//                            float* path, int n_path_floats);
//   int simulator_simulate(void* h, float** out, int* n_sources,
//                          int* n_samples);   // interleaved stereo
//   int simulator_cleanup(void* h);
//   int simulator_destroy(void* h);
//
// plus one extension used by our Python bridge (which loads SOFA/HDF5
// with h5py host-side, keeping this library dependency-free):
//
//   int simulator_set_hrtf_data(void* h, const float* irs,
//                               int M, int R, int N,
//                               const float* pos_cart /* M*3 */);
//
// Rendering model: source paths are 3-D points on/around the unit
// sphere sampled every frame_duration seconds. Audio is cut into
// frames of sr*frame_duration samples; each frame is convolved with
// the HRIR pair nearest (by direction cosine) to the path point of
// that frame, with the frame's convolution tail overlap-added into
// subsequent output — so HRIR switches are smoothed by the previous
// frame's reverberant tail. To suppress switching clicks further, a
// frame whose HRIR differs from the previous frame's is rendered with
// both and linearly cross-faded (piecewise-linear HRIR interpolation
// along the path).
//
// All returned codes: 0 = success, nonzero = failure.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Source {
  std::vector<float> audio;
  std::vector<float> path;  // flattened (P, 3)
};

struct Simulator {
  int sr = 16000;
  float frame_duration = 0.025f;
  // HRIR database
  int M = 0, R = 0, N = 0;
  std::vector<float> irs;       // M * R * N
  std::vector<float> pos;      // M * 3 (unit cartesian)
  std::vector<Source> sources;
  std::vector<float> output;   // simulate() result, owned here
};

inline Simulator* sim(void* h) { return static_cast<Simulator*>(h); }

int nearest_hrir(const Simulator& s, const float* p) {
  // maximize dot(p_hat, pos_m)
  float px = p[0], py = p[1], pz = p[2];
  float nrm = std::sqrt(px * px + py * py + pz * pz);
  if (nrm > 1e-12f) { px /= nrm; py /= nrm; pz /= nrm; }
  int best = 0;
  float best_dot = -2.0f;
  for (int m = 0; m < s.M; ++m) {
    const float* q = &s.pos[3 * m];
    float d = px * q[0] + py * q[1] + pz * q[2];
    if (d > best_dot) { best_dot = d; best = m; }
  }
  return best;
}

// y[off .. off+len+N-1] += conv(x[off..off+len], h) * ramp
void conv_add(const float* x, int len, const float* h, int n_ir,
              float* y, float w0, float w1) {
  // per-output-sample weight ramps from w0 to w1 across the frame's
  // direct part; the tail keeps w1.
  for (int i = 0; i < len; ++i) {
    float xv = x[i];
    if (xv == 0.0f) continue;
    float w = len > 1 ? w0 + (w1 - w0) * (float)i / (float)(len - 1) : w1;
    float wx = w * xv;
    for (int k = 0; k < n_ir; ++k) y[i + k] += wx * h[k];
  }
}

void render_source(const Simulator& s, const Source& src, float* out_lr,
                   int n_samples) {
  const int frame = std::max(1, (int)std::lround(s.sr * s.frame_duration));
  const int n = (int)src.audio.size();
  const int n_frames = (n + frame - 1) / frame;
  const int pad = n + s.N;  // room for the last tail (trimmed later)
  std::vector<float> left(pad, 0.0f), right(pad, 0.0f);

  int prev_idx = -1;
  for (int f = 0; f < n_frames; ++f) {
    const int off = f * frame;
    const int len = std::min(frame, n - off);
    const int n_path = (int)src.path.size() / 3;
    const int pi = std::min(f, n_path - 1);
    const int idx = nearest_hrir(s, &src.path[3 * pi]);
    const float* hl = &s.irs[(size_t)idx * s.R * s.N];
    const float* hr = &s.irs[(size_t)idx * s.R * s.N + s.N];
    if (prev_idx >= 0 && prev_idx != idx) {
      // cross-fade: old HRIR fades 1->0, new fades 0->1 over the frame
      const float* pl = &s.irs[(size_t)prev_idx * s.R * s.N];
      const float* pr = &s.irs[(size_t)prev_idx * s.R * s.N + s.N];
      conv_add(&src.audio[off], len, pl, s.N, &left[off], 1.0f, 0.0f);
      conv_add(&src.audio[off], len, pr, s.N, &right[off], 1.0f, 0.0f);
      conv_add(&src.audio[off], len, hl, s.N, &left[off], 0.0f, 1.0f);
      conv_add(&src.audio[off], len, hr, s.N, &right[off], 0.0f, 1.0f);
    } else {
      conv_add(&src.audio[off], len, hl, s.N, &left[off], 1.0f, 1.0f);
      conv_add(&src.audio[off], len, hr, s.N, &right[off], 1.0f, 1.0f);
    }
    prev_idx = idx;
  }
  // interleave (T, 2) row-major, trimmed to the input length
  const int t_out = n_samples / 2;
  for (int i = 0; i < t_out; ++i) {
    out_lr[2 * i] = left[i];
    out_lr[2 * i + 1] = right[i];
  }
}

}  // namespace

extern "C" {

int simulator_init(void** handle, int sr, float frame_duration) {
  if (!handle || sr <= 0 || frame_duration <= 0.0f) return 1;
  auto* s = new (std::nothrow) Simulator();
  if (!s) return 2;
  s->sr = sr;
  s->frame_duration = frame_duration;
  *handle = s;
  return 0;
}

int simulator_set_hrtf_data(void* h, const float* irs, int M, int R,
                            int N, const float* pos_cart) {
  if (!h || !irs || !pos_cart || M <= 0 || R < 2 || N <= 0) return 1;
  Simulator* s = sim(h);
  s->M = M; s->R = R; s->N = N;
  s->irs.assign(irs, irs + (size_t)M * R * N);
  s->pos.assign(pos_cart, pos_cart + (size_t)M * 3);
  // normalize stored positions once
  for (int m = 0; m < M; ++m) {
    float* p = &s->pos[3 * m];
    float nrm = std::sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2]);
    if (nrm > 1e-12f) { p[0] /= nrm; p[1] /= nrm; p[2] /= nrm; }
  }
  return 0;
}

// SOFA files are HDF5; this library stays dependency-free and expects
// the host bridge to decode them (lookoncetohear_tpu/data/motion.py)
// and call simulator_set_hrtf_data. Direct path loading is therefore
// unsupported here.
int simulator_set_hrtf(void* h, const char* sofa_path) {
  (void)h; (void)sofa_path;
  return 3;
}

int simulator_add_source(void* h, float* audio, int n_audio,
                         float* path, int n_path_floats) {
  if (!h || !audio || !path || n_audio <= 0 || n_path_floats % 3 != 0)
    return 1;
  Simulator* s = sim(h);
  if (s->M == 0) return 2;  // HRTF not set
  const int frame = std::max(1, (int)std::lround(
      s->sr * s->frame_duration));
  const int needed = (n_audio + frame - 1) / frame;
  if (n_path_floats / 3 < needed) return 4;
  Source src;
  src.audio.assign(audio, audio + n_audio);
  src.path.assign(path, path + n_path_floats);
  s->sources.push_back(std::move(src));
  return 0;
}

int simulator_simulate(void* h, float** out, int* n_sources,
                       int* n_samples) {
  if (!h || !out || !n_sources || !n_samples) return 1;
  Simulator* s = sim(h);
  if (s->sources.empty()) return 2;
  size_t max_n = 0;
  for (const auto& src : s->sources)
    max_n = std::max(max_n, src.audio.size());
  const int per_src = (int)max_n * 2;  // interleaved stereo
  s->output.assign((size_t)s->sources.size() * per_src, 0.0f);
  for (size_t i = 0; i < s->sources.size(); ++i)
    render_source(*s, s->sources[i], &s->output[i * per_src], per_src);
  *out = s->output.data();
  *n_sources = (int)s->sources.size();
  *n_samples = per_src;
  return 0;
}

int simulator_cleanup(void* h) {
  if (!h) return 1;
  Simulator* s = sim(h);
  s->sources.clear();
  // output stays alive until the next simulate()/destroy (the caller
  // copies it out immediately after simulate, like the reference).
  return 0;
}

int simulator_destroy(void* h) {
  if (!h) return 1;
  delete sim(h);
  return 0;
}

}  // extern "C"
