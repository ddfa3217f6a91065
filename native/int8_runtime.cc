// Native int8 MLP inference runtime for the deployment path.
//
// Plays the role TFLite/LiteRT's C++ interpreter plays in the reference
// (embedded int8 policy inside RobotMoveBaseEnv, and the MCU-side
// TFLite-Micro deployment): executes the framework's .brq int8 artifact
// (see balance_robot_tpu/export/pipeline.py) with pure integer arithmetic —
// int8 weights, int32 accumulators, float32 round-half-even requantization
// (the .brq artifact's defined semantics — deterministic across TPU/CPU),
// bit-identical to the JAX int8 simulator (ops/quant.py) — asserted in
// tests/test_quant.py.
//
// Exposed via a tiny C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: make -C native   (-> native/libint8_runtime.so)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kIn = 6;
constexpr int kHidden = 64;
constexpr int kOut = 2;

struct Model {
  int8_t w0[kIn * kHidden];
  int8_t w1[kHidden * kHidden];
  int8_t w2[kHidden * kOut];
  int32_t b0[kHidden];
  int32_t b1[kHidden];
  int32_t b2[kOut];
  float in_scale;
  int32_t in_zp;
  float out_scale;
  int32_t out_zp;
  float eff0;  // in_scale * w_scale0          (hidden pre-activation scale)
  float eff1;  // act_scale0 * w_scale1
  float eff2;  // act_scale1 * w_scale2 / out_scale
};

int8_t QuantizeTanh(float pre) {
  // round-to-nearest-even like numpy/jax jnp.round
  float y = std::tanh(pre) * 128.0f;
  float r = std::nearbyintf(y);
  if (r < -128.0f) r = -128.0f;
  if (r > 127.0f) r = 127.0f;
  return static_cast<int8_t>(r);
}

void FullyConnected(const int8_t* x, int32_t x_zp, const int8_t* w,
                    const int32_t* b, int in_dim, int out_dim, int32_t* acc) {
  for (int o = 0; o < out_dim; ++o) acc[o] = b[o];
  for (int i = 0; i < in_dim; ++i) {
    int32_t xi = static_cast<int32_t>(x[i]) - x_zp;
    if (xi == 0) continue;
    const int8_t* wrow = w + i * out_dim;
    for (int o = 0; o < out_dim; ++o) {
      acc[o] += xi * static_cast<int32_t>(wrow[o]);
    }
  }
}

}  // namespace

extern "C" {

// model blob layout mirrors export/pipeline.py::save_brq, passed field-wise
// to keep the ABI trivial.
void* brq_create(const int8_t* w0, const int8_t* w1, const int8_t* w2,
                 const int32_t* b0, const int32_t* b1, const int32_t* b2,
                 float in_scale, int32_t in_zp, float out_scale,
                 int32_t out_zp, float ws0, float ws1, float ws2,
                 float a0s, float a1s) {
  Model* m = new Model();
  std::memcpy(m->w0, w0, sizeof(m->w0));
  std::memcpy(m->w1, w1, sizeof(m->w1));
  std::memcpy(m->w2, w2, sizeof(m->w2));
  std::memcpy(m->b0, b0, sizeof(m->b0));
  std::memcpy(m->b1, b1, sizeof(m->b1));
  std::memcpy(m->b2, b2, sizeof(m->b2));
  m->in_scale = in_scale;
  m->in_zp = in_zp;
  m->out_scale = out_scale;
  m->out_zp = out_zp;
  m->eff0 = in_scale * ws0;
  m->eff1 = a0s * ws1;
  m->eff2 = a1s * ws2 / out_scale;
  return m;
}

void brq_destroy(void* handle) { delete static_cast<Model*>(handle); }

// int8 obs (6) -> int8 actions (2); the full integer path.
void brq_invoke(void* handle, const int8_t* q_obs, int8_t* q_act) {
  Model* m = static_cast<Model*>(handle);
  int32_t acc[kHidden];
  int8_t h1[kHidden];
  int8_t h2[kHidden];
  FullyConnected(q_obs, m->in_zp, m->w0, m->b0, kIn, kHidden, acc);
  for (int o = 0; o < kHidden; ++o) {
    h1[o] = QuantizeTanh(static_cast<float>(acc[o]) * m->eff0);
  }
  FullyConnected(h1, 0, m->w1, m->b1, kHidden, kHidden, acc);
  for (int o = 0; o < kHidden; ++o) {
    h2[o] = QuantizeTanh(static_cast<float>(acc[o]) * m->eff1);
  }
  int32_t out_acc[kOut];
  FullyConnected(h2, 0, m->w2, m->b2, kHidden, kOut, out_acc);
  for (int o = 0; o < kOut; ++o) {
    // float32 round-half-even requant — the .brq artifact semantics,
    // bit-identical to the JAX simulator
    int32_t v = static_cast<int32_t>(
        std::nearbyintf(static_cast<float>(out_acc[o]) * m->eff2));
    v += m->out_zp;
    if (v < -128) v = -128;
    if (v > 127) v = 127;
    q_act[o] = static_cast<int8_t>(v);
  }
}

// float obs -> float actions convenience path (reference quantize/dequantize
// shim semantics: round-half-even, +zp, clip; scale*(q-zp) on the way out).
void brq_run_float(void* handle, const float* obs, float* act) {
  Model* m = static_cast<Model*>(handle);
  int8_t q_obs[kIn];
  for (int i = 0; i < kIn; ++i) {
    float q = std::nearbyintf(obs[i] / m->in_scale) + m->in_zp;
    if (q < -128.0f) q = -128.0f;
    if (q > 127.0f) q = 127.0f;
    q_obs[i] = static_cast<int8_t>(q);
  }
  int8_t q_act[kOut];
  brq_invoke(handle, q_obs, q_act);
  for (int o = 0; o < kOut; ++o) {
    act[o] = m->out_scale * (static_cast<float>(q_act[o]) - m->out_zp);
  }
}

}  // extern "C"
