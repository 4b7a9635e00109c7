// Native CDL channel generator — host data-loading layer.
//
// C++ implementation of the clustered delay-line model in
// score_based_channels_tpu/data/cdl.py (same math: per-cluster
// powers/delays/zenith angles, 20 rays at the TR 38.901 Table 7.5-3
// offsets scaled by the per-profile spread, random per-ray phases and
// arrival-ray coupling, vertical-ULA responses, narrowband frequency
// sampling). OpenMP-parallel over realizations; per-realization RNG
// seeded as seed*(num_channels + idx) following the MATLAB convention
// (genChannels.m:34-37).
//
// The JAX generator stays the default (bit-deterministic with the rest of
// the pipeline); this backend exists for bulk offline dataset generation,
// where it avoids XLA compilation and runs multithreaded on the host.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC cdl_gen.cc -o libcdl_gen.so

#include <cmath>
#include <complex>
#include <cstdint>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kRayOffsets[10] = {0.0447, 0.1413, 0.2492, 0.3715, 0.5129,
                                    0.6797, 0.8844, 1.1481, 1.5195, 2.1551};
constexpr int kNumRays = 20;
constexpr double kPi = 3.14159265358979323846;

void vertical_ula_response(double zenith, int n, double spacing,
                           std::complex<float>* out) {
  const double base = 2.0 * kPi * spacing * std::cos(zenith);
  for (int k = 0; k < n; ++k) {
    const double ph = base * k;
    out[k] = std::complex<float>(static_cast<float>(std::cos(ph)),
                                 static_cast<float>(std::sin(ph)));
  }
}

}  // namespace

extern "C" {

// rows: n_clusters x 6 doubles (delay_norm, power_db, aod, aoa, zod, zoa).
// out:  num_channels * num_sc * num_rx * num_tx * 2 floats (Re, Im last).
void cdl_generate(const double* rows, int n_clusters, int is_los,
                  double c_zsd_deg, double c_zsa_deg, int num_channels,
                  int num_rx, int num_tx, double spacing,
                  double delay_spread_s, double subcarrier_hz, int num_sc,
                  int sc_gap, uint64_t seed, float* out) {
  const double deg = kPi / 180.0;

  // normalized linear powers
  std::vector<double> powers(n_clusters);
  double psum = 0.0;
  for (int c = 0; c < n_clusters; ++c) {
    powers[c] = std::pow(10.0, rows[c * 6 + 1] / 10.0);
    psum += powers[c];
  }
  for (auto& p : powers) p /= psum;

  std::vector<double> offs(kNumRays);
  for (int m = 0; m < 10; ++m) {
    offs[m] = kRayOffsets[m];
    offs[m + 10] = -kRayOffsets[m];
  }

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int idx = 0; idx < num_channels; ++idx) {
    std::mt19937_64 rng(seed * (static_cast<uint64_t>(num_channels) + idx));
    std::uniform_real_distribution<double> unif(0.0, 2.0 * kPi);

    // per-cluster narrowband matrices H_c, then frequency phases
    std::vector<std::complex<float>> Hc(
        static_cast<size_t>(n_clusters) * num_rx * num_tx,
        std::complex<float>(0.f, 0.f));
    std::vector<std::complex<float>> arx(num_rx), atx(num_tx);

    for (int c = 0; c < n_clusters; ++c) {
      const double zod = rows[c * 6 + 4] * deg;
      const double zoa = rows[c * 6 + 5] * deg;
      std::complex<float>* H = &Hc[static_cast<size_t>(c) * num_rx * num_tx];

      // random arrival-ray coupling: a permutation of the offsets
      std::vector<int> perm(kNumRays);
      for (int m = 0; m < kNumRays; ++m) perm[m] = m;
      for (int m = kNumRays - 1; m > 0; --m) {
        std::uniform_int_distribution<int> pick(0, m);
        std::swap(perm[m], perm[pick(rng)]);
      }

      const bool los_ray = (is_los && c == 0);
      const int rays = los_ray ? 1 : kNumRays;
      const double amp = los_ray ? std::sqrt(powers[c])
                                 : std::sqrt(powers[c] / kNumRays);
      for (int m = 0; m < rays; ++m) {
        const double ray_zod =
            los_ray ? zod : zod + c_zsd_deg * deg * offs[m];
        const double ray_zoa =
            los_ray ? zoa : zoa + c_zsa_deg * deg * offs[perm[m]];
        const double phase = unif(rng);
        const std::complex<float> g(
            static_cast<float>(amp * std::cos(phase)),
            static_cast<float>(amp * std::sin(phase)));
        vertical_ula_response(ray_zoa, num_rx, spacing, arx.data());
        vertical_ula_response(ray_zod, num_tx, spacing, atx.data());
        for (int r = 0; r < num_rx; ++r) {
          const std::complex<float> gr = g * arx[r];
          for (int t = 0; t < num_tx; ++t) {
            H[r * num_tx + t] += gr * atx[t];
          }
        }
      }
    }

    // frequency sampling: H(f_s) = sum_c Hc * exp(-j 2π f_s τ_c)
    float* dst = out + static_cast<size_t>(idx) * num_sc * num_rx * num_tx * 2;
    for (int s = 0; s < num_sc; ++s) {
      const double f = static_cast<double>(s) * sc_gap * subcarrier_hz;
      for (int r = 0; r < num_rx; ++r) {
        for (int t = 0; t < num_tx; ++t) {
          std::complex<float> acc(0.f, 0.f);
          for (int c = 0; c < n_clusters; ++c) {
            const double tau = rows[c * 6 + 0] * delay_spread_s;
            const double ph = -2.0 * kPi * f * tau;
            const std::complex<float> rot(
                static_cast<float>(std::cos(ph)),
                static_cast<float>(std::sin(ph)));
            acc += Hc[(static_cast<size_t>(c) * num_rx + r) * num_tx + t] * rot;
          }
          const size_t o =
              ((static_cast<size_t>(s) * num_rx + r) * num_tx + t) * 2;
          dst[o] = acc.real();
          dst[o + 1] = acc.imag();
        }
      }
    }
  }
}

int cdl_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
