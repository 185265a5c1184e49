// Single-core CPU reference implementation of the fused banded realign
// (forward + backward/EM + reverse-MEA) over BandedBatch arrays.
//
// Purpose: the MEASURED baseline for bench.py's vs_baseline figure — an
// optimized single-core C implementation of exactly the workload the TPU
// kernel runs (the complete `cactus_realign` + Baum-Welch E-step
// equivalent, reference nanopore/analyses/utils.py:587,509-523).  The
// recurrences mirror nanopore_tpu/ops/pairhmm.py (_make_fwd_step /
// _make_bwd_step) and ops/mea.py (_realign_fused_single) cell for cell;
// parity is asserted against the JAX kernel in tests/test_native.py.
//
// Unlike the rematerialised TPU path this stores the full forward band
// lattice (cheaper FLOPs on a CPU with ample DRAM), i.e. it is a FAIR,
// efficient CPU design rather than a translation of the TPU kernel.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 (see
// nanopore_tpu/runtime/native_pairhmm.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int NS = 5;
constexpr float NEG = -1e30f;

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

inline double clampd(double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// One read: banded scaled forward + backward with EM expectation
// accumulation + reverse-MEA decode.
//
//   xc/yc/xn/yn: (K+1, W) int8 band codes (sentinel 4 out of range)
//   offsets:     (K+1,) int32 band offsets
//   m, n, kend:  read length, ref length, m + n
//   t:           (25,) f32 transitions [from*5+to]
//   e_match:     (25,) f32 match emissions [x*5+y]
//   e_gap:       (25,) f32 gap emissions [state*5+base]
//   outputs: loglik/score scalars, trans (25,), emis16 (16,),
//            edel (8,), eins (8,), dirs (K+1, W) int8
void pairhmm_cpu_realign_one(
    const int8_t* xc, const int8_t* yc, const int8_t* xn, const int8_t* yn,
    const int32_t* offsets, int64_t K1, int32_t W,
    int32_t m, int32_t n, int32_t kend,
    const float* t, const float* e_match, const float* e_gap,
    float gap_gamma, float match_gamma, int32_t emit_em,
    float* loglik_out, float* score_out, float* trans_out,
    float* emis16_out, float* edel_out, float* eins_out, int8_t* dirs,
    float* gamma_out /* (K1, W) match posteriors, or nullptr */) {
    const int64_t K = K1 - 1;
    const int64_t SW = (int64_t)NS * W;

    // ---- forward: store the scaled band lattice + per-diag log-scales
    std::vector<float> f((size_t)K1 * SW, 0.0f);
    // log-scales in double: the EM factors exp(lsf+lsb-loglik) put
    // running-sum rounding straight into the exponent (see
    // ops/pairhmm.py _kahan_add)
    std::vector<double> lsf((size_t)K1, 0.0);
    std::vector<float> cur(SW), prev(SW), prevprev(SW);

    for (int s = 0; s < NS; ++s) {
        prev[(size_t)s * W] = 1.0f / NS;  // start tile at band index 0
        f[(size_t)s * W] = 1.0f / NS;
    }
    std::memset(prevprev.data(), 0, SW * sizeof(float));
    double ls1 = 0.0, ls2 = 0.0, loglik = 0.0;

    for (int64_t k = 1; k <= K; ++k) {
        const int32_t ok = offsets[k];
        const int32_t d1 = ok - offsets[k - 1];
        const int32_t okm2 = (k >= 2) ? offsets[k - 2] : 0;
        const int32_t d2 = ok - okm2 - 1;
        const float r = (float)std::exp(clampd(ls2 - ls1, -80.0, 80.0));
        const int8_t* xck = xc + k * W;
        const int8_t* yck = yc + k * W;

        float scale = 0.0f;
        for (int w = 0; w < W; ++w) {
            const int32_t j = ok + w;
            const int32_t i = (int32_t)k - j;
            const bool valid = j >= 0 && j <= n && i >= 0 && i <= m;
            float nm = 0, nd1 = 0, ni1 = 0, nd2 = 0, ni2 = 0;
            if (valid) {
                const int wd = w + d2;        // diag pred index
                const int wl = w + d1 - 1;    // left pred index
                const int wu = w + d1;        // up pred index
                const float em = e_match[xck[w] * 5 + yck[w]];
                const float gx1 = e_gap[1 * 5 + xck[w]];
                const float gx3 = e_gap[3 * 5 + xck[w]];
                const float gy2 = e_gap[2 * 5 + yck[w]];
                const float gy4 = e_gap[4 * 5 + yck[w]];
                float accm = 0, accd1 = 0, acci1 = 0, accd2 = 0, acci2 = 0;
                for (int s = 0; s < NS; ++s) {
                    const float dp = (wd >= 0 && wd < W)
                                         ? prevprev[(size_t)s * W + wd] * r
                                         : 0.0f;
                    const float lp =
                        (wl >= 0 && wl < W) ? prev[(size_t)s * W + wl] : 0.0f;
                    const float up =
                        (wu >= 0 && wu < W) ? prev[(size_t)s * W + wu] : 0.0f;
                    accm += t[s * 5 + 0] * dp;
                    accd1 += t[s * 5 + 1] * lp;
                    acci1 += t[s * 5 + 2] * up;
                    accd2 += t[s * 5 + 3] * lp;
                    acci2 += t[s * 5 + 4] * up;
                }
                nm = em * accm;
                nd1 = gx1 * accd1;
                ni1 = gy2 * acci1;
                nd2 = gx3 * accd2;
                ni2 = gy4 * acci2;
            }
            cur[(size_t)0 * W + w] = nm;
            cur[(size_t)1 * W + w] = nd1;
            cur[(size_t)2 * W + w] = ni1;
            cur[(size_t)3 * W + w] = nd2;
            cur[(size_t)4 * W + w] = ni2;
            for (int s = 0; s < NS; ++s)
                scale = std::max(scale, cur[(size_t)s * W + w]);
        }
        const float safe = scale > 0 ? scale : 1.0f;
        const float inv = 1.0f / safe;
        for (int64_t q = 0; q < SW; ++q) cur[q] *= inv;
        const double ls_new = ls1 + std::log((double)safe);
        if ((int32_t)k == kend) {
            float fin = 0;
            for (int s = 0; s < NS; ++s) fin += cur[(size_t)s * W];
            loglik += std::log((double)std::max(fin, 1e-37f)) + ls_new;
        }
        std::memcpy(f.data() + (size_t)k * SW, cur.data(),
                    SW * sizeof(float));
        lsf[k] = ls_new;
        std::swap(prevprev, prev);
        std::swap(prev, cur);
        ls2 = ls1;
        ls1 = ls_new;
    }
    *loglik_out = (float)loglik;

    // ---- backward + EM + reverse-MEA (k = K .. 0) ----
    std::vector<float> b1(SW, 0.0f), b2(SW, 0.0f), bn(SW), dest(SW);
    std::vector<float> u1(W, NEG), u2(W, NEG);
    std::vector<float> gm1(W, 0.0f), gm2(W, 0.0f), gd1(W, 0.0f),
        gi1(W, 0.0f);
    std::vector<float> nu(W), ngm(W), ngd(W), ngi(W);
    double lsb1 = 0.0, lsb2 = 0.0;
    double trans[25] = {0}, e16[16] = {0}, edel[8] = {0}, eins[8] = {0};

    for (int64_t k = K; k >= 0; --k) {
        const int32_t ok = offsets[k];
        const int32_t d1n = (k < K) ? offsets[k + 1] - offsets[k] : 0;
        const int32_t d2n2 =
            (k + 2 <= K) ? offsets[k + 2] - offsets[k] - 1 : 0;
        const int8_t* xnk = xn + k * W;
        const int8_t* ynk = yn + k * W;
        const int8_t* xck = xc + k * W;
        const int8_t* yck = yc + k * W;
        const float r = (float)std::exp(clampd(lsb2 - lsb1, -80.0, 80.0));
        const bool is_end = (int32_t)k == kend;

        // destination values aligned onto the current band
        for (int w = 0; w < W; ++w) {
            const int wm = w - d2n2;      // shift -d2n2
            const int wdl = w + 1 - d1n;  // shift 1-d1n (delete dests)
            const int win = w - d1n;      // shift -d1n (insert dests)
            const float em_n = e_match[xnk[w] * 5 + ynk[w]];
            const float bM =
                (wm >= 0 && wm < W) ? b2[(size_t)0 * W + wm] * r * em_n
                                    : 0.0f;
            const float bD1 = (wdl >= 0 && wdl < W)
                                  ? b1[(size_t)1 * W + wdl] *
                                        e_gap[1 * 5 + xnk[w]]
                                  : 0.0f;
            const float bD2 = (wdl >= 0 && wdl < W)
                                  ? b1[(size_t)3 * W + wdl] *
                                        e_gap[3 * 5 + xnk[w]]
                                  : 0.0f;
            const float bI1 = (win >= 0 && win < W)
                                  ? b1[(size_t)2 * W + win] *
                                        e_gap[2 * 5 + ynk[w]]
                                  : 0.0f;
            const float bI2 = (win >= 0 && win < W)
                                  ? b1[(size_t)4 * W + win] *
                                        e_gap[4 * 5 + ynk[w]]
                                  : 0.0f;
            dest[(size_t)0 * W + w] = bM;
            dest[(size_t)1 * W + w] = bD1;
            dest[(size_t)2 * W + w] = bI1;
            dest[(size_t)3 * W + w] = bD2;
            dest[(size_t)4 * W + w] = bI2;
        }
        float scale = 0.0f;
        for (int w = 0; w < W; ++w) {
            const int32_t j = ok + w;
            const int32_t i = (int32_t)k - j;
            const bool valid = j >= 0 && j <= n && i >= 0 && i <= m;
            for (int s = 0; s < NS; ++s) {
                float acc = 0;
                for (int tt = 0; tt < NS; ++tt)
                    acc += t[s * 5 + tt] * dest[(size_t)tt * W + w];
                float v = valid ? acc : 0.0f;
                if (is_end) v = (w == 0) ? 1.0f : 0.0f;
                bn[(size_t)s * W + w] = v;
                scale = std::max(scale, v);
            }
        }
        const float safe = scale > 0 ? scale : 1.0f;
        const float inv = 1.0f / safe;
        for (int64_t q = 0; q < SW; ++q) bn[q] *= inv;
        const double lsb_new = is_end ? 0.0 : lsb1 + std::log((double)safe);

        // EM transition expectations (moves out of diagonal k)
        const float* fk = f.data() + (size_t)k * SW;
        const float factor_trans = (float)std::exp(
            clampd(lsf[k] + lsb1 - loglik, -80.0, 80.0));
        if (emit_em && factor_trans > 0) {
            for (int s = 0; s < NS; ++s) {
                for (int tt = 0; tt < NS; ++tt) {
                    float acc = 0;
                    const float* fs = fk + (size_t)s * W;
                    const float* dt = dest.data() + (size_t)tt * W;
                    for (int w = 0; w < W; ++w) acc += fs[w] * dt[w];
                    trans[s * 5 + tt] +=
                        (double)(t[s * 5 + tt] * acc * factor_trans);
                }
            }
        }
        // posterior occupancy + emission expectations + MEA gammas
        const float g_factor = (float)std::exp(
            clampd(lsf[k] + lsb_new - loglik, -80.0, 80.0));
        for (int w = 0; w < W; ++w) {
            const float g0 = fk[(size_t)0 * W + w] * bn[(size_t)0 * W + w] *
                             g_factor;
            const float g1 = fk[(size_t)1 * W + w] * bn[(size_t)1 * W + w] *
                             g_factor;
            const float g2 = fk[(size_t)2 * W + w] * bn[(size_t)2 * W + w] *
                             g_factor;
            const float g3 = fk[(size_t)3 * W + w] * bn[(size_t)3 * W + w] *
                             g_factor;
            const float g4 = fk[(size_t)4 * W + w] * bn[(size_t)4 * W + w] *
                             g_factor;
            if (emit_em) {
                const int xcv = xck[w], ycv = yck[w];
                if (xcv < 4 && ycv < 4) e16[xcv * 4 + ycv] += (double)g0;
                if (xcv < 4) {
                    edel[0 * 4 + xcv] += (double)g1;
                    edel[1 * 4 + xcv] += (double)g3;
                }
                if (ycv < 4) {
                    eins[0 * 4 + ycv] += (double)g2;
                    eins[1 * 4 + ycv] += (double)g4;
                }
            }
            ngm[w] = g0;
            ngd[w] = g1 + g3;
            ngi[w] = g2 + g4;
        }
        if (gamma_out) {
            std::memcpy(gamma_out + (size_t)k * W, ngm.data(),
                        W * sizeof(float));
        }
        // reverse MEA over this diagonal
        int8_t* dk = dirs + (size_t)k * W;
        for (int w = 0; w < W; ++w) {
            const int wm = w - d2n2;
            const int wdl = w + 1 - d1n;
            const int win = w - d1n;
            const float diag_t = (wm >= 0 && wm < W)
                                     ? u2[wm] + gm2[wm] - match_gamma
                                     : NEG;
            const float left_t = (wdl >= 0 && wdl < W)
                                     ? u1[wdl] + gap_gamma * gd1[wdl]
                                     : NEG;
            const float up_t = (win >= 0 && win < W)
                                   ? u1[win] + gap_gamma * gi1[win]
                                   : NEG;
            float best = diag_t;
            int8_t choice = 0;
            if (left_t > best) {
                best = left_t;
                choice = 1;
            }
            if (up_t > best) {
                best = up_t;
                choice = 2;
            }
            const int32_t j = ok + w;
            const int32_t i = (int32_t)k - j;
            const bool valid = j >= 0 && j <= n && i >= 0 && i <= m;
            if (!valid) best = NEG;
            float new_u = is_end ? ((w == 0) ? 0.0f : NEG) : best;
            if (!(valid && new_u > NEG / 2) || is_end) choice = 3;
            dk[w] = choice;
            nu[w] = new_u;
        }
        std::swap(u2, u1);
        std::swap(u1, nu);
        std::swap(gm2, gm1);
        std::swap(gm1, ngm);
        std::swap(gd1, ngd);
        std::swap(gi1, ngi);
        std::swap(b2, b1);
        std::swap(b1, bn);
        lsb2 = lsb1;
        lsb1 = lsb_new;
    }
    *score_out = u1[0];
    for (int q = 0; q < 25; ++q) trans_out[q] = (float)trans[q];
    for (int q = 0; q < 16; ++q) emis16_out[q] = (float)e16[q];
    for (int q = 0; q < 8; ++q) edel_out[q] = (float)edel[q];
    for (int q = 0; q < 8; ++q) eins_out[q] = (float)eins[q];
}

// Batch driver: runs B reads sequentially on ONE core, returns nothing;
// caller times the call.
void pairhmm_cpu_realign_batch(
    const int8_t* xc, const int8_t* yc, const int8_t* xn, const int8_t* yn,
    const int32_t* offsets, int64_t B, int64_t K1, int32_t W,
    const int32_t* m, const int32_t* n, const int32_t* kend,
    const float* t, const float* e_match, const float* e_gap,
    float gap_gamma, float match_gamma, int32_t emit_em,
    float* loglik_out, float* score_out, float* trans_out,
    float* emis16_out, float* edel_out, float* eins_out, int8_t* dirs,
    float* gamma_out /* (B, K1, W) or nullptr */) {
    const int64_t band = K1 * W;
    for (int64_t b = 0; b < B; ++b) {
        pairhmm_cpu_realign_one(
            xc + b * band, yc + b * band, xn + b * band, yn + b * band,
            offsets + b * K1, K1, W, m[b], n[b], kend[b], t, e_match,
            e_gap, gap_gamma, match_gamma, emit_em,
            loglik_out + b, score_out + b,
            trans_out + b * 25, emis16_out + b * 16, edel_out + b * 8,
            eins_out + b * 8, dirs + b * band,
            gamma_out ? gamma_out + b * band : nullptr);
    }
}

}  // extern "C"
