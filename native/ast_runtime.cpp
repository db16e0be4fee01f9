// ast_runtime — native host runtime for audio_suite_tpu.
//
// The framework's device kernels are JAX/XLA; this library implements the
// CONTROL-PATH hot loops that are inherently sequential and run on the host
// (SURVEY.md §7): the tape playback trajectory (section crossings, quantized
// inertia, splice triggers, anti-click gains) and the grid DAW phase
// accumulator.  Both must be bit-identical to their NumPy twins:
//
//   * float math is IEEE f32/f64 with no contraction — build with
//     -ffp-contract=off -fno-fast-math (see utils/native_rt.py);
//   * rintf/rint use round-to-nearest-even, matching np.rint;
//   * positions are exact integer fixed point (2^-22), matching ops/fixq.py.
//
// Exactness is enforced by the test suite: the tape segment engine (driven
// by this trajectory) must match the JAX lax.scan engine at <= -120 dBFS,
// and the grid placement must equal the reference Python loop bit-for-bit.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int POS_FRAC_BITS = 22;
constexpr int64_t POS_ONE = 1ll << POS_FRAC_BITS;
constexpr float POS_ONE_F = 4194304.0f;
constexpr float POS_INV_F = 1.0f / 4194304.0f;

inline int64_t upper_bound(const int64_t* a, int64_t n, int64_t v) {
    // first index with a[i] > v  (np.searchsorted side='right')
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (a[mid] <= v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

inline int64_t lower_bound(const int64_t* a, int64_t n, int64_t v) {
    // first index with a[i] >= v  (np.searchsorted side='left')
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (a[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

// quantized inertia one-pole step in fixed-point units
// (ops/varispeed.py _speed_steps_np.step_int)
inline int64_t inertia_step(int64_t t_int, int64_t s_int, float alpha_q) {
    float d = (float)((double)(t_int - s_int) * (double)POS_INV_F);
    float m = d * alpha_q;
    return (int64_t)rint((double)m * (double)POS_ONE);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Grid Audio phase accumulator (grid_audio_app.py:786-814 semantics)
// ---------------------------------------------------------------------------
// Sequential f64 loop — identical to oracles/grid_ref.py.  Writes idx[T]
// (clipped to [0, pat_n-1]) and valid[T].
void ast_grid_placement(
    int64_t n_total, int64_t pat_n, int64_t start_idx, int32_t loop_to_master,
    const float* speed, int64_t speed_len,          // NULL -> speed 1.0
    const int64_t* resets, int64_t n_resets,        // sorted sample indices
    double pre_phase,
    int64_t* idx_out, uint8_t* valid_out)
{
    double phase = pre_phase;
    int64_t r = 0;   // next reset pointer
    std::memset(valid_out, 0, (size_t)n_total);
    for (int64_t i = 0; i < n_total; ++i) {
        idx_out[i] = 0;
        while (r < n_resets && resets[r] < i) ++r;
        if (r < n_resets && resets[r] == i) { phase = 0.0; ++r; }
        int64_t local = i - start_idx;
        if (local < 0) continue;
        if (!loop_to_master && local >= pat_n) break;
        double inc = 1.0;
        if (speed && i < speed_len) inc = (double)speed[i];
        int64_t idx = (int64_t)phase;           // phase >= 0: trunc == floor
        if (loop_to_master) idx %= pat_n;
        if (idx >= 0 && idx < pat_n) {
            idx_out[i] = idx;
            valid_out[i] = 1;
        }
        phase += inc;
        if (!loop_to_master && phase >= (double)pat_n) break;
    }
}

// ---------------------------------------------------------------------------
// Tape trajectory (ops/varispeed.py tape_trajectory semantics)
// ---------------------------------------------------------------------------
// Outputs per sample: idx0 (i32, clipped), fr (f32), ga (anti-click gain),
// gs (splice gain).  final_state: [whole, frac, speed_int, splice_rem,
// splice_idx] as int64.
void ast_tape_trajectory(
    int64_t T, int64_t n,
    const float* mod_q,
    const int64_t* starts, const int64_t* ends, const float* speeds_q,
    const uint8_t* reverse, int64_t num_secs,
    const int64_t* boundaries, int64_t nb,
    int64_t env_len, const float* splice_env,
    int32_t anticlick_on, int64_t smooth_len, float anticlick_strength,
    int32_t splice_on, int32_t inertia_on, float alpha_q,
    float initial_speed_q,
    int64_t init_whole, int64_t init_frac,
    int32_t* idx0_out, float* fr_out, float* ga_out, float* gs_out,
    int64_t* final_state)
{
    // scratch: per-sample position + section (heap)
    int64_t* whole = new int64_t[T];
    int64_t* frac = new int64_t[T];
    int32_t* sec_arr = new int32_t[T];

    int64_t w = init_whole, f = init_frac;
    float speed = initial_speed_q;
    int64_t s_int = (int64_t)rint((double)speed * (double)POS_ONE);
    int64_t i = 0;

    while (i < T) {
        w = ((w % n) + n) % n;
        int64_t sec = upper_bound(starts, num_secs, w) - 1;
        sec = std::max<int64_t>(0, std::min<int64_t>(sec, num_secs - 1));
        int64_t sec_start = starts[sec];
        int64_t sec_end = ends[sec] <= sec_start ? sec_start + 1 : ends[sec];
        float target = speeds_q[sec];
        int64_t t_int = (int64_t)rint((double)target * (double)POS_ONE);
        int64_t d_fix = (sec_end - w) * POS_ONE - f;

        int64_t acc = 0;
        int64_t j = i;
        bool crossed = false;
        while (j < T && !crossed) {
            // per-sample loop within the visit (speed updates + crossing)
            // (vectorization happens on the device side; this sequential C
            // loop replaces the chunked NumPy search at ~100x the speed)
            if (inertia_on) {
                int64_t m = inertia_step(t_int, s_int, alpha_q);
                s_int += m;
            } else {
                s_int = t_int;
            }
            float spd = (float)((double)s_int * (double)POS_INV_F);
            float r1 = spd * mod_q[j];
            int64_t inc = (int64_t)rint((double)(r1 * POS_ONE_F));
            // record pre-advance position for sample j
            int64_t fv = f + acc;
            int64_t carry = fv >> POS_FRAC_BITS;
            whole[j] = w + carry;
            frac[j] = fv - (carry << POS_FRAC_BITS);
            sec_arr[j] = (int32_t)sec;
            acc += inc;
            ++j;
            if (acc >= d_fix) crossed = true;
        }
        int64_t fv = f + acc;
        int64_t carry = fv >> POS_FRAC_BITS;
        w += carry;
        f = fv - (carry << POS_FRAC_BITS);
        i = j;
    }

    // read-index mapping + gains (mirror of the NumPy post-pass)
    for (int64_t k = 0; k < T; ++k) {
        int64_t wr = ((whole[k] % n) + n) % n;
        int64_t sec = sec_arr[k];
        int64_t sec_start = starts[sec];
        int64_t sec_end = ends[sec] <= sec_start ? sec_start + 1 : ends[sec];
        int64_t sec_len = sec_end - sec_start;
        int64_t local_w = ((wr - sec_start) % sec_len + sec_len) % sec_len;
        int64_t fq = frac[k];
        int64_t idx0;
        float fr;
        if (reverse[sec]) {
            int64_t a = sec_end - 1 - local_w;
            if (fq > 0) {
                if (a == 0) { idx0 = 0; fr = -(float)fq * POS_INV_F; }
                else { idx0 = a - 1; fr = (float)(POS_ONE - fq) * POS_INV_F; }
            } else { idx0 = a; fr = 0.0f; }
        } else {
            idx0 = sec_start + local_w;
            fr = (float)fq * POS_INV_F;
        }
        idx0 = std::max<int64_t>(0, std::min<int64_t>(idx0, n - 1));
        idx0_out[k] = (int32_t)idx0;
        fr_out[k] = fr;

        float ga = 1.0f;
        if (anticlick_on && nb > 0 && smooth_len > 0) {
            int64_t jb = lower_bound(boundaries, nb, idx0);
            int64_t dlo = (jb - 1 >= 0)
                ? std::llabs(idx0 - boundaries[jb - 1]) : (1ll << 30);
            int64_t dhi = (jb < nb)
                ? std::llabs(boundaries[jb] - idx0) : (1ll << 30);
            int64_t dmin = std::min(dlo, dhi);
            if (dmin < smooth_len) {
                float inv_smooth = (float)(1.0 / (double)smooth_len);
                float x = (float)(smooth_len - dmin) * inv_smooth;
                float g = 1.0f - anticlick_strength * x;
                ga = g > 0.0f ? g : 0.0f;
            }
        }
        ga_out[k] = ga;
        gs_out[k] = 1.0f;
    }

    // splice gains: greedy trigger suppression over boundary hits
    int64_t splice_rem = 0, splice_idx = 0;
    if (splice_on && nb > 0) {
        int64_t last_end = -1;
        for (int64_t k = 0; k < T; ++k) {
            int64_t jb = lower_bound(boundaries, nb, idx0_out[k]);
            bool hit = (jb < nb) && (boundaries[jb] == idx0_out[k]);
            if (hit && k >= last_end) {
                int64_t e = std::min(T, k + env_len);
                for (int64_t q = k; q < e; ++q)
                    gs_out[q] = splice_env[q - k];
                last_end = k + env_len;
            }
        }
        if (last_end > T) {
            splice_rem = last_end - T;
            splice_idx = env_len - splice_rem;
        }
    }

    final_state[0] = w;
    final_state[1] = f;
    final_state[2] = s_int;
    final_state[3] = splice_rem;
    final_state[4] = splice_idx;

    delete[] whole;
    delete[] frac;
    delete[] sec_arr;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Tape control tables (ops/varispeed.py tape_tables semantics)
// ---------------------------------------------------------------------------
// Compact-table form of the trajectory: emits section-visit entries, speed
// runs (arithmetic progressions of the fixed-point speed integer) and splice
// trigger times instead of per-sample arrays; the device kernel reconstructs
// positions/gains from these.  Synthesizes the wow/flutter mod internally
// with the detmath f32 twins (exact integer phase reduction, 12-bit rounded
// sines) so the host no longer materializes the mod in NumPy either.
//
// All float math must be bit-identical to the NumPy twins: build with
// -ffp-contract=off; rintf = round-half-even.

namespace {

inline float round_sig12f(float x) {
    // ops/fixq.round_sig12_np: mantissa-space round-half-up to 12 bits
    int32_t b;
    std::memcpy(&b, &x, 4);
    b = (b + 0x0800) & ~0x0FFF;
    float r;
    std::memcpy(&r, &b, 4);
    return r;
}

inline float sin_cycles_f(float x, const float* S, const float* C) {
    // ops/detmath.sin_cycles_np with caller-supplied f32 coefficients;
    // branchless quadrant select so the loop auto-vectorizes
    float x4 = x * 4.0f;
    float q = rintf(x4);
    float v = (x4 - q) * 0.25f;
    int m = (int)((int64_t)q & 3);
    float z = v * v;
    float sp = v * (S[0] + z * (S[1] + z * (S[2] + z * (S[3] + z * S[4]))));
    float cp = C[0] + z * (C[1] + z * (C[2] + z * (C[3] + z * C[4])));
    float r = (m & 1) ? cp : sp;
    return (m & 2) ? -r : r;
}

}  // namespace

extern "C" {

int32_t ast_tape_tables(
    int64_t T, int64_t n,
    // wow/flutter synthesis consts (models/tape.wow_flutter_consts)
    const uint32_t* mod_ints,      // [4] wn, wm, fn, fm
    const float* mod_flts,         // [4] winv, finv, wd, fd
    const float* phase0,           // [2] cycles
    const float* sin_coeffs,       // [10] detmath _S32 then _C32
    const int64_t* starts, const int64_t* ends, const float* speeds_q,
    const uint8_t* reverse, int64_t num_secs,
    const int64_t* boundaries, int64_t nb,
    int64_t env_len,
    int32_t splice_on, int32_t inertia_on, float alpha_q,
    float initial_speed_q,
    int64_t init_whole, int64_t init_frac,
    int64_t cap,
    int64_t* vis_start, int64_t* vis_bw, int64_t* vis_bf, int64_t* vis_sec,
    int64_t* run_start, int64_t* run_s0, int64_t* run_m,
    int64_t* trig, int64_t* counts, int64_t* final_state)
{
    const uint32_t wn = mod_ints[0], wm = mod_ints[1];
    const uint32_t fn = mod_ints[2], fm = mod_ints[3];
    const float winv = mod_flts[0], finv = mod_flts[1];
    const float wd = mod_flts[2], fd = mod_flts[3];
    const float p0w = phase0[0], p0f = phase0[1];
    const float* S = sin_coeffs;
    const float* C = sin_coeffs + 5;

    // wow/flutter mod.  The sequential (inertia) path materializes mod[T]
    // in a separate vectorizable pass; the fast path below instead reads
    // PERIOD TABLES — rw(i) = (i*wn) mod wm repeats with period wm, so one
    // rounded sine per residue (wm + fm entries, ~KBs-MBs) replaces 2*T
    // sine evaluations.  Values are bit-identical: the table entry is the
    // same float expression the per-sample loop evaluates.
    float* mod = nullptr;
    if (inertia_on) {
        mod = new float[T];
        uint32_t rw = 0, rf = 0;
        float* phw = new float[T];
        float* phf = new float[T];
        for (int64_t i = 0; i < T; ++i) {
            phw[i] = p0w + (float)rw * winv;
            phf[i] = p0f + (float)rf * finv;
            rw += wn; if (rw >= wm) rw -= wm;
            rf += fn; if (rf >= fm) rf -= fm;
        }
        for (int64_t i = 0; i < T; ++i) {
            float sw = round_sig12f(sin_cycles_f(phw[i], S, C));
            float sf = round_sig12f(sin_cycles_f(phf[i], S, C));
            float mv = 1.0f + wd * sw + fd * sf;
            mv = mv < 0.1f ? 0.1f : (mv > 3.0f ? 3.0f : mv);
            mod[i] = rintf(mv * POS_ONE_F) * POS_INV_F;
        }
        delete[] phw;
        delete[] phf;
    }

    // pass 2: sequential trajectory emitting tables
    int64_t nv = 0, nr = 0, nt = 0;
    bool overflow = false;

    int64_t w = init_whole, f = init_frac;
    float speed = initial_speed_q;
    int64_t s_int = (int64_t)rint((double)speed * (double)POS_ONE);

    // AP run tracking over the post-update speed sequence
    int64_t rb = -1, rs0 = 0, rmv = 0, rlen = 0, rlast = 0;
    auto flush_run = [&]() {
        if (rb < 0) return;
        if (nr < cap) {
            run_start[nr] = rb;
            run_s0[nr] = rs0;
            run_m[nr] = rlen > 1 ? rmv : 0;
        } else overflow = true;
        ++nr;
        rb = -1;
    };
    auto push_speed = [&](int64_t j, int64_t s) {
        if (rb < 0) { rb = j; rs0 = s; rlen = 1; rlast = s; return; }
        int64_t d = s - rlast;
        if (rlen == 1) { rmv = d; ++rlen; rlast = s; return; }
        if (d == rmv) { ++rlen; rlast = s; return; }
        flush_run();
        rb = j; rs0 = s; rlen = 1; rlast = s;
    };

    int64_t last_end = -1;     // splice greedy suppression state
    int64_t i = 0;

    if (!inertia_on) {
        // -------- fast path: constant speed within a visit ---------------
        // Decisions are bit-identical to the sequential loop below: the
        // per-sample speed is the section target, so inc[j] =
        // rint((spd*mod[j])*2^22) vectorizes, the crossing is the first
        // inclusive prefix >= d_fix, and splice triggers are found by
        // binary-searching the prefix for the <=2-whole-sample windows
        // where idx0 can equal a boundary, then applying the EXACT
        // per-sample idx0 rule inside the window (reverse sections
        // included).  The sequential path remains for inertia_on.
        int64_t* I = new int64_t[T];          // inclusive prefix per visit
        int32_t* incc = new int32_t[65536];

        // period tables of the 12-bit-rounded sines (wm/fm residues; the
        // phase sequences are (i*wn) mod wm so each residue's sine value
        // is a constant of the render).  Guard against absurd periods
        // (non-audio sample rates) with a T-bounded cap: past that, the
        // direct per-sample fill is cheaper anyway.
        const int64_t TAB_CAP = 1 << 23;
        bool tab_ok = (int64_t)wm + (int64_t)fm <= TAB_CAP
                      && (int64_t)wm + (int64_t)fm <= 2 * T + 16;
        float* swt = nullptr;
        float* sft = nullptr;
        if (tab_ok) {
            swt = new float[wm];
            sft = new float[fm];
            for (uint32_t r = 0; r < wm; ++r)
                swt[r] = round_sig12f(
                    sin_cycles_f(p0w + (float)(int32_t)r * winv, S, C));
            for (uint32_t r = 0; r < fm; ++r)
                sft[r] = round_sig12f(
                    sin_cycles_f(p0f + (float)(int32_t)r * finv, S, C));
        }
        // fused per-chunk inc fill: mod -> inc in one vectorizable sweep,
        // reading the period tables in affine runs between wraps
        auto fill_inc = [&](int64_t j0, int64_t kn, float spd_f) {
            if (tab_ok) {
                uint32_t rw = (uint32_t)(((uint64_t)j0 * wn) % wm);
                uint32_t rf = (uint32_t)(((uint64_t)j0 * fn) % fm);
                int64_t k = 0;
                while (k < kn) {
                    int64_t mw = (int64_t)((wm - rw + wn - 1) / wn);
                    int64_t mf = (int64_t)((fm - rf + fn - 1) / fn);
                    int64_t run = std::min(std::min(mw, mf), kn - k);
                    const float* pw = swt + rw;
                    const float* pf = sft + rf;
                    for (int64_t q = 0; q < run; ++q) {  // vectorizable
                        float sw = pw[(uint64_t)q * wn];
                        float sf = pf[(uint64_t)q * fn];
                        float mv = 1.0f + wd * sw + fd * sf;
                        mv = mv < 0.1f ? 0.1f : (mv > 3.0f ? 3.0f : mv);
                        float md = rintf(mv * POS_ONE_F) * POS_INV_F;
                        float r1 = spd_f * md;
                        incc[k + q] = (int32_t)rintf(r1 * POS_ONE_F);
                    }
                    k += run;
                    rw = (uint32_t)((rw + (uint64_t)run * wn) % wm);
                    rf = (uint32_t)((rf + (uint64_t)run * fn) % fm);
                }
            } else {
                // direct per-sample fill (rare: gigantic periods)
                uint32_t rw = (uint32_t)(((uint64_t)j0 * wn) % wm);
                uint32_t rf = (uint32_t)(((uint64_t)j0 * fn) % fm);
                for (int64_t k = 0; k < kn; ++k) {
                    float sw = round_sig12f(sin_cycles_f(
                        p0w + (float)(int32_t)rw * winv, S, C));
                    float sf = round_sig12f(sin_cycles_f(
                        p0f + (float)(int32_t)rf * finv, S, C));
                    float mv = 1.0f + wd * sw + fd * sf;
                    mv = mv < 0.1f ? 0.1f : (mv > 3.0f ? 3.0f : mv);
                    float md = rintf(mv * POS_ONE_F) * POS_INV_F;
                    incc[k] = (int32_t)rintf((spd_f * md) * POS_ONE_F);
                    rw += wn; if (rw >= wm) rw -= wm;
                    rf += fn; if (rf >= fm) rf -= fm;
                }
            }
        };

        while (i < T) {
            w = ((w % n) + n) % n;
            int64_t sec = upper_bound(starts, num_secs, w) - 1;
            sec = std::max<int64_t>(0, std::min<int64_t>(sec, num_secs - 1));
            int64_t sec_start = starts[sec];
            int64_t sec_end = ends[sec] <= sec_start ? sec_start + 1
                                                     : ends[sec];
            float target = speeds_q[sec];
            int64_t t_int = (int64_t)rint((double)target * (double)POS_ONE);
            int64_t d_fix = (sec_end - w) * POS_ONE - f;

            if (nv < cap) {
                vis_start[nv] = i; vis_bw[nv] = w; vis_bf[nv] = f;
                vis_sec[nv] = sec;
            } else overflow = true;
            ++nv;

            // one constant run per visit, merged when it continues the
            // previous constant run (same emission as the NumPy twin's
            // inertia-off branch; the parity test compares the EXPANDED
            // per-sample speeds, which match either way)
            if (!(nr > 0 && nr <= cap && run_s0[std::min(nr, cap) - 1] == t_int
                  && run_m[std::min(nr, cap) - 1] == 0)) {
                if (nr < cap) {
                    run_start[nr] = i; run_s0[nr] = t_int; run_m[nr] = 0;
                } else overflow = true;
                ++nr;
            }
            // exact same value chain as the scalar loop: spd_f is the
            // exact power-of-two scale of t_int, inc rounds once
            float spd_f = (float)((double)t_int * (double)POS_INV_F);

            int64_t acc = 0;
            int64_t j = i;
            bool crossed = false;
            int64_t jend = T;
            while (j < T && !crossed) {
                int64_t kn = std::min<int64_t>(65536, T - j);
                fill_inc(j, kn, spd_f);
                for (int64_t k = 0; k < kn; ++k) {   // sequential adds
                    acc += (int64_t)incc[k];
                    I[j + k] = acc;
                    if (acc >= d_fix) { jend = j + k + 1; crossed = true;
                                        break; }
                }
                if (!crossed) j += kn;
            }
            if (!crossed) jend = T;

            if (splice_on && nb > 0) {
                // boundaries reachable in this visit: idx0 stays inside
                // [sec_start, sec_end).  Iterate them in TIME order so the
                // greedy last_end suppression sees hits exactly as the
                // per-sample loop would: forward sections hit increasing b,
                // reverse sections hit DECREASING b.
                int64_t b0 = lower_bound(boundaries, nb, sec_start);
                int64_t b1 = lower_bound(boundaries, nb, sec_end);  // excl
                uint8_t rev = reverse[sec];
                for (int64_t step = 0; step < b1 - b0; ++step) {
                    int64_t bi = rev ? (b1 - 1 - step) : (b0 + step);
                    int64_t b = boundaries[bi];
                    // whole-position window where idx0 can equal b
                    int64_t Wlo, Wn;   // first whole value, window width
                    if (rev) {
                        Wlo = sec_start + (sec_end - 2 - b);
                        Wn = 2;                    // a in {b+1, b}
                        if (Wlo < w) { Wn -= (w - Wlo); Wlo = w; }
                        if (Wn <= 0) continue;
                    } else {
                        if (b < w) continue;
                        Wlo = b; Wn = 1;
                    }
                    // excl prefix range [lo, hi): excl_j = I[j-1] (0 at i)
                    int64_t lo = (Wlo - w) * POS_ONE - f;
                    int64_t hi = lo + Wn * POS_ONE;
                    if (lo < 0) lo = 0;
                    // first j in [i, jend) with excl_j >= lo:
                    // excl_i = 0; excl_j = I[j-1] for j > i
                    int64_t ja;
                    if (lo <= 0) ja = i;
                    else {
                        // search I[i .. jend-2] for >= lo -> j = pos + 1
                        int64_t klo = i, khi = jend - 1;  // I index range
                        // lower_bound over I[klo..khi)
                        int64_t cnt = khi - klo, first = klo;
                        while (cnt > 0) {
                            int64_t step = cnt / 2, mid = first + step;
                            if (I[mid] < lo) { first = mid + 1;
                                               cnt -= step + 1; }
                            else cnt = step;
                        }
                        ja = first + 1;        // I[first] = excl_{first+1}
                        if (first == khi) ja = jend;  // none
                    }
                    // exact per-sample rule inside the window
                    for (int64_t jj = ja; jj < jend; ++jj) {
                        int64_t excl = (jj == i) ? 0 : I[jj - 1];
                        if (excl >= hi) break;
                        int64_t fv = f + excl;
                        int64_t carry = fv >> POS_FRAC_BITS;
                        int64_t wj = w + carry;
                        int64_t fj = fv - (carry << POS_FRAC_BITS);
                        int64_t local_w = wj - sec_start;
                        int64_t idx0;
                        if (rev) {
                            int64_t a = sec_end - 1 - local_w;
                            idx0 = (fj > 0) ? (a == 0 ? 0 : a - 1) : a;
                        } else {
                            idx0 = sec_start + local_w;
                        }
                        idx0 = std::max<int64_t>(
                            0, std::min<int64_t>(idx0, n - 1));
                        if (idx0 == b && jj >= last_end) {
                            if (nt < cap) trig[nt] = jj; else overflow = true;
                            ++nt;
                            last_end = jj + env_len;
                        }
                    }
                }
            }

            int64_t fv = f + (crossed ? I[jend - 1] : acc);
            int64_t carry = fv >> POS_FRAC_BITS;
            w += carry;
            f = fv - (carry << POS_FRAC_BITS);
            s_int = t_int;
            i = jend;
        }
        delete[] I;
        delete[] incc;
        delete[] swt;
        delete[] sft;

        int64_t splice_rem2 = 0, splice_idx2 = 0;
        if (last_end > T) {
            splice_rem2 = last_end - T;
            splice_idx2 = env_len - splice_rem2;
        }
        counts[0] = nv; counts[1] = nr; counts[2] = nt;
        final_state[0] = w;
        final_state[1] = f;
        final_state[2] = s_int;
        final_state[3] = splice_rem2;
        final_state[4] = splice_idx2;
        return overflow ? 1 : 0;
    }

    while (i < T) {
        w = ((w % n) + n) % n;
        int64_t sec = upper_bound(starts, num_secs, w) - 1;
        sec = std::max<int64_t>(0, std::min<int64_t>(sec, num_secs - 1));
        int64_t sec_start = starts[sec];
        int64_t sec_end = ends[sec] <= sec_start ? sec_start + 1 : ends[sec];
        float target = speeds_q[sec];
        int64_t t_int = (int64_t)rint((double)target * (double)POS_ONE);
        int64_t d_fix = (sec_end - w) * POS_ONE - f;

        if (nv < cap) {
            vis_start[nv] = i; vis_bw[nv] = w; vis_bf[nv] = f;
            vis_sec[nv] = sec;
        } else overflow = true;
        ++nv;

        int64_t acc = 0;
        int64_t j = i;
        bool crossed = false;
        uint8_t rev = reverse[sec];
        // amortized boundary-hit pointer: idx0 is monotone within a visit
        // (increasing forward, decreasing reverse), so one scan pointer
        // replaces a per-sample binary search
        int64_t bp = 0;
        bool bp_init = false;
        while (j < T && !crossed) {
            if (inertia_on) {
                s_int += inertia_step(t_int, s_int, alpha_q);
            } else {
                s_int = t_int;
            }
            push_speed(j, s_int);
            float spd = (float)((double)s_int * (double)POS_INV_F);
            float r1 = spd * mod[j];
            int64_t inc = (int64_t)rint((double)(r1 * POS_ONE_F));

            if (splice_on && nb > 0) {
                // idx0 for this sample (pre-advance position).  Within a
                // visit wj stays in [sec_start, sec_end) ⊂ [0, n): the
                // entry w is wrapped and section-resolved, positions only
                // advance, and the visit ends before wj reaches sec_end —
                // so the wrap/local mod reductions are identities.
                int64_t fv = f + acc;
                int64_t carry = fv >> POS_FRAC_BITS;
                int64_t wj = w + carry;
                int64_t fj = fv - (carry << POS_FRAC_BITS);
                int64_t local_w = wj - sec_start;
                int64_t idx0;
                if (rev) {
                    int64_t a = sec_end - 1 - local_w;
                    idx0 = (fj > 0) ? (a == 0 ? 0 : a - 1) : a;
                } else {
                    idx0 = sec_start + local_w;
                }
                idx0 = std::max<int64_t>(0, std::min<int64_t>(idx0, n - 1));
                if (!bp_init) {
                    bp = rev ? lower_bound(boundaries, nb, idx0 + 1) - 1
                             : lower_bound(boundaries, nb, idx0);
                    bp_init = true;
                }
                bool hit;
                if (rev) {
                    while (bp >= 0 && boundaries[bp] > idx0) --bp;
                    hit = bp >= 0 && boundaries[bp] == idx0;
                } else {
                    while (bp < nb && boundaries[bp] < idx0) ++bp;
                    hit = bp < nb && boundaries[bp] == idx0;
                }
                if (hit && j >= last_end) {
                    if (nt < cap) trig[nt] = j; else overflow = true;
                    ++nt;
                    last_end = j + env_len;
                }
            }

            acc += inc;
            ++j;
            if (acc >= d_fix) crossed = true;
        }
        int64_t fv = f + acc;
        int64_t carry = fv >> POS_FRAC_BITS;
        w += carry;
        f = fv - (carry << POS_FRAC_BITS);
        i = j;
    }
    flush_run();
    delete[] mod;

    int64_t splice_rem = 0, splice_idx = 0;
    if (last_end > T) {
        splice_rem = last_end - T;
        splice_idx = env_len - splice_rem;
    }
    counts[0] = nv; counts[1] = nr; counts[2] = nt;
    final_state[0] = w;
    final_state[1] = f;
    final_state[2] = s_int;
    final_state[3] = splice_rem;
    final_state[4] = splice_idx;
    return overflow ? 1 : 0;
}

}  // extern "C"
