"""Loader for the native host runtime (native/ast_runtime.cpp).

Compiles the C++ library on first use (g++, cached by source hash) and
exposes ctypes wrappers.  Float semantics are pinned with
-ffp-contract=off -fno-fast-math so every f32/f64 operation rounds exactly
like the NumPy twins; the engines fall back to the NumPy implementations
when no compiler is available (import never fails)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "ast_runtime.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")

_lib = None
_tried = False

# -frounding-math is deliberately ABSENT: it exists to support programs
# that change the dynamic FP rounding mode (we never do — NumPy, JAX and
# this library all run in IEEE round-to-nearest-even), and it blocks the
# compiler from lowering rintf to the single-instruction vroundps with an
# immediate nearest-even mode — measured 3.5x on the sine/rounding loops.
# Results are bit-identical: vroundps(nearest-even) == rintf in the
# default mode.
_CFLAGS = ["-O3", "-shared", "-fPIC", "-ffp-contract=off",
           "-fno-fast-math"]
# -march=native lets the hot loops vectorize (roundss/vroundps for rintf —
# still IEEE round-half-even, so results are bit-identical to the portable
# build); the library is always compiled on the machine it runs on, and the
# portable flag set is the fallback if the native one fails to build.
_FLAG_SETS = [_CFLAGS + ["-march=native"], _CFLAGS]


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        src = f.read()
    os.makedirs(_BUILD_DIR, exist_ok=True)
    for flags in _FLAG_SETS:
        tag = hashlib.sha256(src + " ".join(flags).encode()).hexdigest()[:16]
        so = os.path.join(_BUILD_DIR, f"libast_runtime_{tag}.so")
        if os.path.exists(so):
            return so
        tmp = so + ".tmp"
        try:
            subprocess.run(["g++", *flags, "-o", tmp, _SRC], check=True,
                           capture_output=True, timeout=120)
            os.replace(tmp, so)
            return so
        except Exception:
            continue
    return None


def get_lib():
    """The loaded library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("AST_DISABLE_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    f32 = ctypes.c_float
    f64 = ctypes.c_double
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.ast_grid_placement.argtypes = [
        i64, i64, i64, i32,
        ctypes.c_void_p, i64,          # speed (nullable)
        ctypes.c_void_p, i64,          # resets (nullable)
        f64, p_i64, p_u8]
    lib.ast_grid_placement.restype = None

    lib.ast_tape_trajectory.argtypes = [
        i64, i64, p_f32,
        p_i64, p_i64, p_f32, p_u8, i64,
        ctypes.c_void_p, i64,
        i64, p_f32,
        i32, i64, f32,
        i32, i32, f32, f32,
        i64, i64,
        p_i32, p_f32, p_f32, p_f32, p_i64]
    lib.ast_tape_trajectory.restype = None

    p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.ast_tape_tables.argtypes = [
        i64, i64,
        p_u32, p_f32, p_f32, p_f32,    # mod ints/flts/phase0, sin coeffs
        p_i64, p_i64, p_f32, p_u8, i64,
        ctypes.c_void_p, i64,
        i64,
        i32, i32, f32, f32,
        i64, i64, i64,
        p_i64, p_i64, p_i64, p_i64,
        p_i64, p_i64, p_i64,
        p_i64, p_i64, p_i64]
    lib.ast_tape_tables.restype = i32

    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def grid_placement(n_total: int, pat_n: int, start_idx: int, loop: bool,
                   speed, resets, pre_phase: float):
    """C twin of the reference phase-accumulator loop; returns
    (idx i64[n_total], valid bool[n_total]) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    idx = np.zeros(n_total, np.int64)
    valid = np.zeros(n_total, np.uint8)
    sp = None
    sp_len = 0
    if speed is not None:
        sp = np.ascontiguousarray(speed, np.float32)
        sp_len = len(sp)
    rs = np.ascontiguousarray(sorted(resets), np.int64) if resets else None
    lib.ast_grid_placement(
        n_total, pat_n, start_idx, 1 if loop else 0,
        sp.ctypes.data if sp is not None else None, sp_len,
        rs.ctypes.data if rs is not None else None,
        0 if rs is None else len(rs),
        float(pre_phase), idx, valid)
    return idx, valid.astype(bool)


def _detmath_sin_coeffs():
    from ..ops import detmath
    return np.asarray(list(detmath._S32) + list(detmath._C32), np.float32)


def tape_tables(T: int, n: int, mod_consts, starts, ends, speeds_q, reverse,
                boundaries, splice_env_len: int, consts):
    """C twin of ops/varispeed.tape_tables (compact control tables for the
    device tape engine).  Synthesizes the wow/flutter mod internally with
    the detmath f32 twins (no NumPy mod materialization).  Returns the same
    dict or None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ast_tape_tables"):
        return None
    ints, flts, ph0 = mod_consts
    ints = np.ascontiguousarray(ints, np.uint32)
    flts = np.ascontiguousarray(flts, np.float32)
    ph0 = np.ascontiguousarray(ph0, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    speeds_q = np.ascontiguousarray(speeds_q, np.float32)
    reverse = np.ascontiguousarray(reverse, np.uint8)
    bnd = np.ascontiguousarray(boundaries, np.int64)
    coeffs = _detmath_sin_coeffs()

    cap = 4096
    while True:
        vis = [np.zeros(cap, np.int64) for _ in range(4)]
        run = [np.zeros(cap, np.int64) for _ in range(3)]
        trg = np.zeros(cap, np.int64)
        counts = np.zeros(3, np.int64)
        fin = np.zeros(5, np.int64)
        rc = lib.ast_tape_tables(
            int(T), int(n), ints, flts, ph0, coeffs,
            starts, ends, speeds_q, reverse, len(starts),
            bnd.ctypes.data if len(bnd) else None, len(bnd),
            int(splice_env_len),
            1 if consts.splice_on else 0, 1 if consts.inertia_on else 0,
            np.float32(consts.alpha_q), np.float32(consts.initial_speed_q),
            0, 0, cap,
            vis[0], vis[1], vis[2], vis[3],
            run[0], run[1], run[2], trg, counts, fin)
        if rc == 0:
            break
        cap = int(max(int(counts.max()) + 16, cap * 2))   # retry with room
    nv, nr, nt = int(counts[0]), int(counts[1]), int(counts[2])
    final = dict(whole=int(fin[0]), frac=int(fin[1]),
                 speed=float(np.float32(fin[2]
                                        * np.float32(1.0 / (1 << 22)))),
                 splice_rem=int(fin[3]), splice_idx=int(fin[4]))
    return dict(
        visit_start=vis[0][:nv].astype(np.int32),
        visit_bw=vis[1][:nv].astype(np.int32),
        visit_bf=vis[2][:nv].astype(np.int32),
        visit_sec=vis[3][:nv].astype(np.int32),
        run_start=run[0][:nr].astype(np.int32),
        run_s0=run[1][:nr].astype(np.int32),
        run_m=run[2][:nr].astype(np.int32),
        triggers=trg[:nt].astype(np.int32),
        final=final)


def tape_trajectory(T: int, n: int, mod_q, starts, ends, speeds_q, reverse,
                    boundaries, splice_env, consts, init_whole: int,
                    init_frac: int):
    """C twin of ops/varispeed.tape_trajectory; returns the same dict or
    None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mod_q = np.ascontiguousarray(mod_q, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    speeds_q = np.ascontiguousarray(speeds_q, np.float32)
    reverse = np.ascontiguousarray(reverse, np.uint8)
    bnd = np.ascontiguousarray(boundaries, np.int64)
    env = np.ascontiguousarray(splice_env, np.float32)

    idx0 = np.zeros(T, np.int32)
    fr = np.zeros(T, np.float32)
    ga = np.zeros(T, np.float32)
    gs = np.zeros(T, np.float32)
    fin = np.zeros(5, np.int64)
    lib.ast_tape_trajectory(
        T, n, mod_q, starts, ends, speeds_q, reverse, len(starts),
        bnd.ctypes.data if len(bnd) else None, len(bnd),
        len(env), env,
        1 if consts.anticlick_on else 0, int(consts.smooth_len),
        np.float32(consts.anticlick_strength),
        1 if consts.splice_on else 0, 1 if consts.inertia_on else 0,
        np.float32(consts.alpha_q), np.float32(consts.initial_speed_q),
        int(init_whole), int(init_frac),
        idx0, fr, ga, gs, fin)
    final = dict(whole=int(fin[0]), frac=int(fin[1]),
                 speed=float(np.float32(fin[2] * np.float32(1.0 / (1 << 22)))),
                 splice_rem=int(fin[3]), splice_idx=int(fin[4]))
    return dict(idx0=idx0, fr=fr, ga=ga, gs=gs, final=final)
