"""Breakpoint automation lanes — host port of microsound_0.2.1/
main_v2.py:452-482: parse "t:v, t:v" strings, piecewise-linear evaluation."""
from __future__ import annotations


def parse_breakpoints(s):
    pts = []
    s = (s or "").strip()
    if not s:
        return pts
    for part in s.split(","):
        part = part.strip()
        if not part or ":" not in part:
            continue
        t, v = part.split(":")
        try:
            pts.append((float(t.strip()), float(v.strip())))
        except Exception:
            pass
    pts.sort(key=lambda p: p[0])
    return pts


def eval_breakpoints(pts, t, default):
    if not pts:
        return default
    if t <= pts[0][0]:
        return pts[0][1]
    if t >= pts[-1][0]:
        return pts[-1][1]
    for i in range(len(pts) - 1):
        t0, v0 = pts[i]
        t1, v1 = pts[i + 1]
        if t0 <= t <= t1:
            a = (t - t0) / max(1e-12, (t1 - t0))
            return (1 - a) * v0 + a * v1
    return default
