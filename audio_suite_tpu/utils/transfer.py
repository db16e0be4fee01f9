"""Device->host transfer helpers.

The tunnel-attached TPU's d2h path is the end-to-end bottleneck for every
engine (BASELINE.md: ~35-40 MB/s, ~45 ms fixed cost per pull, no extra
bandwidth from concurrent streams).  Measured behavior on the v5e tunnel
(tools/, round 3):

- one big pull of 8.6 MB:      ~270 ms  (32 MB/s)
- 4-8 async chunked pulls:     ~220 ms  (39 MB/s)  <- ~20% faster
- 16+ chunks:                  regresses (per-pull fixed cost dominates)
- two arrays pulled from two threads: ~2x SLOWER than serial (shared pipe)

So: slice the device array into ~1.5 MB chunks (at most 8), issue
`copy_to_host_async` on all slices so the transfers queue back-to-back
without a host round-trip between them, then assemble.  Small arrays skip
the machinery (fixed per-pull cost dominates).
"""
from __future__ import annotations

import numpy as np

_TARGET_CHUNK_BYTES = 1.5e6
_MAX_CHUNKS = 8
_MIN_BYTES = 3e6          # below this a single pull wins


def chunked_pull(dev_arr, n_valid: int | None = None) -> np.ndarray:
    """Pull a device array to host as NumPy, chunked along axis 0.

    `n_valid`: true length along axis 0 when the array carries padding —
    only the valid prefix is transferred (the padded tail never crosses
    the link).  Works on NumPy inputs too (no-op slice)."""
    n = dev_arr.shape[0] if n_valid is None else int(n_valid)
    if isinstance(dev_arr, np.ndarray):
        return dev_arr[:n]
    itemsize = np.dtype(dev_arr.dtype).itemsize
    row = itemsize * int(np.prod(dev_arr.shape[1:], dtype=np.int64))
    total = n * row
    if total < _MIN_BYTES:
        return np.asarray(dev_arr[:n]) if n != dev_arr.shape[0] \
            else np.asarray(dev_arr)
    k = max(1, min(_MAX_CHUNKS, int(round(total / _TARGET_CHUNK_BYTES))))
    bounds = [int(round(j * n / k)) for j in range(k + 1)]
    parts = [dev_arr[bounds[j]:bounds[j + 1]] for j in range(k)]
    for p in parts:
        p.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p in parts], axis=0)
