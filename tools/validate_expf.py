#!/usr/bin/env python3
"""Exhaustive validation of the sf64 expf replica against the live libm.

Sweeps EVERY float32 bit pattern with |x| <= LIMIT (default 8.0 — the
similarity producer guards its arguments to alpha * conf^2 <= 4, so 8
covers the domain with margin) and bit-compares sf64.expf32 against the
C library's expf (native/exactmath.c, same libm the reference oracles
link).  ~2.2e9 values; writes a one-line JSON verdict to
tools/validate_expf.json.

Run: JAX_PLATFORMS=cpu python tools/validate_expf.py [limit]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alignment_algos_tpu.ops import sf64  # noqa: E402
from alignment_algos_tpu.native import expf as libm_expf  # noqa: E402


def main() -> int:
    limit = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    top = int(np.float32(limit).view(np.uint32)) + 1  # exclusive bit bound
    chunk = 1 << 24
    fn = jax.jit(sf64.expf_bits)
    total = 0
    mism_total = 0
    first_bad = []
    t0 = time.time()
    for sign in (0, 0x80000000):
        for start in range(0, top, chunk):
            n = min(chunk, top - start)
            bits = (np.arange(start, start + n, dtype=np.uint32)
                    + np.uint32(sign))
            got = np.asarray(fn(jnp.asarray(bits)))
            exp = libm_expf(bits.view(np.float32)).view(np.uint32)
            bad = got != exp
            nbad = int(bad.sum())
            mism_total += nbad
            total += n
            if nbad and len(first_bad) < 10:
                for i in np.where(bad)[0][:10 - len(first_bad)]:
                    x = bits[i].view(np.float32) if hasattr(bits[i], "view") \
                        else np.uint32(bits[i]).view(np.float32)
                    first_bad.append({
                        "x_bits": int(bits[i]),
                        "x": float(np.frombuffer(
                            np.uint32(bits[i]).tobytes(), np.float32)[0]),
                        "got": int(got[i]), "want": int(exp[i])})
            if (start // chunk) % 16 == 0:
                print(f"sign={sign:08x} start={start:#010x} "
                      f"checked={total/1e9:.2f}G mism={mism_total} "
                      f"({time.time()-t0:.0f}s)", flush=True)
    out = {
        "limit": limit, "total_checked": total, "mismatches": mism_total,
        "seconds": round(time.time() - t0, 1), "first_bad": first_bad,
        "libm": "glibc 2.36 __expf_fma (x86-64, this machine)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "validate_expf.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out)[:400])
    return 0 if mism_total == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
