"""Feature-dump serializer for the reference oracle drivers.

Serializes an SMAPSequence's derived structure features into the text
protocol read by tools/oracle_gn2.cpp and tools/oracle_s4.cpp, so the
compiled reference evaluator / SSSS code can run on exactly the features
our structure pipeline produced (bit-level parity without trollbase).
"""

from __future__ import annotations

import numpy as np


def f32s(arr) -> str:
    return " ".join(f"{np.float32(v):.9g}" for v in np.asarray(arr).ravel())


def make_dump(templ, qprof_path: str, ssss: bool = False) -> str:
    n = templ.seq_length
    t2 = n + 2
    out = [f"n {n} {qprof_path}"]
    out.append("lods " + " ".join(str(int(v)) for v in templ.lods_type))
    out.append("wcn " + f32s(templ.weighted_contact_number))
    out.append("pcoil " + f32s(templ.sse_values[:, 2]))
    out.append("isse " + " ".join(str(int(v)) for v in templ.isse))
    out.append("ssetype " + " ".join(str(int(v)) for v in templ.sse_type))
    out.append("acc " + " ".join(f"{float(v):.17g}"
                                 for v in (templ.accessibility
                                           if templ.accessibility is not None
                                           else np.zeros(t2))))
    out.append("profile " + f32s(templ.aa_profile))
    out.append("hyd " + f32s(templ.hydropathy))
    sse01 = []
    for i in range(t2):
        sse01 += [f"{np.float32(templ.sse_values[i,0]):.9g}",
                  f"{np.float32(templ.sse_values[i,1]):.9g}",
                  f"{np.float32(templ.sse_confid[i]):.9g}"]
    out.append("sse " + " ".join(sse01))
    out.append("gaps " + f32s(templ.gap_values))
    dist = []
    for i in range(2, n + 2):
        dist.append(f32s(templ.distance[i - 2, : i - 1]))
    out.append("dist " + " ".join(dist))
    d2 = (templ.distance2 if templ.distance2 is not None
          else np.zeros_like(templ.distance))
    ang = (templ.angle if templ.angle is not None
           else np.full_like(templ.distance, -1))
    out.append("dist2 " + " ".join(f32s(d2[i - 2, : i - 1])
                                   for i in range(2, n + 2)))
    out.append("angle " + " ".join(f32s(ang[i - 2, : i - 1])
                                   for i in range(2, n + 2)))
    brk = []
    for i in range(templ.brokenhb.shape[0]):
        brk.append(" ".join(str(int(v)) for v in templ.brokenhb[i, : i + 1]))
    out.append("broken " + " ".join(brk))
    if ssss:
        out.append("olc " + templ.get_string())
        out.append("cb " + " ".join(f"{float(v):.17g}"
                                    for v in templ.cb_xyz.ravel()))
        hbc = []
        for i in range(n + 1):
            hbc.append(" ".join(str(int(v))
                                for v in templ._hb_contact[i, : i + 1]))
        out.append("hbc " + " ".join(hbc))
        out.append("cbd2 " + f32s(templ._cb_dist2))
        out.append("name " + templ.seq_name)
        out.append(f"evd {float(templ.evd1_field):.17g} "
                   f"{float(templ.evd2_field):.17g}")
    return "\n".join(out) + "\n"
