#!/usr/bin/env python3
"""Build reference oracle binaries from /root/reference into /tmp/refbuild.

The reference's C++98 code is copied to a scratch dir (never into this
repo), minimally patched for modern g++ and for test-harness hygiene
(removing a debug cout in HMAPaliEval::similarity that floods stdout,
hmap_eval.h:54-55), and compiled with -O3 -ffp-contract=off (the reference's makefile adds
-ffast-math, which lets GCC reassociate the float accumulations away from
source order; the no-fast-math build is the bit-deterministic source-order
semantics and agrees with the fast-math build to 1 ulp).  Troll-dependent code is satisfied with stub headers so
the Troll-free paths (aaa, nalign) link; the stubs provide only
Troll::Application construction, which nalign instantiates but never uses
for profile-profile alignment (nalign.cpp:62).

Outputs: /tmp/refbuild/aaa, /tmp/refbuild/nalign, /tmp/refbuild/get_area_diffs
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REF = "/root/reference"
OUT = "/tmp/refbuild"

TROLL_STUB = """
// Minimal Troll stubs: just enough for nalign (which only constructs
// Troll::Application) and for struct.h's type references.
#ifndef TROLL_STUBS
#define TROLL_STUBS
#include <string>
#include <vector>
enum { TC_Coil = 0, TC_Helix = 329, TC_Strand = 330 };
namespace Troll {
  class Application { public: Application() {} ~Application() {}
    static void* topology; };
  class Vector { public: double x,y,z;
    Vector():x(0),y(0),z(0) {}
    Vector(double a,double b,double c):x(a),y(b),z(c) {}
    Vector operator-(const Vector& o) const { return Vector(x-o.x,y-o.y,z-o.z); }
    double norm() const { return __builtin_sqrt(x*x+y*y+z*z); }
    double distanceTo(const Vector& o) const; };
  class Residue; class Chain; class Structure; class PDBFile;
  class SSE; class HBond; class SurfvSurface;
}
using namespace Troll;
#endif
"""

APP_H = '#include "troll_stubs.h"\n'


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    src = os.path.join(OUT, "src")
    if os.path.exists(src):
        shutil.rmtree(src)
    os.makedirs(src)
    for f in os.listdir(REF):
        if f.endswith((".cpp", ".h")):
            shutil.copy(os.path.join(REF, f), src)

    # troll stub headers included by struct.h
    with open(os.path.join(src, "troll_stubs.h"), "w") as f:
        f.write(TROLL_STUB)
    for h in ("app.h", "structure.h", "pdbfile.h", "troll.h"):
        with open(os.path.join(src, h), "w") as f:
            f.write(APP_H)

    # patch 1: silence the stray debug cout in HMAPaliEval::similarity
    he = os.path.join(src, "hmap_eval.h")
    txt = open(he).read()
    start = txt.find("cout << q[q_pos]->sse_values[0]")
    if start >= 0:
        end = txt.find("endl;", start) + len("endl;")
        txt = txt[:start] + "// (debug cout removed for oracle build)" + txt[end:]
        open(he, "w").write(txt)

    # patch 2: struct.h includes Troll headers that our stubs replace; it
    # compiles as-is with the stubs since HM_Data only holds pointers/values.

    # patch 3: aa_ali.cpp:95 constructs SuboptFlags(templ.size(), true) —
    # the bool/size_t argument swap yields a length-1 flag array and the cw
    # enumerator then reads past it (undefined behavior, unreproducible).
    # The oracle uses a proper all-true flag array instead, matching our
    # aaa implementation's documented fix.
    p = os.path.join(src, "aa_ali.cpp")
    t = open(p).read()
    t = t.replace("SuboptFlags subopt(templ.size(),true);",
                  "SuboptFlags subopt(true,templ.size());")
    open(p, "w").write(t)

    # patch 3b: ssss.h:578 dependent-name iterator needs `typename` on
    # modern g++ (C++98 code predates the strict two-phase lookup)
    p = os.path.join(src, "ssss.h")
    t = open(p).read()
    t = t.replace("map<string,AlignedPairList<S1,S2> >::iterator map_it",
                  "typename map<string,AlignedPairList<S1,S2> >::iterator map_it")
    open(p, "w").write(t)

    # patch 3c: sse_frag_set.cpp:236 calls vector::front() on an empty
    # vector when an SSE column has no available fragments left (UB,
    # segfaults).  Frag_Set::activate_next_best_available_frag's max-z scan
    # (frag_set.cpp:126) already starts at -9999, so returning -9999 for an
    # exhausted column is exactly "skip this column" — the fix our
    # implementation uses (ssss/frag_set.py).
    p = os.path.join(src, "sse_frag_set.cpp")
    t = open(p).read()
    t = t.replace(
        "  vector<Ali_Frag*> available_frags = get_available_frags();\n\n"
        "  return available_frags.front()->zs();",
        "  vector<Ali_Frag*> available_frags = get_available_frags();\n\n"
        "  if( available_frags.empty() ) { return -9999.f; }\n"
        "  return available_frags.front()->zs();")
    open(p, "w").write(t)

    # patch 4: 64-bit type fix — kscw.h:188 / crcw.h:242 call
    # min(size_t, unsigned int), ambiguous on LP64
    for fn in ("kscw.h", "crcw.h"):
        p = os.path.join(src, fn)
        t = open(p).read()
        t = t.replace("min(as.capacity()*2,params->user_limit)",
                      "min(as.capacity()*2,(size_t)params->user_limit)")
        open(p, "w").write(t)

    flags = ["-O3", "-ffp-contract=off", "-DUNIXVER", "-Wno-deprecated", "-w",
             "-std=c++98", "-include", "cstdlib", "-include", "cstring",
             "-include", "cstdio", "-I", src]

    lib_sources = ["aa_seq.cpp", "alib.cpp", "ali_dist.cpp", "application.cpp",
                   "argv.cpp", "dpmatrix.cpp", "fastaio.cpp", "formats.cpp",
                   "gstrings.cpp", "hmap_eval.cpp", "hmapalib_seq.cpp",
                   "hmapio.cpp", "noalib.cpp", "pirio.cpp", "pstore.cpp",
                   "rcfile.cpp", "sequence.cpp", "sflags.cpp", "submatrix.cpp"]

    objs = []
    for cpp in lib_sources:
        obj = os.path.join(OUT, cpp.replace(".cpp", ".o"))
        r = subprocess.run(["g++", "-c"] + flags +
                           ["-o", obj, os.path.join(src, cpp)],
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED compiling {cpp}:\n{r.stderr}", file=sys.stderr)
            return 1
        objs.append(obj)

    tools_dir = os.path.dirname(os.path.abspath(__file__))
    targets = [("aa_ali", os.path.join(src, "aa_ali.cpp")),
               ("nalign", os.path.join(src, "nalign.cpp")),
               ("get_area_diffs", os.path.join(src, "get_area_diffs.cpp")),
               ("oracle_enum", os.path.join(tools_dir, "oracle_enum.cpp"))]
    for tool, main_cpp in targets:
        exe = os.path.join(OUT, "aaa" if tool == "aa_ali" else tool)
        r = subprocess.run(["g++"] + flags + ["-o", exe, main_cpp] + objs,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED linking {tool}:\n{r.stderr}", file=sys.stderr)
            return 1
        print(f"built {exe}")

    # ---- gn2/hmap2/gnoali evaluator oracle -------------------------------
    # The real SMAPSequence needs trollbase; a second source tree replaces
    # gn2lib_seq.h with a stand-in that carries only the derived feature
    # fields the evaluators read, and fixes gnoalib.h's stale include.
    src2 = os.path.join(OUT, "src_gn2")
    if os.path.exists(src2):
        shutil.rmtree(src2)
    shutil.copytree(src, src2)
    with open(os.path.join(src2, "gn2lib_seq.h"), "w") as f:
        f.write("""
#ifndef _HMAP2_GN2LIB_SEQ
#define _HMAP2_GN2LIB_SEQ
#include "alignment.h"
#include "hmapalib_seq.h"
class SMAPSequence;
class Gn2Eval;
typedef AlignedPair<HMAPSequence,SMAPSequence> GnAlignedPair;
typedef list<GnAlignedPair> LGnAlignedPair;
typedef AlignedPairList<HMAPSequence,SMAPSequence> GnAlignment;
typedef AlignmentSet<HMAPSequence,SMAPSequence,Gn2Eval> GnAlignmentSet;
typedef vector<GnAlignment> VGnAlignment;
// stand-in: derived features only (loaded by tools/oracle_gn2.cpp)
class SMAPSequence : public HMAPSequence {
 public:
  vector<vector<unsigned long> > brokenhb;
  vector<vector<float> > distance;
  vector<float> weighted_contact_number;
  vector<vector<float> > distance2;
  vector<vector<float> > angle;
  vector<vector<bool> > hb_contact;  // (nr+1)x(nr+1) symmetric, 1-based
  vector<vector<float> > cb_dist2;   // (nr)x(nr) squared CB distances
  SMAPSequence() {}
  // get_shifts' core-flags mode loads an SMAP profile directly; that path
  // needs trollbase and stays unavailable in the oracle build
  SMAPSequence(const char*, int = 0, bool = false) {
    throw string("SMAP file loading unavailable in oracle build");
  }
  bool get_backbone_HB_contact(int i, int j) const {
    int a = i > j ? i : j;
    int b = i > j ? j : i;
    return hb_contact[a][b];
  }
  // semantics of SMAPSequence::updateCore (gn2lib_seq.cpp:289-326) on the
  // stand-in fields: blend WCN with alignment-set-averaged model contact
  // numbers (window ao=0, same 14.5<d2<256 gate as calcWCN)
  void updateCore(const GnAlignmentSet& as, float ratio) {
    unsigned int ao(0);
    unsigned int nr(seq_length);
    float span(ao * 2 + 1);
    float len((float)as.size());
    vector<float> model_cn(nr, 0.f);
    for (VGnAlignment::const_iterator al_it = as.begin();
         al_it != as.end(); al_it++) {
      vector<bool> occupancy(nr + 2, false);
      for (LGnAlignedPair::const_iterator ap_it = al_it->begin();
           ap_it != al_it->end(); ap_it++)
        occupancy[ap_it->template_idx()] = true;
      for (unsigned int i = 0; i < nr; ++i)
        for (unsigned int j = 0; j < nr; ++j)
          if (cb_dist2[i][j] > 14.5f && cb_dist2[i][j] < 256.f &&
              occupancy[j + 1])
            model_cn[i] += (0.722f / cb_dist2[i][j]) / len;
    }
    for (unsigned int i = 1; i <= nr; ++i) {
      weighted_contact_number[i] *= ratio;
      for (unsigned int z = (1u > i - ao ? 1u : i - ao);
           z <= (nr < i + ao ? nr : i + ao); ++z)
        weighted_contact_number[z] += (1.f - ratio) * model_cn[i - 1] / span;
    }
  }
};
#endif
""")
    p = os.path.join(src2, "get_shifts.cpp")
    t = open(p).read().replace('#include "ali_dist.h"',
                               '#include "ali_dist.h"\n#include "aasubalib.h"')
    # get_shifts.cpp:26 passes the template-name AASubstitutionEval as a
    # type argument (ill-formed; predates strict compilers); instantiate it
    t = t.replace("AlignmentSet<S1,S2,AASubstitutionEval>",
                  "AlignmentSet<S1,S2,AASubstitutionEval<S1,S2> >")
    # core-flags mode needs trollbase topology loading; the stub ctor throws
    # anyway, so drop the Troll setup lines (non-core mode untouched)
    t = t.replace("    Troll::Application app;\n"
                  "    parameters.Load( Troll::Application::topology_file );\n",
                  "")
    open(p, "w").write(t)

    p = os.path.join(src2, "gnoalib.h")
    t = open(p).read().replace('#include "hmapalib.h"',
                               '#include "hmap_eval.h"')
    open(p, "w").write(t)

    # test-harness hygiene: find_good_clustering seeds rand() with
    # time(NULL) (kmedoidclusterer.cpp:67), which defeats byte-parity
    # testing; honor AAT_KMED_SEED when set (oracle_kmedoid.cpp sets it)
    p = os.path.join(src2, "kmedoidclusterer.cpp")
    t = open(p).read().replace(
        "#include <time.h>", "#include <time.h>\n#include <stdlib.h>")
    t = t.replace(
        "srand( time(NULL) );",
        "srand( getenv(\"AAT_KMED_SEED\") ? "
        "atoi(getenv(\"AAT_KMED_SEED\")) : time(NULL) );")
    open(p, "w").write(t)

    flags2 = [f if f != src else src2 for f in flags]
    objs2 = []
    ssss_sources = ["ali_frag.cpp", "ali_str_info.cpp",
                "ali_strand_eval.cpp", "frag_matrix.cpp",
                "frag_set.cpp", "skel_ali.cpp", "skel_set.cpp",
                "sse_frag_set.cpp", "clusterset.cpp",
                "kmedoidclusterer.cpp", "UPGMA_Clusterer.cpp",
                "UPGMA_Tree.cpp"]
    for cpp in ["gn2_eval.cpp", "hmap2_eval.cpp", "gnoalib.cpp"] + ssss_sources + lib_sources:
        obj = os.path.join(OUT, "gn2_" + cpp.replace(".cpp", ".o"))
        r = subprocess.run(["g++", "-c"] + flags2 +
                           ["-o", obj, os.path.join(src2, cpp)],
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED compiling (gn2) {cpp}:\n{r.stderr}", file=sys.stderr)
            return 1
        objs2.append(obj)
    oracle_mains = [(o, os.path.join(tools_dir, o + ".cpp"))
                    for o in ("oracle_gn2", "oracle_s4", "oracle_gn2cli",
                              "oracle_nalign2", "oracle_gnoali",
                              "oracle_upgma", "oracle_kmedoid")]
    oracle_mains.append(("get_shifts", os.path.join(src2, "get_shifts.cpp")))
    for oracle, main_cpp in oracle_mains:
        exe = os.path.join(OUT, oracle)
        r = subprocess.run(["g++"] + flags2 + ["-o", exe, main_cpp] + objs2,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED linking {oracle}:\n{r.stderr}", file=sys.stderr)
            return 1
        print(f"built {exe}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
